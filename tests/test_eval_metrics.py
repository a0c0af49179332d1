"""Metric-suite unit tests: hand-computed oracles on tiny matrices, plus
property checks the reference semantics imply."""

import numpy as np
import pytest

from theoremsearch_tpu.eval import (
    err_at_k,
    evaluate_retrieval,
    hit_at_k,
    mrr_at_k,
    ndcg_at_k,
    precision_at_k,
    q_measure_at_k,
    recall_vs_exact,
)


def _perfect_case():
    # 3 queries, 4 docs; query i's correct doc is i and ranked first.
    sim = np.array(
        [
            [0.9, 0.1, 0.2, 0.0],
            [0.1, 0.8, 0.0, 0.2],
            [0.0, 0.2, 0.7, 0.1],
        ]
    )
    qrels = {0: {0: 1.0}, 1: {1: 1.0}, 2: {2: 1.0}}
    return sim, qrels


def test_perfect_ranking_binary_metrics():
    sim, qrels = _perfect_case()
    assert precision_at_k(sim, qrels, k=1) == 1.0
    assert hit_at_k(sim, qrels, k=1) == 1.0
    assert hit_at_k(sim, qrels, k=3) == 1.0
    assert mrr_at_k(sim, qrels, k=3) == 1.0


def test_precision_at_k_divides_by_k():
    # reference semantics: P@k = hit/k for the single relevant doc
    sim, qrels = _perfect_case()
    assert precision_at_k(sim, qrels, k=2) == pytest.approx(0.5)


def test_rank_two_mrr():
    sim = np.array([[0.5, 0.9, 0.0]])  # correct doc 0 is ranked 2nd
    qrels = {0: {0: 1.0}}
    assert mrr_at_k(sim, qrels, k=3) == pytest.approx(0.5)
    assert hit_at_k(sim, qrels, k=1) == 0.0
    assert hit_at_k(sim, qrels, k=2) == 1.0


def test_mrr_outside_cutoff_is_zero():
    sim = np.array([[0.1, 0.9, 0.8, 0.7]])
    qrels = {0: {0: 1.0}}
    assert mrr_at_k(sim, qrels, k=2) == 0.0


def test_ndcg_hand_computed():
    # 1 query, 3 docs, grades [1, 0.5, 0]; ranking by score: doc1, doc0, doc2
    sim = np.array([[0.5, 0.9, 0.1]])
    qrels = {0: {0: 1.0, 1: 0.5}}
    # dcg = g(0.5)/log2(2) + g(1)/log2(3);  g(r) = 2^r - 1
    g05, g1 = 2**0.5 - 1, 1.0
    dcg = g05 / np.log2(2) + g1 / np.log2(3)
    idcg = g1 / np.log2(2) + g05 / np.log2(3)
    assert ndcg_at_k(sim, qrels, k=3) == pytest.approx(dcg / idcg)


def test_ndcg_perfect_is_one():
    sim, qrels = _perfect_case()
    assert ndcg_at_k(sim, qrels, k=3) == pytest.approx(1.0)


def test_err_hand_computed():
    # 1 query, 2 docs, grade-1 doc ranked first. R=1 -> p1 = (2^1-1)/2 = 0.5
    sim = np.array([[0.9, 0.1]])
    qrels = {0: {0: 1.0}}
    assert err_at_k(sim, qrels, k=2) == pytest.approx(0.5)
    # grade-1 doc second: ERR = (1-0)*0 + ... doc0 at rank2: 1.0*0.5*(1/2)
    sim2 = np.array([[0.1, 0.9]])
    assert err_at_k(sim2, qrels, k=2) == pytest.approx(0.25)


def test_err_empty_qrels_zero():
    sim = np.array([[0.9, 0.1], [0.5, 0.6]])
    qrels = {0: {0: 1.0}, 1: {}}
    # query 1 contributes 0
    assert err_at_k(sim, qrels, k=2) == pytest.approx(0.25)


def test_q_measure_hand_computed():
    # 1 query, 2 docs, grades [1, 0.5], ranked correctly. R=1, denom=2.
    # gains: doc0 = 1/2, doc1 = (2^0.5-1)/2
    sim = np.array([[0.9, 0.5]])
    qrels = {0: {0: 1.0, 1: 0.5}}
    g0, g1 = 0.5, (2**0.5 - 1) / 2
    cg_star = g0 + g1
    q_sum = g0 * (g0 / 1) + g1 * ((g0 + g1) / 2)
    assert q_measure_at_k(sim, qrels, k=2) == pytest.approx(q_sum / cg_star)


def test_q_measure_zero_gain_positions_consume_rank():
    # doc with grade 0 sits at rank 1; relevant doc at rank 2 gets CG/2
    sim = np.array([[0.1, 0.9]])
    qrels = {0: {0: 1.0}}
    # gains: [0.5]; at rank 2: q_sum = 0.5 * (0.5/2); CG* = 0.5
    assert q_measure_at_k(sim, qrels, k=2) == pytest.approx(0.25)


def test_recall_vs_exact():
    exact = np.array([[0, 1, 2], [3, 4, 5]])
    approx = np.array([[2, 1, 9], [3, 4, 5]])
    assert recall_vs_exact(approx, exact, k=3) == pytest.approx(5 / 6)
    assert recall_vs_exact(exact, exact, k=3) == 1.0
    # order within top-k must not matter
    assert recall_vs_exact(exact[:, ::-1].copy(), exact, k=3) == 1.0


def test_evaluate_retrieval_full_suite():
    sim, qrels = _perfect_case()
    m = evaluate_retrieval(sim, qrels, top_k_report=3)
    assert m["P@1"] == 1.0
    assert m["H@3"] == 1.0
    assert m["MRR@3"] == 1.0
    assert m["nDCG@3"] == pytest.approx(1.0)
    assert 0 < m["ERR@3"] <= 1.0
    assert 0 < m["Q@3"] <= 1.0


def test_metrics_random_consistency(rng):
    # On random scores, Hit@k grows with k; metrics stay within [0, 1].
    sim = rng.standard_normal((50, 200))
    qrels = {q: {int(rng.integers(200)): 1.0} for q in range(50)}
    prev = 0.0
    for k in (1, 5, 20, 100):
        h = hit_at_k(sim, qrels, k=k)
        assert 0.0 <= h <= 1.0 and h >= prev
        prev = h
    assert 0.0 <= ndcg_at_k(sim, qrels, k=10) <= 1.0
    assert 0.0 <= err_at_k(sim, qrels, k=10) <= 1.0
    assert 0.0 <= q_measure_at_k(sim, qrels, k=10) <= 1.0


def test_recall_vs_exact_ignores_padding():
    """PAD_ID (-1) slots must not count as matches (regression: the
    >=0.99 gate inflated on filtered/tiny corpora)."""
    from theoremsearch_tpu.eval.metrics import recall_vs_exact

    approx = np.array([[3, 7, -1, -1]])
    exact = np.array([[3, 9, -1, -1]])
    # 2 valid exact ids, 1 retrieved -> 0.5 (was 0.75 with pad-match bug)
    assert recall_vs_exact(approx, exact, k=4) == 0.5
    # all-padding query counts as perfect recall (nothing to retrieve)
    assert recall_vs_exact(np.array([[-1, -1]]), np.array([[-1, -1]]), k=2) == 1.0
