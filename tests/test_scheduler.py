"""Micro-batching scheduler: correctness under concurrency, batching
effectiveness, filter-group isolation, error propagation, shutdown."""

import threading

import numpy as np
import pytest

from theoremsearch_tpu.core import IndexConfig
from theoremsearch_tpu.eval.oracle import exact_topk, l2_normalize
from theoremsearch_tpu.index import FlatIndex
from theoremsearch_tpu.search import CorpusMetadata, SearchEngine, SearchFilters
from theoremsearch_tpu.serve.scheduler import BatchScheduler


@pytest.fixture(scope="module")
def engine():
    rng = np.random.default_rng(0)
    emb = np.asarray(l2_normalize(rng.standard_normal((2000, 64)).astype(np.float32)))
    rows = [
        {"paper_id": f"p{i}", "paper_title": f"T{i}", "authors": [],
         "link": "https://arxiv.org/abs/x", "year": 2020,
         "primary_category": "math.AG" if i % 2 else "math.NT",
         "journal_ref": None, "citations": i, "theorem_name": "Theorem 1.",
         "theorem_body": "b", "slogan": "s"}
        for i in range(2000)
    ]
    meta = CorpusMetadata.from_rows(rows)
    idx = FlatIndex.build(
        emb, config=IndexConfig(pad_multiple=256, dtype="float32"), normalize=False
    )
    eng = SearchEngine(idx, meta=meta, use_pallas=False, row_block=128)
    return eng, emb


def test_concurrent_submits_batched_and_correct(engine):
    eng, emb = engine
    rng = np.random.default_rng(1)
    queries = np.asarray(l2_normalize(rng.standard_normal((40, 64)).astype(np.float32)))
    sched = BatchScheduler(eng, max_batch=64, max_wait_ms=50)
    results = [None] * 40

    def worker(i):
        results[i] = sched.search(queries[i], k=5)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(40)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    ref_s, ref = exact_topk(queries, emb, k=5)
    for i in range(40):
        s, ids = results[i]
        # chunked-scan accumulation order can swap last-ulp ties; compare
        # by score and set membership rather than exact id order
        np.testing.assert_allclose(np.sort(s), np.sort(ref_s[i]), atol=1e-5)
        assert len(set(ids.tolist()) & set(ref[i].tolist())) >= 4
    stats = sched.stats()
    assert stats["queries"] == 40
    assert stats["avg_batch"] > 2.0  # concurrency actually batched
    # metrics surface: every resolved request left a latency sample and
    # the inflight gauge drained back to zero
    assert stats["inflight"] == 0 and stats["shed"] == 0 and stats["errors"] == 0
    lat = stats["latency_ms"]
    assert 0.0 <= lat[0.5] <= lat[0.95] <= lat[0.99]
    sched.shutdown()


def test_filter_groups_isolated(engine):
    eng, emb = engine
    rng = np.random.default_rng(2)
    q = np.asarray(l2_normalize(rng.standard_normal((2, 64)).astype(np.float32)))
    sched = BatchScheduler(eng, max_batch=8, max_wait_ms=40)
    f_ag = SearchFilters(tags=["math.AG"])
    fut1 = sched.submit(q[0], k=5, filters=f_ag)
    fut2 = sched.submit(q[1], k=5)
    s1, i1 = fut1.result(10)
    s2, i2 = fut2.result(10)
    assert all(eng.meta.primary_category[d] == "math.AG" for d in i1 if d >= 0)
    sched.shutdown()


def test_mixed_k(engine):
    eng, emb = engine
    q = np.asarray(l2_normalize(np.random.default_rng(3).standard_normal((2, 64)).astype(np.float32)))
    sched = BatchScheduler(eng, max_batch=8, max_wait_ms=40)
    f1 = sched.submit(q[0], k=3)
    f2 = sched.submit(q[1], k=7)
    assert f1.result(10)[1].shape == (3,)
    assert f2.result(10)[1].shape == (7,)
    sched.shutdown()


def test_error_propagation(engine):
    eng, _ = engine
    sched = BatchScheduler(eng, max_batch=4, max_wait_ms=10)
    bad = np.zeros(17, np.float32)  # wrong dim -> engine raises
    fut = sched.submit(bad, k=5)
    with pytest.raises(Exception):
        fut.result(10)
    # scheduler still alive afterwards
    good = np.zeros(64, np.float32)
    s, ids = sched.search(good, k=2)
    assert ids.shape == (2,)
    sched.shutdown()


def test_submit_text_encodes_in_batch(engine):
    """Text requests are encoded in ONE batched encode_fn call per
    dispatch and produce the same results as pre-encoded vectors."""
    eng, emb = engine
    rng = np.random.default_rng(4)
    vocab = np.asarray(l2_normalize(rng.standard_normal((16, 64)).astype(np.float32)))
    calls = []

    def encode_fn(texts):
        calls.append(len(texts))
        return np.stack([vocab[hash(t) % 16] for t in texts])

    sched = BatchScheduler(eng, max_batch=32, max_wait_ms=60, encode_fn=encode_fn)
    texts = [f"query number {i}" for i in range(12)]
    futs = [sched.submit_text(t, k=5) for t in texts]
    got = [f.result(10) for f in futs]
    ref_s, ref_i = exact_topk(encode_fn(texts[:12]), emb, k=5)
    calls_during = calls[:-1]  # drop the reference call above
    for j in range(12):
        np.testing.assert_allclose(np.sort(got[j][0]), np.sort(ref_s[j]), atol=1e-5)
    # batched: far fewer encode calls than requests
    assert sum(calls_during) == 12 and len(calls_during) <= 3
    sched.shutdown()


def test_submit_text_requires_encode_fn(engine):
    eng, _ = engine
    sched = BatchScheduler(eng, max_batch=4, max_wait_ms=10)
    with pytest.raises(ValueError):
        sched.submit_text("hello", k=3)
    sched.shutdown()


def test_submit_text_encode_error_propagates(engine):
    eng, _ = engine

    def boom(texts):
        raise RuntimeError("tokenizer exploded")

    sched = BatchScheduler(eng, max_batch=4, max_wait_ms=10, encode_fn=boom)
    fut = sched.submit_text("q", k=3)
    with pytest.raises(RuntimeError):
        fut.result(10)
    # vector requests in the same batch still succeed
    good = sched.submit(np.zeros(64, np.float32), k=2)
    assert good.result(10)[1].shape == (2,)
    sched.shutdown()


def test_pipelined_device_encode_and_mixed_batch(engine):
    """encode_fn returning a DEVICE array (encode_device) flows through
    the async fast path; text and vector requests in one batch are
    concatenated on device and all resolve correctly."""
    import jax.numpy as jnp

    eng, emb = engine
    rng = np.random.default_rng(5)
    vocab = np.asarray(l2_normalize(rng.standard_normal((8, 64)).astype(np.float32)))

    def encode_dev(texts):
        return jnp.asarray(np.stack([vocab[len(t) % 8] for t in texts]))

    sched = BatchScheduler(eng, max_batch=16, max_wait_ms=60, encode_fn=encode_dev)
    qv = np.asarray(l2_normalize(rng.standard_normal((2, 64)).astype(np.float32)))
    futs = [sched.submit_text(f"q{i}", k=4) for i in range(3)]
    futs += [sched.submit(qv[i], k=4) for i in range(2)]
    got = [f.result(10) for f in futs]
    texts = [f"q{i}" for i in range(3)]
    ref_q = np.concatenate([np.asarray(encode_dev(texts)), qv])
    ref_s, ref_i = exact_topk(ref_q, emb, k=4)
    for j in range(5):
        np.testing.assert_allclose(np.sort(got[j][0]), np.sort(np.asarray(ref_s[j])), atol=1e-5)
    sched.shutdown()


def test_mixed_batch_with_real_padded_encode_device(engine):
    """Regression: BatchedEncoder.encode_device pads its output to a
    power of two; in a mixed text+vector batch those junk rows must NOT
    shift the vector requests' results."""
    import jax

    from theoremsearch_tpu.core.config import EncoderConfig
    from theoremsearch_tpu.encoder.batching import BatchedEncoder
    from theoremsearch_tpu.encoder.model import init_params

    eng, emb = engine
    cfg = EncoderConfig.tiny().replace(embedding_dim=64, hidden_size=64,
                                       num_heads=2, num_kv_heads=1, head_dim=32)
    params = init_params(cfg, jax.random.PRNGKey(1))
    be = BatchedEncoder(params, cfg, batch_size=16, buckets=(16,))
    # 3 texts -> encode_device returns 8 rows (pow2), 5 junk
    assert be.encode_device(["a", "b", "c"]).shape[0] == 8

    sched = BatchScheduler(eng, max_batch=16, max_wait_ms=60,
                           encode_fn=be.encode_device)
    rng = np.random.default_rng(9)
    qv = np.asarray(l2_normalize(rng.standard_normal((2, 64)).astype(np.float32)))
    futs = [sched.submit_text(f"query {i}", k=4) for i in range(3)]
    futs += [sched.submit(qv[i], k=4) for i in range(2)]
    got = [f.result(10) for f in futs]
    # the vector requests must match a direct engine search exactly
    ref_s, ref_i = eng.search_vectors(qv, k=4)
    for j in range(2):
        np.testing.assert_allclose(got[3 + j][0], ref_s[j], atol=1e-5)
        np.testing.assert_array_equal(got[3 + j][1], ref_i[j])
    sched.shutdown()


def test_filtered_text_and_vector_groups_async(engine):
    """A batch mixing text and vector requests across several filter
    signatures resolves each request against its own group's mask — all
    groups dispatch through the async path (no dispatch-thread scans)."""
    eng, emb = engine

    def fake_encode(texts):
        # deterministic "encoder": text 'doc<i>' -> corpus row i
        return np.stack([emb[int(t[3:])] for t in texts])

    sched = BatchScheduler(eng, max_batch=16, max_wait_ms=60, encode_fn=fake_encode)
    f_ag = SearchFilters(tags=["math.AG"])
    f_nt = SearchFilters(tags=["math.NT"])
    futs = [
        sched.submit_text("doc7", k=5, filters=f_ag),     # 7 is odd -> AG
        sched.submit(emb[8], k=5, filters=f_nt),          # 8 even -> NT
        sched.submit_text("doc9", k=5),                   # unfiltered
        sched.submit(emb[10], k=5, filters=f_nt),
        sched.submit_text("doc11", k=5, filters=f_ag),
    ]
    outs = [f.result(20) for f in futs]
    # self-match must rank first where its category passes the filter
    assert outs[0][1][0] == 7
    assert outs[1][1][0] == 8
    assert outs[2][1][0] == 9
    assert outs[3][1][0] == 10
    assert outs[4][1][0] == 11
    for d in outs[0][1]:
        assert eng.meta.primary_category[d] == "math.AG"
    for d in outs[1][1]:
        assert eng.meta.primary_category[d] == "math.NT"
    assert sched.stats()["queries"] == 5
    sched.shutdown()


def test_filter_coalescing_batches_and_deadline_flush(engine):
    """Filtered requests with the same signature coalesce into one scan
    when enough arrive; a lone filtered request still resolves within
    the coalesce deadline (loop-timeout flush)."""
    import time

    eng, emb = engine
    sched = BatchScheduler(
        eng, max_batch=64, max_wait_ms=5,
        filter_coalesce_ms=120.0, filter_coalesce_min=8,
    )
    f = SearchFilters(tags=["math.AG"])
    b0 = dict(sched.stats())
    futs = [sched.submit(emb[2 * i + 1], k=5, filters=f) for i in range(8)]
    for i, fu in enumerate(futs):
        s, ids = fu.result(10)
        assert ids[0] == 2 * i + 1  # self-match, odd ids are math.AG
    b1 = sched.stats()
    # 8 same-signature requests should have shared very few scans
    assert b1["batches"] - b0["batches"] <= 3

    # a single held request flushes at the deadline, not at min-size
    t0 = time.time()
    s, ids = sched.submit(emb[3], k=5, filters=f).result(10)
    assert ids[0] == 3
    assert time.time() - t0 < 5.0
    sched.shutdown()


def test_scheduler_over_multichip_engine():
    """The serving scheduler composes with the sharded (multi-chip)
    engine: async dispatch + resolver pool over the shard_map speed path
    on the 8-device CPU mesh, filtered and unfiltered mixed."""
    from theoremsearch_tpu.core import IndexConfig as IC, MeshConfig, make_mesh

    rng = np.random.default_rng(7)
    emb = np.asarray(l2_normalize(rng.standard_normal((2048, 64)).astype(np.float32)))
    rows = [
        {"paper_id": f"p{i}", "paper_title": "T", "authors": [],
         "link": "https://arxiv.org/abs/x", "year": 2020,
         "primary_category": "math.AG" if i % 2 else "math.NT",
         "journal_ref": None, "citations": i, "theorem_name": "Theorem 1.",
         "theorem_body": "b", "slogan": "s"}
        for i in range(2048)
    ]
    meta = CorpusMetadata.from_rows(rows)
    idx = FlatIndex.build(
        emb, config=IC(pad_multiple=256, dtype="int8", int8_scale="global"),
        normalize=False,
    )
    mesh = make_mesh(MeshConfig(data=1, shard=4))
    eng = SearchEngine(
        idx, meta=meta, mesh=mesh, use_pallas=True, pallas_interpret=True,
        row_block=128, rescore_vectors=emb, rescore_factor=8,
    )
    assert eng._sharded_speed_ok
    sched = BatchScheduler(eng, max_batch=16, max_wait_ms=20,
                           filter_coalesce_ms=30)
    f_ag = SearchFilters(tags=["math.AG"])
    futs = [sched.submit(emb[i], k=5, filters=f_ag if i % 3 == 0 else None)
            for i in range(1, 13)]
    for i, fu in enumerate(futs, start=1):
        s, ids = fu.result(30)
        filtered = i % 3 == 0
        if not filtered or i % 2 == 1:
            # self-match whenever doc i passes the request's filter
            assert ids[0] == i
        if filtered:
            assert all(eng.meta.primary_category[d] == "math.AG"
                       for d in ids if d >= 0)
    sched.shutdown()


def test_stage_traces_attribute_batches(engine):
    """stats()['stages_ms'] carries per-batch stage percentiles and the
    worst batches' stage mix — the p99 attribution that convicted GC in
    round 4 (experiments/exp_serve_tail.py). Every dispatched batch must
    produce one trace whose stages are finite and whose total covers
    queue+encode+scan+sync; reset_traces() clears the window."""
    eng, emb = engine
    rng = np.random.default_rng(7)
    queries = np.asarray(
        l2_normalize(rng.standard_normal((24, 64)).astype(np.float32))
    )
    sched = BatchScheduler(eng, max_batch=8, max_wait_ms=5)
    try:
        futs = [sched.submit(q, k=3) for q in queries]
        for f in futs:
            f.result(timeout=30)
        st = sched.stats()
        stages = st["stages_ms"]
        for field in ("queue_ms", "encode_ms", "scan_ms",
                      "resolve_wait_ms", "sync_ms", "total_ms"):
            pct = stages[field]
            assert 0.0 <= pct["p50"] <= pct["p99"] <= pct["max"]
        worst = stages["worst_batches"]
        assert worst and all(w["n"] >= 1 for w in worst)
        # total >= the stages the dispatch thread itself timed
        for w in worst:
            assert w["total_ms"] >= w["sync_ms"] - 1e-6
        assert sum(w["n"] for w in worst) <= st["queries"]
        sched.reset_traces()
        st2 = sched.stats()
        assert "stages_ms" not in st2 and "latency_ms" not in st2
    finally:
        sched.shutdown()


def test_heterogeneous_filters_coalesce_into_one_scan(engine):
    """Requests spanning MANY distinct filter signatures coalesce into
    few grouped scans (per-query mask rows) instead of per-signature
    micro-batches: 24 requests over 6 signatures should share a handful
    of engine dispatches, and every result matches the direct engine."""
    eng, emb = engine
    assert eng.supports_grouped_filters
    sched = BatchScheduler(
        eng, max_batch=64, max_wait_ms=5,
        filter_coalesce_ms=80.0, filter_coalesce_min=24,
    )
    sigs = [
        SearchFilters(tags=["math.AG"]),
        SearchFilters(tags=["math.NT"]),
        SearchFilters(year_range=(2020, 2020)),
        SearchFilters(citation_range=(10, 400)),
        SearchFilters(sources=["arXiv"]),
        SearchFilters(journal_status="Preprint Only"),
    ]
    b0 = dict(sched.stats())
    futs = [
        (i, sched.submit(emb[i + 1], k=5, filters=sigs[i % 6]))
        for i in range(24)
    ]
    results = [(i, f.result(20)) for i, f in futs]
    b1 = sched.stats()
    # 24 requests over 6 signatures: grouped coalescing keeps this to a
    # few dispatches (per-signature would need >= 6)
    assert b1["batches"] - b0["batches"] <= 3, b1
    # at least one dispatched batch carried multiple signatures
    assert any(t.g > 1 for t in sched._traces), [t.g for t in sched._traces]
    for i, (s, ids) in results:
        s_ref, i_ref = eng.search_vectors(emb[i + 1][None], k=5,
                                          filters=sigs[i % 6])
        assert set(ids.tolist()) == set(i_ref[0].tolist()), f"req {i}"
    sched.shutdown()


def test_grouped_scheduler_over_sharded_engine_matches_single(engine):
    """Grouped filtered coalescing over the MESH engine: results equal
    the single-device engine for every signature in the mix."""
    from theoremsearch_tpu.core import IndexConfig as IC, MeshConfig, make_mesh

    rng = np.random.default_rng(9)
    emb = np.asarray(l2_normalize(rng.standard_normal((1024, 64)).astype(np.float32)))
    rows = [
        {"paper_id": f"p{i}", "paper_title": "T", "authors": [],
         "link": "https://arxiv.org/abs/x", "year": 2000 + i % 20,
         "primary_category": "math.AG" if i % 2 else "math.NT",
         "journal_ref": None, "citations": i, "theorem_name": "Theorem 1.",
         "theorem_body": "b", "slogan": "s"}
        for i in range(1024)
    ]
    idx = FlatIndex.build(
        emb, config=IC(pad_multiple=256, dtype="int8", int8_scale="global"),
        normalize=False,
    )
    mesh = make_mesh(MeshConfig(data=1, shard=4))
    eng_m = SearchEngine(
        idx, meta=CorpusMetadata.from_rows(rows), mesh=mesh, use_pallas=True,
        pallas_interpret=True, row_block=128, rescore_vectors=emb,
        rescore_factor=8,
    )
    eng_1 = SearchEngine(
        idx, meta=CorpusMetadata.from_rows(rows), use_pallas=True,
        pallas_interpret=True, row_block=128, rescore_vectors=emb,
        rescore_factor=8,
    )
    sched = BatchScheduler(eng_m, max_batch=32, max_wait_ms=10,
                           filter_coalesce_ms=60, filter_coalesce_min=12)
    sigs = [None, SearchFilters(tags=["math.AG"]),
            SearchFilters(year_range=(2005, 2012)),
            SearchFilters(citation_range=(0, 100))]
    futs = [(i, sched.submit(emb[i], k=6, filters=sigs[i % 4]))
            for i in range(2, 18)]
    for i, fu in futs:
        s, ids = fu.result(30)
        _, i_ref = eng_1.search_vectors(emb[i][None], k=6, filters=sigs[i % 4])
        assert set(ids.tolist()) == set(i_ref[0].tolist()), f"req {i}"
    sched.shutdown()
