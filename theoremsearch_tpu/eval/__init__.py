from .metrics import (
    precision_at_k,
    hit_at_k,
    mrr_at_k,
    ndcg_at_k,
    err_at_k,
    q_measure_at_k,
    recall_vs_exact,
    evaluate_retrieval,
)
from .oracle import exact_topk, exact_sim_matrix
from .harness import load_validation_set, build_qrels, ValidationExample

__all__ = [
    "precision_at_k",
    "hit_at_k",
    "mrr_at_k",
    "ndcg_at_k",
    "err_at_k",
    "q_measure_at_k",
    "recall_vs_exact",
    "evaluate_retrieval",
    "exact_topk",
    "exact_sim_matrix",
    "load_validation_set",
    "build_qrels",
    "ValidationExample",
]
