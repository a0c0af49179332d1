"""Exact brute-force cosine/MIPS oracle.

The ground truth every approximate configuration is gated against
(BASELINE.json: "recall@10 vs exact on validation_set.csv"). Equivalent to
the reference's `util.cos_sim` matrix (compare_embeddings.py:61) and to
pgvector's exact `<#>` scan (streamlit_app.py:281) — both are exact
inner-product search; with L2-normalized vectors cosine == inner product.

Computed in fp32 on-device: a single (Q, D) x (D, N) matmul + lax.top_k.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def exact_sim_matrix(queries: jax.Array, corpus: jax.Array) -> jax.Array:
    """(Q, D) x (N, D) -> (Q, N) inner-product scores in fp32.

    precision=HIGHEST is load-bearing: TPU fp32 matmuls default to
    bf16-truncated operands, which silently turns the "exact" oracle into
    a bf16-grade one — measured recall against it then FAVORS rescore
    paths whose own errors correlate with bf16 truncation (the bf16
    rescore copy) and penalizes more accurate ones (the two-level
    residual rescore). HIGHEST forces the multi-pass fp32 emulation."""
    return jnp.dot(
        queries.astype(jnp.float32),
        corpus.astype(jnp.float32).T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@partial(jax.jit, static_argnames="k")
def _exact_topk_jit(queries: jax.Array, corpus: jax.Array, *, k: int):
    sims = exact_sim_matrix(queries, corpus)
    return jax.lax.top_k(sims, k)


def exact_topk(
    queries: np.ndarray | jax.Array,
    corpus: np.ndarray | jax.Array,
    k: int = 10,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact top-k by inner product. Returns (scores, ids), each (Q, k)."""
    queries = jnp.asarray(queries)
    corpus = jnp.asarray(corpus)
    k = min(k, corpus.shape[0])
    scores, ids = _exact_topk_jit(queries, corpus, k=k)
    return np.asarray(scores), np.asarray(ids)


def l2_normalize(x: np.ndarray | jax.Array, axis: int = -1, eps: float = 1e-12):
    """Match the reference's normalize_embeddings=True everywhere
    (ec2/generate_embeddings/embeddings.py:27,35; streamlit_app.py:173)."""
    x = jnp.asarray(x, dtype=jnp.float32)
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)
