"""Embedding quantization — the equal-memory knob (BASELINE.json).

int8 symmetric per-row quantization: each embedding row r is stored as
int8 codes plus one fp32 scale s_r = max|r|/127, so that
q . r  ≈  s_r * (q . codes_r). Because scores are only compared *within*
a query, per-row scales preserve MIPS ranking to quantization error.

The reference stores fp32 pgvector columns (rds_schema.sql:45-57) and has
no quantization; this is the TPU-native memory/bandwidth optimization that
makes a 1M-corpus-per-chip HBM-resident index feasible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def quantize_int8(x: np.ndarray | jax.Array) -> tuple[np.ndarray, np.ndarray]:
    """Per-row symmetric int8. Returns (codes int8 (N,D), scales fp32 (N,)).

    Delegates to the multi-threaded C++ kernel (utils/native.py) when the
    native library is available; numpy otherwise (identical results)."""
    from ..utils import native

    return native.quantize_int8(np.asarray(x, dtype=np.float32))


def dequantize_int8(codes: np.ndarray, scales: np.ndarray) -> np.ndarray:
    return codes.astype(np.float32) * scales[:, None]


def quantize_global_int8(
    x: np.ndarray | jax.Array, clip_pct: float = 100.0
) -> tuple[np.ndarray, float]:
    """Global-scale symmetric int8: ONE scale for the whole corpus.

    Ranking of the int32 accumulator q8 . codes_r across rows r is then
    the ranking of the quantized scores directly — no per-row dequant
    multiply in the scan kernel's hot loop (kernels/mips.py
    fused_mips_topk_g exploits this: scores stay int32 end-to-end).
    Rows with small max|x| use fewer of the 255 levels than per-row
    scaling would give them; pair with candidate oversampling + exact
    rescoring (the engine's honest serving config).

    clip_pct: percentile of |x| used as the clip point (100 = exact max;
    99.9 trades outlier rows for resolution everywhere else).
    """
    from ..utils import native

    xf = np.asarray(x, dtype=np.float32)
    if clip_pct >= 100.0:
        # threaded C++ absmax + quantize (numpy fallback chunks to bound
        # temporaries) — this was the host hotspot of warm IVF rebuilds
        return native.quantize_global_int8(xf)
    amax = float(np.percentile(np.abs(xf), clip_pct))
    scale = amax / 127.0 if amax > 0 else 1.0
    return native.quantize_global_int8(xf, scale=scale)


def quantize_residual_int8(
    x: np.ndarray | jax.Array,
    codes_g: np.ndarray,
    gscale: float,
    chunk: int = 262_144,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row int8 codes of the RESIDUAL x - gscale*codes_g.

    Two-level quantization: the global-scale scan codes are the coarse
    level (step = gscale); the residual lies in [-gscale/2, gscale/2],
    so its per-row int8 scale is ~gscale/254 — reconstruction
    gscale*cg + s_r*cr carries ~15 effective bits, ~10x less error than
    a bf16 copy (8-bit mantissa), at 1 byte/dim instead of 2. Pairs with
    device_rescore_residual for the 2-bytes/dim serving index.

    Returns (res_codes int8 (N,D), res_scales fp32 (N,)).
    """
    from ..utils import native

    xf = np.asarray(x, dtype=np.float32)
    n = xf.shape[0]
    # sized from x, NOT codes_g: codes_g may be pad-extended (e.g.
    # FlatIndex.vectors), and the residual arrays must have exactly the
    # N real rows
    out_codes = np.empty((n, xf.shape[1]), np.int8)
    out_scales = np.empty((n,), np.float32)
    for s in range(0, n, chunk):
        e = min(n, s + chunk)
        r = xf[s:e] - np.float32(gscale) * codes_g[s:e]
        out_codes[s:e], out_scales[s:e] = native.quantize_int8(r)
    return out_codes, out_scales


def dequantize_residual_int8(
    codes_g: np.ndarray, gscale: float, res_codes: np.ndarray, res_scales: np.ndarray
) -> np.ndarray:
    return (
        np.float32(gscale) * codes_g.astype(np.float32)
        + res_scales[:, None] * res_codes.astype(np.float32)
    )


def int8_scores(queries: jax.Array, codes: jax.Array, scales: jax.Array) -> jax.Array:
    """Reference (non-Pallas) int8 scoring path: fp32 accumulate of
    q @ codes.T, then per-row rescale. XLA lowers the int8 matmul onto the
    MXU with int32 accumulation where supported."""
    q = queries.astype(jnp.float32)
    s = jnp.dot(q, codes.astype(jnp.float32).T, preferred_element_type=jnp.float32)
    return s * scales[None, :]
