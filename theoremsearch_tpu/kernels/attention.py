"""Fused encoder attention: QK-RMSNorm + RoPE + softmax(QK^T)V in one
Pallas kernel.

Why this exists: the serving encoder runs at short sequence lengths
(S=32/64 buckets — slogans are <=4 sentences), where attention FLOPs are
negligible (<1% of the forward) but the XLA composition of per-head
RMSNorm -> RoPE -> GQA repeat -> (B,S,H,D)->(B,H,S,S) einsum -> softmax
-> PV costs ~1/3 of the whole step in layout transposes, tiny
(32xD)x(Dx32) matmuls, and HBM round-trips between unfused stages
(README round-2 measurement: attention ~2/3 of a 181 ms step while its
FLOPs are ~1%). The serving bottleneck is the encoder
(SERVE_BENCH_r02.json), so this block is where the e2e leverage lives.

Design:
- Grid over batch blocks of BB = max(1, 128 // S) items, so each
  packed q/k tile is (BB*S = 128, Dh) — the MXU's native shape. The
  whole block-diagonal (128, 128) logits tile is computed in ONE matmul
  per head; cross-item blocks are masked with an additive bias computed
  once per grid step. FLOP waste from packing is BB x on <1% of the
  forward's FLOPs — noise, traded for ~16x fewer, full-width MXU ops.
- All intermediates (normed/rotated q,k, logits, probs) live in
  VMEM/registers: per layer the kernel reads q,k,v once from HBM and
  writes the attention output once — the XLA path re-materializes
  several (B,S,H,D)-sized tensors per layer.
- GQA is an index (head h reads kv head h // (H/Hk)); no repeated-k/v
  materialization (the repeat path measured 133 ms vs this design's
  fused cost; a no-repeat XLA einsum was SLOWER than repeat — see
  encoder/model.py note).
- f32 for norms/softmax accumulation, bf16 on the MXU — bit-compatible
  with the XLA reference path's precision choices.

Autodiff: serving is forward-only; for training, `fused_attention` has a
custom VJP whose backward recomputes the XLA reference composition
(kernels stay forward-only; the trainer's remat policy already
recomputes attention).

Reference being replaced: the reference's encoder is
sentence-transformers/PyTorch (ec2/generate_embeddings/embeddings.py:11)
— its hot loop is the same Qwen3-Embedding forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(
    q_ref,     # (BB, S, H*Dh) bf16 — raw q projections
    k_ref,     # (BB, S, Hk*Dh) bf16
    v_ref,     # (BB, S, Hk*Dh) bf16
    qw_ref,    # (1, Dh) f32 q_norm weight
    kw_ref,    # (1, Dh) f32 k_norm weight
    cos_ref,   # (BB, S, half) f32
    sin_ref,   # (BB, S, half) f32
    mask_ref,  # (1, 1, BB*S) int32 padding mask (pre-flattened: a
               # (BB, S) block violates Mosaic's last-two-dims rule)
    o_ref,     # (BB, S, H*Dh) bf16
    kr_buf,    # VMEM scratch (BB*S, Hk*Dh) bf16 — normed+rotated k
    *,
    num_heads: int,
    num_kv_heads: int,
    head_dim: int,
    eps: float,
    causal: bool,
    scale: float,
):
    bb, s, _ = q_ref.shape
    t = bb * s
    half = head_dim // 2

    cos = cos_ref[...].reshape(t, half)
    sin = sin_ref[...].reshape(t, half)

    def norm_rope(x2d, w):
        xf = x2d.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + eps) * w
        x1, x2 = xf[:, :half], xf[:, half:]
        return jnp.concatenate(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
        )

    # additive bias tile, shared by every head: block-diagonal (items
    # only attend within themselves) x causal x key-padding
    row = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    valid = (row // s) == (col // s)
    if causal:
        valid &= (row % s) >= (col % s)
    kvalid = mask_ref[0] != 0  # (1, t)
    valid &= kvalid
    bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)

    kw = kw_ref[0, :][None, :]
    qw = qw_ref[0, :][None, :]

    # normed+rotated k for each kv head, staged once in VMEM
    for g in range(num_kv_heads):
        sl = slice(g * head_dim, (g + 1) * head_dim)
        kr_buf[:, sl] = norm_rope(
            k_ref[...].reshape(t, num_kv_heads * head_dim)[:, sl], kw
        ).astype(jnp.bfloat16)

    q2d = q_ref[...].reshape(t, num_heads * head_dim)
    v2d = v_ref[...].reshape(t, num_kv_heads * head_dim)
    rep = num_heads // num_kv_heads
    for h in range(num_heads):
        g = h // rep
        qh = (norm_rope(q2d[:, h * head_dim : (h + 1) * head_dim], qw) * scale
              ).astype(jnp.bfloat16)
        kh = kr_buf[:, g * head_dim : (g + 1) * head_dim]
        logits = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
        vh = v2d[:, g * head_dim : (g + 1) * head_dim]
        oh = jnp.dot(probs, vh, preferred_element_type=jnp.float32)
        o_ref[:, :, h * head_dim : (h + 1) * head_dim] = (
            oh.astype(jnp.bfloat16).reshape(bb, s, head_dim)
        )


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "num_kv_heads", "head_dim", "eps",
                     "causal", "scale", "interpret"),
)
def fused_qknorm_rope_attention(
    q: jax.Array,      # (B, S, H*Dh) bf16 — raw projections (pre-norm)
    k: jax.Array,      # (B, S, Hk*Dh)
    v: jax.Array,      # (B, S, Hk*Dh)
    q_norm_w: jax.Array,  # (Dh,) f32
    k_norm_w: jax.Array,  # (Dh,) f32
    cos: jax.Array,    # (B, S, Dh//2) f32
    sin: jax.Array,    # (B, S, Dh//2) f32
    mask: jax.Array,   # (B, S) int32/bool — 1 = real token
    *,
    num_heads: int,
    num_kv_heads: int,
    head_dim: int,
    eps: float = 1e-6,
    causal: bool = True,
    scale: float | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused attention block output (B, S, H*Dh) bf16 (pre-wo).

    Requires head_dim a multiple of 128 lanes (128 for the qwen 0.6B
    config, 256 for embeddinggemma) and B a multiple of the packing
    factor max(1, 128 // S) — guaranteed by the pow2 batch buckets.
    `scale` overrides the 1/sqrt(head_dim) logit scaling (gemma uses
    query_pre_attn_scalar**-0.5); gemma-form (1+w) RMSNorm is expressed
    by passing the pre-adjusted weights 1 + w."""
    b, s, _ = q.shape
    bb = max(1, 128 // s)
    if b % bb:
        raise ValueError(f"batch {b} not a multiple of packing factor {bb}")
    half = head_dim // 2
    grid = (b // bb,)

    kernel = functools.partial(
        _attn_kernel,
        num_heads=num_heads,
        num_kv_heads=num_kv_heads,
        head_dim=head_dim,
        eps=eps,
        causal=causal,
        scale=float(scale) if scale is not None else 1.0 / np.sqrt(head_dim),
    )
    t = bb * s
    flops = 2 * 2 * b * num_heads * s * (t * head_dim)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, s, num_heads * head_dim), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, s, num_kv_heads * head_dim), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, s, num_kv_heads * head_dim), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, head_dim), lambda i: (0, 0)),
            pl.BlockSpec((1, head_dim), lambda i: (0, 0)),
            pl.BlockSpec((bb, s, half), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, s, half), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, bb * s), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, s, num_heads * head_dim), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, num_heads * head_dim), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((t, num_kv_heads * head_dim), jnp.bfloat16),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * b * s * (2 * num_heads + 2 * num_kv_heads) * head_dim,
            transcendentals=b * num_heads * s * t,
        ),
    )(
        q.astype(jnp.bfloat16),
        k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16),
        q_norm_w.astype(jnp.float32).reshape(1, head_dim),
        k_norm_w.astype(jnp.float32).reshape(1, head_dim),
        cos.astype(jnp.float32),
        sin.astype(jnp.float32),
        mask.astype(jnp.int32).reshape(b // bb, 1, bb * s),
    )
