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

Autodiff: `fused_qknorm_rope_attention_bwd` is a REAL fused backward
(round-4): one Pallas kernel per batch block recomputes the normed/
rotated q,k and the probs in VMEM (nothing saved from the forward —
matching the trainer's remat policy) and emits dq/dk/dv plus the
QK-norm weight grads via transpose matmuls and the softmax/RMSNorm
adjoints. At the serving/training sequence lengths (S <= 128) the whole
(128, 128) logits tile lives in VMEM, so no flash-style streaming or
row-max bookkeeping is needed. encoder/model.py wires it as the
custom-VJP backward of the fused forward; round 3's interim backward
(jax.vjp of the XLA reference composition) lost to plain XLA by 6%
because it re-ran the reference forward (TRAIN_BENCH_r03.json).

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


def _attn_bwd_kernel(
    q_ref,     # (BB, S, H*Dh) bf16 — raw q projections (pre-norm)
    k_ref,     # (BB, S, Hk*Dh) bf16
    v_ref,     # (BB, S, Hk*Dh) bf16
    qw_ref,    # (1, Dh) f32
    kw_ref,    # (1, Dh) f32
    cos_ref,   # (BB, S, half) f32
    sin_ref,   # (BB, S, half) f32
    mask_ref,  # (1, 1, BB*S) int32
    g_ref,     # (BB, S, H*Dh) bf16 — upstream dL/d(attn out)
    dq_ref,    # (BB, S, H*Dh) bf16
    dk_ref,    # (BB, S, Hk*Dh) bf16
    dv_ref,    # (BB, S, Hk*Dh) bf16
    dqw_ref,   # (1, Dh) f32 — accumulated across grid steps
    dkw_ref,   # (1, Dh) f32
    *,
    num_heads: int,
    num_kv_heads: int,
    head_dim: int,
    eps: float,
    causal: bool,
    scale: float,
):
    """Fused backward for one batch block: recomputes the forward's
    intermediates in VMEM (norm+rope'd q/k, per-head probs) and applies
    the adjoints — softmax backward, transpose matmuls for dq/dk/dv,
    rotation-transpose for RoPE, and the RMSNorm adjoint
    dx = r*(dxn - xn*mean(dxn*xn)) with dw += sum(dz * xn)."""
    bb, s, _ = q_ref.shape
    t = bb * s
    half = head_dim // 2
    dh = head_dim

    cos = cos_ref[...].reshape(t, half)
    sin = sin_ref[...].reshape(t, half)

    row = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    valid = (row // s) == (col // s)
    if causal:
        valid &= (row % s) >= (col % s)
    valid &= mask_ref[0] != 0
    bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)

    kw = kw_ref[0, :][None, :]
    qw = qw_ref[0, :][None, :]

    def norm_rope_parts(x2d, w):
        """(rotated output f32, normalized-pre-weight xn f32, r f32)."""
        xf = x2d.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        r = jax.lax.rsqrt(var + eps)
        xn = xf * r
        z = xn * w
        z1, z2 = z[:, :half], z[:, half:]
        y = jnp.concatenate([z1 * cos - z2 * sin, z2 * cos + z1 * sin], axis=-1)
        return y, xn, r

    def rope_t(d):
        """Transpose of the rotation (its inverse — rotations are
        orthogonal): dz given dy."""
        d1, d2 = d[:, :half], d[:, half:]
        return jnp.concatenate([d1 * cos + d2 * sin, d2 * cos - d1 * sin], axis=-1)

    def norm_bwd(dz, xn, r, w):
        """(dx, dw_partial) of y = rope((x * r) * w)."""
        dxn = dz * w
        dw = jnp.sum(dz * xn, axis=0, keepdims=True)
        proj = jnp.sum(dxn * xn, axis=-1, keepdims=True) / dh
        return r * (dxn - xn * proj), dw

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dqw_ref[...] = jnp.zeros_like(dqw_ref)
        dkw_ref[...] = jnp.zeros_like(dkw_ref)

    q2d = q_ref[...].reshape(t, num_heads * dh)
    k2d = k_ref[...].reshape(t, num_kv_heads * dh)
    v2d = v_ref[...].reshape(t, num_kv_heads * dh)
    g2d = g_ref[...].reshape(t, num_heads * dh)
    rep = num_heads // num_kv_heads

    qw_acc = jnp.zeros((1, dh), jnp.float32)
    kw_acc = jnp.zeros((1, dh), jnp.float32)
    for g in range(num_kv_heads):
        ksl = slice(g * dh, (g + 1) * dh)
        ky, xn_k, r_k = norm_rope_parts(k2d[:, ksl], kw)
        kh = ky.astype(jnp.bfloat16)
        vh = v2d[:, ksl]
        dkn = jnp.zeros((t, dh), jnp.float32)
        dvh = jnp.zeros((t, dh), jnp.float32)
        for h in range(g * rep, (g + 1) * rep):
            qsl = slice(h * dh, (h + 1) * dh)
            qy, xn_q, r_q = norm_rope_parts(q2d[:, qsl], qw)
            qh = (qy * scale).astype(jnp.bfloat16)
            logits = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bias
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            pb = p.astype(jnp.bfloat16)
            gh = g2d[:, qsl]
            # dv_h += P^T @ g   (forward: out = P @ v)
            dvh += jax.lax.dot_general(
                pb, gh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # softmax backward: dl = P * (dp - rowsum(dp * P))
            dp = jax.lax.dot_general(
                gh, vh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dl = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dlb = dl.astype(jnp.bfloat16)
            # logits = (qn * scale) @ kn^T
            dqy = jnp.dot(
                dlb, kh, preferred_element_type=jnp.float32
            ) * scale
            dkn += jax.lax.dot_general(
                dlb, qh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dxq, dwq = norm_bwd(rope_t(dqy), xn_q, r_q, qw)
            qw_acc += dwq
            dq_ref[:, :, qsl] = dxq.astype(jnp.bfloat16).reshape(bb, s, dh)
        dxk, dwk = norm_bwd(rope_t(dkn), xn_k, r_k, kw)
        kw_acc += dwk
        dk_ref[:, :, ksl] = dxk.astype(jnp.bfloat16).reshape(bb, s, dh)
        dv_ref[:, :, ksl] = dvh.astype(jnp.bfloat16).reshape(bb, s, dh)
    dqw_ref[...] += qw_acc
    dkw_ref[...] += kw_acc


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "num_kv_heads", "head_dim", "eps",
                     "causal", "scale", "interpret"),
)
def fused_qknorm_rope_attention_bwd(
    q: jax.Array,      # (B, S, H*Dh) bf16 — raw projections (pre-norm)
    k: jax.Array,      # (B, S, Hk*Dh)
    v: jax.Array,      # (B, S, Hk*Dh)
    q_norm_w: jax.Array,  # (Dh,)
    k_norm_w: jax.Array,  # (Dh,)
    cos: jax.Array,    # (B, S, Dh//2) f32
    sin: jax.Array,    # (B, S, Dh//2) f32
    mask: jax.Array,   # (B, S)
    g: jax.Array,      # (B, S, H*Dh) — upstream gradient
    *,
    num_heads: int,
    num_kv_heads: int,
    head_dim: int,
    eps: float = 1e-6,
    causal: bool = True,
    scale: float | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """(dq, dk, dv, dqw, dkw) of fused_qknorm_rope_attention.

    Nothing is saved from the forward: the kernel recomputes the
    normed/rotated q,k and per-head probs per batch block (the trainer
    remats attention anyway) and pays ~2x the forward's matmul FLOPs —
    all full-width (128, Dh)-shaped MXU ops, none of the XLA reference
    composition's layout transposes. Same shape constraints as the
    forward. dqw/dkw return f32 (Dh,)."""
    b, s, _ = q.shape
    bb = max(1, 128 // s)
    if b % bb:
        raise ValueError(f"batch {b} not a multiple of packing factor {bb}")
    half = head_dim // 2
    t = bb * s
    grid = (b // bb,)
    kernel = functools.partial(
        _attn_bwd_kernel,
        num_heads=num_heads,
        num_kv_heads=num_kv_heads,
        head_dim=head_dim,
        eps=eps,
        causal=causal,
        scale=float(scale) if scale is not None else 1.0 / np.sqrt(head_dim),
    )
    flops = 4 * 2 * b * num_heads * s * (t * head_dim)
    dq, dk, dv, dqw, dkw = pl.pallas_call(
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
            pl.BlockSpec((bb, s, num_heads * head_dim), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bb, s, num_heads * head_dim), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, s, num_kv_heads * head_dim), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, s, num_kv_heads * head_dim), lambda i: (i, 0, 0)),
            # norm-weight grads: every grid step accumulates into the
            # SAME (1, Dh) block — TPU grids run sequentially
            pl.BlockSpec((1, head_dim), lambda i: (0, 0)),
            pl.BlockSpec((1, head_dim), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, num_heads * head_dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, s, num_kv_heads * head_dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, s, num_kv_heads * head_dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, head_dim), jnp.float32),
            jax.ShapeDtypeStruct((1, head_dim), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * b * s * (2 * num_heads + 2 * num_kv_heads) * head_dim,
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
        g.astype(jnp.bfloat16),
    )
    return dq, dk, dv, dqw.reshape(head_dim), dkw.reshape(head_dim)
