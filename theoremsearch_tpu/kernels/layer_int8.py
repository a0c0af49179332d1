"""Whole-layer fused int8 (w8a8) encoder kernels: MLP and attention
blocks each as ONE Pallas kernel per layer.

Why this exists: the int8 serving forward at (B=512, S=16) runs the
seven projection matmuls at 69% of the v5e int8 MXU peak *in
isolation* (26.4 ms floor), but the full forward measures ~49-55 ms —
the gap is the dequant/requant pointwise chains, 56 residual adds, and
inter-op HBM round trips between XLA fusion boundaries
(experiments/exp_enc_profile.py). Each intermediate tensor at this
shape is 16-100 MB; materializing them costs more HBM time than the
matmuls cost MXU time. These kernels keep a whole transformer
sub-block's intermediates in VMEM:

- ``fused_mlp_int8_layer``: pre-RMSNorm -> per-token int8 quant ->
  gate/up int8 matmuls -> SiLU*up -> requant -> down int8 matmul ->
  dequant -> residual add. One read of x from HBM, one write.
- ``fused_attn_int8_layer``: pre-RMSNorm -> quant -> q/k/v int8
  matmuls -> QK-RMSNorm + RoPE + block-packed attention (the
  kernels/attention.py core) -> per-token quant -> o int8 matmul ->
  residual add. One read of x, one write.

Weights stay VMEM-resident: the int8 codes (9.4 MB for the 0.6B MLP,
6 MB for attention) are DMA'd from HBM into scratch once at grid step
0 and reused by every token tile — the grid is sequential on TPU, so
later steps skip the copy. Activation tiles are 128 tokens (the MXU's
native M), giving (128, D) x (D, I) int8 dots per step.

Numerics match encoder/model.py's _mlp_int8/_attention_int8 chain:
f32 norms and scale arithmetic, round-to-nearest-even clip to +-127,
int8 x int8 -> int32 MXU dots, f32 dequant, bf16 residual adds, and
the chain's bf16 round-trips at the re-quantization boundaries
(h -> bf16 -> _quant_act, attn out -> bf16 -> _quant_act) are
reproduced in-kernel. Residual rounding-level divergence remains in
op order inside a tile (e.g. the fused norm+quant computes x*(r/s)*w
in one expression); parity tests gate at cosine > 0.9999.

Reference being replaced: the reference's encoder hot loop is the
same Qwen3-Embedding forward inside sentence-transformers/PyTorch
(ec2/generate_embeddings/embeddings.py:11); serving here is
encoder-bound (SERVE_BENCH_r03.json), so this is where e2e leverage
lives. Forward-only: the int8 path is an opt-in serving mode
(training uses the bf16 XLA composition).

Both reference embedder families with glu MLPs run through these
kernels: qwen form (pre-norm only, SwiGLU, causal) and gemma form
(sandwich norms, GeGLU, bidirectional) — the gemma (1+w) norm weights
arrive PRE-ADJUSTED from the caller, the post-norms are an optional
epilogue before the residual add, and the activation is a static
switch. encoder/gemma.py:_fused_layer wires the gemma composition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TT = 128  # token tile: MXU-native M


# the weight scratch stays resident across every grid step, sharing
# VMEM (128 MiB on v5e) with the per-tile activation blocks and f32
# intermediates — cap it well under half so qualifying-alignment but
# larger-than-serving towers (e.g. a Qwen3-4B-class config at 75 MB of
# MLP weights) fall back to the op-chain instead of failing the Mosaic
# compile with VMEM exhaustion. Each pallas_call also passes an
# explicit CompilerParams(vmem_limit_bytes=...) sized from the
# resident weights + activation blocks (_vmem_params below): the
# Mosaic DEFAULT cap (~16 MB, see kernels/mips.py) is far below this
# budget, so a 16-48 MB tower would pass this gate and then fail the
# compile if the kernel didn't raise the cap itself.
_WEIGHT_VMEM_BUDGET = 48 * 1024 * 1024


def _vmem_params(need: int) -> dict:
    """CompilerParams raising the Mosaic VMEM cap when the resident
    weights + activation blocks exceed its ~16 MB default (same
    need*1.75 headroom pattern as kernels/mips.py)."""
    if need <= 14 * 2**20:
        return {}
    return {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=min(int(need * 1.75), 120 * 2**20)
        )
    }


def fused_layer_shapes_ok(d: int, i: int, hq_d: int, hk_d: int) -> bool:
    """Whether the whole-layer kernels support these model dims: every
    VMEM weight tile 128-lane aligned, and the per-kernel resident int8
    weight scratch (MLP: gate/up/down = 3*d*i; attention: q/k/v/o =
    2*d*(hq_d + hk_d)) within budget. Both encoder families gate their
    `_fused_layer_ok` on this — the requirement lives here, next to the
    kernels that impose it."""
    if any(x % 128 for x in (d, i, hq_d, hk_d)):
        return False
    return max(3 * d * i, 2 * d * (hq_d + hk_d)) <= _WEIGHT_VMEM_BUDGET


def _rmsnorm_quant(xf: jax.Array, wn: jax.Array, eps: float):
    """f32 (TT, D) -> int8 codes + f32 (TT, 1) scales; same math as
    encoder/model.py:_rmsnorm_quant_act (norm fused into the quant so
    the normed tensor never exists)."""
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    m = jnp.max(jnp.abs(xf) * jnp.abs(wn), axis=-1, keepdims=True) * r
    s = jnp.maximum(m / 127.0, 1e-12)
    q = jnp.clip(jnp.round(xf * (r / s) * wn), -127, 127).astype(jnp.int8)
    return q, s


def _quant_rows(xf: jax.Array):
    """f32 -> int8 codes + per-row scales (model.py:_quant_act)."""
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def _i8_dot(xq: jax.Array, w: jax.Array) -> jax.Array:
    return jax.lax.dot_general(
        xq, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def _post_norm(yf: jax.Array, pw: jax.Array, eps: float) -> jax.Array:
    """Gemma sandwich post-norm on a block output (f32, weight
    pre-adjusted (1+w)); matches encoder/gemma.py:_gemma_rms_norm on the
    bf16 block output, so quantize-to-bf16 first."""
    yf = yf.astype(jnp.bfloat16).astype(jnp.float32)
    var = jnp.mean(yf * yf, axis=-1, keepdims=True)
    return yf * jax.lax.rsqrt(var + eps) * pw


def _glu_act(g: jax.Array, act: str) -> jax.Array:
    if act == "silu":
        return jax.nn.silu(g)
    if act == "gelu_tanh":
        return jax.nn.gelu(g, approximate=True)
    raise ValueError(f"unknown glu activation {act!r}")


# ---------------------------------------------------------------------------
# MLP block
# ---------------------------------------------------------------------------


def _mlp_kernel(
    x_ref,      # (TT, D) bf16 VMEM
    nw_ref,     # (1, D) f32 VMEM — mlp pre-norm weight (pre-adjusted)
    pw_ref,     # (1, D) f32 VMEM — post-norm weight (ones when post=False)
    wgs_ref,    # (1, I) f32 VMEM — per-column scales
    wus_ref,    # (1, I) f32
    wds_ref,    # (1, D) f32
    wg_hbm,     # (D, I) int8 ANY (HBM)
    wu_hbm,     # (D, I) int8 ANY
    wd_hbm,     # (I, D) int8 ANY
    o_ref,      # (TT, D) bf16 VMEM
    wg_v,       # (D, I) int8 VMEM scratch — resident weights
    wu_v,
    wd_v,
    sems,       # (3,) DMA semaphores
    *,
    eps: float,
    act: str,
    post: bool,
):
    @pl.when(pl.program_id(0) == 0)
    def _load_weights():
        cg = pltpu.make_async_copy(wg_hbm, wg_v, sems.at[0])
        cu = pltpu.make_async_copy(wu_hbm, wu_v, sems.at[1])
        cd = pltpu.make_async_copy(wd_hbm, wd_v, sems.at[2])
        cg.start(); cu.start(); cd.start()
        cg.wait(); cu.wait(); cd.wait()

    xf = x_ref[...].astype(jnp.float32)
    xq, sx = _rmsnorm_quant(xf, nw_ref[0, :][None, :], eps)
    g = _i8_dot(xq, wg_v[...]).astype(jnp.float32) * sx * wgs_ref[0, :][None, :]
    u = _i8_dot(xq, wu_v[...]).astype(jnp.float32) * sx * wus_ref[0, :][None, :]
    # bf16 round-trip before the re-quant, matching the op-chain's
    # `h = (silu(gate) * up).astype(x.dtype)` feeding _quant_act
    h = (_glu_act(g, act) * u).astype(jnp.bfloat16).astype(jnp.float32)
    hq, sh = _quant_rows(h)
    d = _i8_dot(hq, wd_v[...]).astype(jnp.float32) * sh * wds_ref[0, :][None, :]
    if post:
        d = _post_norm(d, pw_ref[0, :][None, :], eps)
    # residual add in bf16 (the chain adds x + block_out with both bf16)
    o_ref[...] = x_ref[...] + d.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("eps", "act", "interpret"))
def fused_mlp_int8_layer(
    x: jax.Array,        # (B, S, D) or (T, D) bf16 — pre-norm residual stream
    norm_w: jax.Array,   # (D,) — mlp pre-norm weight (gemma: pass 1 + w)
    wg: dict,            # {"q": (D, I) int8, "s": (I,) f32} from _quant_weight
    wu: dict,
    wd: dict,            # {"q": (I, D) int8, "s": (D,) f32}
    post_w: jax.Array | None = None,   # (D,) sandwich post-norm (1 + w), or None
    *,
    eps: float = 1e-6,
    act: str = "silu",
    interpret: bool = False,
) -> jax.Array:
    """x + [post_norm](GLU-MLP_int8(RMSNorm(x))), one kernel.

    qwen form: act='silu', post_w=None; gemma form: act='gelu_tanh',
    norm_w/post_w pre-adjusted (1 + w). Returns x.shape bf16."""
    shape = x.shape
    d = shape[-1]
    i = wg["q"].shape[1]
    x2 = x.reshape(-1, d).astype(jnp.bfloat16)
    t = x2.shape[0]
    t_pad = -(-t // _TT) * _TT
    if t_pad != t:
        # zero rows stay zero through the block (q=0 -> h=0 -> d=0)
        x2 = jnp.pad(x2, ((0, t_pad - t), (0, 0)))
    grid = (t_pad // _TT,)
    post = post_w is not None
    pw = jnp.ones((d,), jnp.float32) if post_w is None else post_w
    # VMEM high-water: resident int8 weights + double-buffered bf16 x/o
    # tiles + the f32 intermediates (xf, g, u, h) and int8 codes
    need = 3 * d * i + _TT * (4 * d + 6 * i) * 4 + _TT * (d + i)
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, eps=float(eps), act=act, post=post),
        grid=grid,
        **_vmem_params(need),
        in_specs=[
            pl.BlockSpec((_TT, d), lambda n: (n, 0)),
            pl.BlockSpec((1, d), lambda n: (0, 0)),
            pl.BlockSpec((1, d), lambda n: (0, 0)),
            pl.BlockSpec((1, i), lambda n: (0, 0)),
            pl.BlockSpec((1, i), lambda n: (0, 0)),
            pl.BlockSpec((1, d), lambda n: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((_TT, d), lambda n: (n, 0)),
        out_shape=jax.ShapeDtypeStruct((t_pad, d), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((d, i), jnp.int8),
            pltpu.VMEM((d, i), jnp.int8),
            pltpu.VMEM((i, d), jnp.int8),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * t_pad * d * i,
            bytes_accessed=3 * d * i + 4 * t_pad * d,
            transcendentals=t_pad * i,
        ),
    )(
        x2,
        norm_w.astype(jnp.float32).reshape(1, d),
        pw.astype(jnp.float32).reshape(1, d),
        wg["s"].astype(jnp.float32).reshape(1, i),
        wu["s"].astype(jnp.float32).reshape(1, i),
        wd["s"].astype(jnp.float32).reshape(1, d),
        wg["q"],
        wu["q"],
        wd["q"],
    )
    return out[:t].reshape(shape)


# ---------------------------------------------------------------------------
# Attention block
# ---------------------------------------------------------------------------


def _attn_layer_kernel(
    x_ref,      # (BB, S, D) bf16 VMEM — residual stream
    nw_ref,     # (1, D) f32 — attn_norm weight
    qw_ref,     # (1, Dh) f32 — q_norm weight
    kw_ref,     # (1, Dh) f32 — k_norm weight
    wqs_ref,    # (1, H*Dh) f32 — per-column scales
    wks_ref,    # (1, Hk*Dh) f32
    wvs_ref,    # (1, Hk*Dh) f32
    wos_ref,    # (1, D) f32
    pw_ref,     # (1, D) f32 — post-norm weight (ones when post=False)
    cos_ref,    # (BB, S, half) f32
    sin_ref,    # (BB, S, half) f32
    mask_ref,   # (1, 1, BB*S) int32
    wq_hbm,     # (D, H*Dh) int8 ANY
    wk_hbm,     # (D, Hk*Dh) int8 ANY
    wv_hbm,     # (D, Hk*Dh) int8 ANY
    wo_hbm,     # (H*Dh, D) int8 ANY
    o_ref,      # (BB, S, D) bf16 VMEM
    wq_v, wk_v, wv_v, wo_v,   # int8 VMEM scratch — resident weights
    kr_buf,     # (BB*S, Hk*Dh) bf16 scratch — normed+rotated k
    ao_buf,     # (BB*S, H*Dh) bf16 scratch — concatenated head outputs
    sems,       # (4,) DMA semaphores
    *,
    num_heads: int,
    num_kv_heads: int,
    head_dim: int,
    eps: float,
    causal: bool,
    scale: float,
    post: bool,
):
    @pl.when(pl.program_id(0) == 0)
    def _load_weights():
        cs = [
            pltpu.make_async_copy(h, v, sems.at[j])
            for j, (h, v) in enumerate(
                ((wq_hbm, wq_v), (wk_hbm, wk_v), (wv_hbm, wv_v), (wo_hbm, wo_v))
            )
        ]
        for c in cs:
            c.start()
        for c in cs:
            c.wait()

    bb, s, d = x_ref.shape
    t = bb * s
    half = head_dim // 2

    # --- pre-norm + quant + q/k/v int8 projections ---
    xf = x_ref[...].reshape(t, d).astype(jnp.float32)
    xq, sx = _rmsnorm_quant(xf, nw_ref[0, :][None, :], eps)
    q2d = (_i8_dot(xq, wq_v[...]).astype(jnp.float32) * sx * wqs_ref[0, :][None, :]
           ).astype(jnp.bfloat16)
    k2d = (_i8_dot(xq, wk_v[...]).astype(jnp.float32) * sx * wks_ref[0, :][None, :]
           ).astype(jnp.bfloat16)
    v2d = (_i8_dot(xq, wv_v[...]).astype(jnp.float32) * sx * wvs_ref[0, :][None, :]
           ).astype(jnp.bfloat16)

    # --- QK-RMSNorm + RoPE + block-packed attention (kernels/attention.py
    # core, inlined so q/k/v never leave VMEM) ---
    cos = cos_ref[...].reshape(t, half)
    sin = sin_ref[...].reshape(t, half)

    def norm_rope(x2, w):
        f = x2.astype(jnp.float32)
        var = jnp.mean(f * f, axis=-1, keepdims=True)
        f = f * jax.lax.rsqrt(var + eps) * w
        x1, x2_ = f[:, :half], f[:, half:]
        return jnp.concatenate(
            [x1 * cos - x2_ * sin, x2_ * cos + x1 * sin], axis=-1
        )

    row = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    valid = (row // s) == (col // s)
    if causal:
        valid &= (row % s) >= (col % s)
    valid &= mask_ref[0] != 0
    bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)

    kw = kw_ref[0, :][None, :]
    qw = qw_ref[0, :][None, :]
    for g in range(num_kv_heads):
        sl = slice(g * head_dim, (g + 1) * head_dim)
        kr_buf[:, sl] = norm_rope(k2d[:, sl], kw).astype(jnp.bfloat16)

    rep = num_heads // num_kv_heads
    for h in range(num_heads):
        g = h // rep
        qh = (norm_rope(q2d[:, h * head_dim:(h + 1) * head_dim], qw) * scale
              ).astype(jnp.bfloat16)
        kh = kr_buf[:, g * head_dim:(g + 1) * head_dim]
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
        vh = v2d[:, g * head_dim:(g + 1) * head_dim]
        ao_buf[:, h * head_dim:(h + 1) * head_dim] = jnp.dot(
            probs, vh, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)

    # --- per-token quant + o int8 projection (+ post-norm) + residual ---
    oq, so = _quant_rows(ao_buf[...].astype(jnp.float32))
    out = _i8_dot(oq, wo_v[...]).astype(jnp.float32) * so * wos_ref[0, :][None, :]
    if post:
        out = _post_norm(out, pw_ref[0, :][None, :], eps)
    # residual add in bf16 (the chain adds x + block_out with both bf16)
    o_ref[...] = (
        x_ref[...].reshape(t, d) + out.astype(jnp.bfloat16)
    ).reshape(bb, s, d)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "num_kv_heads", "head_dim", "eps", "causal",
                     "scale", "interpret"),
)
def _fused_attn_call(
    x, norm_w, q_norm_w, k_norm_w, wq, wk, wv, wo, cos, sin, mask,
    post_w=None,
    *, num_heads, num_kv_heads, head_dim, eps, causal, scale, interpret,
):
    b, s, d = x.shape
    bb = max(1, 128 // s)
    if b % bb:
        raise ValueError(f"batch {b} not a multiple of packing factor {bb}")
    half = head_dim // 2
    t = bb * s
    hq_d, hk_d = num_heads * head_dim, num_kv_heads * head_dim
    post = post_w is not None
    pw = jnp.ones((d,), jnp.float32) if post_w is None else post_w
    kernel = functools.partial(
        _attn_layer_kernel,
        num_heads=num_heads, num_kv_heads=num_kv_heads, head_dim=head_dim,
        eps=eps, causal=causal, scale=scale, post=post,
    )
    # VMEM high-water: resident int8 weights + kr/ao bf16 scratch +
    # double-buffered bf16 x/o tiles, the f32 xf, bf16 q/k/v, and the
    # (t, t) f32 logits/bias pair
    need = (
        2 * d * (hq_d + hk_d)
        + 2 * t * (hq_d + hk_d)
        + t * (8 * d)
        + 2 * t * (hq_d + 2 * hk_d)
        + 2 * t * t * 4
    )
    return pl.pallas_call(
        kernel,
        grid=(b // bb,),
        **_vmem_params(need),
        in_specs=[
            pl.BlockSpec((bb, s, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, head_dim), lambda i: (0, 0)),
            pl.BlockSpec((1, head_dim), lambda i: (0, 0)),
            pl.BlockSpec((1, hq_d), lambda i: (0, 0)),
            pl.BlockSpec((1, hk_d), lambda i: (0, 0)),
            pl.BlockSpec((1, hk_d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((bb, s, half), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, s, half), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((bb, s, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, d), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((d, hq_d), jnp.int8),
            pltpu.VMEM((d, hk_d), jnp.int8),
            pltpu.VMEM((d, hk_d), jnp.int8),
            pltpu.VMEM((hq_d, d), jnp.int8),
            pltpu.VMEM((t, hk_d), jnp.bfloat16),
            pltpu.VMEM((t, hq_d), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            # qkv projections d x (hq_d + 2 hk_d), o projection hq_d x d
            flops=2 * b * s * d * (2 * hq_d + 2 * hk_d)
            + 4 * b * num_heads * s * t * head_dim,
            bytes_accessed=d * (hq_d + 2 * hk_d) + hq_d * d + 4 * b * s * d,
            transcendentals=b * num_heads * s * t,
        ),
    )(
        x.astype(jnp.bfloat16),
        norm_w.astype(jnp.float32).reshape(1, d),
        q_norm_w.astype(jnp.float32).reshape(1, head_dim),
        k_norm_w.astype(jnp.float32).reshape(1, head_dim),
        wq["s"].astype(jnp.float32).reshape(1, hq_d),
        wk["s"].astype(jnp.float32).reshape(1, hk_d),
        wv["s"].astype(jnp.float32).reshape(1, hk_d),
        wo["s"].astype(jnp.float32).reshape(1, d),
        pw.astype(jnp.float32).reshape(1, d),
        cos.astype(jnp.float32),
        sin.astype(jnp.float32),
        mask.astype(jnp.int32).reshape(b // bb, 1, t),
        wq["q"], wk["q"], wv["q"], wo["q"],
    )


def fused_attn_int8_layer(
    x: jax.Array,          # (B, S, D) bf16 — residual stream
    layer: dict,           # bf16 layer params (norm weights)
    lq: dict,              # int8 weights from quantize_params_int8
    attention_mask: jax.Array,   # (B, S)
    rope_cs: tuple,        # (cos, sin) each (B, S, Dh//2)
    cfg,                   # EncoderConfig
    *,
    interpret: bool = False,
) -> jax.Array:
    """x + o_proj(attention(qkv_proj(RMSNorm(x)))), one kernel.

    Same block as encoder/model.py:_attention_int8 with the fused core,
    plus the residual add; all projections int8 on the MXU, all
    intermediates VMEM-resident."""
    return _fused_attn_call(
        x, layer["attn_norm"], layer["q_norm"], layer["k_norm"],
        lq["wq"], lq["wk"], lq["wv"], lq["wo"],
        rope_cs[0], rope_cs[1], attention_mask,
        num_heads=cfg.num_heads, num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim, eps=float(cfg.rms_norm_eps),
        causal=True, scale=1.0 / float(np.sqrt(cfg.head_dim)),
        interpret=interpret,
    )


def fused_attn_int8_layer_gemma(
    x: jax.Array,          # (B, S, D) bf16 — residual stream
    layer: dict,           # gemma layer params (zero-init (1+w) norms)
    lq: dict,              # int8 weights from quantize_params_int8
    attention_mask: jax.Array,   # (B, S)
    rope_cs: tuple,        # per-layer-kind (cos, sin), each (B, S, Dh//2)
    cfg,                   # GemmaEncoderConfig
    *,
    interpret: bool = False,
) -> jax.Array:
    """Gemma sandwich attention block, one kernel: x + post_attn_norm(
    o_proj(bidirectional_attention(qkv_proj(attn_norm(x))))). All (1+w)
    norm weights pre-adjusted; same math as encoder/gemma.py's
    _attention_int8 + post-norm chain. Only valid at shapes where the
    sliding window cannot bind (gemma.py:_fused_ok gates callers)."""
    one = jnp.float32(1.0)
    return _fused_attn_call(
        x, one + layer["attn_norm"], one + layer["q_norm"],
        one + layer["k_norm"],
        lq["wq"], lq["wk"], lq["wv"], lq["wo"],
        rope_cs[0], rope_cs[1], attention_mask,
        post_w=one + layer["post_attn_norm"],
        num_heads=cfg.num_heads, num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim, eps=float(cfg.rms_norm_eps),
        causal=False, scale=float(cfg.query_pre_attn_scalar) ** -0.5,
        interpret=interpret,
    )
