"""Qwen3-Embedding-class text encoder in pure JAX.

TPU-native replacement for the reference's sentence-transformers/PyTorch
encoder path (ec2/generate_embeddings/embeddings.py:10-40 loads
'Qwen/Qwen3-Embedding-0.6B' and calls encode with
normalize_embeddings=True; streamlit_app.py:52-59,173 uses the same model
at query time; compare_embeddings.py:466 records it as the best of the
three embedders).

Architecture (Qwen3 0.6B class): token embedding -> N x (RMSNorm ->
grouped-query attention with per-head q/k RMSNorm and RoPE -> RMSNorm ->
SwiGLU MLP) -> final RMSNorm -> last-token pooling -> L2 normalize.

Implementation choices for TPU:
- pure functions over a params pytree; no framework modules — makes
  pjit/NamedSharding placement explicit and keeps everything jittable.
- bf16 params/activations, fp32 for norms/softmax accumulation.
- static shapes: (batch, seq_len) fixed per compilation; the batching
  layer buckets by padded length.
- causal attention via a single masked einsum — at seq<=512 the MXU is
  the bottleneck, so no custom attention kernel is needed; long-context
  variants can swap in pallas flash attention.

Parallelism (SURVEY.md §2.2 "TPU-native equivalent"):
- data parallel over the mesh 'data' axis (the reference's only DP is
  encode_multi_process, embeddings.py:32-38);
- tensor parallel over the 'shard' axis: attention heads and MLP
  intermediate are partitioned; XLA/GSPMD inserts the collectives.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import EncoderConfig

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _dense_init(key, in_dim, out_dim, dtype):
    scale = 1.0 / np.sqrt(in_dim)
    return (jax.random.normal(key, (in_dim, out_dim)) * scale).astype(dtype)


def init_params(cfg: EncoderConfig, key: jax.Array) -> Params:
    pdtype = jnp.dtype(cfg.param_dtype)
    keys = jax.random.split(key, cfg.num_layers + 2)
    qkv_dim = cfg.head_dim * cfg.num_heads
    kv_dim = cfg.head_dim * cfg.num_kv_heads

    layers = []
    for li in range(cfg.num_layers):
        k = jax.random.split(keys[li], 8)
        layers.append(
            {
                "attn_norm": jnp.ones((cfg.hidden_size,), jnp.float32),
                "wq": _dense_init(k[0], cfg.hidden_size, qkv_dim, pdtype),
                "wk": _dense_init(k[1], cfg.hidden_size, kv_dim, pdtype),
                "wv": _dense_init(k[2], cfg.hidden_size, kv_dim, pdtype),
                "wo": _dense_init(k[3], qkv_dim, cfg.hidden_size, pdtype),
                "q_norm": jnp.ones((cfg.head_dim,), jnp.float32),
                "k_norm": jnp.ones((cfg.head_dim,), jnp.float32),
                "mlp_norm": jnp.ones((cfg.hidden_size,), jnp.float32),
                "w_gate": _dense_init(k[4], cfg.hidden_size, cfg.intermediate_size, pdtype),
                "w_up": _dense_init(k[5], cfg.hidden_size, cfg.intermediate_size, pdtype),
                "w_down": _dense_init(k[6], cfg.intermediate_size, cfg.hidden_size, pdtype),
            }
        )
    return {
        "embed": (jax.random.normal(keys[-2], (cfg.vocab_size, cfg.hidden_size)) * 0.02).astype(pdtype),
        "final_norm": jnp.ones((cfg.hidden_size,), jnp.float32),
        "layers": layers,
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps) * weight
    return out.astype(x.dtype)


def _rope_tables(positions: jax.Array, dh: int, theta: float) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables (B, S, half) f32, computed ONCE per forward and
    shared by every layer's q and k (56 per-layer recomputations
    otherwise — trivial FLOPs but that many extra kernel launches)."""
    half = dh // 2
    freqs = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    angles = positions[..., None].astype(jnp.float32) * freqs  # (B, S, half)
    return jnp.cos(angles), jnp.sin(angles)


def _rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, S, H, Dh); cos/sin: (B, S, half). Rotary over the head dim."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    c, s = cos[:, :, None, :], sin[:, :, None, :]
    out = jnp.concatenate([xf1 * c - xf2 * s, xf2 * c + xf1 * s], axis=-1)
    return out.astype(x.dtype)


def _attention_math(
    layer: Params, q: jax.Array, k: jax.Array, v: jax.Array,
    mask: jax.Array, rope_cs: tuple, cfg: EncoderConfig,
) -> jax.Array:
    """Post-projection attention math (XLA reference composition):
    per-head QK-RMSNorm -> RoPE -> GQA repeat -> masked softmax -> PV.
    q/k/v are the raw (B, S, heads*Dh) projections; returns (B, S, H*Dh)
    pre-wo. Shared by the bf16 and int8-projection paths."""
    b, s, _ = q.shape
    h, hk, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    cos, sin = rope_cs
    dtype = q.dtype

    q = q.reshape(b, s, h, dh)
    k = k.reshape(b, s, hk, dh)
    v = v.reshape(b, s, hk, dh)

    # Qwen3: per-head RMSNorm on q and k before RoPE
    q = _rms_norm(q, layer["q_norm"], cfg.rms_norm_eps)
    k = _rms_norm(k, layer["k_norm"], cfg.rms_norm_eps)
    q = _rope(q, cos, sin)
    k = _rope(k, cos, sin)

    # GQA: repeat kv heads. (A 5-D grouped-einsum variant that avoids the
    # repeat measured SLOWER on v5e — the extra transposes cost more than
    # the copies XLA emits for repeat; measured 133 vs 124 ms/28 layers.)
    rep = h // hk
    k = jnp.repeat(k, rep, axis=2)
    v = jnp.repeat(v, rep, axis=2)

    scale = 1.0 / np.sqrt(dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale

    causal = jnp.tril(jnp.ones((s, s), bool))
    valid = mask[:, None, None, :] & causal[None, None, :, :]
    logits = jnp.where(valid, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)

    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32)
    return out.astype(dtype).reshape(b, s, h * dh)


def _attention(layer: Params, x: jax.Array, mask: jax.Array, rope_cs: tuple, cfg: EncoderConfig) -> jax.Array:
    out = _attention_math(
        layer, x @ layer["wq"], x @ layer["wk"], x @ layer["wv"],
        mask, rope_cs, cfg,
    )
    return out @ layer["wo"]


# ---------------------------------------------------------------------------
# fused attention (Pallas) with XLA-recompute VJP
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _make_attn_core(h: int, hk: int, dh: int, eps: float, interpret: bool):
    """custom-VJP wrapper: forward = fused Pallas kernel
    (kernels/attention.py), backward = the fused Pallas backward
    (fused_qknorm_rope_attention_bwd), which recomputes the block's
    intermediates in VMEM — nothing is saved from the forward, matching
    the trainer's remat policy. (The XLA reference composition below is
    kept as the parity oracle for tests.)"""
    from ..kernels.attention import (
        fused_qknorm_rope_attention,
        fused_qknorm_rope_attention_bwd,
    )

    def ref(q, k, v, qw, kw, cos, sin, mask):
        b, s, _ = q.shape
        eps_ = eps
        q4 = _rms_norm(q.reshape(b, s, h, dh), qw, eps_)
        k4 = _rms_norm(k.reshape(b, s, hk, dh), kw, eps_)
        q4 = _rope(q4, cos, sin)
        k4 = _rope(k4, cos, sin)
        rep = h // hk
        k4 = jnp.repeat(k4, rep, axis=2)
        v4 = jnp.repeat(v.reshape(b, s, hk, dh), rep, axis=2)
        scale = 1.0 / np.sqrt(dh)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q4, k4, preferred_element_type=jnp.float32
        ) * scale
        causal = jnp.tril(jnp.ones((s, s), bool))
        valid = (mask != 0)[:, None, None, :] & causal[None, None, :, :]
        logits = jnp.where(valid, logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", probs, v4, preferred_element_type=jnp.float32
        )
        return out.astype(jnp.bfloat16).reshape(b, s, h * dh)

    @jax.custom_vjp
    def core(q, k, v, qw, kw, cos, sin, mask):
        return fused_qknorm_rope_attention(
            q, k, v, qw, kw, cos, sin, mask,
            num_heads=h, num_kv_heads=hk, head_dim=dh, eps=eps,
            causal=True, interpret=interpret,
        )

    def fwd(q, k, v, qw, kw, cos, sin, mask):
        return core(q, k, v, qw, kw, cos, sin, mask), (q, k, v, qw, kw, cos, sin, mask)

    def bwd(res, g):
        q, k, v, qw, kw, cos, sin, mask = res
        dq, dk, dv, dqw, dkw = fused_qknorm_rope_attention_bwd(
            q, k, v, qw, kw, cos, sin, mask, g,
            num_heads=h, num_kv_heads=hk, head_dim=dh, eps=eps,
            causal=True, interpret=interpret,
        )
        # cos/sin only reach integer positions upstream (no params);
        # mask is integer (float0 tangent)
        import numpy as _np

        return (
            dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dqw.astype(qw.dtype), dkw.astype(kw.dtype),
            jnp.zeros_like(cos), jnp.zeros_like(sin),
            _np.zeros(mask.shape, dtype=jax.dtypes.float0),
        )

    core.defvjp(fwd, bwd)
    core._ref = ref   # parity oracle for tests
    return core


def _fused_ok(cfg: EncoderConfig, s: int, b: int) -> bool:
    """The fused kernel targets the production 0.6B-class shapes: 128-lane
    head_dim and a batch divisible by the packing factor. Capped at
    s <= 128: the whole-block VMEM-resident design sizes its q/k/v/logits
    tiles for packed (128, Dh) blocks — longer widths (the 256/512
    buckets that long-doc chunks hit) blow past the VMEM budget, and the
    XLA path handles them well (attention FLOPs are real at those S)."""
    bb = max(1, 128 // s)
    return (
        cfg.head_dim == 128
        and s <= 128
        and b % bb == 0
        and cfg.num_heads % cfg.num_kv_heads == 0
    )


def _attention_fused(
    layer: Params, x: jax.Array, mask: jax.Array, rope_cs: tuple,
    cfg: EncoderConfig, interpret: bool,
) -> jax.Array:
    cos, sin = rope_cs
    q = x @ layer["wq"]
    k = x @ layer["wk"]
    v = x @ layer["wv"]
    core = _make_attn_core(
        cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.rms_norm_eps, interpret
    )
    attn = core(
        q, k, v, layer["q_norm"], layer["k_norm"], cos, sin,
        mask.astype(jnp.int32),
    )
    return attn.astype(x.dtype) @ layer["wo"]


def _mlp(layer: Params, x: jax.Array) -> jax.Array:
    gate = jax.nn.silu((x @ layer["w_gate"]).astype(jnp.float32)).astype(x.dtype)
    up = x @ layer["w_up"]
    return (gate * up) @ layer["w_down"]


# ---------------------------------------------------------------------------
# int8 (w8a8) inference quantization
# ---------------------------------------------------------------------------
# v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 vs 197
# TOPS). Quantizing all seven projection matmuls (static per-output-column
# weight scales, dynamic per-token activation scales) measured 1.14x on
# the serving forward at both (512, 32) and (512, 16) with pooled-cosine
# parity 0.997+ vs the bf16 path (experiments/exp_enc_int8.py) — the
# dequant/requant elementwise chain eats the rest of the 2x. Opt-in
# serving mode: BatchedEncoder(quant="int8"); norms, RoPE, softmax and
# the fused attention core stay bf16/f32.

_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def _quant_weight(w: jax.Array) -> dict[str, jax.Array]:
    """(in, out) -> int8 codes + f32 per-output-column scales."""
    wf = w.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(wf), axis=0) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}


def quantize_params_int8(params: Params) -> list[dict]:
    """Per-layer int8 weights for the seven projection matrices.

    Derived state, computed once at encoder construction (the bf16
    params stay authoritative — embedding gather, norms and pooling
    still read them)."""
    return [
        {k: _quant_weight(layer[k]) for k in _QUANT_KEYS}
        for layer in params["layers"]
    ]


def _quant_act(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., d) -> int8 rows + f32 per-row (per-token) scales."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def _rmsnorm_quant_act(
    x: jax.Array, w: jax.Array, eps: float, w_offset: float = 0.0
) -> tuple[jax.Array, jax.Array]:
    """Fused RMSNorm -> per-token int8 quant, never materializing the
    normed bf16 tensor: with y = x*rsqrt(var)*w, the row absmax is
    max|x_j * w_j| * rsqrt(var), so both reductions (sum x^2, max|x*w|)
    read x once and one pointwise pass writes the int8 codes — two
    passes over HBM instead of the four the unfused norm+quant chain
    costs. `w_offset=1.0` expresses gemma's (1 + w) norm form."""
    xf = x.astype(jnp.float32)
    wf = w.astype(jnp.float32) + w_offset
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    m = jnp.max(jnp.abs(xf) * jnp.abs(wf), axis=-1, keepdims=True) * r
    s = jnp.maximum(m / 127.0, 1e-12)
    q = jnp.clip(jnp.round(xf * (r / s) * wf), -127, 127).astype(jnp.int8)
    return q, s


def _q_matmul(xq: jax.Array, sx: jax.Array, w: dict, out_dtype) -> jax.Array:
    """int8 x int8 -> int32 MXU matmul, dequantized via the two scales."""
    acc = jax.lax.dot_general(
        xq, w["q"], (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * sx * w["s"]).astype(out_dtype)


def _attention_int8(
    layer: Params, lq: dict, x: jax.Array, attention_mask: jax.Array,
    rope_cs: tuple, cfg: EncoderConfig, use_fused: bool, interpret: bool,
) -> jax.Array:
    """Attention block with int8 q/k/v/o projections. `x` is PRE-norm:
    the attn RMSNorm fuses into one shared activation quant
    (_rmsnorm_quant_act) feeding all three input projections; the
    attention core (fused Pallas or the XLA reference math) stays
    bf16/f32."""
    xq, sx = _rmsnorm_quant_act(x, layer["attn_norm"], cfg.rms_norm_eps)
    q = _q_matmul(xq, sx, lq["wq"], x.dtype)
    k = _q_matmul(xq, sx, lq["wk"], x.dtype)
    v = _q_matmul(xq, sx, lq["wv"], x.dtype)
    if use_fused:
        core = _make_attn_core(
            cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.rms_norm_eps,
            interpret,
        )
        attn = core(
            q, k, v, layer["q_norm"], layer["k_norm"], rope_cs[0], rope_cs[1],
            attention_mask.astype(jnp.int32),
        )
    else:
        attn = _attention_math(
            layer, q, k, v, attention_mask.astype(bool), rope_cs, cfg
        )
    aq, sa = _quant_act(attn.astype(x.dtype))
    return _q_matmul(aq, sa, lq["wo"], x.dtype)


def _mlp_int8(layer: Params, lq: dict, x: jax.Array, eps: float) -> jax.Array:
    """SwiGLU MLP with int8 matmuls; `x` is PRE-norm (mlp RMSNorm fused
    into the input quant)."""
    xq, sx = _rmsnorm_quant_act(x, layer["mlp_norm"], eps)
    gate = _q_matmul(xq, sx, lq["w_gate"], jnp.float32)
    up = _q_matmul(xq, sx, lq["w_up"], jnp.float32)
    h = (jax.nn.silu(gate) * up).astype(x.dtype)
    hq, sh = _quant_act(h)
    return _q_matmul(hq, sh, lq["w_down"], x.dtype)


def _fused_layer_ok(cfg: EncoderConfig, s: int, b: int) -> bool:
    """Whole-layer int8 kernels (kernels/layer_int8.py) additionally
    need 128-lane-aligned model dims and the int8 weights within the
    kernel's VMEM budget (kernels/layer_int8.py:fused_layer_shapes_ok
    owns the requirement). Qwen-form layers only (no bias, pre-norm,
    SwiGLU)."""
    from ..kernels.layer_int8 import fused_layer_shapes_ok

    return _fused_ok(cfg, s, b) and fused_layer_shapes_ok(
        cfg.hidden_size, cfg.intermediate_size,
        cfg.num_heads * cfg.head_dim, cfg.num_kv_heads * cfg.head_dim,
    )


def forward(
    params: Params,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    cfg: EncoderConfig,
    fused: str = "off",
    qlayers: list | None = None,
    fused_layers: bool = False,
) -> jax.Array:
    """Hidden states (B, S, H) after the final norm.

    fused: "off" = XLA reference attention; "on" = fused Pallas
    attention block (kernels/attention.py) when the shapes qualify
    (production TPU path — ~1/3 of the serving step was attention
    layout overhead); "interpret" = fused kernel in interpret mode
    (CPU tests).

    qlayers: per-layer int8 weights from quantize_params_int8 — runs
    every projection matmul on the int8 MXU path (w8a8, 1.14x measured
    forward speedup; see the quantization section above).

    fused_layers: with qlayers set and fused on, run each transformer
    sub-block as ONE Pallas kernel (kernels/layer_int8.py: VMEM-resident
    int8 weights, norm/quant/dequant/residual fused around the MXU
    dots) — no intermediate tensor touches HBM."""
    x = params["embed"][input_ids].astype(jnp.dtype(cfg.dtype))
    positions = jnp.cumsum(attention_mask.astype(jnp.int32), axis=1) - 1
    positions = jnp.maximum(positions, 0)
    mask = attention_mask.astype(bool)
    rope_cs = _rope_tables(positions, cfg.head_dim, cfg.rope_theta)
    b, s = input_ids.shape
    use_fused = fused in ("on", "interpret") and _fused_ok(cfg, s, b)
    use_fused_layers = (
        fused_layers
        and qlayers is not None
        and fused in ("on", "interpret")
        and _fused_layer_ok(cfg, s, b)
    )
    if use_fused_layers:
        from ..kernels.layer_int8 import (
            fused_attn_int8_layer,
            fused_mlp_int8_layer,
        )

        interp = fused == "interpret"
        for li, layer in enumerate(params["layers"]):
            lq = qlayers[li]
            x = fused_attn_int8_layer(
                x, layer, lq, attention_mask, rope_cs, cfg, interpret=interp
            )
            x = fused_mlp_int8_layer(
                x, layer["mlp_norm"], lq["w_gate"], lq["w_up"], lq["w_down"],
                eps=cfg.rms_norm_eps, interpret=interp,
            )
        return _rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    for li, layer in enumerate(params["layers"]):
        if qlayers is not None:
            # pre-norms fuse into the activation quants — the normed
            # bf16 tensors are never materialized
            x = x + _attention_int8(
                layer, qlayers[li], x, attention_mask, rope_cs, cfg,
                use_fused, fused == "interpret",
            )
            x = x + _mlp_int8(layer, qlayers[li], x, cfg.rms_norm_eps)
            continue
        xa = _rms_norm(x, layer["attn_norm"], cfg.rms_norm_eps)
        if use_fused:
            x = x + _attention_fused(
                layer, xa, attention_mask, rope_cs, cfg, fused == "interpret"
            )
        else:
            x = x + _attention(layer, xa, mask, rope_cs, cfg)
        x = x + _mlp(layer, _rms_norm(x, layer["mlp_norm"], cfg.rms_norm_eps))
    return _rms_norm(x, params["final_norm"], cfg.rms_norm_eps)


def encode_pooled(
    params: Params,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    cfg: EncoderConfig,
    fused: str = "off",
    qlayers: list | None = None,
    fused_layers: bool = False,
) -> jax.Array:
    """Pooled, (optionally) L2-normalized embeddings (B, D).

    Qwen3-Embedding pools the last non-padding (EOS) position; mean
    pooling is available for bert/gemma-class encoders. L2 normalization
    matches the reference's normalize_embeddings=True everywhere
    (embeddings.py:27,35; streamlit_app.py:173)."""
    hidden = forward(
        params, input_ids, attention_mask, cfg, fused=fused, qlayers=qlayers,
        fused_layers=fused_layers,
    )
    if cfg.pooling == "last_token":
        lengths = jnp.sum(attention_mask.astype(jnp.int32), axis=1)
        idx = jnp.maximum(lengths - 1, 0)
        pooled = jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0, :]
    elif cfg.pooling == "mean":
        m = attention_mask[:, :, None].astype(hidden.dtype)
        pooled = jnp.sum(hidden * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1)
    else:
        raise ValueError(f"unknown pooling {cfg.pooling}")
    pooled = pooled.astype(jnp.float32)
    if cfg.embedding_dim != pooled.shape[-1]:
        pooled = pooled[:, : cfg.embedding_dim]
    if cfg.normalize:
        pooled = pooled / jnp.maximum(jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)
    return pooled


# ---------------------------------------------------------------------------
# sharding rules (dp over 'data', tp over 'shard')
# ---------------------------------------------------------------------------


def param_sharding_rules(mesh: Mesh, tp_axis: str = "shard") -> Params:
    """PartitionSpec pytree matching init_params' structure.

    Tensor-parallel layout: q/k/v and gate/up are column-sharded over the
    head / intermediate dimension; wo and w_down are row-sharded, so each
    matmul pair needs a single psum that GSPMD inserts automatically.
    Embedding is vocab-sharded."""
    t = tp_axis
    layer_rules = {
        "attn_norm": P(None),
        "wq": P(None, t),
        "wk": P(None, t),
        "wv": P(None, t),
        "wo": P(t, None),
        "q_norm": P(None),
        "k_norm": P(None),
        "mlp_norm": P(None),
        "w_gate": P(None, t),
        "w_up": P(None, t),
        "w_down": P(t, None),
    }
    return {
        "embed": P(t, None),
        "final_norm": P(None),
        "layers": layer_rules,
    }


def shard_params(params: Params, mesh: Mesh, tp_axis: str = "shard") -> Params:
    """Place params on the mesh according to the TP rules."""
    from .sharding import place_params

    return place_params(params, param_sharding_rules(mesh, tp_axis), mesh)


class QwenEncoder:
    """Convenience wrapper: config + params + jitted pooled-encode."""

    def __init__(self, cfg: EncoderConfig | None = None, params: Params | None = None, seed: int = 0):
        self.cfg = cfg or EncoderConfig()
        if params is None:
            params = init_params(self.cfg, jax.random.PRNGKey(seed))
        self.params = params
        # Mosaic is TPU-only; the axon-tunnelled chip reports a non-"tpu"
        # platform name, so gate by excluding known non-TPU backends
        fused = (
            "off"
            if jax.default_backend() in ("cpu", "gpu", "cuda", "rocm")
            else "on"
        )
        self._encode = jax.jit(
            functools.partial(encode_pooled, cfg=self.cfg, fused=fused)
        )

    def __call__(self, input_ids, attention_mask):
        return self._encode(self.params, input_ids, attention_mask)
