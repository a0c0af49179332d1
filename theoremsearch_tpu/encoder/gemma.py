"""EmbeddingGemma-300m-class text encoder in pure JAX.

The reference registers two embedder aliases — qwen and gemma
(ec2/generate_embeddings/embedders.py:1-4) — and provisions a 768-dim
pgvector table for gemma (rds_schema.sql:52-57). This module is the
gemma-family tower: a Gemma3 text model run bidirectionally
(use_bidirectional_attention, as google/embeddinggemma-300m configures
it) with the sentence-transformers head (mean pool -> Dense ->
Dense -> normalize).

Numerics match HF's Gemma3TextModel (verified against transformers'
reference implementation in tests/test_gemma_parity.py):
- token embeddings scaled by sqrt(hidden), the scale itself stored in
  param dtype (HF keeps the scalar in model dtype, so sqrt(3072)
  rounds to 55.5 in bf16 — see transformers PR #29402);
- RMSNorm computes in fp32 and multiplies by (1 + weight) with
  zero-initialized weights, casting AFTER the multiply;
- sandwich norms: attention and MLP outputs are normed before the
  residual add, with separate pre-norms;
- GeGLU MLP (tanh-approximate gelu on the gate);
- per-head-dim q/k RMSNorm, then RoPE: sliding layers use
  rope_local_theta (10k), global layers rope_theta (1M) with optional
  linear rope scaling;
- attention logits scaled by query_pre_attn_scalar**-0.5;
- bidirectional masks: global layers attend to every valid token;
  sliding layers to |q_pos - kv_pos| < sliding_window (HF's
  _bidirectional_window_overlay ORs the window overlay onto the causal
  sliding mask, which reduces to exactly the symmetric window).

Same TPU-first implementation style as the Qwen tower (model.py): pure
functions over a params pytree, bf16 params/activations with fp32
norms/softmax, static shapes bucketed by the batching layer, dp over
the 'data' mesh axis and tp over 'shard' via GSPMD-sharded params.
With ~300M params vs the 0.6B Qwen tower, the gemma alias is also the
fast-serving option for encoder-bound deployments.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import GemmaEncoderConfig

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _dense_init(key, in_dim, out_dim, dtype):
    scale = 1.0 / np.sqrt(in_dim)
    return (jax.random.normal(key, (in_dim, out_dim)) * scale).astype(dtype)


def is_global_layer(cfg: GemmaEncoderConfig, li: int) -> bool:
    return (li + 1) % cfg.global_every == 0


def init_params(cfg: GemmaEncoderConfig, key: jax.Array) -> Params:
    pdtype = jnp.dtype(cfg.param_dtype)
    keys = jax.random.split(key, cfg.num_layers + 4)
    q_dim = cfg.head_dim * cfg.num_heads
    kv_dim = cfg.head_dim * cfg.num_kv_heads

    layers = []
    for li in range(cfg.num_layers):
        k = jax.random.split(keys[li], 8)
        layers.append(
            {
                # gemma RMSNorm weights are ZERO-initialized (the norm
                # multiplies by 1 + w)
                "attn_norm": jnp.zeros((cfg.hidden_size,), jnp.float32),
                "post_attn_norm": jnp.zeros((cfg.hidden_size,), jnp.float32),
                "wq": _dense_init(k[0], cfg.hidden_size, q_dim, pdtype),
                "wk": _dense_init(k[1], cfg.hidden_size, kv_dim, pdtype),
                "wv": _dense_init(k[2], cfg.hidden_size, kv_dim, pdtype),
                "wo": _dense_init(k[3], q_dim, cfg.hidden_size, pdtype),
                "q_norm": jnp.zeros((cfg.head_dim,), jnp.float32),
                "k_norm": jnp.zeros((cfg.head_dim,), jnp.float32),
                "pre_mlp_norm": jnp.zeros((cfg.hidden_size,), jnp.float32),
                "post_mlp_norm": jnp.zeros((cfg.hidden_size,), jnp.float32),
                "w_gate": _dense_init(k[4], cfg.hidden_size, cfg.intermediate_size, pdtype),
                "w_up": _dense_init(k[5], cfg.hidden_size, cfg.intermediate_size, pdtype),
                "w_down": _dense_init(k[6], cfg.intermediate_size, cfg.hidden_size, pdtype),
            }
        )
    return {
        "embed": (jax.random.normal(keys[-4], (cfg.vocab_size, cfg.hidden_size)) * 0.02).astype(pdtype),
        "final_norm": jnp.zeros((cfg.hidden_size,), jnp.float32),
        "layers": layers,
        # sentence-transformers head (2_Dense / 3_Dense in the
        # embeddinggemma module layout): identity activation, with bias
        "head_w1": _dense_init(keys[-3], cfg.hidden_size, cfg.head_hidden, pdtype),
        "head_b1": jnp.zeros((cfg.head_hidden,), jnp.float32),
        "head_w2": _dense_init(keys[-2], cfg.head_hidden, cfg.embedding_dim, pdtype),
        "head_b2": jnp.zeros((cfg.embedding_dim,), jnp.float32),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _gemma_rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """Gemma-style: fp32 norm, multiply by (1 + w) BEFORE the cast."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps) * (1.0 + weight)
    return out.astype(x.dtype)


def _rope_tables(
    positions: jax.Array, dh: int, theta: float, scaling_factor: float = 1.0
) -> tuple[jax.Array, jax.Array]:
    """cos/sin (B, S, half) f32, shared across layers of the same kind."""
    half = dh // 2
    freqs = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    if scaling_factor != 1.0:   # HF linear rope_scaling divides inv_freq
        freqs = freqs / scaling_factor
    angles = positions[..., None].astype(jnp.float32) * freqs  # (B, S, half)
    return jnp.cos(angles), jnp.sin(angles)


def _rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, S, H, Dh); rotate-half convention (matches HF)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    c, s = cos[:, :, None, :], sin[:, :, None, :]
    out = jnp.concatenate([xf1 * c - xf2 * s, xf2 * c + xf1 * s], axis=-1)
    return out.astype(x.dtype)


def _attention_math(
    layer: Params,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    valid: jax.Array,
    rope_cs: tuple,
    cfg: GemmaEncoderConfig,
) -> jax.Array:
    """Post-projection bidirectional attention math; `valid` is the
    (B, 1, S, S) pair mask (padding AND, for sliding layers, the
    symmetric window). q/k/v are raw (B, S, heads*Dh) projections;
    returns (B, S, H*Dh) pre-wo. Shared by the bf16 and int8 paths."""
    b, s, _ = q.shape
    h, hk, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    cos, sin = rope_cs
    dtype = q.dtype

    q = q.reshape(b, s, h, dh)
    k = k.reshape(b, s, hk, dh)
    v = v.reshape(b, s, hk, dh)

    q = _gemma_rms_norm(q, layer["q_norm"], cfg.rms_norm_eps)
    k = _gemma_rms_norm(k, layer["k_norm"], cfg.rms_norm_eps)
    q = _rope(q, cos, sin)
    k = _rope(k, cos, sin)

    rep = h // hk
    if rep > 1:
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

    scale = cfg.query_pre_attn_scalar ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    logits = jnp.where(valid, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)

    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32)
    return out.astype(dtype).reshape(b, s, h * dh)


def _attention(
    layer: Params,
    x: jax.Array,
    valid: jax.Array,
    rope_cs: tuple,
    cfg: GemmaEncoderConfig,
) -> jax.Array:
    out = _attention_math(
        layer, x @ layer["wq"], x @ layer["wk"], x @ layer["wv"],
        valid, rope_cs, cfg,
    )
    return out @ layer["wo"]


# ---------------------------------------------------------------------------
# fused attention (Pallas) — serving shapes only
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _make_attn_core(
    h: int, hk: int, dh: int, eps: float, scale: float, interpret: bool
):
    """custom-VJP wrapper like the qwen tower's: forward = fused Pallas
    kernel (kernels/attention.py, causal=False, gemma (1+w) norm folded
    into pre-adjusted weights), backward = jax.vjp of the XLA reference
    composition recomputed."""
    from ..kernels.attention import fused_qknorm_rope_attention

    def ref(q, k, v, qw1, kw1, cos, sin, mask):
        # qw1/kw1 arrive PRE-ADJUSTED (1 + w); rebuild the gemma norm
        b, s, _ = q.shape
        def norm(x, w1):
            xf = x.astype(jnp.float32)
            var = jnp.mean(xf * xf, axis=-1, keepdims=True)
            return (xf * jax.lax.rsqrt(var + eps) * w1).astype(x.dtype)
        q4 = norm(q.reshape(b, s, h, dh), qw1)
        k4 = norm(k.reshape(b, s, hk, dh), kw1)
        q4 = _rope(q4, cos, sin)
        k4 = _rope(k4, cos, sin)
        rep = h // hk
        if rep > 1:
            k4 = jnp.repeat(k4, rep, axis=2)
            v4 = jnp.repeat(v.reshape(b, s, hk, dh), rep, axis=2)
        else:
            v4 = v.reshape(b, s, hk, dh)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q4, k4, preferred_element_type=jnp.float32
        ) * scale
        valid = (mask != 0)[:, None, None, :]
        logits = jnp.where(valid, logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", probs, v4, preferred_element_type=jnp.float32
        )
        return out.astype(jnp.bfloat16).reshape(b, s, h * dh)

    @jax.custom_vjp
    def core(q, k, v, qw1, kw1, cos, sin, mask):
        return fused_qknorm_rope_attention(
            q, k, v, qw1, kw1, cos, sin, mask,
            num_heads=h, num_kv_heads=hk, head_dim=dh, eps=eps,
            causal=False, scale=scale, interpret=interpret,
        )

    def fwd(q, k, v, qw1, kw1, cos, sin, mask):
        return core(q, k, v, qw1, kw1, cos, sin, mask), (
            q, k, v, qw1, kw1, cos, sin, mask
        )

    def bwd(res, g):
        _, vjp = jax.vjp(ref, *res)
        return vjp(g)

    core.defvjp(fwd, bwd)
    return core


def _fused_ok(cfg: GemmaEncoderConfig, s: int, b: int) -> bool:
    """Fused path gate for gemma serving shapes: 128-lane-multiple
    head_dim, batch divisible by the packing factor, s small enough that
    (a) the VMEM-resident design fits and (b) the bidirectional sliding
    window can never bind (max |q - kv| = s - 1 <= W//2), making every
    layer full-bidirectional — embeddinggemma's W=512 means any s <= 128
    qualifies."""
    bb = max(1, 128 // s)
    return (
        cfg.head_dim % 128 == 0
        and s <= 128
        and (s - 1) <= cfg.sliding_window // 2
        and b % bb == 0
        and cfg.num_heads % cfg.num_kv_heads == 0
    )


def _fused_layer_ok(cfg: GemmaEncoderConfig, s: int, b: int) -> bool:
    """Whole-layer int8 kernels (kernels/layer_int8.py) additionally
    need 128-lane-aligned model dims and VMEM-resident weights
    (fused_layer_shapes_ok owns the requirement; embeddinggemma-300m:
    768/1152/3x256/1x256 — qualifies with wide margin)."""
    from ..kernels.layer_int8 import fused_layer_shapes_ok

    return _fused_ok(cfg, s, b) and fused_layer_shapes_ok(
        cfg.hidden_size, cfg.intermediate_size,
        cfg.num_heads * cfg.head_dim, cfg.num_kv_heads * cfg.head_dim,
    )


def _attention_fused(
    layer: Params, x: jax.Array, attention_mask: jax.Array, rope_cs: tuple,
    cfg: GemmaEncoderConfig, interpret: bool,
) -> jax.Array:
    cos, sin = rope_cs
    q = x @ layer["wq"]
    k = x @ layer["wk"]
    v = x @ layer["wv"]
    core = _make_attn_core(
        cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.rms_norm_eps,
        float(cfg.query_pre_attn_scalar) ** -0.5, interpret,
    )
    attn = core(
        q, k, v, 1.0 + layer["q_norm"], 1.0 + layer["k_norm"], cos, sin,
        attention_mask.astype(jnp.int32),
    )
    return attn.astype(x.dtype) @ layer["wo"]


def _mlp(layer: Params, x: jax.Array) -> jax.Array:
    """GeGLU with tanh-approximate gelu (hidden_activation
    gelu_pytorch_tanh), computed in fp32 like the norms."""
    gate = jax.nn.gelu(
        (x @ layer["w_gate"]).astype(jnp.float32), approximate=True
    ).astype(x.dtype)
    up = x @ layer["w_up"]
    return (gate * up) @ layer["w_down"]


# ---------------------------------------------------------------------------
# int8 (w8a8) inference quantization — same scheme as the qwen tower
# (model.py quantization section): the gemma layer dict carries the same
# seven projection matrices, so the quantizer is shared; only the
# block composition (sandwich norms, GeGLU, bidirectional core) differs.
# ---------------------------------------------------------------------------

from .model import (  # noqa: E402  (shared quant machinery)
    _q_matmul,
    _quant_act,
    _rmsnorm_quant_act,
    quantize_params_int8,
)


def _attention_int8(
    layer: Params, lq: dict, x: jax.Array, attention_mask: jax.Array,
    valid: jax.Array, rope_cs: tuple, cfg: GemmaEncoderConfig,
    use_fused: bool, interpret: bool,
) -> jax.Array:
    """`x` is PRE-norm; the gemma (1+w) attn norm fuses into the shared
    activation quant (w_offset=1.0)."""
    xq, sx = _rmsnorm_quant_act(
        x, layer["attn_norm"], cfg.rms_norm_eps, w_offset=1.0
    )
    q = _q_matmul(xq, sx, lq["wq"], x.dtype)
    k = _q_matmul(xq, sx, lq["wk"], x.dtype)
    v = _q_matmul(xq, sx, lq["wv"], x.dtype)
    if use_fused:
        core = _make_attn_core(
            cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.rms_norm_eps,
            float(cfg.query_pre_attn_scalar) ** -0.5, interpret,
        )
        attn = core(
            q, k, v, 1.0 + layer["q_norm"], 1.0 + layer["k_norm"],
            rope_cs[0], rope_cs[1], attention_mask.astype(jnp.int32),
        )
    else:
        attn = _attention_math(layer, q, k, v, valid, rope_cs, cfg)
    aq, sa = _quant_act(attn.astype(x.dtype))
    return _q_matmul(aq, sa, lq["wo"], x.dtype)


def _mlp_int8(layer: Params, lq: dict, x: jax.Array, eps: float) -> jax.Array:
    """GeGLU MLP with int8 matmuls; `x` is PRE-norm (pre_mlp (1+w) norm
    fused into the input quant)."""
    xq, sx = _rmsnorm_quant_act(x, layer["pre_mlp_norm"], eps, w_offset=1.0)
    gate = _q_matmul(xq, sx, lq["w_gate"], jnp.float32)
    up = _q_matmul(xq, sx, lq["w_up"], jnp.float32)
    h = (jax.nn.gelu(gate, approximate=True) * up).astype(x.dtype)
    hq, sh = _quant_act(h)
    return _q_matmul(hq, sh, lq["w_down"], x.dtype)


def forward(
    params: Params,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    cfg: GemmaEncoderConfig,
    fused: str = "off",
    qlayers: list | None = None,
    fused_layers: bool = False,
) -> jax.Array:
    """Hidden states (B, S, H) after the final norm.

    fused: "off" = XLA reference attention; "on" = fused Pallas
    attention (kernels/attention.py) when _fused_ok qualifies the
    shapes — at serving S the sliding window never binds, so every
    layer runs the full-bidirectional fused block with its own rope
    tables; "interpret" = fused kernel in interpret mode (CPU tests).

    qlayers: per-layer int8 weights from quantize_params_int8 (the
    shared w8a8 scheme — see model.py's quantization section).

    fused_layers: with qlayers set and fused on, run each sandwich
    sub-block as ONE Pallas kernel (kernels/layer_int8.py gemma form:
    (1+w) pre/post norms, GeGLU, bidirectional core, VMEM-resident
    int8 weights)."""
    dtype = jnp.dtype(cfg.dtype)
    # the sqrt(hidden) embed scale lives in model dtype (HF rounds
    # sqrt(3072) to 55.5 in bf16; parity requires the same rounding)
    embed_scale = jnp.asarray(np.sqrt(cfg.hidden_size), dtype).astype(jnp.float32)
    x = (params["embed"][input_ids].astype(jnp.float32) * embed_scale).astype(dtype)

    positions = jnp.cumsum(attention_mask.astype(jnp.int32), axis=1) - 1
    positions = jnp.maximum(positions, 0)
    mask = attention_mask.astype(bool)

    rope_global = _rope_tables(
        positions, cfg.head_dim, cfg.rope_theta, cfg.rope_scaling_factor
    )
    rope_local = _rope_tables(positions, cfg.head_dim, cfg.rope_local_theta)

    b, s = input_ids.shape
    pair = mask[:, None, None, :]                         # (B, 1, 1, S) keys valid
    valid_full = jnp.broadcast_to(pair, (b, 1, s, s))
    # sliding bidirectional window: the raw window is SPLIT across both
    # directions — |q_pos - kv_pos| <= sliding_window // 2. (HF's
    # Gemma3TextConfig rewrites sliding_window to W//2 + 1 when
    # use_bidirectional_attention is set — "due to fa we set exclusive
    # bounds" — and the overlay then allows |d| < that; embeddinggemma's
    # W=512 means 256 tokens of context each side.) Distances use REAL
    # token positions; padding positions clamp but are masked by `pair`.
    dist = jnp.abs(positions[:, :, None] - positions[:, None, :])
    half_w = cfg.sliding_window // 2 + 1
    valid_sliding = valid_full & (dist < half_w)[:, None, :, :]

    use_fused = fused in ("on", "interpret") and _fused_ok(cfg, s, b)
    use_fused_layers = (
        fused_layers
        and qlayers is not None
        and fused in ("on", "interpret")
        and _fused_layer_ok(cfg, s, b)
    )
    if use_fused_layers:
        from ..kernels.layer_int8 import (
            fused_attn_int8_layer_gemma,
            fused_mlp_int8_layer,
        )

        interp = fused == "interpret"
        one = jnp.float32(1.0)
        for li, layer in enumerate(params["layers"]):
            lq = qlayers[li]
            rope_cs = rope_global if is_global_layer(cfg, li) else rope_local
            x = fused_attn_int8_layer_gemma(
                x, layer, lq, attention_mask, rope_cs, cfg, interpret=interp
            )
            x = fused_mlp_int8_layer(
                x, one + layer["pre_mlp_norm"],
                lq["w_gate"], lq["w_up"], lq["w_down"],
                post_w=one + layer["post_mlp_norm"],
                eps=float(cfg.rms_norm_eps), act="gelu_tanh", interpret=interp,
            )
        return _gemma_rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    for li, layer in enumerate(params["layers"]):
        glob = is_global_layer(cfg, li)
        rope_cs = rope_global if glob else rope_local
        valid = valid_full if glob else valid_sliding
        if qlayers is not None:
            # pre-norms fuse into the activation quants
            attn = _attention_int8(
                layer, qlayers[li], x, attention_mask, valid, rope_cs, cfg,
                use_fused, fused == "interpret",
            )
        else:
            xa = _gemma_rms_norm(x, layer["attn_norm"], cfg.rms_norm_eps)
            if use_fused:
                attn = _attention_fused(
                    layer, xa, attention_mask, rope_cs, cfg, fused == "interpret"
                )
            else:
                attn = _attention(layer, xa, valid, rope_cs, cfg)
        x = x + _gemma_rms_norm(attn, layer["post_attn_norm"], cfg.rms_norm_eps)
        if qlayers is not None:
            mlp = _mlp_int8(layer, qlayers[li], x, cfg.rms_norm_eps)
        else:
            xm = _gemma_rms_norm(x, layer["pre_mlp_norm"], cfg.rms_norm_eps)
            mlp = _mlp(layer, xm)
        x = x + _gemma_rms_norm(mlp, layer["post_mlp_norm"], cfg.rms_norm_eps)
    return _gemma_rms_norm(x, params["final_norm"], cfg.rms_norm_eps)


def encode_pooled(
    params: Params,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    cfg: GemmaEncoderConfig,
    fused: str = "off",
    qlayers: list | None = None,
    fused_layers: bool = False,
) -> jax.Array:
    """Pooled embeddings (B, embedding_dim): mean pool over valid tokens
    -> Dense -> Dense -> L2 normalize (the sentence-transformers module
    stack of embeddinggemma: Pooling(mean), 2_Dense, 3_Dense,
    Normalize)."""
    hidden = forward(
        params, input_ids, attention_mask, cfg, fused=fused, qlayers=qlayers,
        fused_layers=fused_layers,
    )
    m = attention_mask[:, :, None].astype(jnp.float32)
    pooled = jnp.sum(hidden.astype(jnp.float32) * m, axis=1) / jnp.maximum(
        jnp.sum(m, axis=1), 1e-9
    )
    if "head_w1" in params:   # bare Gemma3 checkpoints carry no ST head
        pooled = pooled @ params["head_w1"].astype(jnp.float32) + params["head_b1"]
        pooled = pooled @ params["head_w2"].astype(jnp.float32) + params["head_b2"]
    if cfg.normalize:
        pooled = pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
        )
    return pooled


# ---------------------------------------------------------------------------
# sharding rules (dp over 'data', tp over 'shard') — same layout logic
# as the qwen tower: column-shard q/k/v and gate/up, row-shard the
# output projections, vocab-shard the embedding
# ---------------------------------------------------------------------------


def param_sharding_rules(mesh: Mesh, tp_axis: str = "shard") -> Params:
    t = tp_axis
    layer_rules = {
        "attn_norm": P(None),
        "post_attn_norm": P(None),
        "wq": P(None, t),
        "wk": P(None, t),
        "wv": P(None, t),
        "wo": P(t, None),
        "q_norm": P(None),
        "k_norm": P(None),
        "pre_mlp_norm": P(None),
        "post_mlp_norm": P(None),
        "w_gate": P(None, t),
        "w_up": P(None, t),
        "w_down": P(t, None),
    }
    return {
        "embed": P(t, None),
        "final_norm": P(None),
        "layers": layer_rules,
        "head_w1": P(None, t),
        "head_b1": P(None),
        "head_w2": P(t, None),
        "head_b2": P(None),
    }


def shard_params(params: Params, mesh: Mesh, tp_axis: str = "shard") -> Params:
    from .sharding import place_params

    return place_params(params, param_sharding_rules(mesh, tp_axis), mesh)


class GemmaEncoder:
    """Convenience wrapper: config + params + jitted pooled-encode."""

    def __init__(
        self,
        cfg: GemmaEncoderConfig | None = None,
        params: Params | None = None,
        seed: int = 0,
    ):
        self.cfg = cfg or GemmaEncoderConfig()
        if params is None:
            params = init_params(self.cfg, jax.random.PRNGKey(seed))
        self.params = params
        self._encode = jax.jit(functools.partial(encode_pooled, cfg=self.cfg))

    def __call__(self, input_ids, attention_mask):
        return self._encode(self.params, input_ids, attention_mask)
