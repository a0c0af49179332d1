"""BERT-base-class text encoder in pure JAX.

The reference compares three embedders on the validation set — zbMath
BERT, Qwen3-Embedding-0.6B and embeddinggemma-300m
(compare_embeddings.py:429-470) — and provisions a 768-dim pgvector
table for BERT (rds_schema.sql:45-50). This is the BERT family tower:
the classic post-LayerNorm bidirectional transformer, served through
the same BatchedEncoder/bucketing layer as the other two families and
pooled sentence-transformers-style (mean over valid tokens, L2
normalize).

Numerics match HF's BertModel (tests/test_bert_parity.py drives the
upstream implementation on a tiny random config):
- embeddings = word + learned-absolute-position + token-type, then
  LayerNorm(eps=1e-12); position ids are arange(S) regardless of
  padding (absolute embeddings, masked positions never read);
- every projection carries a bias;
- attention scores scaled by head_dim**-0.5, padding-only mask,
  post-LN: LayerNorm(residual + sublayer_output) AFTER each sublayer;
- FFN: Linear -> exact GELU -> Linear.

Same implementation style as the qwen/gemma towers: pure functions
over a params pytree, bf16 params/activations with fp32
LayerNorm/softmax, static bucketed shapes, dp over 'data' and tp over
'shard' via GSPMD-sharded params.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import BertEncoderConfig

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _dense_init(key, in_dim, out_dim, dtype):
    scale = 1.0 / np.sqrt(in_dim)
    return (jax.random.normal(key, (in_dim, out_dim)) * scale).astype(dtype)


def init_params(cfg: BertEncoderConfig, key: jax.Array) -> Params:
    pdtype = jnp.dtype(cfg.param_dtype)
    keys = jax.random.split(key, cfg.num_layers + 4)
    h = cfg.hidden_size

    layers = []
    for li in range(cfg.num_layers):
        k = jax.random.split(keys[li], 6)
        layers.append(
            {
                "wq": _dense_init(k[0], h, h, pdtype),
                "bq": jnp.zeros((h,), jnp.float32),
                "wk": _dense_init(k[1], h, h, pdtype),
                "bk": jnp.zeros((h,), jnp.float32),
                "wv": _dense_init(k[2], h, h, pdtype),
                "bv": jnp.zeros((h,), jnp.float32),
                "wo": _dense_init(k[3], h, h, pdtype),
                "bo": jnp.zeros((h,), jnp.float32),
                "attn_ln_g": jnp.ones((h,), jnp.float32),
                "attn_ln_b": jnp.zeros((h,), jnp.float32),
                "w_in": _dense_init(k[4], h, cfg.intermediate_size, pdtype),
                "b_in": jnp.zeros((cfg.intermediate_size,), jnp.float32),
                "w_out": _dense_init(k[5], cfg.intermediate_size, h, pdtype),
                "b_out": jnp.zeros((h,), jnp.float32),
                "mlp_ln_g": jnp.ones((h,), jnp.float32),
                "mlp_ln_b": jnp.zeros((h,), jnp.float32),
            }
        )
    return {
        "embed": (jax.random.normal(keys[-4], (cfg.vocab_size, h)) * 0.02).astype(pdtype),
        "pos_embed": (jax.random.normal(keys[-3], (cfg.max_seq_len, h)) * 0.02).astype(pdtype),
        "type_embed": (jax.random.normal(keys[-2], (cfg.type_vocab_size, h)) * 0.02).astype(pdtype),
        "embed_ln_g": jnp.ones((h,), jnp.float32),
        "embed_ln_b": jnp.zeros((h,), jnp.float32),
        "layers": layers,
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _layer_norm(x: jax.Array, g: jax.Array, b: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


def _attention(layer: Params, x: jax.Array, mask: jax.Array, cfg: BertEncoderConfig) -> jax.Array:
    b, s, h = x.shape
    nh = cfg.num_heads
    dh = h // nh

    q = (x @ layer["wq"] + layer["bq"].astype(x.dtype)).reshape(b, s, nh, dh)
    k = (x @ layer["wk"] + layer["bk"].astype(x.dtype)).reshape(b, s, nh, dh)
    v = (x @ layer["wv"] + layer["bv"].astype(x.dtype)).reshape(b, s, nh, dh)

    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / np.sqrt(dh)
    logits = jnp.where(mask[:, None, None, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32)
    out = out.astype(x.dtype).reshape(b, s, h)
    return out @ layer["wo"] + layer["bo"].astype(x.dtype)


def forward(
    params: Params,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    cfg: BertEncoderConfig,
) -> jax.Array:
    """Hidden states (B, S, H) after the last encoder layer."""
    dtype = jnp.dtype(cfg.dtype)
    b, s = input_ids.shape
    mask = attention_mask.astype(bool)

    x = (
        params["embed"][input_ids]
        + params["pos_embed"][:s][None, :, :]
        + params["type_embed"][0][None, None, :]   # single-segment inputs
    ).astype(dtype)
    x = _layer_norm(x, params["embed_ln_g"], params["embed_ln_b"], cfg.layer_norm_eps)

    for layer in params["layers"]:
        attn = _attention(layer, x, mask, cfg)
        x = _layer_norm(
            x + attn, layer["attn_ln_g"], layer["attn_ln_b"], cfg.layer_norm_eps
        )
        ff = jax.nn.gelu(
            (x @ layer["w_in"] + layer["b_in"].astype(x.dtype)).astype(jnp.float32),
            approximate=(cfg.hidden_act == "gelu_new"),
        ).astype(x.dtype)
        ff = ff @ layer["w_out"] + layer["b_out"].astype(x.dtype)
        x = _layer_norm(
            x + ff, layer["mlp_ln_g"], layer["mlp_ln_b"], cfg.layer_norm_eps
        )
    return x


def encode_pooled(
    params: Params,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    cfg: BertEncoderConfig,
    fused: str = "off",
) -> jax.Array:
    """Mean pooling over valid tokens + L2 normalize (the
    sentence-transformers stack for BERT-class embedders). `fused` is
    accepted for interface parity; BERT runs the XLA attention."""
    del fused
    hidden = forward(params, input_ids, attention_mask, cfg)
    m = attention_mask[:, :, None].astype(jnp.float32)
    pooled = jnp.sum(hidden.astype(jnp.float32) * m, axis=1) / jnp.maximum(
        jnp.sum(m, axis=1), 1e-9
    )
    if cfg.normalize:
        pooled = pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
        )
    return pooled


# ---------------------------------------------------------------------------
# sharding rules (dp over 'data', tp over 'shard')
# ---------------------------------------------------------------------------


def param_sharding_rules(mesh: Mesh, tp_axis: str = "shard") -> Params:
    t = tp_axis
    layer_rules = {
        "wq": P(None, t), "bq": P(t),
        "wk": P(None, t), "bk": P(t),
        "wv": P(None, t), "bv": P(t),
        "wo": P(t, None), "bo": P(None),
        "attn_ln_g": P(None), "attn_ln_b": P(None),
        "w_in": P(None, t), "b_in": P(t),
        "w_out": P(t, None), "b_out": P(None),
        "mlp_ln_g": P(None), "mlp_ln_b": P(None),
    }
    return {
        "embed": P(t, None),
        "pos_embed": P(None, None),
        "type_embed": P(None, None),
        "embed_ln_g": P(None),
        "embed_ln_b": P(None),
        "layers": layer_rules,
    }


def shard_params(params: Params, mesh: Mesh, tp_axis: str = "shard") -> Params:
    from .sharding import place_params

    return place_params(params, param_sharding_rules(mesh, tp_axis), mesh)


class BertEncoder:
    """Convenience wrapper: config + params + jitted pooled-encode."""

    def __init__(
        self,
        cfg: BertEncoderConfig | None = None,
        params: Params | None = None,
        seed: int = 0,
    ):
        self.cfg = cfg or BertEncoderConfig()
        if params is None:
            params = init_params(self.cfg, jax.random.PRNGKey(seed))
        self.params = params
        self._encode = jax.jit(functools.partial(encode_pooled, cfg=self.cfg))

    def __call__(self, input_ids, attention_mask):
        return self._encode(self.params, input_ids, attention_mask)
