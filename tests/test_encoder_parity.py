"""Encoder math parity: an independent numpy re-implementation of the
Qwen3-class forward must match the JAX forward to cosine > 0.9999 — the
SURVEY.md §7.4 "encoder parity" check, runnable without real checkpoints
(the same harness validates a loaded HF checkpoint against
sentence-transformers when assets exist)."""

import numpy as np
import pytest

from theoremsearch_tpu.core.config import EncoderConfig
from theoremsearch_tpu.encoder.model import encode_pooled, init_params
from theoremsearch_tpu.encoder.tokenizer import SimpleTokenizer


def _np(x):
    return np.asarray(x, np.float32)


def numpy_forward(params, input_ids, attention_mask, cfg):
    """From-scratch numpy forward (fp32 everywhere), matching the model's
    defined semantics: RMSNorm, GQA with QK-norm + RoPE, SwiGLU,
    last-token pooling, L2 normalize."""
    eps = cfg.rms_norm_eps

    def rms(x, w):
        var = (x * x).mean(-1, keepdims=True)
        return x / np.sqrt(var + eps) * _np(w)

    def rope(x, pos):
        dh = x.shape[-1]
        half = dh // 2
        freqs = 1.0 / (cfg.rope_theta ** (np.arange(half, dtype=np.float64) / half))
        ang = pos[..., None].astype(np.float64) * freqs
        cos, sin = np.cos(ang)[:, :, None, :], np.sin(ang)[:, :, None, :]
        x1, x2 = x[..., :half], x[..., half:]
        return np.concatenate(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
        ).astype(np.float32)

    ids = np.asarray(input_ids)
    mask = np.asarray(attention_mask)
    b, s = ids.shape
    x = _np(params["embed"])[ids]
    pos = np.maximum(np.cumsum(mask, axis=1) - 1, 0)
    h, hk, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    for layer in params["layers"]:
        xa = rms(x, layer["attn_norm"])
        q = (xa @ _np(layer["wq"])).reshape(b, s, h, dh)
        k = (xa @ _np(layer["wk"])).reshape(b, s, hk, dh)
        v = (xa @ _np(layer["wv"])).reshape(b, s, hk, dh)
        q = rms(q, layer["q_norm"])
        k = rms(k, layer["k_norm"])
        q, k = rope(q, pos), rope(k, pos)
        k = np.repeat(k, h // hk, axis=2)
        v = np.repeat(v, h // hk, axis=2)
        logits = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(dh)
        causal = np.tril(np.ones((s, s), bool))
        valid = mask[:, None, None, :].astype(bool) & causal[None, None]
        logits = np.where(valid, logits, -1e30)
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p = p / p.sum(-1, keepdims=True)
        att = np.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, s, h * dh)
        x = x + att @ _np(layer["wo"])
        xm = rms(x, layer["mlp_norm"])
        gate = xm @ _np(layer["w_gate"])
        silu = gate / (1.0 + np.exp(-gate))
        x = x + (silu * (xm @ _np(layer["w_up"]))) @ _np(layer["w_down"])

    x = rms(x, params["final_norm"])
    lengths = mask.sum(1)
    pooled = x[np.arange(b), np.maximum(lengths - 1, 0)]
    pooled = pooled[:, : cfg.embedding_dim]
    return pooled / np.maximum(np.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)


def test_jax_forward_matches_numpy_reference():
    import jax

    cfg = EncoderConfig.tiny().replace(dtype="float32", param_dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(3))
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    enc = tok(
        ["the riemann zeta function", "finite simple groups are classified", "x"],
        pad_to=24,
    )
    ours = np.asarray(encode_pooled(params, enc.input_ids, enc.attention_mask, cfg))
    ref = numpy_forward(params, enc.input_ids, enc.attention_mask, cfg)
    cos = (ours * ref).sum(-1)
    assert (cos > 0.9999).all(), cos
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_bf16_forward_close_to_fp32():
    import jax

    cfg32 = EncoderConfig.tiny().replace(dtype="float32", param_dtype="float32")
    params = init_params(cfg32, jax.random.PRNGKey(3))
    cfg16 = cfg32.replace(dtype="bfloat16")
    tok = SimpleTokenizer(vocab_size=cfg32.vocab_size)
    enc = tok(["numerical precision check"], pad_to=16)
    e32 = np.asarray(encode_pooled(params, enc.input_ids, enc.attention_mask, cfg32))
    e16 = np.asarray(encode_pooled(params, enc.input_ids, enc.attention_mask, cfg16))
    assert float((e32 * e16).sum(-1)[0]) > 0.99
