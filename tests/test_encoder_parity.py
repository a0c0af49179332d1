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


def test_jax_forward_matches_hf_torch_qwen3(tmp_path):
    """Cross-implementation parity: our JAX encoder vs HuggingFace
    transformers' own torch Qwen3 — same (random) weights round-tripped
    through encoder/loader.py's safetensors path. This proves the
    architecture + loader match the implementation that serves
    Qwen/Qwen3-Embedding-0.6B in the reference (streamlit_app.py:52-59);
    only the published weight VALUES are unavailable in this environment
    (see README 'Encoder parity' note)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers import Qwen3Config, Qwen3ForCausalLM

    import jax

    hf_cfg = Qwen3Config(
        vocab_size=257,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        rope_theta=1_000_000.0,
        rms_norm_eps=1e-6,
        max_position_embeddings=128,
        tie_word_embeddings=False,
        attention_dropout=0.0,
        use_sliding_window=False,
    )
    torch.manual_seed(0)
    hf = Qwen3ForCausalLM(hf_cfg).eval().to(torch.float32)
    hf.save_pretrained(tmp_path, safe_serialization=True)

    from theoremsearch_tpu.encoder.loader import load_hf_checkpoint

    params, cfg = load_hf_checkpoint(tmp_path, dtype="float32")
    cfg = cfg.replace(dtype="float32", param_dtype="float32", pooling="last_token")

    rng = np.random.default_rng(0)
    b, s = 3, 24
    ids = rng.integers(0, hf_cfg.vocab_size, size=(b, s))
    lengths = np.array([24, 17, 5])
    mask = (np.arange(s)[None, :] < lengths[:, None]).astype(np.int32)
    ids = ids * mask  # right padding with 0s

    with torch.no_grad():
        out = hf.model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state.numpy()
    hf_pooled = out[np.arange(b), lengths - 1]
    hf_pooled = hf_pooled / np.linalg.norm(hf_pooled, axis=-1, keepdims=True)

    from theoremsearch_tpu.encoder.model import encode_pooled

    ours = np.asarray(
        encode_pooled(params, jax.numpy.asarray(ids), jax.numpy.asarray(mask), cfg)
    )
    cos = (ours * hf_pooled).sum(-1)
    assert (cos > 0.999).all(), cos
    np.testing.assert_allclose(ours, hf_pooled, atol=5e-3)


def test_loader_accepts_bare_qwen3model_keys(tmp_path):
    """Checkpoints saved from a bare Qwen3Model (no 'model.' key prefix)
    load identically."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers import Qwen3Config, Qwen3Model

    hf_cfg = Qwen3Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=1,
        head_dim=16, max_position_embeddings=64,
    )
    torch.manual_seed(1)
    hf = Qwen3Model(hf_cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    from theoremsearch_tpu.encoder.loader import load_hf_checkpoint

    params, cfg = load_hf_checkpoint(tmp_path, dtype="float32")
    assert params["embed"].shape == (64, 32)
    assert len(params["layers"]) == 1 and len(params["layers"][0]) == 11
