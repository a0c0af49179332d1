"""Gemma-family checkpoint loader: synthetic EmbeddingGemma-layout
checkpoint (Gemma3 text tower + sentence-transformers Dense head dirs)
round-trips through load_hf_gemma_checkpoint, family detection routes
correctly, and BatchedEncoder serves the gemma tower end to end."""

import json

import numpy as np
import pytest

from theoremsearch_tpu.encoder.gemma import encode_pooled
from theoremsearch_tpu.encoder.loader import (
    detect_family,
    gemma_config_from_hf,
    load_hf_gemma_checkpoint,
)
from theoremsearch_tpu.encoder.tokenizer import SimpleTokenizer

H, I, Dh, NH, NKV, L, V = 64, 128, 32, 2, 1, 4, 512
HEAD_HID, EMB = 96, 48


def _tower_tensors(rng):
    tensors = {
        "model.embed_tokens.weight": rng.standard_normal((V, H)).astype(np.float32) * 0.02,
        "model.norm.weight": np.zeros(H, np.float32),
    }
    qdim, kvdim = Dh * NH, Dh * NKV
    for i in range(L):
        p = f"model.layers.{i}."
        tensors |= {
            p + "input_layernorm.weight": np.zeros(H, np.float32),
            p + "post_attention_layernorm.weight": np.zeros(H, np.float32),
            p + "pre_feedforward_layernorm.weight": np.zeros(H, np.float32),
            p + "post_feedforward_layernorm.weight": np.zeros(H, np.float32),
            p + "self_attn.q_proj.weight": rng.standard_normal((qdim, H)).astype(np.float32) * 0.05,
            p + "self_attn.k_proj.weight": rng.standard_normal((kvdim, H)).astype(np.float32) * 0.05,
            p + "self_attn.v_proj.weight": rng.standard_normal((kvdim, H)).astype(np.float32) * 0.05,
            p + "self_attn.o_proj.weight": rng.standard_normal((H, qdim)).astype(np.float32) * 0.05,
            p + "self_attn.q_norm.weight": np.zeros(Dh, np.float32),
            p + "self_attn.k_norm.weight": np.zeros(Dh, np.float32),
            p + "mlp.gate_proj.weight": rng.standard_normal((I, H)).astype(np.float32) * 0.05,
            p + "mlp.up_proj.weight": rng.standard_normal((I, H)).astype(np.float32) * 0.05,
            p + "mlp.down_proj.weight": rng.standard_normal((H, I)).astype(np.float32) * 0.05,
        }
    return tensors


@pytest.fixture
def fake_gemma_checkpoint(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("gemma_ckpt")
    from safetensors.numpy import save_file

    cfg = {
        "model_type": "gemma3_text",
        "vocab_size": V,
        "hidden_size": H,
        "intermediate_size": I,
        "num_hidden_layers": L,
        "num_attention_heads": NH,
        "num_key_value_heads": NKV,
        "head_dim": Dh,
        "rope_theta": 1000000.0,
        "rope_local_base_freq": 10000.0,
        "sliding_window": 16,
        "layer_types": [
            "sliding_attention", "full_attention",
            "sliding_attention", "full_attention",
        ],
        "query_pre_attn_scalar": 32,
        "rms_norm_eps": 1e-6,
        "use_bidirectional_attention": True,
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg))
    rng = np.random.default_rng(0)
    tensors = _tower_tensors(rng)
    save_file(tensors, str(tmp_path / "model.safetensors"))

    # sentence-transformers head modules (embeddinggemma layout)
    for name, (din, dout) in (("2_Dense", (H, HEAD_HID)), ("3_Dense", (HEAD_HID, EMB))):
        d = tmp_path / name
        d.mkdir()
        w = rng.standard_normal((dout, din)).astype(np.float32) * 0.05
        tensors[name] = w
        save_file({"linear.weight": w}, str(d / "model.safetensors"))
    return tmp_path, tensors


def test_detect_family(fake_gemma_checkpoint, tmp_path):
    path, _ = fake_gemma_checkpoint
    assert detect_family(path) == "gemma"
    (tmp_path / "config.json").write_text(json.dumps({"model_type": "qwen3"}))
    assert detect_family(tmp_path) == "qwen"


def test_gemma_config_from_hf(fake_gemma_checkpoint):
    path, _ = fake_gemma_checkpoint
    cfg = gemma_config_from_hf(path)
    assert cfg.hidden_size == H and cfg.num_layers == L
    assert cfg.global_every == 2            # derived from layer_types
    assert cfg.sliding_window == 16         # raw value, split at runtime
    assert cfg.query_pre_attn_scalar == 32.0


def test_load_and_encode(fake_gemma_checkpoint):
    path, tensors = fake_gemma_checkpoint
    params, cfg = load_hf_gemma_checkpoint(path, dtype="float32")
    np.testing.assert_allclose(
        np.asarray(params["layers"][0]["wo"], np.float32),
        tensors["model.layers.0.self_attn.o_proj.weight"].T,
        rtol=1e-6,
    )
    # ST head adopted, shapes fold into the config
    assert cfg.head_hidden == HEAD_HID and cfg.embedding_dim == EMB
    np.testing.assert_allclose(
        np.asarray(params["head_w2"], np.float32), tensors["3_Dense"].T, rtol=1e-6
    )
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    enc = tok(["gemma tower forward"], pad_to=16)
    out = np.asarray(encode_pooled(params, enc.input_ids, enc.attention_mask, cfg))
    assert out.shape == (1, EMB)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)


def test_headless_tower_loads(tmp_path):
    """A bare Gemma3 checkpoint (no ST Dense dirs) pools to hidden_size."""
    from safetensors.numpy import save_file

    cfg = {
        "model_type": "gemma3_text",
        "vocab_size": V, "hidden_size": H, "intermediate_size": I,
        "num_hidden_layers": L, "num_attention_heads": NH,
        "num_key_value_heads": NKV, "head_dim": Dh,
        "sliding_window": 16, "sliding_window_pattern": 2,
        "query_pre_attn_scalar": 32,
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg))
    save_file(_tower_tensors(np.random.default_rng(1)), str(tmp_path / "model.safetensors"))
    params, lcfg = load_hf_gemma_checkpoint(tmp_path, dtype="float32")
    assert "head_w1" not in params
    assert lcfg.global_every == 2           # from sliding_window_pattern
    tok = SimpleTokenizer(vocab_size=lcfg.vocab_size)
    enc = tok(["headless"], pad_to=8)
    out = np.asarray(encode_pooled(params, enc.input_ids, enc.attention_mask, lcfg))
    assert out.shape == (1, H)


def test_batched_encoder_gemma():
    """BatchedEncoder dispatches on the config type and serves gemma."""
    import jax

    from theoremsearch_tpu.core.config import GemmaEncoderConfig
    from theoremsearch_tpu.encoder.batching import BatchedEncoder
    from theoremsearch_tpu.encoder.gemma import init_params

    cfg = GemmaEncoderConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(0))
    enc = BatchedEncoder(params, cfg, batch_size=8)
    out = enc.encode(["theorem about primes", "lemma on groups", "x"])
    assert out.shape == (3, cfg.embedding_dim)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-4)
    # deterministic across calls and batch splits
    out2 = enc.encode(["theorem about primes"])
    np.testing.assert_allclose(out[0], out2[0], atol=1e-5)


def test_batched_encoder_gemma_mesh():
    """Gemma under the data-parallel mesh with tensor-parallel params."""
    import jax

    from theoremsearch_tpu.core import make_mesh
    from theoremsearch_tpu.core.config import GemmaEncoderConfig
    from theoremsearch_tpu.encoder.batching import BatchedEncoder
    from theoremsearch_tpu.encoder.gemma import init_params, shard_params

    mesh = make_mesh()
    cfg = GemmaEncoderConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(0))
    ref = BatchedEncoder(params, cfg, batch_size=8).encode(["a b c", "d e"])
    sharded = shard_params(params, mesh)
    enc = BatchedEncoder(sharded, cfg, mesh=mesh, batch_size=8)
    out = enc.encode(["a b c", "d e"])
    # bf16 activations + TP-reshuffled reduction order: gate on cosine
    cos = np.sum(out * ref, axis=1)
    assert cos.min() > 0.999, cos


def test_role_prompts_applied(tmp_path):
    """sentence-transformers role prompts: encode(role=...) must equal
    encoding the manually prefixed text, and load_st_prompts reads the
    checkpoint's config_sentence_transformers.json."""
    import jax

    from theoremsearch_tpu.core.config import GemmaEncoderConfig
    from theoremsearch_tpu.encoder.batching import BatchedEncoder
    from theoremsearch_tpu.encoder.gemma import init_params
    from theoremsearch_tpu.encoder.loader import load_st_prompts

    (tmp_path / "config_sentence_transformers.json").write_text(json.dumps({
        "prompts": {
            "query": "task: search result | query: ",
            "document": "title: none | text: ",
        }
    }))
    prompts = load_st_prompts(tmp_path)
    assert prompts["query"].startswith("task: search result")
    assert load_st_prompts(tmp_path / "missing") == {}

    cfg = GemmaEncoderConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(0))
    enc = BatchedEncoder(params, cfg, batch_size=8, prompts=prompts)
    q = enc.encode(["prime gaps"], role="query")
    manual = enc.encode(["task: search result | query: prime gaps"])
    np.testing.assert_allclose(q, manual, atol=1e-6)
    # roles change the embedding
    d = enc.encode(["prime gaps"], role="document")
    assert not np.allclose(q, d, atol=1e-4)
    # for_role closure matches the role call
    np.testing.assert_allclose(enc.for_role("query")(["prime gaps"]), q, atol=1e-6)
