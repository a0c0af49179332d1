"""HF checkpoint loader: build a synthetic Qwen3-layout safetensors
checkpoint, load it, and verify the params wire up and encode."""

import json

import numpy as np
import pytest

from theoremsearch_tpu.encoder.loader import config_from_hf, load_hf_checkpoint
from theoremsearch_tpu.encoder.model import encode_pooled
from theoremsearch_tpu.encoder.tokenizer import SimpleTokenizer


@pytest.fixture
def fake_checkpoint(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("ckpt")
    from safetensors.numpy import save_file

    cfg = {
        "vocab_size": 512,
        "hidden_size": 64,
        "intermediate_size": 128,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "head_dim": 16,
        "rope_theta": 1000000.0,
        "rms_norm_eps": 1e-6,
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg))
    rng = np.random.default_rng(0)
    H, I, Dh = cfg["hidden_size"], cfg["intermediate_size"], cfg["head_dim"]
    qdim, kvdim = Dh * cfg["num_attention_heads"], Dh * cfg["num_key_value_heads"]

    tensors = {
        "model.embed_tokens.weight": rng.standard_normal((512, H)).astype(np.float32) * 0.02,
        "model.norm.weight": np.ones(H, np.float32),
    }
    for i in range(2):
        p = f"model.layers.{i}."
        tensors |= {
            p + "input_layernorm.weight": np.ones(H, np.float32),
            p + "self_attn.q_proj.weight": rng.standard_normal((qdim, H)).astype(np.float32) * 0.05,
            p + "self_attn.k_proj.weight": rng.standard_normal((kvdim, H)).astype(np.float32) * 0.05,
            p + "self_attn.v_proj.weight": rng.standard_normal((kvdim, H)).astype(np.float32) * 0.05,
            p + "self_attn.o_proj.weight": rng.standard_normal((H, qdim)).astype(np.float32) * 0.05,
            p + "self_attn.q_norm.weight": np.ones(Dh, np.float32),
            p + "self_attn.k_norm.weight": np.ones(Dh, np.float32),
            p + "post_attention_layernorm.weight": np.ones(H, np.float32),
            p + "mlp.gate_proj.weight": rng.standard_normal((I, H)).astype(np.float32) * 0.05,
            p + "mlp.up_proj.weight": rng.standard_normal((I, H)).astype(np.float32) * 0.05,
            p + "mlp.down_proj.weight": rng.standard_normal((H, I)).astype(np.float32) * 0.05,
        }
    save_file(tensors, str(tmp_path / "model.safetensors"))
    return tmp_path, tensors


def test_config_from_hf(fake_checkpoint):
    path, _ = fake_checkpoint
    cfg = config_from_hf(path)
    assert cfg.hidden_size == 64 and cfg.num_layers == 2 and cfg.head_dim == 16
    assert cfg.num_kv_heads == 2 and cfg.vocab_size == 512


def test_load_and_encode(fake_checkpoint):
    path, tensors = fake_checkpoint
    params, cfg = load_hf_checkpoint(path, dtype="float32")
    # HF (out,in) transposed to our (in,out)
    np.testing.assert_allclose(
        np.asarray(params["layers"][0]["wq"], np.float32),
        tensors["model.layers.0.self_attn.q_proj.weight"].T,
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params["embed"], np.float32),
        tensors["model.embed_tokens.weight"],
        rtol=1e-6,
    )
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    enc = tok(["loaded checkpoint forward"], pad_to=16)
    out = np.asarray(encode_pooled(params, enc.input_ids, enc.attention_mask, cfg))
    assert out.shape == (1, cfg.embedding_dim)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)


def test_incomplete_checkpoint_raises(tmp_path, fake_checkpoint):
    import shutil

    src, _ = fake_checkpoint
    shutil.copy(src / "config.json", tmp_path / "config.json")
    from safetensors.numpy import save_file

    save_file({"model.embed_tokens.weight": np.zeros((512, 64), np.float32)},
              str(tmp_path / "model.safetensors"))
    with pytest.raises(ValueError, match="incomplete checkpoint"):
        load_hf_checkpoint(tmp_path)
