"""BERT-family tower: numerical parity against transformers' BertModel
(the reference's third embedder is a zbMath BERT served through
sentence-transformers, compare_embeddings.py:429-470), plus loader
round-trip and BatchedEncoder integration."""

from __future__ import annotations

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from theoremsearch_tpu.core.config import BertEncoderConfig
from theoremsearch_tpu.encoder import bert


def _hf_model(cfg: BertEncoderConfig):
    from transformers import BertConfig, BertModel

    hf_cfg = BertConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        hidden_act=cfg.hidden_act,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        max_position_embeddings=cfg.max_seq_len,
        type_vocab_size=cfg.type_vocab_size,
        layer_norm_eps=cfg.layer_norm_eps,
        attn_implementation="eager",
    )
    m = BertModel(hf_cfg).to(torch.float32).eval()
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return m


def _params_from_hf(m, cfg: BertEncoderConfig):
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    layers = []
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}."
        layers.append(
            {
                "wq": sd[p + "attention.self.query.weight"].T.astype(np.float32),
                "bq": sd[p + "attention.self.query.bias"].astype(np.float32),
                "wk": sd[p + "attention.self.key.weight"].T.astype(np.float32),
                "bk": sd[p + "attention.self.key.bias"].astype(np.float32),
                "wv": sd[p + "attention.self.value.weight"].T.astype(np.float32),
                "bv": sd[p + "attention.self.value.bias"].astype(np.float32),
                "wo": sd[p + "attention.output.dense.weight"].T.astype(np.float32),
                "bo": sd[p + "attention.output.dense.bias"].astype(np.float32),
                "attn_ln_g": sd[p + "attention.output.LayerNorm.weight"].astype(np.float32),
                "attn_ln_b": sd[p + "attention.output.LayerNorm.bias"].astype(np.float32),
                "w_in": sd[p + "intermediate.dense.weight"].T.astype(np.float32),
                "b_in": sd[p + "intermediate.dense.bias"].astype(np.float32),
                "w_out": sd[p + "output.dense.weight"].T.astype(np.float32),
                "b_out": sd[p + "output.dense.bias"].astype(np.float32),
                "mlp_ln_g": sd[p + "output.LayerNorm.weight"].astype(np.float32),
                "mlp_ln_b": sd[p + "output.LayerNorm.bias"].astype(np.float32),
            }
        )
    return {
        "embed": sd["embeddings.word_embeddings.weight"].astype(np.float32),
        "pos_embed": sd["embeddings.position_embeddings.weight"].astype(np.float32),
        "type_embed": sd["embeddings.token_type_embeddings.weight"].astype(np.float32),
        "embed_ln_g": sd["embeddings.LayerNorm.weight"].astype(np.float32),
        "embed_ln_b": sd["embeddings.LayerNorm.bias"].astype(np.float32),
        "layers": layers,
    }


@pytest.fixture(scope="module")
def tiny_pair():
    cfg = BertEncoderConfig.tiny()
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "param_dtype": "float32"})
    m = _hf_model(cfg)
    return cfg, m, _params_from_hf(m, cfg)


def test_hidden_state_parity(tiny_pair):
    cfg, m, params = tiny_pair
    rng = np.random.default_rng(0)
    B, S = 2, 24
    ids = rng.integers(0, cfg.vocab_size, (B, S)).astype(np.int64)
    mask = np.ones((B, S), np.int64)
    with torch.no_grad():
        ref = m(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()
    got = np.asarray(bert.forward(params, ids, mask, cfg))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_hidden_state_parity_padded(tiny_pair):
    cfg, m, params = tiny_pair
    rng = np.random.default_rng(1)
    B, S = 3, 20
    lens = [20, 11, 5]
    ids = rng.integers(0, cfg.vocab_size, (B, S)).astype(np.int64)
    mask = np.zeros((B, S), np.int64)
    for i, L in enumerate(lens):
        mask[i, :L] = 1
    with torch.no_grad():
        ref = m(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()
    got = np.asarray(bert.forward(params, ids, mask, cfg))
    for i, L in enumerate(lens):
        np.testing.assert_allclose(got[i, :L], ref[i, :L], rtol=2e-4, atol=2e-4)


def test_encode_pooled(tiny_pair):
    cfg, m, params = tiny_pair
    rng = np.random.default_rng(2)
    ids = rng.integers(0, cfg.vocab_size, (2, 16)).astype(np.int64)
    mask = np.ones((2, 16), np.int64)
    mask[1, 7:] = 0
    out = np.asarray(bert.encode_pooled(params, ids, mask, cfg))
    assert out.shape == (2, cfg.embedding_dim)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)
    # mean pooling must ignore padded positions: changing a padded token
    # changes nothing
    ids2 = ids.copy()
    ids2[1, 10] = (ids2[1, 10] + 1) % cfg.vocab_size
    out2 = np.asarray(bert.encode_pooled(params, ids2, mask, cfg))
    np.testing.assert_allclose(out[1], out2[1], atol=1e-6)


def test_loader_roundtrip(tmp_path, tiny_pair):
    """Synthetic BertModel-layout safetensors -> load_hf_bert_checkpoint
    reproduces the parity fixture's params exactly."""
    from safetensors.numpy import save_file

    from theoremsearch_tpu.encoder.loader import (
        detect_family,
        load_hf_bert_checkpoint,
    )

    cfg, m, params = tiny_pair
    (tmp_path / "config.json").write_text(json.dumps({
        "model_type": "bert",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "type_vocab_size": cfg.type_vocab_size,
        "hidden_act": "gelu",
        "layer_norm_eps": cfg.layer_norm_eps,
        "max_position_embeddings": cfg.max_seq_len,
    }))
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    save_file(sd, str(tmp_path / "model.safetensors"))

    assert detect_family(tmp_path) == "bert"
    loaded, lcfg = load_hf_bert_checkpoint(tmp_path, dtype="float32")
    assert lcfg.num_layers == cfg.num_layers and lcfg.hidden_act == "gelu"
    # align ACTIVATION dtype with the fp32 fixture (the loader's dtype
    # parameter covers params; lcfg defaults to bf16 activations)
    lcfg = type(lcfg)(**{**lcfg.__dict__, "dtype": "float32", "param_dtype": "float32"})
    np.testing.assert_allclose(
        np.asarray(loaded["layers"][1]["w_in"], np.float32),
        params["layers"][1]["w_in"],
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(loaded["pos_embed"], np.float32), params["pos_embed"], rtol=1e-6
    )
    rng = np.random.default_rng(3)
    ids = rng.integers(0, cfg.vocab_size, (1, 12)).astype(np.int64)
    mask = np.ones((1, 12), np.int64)
    np.testing.assert_allclose(
        np.asarray(bert.encode_pooled(loaded, ids, mask, lcfg)),
        np.asarray(bert.encode_pooled(params, ids, mask, cfg)),
        atol=1e-6,
    )


def test_batched_encoder_bert():
    import jax

    from theoremsearch_tpu.encoder.batching import BatchedEncoder

    cfg = BertEncoderConfig.tiny()
    params = bert.init_params(cfg, jax.random.PRNGKey(0))
    enc = BatchedEncoder(params, cfg, batch_size=8)
    out = enc.encode(["ramsey numbers", "class field theory", "pde"])
    assert out.shape == (3, cfg.embedding_dim)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-4)


def test_batched_encoder_bert_mesh():
    import jax

    from theoremsearch_tpu.core import make_mesh
    from theoremsearch_tpu.encoder.batching import BatchedEncoder

    mesh = make_mesh()
    cfg = BertEncoderConfig.tiny()
    params = bert.init_params(cfg, jax.random.PRNGKey(0))
    ref = BatchedEncoder(params, cfg, batch_size=8).encode(["a b c", "d e"])
    enc = BatchedEncoder(
        bert.shard_params(params, mesh), cfg, mesh=mesh, batch_size=8
    )
    out = enc.encode(["a b c", "d e"])
    cos = np.sum(out * ref, axis=1)
    assert cos.min() > 0.999, cos
