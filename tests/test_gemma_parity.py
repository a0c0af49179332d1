"""Numerical parity of the JAX gemma tower against transformers'
Gemma3TextModel (the reference implementation of the embeddinggemma
architecture: HF google/embeddinggemma-300m is a Gemma3TextModel with
use_bidirectional_attention=True plus a sentence-transformers
mean-pool + Dense + Dense + Normalize head).

This is a stronger check than the qwen tower's numpy parity test: the
oracle here is the actual upstream model code, exercised on a tiny
random-weight config in fp32 on CPU.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from theoremsearch_tpu.core.config import GemmaEncoderConfig
from theoremsearch_tpu.encoder import gemma


def _hf_model(cfg: GemmaEncoderConfig):
    from transformers import Gemma3TextConfig, Gemma3TextModel

    layer_types = [
        "full_attention" if gemma.is_global_layer(cfg, i) else "sliding_attention"
        for i in range(cfg.num_layers)
    ]
    hf_cfg = Gemma3TextConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        rope_theta=cfg.rope_theta,
        rope_local_base_freq=cfg.rope_local_theta,
        rope_scaling=None,
        sliding_window=cfg.sliding_window,
        layer_types=layer_types,
        query_pre_attn_scalar=cfg.query_pre_attn_scalar,
        rms_norm_eps=cfg.rms_norm_eps,
        max_position_embeddings=cfg.max_seq_len,
        use_bidirectional_attention=True,
        attention_dropout=0.0,
        attn_implementation="eager",
    )
    m = Gemma3TextModel(hf_cfg).to(torch.float32).eval()
    # non-trivial weights: the default init gives zeros for norms (which
    # is fine, gemma norms are zero-init) but near-zero everything else
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return m


def _params_from_hf(m, cfg: GemmaEncoderConfig, key):
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    layers = []
    for i in range(cfg.num_layers):
        p = f"layers.{i}."
        layers.append(
            {
                "attn_norm": sd[p + "input_layernorm.weight"].astype(np.float32),
                "post_attn_norm": sd[p + "post_attention_layernorm.weight"].astype(np.float32),
                "wq": sd[p + "self_attn.q_proj.weight"].T.astype(np.float32),
                "wk": sd[p + "self_attn.k_proj.weight"].T.astype(np.float32),
                "wv": sd[p + "self_attn.v_proj.weight"].T.astype(np.float32),
                "wo": sd[p + "self_attn.o_proj.weight"].T.astype(np.float32),
                "q_norm": sd[p + "self_attn.q_norm.weight"].astype(np.float32),
                "k_norm": sd[p + "self_attn.k_norm.weight"].astype(np.float32),
                "pre_mlp_norm": sd[p + "pre_feedforward_layernorm.weight"].astype(np.float32),
                "post_mlp_norm": sd[p + "post_feedforward_layernorm.weight"].astype(np.float32),
                "w_gate": sd[p + "mlp.gate_proj.weight"].T.astype(np.float32),
                "w_up": sd[p + "mlp.up_proj.weight"].T.astype(np.float32),
                "w_down": sd[p + "mlp.down_proj.weight"].T.astype(np.float32),
            }
        )
    import jax

    base = gemma.init_params(cfg, key)   # supplies the ST head
    return {
        "embed": sd["embed_tokens.weight"].astype(np.float32),
        "final_norm": sd["norm.weight"].astype(np.float32),
        "layers": layers,
        "head_w1": np.asarray(base["head_w1"], np.float32),
        "head_b1": np.asarray(base["head_b1"], np.float32),
        "head_w2": np.asarray(base["head_w2"], np.float32),
        "head_b2": np.asarray(base["head_b2"], np.float32),
    }


@pytest.fixture(scope="module")
def tiny_pair():
    import jax

    cfg = GemmaEncoderConfig.tiny()
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "param_dtype": "float32"})
    m = _hf_model(cfg)
    params = _params_from_hf(m, cfg, jax.random.PRNGKey(3))
    return cfg, m, params


def test_hidden_state_parity(tiny_pair):
    """Full-seq (no padding) hidden states match HF to fp32 tolerance,
    exercising BOTH sliding (local rope) and global layers."""
    cfg, m, params = tiny_pair
    rng = np.random.default_rng(0)
    B, S = 2, 48   # > sliding_window=16 so the window actually cuts
    ids = rng.integers(0, cfg.vocab_size, (B, S)).astype(np.int64)
    mask = np.ones((B, S), np.int64)

    with torch.no_grad():
        ref = m(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()

    got = np.asarray(gemma.forward(params, ids, mask, cfg))
    cos = np.sum(ref * got, -1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1)
    )
    assert cos.min() > 0.99999, cos.min()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_hidden_state_parity_padded(tiny_pair):
    """Right-padded batches: real-token rows match the unpadded run of
    the same sequences (bidirectional attention must not leak padding)."""
    cfg, m, params = tiny_pair
    rng = np.random.default_rng(1)
    B, S = 3, 40
    lens = [40, 22, 9]
    ids = rng.integers(0, cfg.vocab_size, (B, S)).astype(np.int64)
    mask = np.zeros((B, S), np.int64)
    for i, L in enumerate(lens):
        mask[i, :L] = 1

    with torch.no_grad():
        ref = m(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()
    got = np.asarray(gemma.forward(params, ids, mask, cfg))
    for i, L in enumerate(lens):
        np.testing.assert_allclose(got[i, :L], ref[i, :L], rtol=2e-4, atol=2e-4)

    # and padding must not change real-token outputs at all
    for i, L in enumerate(lens):
        solo = np.asarray(
            gemma.forward(params, ids[i : i + 1, :L], mask[i : i + 1, :L], cfg)
        )
        np.testing.assert_allclose(got[i, :L], solo[0], rtol=2e-4, atol=2e-4)


def test_encode_pooled_head_and_normalize(tiny_pair):
    """encode_pooled = mean pool over valid tokens -> Dense -> Dense ->
    L2 normalize, reproduced here with numpy."""
    cfg, m, params = tiny_pair
    rng = np.random.default_rng(2)
    B, S = 2, 24
    ids = rng.integers(0, cfg.vocab_size, (B, S)).astype(np.int64)
    mask = np.ones((B, S), np.int64)
    mask[1, 10:] = 0

    hidden = np.asarray(gemma.forward(params, ids, mask, cfg), np.float32)
    mk = mask[:, :, None].astype(np.float32)
    pooled = (hidden * mk).sum(1) / np.maximum(mk.sum(1), 1e-9)
    pooled = pooled @ np.asarray(params["head_w1"], np.float32) + np.asarray(
        params["head_b1"], np.float32
    )
    pooled = pooled @ np.asarray(params["head_w2"], np.float32) + np.asarray(
        params["head_b2"], np.float32
    )
    want = pooled / np.maximum(np.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)

    got = np.asarray(gemma.encode_pooled(params, ids, mask, cfg))
    assert got.shape == (B, cfg.embedding_dim)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, rtol=1e-5)


def test_sliding_vs_global_masks_differ(tiny_pair):
    """Sanity: with S > window the sliding layers must actually restrict
    attention — zeroing far-away tokens changes nothing for a sliding-only
    model but does for a global layer."""
    cfg, m, params = tiny_pair
    rng = np.random.default_rng(4)
    S = 40
    ids = rng.integers(0, cfg.vocab_size, (1, S)).astype(np.int64)
    mask = np.ones((1, S), np.int64)
    out_full = np.asarray(gemma.forward(params, ids, mask, cfg))

    # perturb a token far outside position 0's sliding window
    ids2 = ids.copy()
    ids2[0, S - 1] = (ids2[0, S - 1] + 1) % cfg.vocab_size
    out_pert = np.asarray(gemma.forward(params, ids2, mask, cfg))
    # position 0 still changes (global layers see everything)...
    assert np.abs(out_full[0, 0] - out_pert[0, 0]).max() > 0
    # ...but much less than positions inside the perturbed token's window
    d_near = np.abs(out_full[0, S - 2] - out_pert[0, S - 2]).max()
    d_far = np.abs(out_full[0, 0] - out_pert[0, 0]).max()
    assert d_near > d_far


def test_fused_attention_matches_xla_path():
    """The Pallas fused bidirectional attention (interpret mode) matches
    the XLA reference composition at serving shapes where the sliding
    window cannot bind, including padded rows and both rope kinds."""
    import jax

    cfg = GemmaEncoderConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=2, num_kv_heads=1, head_dim=128,
        sliding_window=256, global_every=2, query_pre_attn_scalar=128.0,
        max_seq_len=32, head_hidden=32, embedding_dim=64,
        dtype="float32", param_dtype="float32",
    )
    params = gemma.init_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    B, S = 8, 16
    assert gemma._fused_ok(cfg, S, B)
    ids = rng.integers(0, cfg.vocab_size, (B, S)).astype(np.int64)
    mask = np.ones((B, S), np.int64)
    mask[3, 9:] = 0
    ref = np.asarray(gemma.forward(params, ids, mask, cfg, fused="off"))
    got = np.asarray(gemma.forward(params, ids, mask, cfg, fused="interpret"))
    real = mask.astype(bool)
    cos = np.sum(ref[real] * got[real], -1) / np.maximum(
        np.linalg.norm(ref[real], axis=-1) * np.linalg.norm(got[real], axis=-1),
        1e-12,
    )
    assert cos.min() > 0.999, cos.min()

    # gradients flow through the custom VJP (backward = XLA recompute)
    def loss(p):
        h = gemma.forward(p, ids, mask, cfg, fused="interpret")
        return (h.astype(np.float32) ** 2).mean()

    g = jax.grad(loss)(params)
    assert np.isfinite(np.asarray(g["layers"][0]["wq"], np.float32)).all()

    # shapes where the window binds must REJECT the fused path
    assert not gemma._fused_ok(
        type(cfg)(**{**cfg.__dict__, "sliding_window": 16}), S, B
    )
    # odd head_dim rejects too
    assert not gemma._fused_ok(
        type(cfg)(**{**cfg.__dict__, "head_dim": 96}), S, B
    )


def test_loader_roundtrip_from_hf_state_dict(tmp_path, tiny_pair):
    """Save the HF Gemma3TextModel's own state_dict as a checkpoint dir;
    load_hf_gemma_checkpoint must reproduce the parity fixture's forward
    exactly (closes the loader <-> HF loop, like the bert test)."""
    import json

    from safetensors.numpy import save_file

    from theoremsearch_tpu.encoder.loader import (
        detect_family,
        load_hf_gemma_checkpoint,
    )

    cfg, m, params = tiny_pair
    (tmp_path / "config.json").write_text(json.dumps({
        "model_type": "gemma3_text",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
        "rope_theta": cfg.rope_theta,
        "rope_local_base_freq": cfg.rope_local_theta,
        "sliding_window": cfg.sliding_window,
        "layer_types": [
            "full_attention" if gemma.is_global_layer(cfg, i) else "sliding_attention"
            for i in range(cfg.num_layers)
        ],
        "query_pre_attn_scalar": cfg.query_pre_attn_scalar,
        "rms_norm_eps": cfg.rms_norm_eps,
        "use_bidirectional_attention": True,
    }))
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    save_file(sd, str(tmp_path / "model.safetensors"))

    assert detect_family(tmp_path) == "gemma"
    loaded, lcfg = load_hf_gemma_checkpoint(tmp_path, dtype="float32")
    lcfg = type(lcfg)(**{**lcfg.__dict__, "dtype": "float32", "param_dtype": "float32"})
    rng = np.random.default_rng(5)
    ids = rng.integers(0, cfg.vocab_size, (2, 20)).astype(np.int64)
    mask = np.ones((2, 20), np.int64)
    mask[1, 8:] = 0
    got = np.asarray(gemma.forward(loaded, ids, mask, lcfg))
    want = np.asarray(gemma.forward(params, ids, mask, cfg))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # and against HF itself
    with torch.no_grad():
        ref = m(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()
    np.testing.assert_allclose(got[0], ref[0], rtol=2e-4, atol=2e-4)


def test_fused_attention_at_production_head_shapes():
    """CI coverage for embeddinggemma's real head geometry (head_dim=256,
    3:1 GQA) through the fused kernel in interpret mode — the shape the
    relaxed _fused_ok gate exists to admit."""
    import jax

    cfg = GemmaEncoderConfig(
        vocab_size=512, hidden_size=768, intermediate_size=256,
        num_layers=2, num_heads=3, num_kv_heads=1, head_dim=256,
        sliding_window=512, global_every=2, query_pre_attn_scalar=256.0,
        max_seq_len=32, head_hidden=64, embedding_dim=768,
        dtype="float32", param_dtype="float32",
    )
    params = gemma.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B, S = 8, 16
    assert gemma._fused_ok(cfg, S, B)
    ids = rng.integers(0, cfg.vocab_size, (B, S)).astype(np.int64)
    mask = np.ones((B, S), np.int64)
    mask[2, 5:] = 0
    ref = np.asarray(gemma.forward(params, ids, mask, cfg, fused="off"))
    got = np.asarray(gemma.forward(params, ids, mask, cfg, fused="interpret"))
    real = mask.astype(bool)
    cos = np.sum(ref[real] * got[real], -1) / np.maximum(
        np.linalg.norm(ref[real], axis=-1) * np.linalg.norm(got[real], axis=-1),
        1e-12,
    )
    assert cos.min() > 0.999, cos.min()
