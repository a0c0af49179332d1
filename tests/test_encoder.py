"""Encoder tests: shape/normalization invariants, padding insensitivity,
determinism, tokenizer behavior, batched encoding, and the contrastive
training step on the CPU mesh (dp+tp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theoremsearch_tpu.core import EncoderConfig, MeshConfig, make_mesh
from theoremsearch_tpu.core.config import TrainConfig
from theoremsearch_tpu.encoder import (
    BatchedEncoder,
    QwenEncoder,
    SimpleTokenizer,
    encode_pooled,
    init_params,
)
from theoremsearch_tpu.train import init_sharded_train_state, init_train_state, make_train_step


@pytest.fixture(scope="module")
def enc():
    return QwenEncoder(EncoderConfig.tiny(), seed=0)


def _batch(tok, texts, width=32):
    e = tok(texts, max_length=width, pad_to=width)
    return jnp.asarray(e.input_ids), jnp.asarray(e.attention_mask)


def test_encoder_shapes_and_norm(enc):
    tok = SimpleTokenizer(vocab_size=enc.cfg.vocab_size)
    ids, mask = _batch(tok, ["the quick brown fox", "a theorem about primes"])
    out = np.asarray(enc(ids, mask))
    assert out.shape == (2, enc.cfg.embedding_dim)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)


def test_encoder_padding_invariance(enc):
    # same text padded to different widths must embed (nearly) identically:
    # last-token pooling + causal masking makes trailing pad irrelevant
    tok = SimpleTokenizer(vocab_size=enc.cfg.vocab_size)
    ids1, m1 = _batch(tok, ["hello world theorem"], width=16)
    ids2, m2 = _batch(tok, ["hello world theorem"], width=48)
    e1 = np.asarray(enc(ids1, m1))[0]
    e2 = np.asarray(enc(ids2, m2))[0]
    assert float(e1 @ e2) > 0.999


def test_encoder_deterministic(enc):
    tok = SimpleTokenizer(vocab_size=enc.cfg.vocab_size)
    ids, mask = _batch(tok, ["determinism check"])
    a = np.asarray(enc(ids, mask))
    b = np.asarray(enc(ids, mask))
    np.testing.assert_array_equal(a, b)


def test_encoder_distinguishes_texts(enc):
    tok = SimpleTokenizer(vocab_size=enc.cfg.vocab_size)
    ids, mask = _batch(
        tok, ["riemann hypothesis zeros", "riemann hypothesis zeros", "kitten videos online"]
    )
    out = np.asarray(enc(ids, mask))
    assert float(out[0] @ out[1]) > 0.999
    assert float(out[0] @ out[2]) < 0.999


def test_mean_pooling_config():
    cfg = EncoderConfig.tiny().replace(pooling="mean")
    enc = QwenEncoder(cfg, seed=0)
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    ids, mask = _batch(tok, ["mean pooled text"])
    out = np.asarray(enc(ids, mask))
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)


def test_tokenizer_roundtrip_properties():
    tok = SimpleTokenizer(vocab_size=5000)
    a = tok.tokenize("Let $G$ be a finite group")
    b = tok.tokenize("Let $G$ be a finite group")
    assert a == b and len(a) > 0
    assert all(3 <= t < 5000 for t in a)
    enc = tok(["short", "a much longer piece of text with many tokens"], pad_to=16)
    assert enc.input_ids.shape == (2, 16)
    assert enc.attention_mask.sum(axis=1)[0] < enc.attention_mask.sum(axis=1)[1]
    # truncation
    long = tok(["word " * 500], max_length=16)
    assert long.input_ids.shape[1] == 16


def test_batched_encoder_order_and_buckets(enc):
    be = BatchedEncoder(enc.params, enc.cfg, batch_size=4, buckets=(16, 32, 64))
    texts = [f"text number {i} " + "pad " * (i % 7) for i in range(11)]
    out = be.encode(texts)
    assert out.shape == (11, enc.cfg.embedding_dim)
    # order preserved: encoding one at a time matches the batch rows
    solo = be.encode([texts[5]])
    assert float(out[5] @ solo[0]) > 0.999
    assert be.encode([]).shape == (0, enc.cfg.embedding_dim)


def test_batched_encoder_pipelined_subbatches(enc):
    """encode() dispatches sub-batch i+1 before pulling i (software
    pipeline over the device round-trip); every row must still land at
    its input position. 23 texts at batch_size=4 -> 6 pipelined
    sub-batches with mixed width buckets."""
    texts = [f"statement {i} " + "word " * (i % 9) for i in range(23)]
    piped = BatchedEncoder(
        enc.params, enc.cfg, batch_size=4, buckets=(16, 32, 64)
    ).encode(texts)
    single = BatchedEncoder(
        enc.params, enc.cfg, batch_size=64, buckets=(16, 32, 64)
    ).encode(texts)
    cos = np.sum(piped * single, axis=1)
    assert cos.shape == (23,)
    assert float(cos.min()) > 0.999


def test_train_step_reduces_loss():
    cfg = EncoderConfig.tiny()
    tcfg = TrainConfig(batch_size=8, seq_len=16, learning_rate=3e-3)
    state = init_train_state(cfg, tcfg)
    step = make_train_step(cfg, tcfg)
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    texts_q = [f"query about topic {i}" for i in range(8)]
    texts_p = [f"theorem statement on topic {i}" for i in range(8)]
    qe = tok(texts_q, pad_to=16)
    pe = tok(texts_p, pad_to=16)
    args = tuple(jnp.asarray(x) for x in (qe.input_ids, qe.attention_mask, pe.input_ids, pe.attention_mask))
    losses = []
    for _ in range(5):
        state, loss = step(state, *args)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_train_step_sharded_mesh():
    mesh = make_mesh(MeshConfig(data=2, shard=4))
    cfg = EncoderConfig.tiny()
    tcfg = TrainConfig(batch_size=8, seq_len=16)
    state = init_sharded_train_state(cfg, tcfg, mesh)
    step = make_train_step(cfg, tcfg, mesh=mesh)
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    qe = tok([f"q {i}" for i in range(8)], pad_to=16)
    pe = tok([f"p {i}" for i in range(8)], pad_to=16)
    args = tuple(jnp.asarray(x) for x in (qe.input_ids, qe.attention_mask, pe.input_ids, pe.attention_mask))
    state, loss = step(state, *args)
    assert np.isfinite(float(loss))
    # params stay sharded over the tp axis
    wq = state.params["layers"][0]["wq"]
    assert len(wq.sharding.device_set) == 8


def test_sharded_forward_matches_unsharded():
    mesh = make_mesh(MeshConfig(data=2, shard=4))
    cfg = EncoderConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(0))
    from theoremsearch_tpu.encoder.model import shard_params

    sharded = shard_params(params, mesh)
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    e = tok(["sharding equivalence check"], pad_to=16)
    ids, mask = jnp.asarray(e.input_ids), jnp.asarray(e.attention_mask)
    a = np.asarray(encode_pooled(params, ids, mask, cfg))
    b = np.asarray(encode_pooled(sharded, ids, mask, cfg))
    np.testing.assert_allclose(a, b, atol=2e-2)
    assert float(a[0] @ b[0]) > 0.999


def test_encode_long_chunk_and_pool(enc):
    be = BatchedEncoder(enc.params, enc.cfg, batch_size=4, buckets=(16, 32))
    short = "a theorem about primes"
    long = " ".join(f"word{i}" for i in range(400))  # far beyond the 32-token bucket
    out = be.encode_long([short, long])
    assert out.shape == (2, enc.cfg.embedding_dim)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-4)
    # short text matches plain encode exactly
    plain = be.encode([short])
    assert float(out[0] @ plain[0]) > 0.999
    # pooling a doc made of one repeated phrase stays close to the phrase's
    # embedding (word-proportional splitting need not align with the
    # repetition boundary, so require similarity, not equality)
    chunk = " ".join(f"tok{i}" for i in range(10))
    rep = be.encode_long([" ".join([chunk] * 8)], chunk_tokens=20)
    single = be.encode([chunk])
    assert float(rep[0] @ single[0]) > 0.9


def test_encode_long_token_dense_words_never_overflow(enc):
    """Chunks are accumulated by ACTUAL token counts — token-dense 'words'
    (math formulas tokenize to many tokens each) must not produce chunks
    beyond the bucket, which _prep_batch would silently truncate."""
    be = BatchedEncoder(enc.params, enc.cfg, batch_size=4, buckets=(16, 32))
    # every 'word' is ~8 tokens (symbols split by the hash tokenizer)
    word = r"\frac{a+b}{c-d}"
    per_word = len(be.tokenizer.tokenize(word))
    assert per_word >= 4
    doc = " ".join([word] * 40)
    chunk_tokens = 20
    # reproduce the splitter's chunks and verify none overflows
    pieces = []
    cur, cur_t = [], 0
    for w in doc.split():
        wt = len(be.tokenizer.tokenize(w))
        if cur and cur_t + wt > chunk_tokens:
            pieces.append(" ".join(cur))
            cur, cur_t = [], 0
        cur.append(w)
        cur_t += wt
    if cur:
        pieces.append(" ".join(cur))
    assert all(
        len(be.tokenizer.tokenize(p)) <= chunk_tokens for p in pieces
    )
    out = be.encode_long([doc], chunk_tokens=chunk_tokens)
    assert out.shape == (1, enc.cfg.embedding_dim)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-4)
    # a doc of one repeated dense word pools to that word's embedding
    single = be.encode([word])
    assert float(out[0] @ single[0]) > 0.9


def test_batched_encoder_nonpow2_data_axis(enc):
    """P('data', None) inputs need batch % data_axis == 0: a 5-device data
    mesh must still encode (pow2 buckets alone would pad 3 -> 8, which 5
    does not divide ... 8 % 5 != 0 -> _prep_batch rounds up to 10)."""
    import numpy as _np
    from jax.sharding import Mesh

    devs = jax.devices()[:5]
    mesh = Mesh(_np.array(devs), ("data",))
    be = BatchedEncoder(
        enc.params, enc.cfg, mesh=mesh, batch_size=16, buckets=(16, 32)
    )
    out = be.encode(["alpha beta", "gamma", "delta epsilon zeta"])
    assert out.shape == (3, enc.cfg.embedding_dim)
    ref = BatchedEncoder(enc.params, enc.cfg, batch_size=16, buckets=(16, 32)).encode(
        ["alpha beta", "gamma", "delta epsilon zeta"]
    )
    _np.testing.assert_allclose(out, ref, atol=2e-2)


def test_fused_attention_matches_reference():
    """The fused Pallas attention block (interpret mode on CPU) must match
    the XLA reference composition through the full forward, including
    padding and packed multi-item blocks (BB = 128 // S items share one
    logits tile, masked block-diagonally)."""
    from theoremsearch_tpu.encoder.model import encode_pooled as ep

    cfg = EncoderConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=128,
        max_seq_len=64, embedding_dim=256,
    )
    params = init_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    B, S = 8, 32  # packing factor 4: 2 packed blocks of 4 items
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (B, S)), jnp.int32)
    lengths = rng.integers(4, S, B)
    mask = jnp.asarray(
        (np.arange(S)[None, :] < lengths[:, None]).astype(np.int32)
    )
    ref = np.asarray(ep(params, ids, mask, cfg, fused="off"))
    fus = np.asarray(ep(params, ids, mask, cfg, fused="interpret"))
    cos = np.sum(ref * fus, axis=1)
    assert (cos > 0.999).all(), cos
    np.testing.assert_allclose(ref, fus, atol=3e-2)


def test_fused_attention_grad_matches_reference():
    """custom_vjp backward (XLA recompute) must match the reference grad."""
    from theoremsearch_tpu.encoder.model import encode_pooled as ep

    cfg = EncoderConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=1, num_heads=2, num_kv_heads=1, head_dim=128,
        max_seq_len=32, embedding_dim=128,
    )
    params = init_params(cfg, jax.random.PRNGKey(2))
    rng = np.random.default_rng(1)
    B, S = 4, 32
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (B, S)), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)

    def loss(p, fused):
        return jnp.sum(ep(p, ids, mask, cfg, fused=fused) ** 2)

    g_ref = jax.grad(lambda p: loss(p, "off"))(params)
    g_fus = jax.grad(lambda p: loss(p, "interpret"))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fus)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=5e-2, rtol=5e-2,
        )


def test_int8_forward_parity():
    """The w8a8 path (quantize_params_int8 + qlayers forward) must track
    the bf16 forward closely — the production gate for the opt-in
    quantized serving mode (experiments/exp_enc_int8.py measured cos
    0.997+ at the 0.6B config on chip; the tiny config is looser-dim
    but the same math). Covers both the XLA attention and the fused
    interpret path (int8 projections feeding the Pallas core)."""
    from theoremsearch_tpu.encoder.model import (
        encode_pooled as ep,
        quantize_params_int8,
    )

    cfg = EncoderConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=128,
        max_seq_len=64, embedding_dim=256,
    )
    params = init_params(cfg, jax.random.PRNGKey(3))
    qlayers = quantize_params_int8(params)
    # int8 codes + per-column scales, for all seven matrices per layer
    assert len(qlayers) == cfg.num_layers
    assert qlayers[0]["w_gate"]["q"].dtype == jnp.int8
    assert qlayers[0]["w_gate"]["s"].shape == (cfg.intermediate_size,)

    rng = np.random.default_rng(2)
    B, S = 8, 32
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (B, S)), jnp.int32)
    lengths = rng.integers(4, S, B)
    mask = jnp.asarray((np.arange(S)[None, :] < lengths[:, None]).astype(np.int32))

    ref = np.asarray(ep(params, ids, mask, cfg, fused="off"))
    for fused in ("off", "interpret"):
        q8 = np.asarray(ep(params, ids, mask, cfg, fused=fused, qlayers=qlayers))
        cos = np.sum(ref * q8, axis=1)
        assert (cos > 0.98).all(), (fused, cos)
        # normalized outputs
        np.testing.assert_allclose(np.linalg.norm(q8, axis=1), 1.0, atol=1e-4)


def test_fused_layer_vmem_gate():
    """Alignment-qualifying but oversized towers must NOT select the
    whole-layer kernels: their VMEM-resident weight scratch would fail
    the Mosaic compile (kernels/layer_int8.py:_WEIGHT_VMEM_BUDGET), so
    the gate has to route them to the int8 op-chain instead."""
    from theoremsearch_tpu.encoder import model as M
    from theoremsearch_tpu.kernels.layer_int8 import fused_layer_shapes_ok

    # the serving towers qualify with margin
    assert fused_layer_shapes_ok(1024, 3072, 2048, 1024)  # qwen 0.6B
    assert fused_layer_shapes_ok(768, 1152, 768, 256)     # gemma 300m
    # Qwen3-4B-class: every dim 128-aligned, but 3*d*i = 75 MB of MLP
    # weight scratch — over budget, must be rejected
    assert not fused_layer_shapes_ok(2560, 9728, 2560, 1024)
    # misaligned dims rejected regardless of size
    assert not fused_layer_shapes_ok(1000, 3072, 2048, 1024)
    # wired through the family gate: a 4B-class config at a shape where
    # the attention-core gate (_fused_ok) itself passes
    cfg4b = EncoderConfig(
        vocab_size=512, hidden_size=2560, intermediate_size=9728,
        num_layers=1, num_heads=20, num_kv_heads=4, head_dim=128,
        max_seq_len=64, embedding_dim=256,
    )
    assert M._fused_ok(cfg4b, 16, 8)
    assert not M._fused_layer_ok(cfg4b, 16, 8)


def test_fused_layer_kernels_parity():
    """Whole-layer fused int8 kernels (kernels/layer_int8.py) must match
    the op-chain int8 path: per-block (MLP / attention, interpret mode)
    and end-to-end through encode_pooled(fused_layers=True). On chip
    these kernels measured 1.22x (MLP) / 1.63x (attention) over the XLA
    chain at (512, 16) — experiments/exp_enc_fusedlayer.py."""
    from theoremsearch_tpu.encoder import model as M
    from theoremsearch_tpu.kernels.layer_int8 import (
        fused_attn_int8_layer,
        fused_mlp_int8_layer,
    )

    cfg = EncoderConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=128,
        max_seq_len=64, embedding_dim=256,
    )
    params = init_params(cfg, jax.random.PRNGKey(3))
    ql = M.quantize_params_int8(params)
    layer, lq = params["layers"][0], ql[0]
    rng = np.random.default_rng(5)
    B, S = 8, 32
    x = jnp.asarray(rng.standard_normal((B, S, cfg.hidden_size)), jnp.bfloat16)
    lengths = rng.integers(4, S, B)
    mask = jnp.asarray((np.arange(S)[None, :] < lengths[:, None]).astype(np.int32))
    positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
    rope_cs = M._rope_tables(positions, cfg.head_dim, cfg.rope_theta)

    def cos_flat(a, b):
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        return float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)))

    # MLP block: x + SwiGLU_int8(norm(x)) in one kernel; padded-T path
    # exercised too (B*S = 256 pads to the 128-row tile exactly; a
    # non-multiple T goes through the zero-pad branch)
    ref = x + M._mlp_int8(layer, lq, x, cfg.rms_norm_eps)
    out = fused_mlp_int8_layer(
        x, layer["mlp_norm"], lq["w_gate"], lq["w_up"], lq["w_down"],
        eps=cfg.rms_norm_eps, interpret=True,
    )
    assert out.shape == x.shape and out.dtype == jnp.bfloat16
    assert cos_flat(ref, out) > 0.9999
    x_odd = x[:3].reshape(-1, cfg.hidden_size)[:70]  # T=70: pad branch
    ref_odd = x_odd + M._mlp_int8(layer, lq, x_odd, cfg.rms_norm_eps)
    out_odd = fused_mlp_int8_layer(
        x_odd, layer["mlp_norm"], lq["w_gate"], lq["w_up"], lq["w_down"],
        eps=cfg.rms_norm_eps, interpret=True,
    )
    assert out_odd.shape == x_odd.shape
    assert cos_flat(ref_odd, out_odd) > 0.9999

    # attention block: x + o_proj(attn(qkv_proj(norm(x)))) in one kernel,
    # vs the chain driving the standalone fused core
    ref_a = x + M._attention_int8(layer, lq, x, mask, rope_cs, cfg, True, True)
    out_a = fused_attn_int8_layer(x, layer, lq, mask, rope_cs, cfg, interpret=True)
    assert cos_flat(ref_a, out_a) > 0.9999

    # end to end: fused_layers pooled output tracks the int8 chain
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (B, S)), jnp.int32)
    a = np.asarray(
        M.encode_pooled(params, ids, mask, cfg, fused="interpret", qlayers=ql)
    )
    b = np.asarray(
        M.encode_pooled(
            params, ids, mask, cfg, fused="interpret", qlayers=ql,
            fused_layers=True,
        )
    )
    assert (np.sum(a * b, axis=1) > 0.999).all()
    # non-qualifying shapes fall back to the chain instead of failing
    # (hidden 256 ok but S=13 -> bb=9 with B=8 not divisible)
    ids13, mask13 = ids[:, :13], mask[:, :13]
    c = M.encode_pooled(
        params, ids13, mask13, cfg, fused="interpret", qlayers=ql,
        fused_layers=True,
    )
    assert np.isfinite(np.asarray(c)).all()


def test_batched_encoder_int8_mode(enc):
    """BatchedEncoder(quant='int8'): end-to-end encode agrees with the
    bf16 encoder, ordering preserved; unsupported configs are rejected
    loudly rather than silently served in bf16."""
    be16 = BatchedEncoder(enc.params, enc.cfg, batch_size=4)
    be8 = BatchedEncoder(enc.params, enc.cfg, batch_size=4, quant="int8")
    texts = [f"theorem about objects of kind {i}" for i in range(9)]
    a, b = be16.encode(texts), be8.encode(texts)
    cos = np.sum(a * b, axis=1)
    assert (cos > 0.98).all(), cos

    with pytest.raises(ValueError, match="quant"):
        BatchedEncoder(enc.params, enc.cfg, quant="int4")
    from theoremsearch_tpu.core.config import BertEncoderConfig
    from theoremsearch_tpu.encoder.bert import init_params as bert_init

    bcfg = BertEncoderConfig.tiny()
    bparams = bert_init(bcfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="family"):
        BatchedEncoder(bparams, bcfg, quant="int8")
    # tp meshes are rejected (no int8 sharding rules)...
    mesh_tp = make_mesh(MeshConfig(data=1, shard=2))
    with pytest.raises(ValueError, match="dp-only"):
        BatchedEncoder(enc.params, enc.cfg, mesh=mesh_tp, quant="int8")
    # ...but a pure-dp mesh replicates the int8 weights and works
    mesh_dp = make_mesh(MeshConfig(data=2, shard=1))
    be_dp = BatchedEncoder(
        enc.params, enc.cfg, mesh=mesh_dp, batch_size=4, quant="int8"
    )
    c = be_dp.encode(texts)
    cos_dp = np.sum(b * c, axis=1)
    assert (cos_dp > 0.999).all(), cos_dp


def test_gemma_int8_forward_parity():
    """The gemma tower shares the w8a8 scheme (quantize_params_int8 +
    qlayers forward): int8 pooled output must track bf16, through both
    the XLA bidirectional attention and the fused interpret core."""
    from theoremsearch_tpu.core.config import GemmaEncoderConfig
    from theoremsearch_tpu.encoder.gemma import (
        encode_pooled as gep,
        init_params as gemma_init,
        quantize_params_int8 as gquant,
    )

    cfg = GemmaEncoderConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=2, num_kv_heads=1, head_dim=128,
        max_seq_len=64, embedding_dim=128, head_hidden=128,
        sliding_window=512, global_every=2,
    )
    params = gemma_init(cfg, jax.random.PRNGKey(5))
    qlayers = gquant(params)
    rng = np.random.default_rng(4)
    B, S = 4, 32
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (B, S)), jnp.int32)
    lengths = rng.integers(4, S, B)
    mask = jnp.asarray((np.arange(S)[None, :] < lengths[:, None]).astype(np.int32))

    ref = np.asarray(gep(params, ids, mask, cfg, fused="off"))
    for fused in ("off", "interpret"):
        q8 = np.asarray(gep(params, ids, mask, cfg, fused=fused, qlayers=qlayers))
        cos = np.sum(ref * q8, axis=1)
        assert (cos > 0.98).all(), (fused, cos)


def test_gemma_fused_layer_kernels_parity():
    """Gemma-form whole-layer int8 kernels (kernels/layer_int8.py:
    (1+w) pre/post sandwich norms, GeGLU, bidirectional core) must
    match the gemma op-chain int8 path per-block and end-to-end."""
    from theoremsearch_tpu.core.config import GemmaEncoderConfig
    from theoremsearch_tpu.encoder import gemma as G
    from theoremsearch_tpu.kernels.layer_int8 import (
        fused_attn_int8_layer_gemma,
        fused_mlp_int8_layer,
    )

    cfg = GemmaEncoderConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=2, num_kv_heads=1, head_dim=128,
        max_seq_len=64, embedding_dim=128, head_hidden=128,
        sliding_window=512, global_every=2,
    )
    params = G.init_params(cfg, jax.random.PRNGKey(7))
    ql = G.quantize_params_int8(params)
    layer, lq = params["layers"][0], ql[0]
    rng = np.random.default_rng(11)
    B, S = 4, 32
    x = jnp.asarray(rng.standard_normal((B, S, cfg.hidden_size)), jnp.bfloat16)
    lengths = rng.integers(4, S, B)
    mask = jnp.asarray((np.arange(S)[None, :] < lengths[:, None]).astype(np.int32))
    positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
    rope_cs = G._rope_tables(positions, cfg.head_dim, cfg.rope_theta)
    one = jnp.float32(1.0)

    def cos_flat(a, b):
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        return float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)))

    # MLP block: x + post_norm(GeGLU_int8(pre_norm(x))) in one kernel
    ref = x + G._gemma_rms_norm(
        G._mlp_int8(layer, lq, x, cfg.rms_norm_eps),
        layer["post_mlp_norm"], cfg.rms_norm_eps,
    )
    out = fused_mlp_int8_layer(
        x, one + layer["pre_mlp_norm"],
        lq["w_gate"], lq["w_up"], lq["w_down"],
        post_w=one + layer["post_mlp_norm"],
        eps=float(cfg.rms_norm_eps), act="gelu_tanh", interpret=True,
    )
    assert out.shape == x.shape and out.dtype == jnp.bfloat16
    assert cos_flat(ref, out) > 0.9999

    # attention block: sandwich norms + bidirectional core in one kernel,
    # vs the op-chain driving the standalone fused core
    ref_a = x + G._gemma_rms_norm(
        G._attention_int8(
            layer, lq, x, mask, None, rope_cs, cfg,
            use_fused=True, interpret=True,
        ),
        layer["post_attn_norm"], cfg.rms_norm_eps,
    )
    out_a = fused_attn_int8_layer_gemma(
        x, layer, lq, mask, rope_cs, cfg, interpret=True
    )
    assert cos_flat(ref_a, out_a) > 0.9999

    # end to end: fused_layers pooled output tracks the int8 chain
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (B, S)), jnp.int32)
    a = np.asarray(
        G.encode_pooled(params, ids, mask, cfg, fused="interpret", qlayers=ql)
    )
    b = np.asarray(
        G.encode_pooled(
            params, ids, mask, cfg, fused="interpret", qlayers=ql,
            fused_layers=True,
        )
    )
    assert (np.sum(a * b, axis=1) > 0.999).all()


def test_lora_train_step_reduces_loss_and_freezes_base():
    """LoRA mode: at init the merged encoder IS the base (B = 0); the
    adapter step reduces loss while the base params never change; the
    merged export differs from the base after training."""
    from theoremsearch_tpu.train import (
        init_lora_train_state,
        init_train_state,
        lora_merge,
        lora_num_params,
        make_lora_train_step,
    )

    cfg = EncoderConfig.tiny()
    tcfg = TrainConfig(
        batch_size=8, seq_len=16, learning_rate=3e-3,
        lora_rank=4, lora_alpha=8.0,
    )
    base = init_train_state(cfg, tcfg).params
    state = init_lora_train_state(base, tcfg)
    # tiny trainable footprint: per layer wq (128->128) and wv (128->64)
    # at rank 4: (128*4 + 4*128) + (128*4 + 4*64) = 1792
    assert lora_num_params(state.params) == cfg.num_layers * 1792

    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    qe = tok([f"query about topic {i}" for i in range(8)], pad_to=16)
    pe = tok([f"theorem statement on topic {i}" for i in range(8)], pad_to=16)
    batch = tuple(jnp.asarray(x) for x in (
        qe.input_ids, qe.attention_mask, pe.input_ids, pe.attention_mask
    ))

    # zero-effect at init: merged forward == base forward bit-for-bit
    merged0 = lora_merge(base, state.params, tcfg.lora_alpha)
    e_base = np.asarray(encode_pooled(base, batch[0], batch[1], cfg))
    e_m0 = np.asarray(encode_pooled(merged0, batch[0], batch[1], cfg))
    np.testing.assert_array_equal(e_base, e_m0)

    step = make_lora_train_step(cfg, tcfg)
    base_snapshot = jax.tree.map(lambda a: np.asarray(a).copy(), base)
    losses = []
    for _ in range(5):
        state, loss = step(state, base, *batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
    # the base never moved
    for a, b in zip(jax.tree.leaves(base), jax.tree.leaves(base_snapshot)):
        np.testing.assert_array_equal(np.asarray(a), b)
    # the merged export did
    merged1 = lora_merge(base, state.params, tcfg.lora_alpha)
    e_m1 = np.asarray(encode_pooled(merged1, batch[0], batch[1], cfg))
    assert not np.allclose(e_m0, e_m1)


def test_lora_checkpoint_roundtrip(tmp_path):
    """Adapter checkpoints restore with the LoRA template."""
    from theoremsearch_tpu.train import init_lora_train_state, init_train_state
    from theoremsearch_tpu.train.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    cfg = EncoderConfig.tiny()
    tcfg = TrainConfig(lora_rank=4)
    base = init_train_state(cfg, tcfg).params
    state = init_lora_train_state(base, tcfg)
    save_checkpoint(state, tmp_path)
    template = init_lora_train_state(base, tcfg)
    restored = restore_checkpoint(tmp_path, cfg, tcfg, template=template)
    assert restored is not None
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_lora_rejects_bad_targets():
    from theoremsearch_tpu.train import init_train_state, lora_init

    cfg = EncoderConfig.tiny()
    base = init_train_state(cfg, TrainConfig()).params
    with pytest.raises(ValueError, match="target"):
        lora_init(base, jax.random.PRNGKey(0), 4, targets=("nope",))
    with pytest.raises(ValueError, match="rank"):
        lora_init(base, jax.random.PRNGKey(0), 0)


def test_fused_attention_bwd_kernel_direct():
    """The fused Pallas backward (round 4) vs jax.vjp of the XLA
    reference composition, at the kernel level: dq/dk/dv and the
    QK-norm weight grads, with GQA (H=4, Hk=2), RAGGED padding masks,
    and a batch that packs BB=4 items per grid block."""
    import jax

    from theoremsearch_tpu.encoder.model import _make_attn_core
    from theoremsearch_tpu.kernels.attention import (
        fused_qknorm_rope_attention_bwd,
    )

    H, HK, DH, S, B = 4, 2, 128, 32, 8
    eps = 1e-6
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, S, H * DH)) * 0.5, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, HK * DH)) * 0.5, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, HK * DH)) * 0.5, jnp.bfloat16)
    qw = jnp.asarray(rng.standard_normal(DH) * 0.1 + 1.0, jnp.float32)
    kw = jnp.asarray(rng.standard_normal(DH) * 0.1 + 1.0, jnp.float32)
    pos = np.broadcast_to(np.arange(S), (B, S))
    inv = 1.0 / (1e6 ** (np.arange(0, DH, 2) / DH))
    ang = pos[..., None] * inv[None, None, :]
    cos = jnp.asarray(np.cos(ang), jnp.float32)
    sin = jnp.asarray(np.sin(ang), jnp.float32)
    lens = rng.integers(S // 2, S + 1, B)
    mask = jnp.asarray(
        (np.arange(S)[None, :] < lens[:, None]).astype(np.int32)
    )
    # upstream grad zeroed at padded positions (what masked pooling sends)
    g = jnp.asarray(
        rng.standard_normal((B, S, H * DH)) * mask.astype(np.float32)[..., None],
        jnp.bfloat16,
    )

    core = _make_attn_core(H, HK, DH, eps, True)
    _, vjp = jax.vjp(core._ref, q, k, v, qw, kw, cos, sin, mask)
    dq_r, dk_r, dv_r, dqw_r, dkw_r, *_ = vjp(g)

    dq, dk, dv, dqw, dkw = fused_qknorm_rope_attention_bwd(
        q, k, v, qw, kw, cos, sin, mask, g,
        num_heads=H, num_kv_heads=HK, head_dim=DH, eps=eps,
        causal=True, interpret=True,
    )

    def close(a, b, tag, atol=0.05):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = max(np.abs(b).max(), 1e-6)
        assert np.abs(a - b).max() / denom < atol, (
            tag, np.abs(a - b).max(), denom
        )
        ca = a.ravel() @ b.ravel() / max(
            np.linalg.norm(a) * np.linalg.norm(b), 1e-12
        )
        assert ca > 0.999, (tag, ca)

    close(dq, dq_r, "dq")
    close(dk, dk_r, "dk")
    close(dv, dv_r, "dv")
    close(dqw, dqw_r, "dqw")
    close(dkw, dkw_r, "dkw")
    # padded positions receive zero gradient
    pad = ~np.asarray(mask, bool)
    assert np.abs(np.asarray(dq, np.float32)[pad]).max() < 1e-3
