"""Training checkpoint/resume roundtrip."""

import jax.numpy as jnp
import numpy as np

from theoremsearch_tpu.core.config import EncoderConfig, TrainConfig
from theoremsearch_tpu.encoder.tokenizer import SimpleTokenizer
from theoremsearch_tpu.train import init_train_state, make_train_step
from theoremsearch_tpu.train.checkpoint import latest_step, restore_checkpoint, save_checkpoint


def test_checkpoint_roundtrip(tmp_path):
    cfg = EncoderConfig.tiny()
    tcfg = TrainConfig(batch_size=4, seq_len=8)
    state = init_train_state(cfg, tcfg)
    step = make_train_step(cfg, tcfg)
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    q = tok([f"q{i}" for i in range(4)], pad_to=8)
    p = tok([f"p{i}" for i in range(4)], pad_to=8)
    args = tuple(jnp.asarray(x) for x in (q.input_ids, q.attention_mask, p.input_ids, p.attention_mask))
    state, _ = step(state, *args)
    state, loss1 = step(state, *args)

    ckpt_dir = tmp_path / "ckpt"
    save_checkpoint(state, ckpt_dir)
    assert latest_step(ckpt_dir) == 2

    restored = restore_checkpoint(ckpt_dir, cfg, tcfg)
    assert int(restored.step) == 2
    np.testing.assert_array_equal(
        np.asarray(restored.params["layers"][0]["wq"], np.float32),
        np.asarray(state.params["layers"][0]["wq"], np.float32),
    )
    # resumed training continues identically
    s1, l1 = step(state, *args)
    s2, l2 = step(restored, *args)
    assert float(l1) == float(l2)


def test_restore_missing_returns_none(tmp_path):
    cfg = EncoderConfig.tiny()
    tcfg = TrainConfig()
    assert restore_checkpoint(tmp_path / "nope", cfg, tcfg) is None
    assert latest_step(tmp_path / "nope") is None
