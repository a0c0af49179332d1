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


def test_training_generalizes_to_gemma_and_bert():
    """The InfoNCE step trains all three encoder families (loss finite
    and decreasing over a few steps on a fixed tiny batch)."""
    import jax
    import numpy as np

    from theoremsearch_tpu.core.config import (
        BertEncoderConfig,
        GemmaEncoderConfig,
        TrainConfig,
    )
    from theoremsearch_tpu.train.contrastive import (
        init_train_state,
        make_train_step,
    )

    tcfg = TrainConfig(batch_size=8, seq_len=12, learning_rate=1e-3)
    rng = np.random.default_rng(0)
    for cfg in (GemmaEncoderConfig.tiny(), BertEncoderConfig.tiny()):
        q_ids = rng.integers(1, cfg.vocab_size, (8, 12)).astype(np.int32)
        p_ids = (q_ids + 1) % cfg.vocab_size
        mask = np.ones((8, 12), np.int32)
        state = init_train_state(cfg, tcfg)
        step = make_train_step(cfg, tcfg)
        losses = []
        for _ in range(4):
            state, loss = step(state, q_ids, mask, p_ids, mask)
            losses.append(float(loss))
        assert all(np.isfinite(losses)), losses
        assert losses[-1] < losses[0], (type(cfg).__name__, losses)


def test_train_cli_end_to_end(tmp_path, capsys):
    """`train` subcommand: pairs from the validation CSV, loss falls,
    checkpoint saves and resumes, --eval prints before/after metrics."""
    import sys
    from unittest import mock

    from theoremsearch_tpu.cli import main

    ck = str(tmp_path / "ck")
    argv = ["prog", "train", "--steps", "12", "--batch-size", "8",
            "--seq-len", "16", "--lr", "3e-4", "--eval",
            "--checkpoint-dir", ck, "--checkpoint-every", "6",
            "--log-every", "4"]
    with mock.patch.object(sys, "argv", argv):
        main()
    out = capsys.readouterr().out
    assert "[train] before:" in out and "[train] after:" in out
    assert "checkpoint saved" in out
    from theoremsearch_tpu.train.checkpoint import latest_step

    assert latest_step(ck) == 12
    # resume: runs only the remaining steps past the checkpoint
    argv2 = argv[:3] + ["16"] + argv[4:]
    with mock.patch.object(sys, "argv", argv2):
        main()
    out2 = capsys.readouterr().out
    assert "resumed at step 12" in out2
    assert latest_step(ck) == 16


def test_hard_negatives_push_queries_away():
    """Explicit negatives in info_nce_loss: training with a shared hard
    negative lowers query-negative similarity vs training without."""
    import jax
    import numpy as np

    from theoremsearch_tpu.core.config import EncoderConfig, TrainConfig
    from theoremsearch_tpu.encoder.model import encode_pooled
    from theoremsearch_tpu.train.contrastive import (
        init_train_state,
        make_train_step,
    )

    cfg = EncoderConfig.tiny()
    tcfg = TrainConfig(batch_size=8, seq_len=12, learning_rate=1e-3)
    rng = np.random.default_rng(0)
    q_ids = rng.integers(1, cfg.vocab_size, (8, 12)).astype(np.int32)
    p_ids = (q_ids + 1) % cfg.vocab_size
    n_ids = rng.integers(1, cfg.vocab_size, (4, 12)).astype(np.int32)
    mask = np.ones((8, 12), np.int32)
    n_mask = np.ones((4, 12), np.int32)

    def train(with_neg):
        state = init_train_state(cfg, tcfg)
        step = make_train_step(cfg, tcfg)
        for _ in range(6):
            if with_neg:
                state, loss = step(state, q_ids, mask, p_ids, mask, n_ids, n_mask)
            else:
                state, loss = step(state, q_ids, mask, p_ids, mask)
        assert np.isfinite(float(loss))
        q = np.asarray(encode_pooled(state.params, q_ids, mask, cfg))
        n = np.asarray(encode_pooled(state.params, n_ids, n_mask, cfg))
        return float((q @ n.T).mean())

    sim_without = train(False)
    sim_with = train(True)
    assert sim_with < sim_without, (sim_with, sim_without)
