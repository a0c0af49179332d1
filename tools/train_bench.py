"""On-chip contrastive training benchmark: the full-size (0.6B-class)
encoder's InfoNCE fine-tuning step on real TPU.

The CPU-mesh tests prove the dp+tp sharded step compiles and the loss
falls; this measures the real thing single-chip: step time, sustained
tokens/s and model FLOP/s, plus a short loss curve on synthetic
(query, slogan) token pairs.

Run: bash tools/tpu_run.sh tools/train_bench.py | tee /tmp/train_bench.log
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_T0 = time.time()


def _log(msg):
    print(f"# [{time.time()-_T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from theoremsearch_tpu.core.config import EncoderConfig, TrainConfig
    from theoremsearch_tpu.train.contrastive import init_train_state, make_train_step

    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu:
        enc_cfg = EncoderConfig(max_seq_len=64)
        B, S, STEPS = 64, 64, 20
    else:
        enc_cfg = EncoderConfig.tiny()
        B, S, STEPS = 16, 16, 6
    tcfg = TrainConfig(batch_size=B, seq_len=S, learning_rate=2e-5, temperature=0.05)

    _log(f"init train state ({enc_cfg.num_layers}L d={enc_cfg.hidden_size})")
    state = init_train_state(enc_cfg, tcfg)
    step = make_train_step(enc_cfg, tcfg)
    # round-4 A/B: the fused Pallas attention forward + fused Pallas
    # backward (recompute-in-VMEM) vs the XLA composition
    step_fused = make_train_step(enc_cfg, tcfg, fused="on") if on_tpu else None

    rng = np.random.default_rng(0)
    # hard synthetic task: every row is the SAME template sequence; pair
    # identity lives in a handful of tokens. Cross-pair similarity at
    # init is then ~diagonal similarity (loss ~ ln(B)) and falling
    # requires the model to upweight the identity tokens. (Pairs sharing
    # a prefix are trivially solved at random init — the shared prefix
    # dominates last-token pooling; measured loss 0.000 from step 0.)
    template = rng.integers(3, enc_cfg.vocab_size, S).astype(np.int32)
    ident = max(2, S // 16)
    q_ids = np.broadcast_to(template, (STEPS, B, S)).copy()
    p_ids = q_ids.copy()
    id_toks_q = rng.integers(3, enc_cfg.vocab_size, (STEPS, B, ident))
    id_toks_p = id_toks_q  # same identity tokens in query and positive
    q_ids[:, :, 1 : 1 + ident] = id_toks_q
    p_ids[:, :, 2 : 2 + ident] = id_toks_p  # different positions
    mask = np.ones((B, S), np.int32)

    _log("compiling + first step")
    state, loss = step(state, jnp.asarray(q_ids[0]), jnp.asarray(mask),
                       jnp.asarray(p_ids[0]), jnp.asarray(mask))
    first_loss = float(loss)
    _log(f"step 0 loss {first_loss:.4f}")

    losses = [first_loss]
    t0 = time.time()
    for i in range(1, STEPS):
        state, loss = step(state, jnp.asarray(q_ids[i]), jnp.asarray(mask),
                           jnp.asarray(p_ids[i]), jnp.asarray(mask))
        losses.append(float(loss))  # sync per step: honest step time
    dt = (time.time() - t0) / (STEPS - 1)

    n_params = 28 * 15.7e6 + enc_cfg.vocab_size * enc_cfg.hidden_size if on_tpu else 1e6
    tokens = 2 * B * S  # query + positive sides
    model_flops = 6 * n_params * tokens  # fwd+bwd approximation
    _log(f"XLA steady step: {dt*1e3:.1f} ms  {tokens/dt:,.0f} tokens/s  "
         f"{model_flops/dt/1e12:.1f} TF/s")

    out = {
        "metric": "train_step_0p6b" if on_tpu else "train_step_cpu_smoke",
        "batch_pairs": B, "seq_len": S,
        "step_ms": round(dt * 1e3, 1),
        "tokens_per_s": round(tokens / dt, 1),
        "model_tflops_per_s": round(model_flops / dt / 1e12, 1),
        "loss_first": round(losses[0], 4),
        "loss_last": round(losses[-1], 4),
        "loss_fell": losses[-1] < losses[0],
    }

    if step_fused is not None:
        # same data, fresh state: fused Pallas fwd + fused Pallas bwd
        _log("A/B: fused attention fwd + fused Pallas bwd")
        state_f = init_train_state(enc_cfg, tcfg)
        state_f, loss_f0 = step_fused(
            state_f, jnp.asarray(q_ids[0]), jnp.asarray(mask),
            jnp.asarray(p_ids[0]), jnp.asarray(mask),
        )
        losses_f = [float(loss_f0)]
        t0 = time.time()
        for i in range(1, STEPS):
            state_f, loss = step_fused(
                state_f, jnp.asarray(q_ids[i]), jnp.asarray(mask),
                jnp.asarray(p_ids[i]), jnp.asarray(mask),
            )
            losses_f.append(float(loss))
        dt_f = (time.time() - t0) / (STEPS - 1)
        _log(f"fused steady step: {dt_f*1e3:.1f} ms  "
             f"{model_flops/dt_f/1e12:.1f} TF/s  "
             f"(XLA {dt*1e3:.1f} ms -> {dt/dt_f:.2f}x)")
        # same-initial-state loss trajectories must track (both paths
        # start from init_train_state's identical PRNG-keyed params)
        drift = max(abs(a - b) for a, b in zip(losses, losses_f))
        _log(f"loss trajectory max |XLA - fused| = {drift:.4f} "
             f"(first {losses_f[0]:.4f}, last {losses_f[-1]:.4f})")
        out["fused"] = {
            "step_ms": round(dt_f * 1e3, 1),
            "model_tflops_per_s": round(model_flops / dt_f / 1e12, 1),
            "speedup_vs_xla": round(dt / dt_f, 3),
            "loss_first": round(losses_f[0], 4),
            "loss_last": round(losses_f[-1], 4),
            "loss_fell": losses_f[-1] < losses_f[0],
            "loss_traj_max_drift": round(drift, 4),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
