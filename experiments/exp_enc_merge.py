"""Encoder follow-ups: S=16 forward (measured, replacing the README
estimate) and merged QKV / gate-up projections.

Merging wq|wk|wv -> (H, 4096) and w_gate|w_up -> (H, 6144) halves the
number of projection matmuls per layer and reads the activations once
instead of twice/thrice — the classic inference-serving weight layout.

Measured 2026-08-17 on one v5e (B=512):
  fused forward  S=16:  67.75 ms  106.3 TF/s  7,557 q/s
  fused forward  S=32: 129.66 ms  111.1 TF/s  3,949 q/s
  merged forward S=16:  71.78 ms  100.3 TF/s  (parity cos 0.99984)
  merged forward S=32: 141.35 ms  101.9 TF/s  (parity cos 0.99985)

VERDICT: merging is a DEAD END on v5e — ~9% slower at both widths.
XLA already keeps the shared activation read across the three
projections, and the 4096/6144-wide merged outputs tile worse than the
separate 2048/1024/3072 matmuls. The unmerged layout stays.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from theoremsearch_tpu.core.config import EncoderConfig
from theoremsearch_tpu.encoder.model import (
    _make_attn_core, _mlp, _rms_norm, _rope_tables, encode_pooled, init_params,
)


def timed(fn, *args, iters=10, rounds=3):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    best = 1e9
    for _ in range(rounds):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = min(best, (time.time() - t0) / iters)
    return best


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = EncoderConfig(max_seq_len=64)
    params = jax.device_put(init_params(cfg, jax.random.PRNGKey(0)))
    rng = np.random.default_rng(0)

    full = jax.jit(functools.partial(encode_pooled, cfg=cfg, fused="on"))
    for S in (16, 32):
        B = 512
        ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (B, S)), jnp.int32)
        mask = jnp.ones((B, S), jnp.int32)
        dt = timed(full, params, ids, mask)
        flops = 2 * 28 * 15.7e6 * B * S
        print(f"fused forward (B={B}, S={S:3d}): {dt*1e3:7.2f} ms  "
              f"{flops/dt/1e12:5.1f} TF/s  {B/dt:,.0f} q/s", flush=True)

    # merged-projection variant (weights merged once, off the clock)
    merged = []
    for layer in params["layers"]:
        merged.append({
            "attn_norm": layer["attn_norm"],
            "mlp_norm": layer["mlp_norm"],
            "q_norm": layer["q_norm"],
            "k_norm": layer["k_norm"],
            "wqkv": jnp.concatenate([layer["wq"], layer["wk"], layer["wv"]], axis=1),
            "wo": layer["wo"],
            "wgu": jnp.concatenate([layer["w_gate"], layer["w_up"]], axis=1),
            "w_down": layer["w_down"],
        })
    mp = {"embed": params["embed"], "final_norm": params["final_norm"], "layers": merged}
    qkv_dim = cfg.head_dim * cfg.num_heads
    kv_dim = cfg.head_dim * cfg.num_kv_heads
    inter = cfg.intermediate_size

    def forward_merged(p, input_ids, attention_mask):
        x = p["embed"][input_ids].astype(jnp.bfloat16)
        positions = jnp.maximum(
            jnp.cumsum(attention_mask.astype(jnp.int32), axis=1) - 1, 0)
        cos, sin = _rope_tables(positions, cfg.head_dim, cfg.rope_theta)
        core = _make_attn_core(
            cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.rms_norm_eps, False)
        m32 = attention_mask.astype(jnp.int32)
        for layer in p["layers"]:
            xa = _rms_norm(x, layer["attn_norm"], cfg.rms_norm_eps)
            qkv = xa @ layer["wqkv"]
            attn = core(
                qkv[..., :qkv_dim], qkv[..., qkv_dim:qkv_dim + kv_dim],
                qkv[..., qkv_dim + kv_dim:], layer["q_norm"], layer["k_norm"],
                cos, sin, m32,
            )
            x = x + attn.astype(x.dtype) @ layer["wo"]
            xm = _rms_norm(x, layer["mlp_norm"], cfg.rms_norm_eps)
            gu = xm @ layer["wgu"]
            gate = jax.nn.silu(gu[..., :inter].astype(jnp.float32)).astype(x.dtype)
            x = x + (gate * gu[..., inter:]) @ layer["w_down"]
        x = _rms_norm(x, p["final_norm"], cfg.rms_norm_eps)
        lengths = jnp.sum(attention_mask.astype(jnp.int32), axis=1)
        pooled = jnp.take_along_axis(
            x, jnp.maximum(lengths - 1, 0)[:, None, None], axis=1)[:, 0, :]
        pooled = pooled.astype(jnp.float32)
        return pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)

    fm = jax.jit(forward_merged)
    for S in (16, 32):
        B = 512
        ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (B, S)), jnp.int32)
        mask = jnp.ones((B, S), jnp.int32)
        # parity vs the unmerged fused forward
        a = np.asarray(full(params, ids, mask))
        b = np.asarray(fm(mp, ids, mask))
        cos_sim = float(np.mean(np.sum(a * b, axis=1)))
        dt = timed(fm, mp, ids, mask)
        flops = 2 * 28 * 15.7e6 * B * S
        print(f"merged forward (B={B}, S={S:3d}): {dt*1e3:7.2f} ms  "
              f"{flops/dt/1e12:5.1f} TF/s  {B/dt:,.0f} q/s  parity_cos={cos_sim:.5f}",
              flush=True)


if __name__ == "__main__":
    main()
