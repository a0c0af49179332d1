"""Encoder forward profiling: where do the 331 ms/batch go?

Full 0.6B-class config at (B=512, S=32) measured 43 TFLOP/s (~22% MXU).
Variants isolate: attention block, softmax+mask, RoPE, norms, embed
gather, and a pure-matmul FLOP-equivalent ceiling.

Run: bash tools/tpu_run.sh experiments/exp_enc.py > /tmp/enc.log 2>&1
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from theoremsearch_tpu.core.config import EncoderConfig
from theoremsearch_tpu.encoder.model import (
    _attention, _mlp, _rms_norm, _rope_tables, encode_pooled, init_params,
)

B, S = 512, 32


def timed(fn, *args, iters=10, rounds=3):
    """np.asarray sync (NOT block_until_ready — measured as a no-op for
    remote arrays on this tunnel: 14 TFLOP forwards 'finished' in 0.16ms)."""
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
    params = init_params(cfg, jax.random.PRNGKey(0))
    params = jax.device_put(params)
    ids = np.random.default_rng(0).integers(3, cfg.vocab_size, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    ids_d, mask_d = jnp.asarray(ids), jnp.asarray(mask)

    flops = 2 * 28 * 15.7e6 * B * S  # ~matmul flops per forward

    full = jax.jit(functools.partial(encode_pooled, cfg=cfg))
    dt = timed(full, params, ids_d, mask_d)
    print(f"full encode      : {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TF/s  "
          f"{B/dt:,.0f} q/s", flush=True)

    # no attention (mlp + qkv/o matmuls replaced by one equivalent matmul)
    @jax.jit
    def mlp_only(params, ids, mask):
        x = params["embed"][ids].astype(jnp.bfloat16)
        for layer in params["layers"]:
            xa = _rms_norm(x, layer["attn_norm"], cfg.rms_norm_eps)
            q = xa @ layer["wq"]
            o = q[..., :1024] @ layer["wo"][:1024]
            x = x + o
            x = x + _mlp(layer, _rms_norm(x, layer["mlp_norm"], cfg.rms_norm_eps))
        return x[:, 0]

    dt = timed(mlp_only, params, ids_d, mask_d)
    print(f"no-attention     : {dt*1e3:7.2f} ms", flush=True)

    # attention-only stack
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))

    @jax.jit
    def attn_only(params, ids, mask):
        x = params["embed"][ids].astype(jnp.bfloat16)
        m = mask.astype(bool)
        rope_cs = _rope_tables(positions, cfg.head_dim, cfg.rope_theta)
        for layer in params["layers"]:
            x = x + _attention(layer, _rms_norm(x, layer["attn_norm"], cfg.rms_norm_eps), m, rope_cs, cfg)
        return x[:, 0]

    dt = timed(attn_only, params, ids_d, mask_d)
    print(f"attention-only   : {dt*1e3:7.2f} ms", flush=True)

    # embed gather only
    @jax.jit
    def embed_only(params, ids):
        return params["embed"][ids].astype(jnp.bfloat16).sum(1)

    dt = timed(embed_only, params, ids_d)
    print(f"embed gather     : {dt*1e3:7.2f} ms", flush=True)

    # pure-matmul ceiling: same weight matrices, flat (B*S, D) input
    x0 = jnp.ones((B * S, 1024), jnp.bfloat16)

    @jax.jit
    def matmul_ceiling(params, x):
        for layer in params["layers"]:
            a = x @ layer["wq"]                      # 1024 -> 2048
            b2 = x @ layer["wk"]                     # 1024 -> 1024
            c = x @ layer["wv"]
            x = x + (a @ layer["wo"])                # 2048 -> 1024
            g = x @ layer["w_gate"]
            u = x @ layer["w_up"]
            x = x + (jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u) @ layer["w_down"]
            x = x + b2 + c
        return x

    dt = timed(matmul_ceiling, params, x0)
    print(f"matmul ceiling   : {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TF/s", flush=True)

    # larger batch scaling
    for b2 in (1024, 2048):
        ids2 = jnp.asarray(np.tile(ids, (b2 // B, 1)))
        mask2 = jnp.asarray(np.tile(mask, (b2 // B, 1)))
        dt = timed(full, params, ids2, mask2)
        print(f"full B={b2:5d}    : {dt*1e3:7.2f} ms  {b2/dt:,.0f} q/s", flush=True)


if __name__ == "__main__":
    main()
