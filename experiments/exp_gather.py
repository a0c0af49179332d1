"""Rescore-gather strategies: the bf16 candidate gather costs ~1.6 ms of
the 9.1 ms headline batch (40960 scattered 2KB rows, ~52 GB/s effective).

Measures jnp.take with (a) raw ids, (b) batch-sorted ids (DRAM locality),
(c) the full device_rescore, (d) device_rescore with ids pre-sorted per
query, (e) a fori_loop dynamic-slice gather.

Run: bash tools/tpu_run.sh experiments/exp_gather.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from theoremsearch_tpu.kernels.mips import device_rescore

N, D, B, C = 1_048_576, 1024, 1024, 40


def timed(fn, *args, iters=30, rounds=3):
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
    key = jax.random.PRNGKey(0)
    corpus = jax.random.normal(key, (N, D), jnp.bfloat16)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, N, (B, C)).astype(np.int32))
    ids_sorted = jnp.sort(ids, axis=1)
    q = jax.random.normal(key, (B, D), jnp.float32)

    @jax.jit
    def take(ids, corpus):
        return jnp.take(corpus, ids.reshape(-1), axis=0).sum(dtype=jnp.float32)

    dt = timed(take, ids, corpus)
    gb = B * C * D * 2 / 1e9
    print(f"take raw       : {dt*1e3:6.2f} ms  {gb/dt:6.1f} GB/s", flush=True)
    dt = timed(take, ids_sorted, corpus)
    print(f"take per-q sort: {dt*1e3:6.2f} ms  {gb/dt:6.1f} GB/s", flush=True)
    flat_sorted = jnp.sort(ids.reshape(-1)).reshape(B, C)
    dt = timed(take, flat_sorted, corpus)
    print(f"take flat sort : {dt*1e3:6.2f} ms  {gb/dt:6.1f} GB/s", flush=True)

    dt = timed(lambda qq, ii: device_rescore(qq, ii, corpus, N, k=10), q, ids)
    print(f"device_rescore : {dt*1e3:6.2f} ms", flush=True)

    # sort-before-gather variant inside one jit (re-ranked after)
    @jax.jit
    def rescore_sorted(qq, ii):
        order = jnp.argsort(ii, axis=1)
        ii_s = jnp.take_along_axis(ii, order, axis=1)
        return device_rescore(qq, ii_s, corpus, N, k=10)

    dt = timed(rescore_sorted, q, ids)
    print(f"rescore sorted : {dt*1e3:6.2f} ms", flush=True)

    # dynamic-slice gather under fori_loop (C slices of (B,) rows each)
    @jax.jit
    def loop_gather(qq, ii):
        def body(c, acc):
            rows = jnp.take(corpus, ii[:, c], axis=0)     # (B, D)
            s = jnp.sum(rows.astype(jnp.float32) * qq, axis=1)
            return acc.at[:, c].set(s)
        s = jax.lax.fori_loop(0, C, body, jnp.zeros((B, C), jnp.float32))
        return s

    dt = timed(loop_gather, q, ids)
    print(f"loop gather    : {dt*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
