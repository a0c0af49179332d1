"""Split the headline scan's ~1.4 ms non-matmul overhead (B=1024, 1M).

exp_headline_bisect2 (2026-08-19): scan 8.09 ms / +rescore 0.66 =
8.75 ms full, vs the 6.5-6.7 ms matmul-only floor (exp_floor); rb=8192
LOSES (9.09 ms scan — the 32 MB acc tile costs more than the halved
epilogue saves). Remaining suspects for the 1.4 ms:
  (a) in-kernel packed shift|or + group-max + (B,128)-per-tile output
      (vs exp_floor's single (B,1) running max, no output until end)
  (b) the XLA epilogue: approx_max_k over (B, 32768) f32-cast maxima,
      gather-decode, re-sort
This times: the raw maxima scan with NO epilogue (pallas output sliced,
nothing else), approx_max_k epilogue alone on a device-resident cand
tensor, and _exact_topk_wide alone — everything passed as jit args.

Run: bash tools/tpu_run.sh experiments/exp_epilogue.py
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, D, B = 1_048_576, 1024, 1024
RB = 4096
CHUNK = 262_144


def timed(fn, *args, iters=30, rounds=3):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    best = 1e9
    for _ in range(rounds):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
        best = min(best, (time.time() - t0) / iters)
    return best


def main():
    from theoremsearch_tpu.kernels.mips import (
        _exact_topk_wide,
        _mips_g_kernel,
        _quantize_queries,
    )

    print("devices:", jax.devices(), flush=True)
    kc, kq = jax.random.split(jax.random.PRNGKey(0))

    @jax.jit
    def gen_codes_chunk(key):
        x = jax.random.normal(key, (CHUNK, D), jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return jnp.clip(jnp.round(x / 0.03), -127, 127).astype(jnp.int8)

    codes = jnp.concatenate(
        [gen_codes_chunk(k) for k in jax.random.split(kc, N // CHUNK)], axis=0
    )
    qf = jax.random.normal(kq, (B, D), jnp.float32)
    qf = qf / jnp.linalg.norm(qf, axis=1, keepdims=True)
    jax.block_until_ready(codes)
    print("corpus ready", flush=True)

    n_tiles = N // RB
    g = RB // 128

    @jax.jit
    def scan_no_epilogue(q, c):
        qk, _ = _quantize_queries(q)
        kernel = functools.partial(
            _mips_g_kernel, row_block=RB, has_padding=False, has_mask=False
        )
        need = B * RB * 4 + 2 * RB * D + B * D + 2 * B * 128 * 4
        cand = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((B, D), lambda i: (0, 0)),
                pl.BlockSpec((RB, D), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((B, 128), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((B, n_tiles * 128), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(int(need * 1.75), 110 * 2**20)
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * B * N * D, bytes_accessed=N * D + B * D,
                transcendentals=0,
            ),
        )(qk, c)
        return cand[:, :128]  # force materialization, read ~nothing back

    dt = timed(scan_no_epilogue, qf, codes)
    print(f"maxima scan, no epilogue: {dt*1e3:6.2f} ms", flush=True)

    # device-resident packed cand stand-in for epilogue-only timing
    cand = jax.random.randint(
        jax.random.PRNGKey(7), (B, n_tiles * 128), -(2**30), 2**30, jnp.int32
    )
    jax.block_until_ready(cand)

    @functools.partial(jax.jit, static_argnames=("rt",))
    def epi_approx(cd, rt):
        _, pos = jax.lax.approx_max_k(cd.astype(jnp.float32), 40, recall_target=rt)
        pos = pos.astype(jnp.int32)
        vi = jnp.take_along_axis(cd, pos, axis=1)
        vi, order = jax.lax.top_k(vi, 40)
        pos = jnp.take_along_axis(pos, order, axis=1)
        ids = (pos // 128) * RB + (vi & (g - 1)) * 128 + pos % 128
        return vi, ids

    for rt in (0.95, 0.97):
        dt = timed(epi_approx, cand, rt)
        print(f"epilogue approx_max_k rt={rt}: {dt*1e3:6.2f} ms", flush=True)

    @jax.jit
    def epi_exact(cd):
        vi, pos = _exact_topk_wide(cd, 40)
        ids = (pos // 128) * RB + (vi & (g - 1)) * 128 + pos % 128
        return vi, ids

    dt = timed(epi_exact, cand)
    print(f"epilogue exact segmented:   {dt*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
