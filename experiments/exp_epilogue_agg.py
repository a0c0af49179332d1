"""Probe: is approx_max_k's aggregate-to-topk pass worth skipping?

In the rescored pipeline the scan's candidate order is irrelevant
(device_rescore re-ranks) and extra candidates only help recall, so
`aggregate_to_topk=False` (returning the l unaggregated bin winners)
could skip work. Times both modes at the merged selection width
(B=1024, W=8192, k=40, rt=.95) plus the decode chain, and reports l.

Run: bash tools/tpu_run.sh experiments/exp_epilogue_agg.py

VERDICT (real chip, 2026-08-19): parked — aggregate_to_topk=False is
14.5 ms vs 2.23 ms aggregated: the unaggregated output is l=1024 bin
winners (25x wider), so the downstream gather/decode dwarfs the saved
aggregation pass. Also: approx_max_k is ~fixed-cost in width on this
backend (2.23 ms at W=8192 vs 2.40 at W=32768 standalone), which is
why merge_tiles=4 bought 0.35 ms in-stream rather than 4x — the
epilogue is at its floor; the remaining scan-vs-matmul gap is the
in-kernel packed reduction + approx_max_k's fixed cost.
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

B, W, K = 1024, 8192, 40


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
    print("devices:", jax.devices(), flush=True)
    cand = jax.random.randint(
        jax.random.PRNGKey(7), (B, W), -(2**30), 2**30, jnp.int32
    )
    jax.block_until_ready(cand)

    @functools.partial(jax.jit, static_argnames=("agg",))
    def epi(cd, agg):
        _, pos = jax.lax.approx_max_k(
            cd.astype(jnp.float32), K, recall_target=0.95,
            aggregate_to_topk=agg,
        )
        pos = pos.astype(jnp.int32)
        vi = jnp.take_along_axis(cd, pos, axis=1)
        if agg:
            vi, order = jax.lax.top_k(vi, K)
            pos = jnp.take_along_axis(pos, order, axis=1)
        ids = (pos // 128) * 16384 + (vi & 127) * 128 + pos % 128
        return vi, ids

    for agg in (True, False):
        out = epi(cand, agg)
        l = out[0].shape[1]
        dt = timed(epi, cand, agg)
        print(f"aggregate_to_topk={agg}: {dt*1e3:6.3f} ms, out width l={l}",
              flush=True)


if __name__ == "__main__":
    main()
