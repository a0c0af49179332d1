"""Experiment: locate the MXU-efficiency gap in the fused MIPS kernel.

Measures matmul-only Pallas kernels (no merge) at several (B, row_block)
points and in two corpus layouts:
  - row-major (N, D) int8, contracting last dims (rhs needs a transpose)
  - transposed (D, N) int8, plain (B,K)x(K,N) matmul (no transpose)
Also measures the pure-XLA full matmul throughput as an upper bound.

Run: bash tools/tpu_run.sh experiments/exp_floor.py > /tmp/floor.log 2>&1
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, D = 1_048_576, 1024


def timed(fn, q, iters=30, rounds=3):
    s = fn(q)
    _ = np.asarray(jax.tree.leaves(s)[0]).ravel()[0]
    best = 1e9
    for _ in range(rounds):
        t0 = time.time()
        for _ in range(iters):
            s = fn(q)
        _ = np.asarray(jax.tree.leaves(s)[0]).ravel()[0]
        best = min(best, (time.time() - t0) / iters)
    return best


# --- matmul-only kernel, row-major corpus (N, D): out = running max ---
def mm_rowmajor_kernel(q_ref, c_ref, out_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.full_like(acc_ref, -3e38)

    s = jax.lax.dot_general(
        q_ref[:], c_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    acc_ref[:] = jnp.maximum(acc_ref[:], jnp.max(s, axis=1, keepdims=True))

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("rb",))
def mm_rowmajor(q8, c8, rb):
    b = q8.shape[0]
    return pl.pallas_call(
        mm_rowmajor_kernel,
        grid=(N // rb,),
        in_specs=[
            pl.BlockSpec((b, D), lambda i: (0, 0)),
            pl.BlockSpec((rb, D), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((b, 1), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, 1), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * N * D, bytes_accessed=N * D + b * D, transcendentals=0
        ),
    )(q8, c8)


# --- matmul-only kernel, transposed corpus (D, N) ---
def mm_transposed_kernel(q_ref, c_ref, out_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.full_like(acc_ref, -3e38)

    s = jax.lax.dot_general(
        q_ref[:], c_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    acc_ref[:] = jnp.maximum(acc_ref[:], jnp.max(s, axis=1, keepdims=True))

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("rb",))
def mm_transposed(q8, c8t, rb):
    b = q8.shape[0]
    return pl.pallas_call(
        mm_transposed_kernel,
        grid=(N // rb,),
        in_specs=[
            pl.BlockSpec((b, D), lambda i: (0, 0)),
            pl.BlockSpec((D, rb), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((b, 1), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, 1), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * N * D, bytes_accessed=N * D + b * D, transcendentals=0
        ),
    )(q8, c8t)


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    kq, kc = jax.random.split(key)

    @jax.jit
    def gen_codes(key):
        x = jax.random.normal(key, (N, D), jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        sc = jnp.max(jnp.abs(x), axis=1) / 127.0
        return jnp.clip(jnp.round(x / sc[:, None]), -127, 127).astype(jnp.int8)

    c8 = gen_codes(kc)
    jax.block_until_ready(c8)
    c8t = jnp.asarray(np.asarray(c8).T)  # host transpose to control layout
    jax.block_until_ready(c8t)
    print("corpora ready")

    for B in (256, 512, 1024):
        qf = jax.random.normal(kq, (B, D), jnp.float32)
        qmax = jnp.max(jnp.abs(qf), axis=1, keepdims=True) / 127.0
        q8 = jnp.clip(jnp.round(qf / qmax), -127, 127).astype(jnp.int8)
        jax.block_until_ready(q8)
        ideal_ms = 2 * B * N * D / 394e12 * 1e3
        for rb in (1024, 2048, 4096):
            # VMEM: corpus tile rb*D int8 x2 + q B*D + scores B*rb f32(transient)
            try:
                dt = timed(lambda q: mm_rowmajor(q, c8, rb), q8)
                print(f"rowmajor  B={B} rb={rb}: {dt*1e3:7.2f} ms  {B/dt:9,.0f} QPS  (ideal {ideal_ms:.2f} ms)")
            except Exception as e:
                print(f"rowmajor  B={B} rb={rb}: FAIL {str(e)[:120]}")
            try:
                dt = timed(lambda q: mm_transposed(q, c8t, rb), q8)
                print(f"transpose B={B} rb={rb}: {dt*1e3:7.2f} ms  {B/dt:9,.0f} QPS")
            except Exception as e:
                print(f"transpose B={B} rb={rb}: FAIL {str(e)[:120]}")


if __name__ == "__main__":
    main()
