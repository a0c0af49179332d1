"""V8: isolate the wrapper's 1.2ms regression vs the bare experiment.

Variants at B=1024, rb=4096, kr=40, rt=0.95 (all one number each):
  a) production fused_mips_topk_g (baseline, 9.35 ms in v7)
  b) bare scan pallas_call + bare epilogue in ONE jit (exp-v4 semantics,
     quantize inside)
  c) same as b but TWO jits (exact exp-v4 structure)
  d) b + the exact re-sort step
Run: bash tools/tpu_run.sh experiments/exp_v8.py > /tmp/v8.log 2>&1
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import theoremsearch_tpu.kernels.mips as M

N, D, KR = 1_048_576, 1024, 40
B, RB = 1024, 4096
G = RB // 128
GS = G.bit_length() - 1


def timed(fn, q, iters=30, rounds=3):
    out = fn(q)
    _ = np.asarray(jax.tree.leaves(out)[0][:1, :1])
    best = 1e9
    for _ in range(rounds):
        t0 = time.time()
        for _ in range(iters):
            out = fn(q)
        _ = np.asarray(jax.tree.leaves(out)[0][:1, :1])
        best = min(best, (time.time() - t0) / iters)
    return best


def kernel(q_ref, c_ref, out_ref):
    acc = jax.lax.dot_general(
        q_ref[:], c_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    m1 = None
    for grp in range(G):
        sl = (acc[:, grp * 128 : (grp + 1) * 128] << GS) | grp
        m1 = sl if m1 is None else jnp.maximum(m1, sl)
    out_ref[...] = m1


def scan_bare(q8, codes):
    return pl.pallas_call(
        kernel,
        grid=(N // RB,),
        in_specs=[
            pl.BlockSpec((B, D), lambda i: (0, 0)),
            pl.BlockSpec((RB, D), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((B, 128), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((B, (N // RB) * 128), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D, bytes_accessed=N * D + B * D, transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(q8, codes)


def q8_of(q):
    qm = jnp.max(jnp.abs(q), axis=1, keepdims=True) / 127.0
    return jnp.clip(jnp.round(q / qm), -127, 127).astype(jnp.int8)


def epi(cand, resort):
    _, pos = jax.lax.approx_max_k(cand.astype(jnp.float32), KR, recall_target=0.95)
    pos = pos.astype(jnp.int32)
    vi = jnp.take_along_axis(cand, pos, axis=1)
    if resort:
        vi, order = jax.lax.top_k(vi, KR)
        pos = jnp.take_along_axis(pos, order, axis=1)
    ids = (pos // 128) * RB + (vi & (G - 1)) * 128 + pos % 128
    return jax.lax.shift_right_arithmetic(vi, GS), ids


@functools.partial(jax.jit, static_argnames=("resort",))
def one_jit(q, codes, resort=False):
    return epi(scan_bare(q8_of(q), codes), resort)


jit_scan = jax.jit(lambda q, codes: scan_bare(q8_of(q), codes))
jit_epi = jax.jit(lambda cand: epi(cand, False))


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    kq, kc = jax.random.split(key)

    @jax.jit
    def gen(key):
        x = jax.random.normal(key, (N, D), jnp.float32)
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    xf = gen(kc)
    jax.block_until_ready(xf)
    gscale = float(jnp.max(jnp.abs(xf)) / 127.0)
    codes = jnp.clip(jnp.round(xf / gscale), -127, 127).astype(jnp.int8)
    jax.block_until_ready(codes)
    del xf
    q = jax.random.normal(kq, (B, D), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    print("ready")

    print(f"a) production wrapper : {timed(lambda qq: M.fused_mips_topk_g(qq, codes, gscale, N, k=KR, row_block=RB, recall_target=0.95), q)*1e3:7.2f} ms")
    print(f"b) bare one-jit       : {timed(lambda qq: one_jit(qq, codes, False), q)*1e3:7.2f} ms")
    print(f"c) bare two-jit       : {timed(lambda qq: jit_epi(jit_scan(qq, codes)), q)*1e3:7.2f} ms")
    print(f"d) bare + resort      : {timed(lambda qq: one_jit(qq, codes, True), q)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
