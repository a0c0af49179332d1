"""V9: morph bare->production to pin the remaining 1.26ms.

Variants (B=1024, rb=4096, kr=40, rt=0.95):
  d) bare + resort (8.14 ms in v8)
  e) d + full production decode (valid mask, qscale multiply, f32 scores)
  f) e but calling the production _mips_g_kernel partial
  g) f with production's computed vmem_limit (45MB) + cost estimate
Run: bash tools/tpu_run.sh experiments/exp_v9.py > /tmp/v9.log 2>&1
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from theoremsearch_tpu.kernels.mips import (
    _mips_g_kernel, _quantize_queries, _INVALID_SCORE, NEG_INF,
)

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


def bare_kernel(q_ref, c_ref, out_ref):
    acc = jax.lax.dot_general(
        q_ref[:], c_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    m1 = None
    for grp in range(G):
        sl = (acc[:, grp * 128 : (grp + 1) * 128] << GS) | grp
        m1 = sl if m1 is None else jnp.maximum(m1, sl)
    out_ref[...] = m1


def scan(q8, codes, which, vmem_mb=100, cost=True):
    kern = (bare_kernel if which == "bare"
            else functools.partial(_mips_g_kernel, row_block=RB, has_padding=False))
    kw = {}
    if cost:
        kw["cost_estimate"] = pl.CostEstimate(
            flops=2 * B * N * D, bytes_accessed=N * D + B * D, transcendentals=0)
    return pl.pallas_call(
        kern,
        grid=(N // RB,),
        in_specs=[
            pl.BlockSpec((B, D), lambda i: (0, 0)),
            pl.BlockSpec((RB, D), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((B, 128), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((B, (N // RB) * 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 2**20),
        **kw,
    )(q8, codes)


def full_decode(cand, qscales, gscale):
    _, pos = jax.lax.approx_max_k(cand.astype(jnp.float32), KR, recall_target=0.95)
    pos = pos.astype(jnp.int32)
    vi = jnp.take_along_axis(cand, pos, axis=1)
    vi, order = jax.lax.top_k(vi, KR)
    pos = jnp.take_along_axis(pos, order, axis=1)
    ids = (pos // 128) * RB + (vi & (G - 1)) * 128 + pos % 128
    valid = vi > _INVALID_SCORE
    scores = jnp.where(
        valid,
        jax.lax.shift_right_arithmetic(vi, GS).astype(jnp.float32)
        * jnp.asarray(gscale, jnp.float32) * qscales,
        NEG_INF)
    return scores, jnp.where(valid, ids, -1)


@functools.partial(jax.jit, static_argnames=("which", "vmem_mb"))
def pipe(q, codes, gscale, which="bare", vmem_mb=100):
    qk, qscales = _quantize_queries(q)
    cand = scan(qk, codes, which, vmem_mb)
    return full_decode(cand, qscales, gscale)


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

    print(f"e) bare kernel + full decode   : {timed(lambda qq: pipe(qq, codes, gscale, 'bare'), q)*1e3:7.2f} ms")
    print(f"f) prod kernel + full decode   : {timed(lambda qq: pipe(qq, codes, gscale, 'prod'), q)*1e3:7.2f} ms")
    print(f"g) prod kernel, vmem=45MB      : {timed(lambda qq: pipe(qq, codes, gscale, 'prod', 45), q)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
