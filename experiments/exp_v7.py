"""V7: why is the production wrapper 1.6ms slower than exp_v6?

Times on TPU at B=1024, rb=4096, kr=40, rt=0.95:
  1. fused_mips_topk_g alone (production wrapper, unpadded static path)
  2. + device_rescore
  3. production wrapper with vmem_limit forced to 100MB
  4. exp_v6-style separate jits (scan only, then finish)

Run: bash tools/tpu_run.sh experiments/exp_v7.py > /tmp/v7.log 2>&1
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

import theoremsearch_tpu.kernels.mips as M

N, D, K, KR = 1_048_576, 1024, 10, 40
B, RB = 1024, 4096


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
    x_bf16 = xf.astype(jnp.bfloat16)
    jax.block_until_ready((codes, x_bf16))
    del xf
    q = jax.random.normal(kq, (B, D), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    print("ready")

    fn1 = lambda qq: M.fused_mips_topk_g(qq, codes, gscale, N, k=KR, row_block=RB,
                                         recall_target=0.95)
    print(f"1. wrapper scan+epi      : {timed(fn1, q)*1e3:7.2f} ms")

    fn2 = lambda qq: M.device_rescore(qq, fn1(qq)[1], x_bf16, N, k=K)
    print(f"2. wrapper full pipeline : {timed(fn2, q)*1e3:7.2f} ms")

    # 3: monkeypatch the vmem limit to 100MB
    import functools as ft
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig = pltpu.CompilerParams
    def patched(**kw):
        kw["vmem_limit_bytes"] = 100 * 2**20
        return orig(**kw)
    pltpu.CompilerParams = patched
    M.fused_mips_topk_g.clear_cache()
    try:
        fn3 = lambda qq: M.fused_mips_topk_g(qq, codes, gscale, N, k=KR, row_block=RB,
                                             recall_target=0.95)
        print(f"3. wrapper, vmem=100MB   : {timed(fn3, q)*1e3:7.2f} ms")
    finally:
        pltpu.CompilerParams = orig
        M.fused_mips_topk_g.clear_cache()

    # 4: rescore with raw take (no clip/where) to isolate rescore overhead
    @jax.jit
    def raw_rescore(qq, ids):
        c = jnp.take(x_bf16, ids, axis=0)
        s = jax.lax.dot_general(c, qq.astype(c.dtype), (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        ts, sel = jax.lax.top_k(s, K)
        return ts, jnp.take_along_axis(ids, sel, axis=1)

    fn4 = lambda qq: raw_rescore(qq, fn1(qq)[1])
    print(f"4. pipeline raw-rescore  : {timed(fn4, q)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
