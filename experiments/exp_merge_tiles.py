"""Measure merge_tiles on the headline pipeline (B=1024, 1M x 1024).

exp_epilogue.py put the approx_max_k epilogue at ~1.2 ms in-stream
(scan 8.09 = kernel 6.90 + epilogue; rescore +0.66); merge_tiles
divides the epilogue width by M at an unchanged kernel. Expect
full ~ 8.75 -> ~7.5-7.9 ms if the epilogue scales with width.
Recall gate readout: min over 2 x 1024-query draws vs fp32 exact
(cells grow to M*128 rows; exp_headline_bisect2 measured NO recall
change 32k -> 16k cells, approx_max_k's (1-rt) dominates).

Run: bash tools/tpu_run.sh experiments/exp_merge_tiles.py
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

N, D, B, K = 1_048_576, 1024, 1024, 10
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
        _fused_mips_topk_g_impl,
        device_rescore,
    )

    print("devices:", jax.devices(), flush=True)
    kc, _ = jax.random.split(jax.random.PRNGKey(0))

    @jax.jit
    def gen_chunk(key):
        x = jax.random.normal(key, (CHUNK, D), jnp.float32)
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    chunks = [gen_chunk(k) for k in jax.random.split(kc, N // CHUNK)]
    gscale = jnp.max(jnp.stack([jnp.max(jnp.abs(c)) for c in chunks])) / 127.0

    @jax.jit
    def quant_chunk(c):
        return (
            jnp.clip(jnp.round(c / gscale), -127, 127).astype(jnp.int8),
            c.astype(jnp.bfloat16),
        )

    qs = [quant_chunk(c) for c in chunks]
    codes = jnp.concatenate([a for a, _ in qs], axis=0)
    bf16 = jnp.concatenate([b for _, b in qs], axis=0)
    del qs
    jax.block_until_ready(codes)
    print("corpus ready", flush=True)

    def draw(seed):
        kk = jax.random.PRNGKey(seed)
        qf = jax.random.normal(kk, (B, D), jnp.float32)
        return qf / jnp.linalg.norm(qf, axis=1, keepdims=True)

    q0 = draw(100)

    @jax.jit
    def _chunk_topk(q, c, base):
        s = jax.lax.dot_general(
            q, c, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        v, i = jax.lax.top_k(s, K)
        return v, i + base

    def oracle(q):
        vs, iss = [], []
        for ci, c in enumerate(chunks):
            v, i = _chunk_topk(q, c, ci * CHUNK)
            vs.append(v); iss.append(i)
        v = jnp.concatenate(vs, axis=1); i = jnp.concatenate(iss, axis=1)
        _, pos = jax.lax.top_k(v, K)
        return np.asarray(jnp.take_along_axis(i, pos, axis=1))

    oracles = {s: oracle(draw(s)) for s in (100, 101)}
    print("oracles ready", flush=True)

    nv = jnp.asarray(N, jnp.int32)

    # corpus arrays stay jit ARGS (constant capture ships GBs to the
    # remote compiler — exp_headline_bisect2's hard lesson)
    def scan(m, kr, rt):
        def f(q, _codes=codes, _gs=gscale):
            return _fused_mips_topk_g_impl(
                q, _codes, _gs, nv, None,
                k=kr, row_block=4096, recall_target=rt, interpret=False,
                has_padding=False, exact_epilogue=False, merge_tiles=m,
            )
        return f

    @functools.partial(jax.jit, static_argnames=("m", "kr", "rt"))
    def _full_jit(q, _codes, _gs, _bf16, m, kr, rt):
        _, ik = _fused_mips_topk_g_impl(
            q, _codes, _gs, nv, None,
            k=kr, row_block=4096, recall_target=rt, interpret=False,
            has_padding=False, exact_epilogue=False, merge_tiles=m,
        )
        return device_rescore(q, ik, _bf16, N, k=K)

    for m, kr, rt in ((1, 40, 0.95), (2, 40, 0.95), (4, 40, 0.95),
                      (4, 48, 0.95), (4, 40, 0.97)):
        try:
            dt_s = timed(scan(m, kr, rt), q0)
            def f_f(q, _m=m, _kr=kr, _rt=rt):
                return _full_jit(q, codes, gscale, bf16, m=_m, kr=_kr, rt=_rt)
            dt_f = timed(f_f, q0)
            recs = []
            for s, orc in oracles.items():
                _, ids = f_f(draw(s))
                ids = np.asarray(ids)
                recs.append(np.mean([
                    len(set(ids[r].tolist()) & set(orc[r].tolist())) / K
                    for r in range(B)
                ]))
            print(
                f"m={m} kr={kr} rt={rt}: scan {dt_s*1e3:6.2f} ms, "
                f"full {dt_f*1e3:6.2f} ms = {B/dt_f:9,.0f} QPS, "
                f"recall@10 min {min(recs):.4f} draws "
                f"{[f'{r:.4f}' for r in recs]}", flush=True,
            )
        except Exception as e:
            print(f"m={m} kr={kr} rt={rt}: FAIL {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
