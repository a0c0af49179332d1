"""Bisect the headline speed path at B=1024 (v2 — see exp_headline_bisect).

v1's jit closures CAPTURED codes/bf16 (3.22 GB of constants baked
into every remote compile -> ~20-min hangs then broken pipe; bench.py's
docstring warns exactly this) — here every corpus array is a jit ARG.
Measures scan-only vs scan+rescore per config, with the matmul floor
(6.5-6.7 ms, exp_floor) as the kernel bound:

  epilogue cost = scan - (floor + in-kernel packing delta)
  rescore cost  = full - scan

Configs: current headline (rb=4096, kr=40, rt=.95) plus rb=8192 (half
the epilogue width; G=64 within the packing bound) at kr 40/64 and
rt .95/.97, each with recall@10 vs the fp32 exact oracle on 2 draws.

Run: bash tools/tpu_run.sh experiments/exp_headline_bisect2.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

N, D, B, K = 1_048_576, 1024, 1024, 10
CHUNK = 262_144


def timed(fn, q, iters=30, rounds=3):
    out = fn(q)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    best = 1e9
    for _ in range(rounds):
        t0 = time.time()
        for _ in range(iters):
            out = fn(q)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
        best = min(best, (time.time() - t0) / iters)
    return best


def main():
    from theoremsearch_tpu.kernels.mips import (
        _fused_mips_topk_g_impl,
        device_rescore,
    )

    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    kc, _ = jax.random.split(key)

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

    import functools

    nv = jnp.asarray(N, jnp.int32)

    # corpus arrays are ARGS (constant capture ships GBs to the remote
    # compiler); _fused_mips_topk_g_impl is itself jitted, so calling it
    # directly reuses one cached program per static config
    def scan(rb, kr, rt):
        def f(q, _codes=codes, _gs=gscale):
            return _fused_mips_topk_g_impl(
                q, _codes, _gs, nv, None,
                k=kr, row_block=rb, recall_target=rt, interpret=False,
                has_padding=False, exact_epilogue=False,
            )
        return f

    @functools.partial(
        jax.jit, static_argnames=("rb", "kr", "rt"))
    def _full_jit(q, _codes, _gs, _bf16, rb, kr, rt):
        _, ik = _fused_mips_topk_g_impl(
            q, _codes, _gs, nv, None,
            k=kr, row_block=rb, recall_target=rt, interpret=False,
            has_padding=False, exact_epilogue=False,
        )
        return device_rescore(q, ik, _bf16, N, k=K)

    def full(rb, kr, rt):
        def f(q):
            return _full_jit(q, codes, gscale, bf16, rb=rb, kr=kr, rt=rt)
        return f

    configs = [
        (4096, 40, 0.95),
        (8192, 40, 0.95),
        (8192, 40, 0.97),
        (8192, 64, 0.95),
    ]
    for rb, kr, rt in configs:
        try:
            f_s = scan(rb, kr, rt)
            dt_s = timed(f_s, q0)
            print(f"rb={rb} kr={kr} rt={rt}: scan {dt_s*1e3:6.2f} ms", flush=True)
        except Exception as e:
            print(f"rb={rb} kr={kr} rt={rt}: scan FAIL {str(e)[:140]}", flush=True)
            dt_s = None
        try:
            f_f = full(rb, kr, rt)
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
                f"rb={rb} kr={kr} rt={rt}: full {dt_f*1e3:6.2f} ms = "
                f"{B/dt_f:9,.0f} QPS, recall@10 min {min(recs):.4f} "
                f"draws {[f'{r:.4f}' for r in recs]}", flush=True,
            )
        except Exception as e:
            print(f"rb={rb} kr={kr} rt={rt}: full FAIL {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
