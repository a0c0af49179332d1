"""merge_tiles on the MASKED (filtered) scan — exact-epilogue A/B.

The filtered speed path selects with exact segmented top-k over the
(B, n_tiles*128) maxima (approx_max_k bin-collapses contiguous-id
filters); exp_epilogue measured that at 14.79 ms standalone for
width 32k at B=1024. merge_tiles narrows the width 4x, so the
filtered scan should gain far more than the unfiltered one.
Checks filtered recall@10 vs the masked fp32 oracle (30%-selective
contiguous id-range filter — the approx_max_k worst case that forced
the exact epilogue).

Run: bash tools/tpu_run.sh experiments/exp_merge_masked.py
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

N, D, K = 1_048_576, 1024, 10
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

    # contiguous id-range filter, 30% selective (year_range worst case)
    lo, hi = 200_000, 200_000 + int(0.3 * N)
    mask_np = np.zeros(N, dtype=np.int8)
    mask_np[lo:hi] = 1
    mask = jnp.asarray(mask_np).reshape(1, N)
    print("corpus ready", flush=True)

    def draw(seed, b):
        kk = jax.random.PRNGKey(seed)
        qf = jax.random.normal(kk, (b, D), jnp.float32)
        return qf / jnp.linalg.norm(qf, axis=1, keepdims=True)

    @jax.jit
    def _chunk_topk(q, c, base):
        s = jax.lax.dot_general(
            q, c, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        lo_c = jnp.maximum(lo - base, 0)
        hi_c = jnp.minimum(hi - base, CHUNK)
        col = jnp.arange(CHUNK)[None, :]
        s = jnp.where((col >= lo_c) & (col < hi_c), s, -jnp.inf)
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

    nv = jnp.asarray(N, jnp.int32)

    @functools.partial(jax.jit, static_argnames=("m", "kr"))
    def _full_jit(q, _codes, _gs, _bf16, _mask, m, kr):
        _, ik = _fused_mips_topk_g_impl(
            q, _codes, _gs, nv, _mask,
            k=kr, row_block=4096, recall_target=0.95, interpret=False,
            has_padding=False, exact_epilogue=True, merge_tiles=m,
        )
        return device_rescore(q, ik, _bf16, N, k=K)

    for b in (512, 1024):
        q0 = draw(100, b)
        orc = oracle(q0)
        for m in (1, 4):
            try:
                def f(q, _m=m):
                    return _full_jit(q, codes, gscale, bf16, mask, m=_m, kr=40)
                dt = timed(f, q0)
                _, ids = f(q0)
                ids = np.asarray(ids)
                ok = mask_np[np.maximum(ids, 0)].astype(bool) | (ids < 0)
                assert ok.all(), "filter violated"
                rec = np.mean([
                    len(set(ids[r].tolist()) & set(orc[r].tolist())) / K
                    for r in range(b)
                ])
                print(
                    f"B={b} m={m}: masked full {dt*1e3:6.2f} ms = "
                    f"{b/dt:9,.0f} QPS, recall@10 {rec:.4f}", flush=True,
                )
            except Exception as e:
                print(f"B={b} m={m}: FAIL {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
