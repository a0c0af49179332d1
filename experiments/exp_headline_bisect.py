"""Bisect the headline speed path at B=1024 on the 1M x 1024 corpus.

exp_floor.py (2026-08-19 rerun, /tmp/floor_r3.log) put the matmul-only
scan at 6.50 ms (rb=4096, B=1024) = 86% of the 394-TOPS int8 ideal,
while the full headline pipeline (fused_mips_topk_g rt95 + bf16
device_rescore) measures 9.08 ms (BENCH_r03_local.json) — 2.6 ms of
non-matmul overhead. This experiment splits that gap:

  1. kernel-only: pallas maxima scan, epilogue replaced by a scalar max
     (isolates in-kernel packed reduction + (B, n_tiles*128) HBM write)
  2. scan: fused_mips_topk_g (kernel + approx_max_k epilogue + decode)
  3. scan+rescore: the full headline step
each at row_block 4096 (current) and 8192 (halves the epilogue width;
G=64 still fits the packing bound 127*127*1024*64 < 2^31), and the
recall@10-vs-fp32-exact of every candidate config on 2 query draws
(halving the lane-cell count doubles the cell-collision loss, so rb=8192
may need retrieve-48/64 or rt97 to hold the 0.99 gate).

Run: bash tools/tpu_run.sh experiments/exp_headline_bisect.py
"""

import functools
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
        fused_mips_topk_g,
    )

    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    kc, kq = jax.random.split(key)

    @jax.jit
    def gen_chunk(key):
        x = jax.random.normal(key, (CHUNK, D), jnp.float32)
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    # HBM budget: fp32 chunks 4 GB (oracle) + int8 codes 1 GB + bf16
    # copy 2 GB = 7 GB; never materialize the concatenated fp32 corpus
    # (chunks + concat = 8 GB peak OOM'd the 16 GB chip on the first run)
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
    print("corpus ready")

    def draw(seed):
        kk = jax.random.PRNGKey(seed)
        qf = jax.random.normal(kk, (B, D), jnp.float32)
        return qf / jnp.linalg.norm(qf, axis=1, keepdims=True)

    q0 = draw(100)

    # fp32-exact oracle per draw (chunked; corpus chunks as jit args)
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
        vv, pos = jax.lax.top_k(v, K)
        return np.asarray(jnp.take_along_axis(i, pos, axis=1))

    oracles = {s: oracle(draw(s)) for s in (100, 101)}
    print("oracles ready")

    # --- 1. kernel-only: full maxima scan, trivial epilogue ---
    def kernel_only(rb):
        @jax.jit
        def f(q):
            # reuse the real impl but reduce the cand tensor to one
            # scalar so approx_max_k/decode is out of the measurement;
            # k=1 keeps the epilogue, so instead call the impl's pieces:
            # easiest honest proxy = scan with k=1 exact-off epilogue
            s, i = _fused_mips_topk_g_impl(
                q, codes, gscale, jnp.asarray(N, jnp.int32), None,
                k=1, row_block=rb, recall_target=0.95, interpret=False,
                has_padding=False, exact_epilogue=False,
            )
            return s
        return f

    # --- 2/3. scan and scan+rescore ---
    def scan(rb, kr, rt):
        @jax.jit
        def f(q):
            return _fused_mips_topk_g_impl(
                q, codes, gscale, jnp.asarray(N, jnp.int32), None,
                k=kr, row_block=rb, recall_target=rt, interpret=False,
                has_padding=False, exact_epilogue=False,
            )
        return f

    def full(rb, kr, rt):
        sc = scan(rb, kr, rt)
        @jax.jit
        def f(q):
            _, i40 = sc(q)
            return device_rescore(q, i40, bf16, N, k=K)
        return f

    for rb in (4096, 8192):
        try:
            dt = timed(kernel_only(rb), q0)
            print(f"kernel+eplg(k=1) rb={rb}: {dt*1e3:7.2f} ms")
        except Exception as e:
            print(f"kernel-only rb={rb}: FAIL {str(e)[:160]}")
            continue
        for kr, rt in ((40, 0.95), (40, 0.97), (64, 0.95)):
            try:
                f_s = scan(rb, kr, rt)
                dt_s = timed(f_s, q0)
                f_f = full(rb, kr, rt)
                dt_f = timed(f_f, q0)
                recs = []
                for s, orc in oracles.items():
                    qd = draw(s)
                    _, ids = f_f(qd)
                    ids = np.asarray(ids)
                    rec = np.mean([
                        len(set(ids[r].tolist()) & set(orc[r].tolist())) / K
                        for r in range(B)
                    ])
                    recs.append(rec)
                print(
                    f"rb={rb} kr={kr} rt={rt}: scan {dt_s*1e3:6.2f} ms, "
                    f"full {dt_f*1e3:6.2f} ms = {B/dt_f:9,.0f} QPS, "
                    f"recall@10 min {min(recs):.4f} draws {[f'{r:.4f}' for r in recs]}"
                )
            except Exception as e:
                print(f"rb={rb} kr={kr} rt={rt}: FAIL {str(e)[:160]}")


if __name__ == "__main__":
    main()
