"""Chip A/B: segment size of the masked scan's exact two-stage epilogue
(_exact_topk_wide). The masked pipeline runs 7.5 ms vs plain 5.0 at
B=512/1M (MASKG_BENCH_r05.json); the exact selection over the (B, 8192)
maxima is the main delta. Stage-1 currently takes per-2048-segment
top-k; narrower/wider segments change the sort/merge balance.

Run: bash tools/tpu_run.sh experiments/exp_epilogue_seg.py
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    import theoremsearch_tpu.kernels.mips as mips

    N, D, B, K, KR, RB = 1_048_576, 1024, 512, 10, 40, 4096
    key = jax.random.PRNGKey(0)
    kc, kq = jax.random.split(key)
    CHUNK = 262_144
    keys = jax.random.split(kc, N // CHUNK)

    @functools.partial(jax.jit, static_argnames=("rows",))
    def gen(k, *, rows):
        x = jax.random.normal(k, (rows, D), jnp.float32)
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    absmax = max(float(jnp.max(jnp.abs(gen(k, rows=CHUNK)))) for k in keys)
    gscale = absmax / 127.0

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def pack(cbuf, bbuf, x, start):
        cg = jnp.clip(jnp.round(x / gscale), -127, 127).astype(jnp.int8)
        return (
            jax.lax.dynamic_update_slice(cbuf, cg, (start, 0)),
            jax.lax.dynamic_update_slice(bbuf, x.astype(jnp.bfloat16), (start, 0)),
        )

    codes = jnp.zeros((N, D), jnp.int8)
    resc = jnp.zeros((N, D), jnp.bfloat16)
    for c, k in enumerate(keys):
        print(f"# corpus chunk {c + 1}/{len(keys)}", flush=True)
        codes, resc = pack(codes, resc, gen(k, rows=CHUNK), jnp.int32(c * CHUNK))

    q = gen(kq, rows=B)
    rng = np.random.default_rng(0)
    mask1 = jnp.asarray((rng.random(N) < 0.3).astype(np.int8))

    def pipe_mask(qq, m, cod, rsc):
        _, li = mips.fused_mips_topk_g(qq, cod, gscale, N, m, k=KR, row_block=RB)
        return mips.device_rescore(qq, li, rsc, N, k=K)

    def timed(fn, *args, iters=30, rounds=3):
        jax.block_until_ready(fn(*args))
        best = float("inf")
        for _ in range(rounds):
            t0 = time.time()
            outs = None
            for _ in range(iters):
                outs = fn(*args)
            jax.block_until_ready(outs)
            best = min(best, (time.time() - t0) / iters)
        return best

    # patch the default seg by wrapping _exact_topk_wide
    orig = mips._exact_topk_wide
    out = {"corpus": N, "dim": D, "batch": B, "rows": {}}
    ref_ids = None
    for seg in (1024, 2048, 4096, 8192):
        mips._exact_topk_wide = lambda cand, k, s=seg: orig(cand, k, seg=s)
        jm = jax.jit(pipe_mask)
        dt = timed(jm, q, mask1, codes, resc)
        s, i = jm(q, mask1, codes, resc)
        i = np.asarray(i)
        if ref_ids is None:
            ref_ids = i
        else:
            assert (i == ref_ids).all(), f"seg={seg} changed results"
        out["rows"][f"seg{seg}"] = {"ms": round(dt * 1e3, 3), "qps": round(B / dt, 1)}
        print(f"# masked pipeline seg={seg}: {dt*1e3:.3f} ms -> {B/dt:,.0f} QPS",
              flush=True)
    mips._exact_topk_wide = orig
    out["metric"] = "masked_exact_epilogue_seg_sweep"
    out["hardware"] = "1x TPU v5e (axon tunnel)"
    with open("EPILOGUE_SEG_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
