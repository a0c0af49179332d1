"""Chip A/B of the grouped per-query-mask scan (VERDICT r4 item 2):
fused_mips_topk_g at the 1M x 1024 headline config —
plain (approx epilogue) vs single mask (exact epilogue) vs grouped
masks at G = 8 and 32 — plus the full pipeline (retrieve + device
rescore) for each. Quantifies what a heterogeneous filtered window
costs relative to the single-signature masked scan (expected: the
one-hot select adds ~G/D of the matmul, i.e. 1-3%).

Run: bash tools/tpu_run.sh experiments/exp_maskg.py
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

    from theoremsearch_tpu.kernels.mips import device_rescore, fused_mips_topk_g

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

    def dev_masks(g):
        m = (rng.random((g, N)) < 0.3).astype(np.int8)
        return jnp.asarray(m), jnp.asarray(
            rng.integers(0, g, B).astype(np.int32)
        )

    mask1 = jnp.asarray((rng.random(N) < 0.3).astype(np.int8))
    gm8, mid8 = dev_masks(8)
    gm32, mid32 = dev_masks(32)

    # full jitted pipelines (corpus as ARGUMENTS, never closed over)
    def pipe_plain(qq, cod, rsc):
        _, li = fused_mips_topk_g(qq, cod, gscale, N, k=KR, row_block=RB)
        return device_rescore(qq, li, rsc, N, k=K)

    def pipe_mask(qq, m, cod, rsc):
        _, li = fused_mips_topk_g(qq, cod, gscale, N, m, k=KR, row_block=RB)
        return device_rescore(qq, li, rsc, N, k=K)

    def pipe_gmask(qq, gm, mid, cod, rsc):
        _, li = fused_mips_topk_g(
            qq, cod, gscale, N, k=KR, row_block=RB, gmasks=gm, mask_ids=mid
        )
        return device_rescore(qq, li, rsc, N, k=K)

    jplain = jax.jit(pipe_plain)
    jmask = jax.jit(pipe_mask)
    jgm = jax.jit(pipe_gmask)

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

    out = {"corpus": N, "dim": D, "batch": B, "k": K, "retrieve": KR,
           "row_block": RB, "rows": {}}
    for tag, fn, args in (
        ("plain_approx", jplain, (q, codes, resc)),
        ("mask1_exact", jmask, (q, mask1, codes, resc)),
        ("gmask_G8", jgm, (q, gm8, mid8, codes, resc)),
        ("gmask_G32", jgm, (q, gm32, mid32, codes, resc)),
    ):
        dt = timed(fn, *args)
        out["rows"][tag] = {
            "ms": round(dt * 1e3, 3), "qps": round(B / dt, 1),
        }
        print(f"# {tag}: {dt*1e3:.3f} ms -> {B/dt:,.0f} QPS", flush=True)

    # correctness spot-check on chip: every returned id passes its mask
    s, i = jgm(q, gm32, mid32, codes, resc)
    i = np.asarray(i)
    gm32_h = np.asarray(gm32)
    mid32_h = np.asarray(mid32)
    bad = sum(
        1
        for b in range(B)
        for d in i[b]
        if d >= 0 and not gm32_h[mid32_h[b], d]
    )
    out["gmask_G32_mask_violations"] = bad
    assert bad == 0, f"{bad} ids violate their query's mask"

    out["metric"] = "grouped_mask_scan_1M"
    out["hardware"] = "1x TPU v5e (axon tunnel)"
    with open("MASKG_BENCH_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
