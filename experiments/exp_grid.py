"""Does the fused scan's grid size (row blocks) explain the post-compact
slowdown? LIVE_BENCH_r03 saw 1M=256 blocks at 101.4k QPS but
1M+10k=259 blocks at only 87.5k — a 16% drop for +1.2% rows. Time the
speed path at several block counts around 256 to see whether odd /
non-multiple-of-N grids carry a penalty the kernel should pad away.
"""

import functools
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from theoremsearch_tpu.core import IndexConfig
    from theoremsearch_tpu.index import FlatIndex
    from theoremsearch_tpu.search import SearchEngine

    D, B, K, RB = 1024, 512, 10, 4096
    key = jax.random.PRNGKey(0)
    kc, kq = jax.random.split(key)

    @functools.partial(jax.jit, static_argnames=("rows",))
    def gen(k, *, rows):
        x = jax.random.normal(k, (rows, D), jnp.float32)
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    CHUNK = 262_144
    MAXN = 264 * RB
    keys = jax.random.split(kc, MAXN // CHUNK + 1)
    absmax = max(float(jnp.max(jnp.abs(gen(k, rows=CHUNK)))) for k in keys[:2])
    gscale = absmax / 127.0

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def pack(cbuf, bbuf, x, start):
        cg = jnp.clip(jnp.round(x / gscale), -127, 127).astype(jnp.int8)
        return (
            jax.lax.dynamic_update_slice(cbuf, cg, (start, 0)),
            jax.lax.dynamic_update_slice(bbuf, x.astype(jnp.bfloat16), (start, 0)),
        )

    cbuf = jnp.zeros((MAXN, D), jnp.int8)
    bbuf = jnp.zeros((MAXN, D), jnp.bfloat16)
    for c, k in enumerate(keys):
        rows = min(CHUNK, MAXN - c * CHUNK)
        if rows <= 0:
            break
        cbuf, bbuf = pack(cbuf, bbuf, gen(k, rows=CHUNK)[:rows], jnp.int32(c * CHUNK))
    codes_all = np.asarray(cbuf)
    del cbuf
    resc_all = np.asarray(bbuf).view(np.uint16).view(ml_dtypes.bfloat16)
    del bbuf
    qd = gen(kq, rows=B)

    out = {"metric": "scan_vs_grid_blocks", "dim": D, "batch": B,
           "row_block": RB, "points": {}}
    for blocks in (256, 257, 258, 259, 260, 262, 264):
        N = blocks * RB
        idx = FlatIndex(
            vectors=codes_all[:N],
            ids=np.arange(N, dtype=np.int64),
            scales=np.full(N, gscale, np.float32),
            num_rows=N,
            config=IndexConfig(dim=D, dtype="int8", int8_scale="global",
                               row_block=RB),
            global_scale=gscale,
        )
        eng = SearchEngine(idx, row_block=RB, rescore_vectors=resc_all[:N],
                           rescore_factor=4, use_pallas=True)
        assert eng._speed_ok
        eng.search_vectors_async(qd, k=K)()   # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(29):
                eng.search_vectors_async(qd, k=K)
            eng.search_vectors_async(qd, k=K)()
            best = min(best, (time.time() - t0) / 30)
        out["points"][blocks] = {"rows": N, "ms": round(best * 1e3, 3),
                                 "qps": round(B / best, 1),
                                 "ms_per_block": round(best * 1e3 / blocks, 5)}
        print(f"# blocks={blocks} N={N}: {best*1e3:.2f} ms "
              f"-> {B/best:,.0f} QPS  ({best*1e3/blocks*1e3:.2f} us/blk)",
              flush=True)
        del eng, idx

    print(json.dumps(out))


if __name__ == "__main__":
    main()
