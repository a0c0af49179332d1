"""Round-4 stall hunt, part 3 (compiles and allocations ruled out):
reproduce the one ~10 s query stall per compact() with a SUSTAINED
full-size chunked upload (the real compact moves ~3 GB through the
~20 MB/s tunnel for ~150 s; the sparse probes that moved <200 MiB never
stalled), then test pacing — a small sleep between chunks that leaves
the tunnel headroom — as the mitigation.
"""

import json
import threading
import time

import numpy as np


def main():
    import functools
    import os

    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    import ml_dtypes

    from theoremsearch_tpu.core import IndexConfig
    from theoremsearch_tpu.index import FlatIndex
    from theoremsearch_tpu.search import SearchEngine

    N, D, B, K = 1_048_576, 1024, 512, 10
    CHUNK = 262_144
    key = jax.random.PRNGKey(0)
    kc, kq = jax.random.split(key)
    keys = jax.random.split(kc, N // CHUNK)

    @functools.partial(jax.jit, static_argnames=("rows",))
    def gen(k, *, rows):
        x = jax.random.normal(k, (rows, D), jnp.float32)
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    gscale = max(float(jnp.max(jnp.abs(gen(k, rows=CHUNK)))) for k in keys) / 127.0

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def pack(cbuf, bbuf, x, start):
        cg = jnp.clip(jnp.round(x / gscale), -127, 127).astype(jnp.int8)
        return (
            jax.lax.dynamic_update_slice(cbuf, cg, (start, 0)),
            jax.lax.dynamic_update_slice(bbuf, x.astype(jnp.bfloat16), (start, 0)),
        )

    cbuf = jnp.zeros((N, D), jnp.int8)
    bbuf = jnp.zeros((N, D), jnp.bfloat16)
    for c, k in enumerate(keys):
        cbuf, bbuf = pack(cbuf, bbuf, gen(k, rows=CHUNK), jnp.int32(c * CHUNK))
    codes = np.asarray(cbuf)
    del cbuf
    rescore = np.asarray(bbuf).view(np.uint16).view(ml_dtypes.bfloat16)
    del bbuf
    print("# corpus built", flush=True)

    idx = FlatIndex(
        vectors=codes,
        ids=np.arange(N, dtype=np.int64),
        scales=np.full(N, gscale, np.float32),
        num_rows=N,
        config=IndexConfig(dim=D, dtype="int8", int8_scale="global", row_block=4096),
        global_scale=gscale,
    )
    eng = SearchEngine(
        idx, row_block=4096, rescore_vectors=rescore, rescore_factor=4,
        use_pallas=True,
    )
    qd = gen(kq, rows=B)
    eng.search_vectors(qd, k=K)
    print("# engine warm (3.1 GB resident)", flush=True)

    lat: list[tuple[float, float]] = []
    stop = threading.Event()

    def hammer():
        while not stop.is_set():
            t0 = time.monotonic()
            eng.search_vectors_async(qd, k=K)()
            lat.append((time.monotonic(), time.monotonic() - t0))

    th = threading.Thread(target=hammer)
    th.start()
    time.sleep(2)

    windows = {}

    def window(tag, fn):
        t0 = time.monotonic()
        fn()
        t1 = time.monotonic()
        w = [l for t, l in lat if t0 <= t <= t1 + 0.05]
        sw = sorted(w, reverse=True)[:4]
        windows[tag] = {
            "window_s": round(t1 - t0, 2),
            "queries": len(w),
            "p50_ms": round(1e3 * float(np.median(w)), 1) if w else None,
            "worst_ms": [round(1e3 * v, 1) for v in sw],
        }
        print(f"# {tag}: {windows[tag]}", flush=True)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def dus(b, c, i):
        return jax.lax.dynamic_update_slice(b, c, (i, 0))

    ROWS8 = (8 << 20) // (D)          # int8: 8 MiB of rows
    ROWS8B = (8 << 20) // (2 * D)     # bf16

    def full_upload(rows, pace_s):
        # int8 1 GB + bf16 2 GB, full chunk stream, like compact's ctor
        bi = jnp.zeros((rows, D), jnp.int8)
        jax.block_until_ready(bi)
        for i in range(0, rows, ROWS8):
            j = min(i, rows - ROWS8)
            c = jnp.asarray(np.ascontiguousarray(codes[j % N : j % N + ROWS8]))
            bi = dus(bi, c, jnp.int32(j))
            jax.block_until_ready(bi)
            if pace_s:
                time.sleep(pace_s)
        bb = jnp.zeros((rows, D), jnp.bfloat16)
        jax.block_until_ready(bb)
        for i in range(0, rows, ROWS8B):
            j = min(i, rows - ROWS8B)
            c = jnp.asarray(
                np.ascontiguousarray(rescore[j % N : j % N + ROWS8B])
            )
            bb = dus(bb, c, jnp.int32(j))
            jax.block_until_ready(bb)
            if pace_s:
                time.sleep(pace_s)
        del bi, bb

    window("full_upload_unpaced", lambda: full_upload(1_060_864, 0.0))
    window("full_upload_paced_60ms", lambda: full_upload(1_069_056, 0.06))

    stop.set()
    th.join(timeout=30)
    print(json.dumps({"metric": "upload_stall_probe", "windows": windows}))


if __name__ == "__main__":
    main()
