"""Round-4 stall hunt, part 2 (exp_compile_stall ruled out compiles):
does a LARGE device allocation (the ~1 GB zeros/concat compact() makes)
stall concurrent queries when HBM already holds several GB? Hammer a
1M-row engine (3.1 GB resident like production) while a second thread
allocates/frees ~1 GB buffers, with and without interleaved 8 MiB
chunk-upload churn (the fragmentation pattern compact() produces).
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

    def window(tag, fn, dur=None):
        t0 = time.monotonic()
        fn()
        if dur is not None:
            time.sleep(max(0.0, dur - (time.monotonic() - t0)))
        t1 = time.monotonic()
        w = [l for t, l in lat if t0 <= t <= t1 + 0.05]
        windows[tag] = {
            "window_s": round(t1 - t0, 2),
            "queries": len(w),
            "p50_ms": round(1e3 * float(np.median(w)), 1) if w else None,
            "max_ms": round(1e3 * max(w), 1) if w else None,
        }
        print(f"# {tag}: {windows[tag]}", flush=True)

    window("control_idle", lambda: None, dur=8.0)

    # (a) plain ~1 GB alloc+free x3 (what ctor's zeros does)
    def big_allocs():
        for i in range(3):
            t0 = time.monotonic()
            b = jnp.zeros((1_060_864 + i * 4096, 1024), jnp.int8)
            jax.block_until_ready(b)
            print(f"#   zeros 1GB [{i}] took {time.monotonic()-t0:.2f}s", flush=True)
            del b

    window("big_alloc_free", big_allocs)

    # (b) the full compact-like cycle: alloc 1 GB int8 + 2 GB bf16 dest
    # buffers, chunk-DUS into both with 8 MiB uploads, free — twice
    @functools.partial(jax.jit, donate_argnums=(0,))
    def dus(b, c, i):
        return jax.lax.dynamic_update_slice(b, c, (i, 0))

    def compact_like(rows):
        t0 = time.monotonic()
        bi = jnp.zeros((rows, 1024), jnp.int8)
        jax.block_until_ready(bi)
        print(f"#   zeros int8 took {time.monotonic()-t0:.2f}s", flush=True)
        ci = np.zeros((8192, 1024), np.int8)
        for i in range(0, rows - 8192, 8192 * 16):   # sparse: 1/16 of chunks
            bi = dus(bi, jnp.asarray(ci), jnp.int32(i))
            jax.block_until_ready(bi)
        t0 = time.monotonic()
        bb = jnp.zeros((rows, 1024), jnp.bfloat16)
        jax.block_until_ready(bb)
        print(f"#   zeros bf16 took {time.monotonic()-t0:.2f}s", flush=True)
        cb = np.zeros((4096, 1024), ml_dtypes.bfloat16)
        for i in range(0, rows - 4096, 4096 * 16):
            bb = dus(bb, jnp.asarray(cb), jnp.int32(i))
            jax.block_until_ready(bb)
        del bi, bb

    window("compact_like_1", lambda: compact_like(1_060_864))
    window("compact_like_2", lambda: compact_like(1_069_056))
    window("control_idle2", lambda: None, dur=8.0)

    stop.set()
    th.join(timeout=30)
    alllat = [l for _, l in lat]
    print(json.dumps({
        "metric": "alloc_stall_probe",
        "windows": windows,
        "overall_p50_ms": round(1e3 * float(np.median(alllat)), 1),
        "overall_max_ms": round(1e3 * max(alllat), 1),
    }))


if __name__ == "__main__":
    main()
