"""Discriminate the moving ~10 s serving stall during compact()
(exp_compact_diag round 4): does an UNCACHED remote compile RPC block
concurrently-dispatched query execution, or was it a random tunnel
hiccup? Hammer a small engine with queries while a second thread
(a) idles (control), (b) compiles novel trivial programs (zeros/DUS of
odd shapes the persistent cache has never seen), (c) re-runs the SAME
programs (cache hits). Reports worst query latency per window.
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

    from theoremsearch_tpu.core import IndexConfig
    from theoremsearch_tpu.index import FlatIndex
    from theoremsearch_tpu.search import SearchEngine

    N, D, B, K = 262_144, 1024, 512, 10
    key = jax.random.PRNGKey(0)
    kc, kq = jax.random.split(key)
    x = jax.random.normal(kc, (N, D), jnp.float32)
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    gscale = float(jnp.max(jnp.abs(x))) / 127.0
    codes = np.asarray(jnp.clip(jnp.round(x / gscale), -127, 127).astype(jnp.int8))
    import ml_dtypes

    rescore = np.asarray(x.astype(jnp.bfloat16)).view(np.uint16).view(
        ml_dtypes.bfloat16
    )
    del x
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
    qd = jax.random.normal(kq, (B, D), jnp.float32)
    qd = qd / jnp.linalg.norm(qd, axis=1, keepdims=True)
    eng.search_vectors(qd, k=K)  # warm
    print("# engine warm", flush=True)

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

    # novel shapes: prime-ish row counts the cache has never seen
    seed = int(time.time()) % 100_000
    odd_rows = [1_000_003 + seed, 1_000_033 + seed, 1_000_087 + seed]

    window("control_idle", lambda: None, dur=8.0)

    def compile_zeros():
        for r in odd_rows:
            t0 = time.monotonic()
            b = jnp.zeros((r, 64), jnp.int8)
            jax.block_until_ready(b)
            print(f"#   zeros({r},64) took {time.monotonic()-t0:.2f}s", flush=True)
            del b

    window("novel_zeros_compiles", compile_zeros)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def dus(b, c, i):
        return jax.lax.dynamic_update_slice(b, c, (i, 0))

    bufs = {r: jnp.zeros((r, 64), jnp.int8) for r in odd_rows}
    chunk = jnp.ones((4096, 64), jnp.int8)
    jax.block_until_ready(chunk)

    def compile_dus():
        for r in odd_rows:
            t0 = time.monotonic()
            bufs[r] = dus(bufs[r], chunk, jnp.int32(0))
            jax.block_until_ready(bufs[r])
            print(f"#   dus({r}) took {time.monotonic()-t0:.2f}s", flush=True)

    window("novel_dus_compiles", compile_dus)
    window("cached_rerun", compile_dus)
    window("control_idle2", lambda: None, dur=8.0)

    stop.set()
    th.join(timeout=30)
    alllat = [l for _, l in lat]
    print(json.dumps({
        "metric": "compile_stall_probe",
        "windows": windows,
        "overall_p50_ms": round(1e3 * float(np.median(alllat)), 1),
        "overall_max_ms": round(1e3 * max(alllat), 1),
    }))


if __name__ == "__main__":
    main()
