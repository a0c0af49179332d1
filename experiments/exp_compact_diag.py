"""Diagnose the ~40 s query stall during non-blocking compact() on chip:
rerun LIVE phase 3 only, with (a) chunked device uploads active,
(b) per-query absolute timestamps, and (c) compact()'s phase timings
(snapshot/build/warm/swap) — so the stall aligns with a phase.
"""

import json
import os
import threading
import time

import numpy as np


def main():
    import functools

    import jax
    import jax.numpy as jnp
    import ml_dtypes

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from theoremsearch_tpu.core import IndexConfig
    from theoremsearch_tpu.index import FlatIndex
    from theoremsearch_tpu.search import SearchEngine
    from theoremsearch_tpu.search import engine as engine_mod

    engine_mod._TRACE_EVENTS = []   # attribute stalls to transfers/compiles

    N, D, B, K = 1_048_576, 1024, 512, 10
    RB = 4096
    key = jax.random.PRNGKey(0)
    kc, kq, kn = jax.random.split(key, 3)
    t_abs0 = time.monotonic()

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

    cbuf = jnp.zeros((N, D), jnp.int8)
    bbuf = jnp.zeros((N, D), jnp.bfloat16)
    for c, k in enumerate(keys):
        cbuf, bbuf = pack(cbuf, bbuf, gen(k, rows=CHUNK), jnp.int32(c * CHUNK))
    codes = np.asarray(cbuf)
    del cbuf
    rescore = np.asarray(bbuf).view(np.uint16).view(ml_dtypes.bfloat16)
    del bbuf
    print(f"# corpus built at +{time.monotonic()-t_abs0:.0f}s", flush=True)

    idx = FlatIndex(
        vectors=codes,
        ids=np.arange(N, dtype=np.int64),
        scales=np.full(N, gscale, np.float32),
        num_rows=N,
        config=IndexConfig(dim=D, dtype="int8", int8_scale="global", row_block=RB),
        global_scale=gscale,
    )
    eng = SearchEngine(
        idx, row_block=RB, rescore_vectors=rescore, rescore_factor=4, use_pallas=True
    )
    qd = gen(kq, rows=B)
    eng.search_vectors(qd, k=K)  # warm
    M = 10_240
    new = np.asarray(gen(kn, rows=M))
    eng.add_documents(new, normalize=False)
    eng.search_vectors(jnp.asarray(new[:8]), k=1)  # warm delta merge

    stamps: list[tuple[float, float]] = []   # (t_end, latency_s)
    errs: list[Exception] = []
    stop = threading.Event()

    def hammer():
        while not stop.is_set():
            t0 = time.monotonic()
            try:
                eng.search_vectors_async(qd, k=K)()
            except Exception as e:  # noqa: BLE001
                errs.append(e)
                return
            stamps.append((time.monotonic(), time.monotonic() - t0))

    th = threading.Thread(target=hammer)
    th.start()
    time.sleep(3)
    t_c0 = time.monotonic()
    folded = eng.compact()
    t_c1 = time.monotonic()
    time.sleep(3)
    stop.set()
    th.join(timeout=60)
    assert not errs, errs
    assert folded == M

    st = dict(eng.last_compact_stats)
    st.pop("t0", None)
    # phase boundaries relative to compact start
    b_snap = st["snapshot_s"]
    b_build = b_snap + st["build_s"]
    b_warm = b_build + st["warm_s"]
    print(f"# compact phases: {json.dumps({k: round(v, 2) for k, v in st.items()})}",
          flush=True)
    events = [
        (tag, t0 - t_c0, dur, nb) for tag, t0, dur, nb in engine_mod._TRACE_EVENTS
    ]
    slow_ev = sorted(events, key=lambda e: -e[2])[:12]
    for tag, off, dur, nb in slow_ev:
        print(f"#   event {dur*1e3:8.0f} ms  +{off:7.2f}s  {tag}  "
              f"{nb/2**20:.0f} MiB", flush=True)
    worst = sorted(stamps, key=lambda x: -x[1])[:8]
    for t_end, lat in worst:
        off = t_end - t_c0
        start_off = off - lat
        phase = (
            "pre" if off < 0 else
            "snapshot" if start_off < b_snap else
            "build" if start_off < b_build else
            "warm" if start_off < b_warm else
            "swap/post" if start_off < st["total_s"] else "post"
        )
        # events whose window overlaps this query's
        over = [
            f"{tag}({dur*1e3:.0f}ms@+{eoff:.1f}s)"
            for tag, eoff, dur, nb in events
            if eoff < off and eoff + dur > start_off and dur > 0.2
        ]
        print(f"#   query lat {lat*1e3:8.0f} ms  started at +{start_off:7.2f}s "
              f"ended +{off:7.2f}s  (phase ~{phase})  overlap: "
              f"{', '.join(over[:4]) or '-'}", flush=True)
    during = [lat for t_end, lat in stamps if 0 <= t_end - t_c0 <= st["total_s"]]
    print(json.dumps({
        "metric": "compact_diag",
        "compact_s": round(t_c1 - t_c0, 2),
        "phases": {k: round(v, 2) for k, v in st.items()},
        "queries_during": len(during),
        "stall_ms": round(1000 * max(during), 1) if during else None,
        "p50_during_ms": round(1000 * float(np.median(during)), 1) if during else None,
    }))


if __name__ == "__main__":
    main()
