"""Round-4 serving p99 tail diagnosis (VERDICT r3 item 2).

SERVE bench stage traces attribute the c128 tail entirely to queue_ms:
~once per 10 s window a dispatched batch's oldest request aged ~280-390
ms in the scheduler queue while encode/scan/sync stayed nominal, and the
mixed-filter levels (whose clients resolve in staggered waves rather
than one big batch) show NO tail. Host-side suspects on this 1-vCPU VM:

  (a) a stop-the-world CPython GC pass over the session's large object
      graph (engine + encoder params + scheduler rings),
  (b) GIL/scheduler convoy: 128 closed-loop client threads all wake on
      future resolution and starve the dispatch thread for ~n_threads x
      switch-interval,
  (c) a periodic tunnel/process freeze unrelated to Python.

Discriminators: a WATCHDOG thread sampling every 2 ms records global
freezes (any gap > 50 ms means nothing ran — GC or CPU theft); gc
callbacks time every collection; windows toggle gc.disable()/
gc.freeze() and sys.setswitchinterval. submit() with pre-encoded
VECTORS removes the encoder entirely, so any surviving spike belongs
to the scheduler/client side.

Run: bash tools/tpu_run.sh experiments/exp_serve_tail.py
"""

import gc
import json
import sys
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
    from theoremsearch_tpu.serve.scheduler import BatchScheduler

    N, D, B = 262_144, 1024, 512
    key = jax.random.PRNGKey(0)
    kc, kq = jax.random.split(key)

    @functools.partial(jax.jit, static_argnames=("rows",))
    def gen(k, *, rows):
        x = jax.random.normal(k, (rows, D), jnp.float32)
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    x = gen(kc, rows=N)
    gscale = float(jnp.max(jnp.abs(x))) / 127.0
    codes = np.asarray(
        jnp.clip(jnp.round(x / gscale), -127, 127).astype(jnp.int8)
    )
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
    assert eng._speed_ok
    qs = np.asarray(gen(kq, rows=B), np.float32)
    for b in (8, 16, 32, 64, 128, 256, 512):
        eng.search_vectors(qs[:b], k=10)

    # ---- instrumentation ----
    gc_events: list[tuple[float, float]] = []   # (t_start, dur_s) per pass

    _gc_t0 = [0.0]

    def _gc_cb(phase, info):
        if phase == "start":
            _gc_t0[0] = time.monotonic()
        else:
            gc_events.append((_gc_t0[0], time.monotonic() - _gc_t0[0]))

    gc.callbacks.append(_gc_cb)

    freezes: list[tuple[float, float]] = []     # (t, gap_s) watchdog gaps
    wd_stop = threading.Event()

    def watchdog():
        last = time.monotonic()
        while not wd_stop.is_set():
            time.sleep(0.002)
            now = time.monotonic()
            if now - last > 0.050:
                freezes.append((last, now - last))
            last = now

    wd = threading.Thread(target=watchdog, daemon=True)
    wd.start()

    def run_window(tag, level=128, run_s=12.0, text=False, sched_kw=None):
        sched = BatchScheduler(eng, max_batch=512, max_wait_ms=8.0,
                               **(sched_kw or {}))
        lat: list[float] = []
        lock = threading.Lock()
        t_end = time.time() + run_s
        gc_events.clear()
        freezes.clear()
        sched.reset_traces()

        def client(cid):
            rng = np.random.default_rng(cid)
            mine = []
            while time.time() < t_end:
                q = qs[rng.integers(0, B)]
                t0 = time.time()
                sched.submit(q, k=10).result(timeout=60)
                mine.append(time.time() - t0)
            with lock:
                lat.extend(mine)

        threads = [threading.Thread(target=client, args=(c,)) for c in range(level)]
        t0 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        el = time.time() - t0
        st = sched.stats()
        sched.shutdown()
        arr = np.asarray(lat)
        q_p99 = st.get("stages_ms", {}).get("queue_ms", {}).get("p99")
        row = {
            "qps": round(len(arr) / el, 1),
            "p50_ms": round(float(np.percentile(arr, 50)) * 1e3, 1),
            "p99_ms": round(float(np.percentile(arr, 99)) * 1e3, 1),
            "queue_p99_ms": q_p99,
            "gc_passes": len(gc_events),
            "gc_worst_ms": round(1000 * max((d for _, d in gc_events), default=0), 1),
            "gc_total_ms": round(1000 * sum(d for _, d in gc_events), 1),
            "watchdog_freezes": len(freezes),
            "freeze_worst_ms": round(1000 * max((d for _, d in freezes), default=0), 1),
        }
        print(f"# {tag}: {json.dumps(row)}", flush=True)
        return row

    out = {}
    out["baseline"] = run_window("baseline (gc on, switch 5ms)")
    gc.disable()
    out["gc_off"] = run_window("gc disabled")
    gc.enable()
    gc.freeze()  # move the permanent object graph out of gen scanning
    out["gc_freeze"] = run_window("gc.freeze()")
    sys.setswitchinterval(0.001)
    out["switch_1ms"] = run_window("gc.freeze + switch 1ms")
    gc.disable()
    out["all_off"] = run_window("gc off + freeze + switch 1ms")
    gc.enable()
    sys.setswitchinterval(0.005)

    wd_stop.set()
    out["metric"] = "serve_tail_diag_262k"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
