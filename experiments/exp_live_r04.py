"""Round-4 live-update bench (real TPU, 1M x 1024 headline config):
non-blocking compaction. compact() now builds the folded index, device
uploads, and warm compiles OFF the live lock and swaps in sub-second
time; this bench drives CONTINUOUS queries during compact() and records
the worst query latency observed (stall_ms) alongside compact_s.

VERDICT r3 item 1 target: stall_ms < 1,000 (round 3: the whole
compact_s=70.41 was a stop-the-world stall). Writes LIVE_BENCH_r04.json.
"""

import json
import threading
import time

import numpy as np


def _log(msg):
    print(f"# [{time.time() - T0:7.1f}s] {msg}", flush=True)


T0 = time.time()


def stall_fields(during: list) -> dict:
    """Worst-query fields with transport-retry attribution: the axon
    tunnel exhibits a FIXED ~10.02 s RPC timeout-retry under sustained
    load on this 1-vCPU host (exp_upload_stall.py / exp_compile_stall.py
    / exp_alloc_stall.py: the same 10,023-10,057 ms latency regardless
    of what the client is doing — compiles and allocations ruled out,
    it also fires during plain paced uploads). Queries caught behind one
    retry are reported separately from engine-caused stalls."""
    lat_ms = [1000.0 * x for x in during]
    transport = [x for x in lat_ms if 9000.0 <= x <= 11000.0]
    rest = [x for x in lat_ms if not (9000.0 <= x <= 11000.0)]
    return {
        "stall_ms": round(max(lat_ms), 1),
        "stall_ms_ex_transport": round(max(rest), 1) if rest else 0.0,
        "transport_timeout_events": len(transport),
        "query_p50_ms_during_compact": (
            round(float(np.median(lat_ms)), 1) if lat_ms else None
        ),
    }


def timed_pipelined(engine, qd, iters=30, rounds=3, k=10):
    fin = engine.search_vectors_async(qd, k=k)
    fin()
    best = float("inf")
    for _ in range(rounds):
        t0 = time.time()
        for _ in range(iters - 1):
            engine.search_vectors_async(qd, k=k)
        engine.search_vectors_async(qd, k=k)()
        best = min(best, (time.time() - t0) / iters)
    return best


def main():
    import functools

    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from theoremsearch_tpu.core import IndexConfig
    from theoremsearch_tpu.index import FlatIndex
    from theoremsearch_tpu.search import SearchEngine

    N, D, B, K = 1_048_576, 1024, 512, 10
    RB = 4096
    key = jax.random.PRNGKey(0)
    kc, kq, kn = jax.random.split(key, 3)

    _log(f"building corpus N={N} D={D} (chunked on device)")
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
    assert eng._speed_ok
    qd = gen(kq, rows=B)
    out = {"corpus": N, "dim": D, "batch": B, "k": K}

    _log("phase 1: baseline speed path")
    dt = timed_pipelined(eng, qd, k=K)
    out["baseline"] = {"ms": round(dt * 1e3, 2), "qps": round(B / dt, 1)}
    _log(f"baseline {dt*1e3:.2f} ms -> {B/dt:,.0f} QPS")

    _log("phase 2: add 10k live docs")
    M = 10_240
    new = np.asarray(gen(kn, rows=M))
    t0 = time.time()
    ids = eng.add_documents(new, normalize=False)
    add_s = time.time() - t0
    s, i = eng.search_vectors(jnp.asarray(new[:8]), k=1)
    assert list(i[:, 0]) == list(ids[:8]), "added docs must be their own top-1"
    dt = timed_pipelined(eng, qd, k=K)
    out["with_delta_10k"] = {
        "ms": round(dt * 1e3, 2),
        "qps": round(B / dt, 1),
        "add_s": round(add_s, 2),
        "overhead_vs_baseline_pct": round(
            100 * (dt * 1e3 / out["baseline"]["ms"] - 1), 1
        ),
    }
    _log(f"with 10k delta: {dt*1e3:.2f} ms (+"
         f"{out['with_delta_10k']['overhead_vs_baseline_pct']}%)")

    _log("phase 3: compact UNDER CONTINUOUS QUERY LOAD (stall measurement)")
    lat: list[float] = []
    errs: list[Exception] = []
    stop = threading.Event()
    started = threading.Event()

    def hammer():
        # synchronous per-batch latency: dispatch + finalize each cycle
        # so a serving stall shows up as one long cycle
        while not stop.is_set():
            t0 = time.monotonic()
            try:
                fin = eng.search_vectors_async(qd, k=K)
                fin()
            except Exception as e:  # noqa: BLE001
                errs.append(e)
                return
            lat.append(time.monotonic() - t0)
            started.set()

    th = threading.Thread(target=hammer)
    th.start()
    started.wait(timeout=120)
    time.sleep(2)  # steady-state sample before compact begins
    n_before = len(lat)
    t0 = time.time()
    folded = eng.compact()
    compact_s = time.time() - t0
    time.sleep(2)  # steady-state sample after
    stop.set()
    th.join(timeout=60)
    assert not errs, errs
    assert folded == M and eng._speed_ok and eng.n_valid == N + M
    s, i = eng.search_vectors(jnp.asarray(new[:8]), k=1)
    assert list(i[:, 0]) == list(ids[:8]), "folded docs must stay top-1"
    during = lat[max(n_before - 1, 0):]
    stall_ms = 1000.0 * max(during)
    p50_during = 1000.0 * float(np.median(during))
    dt = timed_pipelined(eng, qd, k=K)
    out["after_compact"] = {
        "ms": round(dt * 1e3, 2),
        "qps": round(B / dt, 1),
        "compact_s": round(compact_s, 2),
        "rows": eng.n_valid,
        **stall_fields(during),
        "queries_completed_during_compact": len(during),
    }
    _log(f"compact {compact_s:.1f}s with {len(during)} queries completing "
         f"during it; worst query {stall_ms:.0f} ms (p50 {p50_during:.0f} ms); "
         f"steady state after: {dt*1e3:.2f} ms")

    _log("phase 4: 1k deletes -> over-fetch drop path")
    victims = list(range(0, 100_000, 100))
    assert eng.delete_documents(victims) == len(victims)
    s, i = eng.search_vectors(jnp.asarray(np.asarray(rescore[:4], np.float32)), k=K)
    flat = set(int(x) for x in i.flatten())
    assert not (flat & set(victims[:4])), "tombstoned docs must not return"
    dt = timed_pipelined(eng, qd, k=K)
    out["with_tombstones_1k"] = {
        "ms": round(dt * 1e3, 2),
        "qps": round(B / dt, 1),
        "overhead_vs_baseline_pct": round(
            100 * (dt * 1e3 / out["baseline"]["ms"] - 1), 1
        ),
    }
    _log(f"with tombstones: {dt*1e3:.2f} ms")

    _log("phase 5: reclaim compact under load (drop 1k tombstones, renumber)")
    lat2: list[float] = []
    stop2 = threading.Event()

    def hammer2():
        while not stop2.is_set():
            t0 = time.monotonic()
            try:
                eng.search_vectors_async(qd, k=K)()
            except Exception as e:  # noqa: BLE001
                errs.append(e)
                return
            lat2.append(time.monotonic() - t0)

    th2 = threading.Thread(target=hammer2)
    th2.start()
    time.sleep(2)
    n_before2 = len(lat2)
    t0 = time.time()
    eng.compact(reclaim=True)
    reclaim_s = time.time() - t0
    time.sleep(2)
    stop2.set()
    th2.join(timeout=60)
    assert not errs, errs
    assert eng.n_valid == N + M - len(victims) and eng._tombstone is None
    mp = eng.last_id_map
    s, i = eng.search_vectors(jnp.asarray(new[:8]), k=1)
    assert list(i[:, 0]) == [int(mp[x]) for x in ids[:8]], "reclaim id remap"
    during2 = lat2[max(n_before2 - 1, 0):]
    dt = timed_pipelined(eng, qd, k=K)
    out["after_reclaim"] = {
        "ms": round(dt * 1e3, 2),
        "qps": round(B / dt, 1),
        "reclaim_s": round(reclaim_s, 2),
        "rows": eng.n_valid,
        **stall_fields(during2),
        "vs_baseline_pct": round(100 * (dt * 1e3 / out["baseline"]["ms"] - 1), 1),
    }
    _log(f"reclaim {reclaim_s:.1f}s, worst query {out['after_reclaim']['stall_ms']:.0f} ms; "
         f"reclaimed steady state {dt*1e3:.2f} ms (baseline {out['baseline']['ms']} ms)")

    out["metric"] = "live_updates_1M_nonblocking"
    out["hardware"] = "1x TPU v5e (axon tunnel)"
    with open("LIVE_BENCH_r04.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
