"""Round-5 live-update bench (real TPU, 1M x 1024 headline config):
non-blocking compaction with PHASE-ATTRIBUTED stalls and the
compact/reclaim transport-tax split (VERDICT r4 items 4 + 7).

Upgrades over exp_live_r04.py:
- every query records its completion timestamp, so the worst queries
  are attributed to the compact phase they overlapped (build / warm /
  swap / outside) instead of being one anonymous max;
- engine.last_compact_stats now splits the build into
  {bytes_h2d, upload_s, device_fold_s, host_build_s} plus a
  swap_detail breakdown — the artifact records what the tunnel costs
  vs what the algorithm costs (floor_estimate_s = what a
  locally-attached chip would pay);
- --local runs the compact phases on host CPU (no tunnel, no load) to
  independently bound the algorithmic floor.

Writes LIVE_BENCH_r05.json (or LIVE_BENCH_r05_local.json with --local).
"""

import json
import sys
import threading
import time

import numpy as np


def _log(msg):
    print(f"# [{time.time() - T0:7.1f}s] {msg}", flush=True)


T0 = time.time()


def stall_fields(during: list) -> dict:
    """Worst-query fields with transport-retry attribution (the axon
    tunnel's FIXED ~10.02 s RPC timeout-retry; see exp_live_r04.py)."""
    lat_ms = [1000.0 * x for _t, x in during]
    transport = [x for x in lat_ms if 9000.0 <= x <= 11000.0]
    rest = [x for x in lat_ms if not (9000.0 <= x <= 11000.0)]
    return {
        "stall_ms": round(max(lat_ms), 1) if lat_ms else 0.0,
        "stall_ms_ex_transport": round(max(rest), 1) if rest else 0.0,
        "transport_timeout_events": len(transport),
        "query_p50_ms_during_compact": (
            round(float(np.median(lat_ms)), 1) if lat_ms else None
        ),
    }


def attribute_worst(during: list, stats: dict, n_worst=5) -> list:
    """Attribute the worst queries to the compact phase their interval
    overlapped: build / warm / swap / outside. `during` holds
    (t_end_monotonic, latency_s); stats holds monotonic t0 + phase
    durations from engine.last_compact_stats."""
    t0 = stats["t0"]
    t_build0 = t0 + stats["snapshot_s"]
    t_warm0 = t_build0 + stats["build_s"]
    t_swap0 = t_warm0 + stats["warm_s"]
    t_swap1 = t_swap0 + stats["swap_s"]
    out = []
    for t_end, lat in sorted(during, key=lambda x: -x[1])[:n_worst]:
        t_start = t_end - lat
        phases = []
        for name, lo, hi in (
            ("build", t_build0, t_warm0),
            ("warm", t_warm0, t_swap0),
            ("swap", t_swap0, t_swap1),
        ):
            if t_start < hi and t_end > lo:
                phases.append(name)
        out.append(
            {"ms": round(1000.0 * lat, 1), "phases": phases or ["outside"]}
        )
    return out


def compact_stats_public(stats: dict) -> dict:
    """The transport-tax split for the artifact (drop the raw t0)."""
    bytes_h2d = stats.get("bytes_h2d", 0)
    upload_s = stats.get("upload_s", 0.0)
    floor = round(
        stats.get("host_build_s", 0.0)
        + stats.get("device_fold_s", 0.0)
        + stats.get("swap_s", 0.0),
        3,
    )
    return {
        "bytes_h2d": bytes_h2d,
        "upload_s": upload_s,
        "tunnel_MBps": (
            round(bytes_h2d / upload_s / 1e6, 1) if upload_s > 0.05 else None
        ),
        "host_build_s": stats.get("host_build_s"),
        "device_fold_s": stats.get("device_fold_s"),
        "warm_s": round(stats.get("warm_s", 0.0), 2),
        "swap_s": round(stats.get("swap_s", 0.0), 4),
        "swap_detail_ms": stats.get("swap_detail", {}),
        "floor_estimate_s": floor,
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


def main(local: bool = False):
    import functools

    import jax

    if local:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import ml_dtypes

    from theoremsearch_tpu.core import IndexConfig
    from theoremsearch_tpu.index import FlatIndex
    from theoremsearch_tpu.search import SearchEngine

    N, D, B, K = 1_048_576, 1024, 512, 10
    RB = 4096
    key = jax.random.PRNGKey(0)
    kc, kq, kn = jax.random.split(key, 3)

    _log(f"building corpus N={N} D={D} (chunked on device), local={local}")
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
        _log(f"  corpus chunk {c + 1}/{len(keys)}")
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
        idx, row_block=RB, rescore_vectors=rescore, rescore_factor=4,
        # --local: XLA path (interpret-Pallas scans at 1M would dominate
        # the wall clock; the compact fold being measured is identical)
        use_pallas=not local,
    )
    if not local:
        assert eng._speed_ok
    qd = gen(kq, rows=B)
    out = {"corpus": N, "dim": D, "batch": B, "k": K, "local": local}

    M = 10_240
    new = np.asarray(gen(kn, rows=M))

    if local:
        # floor mode: time the compact phases with NO query load and NO
        # tunnel — the algorithmic cost a locally-attached chip pays
        _log("LOCAL floor: add 10k, compact, delete 1k, reclaim")
        t0 = time.time()
        ids = eng.add_documents(new, normalize=False)
        out["add_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        assert eng.compact(warm_batches=[8]) == M
        out["compact_s"] = round(time.time() - t0, 2)
        out["compact_stats"] = compact_stats_public(eng.last_compact_stats)
        victims = list(range(0, 100_000, 100))
        assert eng.delete_documents(victims) == len(victims)
        t0 = time.time()
        eng.compact(reclaim=True, warm_batches=[8])
        out["reclaim_s"] = round(time.time() - t0, 2)
        out["reclaim_stats"] = compact_stats_public(eng.last_compact_stats)
        mp = eng.last_id_map
        s, i = eng.search_vectors(jnp.asarray(new[:4]), k=1)
        assert list(i[:, 0]) == [int(mp[x]) for x in ids[:4]]
        out["metric"] = "live_updates_1M_local_floor"
        out["hardware"] = "host CPU (no tunnel): algorithmic floor"
        with open("LIVE_BENCH_r05_local.json", "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
        return

    _log("phase 1: baseline speed path")
    dt = timed_pipelined(eng, qd, k=K)
    out["baseline"] = {"ms": round(dt * 1e3, 2), "qps": round(B / dt, 1)}
    _log(f"baseline {dt*1e3:.2f} ms -> {B/dt:,.0f} QPS")

    _log("phase 2: add 10k live docs")
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

    def run_compact_under_load(tag, **compact_kw):
        lat: list = []
        errs: list[Exception] = []
        stop = threading.Event()
        started = threading.Event()

        def hammer():
            while not stop.is_set():
                t0 = time.monotonic()
                try:
                    eng.search_vectors_async(qd, k=K)()
                except Exception as e:  # noqa: BLE001
                    errs.append(e)
                    return
                t1 = time.monotonic()
                lat.append((t1, t1 - t0))
                started.set()

        th = threading.Thread(target=hammer)
        th.start()
        started.wait(timeout=180)
        time.sleep(2)
        n_before = len(lat)
        t0 = time.time()
        folded = eng.compact(**compact_kw)
        compact_s = time.time() - t0
        time.sleep(2)
        stop.set()
        th.join(timeout=60)
        assert not errs, errs
        stats = eng.last_compact_stats
        during = lat[max(n_before - 1, 0):]
        rec = {
            "compact_s": round(compact_s, 2),
            "rows": eng.n_valid,
            **stall_fields(during),
            "queries_completed_during_compact": len(during),
            "worst_queries": attribute_worst(during, stats),
            "compact_stats": compact_stats_public(stats),
        }
        _log(f"{tag}: {compact_s:.1f}s; worst {rec['stall_ms']:.0f} ms "
             f"(ex-transport {rec['stall_ms_ex_transport']:.0f} ms); "
             f"worst attribution {rec['worst_queries'][:3]}; "
             f"split {rec['compact_stats']}")
        return folded, rec

    _log("phase 3: compact UNDER CONTINUOUS QUERY LOAD")
    folded, rec = run_compact_under_load("compact")
    assert folded == M and eng._speed_ok and eng.n_valid == N + M
    s, i = eng.search_vectors(jnp.asarray(new[:8]), k=1)
    assert list(i[:, 0]) == list(ids[:8]), "folded docs must stay top-1"
    dt = timed_pipelined(eng, qd, k=K)
    out["after_compact"] = {
        "ms": round(dt * 1e3, 2), "qps": round(B / dt, 1), **rec,
    }

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
    _, rec2 = run_compact_under_load("reclaim", reclaim=True)
    assert eng.n_valid == N + M - len(victims) and eng._tombstone is None
    mp = eng.last_id_map
    s, i = eng.search_vectors(jnp.asarray(new[:8]), k=1)
    assert list(i[:, 0]) == [int(mp[x]) for x in ids[:8]], "reclaim id remap"
    dt = timed_pipelined(eng, qd, k=K)
    out["after_reclaim"] = {
        "ms": round(dt * 1e3, 2),
        "qps": round(B / dt, 1),
        "reclaim_s": rec2.pop("compact_s"),
        **rec2,
        "vs_baseline_pct": round(100 * (dt * 1e3 / out["baseline"]["ms"] - 1), 1),
    }
    _log(f"reclaim done; steady state {dt*1e3:.2f} ms "
         f"(baseline {out['baseline']['ms']} ms)")

    out["metric"] = "live_updates_1M_nonblocking"
    out["hardware"] = "1x TPU v5e (axon tunnel)"
    with open("LIVE_BENCH_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main(local="--local" in sys.argv)
