"""Live-update cost on the production path (real TPU, 1M x 1024 headline
config): what do the delta merge, tombstones, and compaction cost?

Phases: baseline speed path -> +10k delta docs -> compact -> 1k deletes
(tombstones cost an adaptively-sized k+margin over-fetch + host drop on
the fast scan; light deletes pick margin 8, whose program does the same
device work as the plain scan). Correctness asserts at
each step. Writes LIVE_BENCH_r03.json.
"""

import json
import time

import numpy as np


def _log(msg):
    print(f"# [{time.time() - T0:7.1f}s] {msg}", flush=True)


T0 = time.time()


def timed_pipelined(engine, qd, iters=30, rounds=3, k=10):
    """Device-side throughput: async-dispatch `iters` batches, finalize
    only the last (bench.py's pattern — per-batch finalize would measure
    the ~30 ms tunnel round trip, which the serving scheduler hides with
    its resolver pool, not the scan). Host merge cost of the delta is
    negligible at B=512 (argsort of (B, 2k))."""
    fin = engine.search_vectors_async(qd, k=k)
    fin()  # compile + warm every program this path needs
    best = float("inf")
    for _ in range(rounds):
        t0 = time.time()
        for _ in range(iters - 1):
            engine.search_vectors_async(qd, k=k)
        engine.search_vectors_async(qd, k=k)()
        best = min(best, (time.time() - t0) / iters)
    return best


def main():
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
    import functools

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
    _log(f"with 10k delta: {dt*1e3:.2f} ms -> {B/dt:,.0f} QPS "
         f"(+{out['with_delta_10k']['overhead_vs_baseline_pct']}%)")

    _log("phase 3: compact")
    t0 = time.time()
    folded = eng.compact()
    compact_s = time.time() - t0
    assert folded == M and eng._speed_ok and eng.n_valid == N + M
    s, i = eng.search_vectors(jnp.asarray(new[:8]), k=1)
    assert list(i[:, 0]) == list(ids[:8]), "folded docs must stay top-1"
    dt = timed_pipelined(eng, qd, k=K)
    out["after_compact"] = {
        "ms": round(dt * 1e3, 2),
        "qps": round(B / dt, 1),
        "compact_s": round(compact_s, 2),
        "rows": eng.n_valid,
    }
    _log(f"after compact ({compact_s:.1f}s): {dt*1e3:.2f} ms -> {B/dt:,.0f} QPS")

    _log("phase 4: 1k deletes -> over-fetch drop path (adaptive margin on the fast scan)")
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
    _log(f"with tombstones: {dt*1e3:.2f} ms -> {B/dt:,.0f} QPS")

    out["metric"] = "live_updates_1M"
    out["hardware"] = "1x TPU v5e (axon tunnel)"
    with open("LIVE_BENCH_r03.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
