"""End-to-end serving benchmark on TPU: text -> encoder -> scheduler ->
fused corpus scan -> doc ids (VERDICT r1 item 6).

The headline kernel QPS (bench.py) times the scan alone; this measures
the SYSTEM a user sees — concurrent clients submitting text queries
through the micro-batching BatchScheduler, with the full-size
Qwen3-Embedding-0.6B-class encoder (random-init weights: identical FLOPs
and memory traffic to the real checkpoint, so throughput/latency transfer;
quality numbers obviously don't) in front of the 1M x 1024 int8 speed-path
index (global-scale fused scan + on-device bf16 rescore).

Reports, per concurrency level: sustained QPS, p50/p95/p99 latency, and
the scheduler's realized batch sizes — plus encoder-only and scan-only
stage rates so the system bottleneck is explicit (SURVEY.md §7.4
throughput accounting).

Run: bash tools/tpu_run.sh tools/serve_bench.py | tee /tmp/serve_bench.log
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_T0 = time.time()


def _log(msg: str) -> None:
    print(f"# [{time.time()-_T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


QUERY_WORDS = (
    "bound chromatic number planar graph spectral gap expander random "
    "matrix eigenvalue distribution prime counting zeta zero free region "
    "elliptic curve rank torsion modular form hecke operator sheaf "
    "cohomology vanishing ample divisor ricci flow curvature pinching "
    "sobolev embedding compact operator trace class entropy ergodic "
    "mixing martingale concentration isoperimetric inequality convex body"
).split()


def make_queries(n: int, seed: int = 0) -> list[str]:
    rng = np.random.default_rng(seed)
    return [
        " ".join(rng.choice(QUERY_WORDS, size=rng.integers(6, 13)))
        for _ in range(n)
    ]


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("FORCE_CPU"):  # JAX_PLATFORMS env is overridden by
        jax.config.update("jax_platforms", "cpu")  # the ambient TPU plugin
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from theoremsearch_tpu.core.config import (
        EncoderConfig,
        GemmaEncoderConfig,
        IndexConfig,
    )
    from theoremsearch_tpu.encoder.batching import BatchedEncoder
    from theoremsearch_tpu.index.flat import FlatIndex
    from theoremsearch_tpu.search.engine import SearchEngine
    from theoremsearch_tpu.search.filters import SearchFilters
    from theoremsearch_tpu.search.metadata import CorpusMetadata
    from theoremsearch_tpu.serve.scheduler import BatchScheduler

    on_tpu = jax.default_backend() not in ("cpu",)
    # capacity-serving knobs: SERVE_ROWS scales the corpus (chunked
    # on-device build), SERVE_MODE=residual serves from the 2-bytes/dim
    # two-level index instead of the int8+bf16 copy, SERVE_ENCODER=gemma
    # fronts the scan with the ~300M gemma tower (768-dim index) instead
    # of the 0.6B qwen tower — the fast-serving embedder alias
    MODE = os.environ.get("SERVE_MODE", "bf16")
    ENC_FAMILY = os.environ.get("SERVE_ENCODER", "qwen")
    from theoremsearch_tpu.core.config import BertEncoderConfig

    FAMILIES = {
        "qwen": EncoderConfig,
        "gemma": GemmaEncoderConfig,
        "bert": BertEncoderConfig,
    }
    if ENC_FAMILY not in FAMILIES:
        raise SystemExit(
            f"SERVE_ENCODER={ENC_FAMILY!r}: pick one of {sorted(FAMILIES)}"
        )
    cfg_cls = FAMILIES[ENC_FAMILY]
    if on_tpu:
        N, ROW_BLOCK, MAX_BATCH = 1_048_576, 4096, 512
        N = int(os.environ.get("SERVE_ROWS", str(N)))
        enc_cfg = cfg_cls(max_seq_len=64)
        D = enc_cfg.embedding_dim
        LEVELS = (8, 32, 128, 512)
        RUN_S = float(os.environ.get("SERVE_RUN_S", "10.0"))
    else:  # CPU smoke
        enc_cfg = cfg_cls.tiny()
        N, D, ROW_BLOCK, MAX_BATCH = 32_768, enc_cfg.embedding_dim, 1024, 64
        LEVELS = (4, 16)
        RUN_S = 3.0
    if ENC_FAMILY == "gemma":
        from theoremsearch_tpu.encoder.gemma import init_params
    elif ENC_FAMILY == "bert":
        from theoremsearch_tpu.encoder.bert import init_params
    else:
        from theoremsearch_tpu.encoder.model import init_params

    key = jax.random.PRNGKey(0)
    kq, kc, kp = jax.random.split(key, 3)

    # ---- corpus + index (generated and quantized on device, CHUNKED so
    # the fp32 corpus never materializes — required above ~1M rows) ----
    _log(f"building corpus N={N} D={D} mode={MODE}")
    import functools

    CHUNK = min(N, 262_144)
    n_chunks = max(1, N // CHUNK)
    keys = jax.random.split(kc, n_chunks)

    @functools.partial(jax.jit, static_argnames=("rows",))
    def gen_chunk(k, *, rows):
        x = jax.random.normal(k, (rows, D), jnp.float32)
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    absmax = 0.0
    for c in range(n_chunks):
        absmax = max(absmax, float(jnp.max(jnp.abs(gen_chunk(keys[c], rows=CHUNK)))))
    gscale = absmax / 127.0

    @functools.partial(jax.jit, donate_argnums=(0,))
    def pack_codes(buf, x, start):
        cg = jnp.clip(jnp.round(x / gscale), -127, 127).astype(jnp.int8)
        return jax.lax.dynamic_update_slice(buf, cg, (start, 0))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def pack_bf16(buf, x, start):
        return jax.lax.dynamic_update_slice(buf, x.astype(jnp.bfloat16), (start, 0))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def pack_res(rbuf, sbuf, x, start):
        cg = jnp.clip(jnp.round(x / gscale), -127, 127).astype(jnp.int8)
        resid = x - gscale * cg.astype(jnp.float32)
        am = jnp.max(jnp.abs(resid), axis=1)
        sc = jnp.where(am > 0, am / 127.0, 1.0).astype(jnp.float32)
        cr = jnp.clip(jnp.round(resid / sc[:, None]), -127, 127).astype(jnp.int8)
        return (
            jax.lax.dynamic_update_slice(rbuf, cr, (start, 0)),
            jax.lax.dynamic_update_slice(sbuf, sc, (start,)),
        )

    import ml_dtypes

    codes_d = jnp.zeros((N, D), jnp.int8)
    if MODE == "residual":
        res_d = jnp.zeros((N, D), jnp.int8)
        rsc_d = jnp.zeros((N,), jnp.float32)
    else:
        bf16_d = jnp.zeros((N, D), jnp.bfloat16)
    for c in range(n_chunks):
        x = gen_chunk(keys[c], rows=CHUNK)
        codes_d = pack_codes(codes_d, x, jnp.int32(c * CHUNK))
        if MODE == "residual":
            res_d, rsc_d = pack_res(res_d, rsc_d, x, jnp.int32(c * CHUNK))
        else:
            bf16_d = pack_bf16(bf16_d, x, jnp.int32(c * CHUNK))
    codes = np.asarray(codes_d)
    del codes_d
    rescore = rescore_residual = None
    if MODE == "residual":
        rescore_residual = (np.asarray(res_d), np.asarray(rsc_d))
        del res_d, rsc_d
    else:
        rescore = np.asarray(bf16_d).view(np.uint16).view(ml_dtypes.bfloat16)
        del bf16_d

    idx = FlatIndex(
        vectors=codes,
        ids=np.arange(N, dtype=np.int64),
        scales=np.full(N, gscale, np.float32),
        num_rows=N,
        config=IndexConfig(
            dim=D, dtype="int8", int8_scale="global", row_block=ROW_BLOCK,
            residual=MODE == "residual",
        ),
        global_scale=gscale,
        rescore_residual=rescore_residual,
    )

    # metadata for the filtered-traffic mix: years in CONTIGUOUS id
    # blocks (chronological ingest order — a year_range filter is then
    # a contiguous doc-id mask, the adversarial case for the masked
    # kernel's selection), categories striped, journal status alternating
    _log("building 1M-row metadata (filtered traffic)")
    CATS = [f"math.{c}" for c in (
        "AG AT AP CA CO CT DG DS FA GM GN GR GT HO KT LO MG NT OA PR RA RT"
    ).split()]
    years_block = max(1, N // 30)
    meta = CorpusMetadata(
        paper_id=[f"p{i}" for i in range(N)],
        paper_title=["T"] * N,
        authors=[()] * N,
        link=["https://arxiv.org/abs/x"] * N,
        year=(1995 + np.arange(N) // years_block).astype(np.int32),
        primary_category=[CATS[i % len(CATS)] for i in range(N)],
        journal_ref=[None, "J. Math."] * (N // 2),
        citations=np.arange(N, dtype=np.int64) % 1000,
    )
    engine = SearchEngine(
        idx, meta=meta, row_block=ROW_BLOCK, rescore_vectors=rescore,
        rescore_factor=4, use_pallas=on_tpu,
    )  # residual mode: engine auto-adopts idx.rescore_residual
    assert not on_tpu or engine._speed_ok, "speed path must be active on TPU"
    _log("index on device; speed path active" if engine._speed_ok else "index on device")

    # ---- encoder: full 0.6B-class config, random init ----
    _log(f"initializing encoder ({enc_cfg.num_layers} layers, d={enc_cfg.hidden_size})")
    params = init_params(enc_cfg, kp)
    # SERVE_QUANT=int8: w8a8 projection matmuls (qwen family only)
    QUANT = os.environ.get("SERVE_QUANT", "none")
    encoder = BatchedEncoder(
        params, enc_cfg, batch_size=MAX_BATCH,
        buckets=(16, 32, 64) if on_tpu else (16,),
        quant=QUANT,
    )
    if QUANT != "none":
        _log(f"encoder quant mode: {QUANT}")

    queries = make_queries(4096)

    # ---- stage rates ----
    warm = encoder.encode(queries[:MAX_BATCH])
    t0 = time.time()
    for i in range(3):
        emb = encoder.encode(queries[i * MAX_BATCH : (i + 1) * MAX_BATCH])
    enc_qps = 3 * MAX_BATCH / (time.time() - t0)
    _log(f"encoder-only (per-call sync): {enc_qps:,.0f} QPS at batch {MAX_BATCH}")
    # streaming form: ONE encode() over the whole list — sub-batches
    # pipeline inside encode() (dispatch i+1 before pulling i), the shape
    # the document-embedding pipeline sees (pipeline.embed_missing_slogans)
    t0 = time.time()
    _ = encoder.encode(queries)
    enc_stream_qps = len(queries) / (time.time() - t0)
    _log(f"encoder-only (streamed {len(queries)}): {enc_stream_qps:,.0f} QPS")

    s, i = engine.search_vectors(warm, k=10)  # warm the scan at MAX_BATCH
    t0 = time.time()
    for _ in range(5):
        s, i = engine.search_vectors(emb, k=10)
    scan_qps = 5 * MAX_BATCH / (time.time() - t0)
    _log(f"scan-only (sync per batch): {scan_qps:,.0f} QPS at batch {MAX_BATCH}")

    # pipelined scan: overlap batch k's host sync with batch k+1's scan
    # (how the scheduler's resolver actually consumes the engine)
    fins = []
    t0 = time.time()
    for _ in range(8):
        fins.append(engine.search_vectors_async(emb, k=10))
        if len(fins) > 2:
            fins.pop(0)()
    while fins:
        fins.pop(0)()
    scan_pipe_qps = 8 * MAX_BATCH / (time.time() - t0)
    _log(f"scan-only (pipelined x2): {scan_pipe_qps:,.0f} QPS at batch {MAX_BATCH}")

    # pre-warm the power-of-two batch buckets the scheduler will hit,
    # through the EXACT production composition (encode_device's scatter
    # assembly included — warming encode() alone leaves those to compile
    # mid-run). Disk-cached, so cheap on reruns.
    if on_tpu:
        for b in (8, 16, 32, 64, 128, 256, 512):
            engine.search_vectors(warm[:b], k=10)
            encoder.encode(queries[:b])
            engine.search_vectors_async(encoder.encode_device(queries[:b]), k=10)()
            # ragged sizes exercise the padded-tail scatter path
            if b > 8:
                engine.search_vectors_async(
                    encoder.encode_device(queries[: b - 3]), k=10
                )()
        # over-fetch programs (deletes / broad filters ride these)
        engine.warm_overfetch(batch_sizes=(8, 16, 32, 64, 128, 256, 512), k=10)
        # grouped heterogeneous-filter programs: one per (bucket, G_pad)
        engine.warm_grouped(batch_sizes=(8, 16, 32, 64, 128, 256, 512), k=10)
    _log("batch buckets warmed")

    # serving-path GC discipline (exp_serve_tail.py): freeze the
    # permanent graph (params, metadata strings, device handles) so
    # periodic gen-2 passes stop stalling every thread ~300 ms — the
    # entire r03 c128 p99 tail. Production servers do the same in
    # SearchServer.start().
    from theoremsearch_tpu.utils.gc_tuning import freeze_permanent
    _log(f"gc freeze_permanent: {freeze_permanent()}")

    # ---- end-to-end under concurrency ----
    # encode_device keeps embeddings on device; the scheduler's resolver
    # thread performs the single host sync per batch, pipelined
    max_wait = float(os.environ.get("SERVE_MAX_WAIT_MS", "8.0"))  # 8ms measured strictly better than 2ms (SERVE_BENCH_r02)
    sched = BatchScheduler(
        engine, max_batch=MAX_BATCH, max_wait_ms=max_wait,
        encode_fn=encoder.encode_device,
    )
    _log(f"scheduler max_wait_ms={max_wait}")

    # filter signatures for the mixed-traffic levels (VERDICT r2 item 5):
    # a contiguous year range (~30% of ids), a striped category (~4.5%),
    # and a 50% journal-status filter — a handful of signatures, like
    # real traffic (every reference query carries filters,
    # streamlit_app.py:178-243)
    FILTER_SIGS = [
        SearchFilters(year_range=(2005, 2013)),
        SearchFilters(tags=["math.NT", "math.AG", "math.CO"]),
        SearchFilters(journal_status="Preprint Only"),
    ]
    # near-unbounded signature cardinality (VERDICT r4 weak item 1 /
    # next item 2): 36 distinct signatures — per-query year windows,
    # single categories, citation bands, and combinations, like the
    # reference's free-form WHERE traffic. The grouped per-query-mask
    # kernel must hold throughput here; per-signature coalescing
    # degraded toward batch-of-1.
    FILTER_SIGS_MANY = (
        [SearchFilters(year_range=(1996 + j, 2001 + j)) for j in range(16)]
        + [SearchFilters(tags=[f"math.{c}"]) for c in
           ("AG", "NT", "CO", "PR", "CA", "DG", "FA", "GT")]
        + [SearchFilters(citation_range=(50 * j, 50 * j + 120)) for j in range(8)]
        + [
            SearchFilters(year_range=(2004, 2015), tags=["math.AG", "math.NT"]),
            SearchFilters(journal_status="Journal Article",
                          citation_range=(10, 500)),
            SearchFilters(year_range=(2010, 2020),
                          journal_status="Preprint Only"),
            SearchFilters(tags=["math.CO"], citation_range=(0, 99)),
        ]
    )

    def run_level(level: int, tag: str, filt_frac: float, sigs=None):
        sig_pool = sigs if sigs is not None else FILTER_SIGS
        lat: list[float] = []
        lock = threading.Lock()
        stop = time.time() + RUN_S
        sched.reset_traces()   # per-level stage attribution
        b0 = dict(sched.stats())
        mb0 = getattr(engine, "filter_mask_builds", 0)

        def client(cid: int):
            rng = np.random.default_rng(cid)
            mine = []
            while time.time() < stop:
                qtext = queries[rng.integers(0, len(queries))]
                f = None
                if filt_frac and rng.random() < filt_frac:
                    f = sig_pool[int(rng.integers(0, len(sig_pool)))]
                t0 = time.time()
                sched.submit_text(qtext, k=10, filters=f).result(timeout=120)
                mine.append(time.time() - t0)
            with lock:
                lat.extend(mine)

        threads = [threading.Thread(target=client, args=(c,)) for c in range(level)]
        t_start = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        elapsed = time.time() - t_start
        b1 = sched.stats()
        arr = np.asarray(lat)
        row = {
            "concurrency": level,
            "qps": round(len(arr) / elapsed, 1),
            "p50_ms": round(float(np.percentile(arr, 50)) * 1e3, 1),
            "p95_ms": round(float(np.percentile(arr, 95)) * 1e3, 1),
            "p99_ms": round(float(np.percentile(arr, 99)) * 1e3, 1),
            "avg_batch": round(
                (b1["queries"] - b0["queries"])
                / max(1, b1["batches"] - b0["batches"]),
                1,
            ),
        }
        if filt_frac:
            row["filtered_frac"] = filt_frac
            row["n_signatures"] = len(sig_pool)
            row["mask_builds_in_window"] = (
                getattr(engine, "filter_mask_builds", 0) - mb0
            )
        # per-batch stage percentiles + the worst batches' stage mix:
        # the p99 attribution (which stage do tail batches spend in?)
        stages = b1.get("stages_ms")
        if stages:
            row["stages_ms"] = stages
        results[tag] = row
        _log(
            f"e2e {tag:>10s}: {row['qps']:>8,.0f} QPS  "
            f"p50={row['p50_ms']:.0f}ms p95={row['p95_ms']:.0f}ms "
            f"p99={row['p99_ms']:.0f}ms  avg_batch={row['avg_batch']}"
        )
        if stages:
            _log(
                "  stages p99(ms): queue=%.0f encode=%.0f scan=%.0f "
                "resolve_wait=%.0f sync=%.0f | worst batch: %s"
                % (
                    stages["queue_ms"]["p99"], stages["encode_ms"]["p99"],
                    stages["scan_ms"]["p99"], stages["resolve_wait_ms"]["p99"],
                    stages["sync_ms"]["p99"], stages["worst_batches"][0],
                )
            )

    results = {}
    for level in LEVELS:
        run_level(level, f"c{level}", 0.0)

    # ---- same-session bf16-vs-int8 e2e A/B (VERDICT r3 item 3) ----
    # ENC_INT8_r03's e2e pair came from different processes hours apart
    # and tunnel drift swamped the stage-level win; this reruns the same
    # levels against the SAME engine/corpus in the same process with an
    # int8 (w8a8 fused-layer) encoder, interleaved immediately after the
    # bf16 levels — the number the README's int8 serving claim cites.
    if on_tpu and os.environ.get("SERVE_AB") and QUANT == "none":
        _log("A/B: building int8 (w8a8) encoder over the same params")
        encoder_i8 = BatchedEncoder(
            params, enc_cfg, batch_size=MAX_BATCH,
            buckets=(16, 32, 64), quant="int8",
        )
        for b in (8, 16, 32, 64, 128, 256, 512):
            encoder_i8.encode(queries[:b])
            engine.search_vectors_async(encoder_i8.encode_device(queries[:b]), k=10)()
            if b > 8:
                engine.search_vectors_async(
                    encoder_i8.encode_device(queries[: b - 3]), k=10
                )()
        _log("int8 encoder buckets warmed")
        _log(f"gc re-freeze (int8 tower): {freeze_permanent()}")
        sched_bf16, sched = sched, BatchScheduler(
            engine, max_batch=MAX_BATCH, max_wait_ms=max_wait,
            encode_fn=encoder_i8.encode_device,
        )
        for level in (128, 512):
            run_level(level, f"c{level}_int8", 0.0)
        sched.shutdown()
        sched = sched_bf16
        # immediate bf16 re-run at the same levels: brackets the int8
        # runs so tunnel drift within the session is visible
        for level in (128, 512):
            run_level(level, f"c{level}_bf16_recheck", 0.0)

    # mixed filtered traffic: warm each signature's mask + masked-scan
    # buckets first, then measure 20% filtered at the two operating points
    if on_tpu:
        for f in FILTER_SIGS:
            for b in (8, 32, 64, 128, 256, 512):
                engine.search_vectors(warm[:b], k=10, filters=f)
        # the scheduler's per-group device gather compiles per
        # (enc_rows, idx_pad) shape pair — warm the plausible grid
        dummy = jnp.zeros((512, D), jnp.float32)
        for e_rows in (8, 16, 32, 64, 128, 256, 512):
            for p in (8, 16, 32, 64, 128, 256, 512):
                _ = np.asarray(
                    jnp.take(dummy[:e_rows], jnp.zeros(p, jnp.int32), axis=0)[:1, :1]
                )
        _log("filter signatures + gather shapes warmed")
        # unmeasured mix warmup: any program shape the grid above missed
        # compiles here instead of inside a measured window (one mid-run
        # remote compile stalls a resolver slot for its full duration)
        run_level(64, "warmup_mix", 0.2)
        results.pop("warmup_mix", None)
        for level in (128, 512):
            run_level(level, f"c{level}_mix20", 0.2)
        # near-unbounded signature cardinality: 36 distinct signatures.
        # Warm each signature's mask + the grouped program shapes in an
        # unmeasured window first (mask compiles are O(N) host work and
        # first-sight only; the artifact reports any that leak into the
        # measured window via mask_builds_in_window)
        for f in FILTER_SIGS_MANY:
            engine.search_vectors(warm[:8], k=10, filters=f)
        run_level(64, "warmup_mix_sig36", 0.2, sigs=FILTER_SIGS_MANY)
        results.pop("warmup_mix_sig36", None)
        for level in (128, 512):
            run_level(level, f"c{level}_mix20_sig36", 0.2,
                      sigs=FILTER_SIGS_MANY)
    sched.shutdown()

    print(json.dumps({
        "metric": (
            f"serving_e2e_{N // 1_048_576}M_{MODE}" if on_tpu
            else "serving_e2e_cpu_smoke"
        ),
        "corpus": N, "dim": D, "index_mode": MODE,
        "encoder": (
            f"{ENC_FAMILY} {enc_cfg.num_layers}L-d{enc_cfg.hidden_size} "
            "(random init)"
        ),
        "encoder_only_qps": round(enc_qps, 1),
        "encoder_streamed_qps": round(enc_stream_qps, 1),
        "scan_only_qps": round(scan_qps, 1),
        "scan_pipelined_qps": round(scan_pipe_qps, 1),
        "levels": results,
        "bottleneck": "encoder" if enc_qps < scan_qps else "scan",
    }))


if __name__ == "__main__":
    main()
