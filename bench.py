"""Headline benchmark: queries/sec/chip on a 1M-theorem corpus at equal
memory, gated by recall@10 vs the exact fp32 oracle.

THE TIMED PATH IS THE GATED PATH (round-1 verdict item 2): every
(qps, recall) row below times one pipeline end-to-end and measures that
same pipeline's recall@10 against the fp32 exact oracle on the same
queries. No metric in the JSON line comes from a configuration that was
not timed.

Round-3 hardening (VERDICT r2 items 2 and 4):
- the recall gate is evaluated over NDRAWS independent query draws
  (different seeds); each config reports recall min/mean/draws and the
  headline must clear 0.99 at the MINIMUM (round 2 gated on a single
  draw with a 0.001 margin — draw variance could flip it);
- the headline pipeline also runs at 2M and 4M rows (chunked on-device
  corpus build; the fp32 corpus is never materialized — oracle top-k
  accumulates per chunk), reporting the per-chip capacity ceiling:
  4M x 1024 at 3 bytes/dim = 12 GB of 16 GB v5e HBM.

Configurations:
  speed (headline): global-scale int8 maxima-scan kernel
      (fused_mips_topk_g, row_block=4096, retrieve 40 @ recall_target
      0.97) -> on-device bf16 exact rescore -> top-10.   Memory:
      1GB int8 codes + 2GB bf16 rescore copy = 3GB < pgvector's 4GB
      fp32 rows (the equal-memory knob, BASELINE.md).
  speed-lowmargin: same pipeline at recall_target 0.95 (faster, thinner
      recall margin).
  exact-int8: per-row-scale fused kernel (fused_mips_topk), direct
      k=10, no rescore — the filtered-search production kernel.

Targets (BASELINE.md): >=0.99 recall@10; >=100k QPS/chip on 1M x 1024.
vs_baseline = headline QPS / 100_000 (driver-set north star; the
reference's own retrieval is an unindexed pgvector table scan,
streamlit_app.py:281, with no published numbers).

Methodology: corpus generated & quantized on device (host<->device adds
~33ms/call here); timing = 30 async-dispatched calls + one sync, best
of 3 rounds; oracle corpus chunks are jit ARGS (closing over them bakes
multi-GB constants into the remote compile).
"""

from __future__ import annotations

import functools
import gc
import json
import sys
import time

import numpy as np

_T0 = time.time()


def _log(msg: str) -> None:
    print(f"# [{time.time()-_T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def _enable_compilation_cache():
    """Persistent on-disk compile cache: remote compiles cost 30-120s on
    the axon tunnel; second runs of the bench skip them entirely."""
    import os

    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:  # noqa: BLE001 - cache is an optimization, never fatal
        pass


def _timed_loop(fn, q0, iters, rounds=3):
    """Sustained per-batch seconds: async-dispatch `iters` launches, then
    fetch one scalar of the last result. (Wrapping pallas_call in a
    fori_loop instead triggers a pathological Mosaic re-compile.)"""
    import jax

    out = fn(q0)
    _ = np.asarray(jax.tree.leaves(out)[0][:1, :1])  # compile + warm
    best = float("inf")
    for _ in range(rounds):
        t0 = time.time()
        for _ in range(iters):
            out = fn(q0)
        _ = np.asarray(jax.tree.leaves(out)[0][:1, :1])
        best = min(best, (time.time() - t0) / iters)
    return best


def main():
    import jax
    import jax.numpy as jnp

    _enable_compilation_cache()

    from theoremsearch_tpu.kernels.mips import (
        device_rescore,
        device_rescore_residual,
        fused_mips_topk,
        fused_mips_topk_g,
    )

    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu:
        N, D, K, KR, ITERS = 1_048_576, 1024, 10, 40, 30
        B_SPEED, B_EXACT, RB_SPEED, RB_EXACT = 1024, 512, 4096, 2048
        NDRAWS = 5
        SCALE_NS = (2_097_152, 4_194_304)
        RESID_NS = (6_291_456,)   # 2-bytes/dim capacity mode: 12 GB at 6M
        SCALE_DRAWS = 3
        CHUNK = 262_144
    else:  # smoke-scale on CPU (interpret-mode kernels)
        N, D, K, KR, ITERS = 32_768, 256, 10, 40, 2
        B_SPEED, B_EXACT, RB_SPEED, RB_EXACT = 64, 64, 1024, 1024
        NDRAWS = 3
        SCALE_NS = (65_536,)
        RESID_NS = (65_536,)
        SCALE_DRAWS = 2
        CHUNK = 16_384

    key = jax.random.PRNGKey(0)
    kq, kc = jax.random.split(key)
    interp = not on_tpu

    # ---- independent query draws (the recall gate runs on ALL of them;
    # timing uses draw 0) ----
    def draw_queries(seed: int, b: int):
        k = jax.random.PRNGKey(1000 + seed)
        q = jax.random.normal(k, (b, D), jnp.float32)
        return q / jnp.linalg.norm(q, axis=1, keepdims=True)

    max_draws = max(NDRAWS, SCALE_DRAWS)
    q_draws = [draw_queries(s, B_SPEED) for s in range(max_draws)]

    # ---- chunked corpus build: per chunk, generate fp32 rows on device,
    # accumulate the exact-oracle top-k for every draw, and pack int8 +
    # bf16 slices into donated buffers. The fp32 corpus never exists
    # whole — this is what makes the 12 GB 4M config fit in HBM. ----
    @functools.partial(jax.jit, static_argnames=("rows",))
    def gen_chunk(kchunk, *, rows):
        x = jax.random.normal(kchunk, (rows, D), jnp.float32)
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    @jax.jit
    def chunk_absmax(x):
        return jnp.max(jnp.abs(x))

# `start` is a TRACED scalar everywhere below: making it static would
    # compile one remote program per chunk (~16 per helper at 4M).
    @jax.jit
    def oracle_step(qall, x, top_s, top_i, start):
        # HIGHEST: the oracle must be TRULY fp32-exact — TPU default
        # precision truncates operands to bf16, which biases the recall
        # gate toward rescore paths with correlated bf16 errors
        s = jax.lax.dot_general(
            qall, x, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        gids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + start
        cs = jnp.concatenate([top_s, s], axis=1)
        ci = jnp.concatenate([top_i, gids], axis=1)
        ns, sel = jax.lax.top_k(cs, K)
        return ns, jnp.take_along_axis(ci, sel, axis=1)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def pack_int8(buf, x, gscale, start):
        codes = jnp.clip(jnp.round(x / gscale), -127, 127).astype(jnp.int8)
        return jax.lax.dynamic_update_slice(buf, codes, (start, 0))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def pack_bf16(buf, x, start):
        return jax.lax.dynamic_update_slice(buf, x.astype(jnp.bfloat16), (start, 0))

    # 2-bytes/dim capacity mode: global-scale scan codes + per-row int8
    # codes of the RESIDUAL x - gscale*codes (two-level reconstruction,
    # ~15 effective bits) — replaces the bf16 rescore copy entirely
    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def pack_residual(cbuf, rbuf, sbuf, x, gscale, start):
        codes = jnp.clip(jnp.round(x / gscale), -127, 127).astype(jnp.int8)
        resid = x - gscale * codes.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(resid), axis=1)
        scales = jnp.where(absmax > 0, absmax / 127.0, 1.0).astype(jnp.float32)
        rcodes = jnp.clip(
            jnp.round(resid / scales[:, None]), -127, 127
        ).astype(jnp.int8)
        return (
            jax.lax.dynamic_update_slice(cbuf, codes, (start, 0)),
            jax.lax.dynamic_update_slice(rbuf, rcodes, (start, 0)),
            jax.lax.dynamic_update_slice(sbuf, scales, (start,)),
        )

    def corpus_pass1(n: int, ndraws: int):
        """Pass 1 over regenerated chunks: global absmax + the exact
        fp32 oracle top-k for every query draw. Returns
        (chunk, keys, gscale, oracle_ids list per draw); pass-2 packers
        below regenerate the identical chunks from the same keys."""
        # halve the chunk above 2M: the pack pass holds codes (n bytes)
        # + bf16 (2n) + the live fp32 chunk, and 4M x 1024 already uses
        # 12 GB of HBM for the index alone
        chunk = CHUNK if n <= 2_097_152 else CHUNK // 2
        n_chunks = n // chunk
        keys = jax.random.split(jax.random.PRNGKey(7), n_chunks)
        qall = jnp.concatenate([q_draws[i] for i in range(ndraws)], axis=0)
        top_s = jnp.full((qall.shape[0], K), -np.inf, jnp.float32)
        top_i = jnp.full((qall.shape[0], K), -1, jnp.int32)
        absmax = 0.0
        for c in range(n_chunks):
            x = gen_chunk(keys[c], rows=chunk)
            # float() syncs every chunk: a tunnel RPC lost here would
            # otherwise hang silently mid-build (seen once on axon) —
            # the per-chunk log line makes the stall attributable
            absmax = max(absmax, float(chunk_absmax(x)))
            top_s, top_i = oracle_step(qall, x, top_s, top_i, jnp.int32(c * chunk))
            _log(f"  pass1 chunk {c + 1}/{n_chunks}")
        oracle = np.asarray(top_i).reshape(ndraws, B_SPEED, K)
        return chunk, keys, absmax / 127.0, [oracle[i] for i in range(ndraws)]

    def pack_residual_arrays(n: int, chunk: int, keys, gscale: float):
        """Pass 2, capacity mode: scan codes + residual codes + per-row
        residual scales (2 bytes/dim total; NO bf16 copy, which is what
        lets 6M x 1024 fit one v5e)."""
        codes = jnp.zeros((n, D), jnp.int8)
        rcodes = jnp.zeros((n, D), jnp.int8)
        rscales = jnp.zeros((n,), jnp.float32)
        gs_dev = jnp.float32(gscale)
        for c in range(n // chunk):
            x = gen_chunk(keys[c], rows=chunk)
            codes, rcodes, rscales = pack_residual(
                codes, rcodes, rscales, x, gs_dev, jnp.int32(c * chunk)
            )
        jax.block_until_ready(rscales)
        return codes, rcodes, rscales

    def build_corpus(n: int, ndraws: int):
        """Returns (codes int8 (n,D), bf16 copy, gscale, oracle_ids list
        per draw)."""
        chunk, keys, gscale, oracles = corpus_pass1(n, ndraws)
        codes = jnp.zeros((n, D), jnp.int8)
        bf16 = jnp.zeros((n, D), jnp.bfloat16)
        for c in range(n // chunk):
            x = gen_chunk(keys[c], rows=chunk)
            codes = pack_int8(codes, x, gscale, jnp.int32(c * chunk))
            bf16 = pack_bf16(bf16, x, jnp.int32(c * chunk))
        _log("  pack dispatched; waiting on device")
        jax.block_until_ready((codes, bf16))
        return codes, bf16, gscale, oracles

    def build_corpus_residual(n: int, ndraws: int):
        chunk, keys, gscale, oracles = corpus_pass1(n, ndraws)
        codes, rcodes, rscales = pack_residual_arrays(n, chunk, keys, gscale)
        return codes, rcodes, rscales, gscale, oracles

    def residual_pipeline(codes, rcodes, rscales, gs, n, rt):
        def fn(qq):
            _, i40 = fused_mips_topk_g(
                qq, codes, gs, n, k=KR, row_block=min(RB_SPEED, n),
                recall_target=rt, interpret=interp,
            )
            return device_rescore_residual(
                qq, i40, codes, gs, rcodes, rscales, n, k=K
            )
        return fn

    def recall_of(ids: np.ndarray, ref: np.ndarray) -> float:
        return float((ids[:, :, None] == ref[:, None, :]).any(axis=1).mean())

    def gate_over_draws(fn, oracles, ndraws, batch=B_SPEED):
        recs = []
        for i in range(ndraws):
            _, ids = fn(q_draws[i])
            recs.append(recall_of(np.asarray(ids)[:, :K], oracles[i][:batch]))
        return {
            "recall_min": round(min(recs), 4),
            "recall_mean": round(float(np.mean(recs)), 4),
            "recall_draws": [round(r, 4) for r in recs],
        }

    rows = {}

    def run_config(name, batch, fn, oracles, ndraws):
        try:
            dt = _timed_loop(fn, q_draws[0][:batch], ITERS)
            g = gate_over_draws(lambda qq: fn(qq[:batch]), oracles, ndraws, batch)
            rows[name] = {
                "qps": round(batch / dt, 1),
                "ms_per_batch": round(dt * 1e3, 3),
                "batch": batch,
                "recall_at_10": g["recall_min"],   # the gate value
                **g,
            }
            _log(
                f"{name}: {dt*1e3:.2f} ms/batch -> {batch/dt:,.0f} QPS, "
                f"recall@10 min={g['recall_min']:.4f} mean={g['recall_mean']:.4f} "
                f"({ndraws} draws)"
            )
        except Exception as e:  # noqa: BLE001
            rows[name] = {"error": str(e)[:160]}
            _log(f"{name} failed: {str(e)[:160]}")

    # ================= 1M headline =================
    _log(f"building corpus N={N} D={D} (chunked, {NDRAWS}-draw oracle)")
    codes_g, corpus_bf16, gscale, oracles = build_corpus(N, NDRAWS)
    _log(f"speed index built (global scale {gscale:.6f})")

    def speed_pipeline(codes, bf16, gs, n, rt):
        def fn(qq):
            _, i40 = fused_mips_topk_g(
                qq, codes, gs, n, k=KR, row_block=min(RB_SPEED, n),
                recall_target=rt, interpret=interp,
            )
            return device_rescore(qq, i40, bf16, n, k=K)
        return fn

    run_config(
        "speed_rescored_rt97", B_SPEED,
        speed_pipeline(codes_g, corpus_bf16, gscale, N, 0.97), oracles, NDRAWS,
    )
    run_config(
        "speed_rescored_rt95", B_SPEED,
        speed_pipeline(codes_g, corpus_bf16, gscale, N, 0.95), oracles, NDRAWS,
    )

    # ---- residual capacity mode at 1M: equal-scale comparison against
    # the bf16 rescore (same scan; two-level int8 rescore at 2 bytes/dim
    # vs bf16's 3). Rescore gather bytes are identical — QPS should
    # match and recall should be >= (15-bit vs 8-bit reconstruction).
    keys_1 = jax.random.split(jax.random.PRNGKey(7), N // CHUNK)
    codes_g2, rcodes_1, rscales_1 = pack_residual_arrays(N, CHUNK, keys_1, gscale)
    del codes_g2  # the scan reuses codes_g; only the residual data is new
    run_config(
        "speed_residual_rt95", B_SPEED,
        residual_pipeline(codes_g, rcodes_1, rscales_1, gscale, N, 0.95),
        oracles, NDRAWS,
    )
    del rcodes_1, rscales_1
    gc.collect()

    # per-row-scale exact rows (the filtered-search production kernel).
    # Regenerate per-row codes chunk-wise from the same keys.
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def pack_perrow(cbuf, sbuf, x, start):
        absmax = jnp.max(jnp.abs(x), axis=1)
        scales = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        codes = jnp.clip(jnp.round(x / scales[:, None]), -127, 127).astype(jnp.int8)
        return (
            jax.lax.dynamic_update_slice(cbuf, codes, (start, 0)),
            jax.lax.dynamic_update_slice(sbuf, scales, (start,)),
        )

    del codes_g
    gc.collect()
    codes_r = jnp.zeros((N, D), jnp.int8)
    scales_r = jnp.zeros((N,), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(7), N // CHUNK)
    for c in range(N // CHUNK):
        x = gen_chunk(keys[c], rows=CHUNK)
        codes_r, scales_r = pack_perrow(codes_r, scales_r, x, jnp.int32(c * CHUNK))
    jax.block_until_ready(scales_r)
    _log("per-row index built")
    run_config(
        "exact_int8_perrow_k10", B_EXACT,
        lambda qq: fused_mips_topk(
            qq, codes_r, scales_r, N, k=K, row_block=min(RB_EXACT, N), interpret=interp
        ),
        oracles, NDRAWS,
    )

    def perrow_rescored(qq):
        _, i40 = fused_mips_topk(
            qq, codes_r, scales_r, N, k=KR, row_block=min(RB_EXACT, N), interpret=interp
        )
        return device_rescore(qq, i40, corpus_bf16, N, k=K)

    run_config("exact_int8_perrow_rescored", B_EXACT, perrow_rescored, oracles, NDRAWS)

    del codes_r, scales_r, corpus_bf16
    gc.collect()

    # ================= scale rows: 2M / 4M (VERDICT r2 item 4) =========
    scale_rows = {}
    for n_scale in SCALE_NS:
        try:
            _log(f"building scale corpus N={n_scale} (chunked)")
            codes_s, bf16_s, gs_s, oracles_s = build_corpus(n_scale, SCALE_DRAWS)
            mem_gb = n_scale * D * 3 / 2**30
            fn = speed_pipeline(codes_s, bf16_s, gs_s, n_scale, 0.97)
            dt = _timed_loop(fn, q_draws[0], ITERS)
            g = gate_over_draws(fn, oracles_s, SCALE_DRAWS)
            scale_rows[f"n{n_scale}"] = {
                "rows": n_scale,
                "memory_gb": round(mem_gb, 2),
                "qps": round(B_SPEED / dt, 1),
                "ms_per_batch": round(dt * 1e3, 3),
                **g,
            }
            _log(
                f"scale N={n_scale}: {dt*1e3:.2f} ms/batch -> "
                f"{B_SPEED/dt:,.0f} QPS, recall min={g['recall_min']:.4f} "
                f"({mem_gb:.1f} GB resident)"
            )
            del codes_s, bf16_s, fn
            gc.collect()
        except Exception as e:  # noqa: BLE001
            scale_rows[f"n{n_scale}"] = {"error": str(e)[:160]}
            _log(f"scale N={n_scale} failed: {str(e)[:160]}")

    # ---- residual capacity rungs: rows the 3-bytes/dim config cannot
    # hold on one chip (6M x 1024 = 12 GB at 2 bytes/dim) ----
    for n_scale in RESID_NS:
        try:
            _log(f"building residual capacity corpus N={n_scale} (chunked)")
            codes_s, rcodes_s, rscales_s, gs_s, oracles_s = (
                build_corpus_residual(n_scale, SCALE_DRAWS)
            )
            mem_gb = n_scale * D * 2 / 2**30
            fn = residual_pipeline(codes_s, rcodes_s, rscales_s, gs_s, n_scale, 0.97)
            dt = _timed_loop(fn, q_draws[0], ITERS)
            g = gate_over_draws(fn, oracles_s, SCALE_DRAWS)
            scale_rows[f"n{n_scale}_residual"] = {
                "rows": n_scale,
                "mode": "residual-int8 (2 bytes/dim)",
                "memory_gb": round(mem_gb, 2),
                "qps": round(B_SPEED / dt, 1),
                "ms_per_batch": round(dt * 1e3, 3),
                **g,
            }
            _log(
                f"residual scale N={n_scale}: {dt*1e3:.2f} ms/batch -> "
                f"{B_SPEED/dt:,.0f} QPS, recall min={g['recall_min']:.4f} "
                f"({mem_gb:.1f} GB resident)"
            )
            del codes_s, rcodes_s, rscales_s, fn
            gc.collect()
        except Exception as e:  # noqa: BLE001
            scale_rows[f"n{n_scale}_residual"] = {"error": str(e)[:160]}
            _log(f"residual scale N={n_scale} failed: {str(e)[:160]}")

    # headline = fastest 1M row passing the 0.99 gate AT THE MIN over draws
    passing = {
        n: r for n, r in rows.items() if "qps" in r and r["recall_min"] >= 0.99
    }
    best = max(passing or {n: r for n, r in rows.items() if "qps" in r},
               key=lambda n: rows[n]["qps"])
    qps = rows[best]["qps"]

    print(
        json.dumps(
            {
                "metric": "qps_per_chip_1M_int8" if on_tpu else "qps_cpu_smoke",
                "value": qps,
                "unit": "queries/sec",
                "vs_baseline": round(qps / 100_000.0, 4),
                "recall_at_10_vs_exact": rows[best]["recall_min"],
                "gate": f"min recall@10 over {NDRAWS} draws >= 0.99 on the SAME timed pipeline",
                "headline_config": best,
                "corpus": N,
                "dim": D,
                "configs": rows,
                "scale": scale_rows,
            }
        )
    )


if __name__ == "__main__":
    main()
