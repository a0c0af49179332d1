"""Headline benchmark: queries/sec/chip on a 1M-theorem corpus at equal
memory, gated by recall@10 vs the exact fp32 oracle.

THE TIMED PATH IS THE GATED PATH (round-1 verdict item 2): every
(qps, recall) row below times one pipeline end-to-end and measures that
same pipeline's recall@10 against the fp32 exact oracle on the same
queries. No metric in the JSON line comes from a configuration that was
not timed.

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
of 3 rounds; oracle corpus is passed as a jit ARG (closing over it
bakes a 4GB constant into the remote compile).
"""

from __future__ import annotations

import functools
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
        fused_mips_topk,
        fused_mips_topk_g,
    )

    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu:
        N, D, K, KR, ITERS = 1_048_576, 1024, 10, 40, 30
        B_SPEED, B_EXACT, RB_SPEED, RB_EXACT = 1024, 512, 4096, 2048
    else:  # smoke-scale on CPU (interpret-mode kernels)
        N, D, K, KR, ITERS = 32_768, 256, 10, 40, 2
        B_SPEED, B_EXACT, RB_SPEED, RB_EXACT = 64, 64, 1024, 1024

    key = jax.random.PRNGKey(0)
    kq, kc = jax.random.split(key)

    @functools.partial(jax.jit, static_argnames=("n", "d"))
    def gen(key, *, n, d):
        x = jax.random.normal(key, (n, d), jnp.float32)
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    _log(f"building fp32 corpus N={N} D={D} on device")
    corpus_f32 = gen(kc, n=N, d=D)
    jax.block_until_ready(corpus_f32)

    q = jax.random.normal(kq, (B_SPEED, D), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)

    # ---- fp32 exact oracle (chunked over queries; corpus as ARG) ----
    @jax.jit
    def exact10(qc, corpus):
        s = jax.lax.dot_general(
            qc, corpus, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        return jax.lax.top_k(s, K)[1]

    step = min(128, B_SPEED)
    exact_ids = np.concatenate(
        [np.asarray(exact10(q[i : i + step], corpus_f32)) for i in range(0, B_SPEED, step)]
    )
    _log("exact fp32 oracle done")

    # ---- speed index: global-scale int8 + bf16 rescore copy.  The
    # per-row index for the exact rows is built AFTER the speed timings —
    # extra resident HBM measurably slows the streaming scan ----
    gscale = float(jnp.max(jnp.abs(corpus_f32)) / 127.0)
    codes_g = jnp.clip(jnp.round(corpus_f32 / gscale), -127, 127).astype(jnp.int8)
    corpus_bf16 = corpus_f32.astype(jnp.bfloat16)
    kc2 = kc  # regenerate per-row index later from the same key
    jax.block_until_ready((codes_g, corpus_bf16))
    del corpus_f32
    import gc

    gc.collect()
    _log(f"speed index built (global scale {gscale:.6f})")

    def recall_of(ids: np.ndarray) -> float:
        ref = exact_ids[: len(ids)]
        return float((ids[:, :, None] == ref[:, None, :]).any(axis=1).mean())

    rows = {}

    def run_config(name, batch, fn):
        try:
            dt = _timed_loop(fn, q[:batch], ITERS)
            _, ids = fn(q[:batch])
            rec = recall_of(np.asarray(ids)[:, :K])
            rows[name] = {
                "qps": round(batch / dt, 1),
                "ms_per_batch": round(dt * 1e3, 3),
                "batch": batch,
                "recall_at_10": round(rec, 4),
            }
            _log(f"{name}: {dt*1e3:.2f} ms/batch -> {batch/dt:,.0f} QPS, recall@10={rec:.4f}")
        except Exception as e:  # noqa: BLE001
            rows[name] = {"error": str(e)[:160]}
            _log(f"{name} failed: {str(e)[:160]}")

    interp = not on_tpu

    def speed_pipeline(rt):
        def fn(qq):
            _, i40 = fused_mips_topk_g(
                qq, codes_g, gscale, N, k=KR, row_block=min(RB_SPEED, N),
                recall_target=rt, interpret=interp,
            )
            return device_rescore(qq, i40, corpus_bf16, N, k=K)
        return fn

    run_config("speed_rescored_rt97", B_SPEED, speed_pipeline(0.97))
    run_config("speed_rescored_rt95", B_SPEED, speed_pipeline(0.95))

    # per-row-scale exact rows (the filtered-search production kernel)
    @functools.partial(jax.jit, static_argnames=("n", "d"))
    def perrow_quant(key, *, n, d):
        x = jax.random.normal(key, (n, d), jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        absmax = jnp.max(jnp.abs(x), axis=1)
        scales = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        codes = jnp.clip(jnp.round(x / scales[:, None]), -127, 127).astype(jnp.int8)
        return codes, scales

    codes_r, scales_r = perrow_quant(kc2, n=N, d=D)
    jax.block_until_ready(scales_r)
    _log("per-row index built")
    run_config(
        "exact_int8_perrow_k10",
        B_EXACT,
        lambda qq: fused_mips_topk(
            qq, codes_r, scales_r, N, k=K, row_block=min(RB_EXACT, N), interpret=interp
        ),
    )

    def perrow_rescored(qq):
        _, i40 = fused_mips_topk(
            qq, codes_r, scales_r, N, k=KR, row_block=min(RB_EXACT, N), interpret=interp
        )
        return device_rescore(qq, i40, corpus_bf16, N, k=K)

    run_config("exact_int8_perrow_rescored", B_EXACT, perrow_rescored)

    # headline = fastest row passing the 0.99 gate
    passing = {
        n: r for n, r in rows.items() if "qps" in r and r["recall_at_10"] >= 0.99
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
                "recall_at_10_vs_exact": rows[best]["recall_at_10"],
                "gate": "recall>=0.99 on the SAME timed pipeline",
                "headline_config": best,
                "corpus": N,
                "dim": D,
                "configs": rows,
            }
        )
    )


if __name__ == "__main__":
    main()
