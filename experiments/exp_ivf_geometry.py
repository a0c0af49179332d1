"""IVF on HARD geometries (VERDICT r2 item 3): the r02 IVF win was shown
only on a friendly synthetic (4096 well-separated clusters, within cos
~0.8, in-distribution queries — recall 1.0 at every nprobe, i.e. the
bench had no discriminating power). This measures, at 1M x 1024 / B=8 /
retrieve-80 + bf16 rescore, on one v5e:

  easy:    4096 clusters, alpha=0.7  (within-cluster cos ~0.82) — r02's
  overlap: 4096 clusters, alpha=1.5  (within-cluster cos ~0.55)
  offdist: overlap corpus, queries perturbed OFF-distribution
           (query = corpus point + 1.2/sqrt(D) noise, renormalized)
  uniform: no cluster structure at all (bench.py's corpus — worst case)

Per geometry: nprobe sweep (recall@10 vs fp32 exact, MIN over 2 query
draws + latency), the smallest nprobe holding 0.99, calibrate_nprobe's
pick (must also hold the gate), and the brute speed-path baseline at the
same batch. k-means builds checkpoint under /tmp so re-runs resume.

Run: bash tools/tpu_run.sh experiments/exp_ivf_geometry.py
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from theoremsearch_tpu.core import IndexConfig
from theoremsearch_tpu.index.ivf import IVFIndex, calibrate_nprobe
from theoremsearch_tpu.kernels.mips import device_rescore, fused_mips_topk_g

N, D, K = 1_048_576, 1024, 10
B_LAT = 8     # latency batch (the small-batch serving case IVF targets)
B_REC = 128   # recall batch: at B=8 one bf16-rescore near-tie flips
              # recall by 1.25% — even brute plateaued at 0.9875 — so the
              # gate is measured on 128-query draws (0.08%/item)
NCENT = 4096
NDRAWS = 2
SWEEP = (8, 16, 32, 64, 128, 256)


def timed(fn, iters=30, rounds=3):
    out = fn()
    _ = np.asarray(jax.tree.leaves(out)[0][:1, :1])
    best = 1e9
    for _ in range(rounds):
        t0 = time.time()
        for _ in range(iters):
            out = fn()
        _ = np.asarray(jax.tree.leaves(out)[0][:1, :1])
        best = min(best, (time.time() - t0) / iters)
    return best


@jax.jit
def _norm(x):
    return x / jnp.linalg.norm(x, axis=1, keepdims=True)


@jax.jit
def exact10(qc, corpus):
    # HIGHEST: the oracle must be truly fp32-exact — TPU default precision
    # bf16-truncates, inflating recall for bf16-rescore paths (correlated
    # errors) — see eval/oracle.py
    s = jax.lax.dot_general(qc, corpus, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    return jax.lax.top_k(s, K)[1]


def make_corpus(kind: str, key):
    """Returns (embd (N,D) f32 device, query draws [(qd, kind-specific)])."""
    kc, kn, kq, ka = jax.random.split(key, 4)
    if kind == "uniform":
        @jax.jit
        def gen(k):
            return _norm(jax.random.normal(k, (N, D), jnp.float32))
        embd = gen(kn)
        draws = [_norm(jax.random.normal(jax.random.fold_in(kq, i), (B_REC, D),
                                         jnp.float32)) for i in range(NDRAWS)]
        return embd, draws
    alpha = 0.7 if kind == "easy" else 1.5
    cents = _norm(jax.random.normal(kc, (NCENT, D), jnp.float32))

    @jax.jit
    def gen_pts(k, rows, a):
        return _norm(rows + a / D**0.5 * jax.random.normal(k, rows.shape, jnp.float32))

    assign = jax.random.randint(ka, (N,), 0, NCENT)
    embd = gen_pts(kn, cents[assign], alpha)
    draws = []
    for i in range(NDRAWS):
        ki = jax.random.fold_in(kq, i)
        k1, k2 = jax.random.split(ki)
        qrows = cents[jax.random.randint(k1, (B_REC,), 0, NCENT)]
        qd = gen_pts(k2, qrows, alpha)
        if kind == "offdist":
            # perturb off-distribution: away from every cluster center
            k3 = jax.random.fold_in(ki, 7)
            qd = gen_pts(k3, qd, 1.2)
        draws.append(qd)
    return embd, draws


def main():
    print("devices:", jax.devices(), flush=True)
    results = {}
    for kind in ("easy", "overlap", "offdist", "uniform"):
        key = jax.random.PRNGKey({"easy": 0, "overlap": 1,
                                  "offdist": 1, "uniform": 2}[kind])
        embd, draws = make_corpus(kind, key)
        jax.block_until_ready(embd)
        refs = [np.asarray(exact10(qd, embd)) for qd in draws]
        print(f"[{kind}] corpus + oracle done", flush=True)

        # brute speed-path baseline at B=8 (quantize under jit: the eager
        # composition materializes three 4 GB f32 temporaries and OOMs)
        @jax.jit
        def _quant(e, gs):
            return jnp.clip(jnp.round(e / gs), -127, 127).astype(jnp.int8)

        gscale = float(jnp.max(jnp.abs(embd)) / 127.0)
        codes = _quant(embd, gscale)
        bf16 = embd.astype(jnp.bfloat16)
        jax.block_until_ready((codes, bf16))
        emb = np.asarray(embd)
        del embd

        def brute(qd):
            _, i40 = fused_mips_topk_g(qd, codes, gscale, N, k=40,
                                       row_block=4096, recall_target=0.97)
            return device_rescore(qd, i40, bf16, N, k=K)

        dt_b = timed(lambda: brute(draws[0][:B_LAT]))
        rec_b = min(
            float((np.asarray(brute(d)[1])[:, :, None] == r[:, None, :]).any(1).mean())
            for d, r in zip(draws, refs)
        )
        print(f"[{kind}] brute: {dt_b*1e3:.2f} ms @ B={B_LAT}  "
              f"recall_min={rec_b:.4f} @ B={B_REC}", flush=True)
        del codes, bf16

        # IVF build (checkpointed; offdist reuses overlap's corpus build)
        ckpt = f"/tmp/ivf_geo_{'overlap' if kind == 'offdist' else kind}"
        t0 = time.time()
        idx = IVFIndex.build(
            emb,
            config=IndexConfig(ivf_nlist=NCENT, dtype="int8", kmeans_iters=25,
                               ivf_assign2_margin=0.02),
            slab_rows=256,
            normalize=False,
            checkpoint_dir=ckpt,
        )
        t_build = time.time() - t0
        spill = int((idx.spill_ids >= 0).sum())
        print(f"[{kind}] build {t_build:.0f}s  spill {spill}", flush=True)
        pa = idx._pallas_arrays()
        jax.block_until_ready(pa["slabs"])

        rows = []
        gate_np = None
        for nprobe in SWEEP:
            dfn = idx.device_searcher(k=K, nprobe=nprobe, rescore_factor=8)
            dt = timed(lambda: dfn(draws[0][:B_LAT]))
            recs = []
            for d, r in zip(draws, refs):
                ii = np.asarray(dfn(d)[1])
                recs.append(float((ii[:, :, None] == r[:, None, :]).any(1).mean()))
            rec_min = min(recs)
            rows.append({"nprobe": nprobe, "ms_b8": round(dt * 1e3, 2),
                         "recall_min_b128": round(rec_min, 4)})
            print(f"[{kind}]  nprobe={nprobe:4d}: {dt*1e3:7.2f} ms @ B={B_LAT}  "
                  f"recall_min={rec_min:.4f}", flush=True)
            if gate_np is None and rec_min >= 0.99:
                gate_np = nprobe

        # auto-calibration pick (corpus-derived perturbed queries)
        calib = calibrate_nprobe(idx, emb, gate=0.99, k=K, n_queries=128,
                                 n_draws=2, candidates=SWEEP)
        print(f"[{kind}] calibrate_nprobe -> {calib[0]} (recall {calib[1]:.4f})",
              flush=True)
        results[kind] = {
            "brute_ms": round(dt_b * 1e3, 2), "brute_recall_min": round(rec_b, 4),
            "build_s": round(t_build), "spill_rows": spill,
            "sweep": rows, "nprobe_for_099": gate_np,
            "calibrated": {"nprobe": int(calib[0]), "recall": round(calib[1], 4)},
        }
        del idx, pa, emb
        import gc
        gc.collect()

    print(json.dumps(results))


if __name__ == "__main__":
    main()
