"""Re-validate nprobe auto-calibration after the precision fix.

calibrate_nprobe's exact oracle originally ran jnp.dot at TPU default
precision (bf16-truncated operands) — the exact pitfall eval/oracle.py
documents: near-ties flip in the reference top-k and the calibration can
pick a wrong nprobe that finalize_ivf then stamps as trusted. The oracle
now runs at precision=HIGHEST (index/ivf.py); this re-runs ONLY the
calibration step on the easy/overlap geometry corpora (k-means builds
resume from the /tmp checkpoints exp_ivf_geometry.py left) and reports
whether the picks the README cites (16 easy, 64 overlap) still hold.

Run: bash tools/tpu_run.sh experiments/exp_calib_recheck.py
"""

import json
import sys
import time
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
from exp_ivf_geometry import NCENT, SWEEP, make_corpus  # noqa: E402

from theoremsearch_tpu.core import IndexConfig  # noqa: E402
from theoremsearch_tpu.index.ivf import IVFIndex, calibrate_nprobe  # noqa: E402


def main():
    print("devices:", jax.devices(), flush=True)
    out = {}
    for kind in ("easy", "overlap"):
        key = jax.random.PRNGKey({"easy": 0, "overlap": 1}[kind])
        embd, _ = make_corpus(kind, key)
        jax.block_until_ready(embd)
        emb = np.asarray(embd)
        del embd
        t0 = time.time()
        idx = IVFIndex.build(
            emb,
            config=IndexConfig(ivf_nlist=NCENT, dtype="int8", kmeans_iters=25,
                               ivf_assign2_margin=0.02),
            slab_rows=256,
            normalize=False,
            checkpoint_dir=f"/tmp/ivf_geo_{kind}",
        )
        print(f"[{kind}] build/resume {time.time()-t0:.0f}s", flush=True)
        calib = calibrate_nprobe(idx, emb, gate=0.99, k=10, n_queries=128,
                                 n_draws=2, candidates=SWEEP)
        print(f"[{kind}] calibrate_nprobe (HIGHEST oracle) -> "
              f"nprobe={calib[0]} recall={calib[1]:.4f}", flush=True)
        out[kind] = {"nprobe": int(calib[0]), "recall": round(float(calib[1]), 4)}
        del idx, emb
        import gc

        gc.collect()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
