"""Bisect the on-chip IVF recall failure: build-side vs search-side.

Small clustered corpus (fast build) on real TPU. Measures:
  a. XLA gather path recall  (same build, no pallas)
  b. Pallas path recall      (the failing production path)
  c. probe ceiling: fraction of true top-10 whose row is stored in a
     chunk the batch probed (upper bound for any correct search)
  d. containment: fraction of true top-10 docs present in slabs+spill

Run: bash tools/tpu_run.sh experiments/exp_ivf_bisect.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from theoremsearch_tpu.core import IndexConfig
from theoremsearch_tpu.index.flat import PAD_ID
from theoremsearch_tpu.index.ivf import IVFIndex

N, D, B, K = 131_072, 1024, 8, 10
NCENT = 512


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    kc, kn, kq = jax.random.split(key, 3)

    @jax.jit
    def gen_centers(k):
        c = jax.random.normal(k, (NCENT, D), jnp.float32)
        return c / jnp.linalg.norm(c, axis=1, keepdims=True)

    cents = np.asarray(gen_centers(kc))
    rng = np.random.default_rng(0)
    assign_true = rng.integers(0, NCENT, N)

    @jax.jit
    def gen_pts(k, rows):
        noise = jax.random.normal(k, rows.shape, jnp.float32) * (0.7 / D**0.5)
        x = rows + noise
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    emb = np.asarray(gen_pts(kn, jnp.asarray(cents[assign_true])))
    q = np.asarray(gen_pts(kq, jnp.asarray(cents[rng.integers(0, NCENT, B)])))
    print("corpus built", flush=True)

    embd = jnp.asarray(emb)
    ref = np.asarray(jax.lax.top_k(jnp.asarray(q) @ embd.T, K)[1])

    idx = IVFIndex.build(
        emb,
        config=IndexConfig(ivf_nlist=NCENT, dtype="int8", kmeans_iters=25,
                           ivf_assign2_margin=0.02),
        slab_rows=256,
        normalize=False,
    )
    print(f"built: slabs {idx.slabs.shape} spill {(idx.spill_ids >= 0).sum()}",
          flush=True)

    # d. containment
    all_ids = set(idx.slab_ids.ravel().tolist()) | set(idx.spill_ids.tolist())
    cont = np.mean([[d in all_ids for d in row] for row in ref])
    print(f"containment of true top-10 in index: {cont:.4f}", flush=True)

    for nprobe in (8, 32):
        # a. XLA path
        s_x, i_x = idx.search(q, k=K, nprobe=nprobe, rescore_factor=8,
                              use_pallas=False)
        rec_x = float((i_x[:, :, None] == ref[:, None, :]).any(1).mean())
        # b. pallas path
        s_p, i_p = idx.search(q, k=K, nprobe=nprobe, rescore_factor=8,
                              use_pallas=True)
        rec_p = float((i_p[:, :, None] == ref[:, None, :]).any(1).mean())

        # c. probe ceiling for the pallas (batch-dedup) semantics:
        # chunks probed by ANY query + spill chunks
        coarse = q @ idx.centroids.T
        probe = np.argsort(-coarse, axis=1)[:, :nprobe]
        probed = set(probe.ravel().tolist())
        in_slab = {}
        L, R = idx.slab_ids.shape
        for c in range(L):
            for d in idx.slab_ids[c]:
                if d >= 0:
                    in_slab.setdefault(int(d), set()).add(c)
        spill_set = set(int(d) for d in idx.spill_ids if d >= 0)
        ceil = np.mean([
            [(d in spill_set) or bool(in_slab.get(int(d), set()) & probed)
             for d in row]
            for row in ref
        ])
        print(f"nprobe={nprobe}: xla={rec_x:.4f} pallas={rec_p:.4f} "
              f"probe_ceiling={ceil:.4f}", flush=True)
        if rec_p < rec_x - 0.05:
            # dump the first query's story
            print("  q0 true:", ref[0].tolist(), flush=True)
            print("  q0 xla :", i_x[0].tolist(), flush=True)
            print("  q0 plls:", i_p[0].tolist(), flush=True)


if __name__ == "__main__":
    main()
