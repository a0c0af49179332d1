"""Isolate the on-chip Pallas IVF failure: compare ivf_probe_scores
against a plain XLA gather+matmul on the SAME inputs, on real TPU.

Run: bash tools/tpu_run.sh experiments/exp_ivf_debug.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from theoremsearch_tpu.kernels.mips import ivf_probe_scores, _quantize_queries

B, D, R, C = 8, 1024, 256, 64  # 64 chunks of 256 rows


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    kq, ks = jax.random.split(key)
    rng = np.random.default_rng(0)

    slabs = rng.integers(-127, 128, (C, R, D)).astype(np.int8)
    slabs_d = jnp.asarray(slabs)
    q = jax.random.normal(kq, (B, D), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)

    for p in (8, 32):
        uids = np.sort(rng.choice(C, p, replace=False)).astype(np.int32)
        cand, qs = ivf_probe_scores(q, slabs_d, jnp.asarray(uids))
        cand = np.asarray(cand)  # (B, p*R)

        qk, _ = _quantize_queries(q)
        ref = np.einsum(
            "bd,prd->bpr",
            np.asarray(qk, np.int32),
            slabs[uids].astype(np.int32),
        ).reshape(B, p * R)
        ok = np.array_equal(cand, ref)
        print(f"p={p}: exact match={ok}", flush=True)
        if not ok:
            diff = cand != ref
            frac = diff.mean()
            # which chunks are wrong?
            per_chunk = diff.reshape(B, p, R).any(axis=(0, 2))
            print(f"  wrong fraction {frac:.4f}; bad chunks {np.nonzero(per_chunk)[0]}")
            print(f"  cand[0,:8]={cand[0,:8]}")
            print(f"  ref [0,:8]={ref[0,:8]}")
            # is it reading chunk index i instead of uids[i]?
            alt = np.einsum(
                "bd,prd->bpr",
                np.asarray(qk, np.int32),
                slabs[np.arange(p)].astype(np.int32),
            ).reshape(B, p * R)
            print(f"  matches identity-index read: {np.array_equal(cand, alt)}")

    # timing at serving shape
    pbig = 230
    uids_b = np.sort(rng.choice(C, min(pbig, C), replace=True)).astype(np.int32)
    t = None
    fn = lambda: ivf_probe_scores(q, slabs_d, jnp.asarray(uids_b))
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(30):
        out = fn()
    jax.block_until_ready(out)
    print(f"probe kernel p={len(uids_b)}: {(time.time()-t0)/30*1e3:.3f} ms")


if __name__ == "__main__":
    main()
