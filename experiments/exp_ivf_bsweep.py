"""IVF vs brute-force crossover in batch size (1M x 1024, on chip).

The probe-major IVF path dedupes probed chunks across the batch: as B
grows, the unique-chunk set approaches all lists and the scan approaches
(and then exceeds) brute-force work. This measures latency + recall for
B in {8..512} for both paths, so serving configs know where to route.

Measured 2026-08-17 on one v5e (nprobe=8, rescore 8x):
  B=  8: brute  3.37 ms (r=1.0000)  ivf  2.47 ms (r=0.9875)  -> IVF
  B= 32: brute  3.27 ms (r=0.9906)  ivf  5.71 ms (r=0.9875)  -> brute
  B= 64: brute  3.26 ms (r=0.9938)  ivf 17.96 ms (r=0.9828)  -> brute
  B=128: brute  3.59 ms (r=0.9961)  ivf 92.29 ms (r=0.9867)  -> brute
  B=256: brute  4.85 ms (r=0.9949)  ivf  393.4 ms (r=0.9902) -> brute
  B=512: brute  5.70 ms (r=0.9951)  ivf 1730.8 ms (r=0.9930) -> brute
The engine's ivf_max_batch (default 16) encodes this routing.

Run: bash tools/tpu_run.sh experiments/exp_ivf_bsweep.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from theoremsearch_tpu.core import IndexConfig
from theoremsearch_tpu.index.ivf import IVFIndex
from theoremsearch_tpu.kernels.mips import device_rescore, fused_mips_topk_g

N, D, K = 1_048_576, 1024, 10
NCENT = 4096


def timed(fn, *args, iters=20, rounds=3):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0][:1, :1])
    best = 1e9
    for _ in range(rounds):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0][:1, :1])
        best = min(best, (time.time() - t0) / iters)
    return best


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    kc, kn, kq = jax.random.split(key, 3)

    @jax.jit
    def gen_centers(k):
        c = jax.random.normal(k, (NCENT, D), jnp.float32)
        return c / jnp.linalg.norm(c, axis=1, keepdims=True)

    cents = gen_centers(kc)

    @jax.jit
    def gen_chunk(k, rows):
        noise = jax.random.normal(k, rows.shape, jnp.float32) * (0.7 / D**0.5)
        x = rows + noise
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    @jax.jit
    def gen_corpus(k):
        ka, kb = jax.random.split(k)
        assign = jax.random.randint(ka, (N,), 0, NCENT)
        return gen_chunk(kb, cents[assign])

    embd = gen_corpus(kn)
    jax.block_until_ready(embd)
    emb = np.asarray(embd)
    print("corpus built", flush=True)

    BMAX = 512
    rng = np.random.default_rng(0)
    qd = gen_chunk(kq, cents[jnp.asarray(rng.integers(0, NCENT, BMAX))])

    @jax.jit
    def exact10(qc, corpus):
        s = jax.lax.dot_general(qc, corpus, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jax.lax.top_k(s, K)[1]

    ref = np.concatenate(
        [np.asarray(exact10(qd[i:i+128], embd)) for i in range(0, BMAX, 128)]
    )
    gscale = float(jnp.max(jnp.abs(embd)) / 127.0)
    codes = jnp.clip(jnp.round(embd / gscale), -127, 127).astype(jnp.int8)
    bf16 = embd.astype(jnp.bfloat16)
    jax.block_until_ready((codes, bf16))
    del embd
    print("oracle + speed index done", flush=True)

    idx = IVFIndex.build(
        emb,
        config=IndexConfig(ivf_nlist=NCENT, dtype="int8", kmeans_iters=25,
                           ivf_assign2_margin=0.02),
        slab_rows=256,
        normalize=False,
    )
    pa = idx._pallas_arrays()
    jax.block_until_ready(pa["slabs"])
    print("ivf built", flush=True)

    def brute(qq):
        _, i40 = fused_mips_topk_g(qq, codes, gscale, N, k=40, row_block=4096,
                                   recall_target=0.97)
        return device_rescore(qq, i40, bf16, N, k=K)

    for B in (8, 32, 64, 128, 256, 512):
        q = qd[:B]
        dt_b = timed(brute, q)
        _, ib = brute(q)
        rec_b = float((np.asarray(ib)[:, :, None] == ref[:B, None, :]).any(1).mean())
        dfn = idx.device_searcher(k=K, nprobe=8, rescore_factor=8)
        dt_i = timed(dfn, q)
        _, ii = dfn(q)
        rec_i = float((np.asarray(ii)[:, :, None] == ref[:B, None, :]).any(1).mean())
        win = "IVF" if dt_i < dt_b else "brute"
        print(f"B={B:4d}: brute {dt_b*1e3:7.2f} ms (r={rec_b:.4f})  "
              f"ivf(np8) {dt_i*1e3:7.2f} ms (r={rec_i:.4f})  -> {win}", flush=True)


if __name__ == "__main__":
    main()
