"""Gemma-family encoder on one v5e: forward + serving-stage rates.

The reference registers two embedder aliases (qwen 0.6B / gemma 300m,
ec2/generate_embeddings/embedders.py:1-4). Serving is encoder-bound
(SERVE_BENCH_r03), so the ~half-size gemma tower is also the fast-serving
option — this measures how much of that shows up end to end:

  1. full-size EmbeddingGemma-300m-class forward at (512, 32) and
     (512, 16)   [random init — identical FLOPs to the real checkpoint]
  2. BatchedEncoder.encode() sync and encode_device pipelined rates
  3. the qwen fused forward at the same shapes for the head-to-head

Run: bash tools/tpu_run.sh experiments/exp_gemma_enc.py
"""
import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from theoremsearch_tpu.core.config import EncoderConfig, GemmaEncoderConfig
from theoremsearch_tpu.encoder.batching import BatchedEncoder
from theoremsearch_tpu.encoder import gemma
from theoremsearch_tpu.encoder import model as qwen

B = 512
QUERY_WORDS = (
    "bound chromatic number planar graph spectral gap expander random "
    "matrix eigenvalue distribution prime counting zeta zero free region "
    "elliptic curve rank torsion modular form hecke operator sheaf "
    "cohomology vanishing ample divisor ricci flow curvature pinching"
).split()


def timed(fn, *args, iters=10, rounds=3):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    best = 1e9
    for _ in range(rounds):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = min(best, (time.time() - t0) / iters)
    return best


def timed_host(fn, iters=5):
    fn()
    t0 = time.time()
    for _ in range(iters):
        fn()
    return (time.time() - t0) / iters


def param_count(p):
    return sum(int(np.prod(a.shape)) for a in jax.tree.leaves(p))


def matmul_param_count(p):
    """Params that actually multiply (embedding tables are gathers, not
    matmuls — counting them overstates TF/s asymmetrically: the table is
    ~2/3 of gemma's params but ~1/4 of qwen's)."""
    return sum(
        int(np.prod(a.shape))
        for k, a in jax.tree_util.tree_flatten_with_path(p)[0]
        if "embed" not in str(k)
    ) if isinstance(p, dict) else 0


def main():
    print("devices:", jax.devices(), flush=True)
    out = {"metric": "gemma_encoder", "batch": B, "points": {}}

    gcfg = GemmaEncoderConfig(max_seq_len=64)
    gparams = jax.device_put(gemma.init_params(gcfg, jax.random.PRNGKey(0)))
    n_g = matmul_param_count(gparams)
    print(f"gemma params: {param_count(gparams)/1e6:.1f}M "
          f"({n_g/1e6:.1f}M matmul)", flush=True)

    qcfg = EncoderConfig(max_seq_len=64)
    qparams = jax.device_put(qwen.init_params(qcfg, jax.random.PRNGKey(0)))
    n_q = matmul_param_count(qparams)

    for S in (16, 32):
        ids = np.random.default_rng(0).integers(3, gcfg.vocab_size, (B, S)).astype(np.int32)
        mask = np.ones((B, S), np.int32)
        ids_d, mask_d = jnp.asarray(ids), jnp.asarray(mask)

        gflops = 2 * n_g * B * S
        dt = None
        for mode in ("off", "on"):
            gfn = jax.jit(functools.partial(gemma.encode_pooled, cfg=gcfg, fused=mode))
            dt = timed(gfn, gparams, ids_d, mask_d)
            print(
                f"gemma  S={S:3d} fused={mode:3s}: {dt*1e3:7.2f} ms  "
                f"{gflops/dt/1e12:6.1f} TF/s  {B/dt:,.0f} q/s", flush=True,
            )
            out["points"][f"gemma_s{S}_fused_{mode}"] = {
                "ms": round(dt * 1e3, 2), "qps": round(B / dt, 1),
            }

        ids_q = np.random.default_rng(0).integers(3, qcfg.vocab_size, (B, S)).astype(np.int32)
        qfn = jax.jit(functools.partial(qwen.encode_pooled, cfg=qcfg, fused="on"))
        dtq = timed(qfn, qparams, jnp.asarray(ids_q), mask_d)
        print(
            f"qwen   S={S:3d}: {dtq*1e3:7.2f} ms  {2*n_q*B*S/dtq/1e12:6.1f} TF/s  "
            f"{B/dtq:,.0f} q/s  (gemma {dtq/dt:.2f}x faster)", flush=True,
        )
        out["points"][f"qwen_s{S}"] = {"ms": round(dtq * 1e3, 2), "qps": round(B / dtq, 1)}

    # serving-stage rates (hash tokenizer; host tokenize + device encode)
    rng = np.random.default_rng(0)
    queries = [
        " ".join(rng.choice(QUERY_WORDS, size=rng.integers(6, 13)))
        for _ in range(B)
    ]
    enc = BatchedEncoder(gparams, gcfg, batch_size=B, buckets=(16, 32, 64))
    dt = timed_host(lambda: enc.encode(queries))
    print(f"gemma encode() sync     : {dt*1e3:7.2f} ms  {B/dt:,.0f} q/s", flush=True)
    out["points"]["gemma_encode_sync"] = {"ms": round(dt * 1e3, 2), "qps": round(B / dt, 1)}

    def dev_sync():
        o = enc.encode_device(queries)
        _ = np.asarray(o[:1, :1])

    dt = timed_host(dev_sync)
    print(f"gemma encode_device+sync: {dt*1e3:7.2f} ms  {B/dt:,.0f} q/s", flush=True)
    out["points"]["gemma_encode_device"] = {"ms": round(dt * 1e3, 2), "qps": round(B / dt, 1)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
