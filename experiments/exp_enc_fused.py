"""Encoder round 3: fused Pallas attention + serving-stage breakdown.

Round-2 state: full forward (B=512, S=32) = 181 ms (79.6 TF/s, 40% MFU),
attention ~2/3 of the step; serving encoder stage = 1,602 QPS (320
ms/batch) -> ~140 ms/batch of host-side cost on top of the forward.

This measures on one v5e:
  1. forward, XLA reference attention   (round-2 baseline)
  2. forward, fused Pallas attention    (kernels/attention.py)
  3. tokenize-only host cost for 512 queries
  4. BatchedEncoder.encode() sync       (the serving encoder stage)
  5. encode_device + single host sync   (the pipelined serving stage)

Run: bash tools/tpu_run.sh experiments/exp_enc_fused.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from theoremsearch_tpu.core.config import EncoderConfig
from theoremsearch_tpu.encoder.batching import BatchedEncoder
from theoremsearch_tpu.encoder.model import encode_pooled, init_params

B, S = 512, 32
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


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = EncoderConfig(max_seq_len=64)
    params = jax.device_put(init_params(cfg, jax.random.PRNGKey(0)))
    ids = np.random.default_rng(0).integers(3, cfg.vocab_size, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    ids_d, mask_d = jnp.asarray(ids), jnp.asarray(mask)
    flops = 2 * 28 * 15.7e6 * B * S

    for mode in ("off", "on"):
        fn = jax.jit(functools.partial(encode_pooled, cfg=cfg, fused=mode))
        dt = timed(fn, params, ids_d, mask_d)
        print(
            f"forward fused={mode:3s} : {dt*1e3:7.2f} ms  "
            f"{flops/dt/1e12:6.1f} TF/s  {B/dt:,.0f} q/s",
            flush=True,
        )

    # serving-stage breakdown
    rng = np.random.default_rng(0)
    queries = [
        " ".join(rng.choice(QUERY_WORDS, size=rng.integers(6, 13)))
        for _ in range(B)
    ]
    enc = BatchedEncoder(params, cfg, batch_size=B, buckets=(32, 64))

    tok = enc.tokenizer
    dt = timed_host(lambda: [tok.tokenize(t) for t in queries])
    print(f"tokenize x{B}     : {dt*1e3:7.2f} ms", flush=True)

    dt = timed_host(lambda: tok(queries, max_length=32, pad_to=32))
    print(f"tokenize+pad x{B} : {dt*1e3:7.2f} ms", flush=True)

    dt = timed_host(lambda: enc.encode(queries))
    print(f"encode() sync     : {dt*1e3:7.2f} ms  {B/dt:,.0f} q/s", flush=True)

    def dev_sync():
        out = enc.encode_device(queries)
        _ = np.asarray(out[:1, :1])

    dt = timed_host(dev_sync)
    print(f"encode_device+sync: {dt*1e3:7.2f} ms  {B/dt:,.0f} q/s", flush=True)


if __name__ == "__main__":
    main()
