"""Break the BatchedEncoder serving stage into components at batch 512,
bucket 16 (the measured serving shape): tokenize, batch assembly,
host->device transfer, forward dispatch+compute, device->host pull.

The r03 serve bench shows the stage at ~2.5-3.3k q/s while the raw
forward runs ~7.5k q/s — this probe attributes the missing 2/3.

Run: bash tools/tpu_run.sh experiments/exp_enc_stage.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from theoremsearch_tpu.core.config import EncoderConfig
from theoremsearch_tpu.encoder.batching import BatchedEncoder
from theoremsearch_tpu.encoder.model import encode_pooled, init_params

cfg = EncoderConfig(max_seq_len=64)
params = jax.device_put(init_params(cfg, jax.random.PRNGKey(0)))

rng = np.random.default_rng(0)
WORDS = ["group", "bound", "prime", "chromatic", "measure", "algebra",
         "sheaf", "cohomology", "of", "the", "finite", "simple", "number"]
queries = [" ".join(rng.choice(WORDS, rng.integers(5, 14))) for _ in range(4096)]

be = BatchedEncoder(params, cfg, batch_size=512, buckets=(16, 32, 64))
_ = be.encode(queries[:512])  # warm / compile

fn = jax.jit(functools.partial(encode_pooled, cfg=cfg, fused="on"))


def bench(label, thunk, n=5):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        thunk()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:28s} {best*1e3:8.2f} ms", flush=True)
    return best


batch = queries[:512]
tokenized = [be.tokenizer.tokenize(t) for t in batch]
enc = be.tokenizer.encode_pretokenized(tokenized, pad_to=16)
ids_h, mask_h = enc.input_ids, enc.attention_mask
ids_d, mask_d = jnp.asarray(ids_h), jnp.asarray(mask_h)
out_d = fn(params, ids_d, mask_d)
jax.block_until_ready(out_d)

bench("tokenize x512", lambda: [be.tokenizer.tokenize(t) for t in batch])
bench("assemble (pretokenized)", lambda: be.tokenizer.encode_pretokenized(tokenized, pad_to=16))
bench("h2d transfer", lambda: jax.block_until_ready(
    (jnp.asarray(ids_h), jnp.asarray(mask_h))))


def fwd():
    jax.block_until_ready(fn(params, ids_d, mask_d))


bench("forward (device-resident)", fwd)
bench("d2h pull (512,1024)f32", lambda: np.asarray(out_d))


def full_sync():
    o = fn(params, jnp.asarray(ids_h), jnp.asarray(mask_h))
    return np.asarray(o)


bench("h2d+fwd+pull (one batch)", full_sync)
bench("be.encode(512)", lambda: be.encode(batch))

# pipelined: dispatch batch i+1 before pulling batch i
batches = [queries[i * 512:(i + 1) * 512] for i in range(8)]
prepped = []
for b in batches:
    tk = [be.tokenizer.tokenize(t) for t in b]
    e = be.tokenizer.encode_pretokenized(tk, pad_to=16)
    prepped.append((e.input_ids, e.attention_mask))


def serial8():
    for ih, mh in prepped:
        np.asarray(fn(params, jnp.asarray(ih), jnp.asarray(mh)))


def pipelined8():
    pend = None
    for ih, mh in prepped:
        o = fn(params, jnp.asarray(ih), jnp.asarray(mh))
        if pend is not None:
            np.asarray(pend)
        pend = o
    np.asarray(pend)


t = bench("serial 8 batches", serial8, n=3)
print(f"  -> {8*512/t:7.0f} q/s", flush=True)
t = bench("pipelined 8 batches", pipelined8, n=3)
print(f"  -> {8*512/t:7.0f} q/s", flush=True)
# the production path: encode() with its prefetch thread (h2d of batch
# i+1 overlaps batch i's forward) + dispatch-ahead (pull of batch i
# overlaps batch i+1's forward)
t = bench("be.encode(4096) streamed", lambda: be.encode(queries), n=3)
print(f"  -> {4096/t:7.0f} q/s", flush=True)
