"""A/B the production BatchedEncoder stage: bf16 vs int8 quant mode,
same process / same queries / same tunnel conditions (cross-session
serve-bench comparisons drift 20-30% with tunnel state; this probe
cancels that). ENC_FAMILY={qwen,gemma} picks the tower.

Run: bash tools/tpu_run.sh experiments/exp_enc_int8_ab.py"""
import functools
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from theoremsearch_tpu.encoder.batching import BatchedEncoder

FAMILY = os.environ.get("ENC_FAMILY", "qwen")
if FAMILY == "gemma":
    from theoremsearch_tpu.core.config import GemmaEncoderConfig
    from theoremsearch_tpu.encoder.gemma import (
        encode_pooled, init_params, quantize_params_int8,
    )

    cfg = GemmaEncoderConfig(max_seq_len=64)
else:
    from theoremsearch_tpu.core.config import EncoderConfig
    from theoremsearch_tpu.encoder.model import (
        encode_pooled, init_params, quantize_params_int8,
    )

    cfg = EncoderConfig(max_seq_len=64)

params = jax.device_put(init_params(cfg, jax.random.PRNGKey(0)))

rng = np.random.default_rng(0)
WORDS = ["group", "bound", "prime", "chromatic", "measure", "algebra",
         "sheaf", "cohomology", "of", "the", "finite", "simple", "number"]
queries = [" ".join(rng.choice(WORDS, rng.integers(5, 14))) for _ in range(4096)]

print(f"family={FAMILY}  layers={cfg.num_layers}  d={cfg.hidden_size}", flush=True)
for quant in ("none", "int8"):
    be = BatchedEncoder(params, cfg, batch_size=512, buckets=(16, 32, 64), quant=quant)
    _ = be.encode(queries[:512])  # warm
    best = 1e9
    for r in range(3):
        t0 = time.time()
        for i in range(3):
            _ = be.encode(queries[i*512:(i+1)*512])
        best = min(best, (time.time() - t0) / 3)
    print(f"{quant:5s}: {best*1e3:7.1f} ms/batch512  {512/best:7.0f} q/s", flush=True)
    # streamed form: ONE encode() over all 4096 — the prefetch-thread +
    # dispatch-ahead pipeline engages (batching.py), composing with int8
    best = 1e9
    for r in range(2):
        t0 = time.time()
        _ = be.encode(queries)
        best = min(best, time.time() - t0)
    print(f"{quant:5s} streamed(4096): {4096/best:7.0f} q/s", flush=True)

# raw forward at the actual serving width, same process
tok = be.tokenizer
enc = tok(queries[:512], max_length=16, pad_to=16)
ids, mask = jnp.asarray(enc.input_ids), jnp.asarray(enc.attention_mask)
qlayers = jax.jit(quantize_params_int8)(params)
f16 = jax.jit(functools.partial(encode_pooled, cfg=cfg, fused="on"))
f8 = jax.jit(functools.partial(encode_pooled, cfg=cfg, fused="on"))
def timed(fn, *a, **kw):
    out = fn(*a, **kw); _ = np.asarray(out)[:1, :1]
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(10):
            out = fn(*a, **kw)
        _ = np.asarray(out)[:1, :1]
        best = min(best, (time.time() - t0) / 10)
    return best
t = timed(f16, params, ids, mask)
print(f"fwd bf16 (512,16): {t*1e3:6.1f} ms", flush=True)
t8 = timed(f8, params, ids, mask, qlayers=qlayers)
print(f"fwd int8 (512,16): {t8*1e3:6.1f} ms  speedup {t/t8:.2f}x", flush=True)
e16 = np.asarray(f16(params, ids, mask))
e8 = np.asarray(f8(params, ids, mask, qlayers=qlayers))
cos = np.sum(e16 * e8, axis=1)
print(f"cos min/mean vs bf16: {cos.min():.5f}/{cos.mean():.5f}", flush=True)
