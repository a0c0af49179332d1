"""Encoder serving batch-size sweep: amortize the tunnel's fixed
per-transfer latency.

exp_enc_stage.py measured each tunnel transfer at ~18 ms of round-trip
latency REGARDLESS of size, and the pipelined encode ceiling sits ~36 ms
per batch above the raw forward — consistent with h2d + d2h not
overlapping device compute on this link.  If so, doubling the sub-batch
halves the per-query tunnel tax: batch 1024 at S=16 is still only
16k tokens (VMEM/HBM trivial) and the forward should scale ~linearly.

Sweep: streamed int8 encode() over 8192 texts at batch_size 256..2048.

VERDICT (2026-08-19 run): NO — per-query throughput declines with batch
size (256: 2,421 q/s, 512: 2,324, 1024: 2,237, 2048: 2,019; sub-batch
time grows ~2.08x per doubling). On this run the tunnel was bandwidth-
bound (transfers scaled with size), not latency-bound as in the
exp_enc_stage measurement — absolute rates also sat ~2x below the
same-code 4,582 q/s measured hours earlier, so the link's regime
drifts between latency- and bandwidth-bound across sessions. Batch 512
stays: batch amortization only pays in the latency-bound regime, and a
production (PCIe-local) chip has neither problem.
"""
import time

import numpy as np

from theoremsearch_tpu.core.config import EncoderConfig
from theoremsearch_tpu.encoder.batching import BatchedEncoder
from theoremsearch_tpu.encoder.model import init_params
import jax

cfg = EncoderConfig(max_seq_len=64)
params = jax.device_put(init_params(cfg, jax.random.PRNGKey(0)))

rng = np.random.default_rng(0)
WORDS = ("prime ideal scheme functor sheaf homology metric tensor field "
         "group ring module lattice graph measure operator spectrum").split()
queries = [
    " ".join(rng.choice(WORDS, size=rng.integers(5, 15)))
    for _ in range(8192)
]

ref = None
for bs in (256, 512, 1024, 2048):
    be = BatchedEncoder(params, cfg, batch_size=bs, quant="int8")
    _ = be.encode(queries[: 2 * bs])     # warm the programs
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        out = be.encode(queries)
        best = min(best, time.time() - t0)
    qps = len(queries) / best
    if ref is None:
        ref = out
    cos = float(np.min(np.sum(ref * out, axis=1)))
    print(f"batch {bs:5d}: streamed {qps:7.0f} q/s "
          f"({best*1e3/ (len(queries)/bs):6.1f} ms/sub-batch)  "
          f"cos-vs-b256 min {cos:.6f}", flush=True)
