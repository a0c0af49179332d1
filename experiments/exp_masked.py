"""Masked speed path on chip: filtered scan at B=512, 1M x 1024.

Measured 2026-08-17 on one v5e (30%-pass mask):
  masked speed path : 5.22 ms  98,111 QPS  recall@10 = 0.9957
  per-row bias path : 9.74 ms  52,565 QPS  recall@10 = 0.9975

Run: bash tools/tpu_run.sh experiments/exp_masked.py
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from theoremsearch_tpu.kernels.mips import device_rescore, fused_mips_topk, fused_mips_topk_g

N, D, B, K, KR = 1_048_576, 1024, 512, 10, 40

def timed(fn, q, iters=30, rounds=3):
    out = fn(q)
    _ = np.asarray(jax.tree.leaves(out)[0][:1, :1])
    best = 1e9
    for _ in range(rounds):
        t0 = time.time()
        for _ in range(iters):
            out = fn(q)
        _ = np.asarray(jax.tree.leaves(out)[0][:1, :1])
        best = min(best, (time.time() - t0) / iters)
    return best

key = jax.random.PRNGKey(0)
kq, kc = jax.random.split(key)
@jax.jit
def gen(k):
    x = jax.random.normal(k, (N, D), jnp.float32)
    return x / jnp.linalg.norm(x, axis=1, keepdims=True)
xf = gen(kc)
gscale = float(jnp.max(jnp.abs(xf)) / 127.0)
codes = jnp.clip(jnp.round(xf / gscale), -127, 127).astype(jnp.int8)
bf16 = xf.astype(jnp.bfloat16)
jax.block_until_ready((codes, bf16))
q = jax.random.normal(kq, (B, D), jnp.float32)
q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
rng = np.random.default_rng(0)
maskb = rng.random(N) < 0.3
mask = jnp.asarray(maskb)
ref = np.where(maskb[None, :], np.zeros((1,1)), -np.inf)  # placeholder
# oracle on masked rows (chunked)
@jax.jit
def exact_masked(qc, corpus, m):
    s = jax.lax.dot_general(qc, corpus, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = jnp.where(m[None, :], s, -jnp.inf)
    return jax.lax.top_k(s, K)[1]
refids = np.concatenate([np.asarray(exact_masked(q[i:i+128], xf, mask)) for i in range(0, B, 128)])
del xf
print("oracle done", flush=True)

def masked_speed(qq):
    _, i40 = fused_mips_topk_g(qq, codes, gscale, N, mask, k=KR, row_block=4096, recall_target=0.97)
    return device_rescore(qq, i40, bf16, N, k=K)
dt = timed(masked_speed, q)
_, ii = masked_speed(q)
rec = float((np.asarray(ii)[:, :, None] == refids[:, None, :]).any(1).mean())
print(f"masked speed path : {dt*1e3:6.2f} ms  {B/dt:9,.0f} QPS  recall={rec:.4f}", flush=True)

# per-row bias path baseline
@jax.jit
def perrow_quant(x):
    am = jnp.max(jnp.abs(x), axis=1)
    sc = jnp.where(am > 0, am / 127.0, 1.0)
    return jnp.clip(jnp.round(x / sc[:, None]), -127, 127).astype(jnp.int8), sc
codes_r, scales_r = perrow_quant(bf16.astype(jnp.float32))
bias = jnp.where(mask, 0.0, -jnp.inf).astype(jnp.float32)
jax.block_until_ready((codes_r, scales_r, bias))
def perrow_bias(qq):
    _, i40 = fused_mips_topk(qq, codes_r, scales_r, N, bias, k=KR, row_block=2048)
    return device_rescore(qq, i40, bf16, N, k=K)
dt = timed(perrow_bias, q)
_, ii = perrow_bias(q)
rec = float((np.asarray(ii)[:, :, None] == refids[:, None, :]).any(1).mean())
print(f"per-row bias path : {dt*1e3:6.2f} ms  {B/dt:9,.0f} QPS  recall={rec:.4f}", flush=True)
