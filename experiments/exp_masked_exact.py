"""Masked-path epilogue on chip: exact vs approx_max_k selection.

The filtered maxima-scan streams an int8 mask and drops excluded rows to
INT32_MIN *before* the per-lane reduction, so surviving candidates of a
CONTIGUOUS doc-id filter (e.g. year_range over an id-ordered corpus) end
up in adjacent columns of the (B, n_tiles*128) maxima. approx_max_k
bin-reduces adjacent columns on real TPU, so that layout collapses
filtered recall — invisible in interpret-mode CI where approx_max_k is
exact. The fix: the masked path selects with an exact two-stage top-k.

Measured 2026-08-17 on one v5e, 1M x 1024 / B=512 / retrieve-40 + bf16
rescore (post-rescore recall@10 vs the exact masked oracle):

  contiguous mask, approx epilogue:   5.69 ms   89,977 QPS  recall 0.9891
  contiguous mask, exact  epilogue:  11.31 ms   45,251 QPS  recall 0.9963
  random     mask, approx epilogue:   5.22 ms   98,124 QPS  recall 0.9957
  random     mask, exact  epilogue:  11.26 ms   45,459 QPS  recall 0.9975

The contiguous+approx row is the bug: 0.9891 < the 0.99 gate even after
rescore-40 rescues most bin-collapsed candidates — and a NARROWER
contiguous filter degrades further (fewer live columns per bin). The
exact epilogue holds the gate at a 2.2x scan cost, which is irrelevant
at serving rates (the e2e system is encoder-bound ~2k QPS).

Run: bash tools/tpu_run.sh experiments/exp_masked_exact.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from theoremsearch_tpu.kernels.mips import device_rescore, fused_mips_topk_g

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


@jax.jit
def exact_masked(qc, corpus, m):
    # precision=HIGHEST: TPU fp32 matmuls default to bf16-truncated
    # operands; a bf16-grade reference correlates with the bf16-rescore
    # pipelines under test and overstates their recall (eval/oracle.py)
    s = jax.lax.dot_general(
        qc, corpus, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    s = jnp.where(m[None, :], s, -jnp.inf)
    return jax.lax.top_k(s, K)[1]


rng = np.random.default_rng(0)
masks = {
    "contiguous": np.concatenate(
        [np.zeros(350_000, bool), np.ones(314_573, bool),
         np.zeros(N - 350_000 - 314_573, bool)]
    ),
    "random": rng.random(N) < 0.3,
}

for name, maskb in masks.items():
    mask = jnp.asarray(maskb)
    refids = np.concatenate(
        [np.asarray(exact_masked(q[i : i + 128], xf, mask)) for i in range(0, B, 128)]
    )
    for exact in (False, True):
        def run(qq, _mask=mask, _exact=exact):
            _, i40 = fused_mips_topk_g(
                qq, codes, gscale, N, _mask, k=KR, row_block=4096,
                recall_target=0.97, exact_epilogue=_exact,
            )
            return device_rescore(qq, i40, bf16, N, k=K)

        dt = timed(run, q)
        _, ii = run(q)
        rec = float((np.asarray(ii)[:, :, None] == refids[:, None, :]).any(1).mean())
        tag = "exact " if exact else "approx"
        print(
            f"{name:10s} mask, {tag} epilogue: {dt*1e3:6.2f} ms  "
            f"{B/dt:9,.0f} QPS  recall@10={rec:.4f}",
            flush=True,
        )
