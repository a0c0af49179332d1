"""Experiment: time fused_mips_topk_g variants + honest pipeline on TPU.

1M x 1024 global-scale int8 corpus. Measures:
  - kernel variants over (B, row_block) x exact2 x deferred
  - the honest pipeline: retrieve-40 (fused) -> device bf16 rescore -> top-10,
    timed end-to-end AND recall@10 vs the fp32 exact oracle
  - direct k=10 path recall (no rescore) for the same kernel

Run: bash tools/tpu_run.sh experiments/exp_v2.py > /tmp/v2.log 2>&1
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from theoremsearch_tpu.kernels.mips import fused_mips_topk_g, device_rescore

N, D, K = 1_048_576, 1024, 10
KR = 40


def timed(fn, q, iters=30, rounds=3):
    out = fn(q)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    best = 1e9
    for _ in range(rounds):
        t0 = time.time()
        for _ in range(iters):
            out = fn(q)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
        best = min(best, (time.time() - t0) / iters)
    return best


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    kq, kc = jax.random.split(key)

    # fp32 corpus (for oracle + bf16 copy), then int8 global codes
    @jax.jit
    def gen(key):
        x = jax.random.normal(key, (N, D), jnp.float32)
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    xf = gen(kc)
    jax.block_until_ready(xf)
    gscale = float(jnp.max(jnp.abs(xf)) / 127.0)
    codes = jnp.clip(jnp.round(xf / gscale), -127, 127).astype(jnp.int8)
    x_bf16 = xf.astype(jnp.bfloat16)
    jax.block_until_ready((codes, x_bf16))
    print(f"corpus built, global scale {gscale:.6f}")

    Bmax = 1024
    qf = jax.random.normal(kq, (Bmax, D), jnp.float32)
    qf = qf / jnp.linalg.norm(qf, axis=1, keepdims=True)

    # fp32 exact oracle (chunked over queries); corpus passed as an ARG —
    # closing over it bakes a 4GB constant into the remote compile
    @jax.jit
    def exact10(q, corpus):
        s = jax.lax.dot_general(q, corpus, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jax.lax.top_k(s, K)[1]

    exact_ids = np.concatenate(
        [np.asarray(exact10(qf[i : i + 128], xf)) for i in range(0, Bmax, 128)]
    )
    print("oracle done")
    del xf

    def recall(ids):
        return float((ids[:, :, None] == exact_ids[: len(ids), None, :]).any(1).mean())

    # --- kernel variants ---
    for B in (512, 1024):
        q = qf[:B]
        for rb in (1024, 2048):
            for exact2 in (False, True):
                for deferred in (False, True):
                    if deferred and B * rb * 4 * 2 > 9 * 2**20:
                        continue  # s_buf too big for VMEM
                    label = f"B={B} rb={rb} exact2={int(exact2)} deferred={int(deferred)}"
                    try:
                        fn = lambda qq: fused_mips_topk_g(
                            qq, codes, gscale, k=KR, row_block=rb,
                            exact2=exact2, deferred=deferred)
                        dt = timed(fn, q)
                        _, i40 = fn(q)
                        rs, ri = device_rescore(q, i40, x_bf16, k=K)
                        rec = recall(np.asarray(ri))
                        print(f"{label}: {dt*1e3:7.2f} ms  {B/dt:9,.0f} QPS  recall@10(rescored)={rec:.4f}")
                    except Exception as e:
                        print(f"{label}: FAIL {str(e)[:140]}")

    # --- honest pipeline timing at the best-looking configs ---
    for B, rb, exact2, deferred in (
        (1024, 1024, True, False),
        (1024, 1024, False, False),
        (1024, 1024, True, True),
        (512, 2048, True, False),
    ):
        q = qf[:B]
        label = f"PIPELINE B={B} rb={rb} exact2={int(exact2)} deferred={int(deferred)}"
        try:
            def pipe(qq):
                s40, i40 = fused_mips_topk_g(
                    qq, codes, gscale, k=KR, row_block=rb,
                    exact2=exact2, deferred=deferred)
                return device_rescore(qq, i40, x_bf16, k=K)
            dt = timed(pipe, q)
            rs, ri = pipe(q)
            rec = recall(np.asarray(ri))
            # direct k=10 (no rescore) recall for the same kernel
            _, i10 = fused_mips_topk_g(q, codes, gscale, k=K, row_block=rb,
                                       exact2=exact2, deferred=deferred)
            rec10 = recall(np.asarray(i10))
            print(f"{label}: {dt*1e3:7.2f} ms  {B/dt:9,.0f} QPS  recall@10={rec:.4f}  direct-k10 recall={rec10:.4f}")
        except Exception as e:
            print(f"{label}: FAIL {str(e)[:140]}")


if __name__ == "__main__":
    main()
