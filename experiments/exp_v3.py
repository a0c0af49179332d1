"""Experiment: time the V3 streaming tile-top-T kernel + honest pipeline.

1M x 1024 global-scale int8 corpus on one v5e chip.

Run: bash tools/tpu_run.sh experiments/exp_v3.py > /tmp/v3.log 2>&1
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from theoremsearch_tpu.kernels.mips import fused_mips_topk_g, device_rescore

N, D, K, KR = 1_048_576, 1024, 10, 40


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

    for B in (512, 1024):
        q = qf[:B]
        for rb in (1024, 2048, 4096):
            for exact2 in (False, True):
                label = f"B={B} rb={rb} exact2={int(exact2)}"
                try:
                    fn = lambda qq: fused_mips_topk_g(
                        qq, codes, gscale, k=KR, row_block=rb, top_t=2,
                        exact2=exact2)
                    dt = timed(fn, q)
                    def pipe(qq):
                        _, i40 = fn(qq)
                        return device_rescore(qq, i40, x_bf16, k=K)
                    dtp = timed(pipe, q)
                    _, ri = pipe(q)
                    rec = recall(np.asarray(ri))
                    _, i10 = fused_mips_topk_g(q, codes, gscale, k=K, row_block=rb,
                                               top_t=2, exact2=exact2)
                    rec10 = recall(np.asarray(i10))
                    print(f"{label}: scan {dt*1e3:6.2f} ms ({B/dt:9,.0f} QPS) | "
                          f"pipeline {dtp*1e3:6.2f} ms ({B/dtp:9,.0f} QPS) "
                          f"recall@10={rec:.4f} | direct-k10 recall={rec10:.4f}")
                except Exception as e:
                    print(f"{label}: FAIL {str(e)[:180]}")


if __name__ == "__main__":
    main()
