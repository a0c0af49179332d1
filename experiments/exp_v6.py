"""V6: pin the recall ceiling + tune the epilogue at the winning config.

- bf16-exact full-scan recall vs fp32 oracle (the rescore-dtype ceiling)
- (B=1024, rb=4096): kr=40 x rt {0.95, 0.97}; aggregate_to_topk=False
- B=2048 feasibility
Run: bash tools/tpu_run.sh experiments/exp_v6.py > /tmp/v6.log 2>&1
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, D, K = 1_048_576, 1024, 10
INT32_MIN = -(2**31) + 1


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


def maxima_kernel(g, gs):
    def kernel(q_ref, c_ref, out_ref):
        acc = jax.lax.dot_general(
            q_ref[:], c_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        m1 = None
        for grp in range(g):
            sl = (acc[:, grp * 128 : (grp + 1) * 128] << gs) | grp
            m1 = sl if m1 is None else jnp.maximum(m1, sl)
        out_ref[...] = m1

    return kernel


@functools.partial(jax.jit, static_argnames=("rb",))
def scan_maxima(q8, codes, rb):
    b = q8.shape[0]
    nt = N // rb
    g = rb // 128
    gs = g.bit_length() - 1
    return pl.pallas_call(
        maxima_kernel(g, gs),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((b, D), lambda i: (0, 0)),
            pl.BlockSpec((rb, D), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((b, 128), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b, nt * 128), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * N * D, bytes_accessed=N * D + b * D, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(q8, codes)


@functools.partial(jax.jit, static_argnames=("rb", "kr", "rt", "agg", "k"))
def finish(q, cand, corp_bf16, rb, kr, rt, agg=True, k=K):
    g = rb // 128
    gs = g.bit_length() - 1
    _, pos = jax.lax.approx_max_k(
        cand.astype(jnp.float32), kr, recall_target=rt, aggregate_to_topk=agg
    )
    pos = pos.astype(jnp.int32)
    vi = jnp.take_along_axis(cand, pos, axis=1)
    ids = (pos // 128) * rb + (vi & (g - 1)) * 128 + pos % 128
    c = jnp.take(corp_bf16, ids, axis=0)
    s = jax.lax.dot_general(
        c, q.astype(c.dtype), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    ts, sel = jax.lax.top_k(s, k)
    return ts, jnp.take_along_axis(ids, sel, axis=1)


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
    codes = jnp.clip(jnp.round(xf * (127.0 / jnp.max(jnp.abs(xf)))), -127, 127).astype(jnp.int8)
    x_bf16 = xf.astype(jnp.bfloat16)
    jax.block_until_ready((codes, x_bf16))

    Bmax = 2048
    qf = jax.random.normal(kq, (Bmax, D), jnp.float32)
    qf = qf / jnp.linalg.norm(qf, axis=1, keepdims=True)

    @jax.jit
    def exact10(q, corpus):
        s = jax.lax.dot_general(q, corpus, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jax.lax.top_k(s, K)[1]

    exact_ids = np.concatenate(
        [np.asarray(exact10(qf[i:i+128], xf)) for i in range(0, Bmax, 128)])
    print("oracle done")

    # bf16 exact-scan ceiling
    @jax.jit
    def bf16_top10(q, corp):
        s = jax.lax.dot_general(q.astype(jnp.bfloat16), corp,
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jax.lax.top_k(s, K)[1]

    bf_ids = np.concatenate(
        [np.asarray(bf16_top10(qf[i:i+128], x_bf16)) for i in range(0, 1024, 128)])
    ceil = float((bf_ids[:, :, None] == exact_ids[:1024, None, :]).any(1).mean())
    print(f"bf16 exact-scan recall ceiling = {ceil:.4f}")
    del xf

    def q8_of(q):
        qm = jnp.max(jnp.abs(q), axis=1, keepdims=True) / 127.0
        return jnp.clip(jnp.round(q / qm), -127, 127).astype(jnp.int8)

    def recall(ids):
        return float((ids[:, :, None] == exact_ids[:len(ids), None, :]).any(1).mean())

    cases = [
        (1024, 4096, 40, 0.95, True),
        (1024, 4096, 40, 0.97, True),
        (1024, 4096, 40, 0.95, False),
        (1024, 4096, 64, 0.95, False),
        (1024, 8192, 40, 0.95, False),
        (2048, 4096, 40, 0.95, True),
        (2048, 4096, 40, 0.95, False),
    ]
    for B, rb, kr, rt, agg in cases:
        q = qf[:B]
        label = f"B={B} rb={rb} kr={kr} rt={rt} agg={int(agg)}"
        try:
            def full(qq):
                cand = scan_maxima(q8_of(qq), codes, rb)
                return finish(qq, cand, x_bf16, rb, kr, rt, agg)
            dt = timed(full, q)
            _, ri = full(q)
            rec = recall(np.asarray(ri))
            print(f"{label}: {dt*1e3:6.2f} ms ({B/dt:9,.0f} QPS) recall@10={rec:.4f}")
        except Exception as ex:
            print(f"{label}: FAIL {str(ex)[:150]}")


if __name__ == "__main__":
    main()
