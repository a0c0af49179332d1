"""Does v5e give int4 matmul throughput above int8 through XLA?

If int4 x int4 -> int32 runs ~2x int8, the scan kernel could halve its
MXU floor (0.5 GB corpus reads too); recall would lean harder on the
oversample + bf16 rescore. This probes raw XLA matmul rates and a
quick ranking-quality check of int4 codes at D=1024.

Run: bash tools/tpu_run.sh experiments/exp_int4.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

M, K, N = 1024, 1024, 131_072


def timed(fn, *args, iters=30, rounds=3):
    out = fn(*args)
    _ = np.asarray(out.ravel()[:1])
    best = 1e9
    for _ in range(rounds):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        _ = np.asarray(out.ravel()[:1])
        best = min(best, (time.time() - t0) / iters)
    return best


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    a8 = jax.random.randint(key, (M, K), -127, 128, jnp.int8)
    b8 = jax.random.randint(key, (N, K), -127, 128, jnp.int8)

    @jax.jit
    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )

    fl = 2 * M * K * N
    dt = timed(mm, a8, b8)
    print(f"int8 x int8 : {dt*1e3:7.2f} ms  {fl/dt/1e12:6.1f} TOP/s", flush=True)

    try:
        a4 = a8.astype(jnp.int4)
        b4 = b8.astype(jnp.int4)
        dt = timed(mm, a4, b4)
        print(f"int4 x int4 : {dt*1e3:7.2f} ms  {fl/dt/1e12:6.1f} TOP/s", flush=True)
    except Exception as e:
        print(f"int4 matmul unsupported: {str(e)[:200]}", flush=True)

    try:
        dt = timed(mm, a4, b8)
        print(f"int4 x int8 : {dt*1e3:7.2f} ms  {fl/dt/1e12:6.1f} TOP/s", flush=True)
    except Exception as e:
        print(f"int4 x int8 unsupported: {str(e)[:160]}", flush=True)

    bb = jax.random.normal(key, (M, K), jnp.bfloat16)
    cb = jax.random.normal(key, (N, K), jnp.bfloat16)

    @jax.jit
    def mmb(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    dt = timed(mmb, bb, cb)
    print(f"bf16 x bf16 : {dt*1e3:7.2f} ms  {fl/dt/1e12:6.1f} TF/s", flush=True)

    # ranking quality: int4 global-scale codes of unit vectors, D=1024 —
    # what fraction of the true top-40 survives in the int4 top-40/96?
    kq, kc = jax.random.split(key)
    emb = jax.random.normal(kc, (N, K), jnp.float32)
    emb = emb / jnp.linalg.norm(emb, axis=1, keepdims=True)
    q = jax.random.normal(kq, (256, K), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    ref = np.asarray(jax.lax.top_k(mmb(q.astype(jnp.bfloat16), emb.astype(jnp.bfloat16)), 10)[1])
    g4 = float(jnp.max(jnp.abs(emb)) / 7.0)
    c4 = jnp.clip(jnp.round(emb / g4), -7, 7).astype(jnp.int8)
    qg = float(jnp.max(jnp.abs(q)) / 7.0)
    q4 = jnp.clip(jnp.round(q / qg), -7, 7).astype(jnp.int8)
    s4 = mm(q4, c4)
    for kk in (40, 96, 192):
        ids = np.asarray(jax.lax.top_k(s4, kk)[1])
        rec = float((ids[:, :, None] == ref[:, None, :]).any(1).mean())
        print(f"int4-levels top-10-in-{kk}: {rec:.4f}", flush=True)


if __name__ == "__main__":
    main()
