"""Is per-call argument marshaling a real cost on the tunnel-attached
chip?  The encoder forward passes ~300 param leaves per call (int8 mode
~700); a cross-session int8 A/B once showed stage overhead GROWING with
leaf count even though the forward shrank, suggesting a per-leaf
dispatch tax.

A/B/C on the identical forward:
  (a) params as a per-call argument pytree (~300 buffer handles/call)
  (b) params closed over the jit (captured once into the executable)
  (c) params packed into ONE flat bf16 buffer, statically re-sliced
      inside the jit (1 handle/call, swappable without recompile)

Each is timed two ways:
  async: n dispatches, pull only the last result (dispatch overlaps
         device exec — hides marshaling when marshal < exec)
  sync:  pull every result (the serving path's per-call shape)

VERDICT (2026-08-18 run on v5e, /tmp/arg_overhead.log):
  (a) async 68.2 ms/call == the 68.3 ms raw forward: all 310 leaves'
      marshaling hides under device exec.  sync adds ~95 ms — that is
      the device->host result-pull round trip, not marshaling (hidden
      by batching.py's dispatch-ahead pipeline in serving).
  (c) packed measured SLOWER (async 77-81 ms): the in-jit re-slices
      materialize ~13 ms of copies per call.
  (b) compiles pathologically — XLA embeds the 1.19 GB of consts into
      the executable; >10 min, never completed over the tunnel.  The
      run is gated behind RUN_CLOSED=1 so reruns don't hang on it.
  Per-call pytree args are the right design; exp_dispatch_cost.py puts
  the per-leaf dispatch cost at ~1 us/leaf (0.7 ms at int8's ~700
  leaves), and the cross-session "regression" was tunnel drift
  (exp_enc_int8_ab.py same-process: int8 beats bf16 1.33x per-call,
  1.28x streamed).

Run: bash tools/tpu_run.sh experiments/exp_arg_overhead.py
"""
import os
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from theoremsearch_tpu.core.config import EncoderConfig
from theoremsearch_tpu.encoder.model import encode_pooled, init_params

cfg = EncoderConfig(max_seq_len=64)
params = jax.device_put(init_params(cfg, jax.random.PRNGKey(0)))
leaves, treedef = jax.tree_util.tree_flatten(params)
n_leaves = len(leaves)
print(f"param leaves: {n_leaves}", flush=True)

rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (512, 16), dtype=np.int32))
mask = jnp.ones((512, 16), jnp.int32)

# ---- (c) pack: one flat buffer PER DTYPE + static unpack -----------
dtypes = sorted({str(l.dtype) for l in leaves})
by_dt = {dt: [i for i, l in enumerate(leaves) if str(l.dtype) == dt]
         for dt in dtypes}
packs = {}
for dt, idxs in by_dt.items():
    sizes = [int(np.prod(leaves[i].shape)) for i in idxs]
    offs = np.cumsum([0] + sizes).tolist()
    packs[dt] = (idxs, offs)
flat = tuple(
    jnp.concatenate([leaves[i].reshape(-1) for i in by_dt[dt]])
    for dt in dtypes
)
print(f"packed: {len(dtypes)} buffers "
      f"({', '.join(f'{dt} {b.nbytes/1e9:.2f} GB' for dt, b in zip(dtypes, flat))})",
      flush=True)


def unpack(bufs):
    ls = [None] * len(leaves)
    for dt, buf in zip(dtypes, bufs):
        idxs, offs = packs[dt]
        for j, i in enumerate(idxs):
            ls[i] = jax.lax.slice_in_dim(
                buf, offs[j], offs[j + 1]
            ).reshape(leaves[i].shape)
    return jax.tree_util.tree_unflatten(treedef, ls)


f_arg = jax.jit(functools.partial(encode_pooled, cfg=cfg, fused="on"))


@jax.jit
def f_packed(buf, ids, mask):
    return encode_pooled(unpack(buf), ids, mask, cfg=cfg, fused="on")


@jax.jit
def f_closed(ids, mask):
    return encode_pooled(params, ids, mask, cfg=cfg, fused="on")


def timed(label, thunk, n=10):
    t0 = time.time()
    out = thunk()
    np.asarray(out)
    print(f"{label:28s} first call (compile+run): "
          f"{time.time()-t0:6.1f} s", flush=True)
    best_async = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(n):
            out = thunk()
        _ = np.asarray(out)[:1, :1]
        best_async = min(best_async, (time.time() - t0) / n)
    best_sync = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(n):
            _ = np.asarray(thunk())[:1, :1]
        best_sync = min(best_sync, (time.time() - t0) / n)
    print(f"{label:28s} async {best_async*1e3:7.2f} ms/call   "
          f"sync {best_sync*1e3:7.2f} ms/call", flush=True)
    return best_async, best_sync


t_arg = timed("(a) params per-call args", lambda: f_arg(params, ids, mask))
t_pack = timed("(c) packed single buffer", lambda: f_packed(flat, ids, mask))

for mode, i in (("async", 0), ("sync", 1)):
    print(f"{mode}: arg {t_arg[i]*1e3:.2f}  packed {t_pack[i]*1e3:.2f} ms "
          f"-> arg overhead {(t_arg[i]-t_pack[i])*1e3:+.2f} ms vs packed",
          flush=True)

# parity: unpack is leaf-bit-exact (verified on CPU), but distinct
# compiled programs reassociate bf16 fusions, so compare by cosine
o1 = np.asarray(f_arg(params, ids, mask))
o3 = np.asarray(f_packed(flat, ids, mask))
print("cos(arg,packed) min:", float((o1 * o3).sum(-1).min()), flush=True)

if os.environ.get("RUN_CLOSED") == "1":
    # known-pathological: XLA embeds 1.19 GB of consts (>10 min compile)
    t_cl = timed("(b) params closed over jit", lambda: f_closed(ids, mask))
    o2 = np.asarray(f_closed(ids, mask))
    print("cos(arg,closed) min:", float((o1 * o2).sum(-1).min()), flush=True)
