"""Isolate per-call dispatch/marshaling cost vs argument leaf count on
the tunnel-attached chip.  exp_arg_overhead.py showed async per-call
time == raw forward for the 310-leaf encoder (marshal hidden under
exec), but the int8 stage A/B (710 leaves incl. qlayers) regressed
despite a faster forward — hypothesis: marshal cost grows with leaf
count and stops hiding once it exceeds exec time.

Probe: jit fn of L leaves with ~zero device work (reads 1 element per
leaf), timed async (dispatch-limited).  Any slope vs L is pure per-leaf
dispatch cost; the intercept is the per-call floor.

VERDICT (2026-08-18 run on v5e, /tmp/dispatch_cost.log): per-leaf
dispatch ~1.0 us/leaf, per-call floor 0.75 ms.  L=700 costs 1.49
ms/call — negligible against the encoder's 55-73 ms forward, so leaf
count does NOT explain the cross-session int8 stage regression (which
a same-process rerun showed to be tunnel drift; exp_enc_int8_ab.py).

Run: bash tools/tpu_run.sh experiments/exp_dispatch_cost.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)


def probe(n_leaves: int, n_calls: int = 50):
    leaves = [
        jax.device_put(jnp.asarray(rng.standard_normal(8), jnp.float32))
        for _ in range(n_leaves)
    ]

    @jax.jit
    def f(ls):
        return sum(l[0] for l in ls)

    f(leaves).block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(n_calls):
            out = f(leaves)
        _ = float(out)
        best = min(best, (time.time() - t0) / n_calls)
    print(f"L={n_leaves:4d}: {best*1e3:7.3f} ms/call async", flush=True)
    return best


ts = {L: probe(L) for L in (1, 10, 50, 100, 300, 700)}
l0, l1 = 100, 700
slope = (ts[l1] - ts[l0]) / (l1 - l0)
print(f"per-leaf dispatch cost ~ {slope*1e6:.1f} us/leaf; "
      f"floor ~ {ts[1]*1e3:.3f} ms/call", flush=True)
