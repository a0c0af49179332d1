"""Does the int8 MLP's f32 dequant materialize (8192, 3072) float32
intermediates?  exp_enc_profile.py leaves ~14 ms of the int8 forward
unaccounted after matmul floor (26.5) + quant chain (4.9) + attn core
(4.6); two f32 gate/up tensors per layer are 200 MB -> 5.6 GB / 28L ->
~7 ms of HBM traffic if XLA doesn't fuse the dequant+silu+mul+quant
chain into the matmul epilogues (plus reads).

A/B: the shipped _mlp_int8 (gate/up dequant to f32) vs a variant that
dequants straight to bf16, x28 layers at the serving shape.  Also times
a residual-chained full layer stack (attn+mlp int8) both ways to see
the in-context effect.

Run: bash tools/tpu_run.sh experiments/exp_mlp_int8_dtype.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from theoremsearch_tpu.core.config import EncoderConfig
from theoremsearch_tpu.encoder import model as M

B, S = 512, 16
cfg = EncoderConfig(max_seq_len=64)
T = B * S
params = jax.device_put(M.init_params(cfg, jax.random.PRNGKey(0)))
qlayers = jax.jit(M.quantize_params_int8)(params)
jax.block_until_ready(qlayers)
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal((T, cfg.hidden_size)) * 0.1, jnp.bfloat16)


def mlp_f32(layer, lq, x):          # the shipped form (model.py:_mlp_int8)
    return M._mlp_int8(layer, lq, x, cfg.rms_norm_eps)


def mlp_bf16(layer, lq, x):         # dequant straight to bf16
    xq, sx = M._rmsnorm_quant_act(x, layer["mlp_norm"], cfg.rms_norm_eps)
    gate = M._q_matmul(xq, sx, lq["w_gate"], jnp.bfloat16)
    up = M._q_matmul(xq, sx, lq["w_up"], jnp.bfloat16)
    h = (jax.nn.silu(gate.astype(jnp.float32)).astype(jnp.bfloat16) * up)
    hq, sh = M._quant_act(h)
    return M._q_matmul(hq, sh, lq["w_down"], x.dtype)


def stack(mlp):
    def run(layers, qls, x):
        def body(x, lp_lq):
            lp, lq = lp_lq
            return x + mlp(lp, lq, x), None

        stacked_p = jax.tree_util.tree_map(
            lambda *ls: jnp.stack(ls),
            *[{"mlp_norm": l["mlp_norm"]} for l in layers],
        )
        stacked_q = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *qls)
        out, _ = jax.lax.scan(body, x, (stacked_p, stacked_q))
        return out

    return jax.jit(run)


def _sync(out):
    # block_until_ready is a no-op on the remote-attached chip (see
    # utils/profiling.py KernelTimer): sync via a 1-element host pull
    # (device-side slice first — pulling the full tensor would time the
    # 16 MB tunnel transfer, not the compute)
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.reshape(-1)[:1])


def timed(label, fn, *args, n=10):
    out = fn(*args)
    _sync(out)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.time() - t0) / n)
    print(f"{label:34s} {best*1e3:7.2f} ms", flush=True)
    return out, best


qmlp = [{k: lq[k] for k in ("w_gate", "w_up", "w_down")} for lq in qlayers]
o1, t1 = timed("mlp int8 f32-dequant x28", stack(mlp_f32),
               params["layers"], qmlp, x0)
o2, t2 = timed("mlp int8 bf16-dequant x28", stack(mlp_bf16),
               params["layers"], qmlp, x0)
c = (o1.astype(jnp.float32) * o2.astype(jnp.float32)).sum() / (
    jnp.linalg.norm(o1.astype(jnp.float32)) * jnp.linalg.norm(o2.astype(jnp.float32))
)
print(f"speedup {t1/t2:.2f}x   cos(f32-deq, bf16-deq) = {float(c):.6f}",
      flush=True)
