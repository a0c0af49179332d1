"""Whole-layer fused int8 kernels vs the XLA int8 chain, on chip.

exp_enc_profile.py decomposed the int8 forward at (512, 16): matmul
floor 26.4 ms, quant chain 4.8, attn core 3.9, full 49.4 -> ~14 ms of
pointwise/residual/inter-op gap. kernels/layer_int8.py fuses whole
sub-blocks (MLP first, attention second) so intermediates never touch
HBM and the residual/norm/quant pointwise work rides inside the matmul
kernel. This experiment measures, per variant:

  mlp-xla    : 28x (x + _mlp_int8(x))            — current chain
  mlp-fused  : 28x fused_mlp_int8_layer          — one kernel/layer
  attn-xla   : 28x (x + _attention_int8(x))      — current chain
  attn-fused : 28x fused_attn_int8_layer         — one kernel/layer (if built)
  fwd-xla    : full encode_pooled int8 forward
  fwd-fused  : full forward with fused layer blocks

plus parity (max-abs / cosine) of fused vs chain on the same inputs.

Run: bash tools/tpu_run.sh experiments/exp_enc_fusedlayer.py
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from theoremsearch_tpu.core.config import EncoderConfig
from theoremsearch_tpu.encoder import model as M
from theoremsearch_tpu.kernels import layer_int8 as L

SMOKE = os.environ.get("SMOKE") == "1"
if SMOKE:
    jax.config.update("jax_platforms", "cpu")

B, S = (16, 16) if SMOKE else (512, 16)
cfg = (
    EncoderConfig(
        max_seq_len=64, num_layers=2, hidden_size=256, intermediate_size=512,
        num_heads=2, num_kv_heads=1, head_dim=128, vocab_size=512,
    )
    if SMOKE
    else EncoderConfig(max_seq_len=64)
)
INTERP = SMOKE
LAYERS = cfg.num_layers if SMOKE else 28
T, D, I = B * S, cfg.hidden_size, cfg.intermediate_size
print(f"({B},{S}) = {T} tokens, {LAYERS} layers, d={D} i={I}", flush=True)

params = jax.device_put(M.init_params(cfg, jax.random.PRNGKey(0)))
ql = jax.jit(M.quantize_params_int8)(params)
jax.block_until_ready(ql)
layer, lq = params["layers"][0], ql[0]

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal((B, S, D)) * 0.5, jnp.bfloat16)


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.reshape(-1)[:1])


def timed(label, fn, *args, n=5, **kw):
    out = fn(*args, **kw)
    _sync(out)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args, **kw)
        _sync(out)
        best = min(best, (time.time() - t0) / n)
    print(f"{label:18s} {best*1e3:8.2f} ms", flush=True)
    return best, out


@jax.jit
def mlp_xla(x):
    for _ in range(LAYERS):
        x = x + M._mlp_int8(layer, lq, x, cfg.rms_norm_eps)
    return x


@jax.jit
def mlp_fused(x):
    for _ in range(LAYERS):
        x = L.fused_mlp_int8_layer(
            x, layer["mlp_norm"], lq["w_gate"], lq["w_up"], lq["w_down"],
            eps=cfg.rms_norm_eps, interpret=INTERP,
        )
    return x


FWD_ONLY = os.environ.get("FWD_ONLY") == "1"  # skip block timings

# single-layer parity first (stacked outputs diverge chaotically at int8)
r1 = x0 + M._mlp_int8(layer, lq, x0, cfg.rms_norm_eps)
f1 = L.fused_mlp_int8_layer(
    x0, layer["mlp_norm"], lq["w_gate"], lq["w_up"], lq["w_down"],
    eps=cfg.rms_norm_eps, interpret=INTERP,
)
r, f = np.asarray(r1, np.float32).ravel(), np.asarray(f1, np.float32).ravel()
cos = float((r * f).sum() / (np.linalg.norm(r) * np.linalg.norm(f) + 1e-12))
print(f"mlp parity: max|d|={np.abs(r-f).max():.4f} cos={cos:.6f}", flush=True)

if not FWD_ONLY:
    t_xla, _ = timed("mlp-xla x28", mlp_xla, x0)
    t_fused, _ = timed("mlp-fused x28", mlp_fused, x0)
    print(f"MLP speedup: {t_xla/t_fused:.3f}x", flush=True)
    gflop = 6 * T * D * I * LAYERS / 1e9
    print(f"mlp-fused: {gflop/t_fused/1e3:.1f} TOPS (int8 peak 394)", flush=True)

if not FWD_ONLY and hasattr(L, "fused_attn_int8_layer"):
    mask = jnp.ones((B, S), jnp.int32)
    positions = jnp.cumsum(mask, axis=1) - 1
    rope_cs = M._rope_tables(positions, cfg.head_dim, cfg.rope_theta)

    @jax.jit
    def attn_xla(x):
        for _ in range(LAYERS):
            x = x + M._attention_int8(
                layer, lq, x, mask, rope_cs, cfg, not SMOKE, INTERP
            )
        return x

    @jax.jit
    def attn_fused(x):
        for _ in range(LAYERS):
            x = L.fused_attn_int8_layer(
                x, layer, lq, mask, rope_cs, cfg, interpret=INTERP
            )
        return x

    ra = np.asarray(
        x0 + M._attention_int8(layer, lq, x0, mask, rope_cs, cfg, not SMOKE, INTERP),
        np.float32,
    ).ravel()
    fa = np.asarray(
        L.fused_attn_int8_layer(x0, layer, lq, mask, rope_cs, cfg, interpret=INTERP),
        np.float32,
    ).ravel()
    cos = float((ra * fa).sum() / (np.linalg.norm(ra) * np.linalg.norm(fa) + 1e-12))
    print(f"attn parity: max|d|={np.abs(ra-fa).max():.4f} cos={cos:.6f}", flush=True)
    ta_x, _ = timed("attn-xla x28", attn_xla, x0)
    ta_f, _ = timed("attn-fused x28", attn_fused, x0)
    print(f"ATTN speedup: {ta_x/ta_f:.3f}x", flush=True)

# full forward comparison (params passed as args — const-closing them
# ships a >1 GB remote-compile body, exp_arg_overhead.py)
import functools

ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, S), dtype=np.int32))
am = jnp.ones((B, S), jnp.int32)
fwd_mode = "interpret" if SMOKE else "on"
f_xla = jax.jit(functools.partial(M.encode_pooled, cfg=cfg, fused=fwd_mode))
f_mega = jax.jit(functools.partial(
    M.encode_pooled, cfg=cfg, fused=fwd_mode, fused_layers=True))
t0, o0 = timed("fwd-xla-int8", f_xla, params, ids, am, qlayers=ql)
t1, o1 = timed("fwd-fused-int8", f_mega, params, ids, am, qlayers=ql)
o0 = np.asarray(o0, np.float32)
o1 = np.asarray(o1, np.float32)
cos = float(np.mean(np.sum(o0 * o1, -1)))
print(f"fwd speedup: {t0/t1:.3f}x  pooled cos(mean)={cos:.5f}", flush=True)
