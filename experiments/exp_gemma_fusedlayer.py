"""Gemma whole-layer fused int8 kernels vs the XLA int8 chain, on chip.

Mirror of exp_enc_fusedlayer.py for the EmbeddingGemma-300m-class tower
(kernels/layer_int8.py gemma form: (1+w) sandwich norms, GeGLU,
bidirectional core). Measures, at the serving shape:

  mlp-xla    : 24x (x + post_norm(_mlp_int8(x)))      — current chain
  mlp-fused  : 24x fused_mlp_int8_layer(gelu, post)   — one kernel/layer
  attn-xla   : 24x (x + post_norm(_attention_int8(x)))
  attn-fused : 24x fused_attn_int8_layer_gemma
  fwd-xla    : full encode_pooled int8 forward
  fwd-fused  : full forward with fused layer blocks

plus parity (max-abs / cosine) of fused vs chain on the same inputs.

Run: bash tools/tpu_run.sh experiments/exp_gemma_fusedlayer.py
SMOKE=1 runs a tiny interpret-mode config on CPU.
"""
import functools
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from theoremsearch_tpu.core.config import GemmaEncoderConfig
from theoremsearch_tpu.encoder import gemma as G
from theoremsearch_tpu.kernels import layer_int8 as L

SMOKE = os.environ.get("SMOKE") == "1"
if SMOKE:
    jax.config.update("jax_platforms", "cpu")

B, S = (16, 16) if SMOKE else (512, 16)
cfg = (
    GemmaEncoderConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=2, num_kv_heads=1, head_dim=128,
        max_seq_len=64, embedding_dim=128, head_hidden=128,
        sliding_window=512, global_every=2,
    )
    if SMOKE
    else GemmaEncoderConfig(max_seq_len=64)
)
INTERP = SMOKE
LAYERS = cfg.num_layers
T, D, I = B * S, cfg.hidden_size, cfg.intermediate_size
print(f"({B},{S}) = {T} tokens, {LAYERS} layers, d={D} i={I}", flush=True)

params = jax.device_put(G.init_params(cfg, jax.random.PRNGKey(0)))
ql = jax.jit(G.quantize_params_int8)(params)
jax.block_until_ready(ql)
layer, lq = params["layers"][0], ql[0]
one = jnp.float32(1.0)

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal((B, S, D)) * 0.5, jnp.bfloat16)
mask = jnp.ones((B, S), jnp.int32)
positions = jnp.cumsum(mask, axis=1) - 1
rope_cs = G._rope_tables(positions, cfg.head_dim, cfg.rope_theta)


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


def mlp_chain(x):
    return x + G._gemma_rms_norm(
        G._mlp_int8(layer, lq, x, cfg.rms_norm_eps),
        layer["post_mlp_norm"], cfg.rms_norm_eps,
    )


def mlp_one(x):
    return L.fused_mlp_int8_layer(
        x, one + layer["pre_mlp_norm"],
        lq["w_gate"], lq["w_up"], lq["w_down"],
        post_w=one + layer["post_mlp_norm"],
        eps=float(cfg.rms_norm_eps), act="gelu_tanh", interpret=INTERP,
    )


def attn_chain(x):
    return x + G._gemma_rms_norm(
        G._attention_int8(
            layer, lq, x, mask, None, rope_cs, cfg, True, INTERP
        ),
        layer["post_attn_norm"], cfg.rms_norm_eps,
    )


def attn_one(x):
    return L.fused_attn_int8_layer_gemma(
        x, layer, lq, mask, rope_cs, cfg, interpret=INTERP
    )


def cosf(a, b):
    a = np.asarray(a, np.float32).ravel()
    b = np.asarray(b, np.float32).ravel()
    return float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


r1, f1 = mlp_chain(x0), mlp_one(x0)
print(f"mlp parity: max|d|={np.abs(np.asarray(r1,np.float32)-np.asarray(f1,np.float32)).max():.4f} cos={cosf(r1,f1):.6f}", flush=True)
ra, fa = attn_chain(x0), attn_one(x0)
print(f"attn parity: max|d|={np.abs(np.asarray(ra,np.float32)-np.asarray(fa,np.float32)).max():.4f} cos={cosf(ra,fa):.6f}", flush=True)


@jax.jit
def mlp_xla(x):
    for _ in range(LAYERS):
        x = mlp_chain(x)
    return x


@jax.jit
def mlp_fused(x):
    for _ in range(LAYERS):
        x = mlp_one(x)
    return x


@jax.jit
def attn_xla(x):
    for _ in range(LAYERS):
        x = attn_chain(x)
    return x


@jax.jit
def attn_fused(x):
    for _ in range(LAYERS):
        x = attn_one(x)
    return x


t_xla, _ = timed(f"mlp-xla x{LAYERS}", mlp_xla, x0)
t_fused, _ = timed(f"mlp-fused x{LAYERS}", mlp_fused, x0)
print(f"MLP speedup: {t_xla/t_fused:.3f}x", flush=True)
ta_x, _ = timed(f"attn-xla x{LAYERS}", attn_xla, x0)
ta_f, _ = timed(f"attn-fused x{LAYERS}", attn_fused, x0)
print(f"ATTN speedup: {ta_x/ta_f:.3f}x", flush=True)

ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, S), dtype=np.int32))
am = jnp.ones((B, S), jnp.int32)
fwd_mode = "interpret" if SMOKE else "on"
f_xla = jax.jit(functools.partial(G.encode_pooled, cfg=cfg, fused=fwd_mode))
f_mega = jax.jit(functools.partial(
    G.encode_pooled, cfg=cfg, fused=fwd_mode, fused_layers=True))
t0, o0 = timed("fwd-xla-int8", f_xla, params, ids, am, qlayers=ql)
t1, o1 = timed("fwd-fused-int8", f_mega, params, ids, am, qlayers=ql)
o0 = np.asarray(o0, np.float32)
o1 = np.asarray(o1, np.float32)
cos = float(np.mean(np.sum(o0 * o1, -1)))
print(f"fwd speedup: {t0/t1:.3f}x  pooled cos(mean)={cos:.5f}", flush=True)
