"""Where does the encoder forward's time go at the serving shape?

Roofline at (B=512, S=16) = 8192 tokens, qwen 0.6B-class (28L, d=1024):
the seven projections are ~0.44 GMAC/token -> 7.2 TFLOP/batch, i.e.
~18 ms at the v5e int8 peak (394 TOPS) / ~37 ms at bf16 peak (197
TF/s).  Measured forwards (exp_enc_int8_ab.py): bf16 73.4 ms, int8
55.5 ms — so int8 runs at ~33% of its matmul-only roofline.  This
experiment decomposes the gap:

  matmul-floor : 28 layers x the 7 projection matmuls alone (lax.scan,
                 no norms/quant/attention) — the achievable ceiling
  quant-chain  : the int8 activation-quant passes alone at real shapes
                 (2x rmsnorm+quant, 2x quant_act incl. the (8192,3072)
                 MLP intermediate) x 28 — pure HBM-bound pointwise work
  attn-core    : the fused Pallas attention core alone x 28 at S=16
  full forward : measured reference

VERDICT (2026-08-19 run on v5e): int8 floor 26.4 ms (273 TOPS = 69% of
peak — near the practical ceiling for K=1024 shapes), quant chain 4.8,
attn core 3.9; full int8 forward 49.4 ms -> ~14 ms residual (embedding
gather, 56 residual adds, final norm/pool, inter-op gaps).  bf16: floor
44.2 (163 TF/s = 83% of peak), full 62.1 -> the same ~14 ms residual.
The projections themselves are already near peak; closing the residual
means fusing whole layers into custom kernels (dequant+add+norm+quant
epilogues) for at most ~1.3x — parked.  exp_mlp_int8_dtype.py rules out
the f32-dequant materialization theory (f32 vs bf16 dequant: 19.6 vs
20.3 ms per 28-layer MLP stack — XLA fuses the chain either way).

Run: bash tools/tpu_run.sh experiments/exp_enc_profile.py
"""
import functools
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from theoremsearch_tpu.core.config import EncoderConfig
from theoremsearch_tpu.encoder import model as M

SMOKE = os.environ.get("ENC_PROFILE_SMOKE") == "1"   # CPU correctness run
B, S = (16, 16) if SMOKE else (512, 16)
cfg = (
    EncoderConfig(
        max_seq_len=64, num_layers=2, hidden_size=256, intermediate_size=512,
        num_heads=2, num_kv_heads=1, head_dim=128, vocab_size=512,
    )
    if SMOKE
    else EncoderConfig(max_seq_len=64)
)
L, D, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
H, HK, DH = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
T = B * S
print(f"shape ({B},{S}) = {T} tokens, {L}L d={D} i={I} h={H}x{DH}", flush=True)

params = jax.device_put(M.init_params(cfg, jax.random.PRNGKey(0)))
qlayers = jax.jit(M.quantize_params_int8)(params)
jax.block_until_ready(qlayers)

rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, S), dtype=np.int32))
mask = jnp.ones((B, S), jnp.int32)
x2d = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)


def _sync(out):
    # block_until_ready is a no-op on the remote-attached chip (see
    # utils/profiling.py KernelTimer): sync via a 1-element host pull
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
    return best


# ---- 1. matmul floor: the 7 projections alone, scanned over layers ----
# random (not zero) inputs for the o/down matmuls — XLA constant-folds
# zeros @ w to a broadcast and the floor would drop those two matmuls
xo = jnp.asarray(
    rng.integers(-127, 128, (T, H * DH), dtype=np.int8)
)
xd = jnp.asarray(rng.integers(-127, 128, (T, I), dtype=np.int8))
xo_bf = xo.astype(jnp.bfloat16)
xd_bf = xd.astype(jnp.bfloat16)
ones = jnp.ones((T, 1), jnp.float32)


def proj_stack_int8(qls, xq, sx, xo, xd):
    # each layer re-uses the same quantized input (we time MXU
    # throughput, not the dataflow)
    def layer(carry, lq):
        q = M._q_matmul(xq, sx, lq["wq"], jnp.bfloat16)
        k = M._q_matmul(xq, sx, lq["wk"], jnp.bfloat16)
        v = M._q_matmul(xq, sx, lq["wv"], jnp.bfloat16)
        o = M._q_matmul(xo, ones, lq["wo"], jnp.bfloat16)
        g = M._q_matmul(xq, sx, lq["w_gate"], jnp.bfloat16)
        u = M._q_matmul(xq, sx, lq["w_up"], jnp.bfloat16)
        d = M._q_matmul(xd, ones, lq["w_down"], jnp.bfloat16)
        s = (q.sum() + k.sum() + v.sum() + o.sum() + g.sum() + u.sum()
             + d.sum())
        return carry + s, None

    stacked = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *qls)
    acc, _ = jax.lax.scan(layer, jnp.bfloat16(0), stacked)
    return acc


def proj_stack_bf16(layers, x, xo, xd):
    def layer(carry, lp):
        q = x @ lp["wq"]
        k = x @ lp["wk"]
        v = x @ lp["wv"]
        o = xo @ lp["wo"]
        g = x @ lp["w_gate"]
        u = x @ lp["w_up"]
        d = xd @ lp["w_down"]
        return carry + (q.sum() + k.sum() + v.sum() + o.sum() + g.sum()
                        + u.sum() + d.sum()), None

    stacked = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls),
        *[{k: l[k] for k in M._QUANT_KEYS} for l in layers],
    )
    acc, _ = jax.lax.scan(layer, jnp.bfloat16(0), stacked)
    return acc


xq0, sx0 = jax.jit(M._quant_act)(x2d)
f_int8_floor = jax.jit(proj_stack_int8)
f_bf16_floor = jax.jit(proj_stack_bf16)
t_floor_i8 = timed("matmul floor int8 (28L x 7 proj)", f_int8_floor,
                   qlayers, xq0, sx0, xo, xd)
t_floor_bf = timed("matmul floor bf16 (28L x 7 proj)", f_bf16_floor,
                   params["layers"], x2d, xo_bf, xd_bf)
gmac = (D * H * DH * 2 + D * HK * DH * 2 + 3 * D * I) * L * T
print(f"  -> int8 {gmac*2/t_floor_i8/1e12:6.1f} TOPS "
      f"({gmac*2/t_floor_i8/394e12*100:.0f}% of peak), "
      f"bf16 {gmac*2/t_floor_bf/1e12:6.1f} TF/s "
      f"({gmac*2/t_floor_bf/197e12*100:.0f}% of peak)", flush=True)


# ---- 2. quant-chain cost alone (HBM-bound pointwise) -----------------
def quant_chain(layers, x):
    h_wide = jnp.zeros((T, I), jnp.float32)

    def layer(carry, lp):
        q1, s1 = M._rmsnorm_quant_act(x, lp["attn_norm"], cfg.rms_norm_eps)
        q2, s2 = M._quant_act(x)                      # attn-out quant
        q3, s3 = M._rmsnorm_quant_act(x, lp["mlp_norm"], cfg.rms_norm_eps)
        q4, s4 = M._quant_act(h_wide)                 # (T, 3072) MLP mid
        return carry + (q1.sum() + q2.sum() + q3.sum() + q4.sum()
                        ).astype(jnp.int32), None

    norms = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls),
        *[{"attn_norm": l["attn_norm"], "mlp_norm": l["mlp_norm"]}
          for l in layers],
    )
    acc, _ = jax.lax.scan(layer, jnp.int32(0), norms)
    return acc


timed("quant chain alone (28L x 4 sites)", jax.jit(quant_chain),
      params["layers"], x2d)


# ---- 3. fused attention core alone x 28 ------------------------------
core = M._make_attn_core(H, HK, DH, cfg.rms_norm_eps, interpret=SMOKE)
q3 = jnp.asarray(rng.standard_normal((B, S, H * DH)), jnp.bfloat16)
k3 = jnp.asarray(rng.standard_normal((B, S, HK * DH)), jnp.bfloat16)
v3 = jnp.asarray(rng.standard_normal((B, S, HK * DH)), jnp.bfloat16)
positions = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
cos, sin = M._rope_tables(positions, DH, cfg.rope_theta)
qw, kw = params["layers"][0]["q_norm"], params["layers"][0]["k_norm"]


def core_stack(q, k, v):
    def one(carry, _):
        a = core(q, k, v, qw, kw, cos, sin, mask)
        return carry + a.sum(), None

    acc, _ = jax.lax.scan(one, jnp.bfloat16(0), None, length=L)
    return acc


timed("fused attn core alone x 28", jax.jit(core_stack), q3, k3, v3)

# ---- 4. full forwards (reference points) ------------------------------
fused_mode = "interpret" if SMOKE else "on"
f_bf16 = jax.jit(functools.partial(M.encode_pooled, cfg=cfg, fused=fused_mode))
f_int8 = jax.jit(functools.partial(M.encode_pooled, cfg=cfg, fused=fused_mode))
timed("full forward bf16", lambda: f_bf16(params, ids, mask))
timed("full forward int8", lambda: f_int8(params, ids, mask, qlayers=qlayers))
