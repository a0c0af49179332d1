"""Encoder round 3b: int8 (w8a8) matmuls with int32 MXU accumulate.

v5e runs int8xint8->int32 on the MXU at 2x the bf16 rate (394 vs 197
TOPS). The MLP (gate/up/down at intermediate 3072) is ~60% of the
forward's matmul FLOPs, the attention projections the other ~40%.
Dynamic per-token activation scales + static per-column weight scales.

Measures at (B=512, S=32) and (512, 16) on one v5e:
  1. forward bf16 (current production path, fused attention)
  2. forward with int8 MLP matmuls
  3. forward with int8 MLP + int8 attention projections
and reports cosine parity of pooled embeddings vs the bf16 path
(random-init weights -- indicative, not a model-quality claim).

Run: bash tools/tpu_run.sh experiments/exp_enc_int8.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from theoremsearch_tpu.core.config import EncoderConfig
from theoremsearch_tpu.encoder.model import (
    _attention_fused,
    _mlp,
    _rms_norm,
    _rope_tables,
    encode_pooled,
    init_params,
)

B_LIST = [(512, 32), (512, 16)]


# --- int8 helpers (candidate for kernels/ if the win is real) ---

def quant_weight(w):
    """(in, out) bf16 -> int8 with per-output-column scales."""
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=0) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return q, s


def quant_act(x):
    """(..., d) -> int8 rows with per-row scales."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def q_matmul(xq, sx, wq, sw):
    """int8 x int8 -> int32 MXU matmul, dequantized to f32."""
    acc = jax.lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * sx * sw


def mlp_int8(layer_q, x):
    xq, sx = quant_act(x)
    gate = q_matmul(xq, sx, *layer_q["w_gate"])
    up = q_matmul(xq, sx, *layer_q["w_up"])
    h = jax.nn.silu(gate) * up
    hq, sh = quant_act(h)
    return q_matmul(hq, sh, *layer_q["w_down"]).astype(x.dtype)


def attn_proj_int8(layer_q, xa):
    xq, sx = quant_act(xa)
    q = q_matmul(xq, sx, *layer_q["wq"]).astype(xa.dtype)
    k = q_matmul(xq, sx, *layer_q["wk"]).astype(xa.dtype)
    v = q_matmul(xq, sx, *layer_q["wv"]).astype(xa.dtype)
    return q, k, v


def quantize_layers(params, keys):
    out = []
    for layer in params["layers"]:
        out.append({k: quant_weight(layer[k]) for k in keys})
    return out


def forward_quant(params, qlayers, input_ids, attention_mask, cfg, mode):
    """mode: 'mlp' or 'all'."""
    from theoremsearch_tpu.encoder.model import _make_attn_core

    x = params["embed"][input_ids].astype(jnp.dtype(cfg.dtype))
    positions = jnp.cumsum(attention_mask.astype(jnp.int32), axis=1) - 1
    positions = jnp.maximum(positions, 0)
    rope_cs = _rope_tables(positions, cfg.head_dim, cfg.rope_theta)
    core = _make_attn_core(
        cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.rms_norm_eps, False
    )
    for layer, lq in zip(params["layers"], qlayers):
        xa = _rms_norm(x, layer["attn_norm"], cfg.rms_norm_eps)
        if mode == "all":
            q, k, v = attn_proj_int8(lq, xa)
        else:
            q = xa @ layer["wq"]
            k = xa @ layer["wk"]
            v = xa @ layer["wv"]
        attn = core(
            q, k, v, layer["q_norm"], layer["k_norm"], rope_cs[0], rope_cs[1],
            attention_mask.astype(jnp.int32),
        )
        if mode == "all":
            aq, sa = quant_act(attn)
            o = q_matmul(aq, sa, *lq["wo"]).astype(x.dtype)
        else:
            o = attn.astype(x.dtype) @ layer["wo"]
        x = x + o
        xm = _rms_norm(x, layer["mlp_norm"], cfg.rms_norm_eps)
        x = x + mlp_int8(lq, xm)
    hidden = _rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    lengths = jnp.sum(attention_mask.astype(jnp.int32), axis=1)
    idx = jnp.maximum(lengths - 1, 0)
    pooled = jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0, :]
    pooled = pooled.astype(jnp.float32)
    pooled = pooled / jnp.maximum(
        jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
    )
    return pooled


def timed(fn, *args, iters=10, rounds=3):
    out = fn(*args)
    _ = np.asarray(out).ravel()[:1]
    best = 1e9
    for _ in range(rounds):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        _ = np.asarray(out).ravel()[:1]
        best = min(best, (time.time() - t0) / iters)
    return best


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = EncoderConfig(max_seq_len=64)
    params = jax.device_put(init_params(cfg, jax.random.PRNGKey(0)))
    ALL_KEYS = ["w_gate", "w_up", "w_down", "wq", "wk", "wv", "wo"]
    qlayers = jax.jit(lambda p: quantize_layers(p, ALL_KEYS))(params)

    f_bf16 = jax.jit(functools.partial(encode_pooled, cfg=cfg, fused="on"))
    f_mlp = jax.jit(functools.partial(forward_quant, cfg=cfg, mode="mlp"))
    f_all = jax.jit(functools.partial(forward_quant, cfg=cfg, mode="all"))

    rng = np.random.default_rng(0)
    for (b, s) in B_LIST:
        ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (b, s), dtype=np.int64).astype(np.int32))
        lens = rng.integers(max(1, s // 2), s + 1, b)
        mask = jnp.asarray((np.arange(s)[None, :] < lens[:, None]).astype(np.int32))

        e0 = f_bf16(params, ids, mask)
        t0 = timed(f_bf16, params, ids, mask)
        print(f"(B={b},S={s}) bf16 fused: {t0*1e3:8.2f} ms  {b/t0:8.0f} q/s", flush=True)

        for name, fn in [("int8-mlp", f_mlp), ("int8-all", f_all)]:
            e = fn(params, qlayers, ids, mask)
            t = timed(fn, params, qlayers, ids, mask)
            cos = np.sum(np.asarray(e0) * np.asarray(e), axis=-1)
            print(
                f"(B={b},S={s}) {name:9s}: {t*1e3:8.2f} ms  {b/t:8.0f} q/s"
                f"  speedup {t0/t:5.2f}x  cos min/mean {cos.min():.5f}/{cos.mean():.5f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
