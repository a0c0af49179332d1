"""LoRA adapters for contrastive encoder fine-tuning.

The full-fine-tune path (contrastive.py) updates all ~0.6B encoder
params and carries adamw moments for each — 3x the param memory. A
production deployment tuning on feedback votes (a few thousand pairs)
wants the parameter-efficient form: freeze the base encoder, train
low-rank deltas on the projection matrices, merge for serving.

Functional formulation (no framework modules, matching the towers):
  w_eff = w + (alpha / rank) * A @ B,  A: (in, r) init ~N/sqrt(in),
                                       B: (r, out) init 0
so at step 0 the merged encoder IS the base encoder. Gradients flow
only to the A/B leaves; the optimizer state is ~2 * rank/hidden of the
full-tune footprint (r=8 on the 0.6B tower: ~3M trainable params vs
600M).

Adapters target any 2-D matrices present in every layer dict — the
default ("wq", "wv") is the classic LoRA recipe; the seven projection
keys of the qwen/gemma towers (and bert's w_in/w_out) are all valid
targets. Merging materializes effective params once per train step (the
delta matmul at r=8 is noise next to the forward) and once at export.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..encoder.model import Params

DEFAULT_TARGETS = ("wq", "wv")

LoraParams = list  # per-layer {target: {"a": (in, r) f32, "b": (r, out) f32}}


def lora_init(
    params: Params,
    key: jax.Array,
    rank: int,
    targets: tuple[str, ...] = DEFAULT_TARGETS,
) -> LoraParams:
    """Zero-effect adapters (B = 0) for `targets` of every layer."""
    if rank <= 0:
        raise ValueError(f"lora rank must be positive, got {rank}")
    layer0 = params["layers"][0]
    for t in targets:
        if t not in layer0 or getattr(layer0[t], "ndim", 0) != 2:
            raise ValueError(
                f"lora target {t!r} is not a 2-D matrix of this encoder "
                f"family (layer keys: {sorted(layer0)})"
            )
    out = []
    for li, layer in enumerate(params["layers"]):
        k = jax.random.fold_in(key, li)
        entry = {}
        for ti, t in enumerate(targets):
            in_dim, out_dim = layer[t].shape
            ka = jax.random.fold_in(k, ti)  # stable (Python str hash isn't)
            entry[t] = {
                "a": (jax.random.normal(ka, (in_dim, rank)) / np.sqrt(in_dim)).astype(jnp.float32),
                "b": jnp.zeros((rank, out_dim), jnp.float32),
            }
        out.append(entry)
    return out


def lora_merge(params: Params, lora: LoraParams, alpha: float) -> Params:
    """Effective params: base + (alpha/rank) * A@B on each adapted
    matrix, in the base dtype. Cheap enough to run inside the train
    step (delta FLOPs ~ rank/hidden of one token's forward)."""
    new_layers = []
    for layer, entry in zip(params["layers"], lora):
        nl = dict(layer)
        for t, ab in entry.items():
            rank = ab["a"].shape[1]
            delta = (ab["a"] @ ab["b"]) * (alpha / rank)
            nl[t] = (layer[t].astype(jnp.float32) + delta).astype(layer[t].dtype)
        new_layers.append(nl)
    return {**params, "layers": new_layers}


def lora_num_params(lora: LoraParams) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(lora))
