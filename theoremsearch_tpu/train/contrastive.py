"""Contrastive fine-tuning of the embedding encoder (InfoNCE).

The reference treats its embedder as a frozen download; a production
theorem-search deployment wants to fine-tune on (query, slogan) pairs —
exactly the data the validation set and slogan tables hold. This module
supplies the training step the reference lacks, built mesh-first:

- in-batch-negatives InfoNCE: queries x positives similarity matrix,
  symmetric cross-entropy at temperature tau;
- data parallel over the 'data' mesh axis, tensor parallel over 'shard'
  via the encoder's param sharding rules (model.py param_sharding_rules);
- optax adamw + global-norm clipping; donated state for in-place updates.
"""

from __future__ import annotations


from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import EncoderConfig, TrainConfig
from ..encoder.families import family_module
from ..encoder.model import Params


class TrainState(NamedTuple):
    params: Params
    opt_state: Any
    step: jax.Array


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay),
    )


def init_train_state(enc_cfg: EncoderConfig, train_cfg: TrainConfig, key=None) -> TrainState:
    key = key if key is not None else jax.random.PRNGKey(train_cfg.seed)
    params = family_module(enc_cfg).init_params(enc_cfg, key)
    opt = make_optimizer(train_cfg)
    return TrainState(params=params, opt_state=opt.init(params), step=jnp.zeros((), jnp.int32))


def info_nce_loss(
    params: Params,
    q_ids: jax.Array,
    q_mask: jax.Array,
    p_ids: jax.Array,
    p_mask: jax.Array,
    enc_cfg: EncoderConfig,
    temperature: float,
    fused: str = "off",
    n_ids: jax.Array | None = None,
    n_mask: jax.Array | None = None,
) -> jax.Array:
    """In-batch-negatives InfoNCE; optional EXPLICIT hard negatives
    (n_ids/n_mask, (M, S)) — e.g. thumbs-down feedback texts — are
    appended as extra columns of the query->positive direction, shared
    by every query in the batch."""
    encode = family_module(enc_cfg).encode_pooled
    q = encode(params, q_ids, q_mask, enc_cfg, fused=fused)  # (B, D) fp32, normalized
    p = encode(params, p_ids, p_mask, enc_cfg, fused=fused)
    logits = (q @ p.T) / temperature                            # (B, B)
    labels = jnp.arange(q.shape[0])
    if n_ids is not None:
        neg = encode(params, n_ids, n_mask, enc_cfg, fused=fused)  # (M, D)
        logits_qp = jnp.concatenate([logits, (q @ neg.T) / temperature], axis=1)
    else:
        logits_qp = logits
    loss_qp = optax.softmax_cross_entropy_with_integer_labels(logits_qp, labels)
    loss_pq = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    return 0.5 * (loss_qp.mean() + loss_pq.mean())


def make_train_step(
    enc_cfg: EncoderConfig,
    train_cfg: TrainConfig,
    mesh: Mesh | None = None,
    fused: str = "off",
):
    """jitted (state, q_ids, q_mask, p_ids, p_mask) -> (state, loss).

    With a mesh: params/opt-state follow the tensor-parallel rules over
    'shard', batches are sharded over 'data'; XLA/GSPMD inserts the
    gradient psum (dp) and the attention/MLP collectives (tp).

    fused: "on" routes attention through the fused Pallas forward AND
    the fused Pallas backward (kernels/attention.py
    fused_qknorm_rope_attention_bwd — recompute-in-VMEM, round 4);
    "off" keeps the XLA composition. Single-chip default stays "off"
    until tools/train_bench.py's A/B on the target hardware says
    otherwise for your config; the kernels require TPU (or
    fused="interpret" for CPU tests)."""
    opt = make_optimizer(train_cfg)

    def step(state: TrainState, q_ids, q_mask, p_ids, p_mask,
             n_ids=None, n_mask=None):
        loss, grads = jax.value_and_grad(info_nce_loss)(
            state.params, q_ids, q_mask, p_ids, p_mask, enc_cfg,
            train_cfg.temperature, fused, n_ids, n_mask,
        )
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_opt, state.step + 1), loss

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    batch_spec = NamedSharding(mesh, P("data", None))
    jitted = jax.jit(step, donate_argnums=(0,))

    def run(state: TrainState, q_ids, q_mask, p_ids, p_mask,
            n_ids=None, n_mask=None):
        q_ids = jax.device_put(q_ids, batch_spec)
        q_mask = jax.device_put(q_mask, batch_spec)
        p_ids = jax.device_put(p_ids, batch_spec)
        p_mask = jax.device_put(p_mask, batch_spec)
        # explicit negatives are a SMALL shared set: replicate rather
        # than shard (M may not divide the data axis)
        return jitted(state, q_ids, q_mask, p_ids, p_mask, n_ids, n_mask)

    return run


def make_lora_train_step(
    enc_cfg: EncoderConfig,
    train_cfg: TrainConfig,
    mesh: Mesh | None = None,
    fused: str = "off",
):
    """jitted (state, base_params, q_ids, q_mask, p_ids, p_mask) ->
    (state, loss) where state.params is the LoRA adapter pytree
    (train/lora.py) and base_params stay frozen — gradients flow only to
    the adapters; the merged encoder is rematerialized inside the step
    (cheap at LoRA ranks). Base params travel as a jit ARGUMENT, not a
    closure constant (constant-baking 0.6B of weights bloats the
    program — the same trap the scan paths hit with corpus arrays)."""
    from .lora import lora_merge

    opt = make_optimizer(train_cfg)
    alpha = train_cfg.lora_alpha

    def step(state: TrainState, base_params, q_ids, q_mask, p_ids, p_mask,
             n_ids=None, n_mask=None):
        def loss_fn(lora):
            p_eff = lora_merge(base_params, lora, alpha)
            return info_nce_loss(
                p_eff, q_ids, q_mask, p_ids, p_mask, enc_cfg,
                train_cfg.temperature, fused, n_ids, n_mask,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        new_lora = optax.apply_updates(state.params, updates)
        return TrainState(new_lora, new_opt, state.step + 1), loss

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    batch_spec = NamedSharding(mesh, P("data", None))
    jitted = jax.jit(step, donate_argnums=(0,))

    def run(state: TrainState, base_params, q_ids, q_mask, p_ids, p_mask,
            n_ids=None, n_mask=None):
        q_ids = jax.device_put(q_ids, batch_spec)
        q_mask = jax.device_put(q_mask, batch_spec)
        p_ids = jax.device_put(p_ids, batch_spec)
        p_mask = jax.device_put(p_mask, batch_spec)
        # adapters are tiny: replicated, like the explicit negatives
        return jitted(state, base_params, q_ids, q_mask, p_ids, p_mask,
                      n_ids, n_mask)

    return run


def init_lora_train_state(
    params: Params, train_cfg: TrainConfig, key=None,
) -> TrainState:
    """Adapter-only TrainState over frozen base params: opt moments
    exist only for the LoRA leaves (~2*rank/hidden of the full-tune
    optimizer footprint)."""
    from .lora import DEFAULT_TARGETS, lora_init

    key = key if key is not None else jax.random.PRNGKey(train_cfg.seed)
    targets = train_cfg.lora_targets or DEFAULT_TARGETS
    lora = lora_init(params, key, train_cfg.lora_rank, tuple(targets))
    opt = make_optimizer(train_cfg)
    return TrainState(params=lora, opt_state=opt.init(lora), step=jnp.zeros((), jnp.int32))


def init_sharded_train_state(
    enc_cfg: EncoderConfig, train_cfg: TrainConfig, mesh: Mesh, key=None
) -> TrainState:
    """Params placed by the tensor-parallel rules; the adamw moments
    inherit the param shardings from opt.init on already-placed params."""
    mod = family_module(enc_cfg)
    key = key if key is not None else jax.random.PRNGKey(train_cfg.seed)
    params = mod.shard_params(mod.init_params(enc_cfg, key), mesh)
    opt = make_optimizer(train_cfg)
    return TrainState(params=params, opt_state=opt.init(params), step=jnp.zeros((), jnp.int32))
