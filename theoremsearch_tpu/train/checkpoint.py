"""Training checkpoint/resume.

The reference's checkpointing story is "the database is the checkpoint"
(SURVEY.md §5) — it never trains anything. For the contrastive fine-tuning
loop this provides orbax-backed save/restore of the full TrainState
(params + adamw moments + step), with a plain-npz fallback when orbax is
unavailable.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from .contrastive import TrainState
from ..core.config import EncoderConfig, TrainConfig


def save_checkpoint(state: TrainState, path: str | Path) -> None:
    path = Path(path).resolve()
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path / f"step_{int(state.step)}", state)
        ckptr.wait_until_finished()
        return
    except Exception:
        pass
    # npz fallback: flatten the pytree
    leaves, treedef = jax.tree.flatten(state)
    path.mkdir(parents=True, exist_ok=True)
    np.savez(
        path / f"step_{int(state.step)}.npz",
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def latest_step(path: str | Path) -> int | None:
    path = Path(path)
    if not path.exists():
        return None
    steps = []
    for p in path.iterdir():
        if p.name.startswith("step_"):
            try:
                steps.append(int(p.name.split("_")[1].split(".")[0]))
            except ValueError:
                continue
    return max(steps) if steps else None


def restore_checkpoint(
    path: str | Path,
    enc_cfg: EncoderConfig,
    train_cfg: TrainConfig,
    step: int | None = None,
    template: TrainState | None = None,
) -> TrainState | None:
    """Restore the given (or latest) step; None when nothing is saved.

    `template` supplies the state structure when it isn't the default
    full-fine-tune one (e.g. a LoRA adapter state from
    init_lora_train_state)."""
    from .contrastive import init_train_state

    path = Path(path).resolve()
    step = step if step is not None else latest_step(path)
    if step is None:
        return None
    if template is None:
        template = init_train_state(enc_cfg, train_cfg)
    try:
        import orbax.checkpoint as ocp

        if (path / f"step_{step}").exists():
            ckptr = ocp.StandardCheckpointer()
            return ckptr.restore(path / f"step_{step}", template)
    except Exception:
        pass
    npz = path / f"step_{step}.npz"
    if not npz.exists():
        return None
    data = np.load(npz)
    leaves, treedef = jax.tree.flatten(template)
    new_leaves = [
        np.asarray(data[f"leaf_{i}"], dtype=np.asarray(l).dtype) for i, l in enumerate(leaves)
    ]
    return jax.tree.unflatten(treedef, new_leaves)
