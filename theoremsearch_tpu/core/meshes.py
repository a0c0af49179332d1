"""Device mesh construction.

The framework's parallelism model (replacing the reference's
process-pool/Postgres coordination, SURVEY.md §2.2):

- ``shard`` axis: the corpus embedding matrix is partitioned row-wise
  across chips in HBM. Each chip scores queries against its shard with the
  fused MIPS kernel; per-shard top-k are all-gathered over ICI and merged.
- ``data`` axis: encoder inference / training batches are data-parallel.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from .config import MeshConfig


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    """Build a 2-D (data, shard) mesh.

    If ``cfg`` is None, uses all available devices on the shard axis —
    the natural layout for a corpus bigger than one chip's HBM.
    """
    if devices is None:
        devices = jax.devices()
    if cfg is None:
        cfg = MeshConfig(data=1, shard=len(devices))
    n = cfg.data * cfg.shard
    if n > len(devices):
        raise ValueError(f"mesh {cfg.data}x{cfg.shard} needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(cfg.data, cfg.shard)
    return Mesh(dev_array, axis_names=(cfg.data_axis, cfg.shard_axis))


def shard_axis_size(mesh: Mesh, axis: str = "shard") -> int:
    return mesh.shape[axis]
