"""Shared param-placement helper for the three encoder families.

Each family module (model.py / gemma.py / bert.py) owns its
PartitionSpec rules; the rules-driven device_put walk is identical and
lives here once. Optional keys (e.g. a headless gemma checkpoint
without the ST Dense head) are handled by placing exactly the keys the
params pytree carries."""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding


def place_params(params: dict, rules: dict, mesh: Mesh) -> dict:
    """Place a {tensors..., 'layers': [dict,...]} pytree on the mesh
    according to a same-shaped rules pytree of PartitionSpecs."""

    def place(p, r):
        return jax.device_put(p, NamedSharding(mesh, r))

    out = {k: place(v, rules[k]) for k, v in params.items() if k != "layers"}
    out["layers"] = [
        {name: place(val, rules["layers"][name]) for name, val in layer.items()}
        for layer in params["layers"]
    ]
    return out
