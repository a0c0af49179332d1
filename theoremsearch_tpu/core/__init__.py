from .config import IndexConfig, EncoderConfig, SearchConfig, MeshConfig
from .meshes import make_mesh, shard_axis_size

__all__ = [
    "IndexConfig",
    "EncoderConfig",
    "SearchConfig",
    "MeshConfig",
    "make_mesh",
    "shard_axis_size",
]
