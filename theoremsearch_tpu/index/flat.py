"""Flat (exact) index: a packed, padded, HBM-resident embedding matrix.

This replaces the reference's pgvector tables
(theorem_embedding_{bert,qwen,gemma}, rds_schema.sql:43-57) and their
full-table `<#>` scans (streamlit_app.py:281). Rows are L2-normalized at
pack time (matching the reference's normalize_embeddings=True), padded to
a TPU-friendly multiple so every kernel launch sees static shapes, and
stored on disk as raw little-endian arrays plus a JSON manifest.

Disk layout (index_dir/):
    manifest.json                {num_rows, dim, dtype, pad_multiple, shards: [...]}
    shard_0000.vecs.npy          (padded_rows, dim) bf16-as-uint16 or int8
    shard_0000.scales.npy        (padded_rows,) fp32     [int8 only]
    shard_0000.ids.npy           (padded_rows,) int64 doc ids, -1 for padding
    shard_0000.rescodes.npy      (num_rows, dim) int8    [config.residual only]
    shard_0000.resscales.npy     (num_rows,) fp32        [config.residual only]
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from ..core.config import IndexConfig
from ..utils.shapes import round_up as _round_up

PAD_ID = -1


@dataclass
class FlatIndex:
    """In-memory (host) view of a packed index; device placement is done by
    the search engine (replicated single-chip, or row-sharded over the mesh)."""

    vectors: np.ndarray          # (padded_rows, dim) bf16 or int8
    ids: np.ndarray              # (padded_rows,) int64, PAD_ID for padding
    scales: np.ndarray | None    # (padded_rows,) fp32 for int8, else None
    num_rows: int                # real (unpadded) rows
    config: IndexConfig
    # int8 with ONE corpus-wide scale (config.int8_scale == "global"):
    # scores rank as raw int32 accumulators, unlocking the engine's
    # fused speed path (kernels/mips.py fused_mips_topk_g). scales then
    # hold the single value redundantly so per-row paths stay correct.
    global_scale: float = 0.0
    # capacity-mode rescore data (config.residual): (res_codes int8 (N,D),
    # res_scales fp32 (N,)) — per-row int8 codes of x - gscale*codes.
    # SearchEngine auto-adopts these for two-level rescoring (2 bytes/dim
    # total; ~15 effective bits)
    rescore_residual: tuple[np.ndarray, np.ndarray] | None = None

    # ---------------- construction ----------------

    @classmethod
    def build(
        cls,
        embeddings: np.ndarray,
        ids: np.ndarray | None = None,
        config: IndexConfig | None = None,
        normalize: bool = True,
    ) -> "FlatIndex":
        emb = np.asarray(embeddings, dtype=np.float32)
        n, d = emb.shape
        cfg = (config or IndexConfig()).replace(dim=d)
        if ids is None:
            ids = np.arange(n, dtype=np.int64)
        ids = np.asarray(ids, dtype=np.int64)
        if normalize:
            from ..utils.native import l2_normalize_

            # threaded C++ path (bulk builds are multi-GB); copy first
            # when the f32 view aliases the caller's array — build must
            # not mutate its input
            if isinstance(embeddings, np.ndarray) and np.shares_memory(emb, embeddings):
                emb = emb.copy()
            emb = l2_normalize_(emb)

        padded = _round_up(max(n, 1), cfg.pad_multiple)
        pad_rows = padded - n

        scales = None
        global_scale = 0.0
        rescore_residual = None
        if cfg.dtype == "int8":
            if cfg.int8_scale == "global":
                from .quant import quantize_global_int8

                codes, global_scale = quantize_global_int8(emb)
                sc = np.full(n, global_scale, np.float32)
                if cfg.residual:
                    from .quant import quantize_residual_int8

                    rescore_residual = quantize_residual_int8(
                        emb, codes, global_scale
                    )
            else:
                from .quant import quantize_int8

                codes, sc = quantize_int8(emb)
            vecs = np.concatenate([codes, np.zeros((pad_rows, d), np.int8)])
            scales = np.concatenate([sc, np.zeros(pad_rows, np.float32)])
        elif cfg.dtype == "bfloat16":
            vecs = np.concatenate(
                [emb.astype(ml_dtypes.bfloat16), np.zeros((pad_rows, d), ml_dtypes.bfloat16)]
            )
        elif cfg.dtype == "float32":
            vecs = np.concatenate([emb, np.zeros((pad_rows, d), np.float32)])
        else:
            raise ValueError(f"unsupported index dtype {cfg.dtype}")

        if cfg.residual and rescore_residual is None:
            raise ValueError(
                "config.residual requires dtype='int8', int8_scale='global'"
            )
        all_ids = np.concatenate([ids, np.full(pad_rows, PAD_ID, np.int64)])
        return cls(
            vectors=vecs, ids=all_ids, scales=scales, num_rows=n, config=cfg,
            global_scale=global_scale, rescore_residual=rescore_residual,
        )

    # ---------------- persistence ----------------

    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        vecs = self.vectors
        if vecs.dtype == ml_dtypes.bfloat16:
            np.save(path / "shard_0000.vecs.npy", vecs.view(np.uint16))
        else:
            np.save(path / "shard_0000.vecs.npy", vecs)
        np.save(path / "shard_0000.ids.npy", self.ids)
        # delete sidecars this index does NOT carry: load() infers their
        # presence from file existence, so a leftover scales/rescodes
        # file from a previous save of a DIFFERENT config would silently
        # poison the reload (stale rescore data, wrong dtype)
        if self.scales is not None:
            np.save(path / "shard_0000.scales.npy", self.scales)
        else:
            (path / "shard_0000.scales.npy").unlink(missing_ok=True)
        if self.rescore_residual is not None:
            rc, rs = self.rescore_residual
            np.save(path / "shard_0000.rescodes.npy", rc)
            np.save(path / "shard_0000.resscales.npy", rs)
        else:
            (path / "shard_0000.rescodes.npy").unlink(missing_ok=True)
            (path / "shard_0000.resscales.npy").unlink(missing_ok=True)
        manifest = {
            "format": "flat",
            "num_rows": self.num_rows,
            "padded_rows": int(self.vectors.shape[0]),
            "dim": int(self.vectors.shape[1]),
            "config": self.config.to_dict(),
            "global_scale": self.global_scale,
        }
        # write-then-rename: a crash mid-save must not leave a manifest
        # that parses but describes half-written data files
        tmp = path / "manifest.json.tmp"
        tmp.write_text(json.dumps(manifest, indent=2))
        tmp.replace(path / "manifest.json")

    @classmethod
    def load(cls, path: str | Path) -> "FlatIndex":
        path = Path(path)
        manifest = json.loads((path / "manifest.json").read_text())
        cfg = IndexConfig.from_dict(manifest["config"])
        vecs = np.load(path / "shard_0000.vecs.npy")
        if cfg.dtype == "bfloat16":
            vecs = vecs.view(ml_dtypes.bfloat16)
        ids = np.load(path / "shard_0000.ids.npy")
        scales_path = path / "shard_0000.scales.npy"
        scales = np.load(scales_path) if scales_path.exists() else None
        rescore_residual = None
        rc_path = path / "shard_0000.rescodes.npy"
        if rc_path.exists():
            rescore_residual = (
                np.load(rc_path), np.load(path / "shard_0000.resscales.npy")
            )
        return cls(
            vectors=vecs, ids=ids, scales=scales, num_rows=manifest["num_rows"], config=cfg,
            global_scale=float(manifest.get("global_scale", 0.0)),
            rescore_residual=rescore_residual,
        )

    # ---------------- device views ----------------

    def device_arrays(self) -> tuple[jax.Array, jax.Array, jax.Array | None]:
        """(vectors, ids, scales) as jnp arrays (placement left to caller)."""
        vecs = jnp.asarray(self.vectors)
        ids = jnp.asarray(self.ids, dtype=jnp.int32)
        scales = jnp.asarray(self.scales) if self.scales is not None else None
        return vecs, ids, scales

    @property
    def padded_rows(self) -> int:
        return int(self.vectors.shape[0])

    @property
    def dim(self) -> int:
        return int(self.vectors.shape[1])

    def memory_bytes(self) -> int:
        b = self.vectors.nbytes + self.ids.nbytes
        if self.scales is not None:
            b += self.scales.nbytes
        return b
