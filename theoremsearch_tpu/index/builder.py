"""Streaming index builder with checkpoint/resume.

TPU-native replacement for the reference's "database is the checkpoint"
pattern (SURVEY.md §5: per-page commits + NOT EXISTS work selection, e.g.
ec2/generate_embeddings/__main__.py:34-40,101). Embedding batches are
appended to a spill directory with a JSON manifest recording the cursor;
an interrupted build resumes from the last durable batch, and `finalize`
packs everything into a FlatIndex (optionally quantized / IVF-assigned).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterator

import numpy as np

from ..core.config import IndexConfig
from .flat import FlatIndex


class IndexBuilder:
    """Append-only spool of (ids, embeddings) batches.

    Usage:
        b = IndexBuilder(dir, config)
        for ids, emb in batches:           # resume: skip ids < b.cursor
            b.add(ids, emb)
        index = b.finalize()
    """

    def __init__(self, spool_dir: str | Path, config: IndexConfig | None = None):
        self.dir = Path(spool_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.manifest_path = self.dir / "build_manifest.json"
        if self.manifest_path.exists():
            self.manifest = json.loads(self.manifest_path.read_text())
            self.config = IndexConfig.from_dict(self.manifest["config"])
            if config is not None and config.to_dict() != self.config.to_dict():
                raise ValueError("resuming build with a different IndexConfig")
        else:
            self.config = config or IndexConfig()
            self.manifest = {
                "config": self.config.to_dict(),
                "batches": [],
                "max_id": -1,
                "total_rows": 0,
            }
            self._write_manifest()

    # ------------- resume support -------------

    @property
    def cursor(self) -> int:
        """Largest doc id already spooled; work selection can skip ids <=
        cursor, mirroring the reference's keyset pagination resume
        (ec2/rds/paginate.py:31-39)."""
        return int(self.manifest["max_id"])

    @property
    def total_rows(self) -> int:
        return int(self.manifest["total_rows"])

    # ------------- building -------------

    def add(self, ids: np.ndarray, embeddings: np.ndarray) -> None:
        ids = np.asarray(ids, dtype=np.int64)
        emb = np.asarray(embeddings, dtype=np.float32)
        if ids.shape[0] != emb.shape[0]:
            raise ValueError("ids/embeddings length mismatch")
        if emb.shape[0] == 0:
            return
        n = len(self.manifest["batches"])
        name = f"batch_{n:06d}"
        # write data first, then the manifest — a crash between the two
        # leaves an orphan file that finalize ignores
        np.save(self.dir / f"{name}.ids.npy", ids)
        np.save(self.dir / f"{name}.emb.npy", emb)
        self.manifest["batches"].append({"name": name, "rows": int(emb.shape[0])})
        self.manifest["max_id"] = max(self.cursor, int(ids.max()))
        self.manifest["total_rows"] += int(emb.shape[0])
        self._write_manifest()

    def batches(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        for b in self.manifest["batches"]:
            yield (
                np.load(self.dir / f"{b['name']}.ids.npy"),
                np.load(self.dir / f"{b['name']}.emb.npy"),
            )

    def _load_deduped(self) -> tuple[np.ndarray, np.ndarray]:
        """All spooled (ids, embeddings), idempotent re-adds (restart
        overlap) keeping the first copy — like the reference's ON
        CONFLICT upsert (ec2/rds/upsert.py:40-45). Shared by the flat
        and IVF finalizers."""
        if not self.manifest["batches"]:
            raise ValueError("no batches spooled")
        all_ids, all_emb = [], []
        seen: set[int] = set()
        for ids, emb in self.batches():
            # keep-first WITHIN the batch too — building the mask against
            # `seen` alone lets an id repeated inside one add() call pack
            # twice, breaking the upsert contract
            mask = np.zeros(ids.shape[0], bool)
            for j, i in enumerate(ids.tolist()):
                if i not in seen:
                    seen.add(i)
                    mask[j] = True
            if mask.any():
                all_ids.append(ids[mask])
                all_emb.append(emb[mask])
        return np.concatenate(all_ids), np.concatenate(all_emb)

    def finalize(self, normalize: bool = True) -> FlatIndex:
        ids, emb = self._load_deduped()
        return FlatIndex.build(emb, ids=ids, config=self.config, normalize=normalize)

    def finalize_ivf(
        self,
        normalize: bool = True,
        slab_rows: int | None = None,
        calibrate_gate: float | None = None,
        interpret: bool = False,
    ):
        """Pack the spooled batches into an IVFIndex, with build
        checkpointing in the spool dir (k-means rounds + assignment
        resume — a killed build restarts past the device-heavy stages)
        and optional nprobe auto-calibration against the recall gate.

        Returns (IVFIndex, calibration) where calibration is
        (nprobe, min_recall) when calibrate_gate is set, else None. The
        calibrated nprobe is also recorded in the index config."""
        from .ivf import IVFIndex, calibrate_nprobe

        ids, emb = self._load_deduped()
        index = IVFIndex.build(
            emb, ids=ids, config=self.config, slab_rows=slab_rows,
            normalize=normalize, checkpoint_dir=self.dir,
        )
        calib = None
        if calibrate_gate is not None:
            calib = calibrate_nprobe(
                index, emb, gate=calibrate_gate, ids=ids, interpret=interpret,
                normalize=normalize,
            )
            # the trusted flag means "this nprobe CLEARED the gate" —
            # calibrate_nprobe returns its best candidate even when no
            # candidate clears (structureless corpora can need more than
            # the largest candidate probes); stamping that as calibrated
            # would make the engine trust a below-gate config verbatim
            cleared = float(calib[1]) >= float(calibrate_gate)
            if not cleared:
                import warnings

                warnings.warn(
                    f"nprobe calibration did not clear the {calibrate_gate} "
                    f"recall gate (best: nprobe={calib[0]} at "
                    f"recall={calib[1]:.4f}); recording it UNCALIBRATED — "
                    "prefer the flat scan on this corpus",
                    stacklevel=2,
                )
            index.config = index.config.replace(
                ivf_nprobe=int(calib[0]), ivf_nprobe_calibrated=cleared
            )
        return index, calib

    def _write_manifest(self) -> None:
        tmp = self.manifest_path.with_suffix(".tmp")
        tmp.write_text(json.dumps(self.manifest, indent=2))
        tmp.replace(self.manifest_path)
