"""Live-update delta buffer: new documents become searchable immediately.

The reference makes every upserted embedding searchable on the next
query — pgvector rows are live as soon as the `theorem_embedding_*`
upsert commits (ec2/generate_embeddings/__main__.py:84-99 feeding
streamlit_app.py's `<#>` scan). A packed TPU index can't do that: the
codes live in a static-shaped HBM array baked into compiled programs.

TPU-native equivalent: an append-only **delta buffer** next to the main
index. New vectors land in a small device-resident bf16 buffer with
power-of-two capacity (so the scan program recompiles only on capacity
doubling, not per add); queries run the main fused scan AND a tiny exact
fp32 top-k over the delta, merged on host. Deletes tombstone rows via
the engine's existing masked-scan path (main index) or a -inf score bias
(delta rows). `SearchEngine.compact()` folds the delta into the packed
index offline.

Scores from the delta are exact fp32 dots (precision=HIGHEST — the TPU
default silently bf16-truncates fp32 operands), directly comparable to
the speed path's exact on-device rescore.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = float("-inf")   # must match kernels/mips.py: finalize masks on isfinite
PAD_ID = -1
_MIN_CAP = 1024


def _pow2_at_least(n: int, floor: int = 8) -> int:
    p = floor
    while p < n:
        p *= 2
    return p


@partial(jax.jit, static_argnames=("kd",), donate_argnums=())
def _delta_topk(q, vecs, ids, bias, *, kd: int):
    """Exact top-kd over the delta buffer.

    q (B, D) f32; vecs (cap, D) bf16; ids (cap,) int32; bias (cap,) f32
    (0 = live, -inf = empty/tombstoned/filtered) — or (B, cap) for
    PER-QUERY biases (heterogeneous filtered batches). Returns (B, kd)
    scores + doc ids. cap is small (<= a few hundred k rows), so this is
    noise next to the main scan.
    """
    s = jax.lax.dot_general(
        q,
        vecs.astype(jnp.float32),
        (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    s = s + (bias if bias.ndim == 2 else bias[None, :])
    top_s, top_i = jax.lax.top_k(s, kd)
    return top_s, jnp.take(ids, top_i)


class DeltaBuffer:
    """Append-only device buffer of (vector, doc_id) rows with tombstones.

    Host fp32 copies are canonical (compaction + host fallbacks); the
    device bf16 mirror is updated with pow2-padded scatters so program
    shapes stay bounded. All mutation goes through the owning engine's
    lock — this class is not itself thread-safe.
    """

    def __init__(self, dim: int, sharding=None):
        """sharding: optional fully-replicated NamedSharding (mesh P())
        — multi-chip engines replicate the buffer across every chip so
        the delta scan composes SPMD with the sharded main scan. None =
        default device (single-chip)."""
        self.dim = dim
        self.sharding = sharding
        self.cap = 0
        self.n = 0                      # next free row
        self.n_live = 0
        self.vecs = np.zeros((0, dim), np.float32)      # host canonical
        self.ids = np.full(0, PAD_ID, np.int64)
        self.live = np.zeros(0, bool)
        self.dev_vecs = None            # (cap, D) bf16
        self.dev_ids = None             # (cap,) int32
        self.dev_bias = None            # (cap,) f32: 0 live, -inf dead
        # row of each live doc id (host-side upsert/delete lookup)
        self._row_of: dict[int, int] = {}

    # ------------- mutation -------------

    def _grow(self, need: int) -> None:
        new_cap = _pow2_at_least(need, _MIN_CAP)
        vecs = np.zeros((new_cap, self.dim), np.float32)
        ids = np.full(new_cap, PAD_ID, np.int64)
        live = np.zeros(new_cap, bool)
        vecs[: self.n] = self.vecs[: self.n]
        ids[: self.n] = self.ids[: self.n]
        live[: self.n] = self.live[: self.n]
        self.vecs, self.ids, self.live, self.cap = vecs, ids, live, new_cap
        self._push_full()

    def _push_full(self) -> None:
        """Re-place the whole buffer on device (growth / compaction)."""
        self.dev_vecs = self._put(self.vecs.astype(jnp.bfloat16))
        self.dev_ids = self._put(
            np.where(self.live, self.ids, PAD_ID).astype(np.int32)
        )
        self.dev_bias = self._put(
            np.where(self.live, 0.0, NEG_INF).astype(np.float32)
        )

    def _put(self, host: np.ndarray) -> jax.Array:
        if self.sharding is not None:
            return jax.device_put(host, self.sharding)
        return jnp.asarray(host)

    def add(self, embeddings: np.ndarray, ids: np.ndarray) -> None:
        m = embeddings.shape[0]
        if self.n + m > self.cap:
            # growth re-places everything: write host rows first
            start = self.n
            self._append_host(embeddings, ids, start)
            self._grow(self.n)
            return
        start = self.n
        self._append_host(embeddings, ids, start)
        # pow2-padded device scatter; pad rows land beyond the written
        # range but inside cap (mode="drop" for any past the end) and
        # carry dead bias/PAD ids, so they stay invisible
        m_pad = _pow2_at_least(m)
        rows = start + np.arange(m_pad, dtype=np.int32)
        upd_v = np.zeros((m_pad, self.dim), np.float32)
        upd_v[:m] = embeddings
        upd_i = np.full(m_pad, PAD_ID, np.int32)
        upd_i[:m] = ids.astype(np.int32)
        upd_b = np.full(m_pad, NEG_INF, np.float32)
        upd_b[:m] = 0.0
        r = jnp.asarray(rows)
        self.dev_vecs = self.dev_vecs.at[r].set(
            jnp.asarray(upd_v, jnp.bfloat16), mode="drop"
        )
        self.dev_ids = self.dev_ids.at[r].set(jnp.asarray(upd_i), mode="drop")
        self.dev_bias = self.dev_bias.at[r].set(jnp.asarray(upd_b), mode="drop")

    def _append_host(self, embeddings, ids, start) -> None:
        m = embeddings.shape[0]
        if start + m > self.vecs.shape[0]:
            pad = start + m - self.vecs.shape[0]
            self.vecs = np.concatenate(
                [self.vecs, np.zeros((pad, self.dim), np.float32)]
            )
            self.ids = np.concatenate([self.ids, np.full(pad, PAD_ID, np.int64)])
            self.live = np.concatenate([self.live, np.zeros(pad, bool)])
        self.vecs[start : start + m] = embeddings
        self.ids[start : start + m] = ids
        self.live[start : start + m] = True
        for j, d in enumerate(ids):
            self._row_of[int(d)] = start + j
        self.n = start + m
        self.n_live += m

    def kill_rows(self, rows: list[int]) -> None:
        if not rows:
            return
        for r in rows:
            if self.live[r]:
                self.live[r] = False
                self.n_live -= 1
                self._row_of.pop(int(self.ids[r]), None)
        m_pad = _pow2_at_least(len(rows))
        padded = np.asarray(rows + [rows[0]] * (m_pad - len(rows)), np.int32)
        r = jnp.asarray(padded)
        self.dev_bias = self.dev_bias.at[r].set(
            jnp.full(m_pad, NEG_INF, jnp.float32), mode="drop"
        )
        self.dev_ids = self.dev_ids.at[r].set(
            jnp.full(m_pad, PAD_ID, jnp.int32), mode="drop"
        )

    def row_of(self, doc_id: int) -> int | None:
        return self._row_of.get(int(doc_id))

    def rebuild_row_of(self) -> None:
        """Recompute the id -> row map from the live flags. kill_rows
        pops by id, which aliases when a dead row shares its id with a
        LATER live row (replay of an update history); callers that
        replay rows out of their original mutation order fix up here."""
        self._row_of = {
            int(self.ids[r]): r for r in range(self.n) if self.live[r]
        }

    # ------------- query -------------

    def searcher(self, kd: int) -> Callable:
        """(q, extra_bias|None) -> (scores (B,kd), ids (B,kd)) device arrays.
        Snapshot the device arrays NOW — later mutations swap references,
        so an in-flight query keeps a consistent view."""
        vecs, ids, bias = self.dev_vecs, self.dev_ids, self.dev_bias

        def run(q, extra_bias=None):
            b = bias if extra_bias is None else bias + extra_bias
            return _delta_topk(q, vecs, ids, b, kd=kd)

        return run

    def live_rows(self) -> tuple[np.ndarray, np.ndarray]:
        """(live embeddings fp32, live doc ids) in insertion order."""
        sel = self.live[: self.n]
        return self.vecs[: self.n][sel], self.ids[: self.n][sel]

    def reset(self) -> None:
        self.__init__(self.dim, sharding=self.sharding)
