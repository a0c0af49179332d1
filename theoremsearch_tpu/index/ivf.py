"""IVF (inverted-file) index with a spherical k-means coarse quantizer.

The equal-memory large-corpus configuration from BASELINE.json ("IVF
coarse-quantized index + int8 embeddings at 1M"). Design is TPU-first:

- **Training**: spherical k-means run entirely on device — assignment is
  one (N, D) x (D, L) matmul + argmax per iteration (MXU), centroid
  update is a segment-sum, centroids re-normalized each round (cosine
  geometry, matching the corpus's L2-normalized rows). Empty clusters are
  re-seeded from the rows worst-served by their current centroid.

- **Layout**: rows are sorted by cluster and packed into fixed-size slabs
  of ``slab_rows`` per cluster (static shapes for XLA). Overflow rows of
  oversized clusters go to a **spill segment** that every query scans
  brute-force, so capping never loses recall mass silently; padding slots
  carry PAD_ID and zero vectors.

- **Query**: coarse scores (B, L) on the MXU -> lax.top_k nprobe -> slab
  gather (chunked over queries to bound memory) -> candidate scores ->
  merge with the spill scan. All shapes static; accuracy is controlled by
  nprobe against the recall gate (eval/harness.recall_gate).

Use the flat fused kernel for max-throughput batched scans; IVF wins on
the low-latency / small-batch path where brute force wastes FLOPs.
"""

from __future__ import annotations

import functools
import json
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import IndexConfig
from .flat import PAD_ID
from .quant import quantize_global_int8, quantize_int8


def _fingerprint(x: np.ndarray, sample: int = 4096) -> str:
    """Content fingerprint of an embedding matrix: blake2s over a
    deterministic row sample (+ shape). Checkpoint keys include it so a
    SAME-SHAPE corpus with different contents (e.g. re-embedded with a
    retrained encoder into the same spool dir) never silently reuses a
    stale k-means/assignment checkpoint."""
    import hashlib

    step = max(1, x.shape[0] // sample)
    h = hashlib.blake2s(np.ascontiguousarray(x[::step]).tobytes(), digest_size=12)
    return f"{x.shape[0]}x{x.shape[1]}-{h.hexdigest()}"


# ---------------------------------------------------------------------------
# spherical k-means (device)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("nlist",))
def _kmeanspp_init(x: jax.Array, key: jax.Array, *, nlist: int) -> jax.Array:
    """k-means++ (D^2-weighted) seeding on device.

    Random seeding leaves ~1/e of true clusters unseeded
    (coupon-collector); on well-separated corpora Lloyd's then converges
    with merged clusters whose members are all "well served" — the
    empty-cluster re-seed never fires and the overflow spills (measured
    13% spill at 131k x 512 lists). D^2 seeding places each next seed far
    from all current ones: one (N,) matvec + categorical draw per seed."""
    n, _ = x.shape
    key, k0 = jax.random.split(key)
    i0 = jax.random.randint(k0, (), 0, n)
    mind0 = 1.0 - x @ x[i0]  # cosine distance to the first seed

    def step(mind, k):
        idx = jax.random.categorical(k, 2.0 * jnp.log(jnp.maximum(mind, 1e-12)))
        mind = jnp.minimum(mind, 1.0 - x @ x[idx])
        return mind, idx

    _, idxs = jax.lax.scan(step, mind0, jax.random.split(key, nlist - 1))
    return jnp.concatenate([i0[None], idxs])


@functools.partial(jax.jit, static_argnames=("nlist", "iters"))
def _kmeans_device(x: jax.Array, cents: jax.Array, *, nlist: int, iters: int):
    """x: (N, D) L2-normalized fp32; cents: (nlist, D) current centroids.
    Returns centroids (nlist, D) normalized after `iters` Lloyd rounds."""
    n, d = x.shape

    def step(cents, _):
        scores = jnp.dot(x, cents.T, preferred_element_type=jnp.float32)  # (N, L)
        assign = jnp.argmax(scores, axis=1)
        # segment-sum centroid update: a one-hot (N, L) matmul doubles
        # the peak (scores already costs N*L fp32 — 17 GB at the 4M
        # build's sample/nlist) and OOMs what the scatter-add computes
        # in (L, D)
        sums = jnp.zeros((nlist, d), jnp.float32).at[assign].add(x)       # (L, D)
        counts = (
            jnp.zeros((nlist,), jnp.float32).at[assign].add(1.0)[:, None]
        )
        new = sums / jnp.maximum(counts, 1.0)
        norms = jnp.linalg.norm(new, axis=1, keepdims=True)
        new = new / jnp.maximum(norms, 1e-12)
        # re-seed empty clusters with the rows least well represented
        worst = jnp.argsort(jnp.max(scores, axis=1))[:nlist]
        empty = counts[:, 0] < 0.5
        new = jnp.where(empty[:, None], x[worst], new)
        return new, None

    cents, _ = jax.lax.scan(step, cents, None, length=iters)
    return cents


def train_kmeans(
    embeddings: np.ndarray,
    nlist: int,
    iters: int = 25,
    seed: int = 0,
    sample: int | None = 262_144,
    init: str = "kmeans++",
    checkpoint_dir: str | Path | None = None,
    ckpt_every: int = 5,
) -> np.ndarray:
    """Train on a sample (k-means quality saturates well below full N).

    init: "kmeans++" (default; D^2 seeding, see _kmeanspp_init) or
    "random" (uniform rows).

    checkpoint_dir: when set, centroids persist every `ckpt_every` Lloyd
    rounds and a restarted build resumes from the last saved round
    (VERDICT r2 item 7: the 1M on-chip build is ~10 min of device work —
    ~45 min at 4M — and previously restarted from zero). The checkpoint
    is keyed on the training inputs; a different corpus/config ignores a
    stale file."""
    x = np.asarray(embeddings, np.float32)
    rng = np.random.default_rng(seed)
    if sample is not None and x.shape[0] > sample:
        x = x[rng.choice(x.shape[0], sample, replace=False)]
    ckpt_path = None
    ckpt_key = (
        f"n{x.shape[0]}_d{x.shape[1]}_l{nlist}_i{iters}_s{seed}_{init}"
        f"_{_fingerprint(x)}"
    )
    iters_done = 0
    cents = None
    if checkpoint_dir is not None:
        ckpt_path = Path(checkpoint_dir) / "kmeans_ckpt.npz"
        if ckpt_path.exists():
            try:
                z = np.load(ckpt_path, allow_pickle=False)
                if str(z["key"]) == ckpt_key:
                    cents = jnp.asarray(z["centroids"])
                    iters_done = int(z["iters_done"])
            except Exception:  # noqa: BLE001 - corrupt checkpoint = cold start
                pass
    xd = jnp.asarray(x)
    if cents is None:
        if init == "kmeans++":
            init_idx = _kmeanspp_init(xd, jax.random.PRNGKey(seed), nlist=nlist)
        else:
            init_idx = jnp.asarray(rng.choice(x.shape[0], nlist, replace=False))
        cents = xd[init_idx]
    while iters_done < iters:
        step_iters = min(ckpt_every if ckpt_path is not None else iters,
                         iters - iters_done)
        cents = _kmeans_device(xd, cents, nlist=nlist, iters=step_iters)
        iters_done += step_iters
        if ckpt_path is not None:
            ckpt_path.parent.mkdir(parents=True, exist_ok=True)
            tmp = ckpt_path.with_suffix(".tmp.npz")
            np.savez(tmp, key=ckpt_key, centroids=np.asarray(cents),
                     iters_done=iters_done)
            tmp.replace(ckpt_path)
    return np.asarray(cents)


# ---------------------------------------------------------------------------
# index
# ---------------------------------------------------------------------------


@dataclass
class IVFIndex:
    centroids: np.ndarray        # (L, D) fp32, unit rows
    slabs: np.ndarray            # (L, slab_rows, D) int8 (or fp32) packed clusters
    slab_scales: np.ndarray      # (L, slab_rows) fp32 (int8 only; ones otherwise)
    slab_ids: np.ndarray         # (L, slab_rows) int32 doc ids, PAD_ID padding
    spill: np.ndarray            # (S, D) overflow rows (always scanned)
    spill_scales: np.ndarray     # (S,)
    spill_ids: np.ndarray        # (S,) int32
    num_rows: int
    config: IndexConfig
    # optional bf16 rescore copies: int8 scan selects candidates, bf16
    # rescoring restores exact-grade ranking. int8 + bf16 = 3 bytes/dim,
    # still under the reference's 4-byte fp32 pgvector rows
    raw_flat: np.ndarray | None = None   # (L*slab_rows + S, D) bf16
    # capacity-mode alternative (config.residual): per-row int8 codes of
    # the residual x - gscale*codes at the same flat positions; rescoring
    # reconstructs gscale*cg + s_r*cr from the slab codes already in HBM
    # (~15 effective bits at 2 bytes/dim total — same two-level scheme as
    # the flat engine's device_rescore_residual)
    res_flat: np.ndarray | None = None         # (L*slab_rows + S, D) int8
    res_scales_flat: np.ndarray | None = None  # (L*slab_rows + S,) f32
    # int8 slabs use ONE corpus-wide scale (stored redundantly in
    # slab_scales for the XLA path); the Pallas probe-major path relies
    # on it so int32 scores rank directly (kernels/mips.py design notes)
    global_scale: float = 0.0

    # ---------------- build ----------------

    @classmethod
    def build(
        cls,
        embeddings: np.ndarray,
        ids: np.ndarray | None = None,
        config: IndexConfig | None = None,
        slab_rows: int | None = None,
        normalize: bool = True,
        rescore: bool | None = None,
        checkpoint_dir: str | Path | None = None,
    ) -> "IVFIndex":
        """checkpoint_dir: when set, the two device-heavy build stages
        (k-means training, full-corpus top-2 assignment) persist their
        outputs there and a restarted build resumes past them; the
        host-side packing (seconds) always re-runs."""
        emb = np.asarray(embeddings, np.float32)
        n, d = emb.shape
        cfg = (config or IndexConfig(ivf_nlist=max(1, n // 256))).replace(dim=d)
        if cfg.ivf_nlist <= 0:
            raise ValueError("IndexConfig.ivf_nlist must be > 0 for IVF")
        if ids is None:
            ids = np.arange(n, dtype=np.int64)
        ids = np.asarray(ids, np.int64).astype(np.int32)
        if normalize:
            from ..utils.native import l2_normalize_

            if isinstance(embeddings, np.ndarray) and np.shares_memory(emb, embeddings):
                emb = emb.copy()
            emb = l2_normalize_(emb)

        nlist = min(cfg.ivf_nlist, n)
        cents = train_kmeans(
            emb, nlist, iters=cfg.kmeans_iters, seed=cfg.seed, init=cfg.kmeans_init,
            checkpoint_dir=checkpoint_dir,
        )

        # assign on device in chunks. Top-2 is kept unconditionally:
        # the 2nd-best cluster is the overflow-relocation target; the
        # margin additionally gates dual-assignment COPIES.
        margin = float(cfg.ivf_assign2_margin)
        # keyed on corpus AND centroid contents: a k-means re-run with
        # different settings must invalidate the cached assignment
        assign_key = (
            f"n{n}_d{d}_l{nlist}_m{margin}"
            f"_{_fingerprint(emb)}_{_fingerprint(cents)}"
        )
        assign_path = (
            Path(checkpoint_dir) / "assign_ckpt.npz" if checkpoint_dir else None
        )
        assign = None
        if assign_path is not None and assign_path.exists():
            try:
                z = np.load(assign_path, allow_pickle=False)
                if str(z["key"]) == assign_key:
                    assign = z["assign"]
                    assign2 = z["assign2"]
                    v1 = z["v1"]
                    margin_ok = z["margin_ok"]
            except Exception:  # noqa: BLE001
                assign = None
        if assign is None:
            assign = np.empty(n, np.int32)
            assign2 = np.full(n, -1, np.int32)
            v1 = np.zeros(n, np.float32)
            margin_ok = np.zeros(n, bool)
            cents_d = jnp.asarray(cents)
            step = 262_144
            for i in range(0, n, step):
                sc = jnp.dot(jnp.asarray(emb[i : i + step]), cents_d.T)
                if nlist > 1:
                    v, idx = jax.lax.top_k(sc, 2)
                    v, idx = np.asarray(v), np.asarray(idx)
                    assign[i : i + step] = idx[:, 0]
                    v1[i : i + step] = v[:, 0]
                    assign2[i : i + step] = idx[:, 1]
                    margin_ok[i : i + step] = v[:, 1] >= v[:, 0] - margin
                else:
                    assign[i : i + step] = np.asarray(jnp.argmax(sc, axis=1))
            if assign_path is not None:
                tmp = assign_path.with_suffix(".tmp.npz")
                np.savez(tmp, key=assign_key, assign=assign, assign2=assign2,
                         v1=v1, margin_ok=margin_ok)
                tmp.replace(assign_path)

        sizes = np.bincount(assign, minlength=nlist)
        int8 = cfg.dtype == "int8"
        if slab_rows is None:
            # p99 cluster size; int8 slabs round UP to a power-of-two
            # multiple of 128 so the Pallas probe path can bit-pack
            slab_rows = int(np.percentile(sizes, 99))
            if int8:
                r = 128
                while r < slab_rows:
                    r *= 2
                slab_rows = r
            else:
                slab_rows = max(32, ((slab_rows + 31) // 32) * 32)

        if rescore is None:
            rescore = int8
        residual = bool(cfg.residual)
        if residual and not int8:
            raise ValueError("config.residual requires dtype='int8' for IVF")
        global_scale = 0.0
        rc = rs = None
        if int8:
            codes, global_scale = quantize_global_int8(emb)
            scales = np.full(n, global_scale, np.float32)
            if residual:
                from .quant import quantize_residual_int8

                rc, rs = quantize_residual_int8(emb, codes, global_scale)
        else:
            codes, scales = emb.astype(np.float32), np.ones(n, np.float32)

        import ml_dtypes

        slabs = np.zeros((nlist, slab_rows, d), codes.dtype)
        slab_scales = np.zeros((nlist, slab_rows), np.float32)
        slab_ids = np.full((nlist, slab_rows), PAD_ID, np.int32)
        # residual replaces the bf16 copy (2 bytes/dim total instead of 3)
        slab_raw = (
            np.zeros((nlist, slab_rows, d), ml_dtypes.bfloat16)
            if rescore and not residual
            else None
        )
        slab_res = (
            np.zeros((nlist, slab_rows, d), np.int8) if residual else None
        )
        slab_res_sc = (
            np.zeros((nlist, slab_rows), np.float32) if residual else None
        )
        # pack cluster-major, best-affinity-first: when a cluster
        # overflows its slab, the rows cut are its most MARGINAL members
        # — exactly the ones likeliest to be findable from their 2nd-best
        # cluster instead
        order = np.lexsort((-v1, assign))
        row_of_cluster = np.searchsorted(assign[order], np.arange(nlist))
        bounds = np.append(row_of_cluster, n)
        slab_lists: list[list[int]] = []
        overflow: list[int] = []
        for c in range(nlist):
            members = order[bounds[c] : bounds[c + 1]]
            slab_lists.append(members[:slab_rows].tolist())
            overflow.extend(members[slab_rows:].tolist())
        # overflow relocation: a cut row moves into its 2nd-best
        # cluster's slack (a probeable home — queries that rank the row
        # highly rank that cluster highly too) instead of the spill
        # segment every query must scan; spill only when that's full too
        spill_rows: list[int] = []
        for r in overflow:
            c2 = int(assign2[r])
            if 0 <= c2 < nlist and len(slab_lists[c2]) < slab_rows:
                slab_lists[c2].append(r)
            else:
                spill_rows.append(r)
        if margin > 0:
            # dual-assignment COPIES of boundary rows fill remaining
            # slack (primary copy exists; copies dropped when full)
            sec_rows = np.nonzero(margin_ok & (assign2 >= 0))[0]
            order2 = sec_rows[np.argsort(assign2[sec_rows], kind="stable")]
            row2 = np.searchsorted(assign2[order2], np.arange(nlist))
            bounds2 = np.append(row2, len(order2))
            for c in range(nlist):
                space = slab_rows - len(slab_lists[c])
                if space <= 0:
                    continue
                present = set(slab_lists[c])
                for r in order2[bounds2[c] : bounds2[c + 1]]:
                    if space <= 0:
                        break
                    if int(r) not in present:
                        slab_lists[c].append(int(r))
                        space -= 1
        for c in range(nlist):
            keep = np.asarray(slab_lists[c], np.int64)
            if not len(keep):
                continue
            slabs[c, : len(keep)] = codes[keep]
            slab_scales[c, : len(keep)] = scales[keep]
            slab_ids[c, : len(keep)] = ids[keep]
            if slab_raw is not None:
                slab_raw[c, : len(keep)] = emb[keep].astype(ml_dtypes.bfloat16)
            if slab_res is not None:
                slab_res[c, : len(keep)] = rc[keep]
                slab_res_sc[c, : len(keep)] = rs[keep]

        sp = np.asarray(spill_rows, np.int64)
        # pad spill to a multiple of slab_rows so the Pallas probe path
        # can treat the spill as always-probed chunks
        s_pad = (-len(sp)) % slab_rows
        if len(sp) == 0:
            s_pad = slab_rows  # keep one (empty) spill chunk for static shapes
        spill = np.concatenate([codes[sp], np.zeros((s_pad, d), codes.dtype)])
        spill_scales = np.concatenate([scales[sp], np.zeros(s_pad, np.float32)])
        spill_ids = np.concatenate([ids[sp], np.full(s_pad, PAD_ID, np.int32)])
        raw_flat = None
        res_flat = res_scales_flat = None
        if residual:
            spill_res = np.concatenate([rc[sp], np.zeros((s_pad, d), np.int8)])
            spill_res_sc = np.concatenate([rs[sp], np.zeros(s_pad, np.float32)])
            res_flat = np.concatenate([slab_res.reshape(-1, d), spill_res])
            res_scales_flat = np.concatenate([slab_res_sc.ravel(), spill_res_sc])
        elif rescore:
            spill_raw = np.concatenate(
                [emb[sp].astype(ml_dtypes.bfloat16), np.zeros((s_pad, d), ml_dtypes.bfloat16)]
            )
            raw_flat = np.concatenate([slab_raw.reshape(-1, d), spill_raw])

        return cls(
            centroids=cents,
            slabs=slabs,
            slab_scales=slab_scales,
            slab_ids=slab_ids,
            spill=spill,
            spill_scales=spill_scales,
            spill_ids=spill_ids,
            num_rows=n,
            config=cfg.replace(ivf_nlist=nlist),
            raw_flat=raw_flat,
            res_flat=res_flat,
            res_scales_flat=res_scales_flat,
            global_scale=global_scale,
        )

    # ---------------- incremental updates ----------------

    def _split_flat(self, flat: np.ndarray | None):
        """(slab part (L, R, ...), spill part) views of a flat rescore
        array laid out [slabs.reshape(-1), spill]."""
        if flat is None:
            return None, None
        L, R = self.slabs.shape[:2]
        slab_part = flat[: L * R].reshape(L, R, *flat.shape[1:])
        return slab_part, flat[L * R :]

    def with_updates(
        self,
        add_emb: np.ndarray | None = None,
        add_ids: np.ndarray | None = None,
        remove_ids: np.ndarray | None = None,
    ) -> "IVFIndex":
        """A new index with `remove_ids` rows dead (ALL occurrences,
        including dual-assignment copies: ids -> PAD_ID, codes zeroed)
        and `add_emb` rows assigned to their nearest existing centroids
        — best cluster's slack first, then second-best, then the spill
        segment (which every query scans). Centroids are NOT retrained:
        this is the engine's compact() fold (one small matmul against
        the centroids), keeping the IVF route live across live updates
        instead of dropping it for a full finalize_ivf rebuild. Quality
        degrades only with heavy drift — the added rows land in probed
        homes chosen exactly like build()'s overflow relocation.

        add_emb must be L2-normalized fp32 rows; int8 indexes quantize
        them with the EXISTING global scale so scores stay comparable."""
        int8 = self.config.dtype == "int8"
        residual = self.res_flat is not None
        L, R, D = self.slabs.shape
        slabs = self.slabs.copy()
        slab_scales = self.slab_scales.copy()
        slab_ids = self.slab_ids.copy()
        spill = self.spill.copy()
        spill_scales = self.spill_scales.copy()
        spill_ids = self.spill_ids.copy()
        slab_raw, spill_raw = self._split_flat(self.raw_flat)
        slab_res, spill_res = self._split_flat(self.res_flat)
        slab_res_sc, spill_res_sc = self._split_flat(self.res_scales_flat)
        if slab_raw is not None:
            slab_raw, spill_raw = slab_raw.copy(), spill_raw.copy()
        if slab_res is not None:
            slab_res, spill_res = slab_res.copy(), spill_res.copy()
            slab_res_sc, spill_res_sc = slab_res_sc.copy(), spill_res_sc.copy()

        n_removed = 0
        if remove_ids is not None and len(np.atleast_1d(remove_ids)):
            rm_ids = np.asarray(remove_ids, np.int64).astype(np.int32)
            present = set(slab_ids[np.isin(slab_ids, rm_ids)].tolist())
            present |= set(spill_ids[np.isin(spill_ids, rm_ids)].tolist())
            n_removed = len(present)
            rm = np.isin(slab_ids, rm_ids)
            slab_ids[rm] = PAD_ID
            slabs[rm] = 0
            slab_scales[rm] = 0
            if slab_raw is not None:
                slab_raw[rm] = 0
            if slab_res is not None:
                slab_res[rm] = 0
                slab_res_sc[rm] = 0
            rms = np.isin(spill_ids, rm_ids)
            spill_ids[rms] = PAD_ID
            spill[rms] = 0
            spill_scales[rms] = 0
            if spill_raw is not None:
                spill_raw[rms] = 0
            if spill_res is not None:
                spill_res[rms] = 0
                spill_res_sc[rms] = 0

        m = 0 if add_emb is None else int(np.asarray(add_emb).shape[0])
        if m:
            emb = np.asarray(add_emb, np.float32)
            ids_new = np.asarray(add_ids, np.int64).astype(np.int32)
            if ids_new.shape != (m,):
                raise ValueError("add_ids must be (m,)")
            import ml_dtypes

            if int8:
                g = np.float32(self.global_scale)
                codes = np.clip(np.round(emb / g), -127, 127).astype(np.int8)
                scales = np.full(m, g, np.float32)
                if residual:
                    from .quant import quantize_residual_int8

                    rc, rs = quantize_residual_int8(emb, codes, float(g))
            else:
                codes, scales = emb.astype(self.slabs.dtype), np.ones(m, np.float32)
            sc = emb @ self.centroids.T
            if self.centroids.shape[0] > 1:
                top2 = np.argpartition(-sc, 1, axis=1)[:, :2]
                swap = np.take_along_axis(sc, top2[:, :1], 1)[:, 0] < np.take_along_axis(
                    sc, top2[:, 1:2], 1
                )[:, 0]
                top2[swap] = top2[swap][:, ::-1]
            else:
                top2 = np.zeros((m, 2), np.int64)
            # free-slot cursors per involved cluster (slack = PAD rows,
            # including rows freed by the removal above)
            free: dict[int, list[int]] = {}
            spill_add: list[int] = []
            for j in range(m):
                placed = False
                for c in (int(top2[j, 0]), int(top2[j, 1])):
                    if c not in free:
                        free[c] = np.nonzero(slab_ids[c] == PAD_ID)[0].tolist()[::-1]
                    if free[c]:
                        r = free[c].pop()
                        slabs[c, r] = codes[j]
                        slab_scales[c, r] = scales[j]
                        slab_ids[c, r] = ids_new[j]
                        if slab_raw is not None:
                            slab_raw[c, r] = emb[j].astype(ml_dtypes.bfloat16)
                        if slab_res is not None:
                            slab_res[c, r] = rc[j]
                            slab_res_sc[c, r] = rs[j]
                        placed = True
                        break
                if not placed:
                    spill_add.append(j)
            if spill_add:
                # append to the spill after its last real row, reusing
                # its PAD tail first, then growing in R-row chunks
                sa = np.asarray(spill_add, np.int64)
                tail = np.nonzero(spill_ids != PAD_ID)[0]
                start = int(tail[-1]) + 1 if tail.size else 0
                need = start + len(sa)
                new_len = max(len(spill_ids), -(-need // R) * R)
                if new_len > len(spill_ids):
                    grow = new_len - len(spill_ids)
                    spill = np.concatenate([spill, np.zeros((grow, D), spill.dtype)])
                    spill_scales = np.concatenate([spill_scales, np.zeros(grow, np.float32)])
                    spill_ids = np.concatenate([spill_ids, np.full(grow, PAD_ID, np.int32)])
                    if spill_raw is not None:
                        spill_raw = np.concatenate(
                            [spill_raw, np.zeros((grow, D), spill_raw.dtype)]
                        )
                    if spill_res is not None:
                        spill_res = np.concatenate([spill_res, np.zeros((grow, D), np.int8)])
                        spill_res_sc = np.concatenate(
                            [spill_res_sc, np.zeros(grow, np.float32)]
                        )
                spill[start:need] = codes[sa]
                spill_scales[start:need] = scales[sa]
                spill_ids[start:need] = ids_new[sa]
                if spill_raw is not None:
                    spill_raw[start:need] = emb[sa].astype(ml_dtypes.bfloat16)
                if spill_res is not None:
                    spill_res[start:need] = rc[sa]
                    spill_res_sc[start:need] = rs[sa]

        raw_flat = (
            np.concatenate([slab_raw.reshape(-1, D), spill_raw])
            if slab_raw is not None
            else None
        )
        res_flat = res_scales_flat = None
        if slab_res is not None:
            res_flat = np.concatenate([slab_res.reshape(-1, D), spill_res])
            res_scales_flat = np.concatenate([slab_res_sc.ravel(), spill_res_sc])
        out = IVFIndex(
            centroids=self.centroids,
            slabs=slabs,
            slab_scales=slab_scales,
            slab_ids=slab_ids,
            spill=spill,
            spill_scales=spill_scales,
            spill_ids=spill_ids,
            num_rows=self.num_rows - n_removed + m,
            config=self.config,
            raw_flat=raw_flat,
            res_flat=res_flat,
            res_scales_flat=res_scales_flat,
            global_scale=self.global_scale,
        )
        object.__setattr__(out, "_pallas_cache", None)
        return out

    def remap_ids(self, id_map: np.ndarray) -> "IVFIndex":
        """A new index with every doc id translated through `id_map`
        (old id -> new id, -1 = dropped; ids beyond the map are
        dropped). Dropped rows become PAD slack; codes zeroed. Used by
        the engine's compact(reclaim=True) renumbering."""
        id_map = np.asarray(id_map, np.int64)

        def _remap(ids: np.ndarray) -> np.ndarray:
            safe = np.clip(ids, 0, len(id_map) - 1)
            new = np.where(
                (ids >= 0) & (ids < len(id_map)), id_map[safe], PAD_ID
            ).astype(np.int32)
            return new

        slab_ids = _remap(self.slab_ids)
        spill_ids = _remap(self.spill_ids)
        dead_s = (slab_ids == PAD_ID) & (self.slab_ids != PAD_ID)
        dead_p = (spill_ids == PAD_ID) & (self.spill_ids != PAD_ID)
        slabs = self.slabs.copy()
        slab_scales = self.slab_scales.copy()
        slabs[dead_s] = 0
        slab_scales[dead_s] = 0
        spill = self.spill.copy()
        spill_scales = self.spill_scales.copy()
        spill[dead_p] = 0
        spill_scales[dead_p] = 0
        dead_flat = np.concatenate([dead_s.reshape(-1), dead_p])
        # distinct live docs (dual-assignment copies collapse)
        all_ids = np.concatenate([slab_ids.ravel(), spill_ids])
        n_rows = int(np.unique(all_ids[all_ids != PAD_ID]).size)

        def _kill_flat(flat):
            if flat is None:
                return None
            flat = flat.copy()
            flat[dead_flat] = 0
            return flat

        out = IVFIndex(
            centroids=self.centroids,
            slabs=slabs,
            slab_scales=slab_scales,
            slab_ids=slab_ids,
            spill=spill,
            spill_scales=spill_scales,
            spill_ids=spill_ids,
            num_rows=n_rows,
            config=self.config,
            raw_flat=_kill_flat(self.raw_flat),
            res_flat=_kill_flat(self.res_flat),
            res_scales_flat=_kill_flat(self.res_scales_flat),
            global_scale=self.global_scale,
        )
        object.__setattr__(out, "_pallas_cache", None)
        return out

    # ---------------- search ----------------

    # lazily-built device arrays for the Pallas probe-major path
    _pallas_cache: dict | None = None

    @property
    def has_rescore(self) -> bool:
        """True when exact rescoring data exists (bf16 copy or two-level
        residual codes)."""
        return self.raw_flat is not None or self.res_flat is not None

    def _pallas_arrays(self) -> dict:
        """Chunk view for the probe-major kernel: slabs + spill-as-chunks
        + one empty fill chunk, plus the flat id table and raw copies."""
        if self._pallas_cache is None:
            L, R, D = self.slabs.shape
            spill_chunks = self.spill.reshape(-1, R, D)
            empty = np.zeros((1, R, D), self.slabs.dtype)
            slabs_all = np.concatenate([self.slabs, spill_chunks, empty])
            ids_flat = np.concatenate(
                [self.slab_ids.ravel(), self.spill_ids, np.full(R, PAD_ID, np.int32)]
            )
            object.__setattr__(
                self,
                "_pallas_cache",
                {
                    "slabs": jnp.asarray(slabs_all),
                    "ids_flat": jnp.asarray(ids_flat, jnp.int32),
                    "raw": jnp.asarray(self.raw_flat) if self.raw_flat is not None else None,
                    "res": jnp.asarray(self.res_flat) if self.res_flat is not None else None,
                    "res_scales": (
                        jnp.asarray(self.res_scales_flat)
                        if self.res_scales_flat is not None
                        else None
                    ),
                    "cents": jnp.asarray(self.centroids),
                    "n_spill_chunks": spill_chunks.shape[0],
                },
            )
        return self._pallas_cache

    def search(
        self,
        queries: np.ndarray,
        k: int = 10,
        nprobe: int | None = None,
        query_chunk: int = 64,
        rescore_factor: int = 4,
        use_pallas: bool | None = None,
        interpret: bool = False,
    ) -> tuple[np.ndarray, np.ndarray]:
        """(scores, doc_ids) each (B, k). nprobe trades recall for speed.
        With rescore copies present, the int8 scan selects
        rescore_factor*k candidates and bf16/fp32 rescoring ranks them.

        use_pallas: probe-major kernel path — every UNIQUE probed chunk
        is streamed from HBM once for the whole batch (the XLA fallback
        materializes a (B, nprobe, R, D) gather). Auto-enabled on TPU
        for int8+rescore indexes with power-of-two slab rows."""
        nprobe = int(nprobe or self.config.ivf_nprobe)
        nprobe = min(nprobe, self.centroids.shape[0])
        q = jnp.asarray(np.asarray(queries, np.float32))
        if q.ndim == 1:
            q = q[None]
        R = self.slabs.shape[1]
        pallas_ok = (
            self.config.dtype == "int8"
            and self.has_rescore
            and R % 128 == 0
        )
        if use_pallas is None:
            use_pallas = pallas_ok and (interpret or jax.default_backend() not in ("cpu",))
        if use_pallas:
            fn = self.device_searcher(
                k=k, nprobe=nprobe, rescore_factor=rescore_factor,
                interpret=interpret,
            )
            out_s, out_i = [], []
            for i in range(0, q.shape[0], query_chunk):
                chunk = np.asarray(q[i : i + query_chunk])
                pad = query_chunk - chunk.shape[0]
                if pad:
                    # pad the tail chunk like the XLA branch below: a
                    # fresh batch shape re-traces the Pallas program
                    # (multi-second compile per distinct size)
                    chunk = np.concatenate(
                        [chunk, np.zeros((pad, chunk.shape[1]), chunk.dtype)]
                    )
                s, d_ = fn(chunk)
                out_s.append(np.asarray(s)[: query_chunk - pad])
                out_i.append(np.asarray(d_)[: query_chunk - pad])
            return np.concatenate(out_s), np.concatenate(out_i)
        out_s, out_i = [], []
        fn = _ivf_search_jit
        args = (
            jnp.asarray(self.centroids),
            jnp.asarray(self.slabs),
            jnp.asarray(self.slab_scales),
            jnp.asarray(self.slab_ids),
            jnp.asarray(self.spill),
            jnp.asarray(self.spill_scales),
            jnp.asarray(self.spill_ids),
            jnp.asarray(self.raw_flat) if self.raw_flat is not None else None,
            jnp.asarray(self.res_flat) if self.res_flat is not None else None,
            (
                jnp.asarray(self.res_scales_flat)
                if self.res_scales_flat is not None
                else None
            ),
        )
        c_rescore = min(rescore_factor * k, nprobe * self.slabs.shape[1])
        for i in range(0, q.shape[0], query_chunk):
            chunk = q[i : i + query_chunk]
            pad = query_chunk - chunk.shape[0]
            if pad:
                chunk = jnp.concatenate([chunk, jnp.zeros((pad, q.shape[1]), q.dtype)])
            s, d = fn(chunk, *args, k=k, nprobe=nprobe, c_rescore=c_rescore)
            out_s.append(np.asarray(s)[: query_chunk - pad])
            out_i.append(np.asarray(d)[: query_chunk - pad])
        return np.concatenate(out_s), np.concatenate(out_i)

    def device_searcher(
        self,
        k: int = 10,
        nprobe: int | None = None,
        rescore_factor: int = 4,
        interpret: bool = False,
    ):
        """Device-level search closure over the cached device arrays:
        ``(B, D) f32 -> (scores (B, k), doc_ids (B, k))`` jax arrays, no
        host round-trips — what serving loops and benches should call
        (search() wraps this with numpy in/out)."""
        R = self.slabs.shape[1]
        if not (self.config.dtype == "int8" and self.has_rescore and R % 128 == 0):
            raise ValueError(
                "Pallas IVF path needs int8 + rescore data (bf16 copy or "
                "residual codes) + slab_rows a multiple of 128"
            )
        nprobe = min(int(nprobe or self.config.ivf_nprobe), self.centroids.shape[0])
        pa = self._pallas_arrays()
        gscale = self.global_scale
        n_lists = self.slabs.shape[0]
        c_rescore = max(k, min(rescore_factor * k, nprobe * R))

        def fn(q):
            return _ivf_search_pallas(
                q, pa["cents"], pa["slabs"], pa["ids_flat"], pa["raw"],
                pa["res"], pa["res_scales"], gscale,
                k=k, nprobe=nprobe, c_rescore=c_rescore, n_lists=n_lists,
                n_spill_chunks=pa["n_spill_chunks"], interpret=interpret,
            )

        return fn

    # ---------------- multi-chip ----------------

    def _sharded_arrays(self, n_shards: int) -> dict:
        """Partition lists + spill chunks across shards (host side, once).

        Shard s owns lists [s*L_per, (s+1)*L_per) and spill chunks
        s::n_shards, re-indexed into a local chunk space of
        C_local = L_per + sp_per + 1 (last = empty chunk). Global list id
        g therefore maps to (owner = g // L_per, local = g % L_per) with
        no lookup tables."""
        L, R, D = self.slabs.shape
        L_per = (L + n_shards - 1) // n_shards
        spill_chunks = self.spill.reshape(-1, R, D)
        spill_ids_c = self.spill_ids.reshape(-1, R)
        n_sp = spill_chunks.shape[0]
        sp_per = (n_sp + n_shards - 1) // n_shards
        C_local = L_per + sp_per + 1
        slabs_sh = np.zeros((n_shards, C_local, R, D), self.slabs.dtype)
        ids_sh = np.full((n_shards, C_local * R), PAD_ID, np.int32)
        raw_sh = res_sh = res_sc_sh = None
        if self.raw_flat is not None:
            raw_sh = np.zeros((n_shards, C_local * R, D), self.raw_flat.dtype)
        if self.res_flat is not None:
            res_sh = np.zeros((n_shards, C_local * R, D), np.int8)
            res_sc_sh = np.zeros((n_shards, C_local * R), np.float32)
        for s in range(n_shards):
            lists = range(s * L_per, min((s + 1) * L_per, L))
            for j, g in enumerate(lists):
                slabs_sh[s, j] = self.slabs[g]
                ids_sh[s, j * R : (j + 1) * R] = self.slab_ids[g]
                if raw_sh is not None:
                    raw_sh[s, j * R : (j + 1) * R] = self.raw_flat[g * R : (g + 1) * R]
                if res_sh is not None:
                    res_sh[s, j * R : (j + 1) * R] = self.res_flat[g * R : (g + 1) * R]
                    res_sc_sh[s, j * R : (j + 1) * R] = (
                        self.res_scales_flat[g * R : (g + 1) * R]
                    )
            for j, g in enumerate(range(s, n_sp, n_shards)):
                lj = L_per + j
                slabs_sh[s, lj] = spill_chunks[g]
                ids_sh[s, lj * R : (lj + 1) * R] = spill_ids_c[g]
                if raw_sh is not None:
                    raw_sh[s, lj * R : (lj + 1) * R] = (
                        self.raw_flat[(L + g) * R : (L + g + 1) * R]
                    )
                if res_sh is not None:
                    res_sh[s, lj * R : (lj + 1) * R] = (
                        self.res_flat[(L + g) * R : (L + g + 1) * R]
                    )
                    res_sc_sh[s, lj * R : (lj + 1) * R] = (
                        self.res_scales_flat[(L + g) * R : (L + g + 1) * R]
                    )
        return {
            "slabs": slabs_sh, "ids": ids_sh, "raw": raw_sh,
            "res": res_sh, "res_scales": res_sc_sh,
            "L_per": L_per, "sp_per": sp_per, "C_local": C_local,
        }

    def sharded_searcher(
        self,
        mesh,
        k: int = 10,
        nprobe: int | None = None,
        rescore_factor: int = 4,
        interpret: bool = False,
        use_pallas: bool = True,
    ):
        """Multi-chip IVF search closure over a mesh with a 'shard' axis.

        The corpus's inverted lists live partitioned across chips' HBM
        (the configuration for corpora beyond one chip); the coarse
        quantizer is replicated. Per query batch: every chip computes the
        same global probe set, keeps the lists IT owns (others point at
        its empty chunk), scans them with the probe-major kernel, rescores
        from its local bf16 copy, and contributes a per-shard top-k that
        is all-gathered over ICI and merged with cross-shard
        dual-assignment de-duplication.

        Returns ``(B, D) f32 -> (scores (B,k), doc_ids (B,k))`` device fn.
        """
        import jax
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..kernels.mips import ivf_probe_scores, _quantize_queries, merge_topk

        R = self.slabs.shape[1]
        if not (self.config.dtype == "int8" and self.has_rescore and R % 128 == 0):
            raise ValueError(
                "sharded IVF needs int8 + rescore data + slab_rows % 128 == 0"
            )
        n_shards = mesh.shape["shard"]
        nprobe = min(int(nprobe or self.config.ivf_nprobe), self.centroids.shape[0])
        residual = self.res_flat is not None
        # device arrays cached per (mesh devices+layout, n_shards): the
        # engine builds one searcher per k, and re-uploading the whole
        # sharded index per k would duplicate it in HBM. Keyed by the
        # mesh's actual device tuple + axis layout — id(mesh) can be
        # REUSED by a different mesh after garbage collection, which
        # would silently serve stale placements
        cache_key = (
            tuple(mesh.devices.flat),
            tuple(sorted(mesh.shape.items())),
            n_shards,
        )
        cache = getattr(self, "_sharded_dev_cache", None)
        if cache is not None and cache[0] == cache_key:
            dc = cache[1]
        else:
            sa = self._sharded_arrays(n_shards)
            shard_leading = NamedSharding(mesh, P("shard"))
            dc = {
                "L_per": sa["L_per"], "sp_per": sa["sp_per"],
                "C_local": sa["C_local"],
                "slabs": jax.device_put(sa["slabs"], shard_leading),
                "ids": jax.device_put(sa["ids"], shard_leading),
                "cents": jax.device_put(
                    self.centroids, NamedSharding(mesh, P(None, None))
                ),
                "rescore": (
                    (
                        jax.device_put(sa["res"], shard_leading),
                        jax.device_put(sa["res_scales"], shard_leading),
                    )
                    if residual
                    else (jax.device_put(np.asarray(sa["raw"]), shard_leading),)
                ),
            }
            object.__setattr__(self, "_sharded_dev_cache", (cache_key, dc))
        L_per, sp_per, C_local = dc["L_per"], dc["sp_per"], dc["C_local"]
        empty_local = C_local - 1
        slabs_d, ids_d, cents_d = dc["slabs"], dc["ids"], dc["cents"]
        rescore_d = dc["rescore"]
        rescore_specs = (P("shard"), P("shard")) if residual else (P("shard"),)
        n_lists = self.slabs.shape[0]
        gscale = self.global_scale
        c_rescore = max(k, min(rescore_factor * k, nprobe * R))

        def body(q, cents, slabs_l, ids_l, *rescore_l):
            # leading shard dim of the locals is 1 inside shard_map
            slabs_l, ids_l = slabs_l[0], ids_l[0]
            rescore_l = tuple(r[0] for r in rescore_l)
            b = q.shape[0]
            s_idx = jax.lax.axis_index("shard")
            coarse = jnp.dot(q, cents.T, preferred_element_type=jnp.float32)
            _, probe = jax.lax.top_k(coarse, nprobe)          # global list ids
            owner = probe // L_per
            local = probe % L_per
            flat = jnp.where(owner == s_idx, local, empty_local).reshape(-1)
            always = jnp.arange(L_per, L_per + sp_per, dtype=jnp.int32)
            p_max = min(b * nprobe, L_per) + sp_per + 1        # +1: empty slot
            uids = jnp.unique(
                jnp.concatenate([flat.astype(jnp.int32), always]),
                size=p_max, fill_value=empty_local,
            )
            if use_pallas:
                cand, _ = ivf_probe_scores(q, slabs_l, uids, interpret=interpret)
            else:
                qk, _ = _quantize_queries(q)
                gathered = jnp.take(slabs_l, uids, axis=0)    # (P, R, D)
                cand = jax.lax.dot_general(
                    qk, gathered.reshape(-1, gathered.shape[-1]),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )                                              # (B, P*R)
            kr = min(c_rescore, cand.shape[1])
            vi, pos = jax.lax.top_k(cand, kr)
            pos = pos.astype(jnp.int32)
            slot = uids[pos // R] * R + pos % R
            doc = ids_l[jnp.clip(slot, 0, ids_l.shape[0] - 1)]
            valid = doc >= 0
            first_dup = (doc[:, None, :] == doc[:, :, None]) & jnp.tril(
                jnp.ones((kr, kr), bool), k=-1
            )[None]
            valid &= ~first_dup.any(axis=2)
            if residual:
                re_s = _ivf_rescore(
                    q, slot, slabs_l, None, rescore_l[0], rescore_l[1], gscale
                )
            else:
                re_s = _ivf_rescore(q, slot, slabs_l, rescore_l[0], None, None, gscale)
            re_s = jnp.where(valid, re_s, -jnp.inf)
            top_s, sel = jax.lax.top_k(re_s, k)
            top_i = jnp.where(jnp.isfinite(top_s),
                              jnp.take_along_axis(doc, sel, axis=1), PAD_ID)
            # fan-in over ICI + cross-shard dedupe (a dual-assignment
            # copy and its primary can live on different shards)
            all_s = jax.lax.all_gather(top_s, "shard", axis=1, tiled=True)
            all_i = jax.lax.all_gather(top_i, "shard", axis=1, tiled=True)
            m = all_s.shape[1]
            s2, sel2 = jax.lax.top_k(all_s, m)
            i2 = jnp.take_along_axis(all_i, sel2, axis=1)
            dup = (i2[:, :, None] == i2[:, None, :]) & jnp.tril(
                jnp.ones((m, m), bool), k=-1
            )[None]
            s2 = jnp.where((i2 >= 0) & ~dup.any(axis=2), s2, -jnp.inf)
            return merge_topk(s2, jnp.where(jnp.isfinite(s2), i2, PAD_ID), k)

        f = shard_map(
            body,
            mesh=mesh,
            in_specs=(
                P(None, None), P(None, None), P("shard"), P("shard"),
                *rescore_specs,
            ),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        )
        jf = jax.jit(f)

        def fn(q):
            return jf(jnp.asarray(q, jnp.float32), cents_d, slabs_d, ids_d, *rescore_d)

        return fn

    # ---------------- persistence ----------------

    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        arrays = dict(
            centroids=self.centroids,
            slabs=self.slabs,
            slab_scales=self.slab_scales,
            slab_ids=self.slab_ids,
            spill=self.spill,
            spill_scales=self.spill_scales,
            spill_ids=self.spill_ids,
        )
        if self.raw_flat is not None:
            arrays["raw_flat"] = self.raw_flat.view(np.uint16)
        if self.res_flat is not None:
            arrays["res_flat"] = self.res_flat
            arrays["res_scales_flat"] = self.res_scales_flat
        np.savez_compressed(path / "ivf.npz", **arrays)
        manifest = {
            "format": "ivf",
            "num_rows": self.num_rows,
            "config": self.config.to_dict(),
            "global_scale": self.global_scale,
        }
        (path / "manifest.json").write_text(json.dumps(manifest, indent=2))

    @classmethod
    def load(cls, path: str | Path) -> "IVFIndex":
        import ml_dtypes

        path = Path(path)
        manifest = json.loads((path / "manifest.json").read_text())
        z = np.load(path / "ivf.npz")
        raw = z["raw_flat"].view(ml_dtypes.bfloat16) if "raw_flat" in z else None
        res = z["res_flat"] if "res_flat" in z else None
        res_sc = z["res_scales_flat"] if "res_scales_flat" in z else None
        return cls(
            centroids=z["centroids"],
            slabs=z["slabs"],
            slab_scales=z["slab_scales"],
            slab_ids=z["slab_ids"],
            spill=z["spill"],
            spill_scales=z["spill_scales"],
            spill_ids=z["spill_ids"],
            num_rows=manifest["num_rows"],
            config=IndexConfig.from_dict(manifest["config"]),
            raw_flat=raw,
            res_flat=res,
            res_scales_flat=res_sc,
            global_scale=float(manifest.get("global_scale", 0.0)),
        )

    def memory_bytes(self) -> int:
        arrays = [
            self.centroids, self.slabs, self.slab_scales, self.slab_ids,
            self.spill, self.spill_scales, self.spill_ids,
        ]
        if self.raw_flat is not None:
            arrays.append(self.raw_flat)
        if self.res_flat is not None:
            arrays.append(self.res_flat)
            arrays.append(self.res_scales_flat)
        return sum(a.nbytes for a in arrays)


def calibrate_nprobe(
    index: "IVFIndex",
    embeddings: np.ndarray,
    gate: float = 0.99,
    k: int = 10,
    n_queries: int = 256,
    n_draws: int = 3,
    candidates: tuple[int, ...] = (4, 8, 16, 32, 64, 128),
    perturb: float = 0.25,
    seed: int = 0,
    interpret: bool = False,
    ids: np.ndarray | None = None,
    normalize: bool = True,
) -> tuple[int, float]:
    """Smallest nprobe whose MIN recall@k over `n_draws` query draws
    clears `gate` against the exact oracle on the same vectors
    (eval/harness.recall_gate semantics, evaluated per draw).

    Queries are corpus rows perturbed by gaussian noise of relative scale
    `perturb` then re-normalized — harder than in-distribution sampling
    (the IVF failure mode is queries landing between clusters), cheaper
    than requiring labeled queries. Returns (nprobe, min_recall); if no
    candidate clears the gate, returns the best candidate with its
    recall so the caller can decide (the engine would route to the flat
    scan anyway)."""
    emb = np.asarray(embeddings, np.float32)
    if normalize:
        # must match what the INDEX packed — calibrating a normalized
        # oracle against an index built on raw vectors (normalize=False)
        # measures recall against rankings the index never serves
        emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    n = emb.shape[0]
    rng = np.random.default_rng(seed)

    draws = []
    for _ in range(n_draws):
        rows = rng.choice(n, size=min(n_queries, n), replace=False)
        q = emb[rows] + perturb / np.sqrt(emb.shape[1]) * rng.standard_normal(
            (len(rows), emb.shape[1])
        ).astype(np.float32)
        q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        # exact oracle, chunked over corpus rows
        step = 262_144
        top_s = np.full((len(rows), k), -np.inf, np.float32)
        top_i = np.full((len(rows), k), -1, np.int64)
        qd = jnp.asarray(q)
        for i in range(0, n, step):
            # precision=HIGHEST: TPU fp32 matmuls default to bf16-truncated
            # operands, which flips near-ties in the reference top-k and
            # corrupts the very gate this calibration exists to hold
            # (eval/oracle.py documents the pitfall)
            s = np.asarray(
                jnp.dot(
                    qd,
                    jnp.asarray(emb[i : i + step]).T,
                    precision=jax.lax.Precision.HIGHEST,
                )
            )
            cs = np.concatenate([top_s, s], axis=1)
            ci = np.concatenate(
                [top_i, np.broadcast_to(np.arange(i, i + s.shape[1]), s.shape)], axis=1
            )
            sel = np.argsort(-cs, axis=1, kind="stable")[:, :k]
            top_s = np.take_along_axis(cs, sel, 1)
            top_i = np.take_along_axis(ci, sel, 1)
        if ids is not None:  # embeddings row -> doc id (custom-id corpora)
            top_i = np.asarray(ids)[top_i]
        draws.append((q, top_i))

    from ..eval.metrics import recall_vs_exact

    # clamp candidates at nlist (probing every list is the exhaustive
    # setting — breaking out early left small-nlist corpora unmeasured
    # and reported recall 0.0), keeping ascending order unique
    nlist = index.centroids.shape[0]
    cand_list = sorted({min(c, nlist) for c in candidates})
    best = (cand_list[0], 0.0)
    for nprobe in cand_list:
        recs = []
        for q, ref in draws:
            _, got = index.search(q, k=k, nprobe=nprobe, interpret=interpret)
            # recall_vs_exact masks PAD_ID — hand-rolled (ids==ref).any()
            # counted -1==-1 pad pairs as hits on small corpora
            recs.append(recall_vs_exact(np.asarray(got), ref, k=k))
        rec_min = min(recs)
        if rec_min > best[1]:
            best = (nprobe, rec_min)
        if rec_min >= gate:
            return nprobe, rec_min
    return best


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "c_rescore"))
def _ivf_search_jit(
    q, centroids, slabs, slab_scales, slab_ids, spill, spill_scales, spill_ids,
    raw_flat, res_flat, res_scales_flat, *, k, nprobe, c_rescore
):
    b, d = q.shape
    slab_rows = slabs.shape[1]
    # 1. coarse quantizer
    coarse = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)   # (B, L)
    _, probe = jax.lax.top_k(coarse, nprobe)                               # (B, P)

    # 2. slab gather + candidate scoring
    cand = jnp.take(slabs, probe, axis=0)                                  # (B, P, R, D)
    cand_sc = jnp.take(slab_scales, probe, axis=0)                         # (B, P, R)
    cand_id = jnp.take(slab_ids, probe, axis=0)                            # (B, P, R)
    cf = cand.astype(jnp.float32) if cand.dtype != jnp.float32 else cand
    scores = jnp.einsum("bprd,bd->bpr", cf, q, preferred_element_type=jnp.float32)
    scores = scores * cand_sc
    scores = jnp.where(cand_id >= 0, scores, -jnp.inf)
    flat_s = scores.reshape(b, -1)
    flat_i = cand_id.reshape(b, -1)
    # flat position into raw_flat for each candidate (slab-major)
    rr = jax.lax.broadcasted_iota(jnp.int32, (b, nprobe, slab_rows), 2)
    flat_p = (probe[:, :, None] * slab_rows + rr).reshape(b, -1)

    # 3. spill scan (always exact over the overflow segment)
    n_spill = spill_ids.shape[0]
    sp = spill.astype(jnp.float32) if spill.dtype != jnp.float32 else spill
    sp_scores = jnp.dot(q, sp.T, preferred_element_type=jnp.float32) * spill_scales[None, :]
    sp_scores = jnp.where(spill_ids[None, :] >= 0, sp_scores, -jnp.inf)
    sp_pos = jax.lax.broadcasted_iota(jnp.int32, (b, n_spill), 1) + slabs.shape[0] * slab_rows

    all_s = jnp.concatenate([flat_s, sp_scores], axis=1)
    all_i = jnp.concatenate([flat_i, jnp.broadcast_to(spill_ids[None, :], (b, n_spill))], axis=1)
    all_p = jnp.concatenate([flat_p, sp_pos], axis=1)

    if raw_flat is None and res_flat is None:
        # dual-assignment copies score identically — dedup on a 2k
        # over-fetch (a doc has at most 2 copies) like the Pallas and
        # sharded paths, or the same id occupies two result slots
        m = min(2 * k, all_s.shape[1])
        top_s, sel = jax.lax.top_k(all_s, m)
        top_i = jnp.take_along_axis(all_i, sel, axis=1)
        dup = (top_i[:, :, None] == top_i[:, None, :]) & jnp.tril(
            jnp.ones((m, m), bool), k=-1
        )[None]
        top_s = jnp.where((top_i >= 0) & ~dup.any(axis=2), top_s, -jnp.inf)
        top_s, sel2 = jax.lax.top_k(top_s, k)
        top_i = jnp.take_along_axis(top_i, sel2, axis=1)
        return top_s, jnp.where(jnp.isfinite(top_s), top_i, PAD_ID)

    # 4. exact rescoring of the oversampled candidate set — from the bf16
    # copy, or (capacity mode) the two-level int8 reconstruction
    c = max(c_rescore, k)
    cand_s, sel = jax.lax.top_k(all_s, c)
    cand_i = jnp.take_along_axis(all_i, sel, axis=1)                       # (B, C)
    cand_p = jnp.take_along_axis(all_p, sel, axis=1)
    # kill dual-assignment duplicates before the rescore (keep-first)
    dup = (cand_i[:, :, None] == cand_i[:, None, :]) & jnp.tril(
        jnp.ones((c, c), bool), k=-1
    )[None]
    cand_s = jnp.where(dup.any(axis=2), -jnp.inf, cand_s)
    if raw_flat is not None:
        raw = raw_flat[cand_p]                                             # (B, C, D) bf16
        re_s = jnp.einsum(
            "bcd,bd->bc", raw.astype(jnp.float32), q, preferred_element_type=jnp.float32
        )
    else:
        # slab-major codes at the same flat positions (reshape is free)
        codes_flat = jnp.concatenate(
            [slabs.reshape(-1, slabs.shape[-1]), spill.astype(slabs.dtype)]
        )
        cp = jnp.clip(cand_p, 0, res_flat.shape[0] - 1)
        cg = jnp.take(codes_flat, cp, axis=0).astype(jnp.float32)
        cr = jnp.take(res_flat, cp, axis=0).astype(jnp.float32)
        sr = jnp.take(res_scales_flat, cp, axis=0)
        # gscale == slab_scales of any real row; recover it from the max
        # (pad rows hold 0) so the jit signature stays unchanged
        gs = jnp.max(slab_scales)
        recon = gs * cg + sr[..., None] * cr
        # HIGHEST: default TPU precision would truncate the ~15-bit
        # reconstruction back to bf16 (see kernels/mips.py)
        re_s = jnp.einsum(
            "bcd,bd->bc", recon, q, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    re_s = jnp.where(jnp.isfinite(cand_s), re_s, -jnp.inf)
    top_s, sel2 = jax.lax.top_k(re_s, k)
    top_i = jnp.take_along_axis(cand_i, sel2, axis=1)
    return top_s, jnp.where(jnp.isfinite(top_s), top_i, PAD_ID)


@functools.partial(
    jax.jit,
    static_argnames=("k", "nprobe", "c_rescore", "n_lists", "n_spill_chunks", "interpret"),
)
def _ivf_search_pallas(
    q, centroids, slabs_all, ids_flat, raw_flat, res_flat, res_scales_flat,
    global_scale,
    *, k, nprobe, c_rescore, n_lists, n_spill_chunks, interpret
):
    """Probe-major IVF search: coarse -> batch-deduped unique chunks ->
    streaming maxima kernel -> approx selection -> exact bf16 rescore.

    Scoring a deduped chunk benefits every query in the batch (a query
    can receive candidates from chunks it did not itself probe — recall
    can only improve vs per-query nprobe semantics)."""
    from ..kernels.mips import ivf_probe_scores

    b, d = q.shape
    c_total, r, _ = slabs_all.shape
    empty_idx = c_total - 1

    # 1. coarse quantizer + always-probed spill chunks
    coarse = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(coarse, nprobe)                       # (B, P)
    always = jnp.arange(n_lists, n_lists + n_spill_chunks, dtype=jnp.int32)
    flat = jnp.concatenate([probe.reshape(-1).astype(jnp.int32), always])

    # 2. batch dedupe to a static-size unique set (fills -> empty chunk)
    p_max = min(b * nprobe, n_lists) + n_spill_chunks
    uids = jnp.unique(flat, size=p_max, fill_value=empty_idx)

    # 3. stream each unique chunk once; raw int32 scores (lossless)
    cand, qscales = ivf_probe_scores(q, slabs_all, uids, interpret=interpret)

    # 4. exact selection + decode to slots. NOT approx_max_k: its TPU
    # implementation bin-reduces ADJACENT columns, and IVF concentrates
    # the true top-k in adjacent columns of one hot chunk — measured
    # recall collapse to ~1/k on chip (one survivor per bin). The
    # candidate row is only (P*R) wide at serving batch sizes, so exact
    # top_k costs nothing here (unlike the flat scan's (B, n_tiles*128)).
    kr = min(c_rescore, cand.shape[1])
    vi, pos = jax.lax.top_k(cand, kr)
    pos = pos.astype(jnp.int32)
    step = pos // r
    within = pos % r
    chunk = uids[step]                                             # (B, kr)
    slot = chunk * r + within
    doc = ids_flat[jnp.clip(slot, 0, ids_flat.shape[0] - 1)]
    # padding slots hold zero codes (score 0) and PAD ids; mask by id
    valid = doc >= 0

    # 5. drop dual-assignment duplicates (same doc id twice in the set)
    first_dup = (doc[:, None, :] == doc[:, :, None]) & jnp.tril(
        jnp.ones((kr, kr), bool), k=-1
    )[None]
    valid &= ~first_dup.any(axis=2)

    # 6. exact rescore of the surviving candidates: bf16 copy, or the
    # two-level int8 reconstruction (capacity mode — slab codes are
    # already device-resident; only 1 extra byte/dim for the residual)
    re_s = _ivf_rescore(
        q, slot, slabs_all, raw_flat, res_flat, res_scales_flat, global_scale
    )
    re_s = jnp.where(valid, re_s, -jnp.inf)
    top_s, sel = jax.lax.top_k(re_s, k)
    top_i = jnp.take_along_axis(doc, sel, axis=1)
    return top_s, jnp.where(jnp.isfinite(top_s), top_i, PAD_ID)


def _ivf_rescore(q, slot, slabs_all, raw_flat, res_flat, res_scales_flat, gscale):
    """Shared rescore branch for the probe-major and sharded IVF paths.
    slot are flat slab-major positions; slabs_all is the chunked code
    view whose flattening aligns with raw_flat/res_flat positions."""
    if raw_flat is not None:
        rows = jnp.clip(slot, 0, raw_flat.shape[0] - 1)
        cvec = jnp.take(raw_flat, rows, axis=0)                    # (B, kr, D)
        return jax.lax.dot_general(
            cvec, q.astype(cvec.dtype), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    rows = jnp.clip(slot, 0, res_flat.shape[0] - 1)
    d = slabs_all.shape[-1]
    cg = jnp.take(slabs_all.reshape(-1, d), rows, axis=0).astype(jnp.float32)
    cr = jnp.take(res_flat, rows, axis=0).astype(jnp.float32)
    sr = jnp.take(res_scales_flat, rows, axis=0)
    recon = jnp.asarray(gscale, jnp.float32) * cg + sr[..., None] * cr
    # HIGHEST: default TPU precision would truncate the ~15-bit
    # reconstruction back to bf16 (see kernels/mips.py)
    return jax.lax.dot_general(
        recon, q.astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
