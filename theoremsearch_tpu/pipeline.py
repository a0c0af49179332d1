"""End-to-end pipeline glue: catalog -> encoder -> index -> engine.

The TPU-side counterpart of the reference's generate_embeddings stage
(ec2/generate_embeddings/__main__.py:10-167): pages the latest slogans
missing vectors for an embedder, encodes them batched on the mesh,
spools into the resumable IndexBuilder, and records the embedding
manifest (the catalog commit is the checkpoint).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from .core.config import IndexConfig
from .index.builder import IndexBuilder
from .index.flat import PAD_ID, FlatIndex
from .ingest.catalog import Catalog
from .search.engine import SearchEngine
from .search.metadata import CorpusMetadata


def embed_missing_slogans(
    catalog: Catalog,
    encode_fn: Callable[[list[str]], np.ndarray],
    builder: IndexBuilder,
    embedder: str = "qwen",
    page_size: int = 256,
    limit: int | None = None,
) -> int:
    """Encode every latest-slogan lacking a vector; returns rows embedded."""
    done = 0
    for page in catalog.slogans_missing_embedding(embedder, page_size):
        rows = [dict(r) for r in page]
        if limit is not None:
            rows = rows[: max(0, limit - done)]
            if not rows:
                break
        texts = [r["slogan"] or "" for r in rows]
        ids = np.array([r["slogan_id"] for r in rows], np.int64)
        emb = np.asarray(encode_fn(texts), np.float32)
        builder.add(ids, emb)
        catalog.upsert_rows(
            "embedding_manifest",
            [
                {"embedder": embedder, "slogan_id": int(sid), "shard": builder.dir.name, "row": -1}
                for sid in ids
            ],
            ["embedder", "slogan_id"],
        )
        done += len(rows)
        if limit is not None and done >= limit:
            break
    return done


def corpus_metadata_from_catalog(catalog: Catalog, slogan_ids: np.ndarray) -> CorpusMetadata:
    """Join paper+theorem+slogan rows for the indexed slogan ids, in index
    order (the metadata side of the latest-slogan CTE join,
    streamlit_app.py:253-279)."""
    return CorpusMetadata.from_rows(slogan_meta_rows(catalog, slogan_ids))


def slogan_meta_rows(catalog: Catalog, slogan_ids: np.ndarray) -> list[dict]:
    """Metadata column dicts for slogan ids (shared by the index-build
    join above and the live-refresh path below). Batched IN-queries —
    one SELECT per slogan id made engine cold-start N sequential sqlite
    round trips."""
    import json as _json

    sids = [int(s) for s in np.asarray(slogan_ids).tolist()]
    by_sid: dict[int, tuple] = {}
    for start in range(0, len(sids), 500):
        chunk = sids[start : start + 500]
        marks = ",".join("?" * len(chunk))
        for r in catalog.conn.execute(
            "SELECT s.slogan_id, p.paper_id, p.title, p.authors, p.link,"
            " p.last_updated, p.journal_ref, p.primary_category, p.citations,"
            " p.summary, t.name, t.body, s.slogan"
            " FROM theorem_slogan s"
            " JOIN theorem t ON t.theorem_id = s.theorem_id"
            " JOIN paper p ON p.paper_id = t.paper_id"
            f" WHERE s.slogan_id IN ({marks})",
            chunk,
        ):
            by_sid[int(r[0])] = tuple(r[1:])
    rows = []
    for sid in sids:
        r = by_sid.get(sid)
        if r is None:
            rows.append({})
            continue
        year = 0
        if r[4]:
            try:
                year = int(str(r[4])[:4])
            except ValueError:
                year = 0
        rows.append(
            {
                "paper_id": r[0],
                "paper_title": r[1] or "",
                "authors": _json.loads(r[2]) if r[2] else [],
                "link": r[3] or "",
                "year": year,
                "primary_category": r[6] or "",
                "journal_ref": r[5],
                "citations": r[7],
                "summary": r[8] or "",
                "theorem_name": r[9] or "",
                "theorem_body": r[10] or "",
                "slogan": r[11] or "",
            }
        )
    return rows


def refresh_engine_from_catalog(
    catalog: Catalog,
    engine: SearchEngine,
    encode_fn: Callable[[list[str]], np.ndarray],
    embedder: str = "qwen",
    page_size: int = 256,
    builder: IndexBuilder | None = None,
) -> int:
    """Live refresh of a RUNNING engine: embed every latest-slogan that
    has no vector yet and add it to the engine's delta buffer — the doc
    is searchable by the next query. This closes the continuous
    ingest->searchable loop the reference gets for free from pgvector
    (generate_embeddings/__main__.py upserts feeding streamlit_app.py's
    live table scan). Idempotent via the embedding_manifest NOT-EXISTS
    queue; returns docs added.

    builder: the spool IndexBuilder the engine was built from. REQUIRED
    for durability — the manifest marks these slogans embedded, so
    without spooling their vectors a restart would rebuild the index
    WITHOUT them and the NOT-EXISTS queue would never retry them. Pass
    None only for a throwaway in-memory engine."""
    added = 0
    shard = builder.dir.name if builder is not None else "live-delta"
    live_by_theorem: dict[tuple, int] | None = None
    for page in catalog.slogans_missing_embedding(embedder, page_size):
        rows = [dict(r) for r in page]
        texts = [r["slogan"] or "" for r in rows]
        sids = np.array([r["slogan_id"] for r in rows], np.int64)
        emb = np.asarray(encode_fn(texts), np.float32)
        meta_rows = (
            slogan_meta_rows(catalog, sids) if engine.meta is not None else None
        )
        if builder is not None:
            # ordering is the crash-safety contract: spool (durable) ->
            # manifest (marks embedded) -> live add. A crash after the
            # manifest loses only live visibility until restart (the
            # rebuild packs the spooled vector); the reverse order
            # re-added already-live docs on the next poll forever.
            builder.add(sids, emb)
        catalog.upsert_rows(
            "embedding_manifest",
            [
                {
                    "embedder": embedder,
                    "slogan_id": int(sid),
                    "shard": shard,
                    "row": -1,
                }
                for sid in sids
            ],
            ["embedder", "slogan_id"],
        )
        if meta_rows is not None:
            # a NEW latest slogan supersedes the theorem's current doc
            # (the reference's DISTINCT ON latest-slogan selection,
            # streamlit_app.py:254-259): tombstone it so search serves
            # one doc per theorem. Theorem identity = (paper_id, name)
            # (UNIQUE in the reference schema).
            if live_by_theorem is None:
                m = engine.meta
                live_by_theorem = {
                    (m.paper_id[d], m.theorem_name[d]): d
                    for d in range(len(m))
                }
            stale = []
            for mr in meta_rows:
                key = (mr.get("paper_id"), mr.get("theorem_name"))
                old = live_by_theorem.get(key)
                if old is not None:
                    stale.append(old)
            if stale:
                engine.delete_documents(stale)
            new_ids = engine.add_documents(emb, meta_rows=meta_rows)
            for mr, d in zip(meta_rows, new_ids):
                live_by_theorem[(mr.get("paper_id"), mr.get("theorem_name"))] = int(d)
        else:
            engine.add_documents(emb, meta_rows=meta_rows)
        added += len(rows)
    return added


def build_engine_from_catalog(
    catalog: Catalog,
    encode_fn: Callable[[list[str]], np.ndarray],
    spool_dir: str,
    embedder: str = "qwen",
    index_config: IndexConfig | None = None,
    mesh=None,
    use_pallas: bool | None = None,
) -> SearchEngine:
    """One-call path: embed whatever is missing, pack the index, join the
    metadata, return a ready SearchEngine."""
    builder = IndexBuilder(spool_dir, index_config)
    embed_missing_slogans(catalog, encode_fn, builder, embedder)
    index = builder.finalize()
    latest = {
        int(r[0])
        for r in catalog.conn.execute(
            "SELECT MAX(slogan_id) FROM theorem_slogan GROUP BY theorem_id"
        )
    }
    # Self-heal manifest/spool divergence: a slogan can be MARKED
    # embedded while its vector never reached THIS spool (a live refresh
    # ran without the durable builder, or a different spool dir) — the
    # NOT-EXISTS queue would never retry it and the rebuild would
    # silently shrink. Re-embed those ids directly.
    spooled = {int(i) for i in index.ids[: index.num_rows]}
    missing = sorted(latest - spooled)
    if missing:
        texts: list[str] = []
        for start in range(0, len(missing), 500):
            chunk = missing[start : start + 500]
            marks = ",".join("?" * len(chunk))
            got = dict(
                catalog.conn.execute(
                    "SELECT slogan_id, slogan FROM theorem_slogan"
                    f" WHERE slogan_id IN ({marks})",
                    chunk,
                )
            )
            texts.extend([got.get(i) or "" for i in chunk])
        builder.add(
            np.array(missing, np.int64), np.asarray(encode_fn(texts), np.float32)
        )
        index = builder.finalize()
    real_ids = index.ids[: index.num_rows]
    # The spool is append-only: a theorem whose slogan was REGENERATED
    # has its superseded slogan still packed. Keep only ids that are
    # STILL the latest for their theorem, or search returns several
    # docs per theorem (the reference serves exactly the latest:
    # streamlit_app.py:254-259 DISTINCT ON).
    keep = np.array([int(i) in latest for i in real_ids], bool)
    kept_ids = real_ids[keep]
    meta = corpus_metadata_from_catalog(catalog, np.sort(kept_ids))
    # SELECT the kept packed rows in sorted-doc-id (== meta) order and
    # hand the engine row-order ids (arange). Row-order ids keep the
    # fused speed path and the residual capacity rescore eligible — the
    # old remap-ids-in-place approach left rows in spool order, which
    # (a) forced the id->row indirection on every rescore and (b)
    # dropped global_scale in the rebuild, disabling the speed path.
    sel = np.flatnonzero(keep)[np.argsort(kept_ids, kind="stable")]
    n = sel.shape[0]
    pad = index.config.pad_multiple
    padded = ((max(n, 1) + pad - 1) // pad) * pad
    vecs = np.zeros((padded, index.dim), index.vectors.dtype)
    vecs[:n] = index.vectors[sel]
    ids = np.full(padded, PAD_ID, index.ids.dtype)
    ids[:n] = np.arange(n, dtype=index.ids.dtype)
    scales = index.scales
    if scales is not None:
        new_scales = np.zeros(padded, np.float32)
        new_scales[:n] = index.scales[sel]
        scales = new_scales
    resid = index.rescore_residual
    if resid is not None:
        resid = (resid[0][sel], resid[1][sel])
    index = FlatIndex(
        vectors=vecs,
        ids=ids,
        scales=scales,
        num_rows=n,
        config=index.config,
        global_scale=index.global_scale,
        rescore_residual=resid,
    )
    return SearchEngine(index, meta=meta, mesh=mesh, use_pallas=use_pallas)
