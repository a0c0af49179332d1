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
from .index.flat import FlatIndex
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
    join above and the live-refresh path below)."""
    import json as _json

    rows = []
    for sid in np.asarray(slogan_ids).tolist():
        r = catalog.conn.execute(
            "SELECT p.paper_id, p.title, p.authors, p.link, p.last_updated,"
            " p.journal_ref, p.primary_category, p.citations, p.summary,"
            " t.name, t.body, s.slogan"
            " FROM theorem_slogan s"
            " JOIN theorem t ON t.theorem_id = s.theorem_id"
            " JOIN paper p ON p.paper_id = t.paper_id"
            " WHERE s.slogan_id = ?",
            (int(sid),),
        ).fetchone()
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
    for page in catalog.slogans_missing_embedding(embedder, page_size):
        rows = [dict(r) for r in page]
        texts = [r["slogan"] or "" for r in rows]
        sids = np.array([r["slogan_id"] for r in rows], np.int64)
        emb = np.asarray(encode_fn(texts), np.float32)
        meta_rows = (
            slogan_meta_rows(catalog, sids) if engine.meta is not None else None
        )
        if builder is not None:
            builder.add(sids, emb)   # durable: next rebuild packs them
        engine.add_documents(emb, meta_rows=meta_rows)
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
    real_ids = index.ids[index.ids >= 0]
    meta = corpus_metadata_from_catalog(catalog, np.sort(real_ids))
    # PERMUTE index rows into sorted-doc-id (== meta) order and hand the
    # engine row-order ids (arange). Row-order ids keep the fused speed
    # path and the residual capacity rescore eligible — the previous
    # remap-ids-in-place approach left rows in spool order, which (a)
    # forced the id->row indirection on every rescore and (b) dropped
    # global_scale in the rebuild, silently disabling the speed path.
    order = np.argsort(real_ids, kind="stable")
    n = index.num_rows
    vecs = index.vectors.copy()
    vecs[:n] = index.vectors[:n][order]
    ids = index.ids.copy()
    ids[:n] = np.arange(n, dtype=index.ids.dtype)
    scales = index.scales
    if scales is not None:
        scales = scales.copy()
        scales[:n] = index.scales[:n][order]
    resid = index.rescore_residual
    if resid is not None:
        resid = (resid[0][order], resid[1][order])
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
