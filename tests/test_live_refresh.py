"""Continuous ingest -> searchable loop: new catalog rows reach a RUNNING
engine through refresh_engine_from_catalog (the reference gets this from
pgvector upserts; we get it from the live delta buffer)."""

import gzip

import numpy as np

from theoremsearch_tpu.ingest.catalog import Catalog
from theoremsearch_tpu.ingest.parse_driver import parse_papers
from theoremsearch_tpu.pipeline import (
    build_engine_from_catalog,
    refresh_engine_from_catalog,
)
from theoremsearch_tpu.search import SearchFilters
from theoremsearch_tpu.slogans import OfflineStubClient, generate_slogans, load_prompt


def _tex(topic):
    return (
        "\\documentclass{article}\n"
        "\\newtheorem{theorem}{Theorem}[section]\n"
        "\\begin{document}\\section{Intro}\n"
        f"\\begin{{theorem}} Every result about {topic} holds. \\end{{theorem}}\n"
        "\\end{document}\n"
    ).encode()


def _hash_encode(texts):
    out = np.zeros((len(texts), 128), np.float32)
    for i, t in enumerate(texts):
        for tok in t.lower().split():
            out[i, hash(tok) % 128] += 1.0
    n = np.linalg.norm(out, axis=1, keepdims=True)
    return out / np.maximum(n, 1e-9)


def _add_paper(cat, sources, pid, topic, year="2024-01-01"):
    cat.upsert_paper(
        {
            "paper_id": pid,
            "title": f"A paper on {topic}",
            "authors": ["Author X"],
            "summary": f"We study {topic}.",
            "link": f"https://arxiv.org/abs/{pid}",
            "last_updated": year,
            "journal_ref": None,
            "primary_category": "math.NT",
            "categories": ["math.NT"],
            "citations": 5,
        }
    )
    sources[pid] = gzip.compress(_tex(topic))


def test_refresh_makes_new_docs_searchable(tmp_path):
    cat = Catalog()
    sources = {}
    for i, topic in enumerate(["prime gaps", "modular forms", "elliptic curves"]):
        _add_paper(cat, sources, f"2401.{i:05d}", topic)
    parse_papers(cat, source_fetcher=lambda pid: sources[pid], timeout_s=30)
    generate_slogans(cat, load_prompt("body-only-v1"), OfflineStubClient())

    engine = build_engine_from_catalog(
        cat, _hash_encode, str(tmp_path / "spool"), use_pallas=False
    )
    assert engine.n_valid == 3

    # nothing new yet: refresh is a no-op (idempotent NOT-EXISTS queue)
    assert refresh_engine_from_catalog(cat, engine, _hash_encode) == 0

    # a new paper lands AFTER the server started
    _add_paper(cat, sources, "2407.99999", "tropical geometry", year="2025-06-01")
    parse_papers(cat, source_fetcher=lambda pid: sources[pid], timeout_s=30)
    generate_slogans(cat, load_prompt("body-only-v1"), OfflineStubClient())

    added = refresh_engine_from_catalog(cat, engine, _hash_encode)
    assert added == 1
    assert engine.num_live == 4

    # searchable with full metadata join, no restart
    rows = engine.search(
        _hash_encode(["tropical geometry"])[0], SearchFilters(top_k=2)
    )
    assert rows[0]["paper_title"] == "A paper on tropical geometry"
    assert rows[0]["year"] == 2025
    assert "tropical geometry" in rows[0]["theorem_body"]

    # second refresh: idempotent
    assert refresh_engine_from_catalog(cat, engine, _hash_encode) == 0


def test_refresh_with_builder_is_durable(tmp_path):
    """Refreshes that spool through the engine's IndexBuilder survive a
    restart: the manifest marks the slogans embedded (so the NOT-EXISTS
    queue never retries them), and the rebuild packs the spooled vectors
    into the main index — without the builder those docs would silently
    vanish from the next boot."""
    cat = Catalog()
    sources = {}
    for i, topic in enumerate(["prime gaps", "modular forms"]):
        _add_paper(cat, sources, f"2401.{i:05d}", topic)
    parse_papers(cat, source_fetcher=lambda pid: sources[pid], timeout_s=30)
    generate_slogans(cat, load_prompt("body-only-v1"), OfflineStubClient())

    from theoremsearch_tpu.index import IndexBuilder

    spool = str(tmp_path / "spool")
    engine = build_engine_from_catalog(cat, _hash_encode, spool, use_pallas=False)
    assert engine.n_valid == 2

    _add_paper(cat, sources, "2407.99999", "tropical geometry", year="2025-06-01")
    parse_papers(cat, source_fetcher=lambda pid: sources[pid], timeout_s=30)
    generate_slogans(cat, load_prompt("body-only-v1"), OfflineStubClient())

    # durable path: re-open the same spool the engine was built from
    added = refresh_engine_from_catalog(
        cat, engine, _hash_encode, builder=IndexBuilder(spool)
    )
    assert added == 1 and engine.num_live == 3

    # "restart": rebuild from the same catalog + spool. The manifest says
    # nothing is missing, so the new doc must come from the spooled batch.
    engine2 = build_engine_from_catalog(cat, _hash_encode, spool, use_pallas=False)
    assert engine2.n_valid == 3
    rows = engine2.search(
        _hash_encode(["tropical geometry"])[0], SearchFilters(top_k=1)
    )
    assert rows[0]["paper_title"] == "A paper on tropical geometry"
