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


def test_serve_refresh_thread_end_to_end(tmp_path):
    """`serve --refresh-interval` polls the catalog from a BACKGROUND
    thread. sqlite connections are bound to their creating thread, so
    the poll thread must open its own Catalog — regression for the bug
    where it borrowed the main thread's connection, every poll raised
    ProgrammingError into the broad except, and live refresh silently
    never worked in the exact deployment path built for it."""
    import json
    import time
    import urllib.request
    from argparse import Namespace

    from theoremsearch_tpu.cli import make_search_server

    db = str(tmp_path / "cat.db")
    cat = Catalog(db)
    sources = {}
    for i, topic in enumerate(["prime gaps", "modular forms", "elliptic curves"]):
        _add_paper(cat, sources, f"2401.{i:05d}", topic)
    parse_papers(cat, source_fetcher=lambda pid: sources[pid], timeout_s=30)
    generate_slogans(cat, load_prompt("body-only-v1"), OfflineStubClient())

    args = Namespace(
        catalog=db, spool=str(tmp_path / "spool"), model_dir=None,
        host="127.0.0.1", port=0, no_batching=False, max_batch=16,
        max_wait_ms=5.0, max_pending=64, warm=False, refresh_interval=0.2,
    )
    srv, sched = make_search_server(args)
    srv.start()
    try:
        base = f"http://127.0.0.1:{srv.port}"

        def corpus():
            with urllib.request.urlopen(base + "/health", timeout=30) as r:
                return json.loads(r.read())["corpus"]

        assert corpus() == 3
        # a new sloganed paper lands in the catalog AFTER serving started
        _add_paper(cat, sources, "2407.99999", "tropical geometry")
        parse_papers(cat, source_fetcher=lambda pid: sources[pid], timeout_s=30)
        generate_slogans(cat, load_prompt("body-only-v1"), OfflineStubClient())

        deadline = time.time() + 30
        n = corpus()
        while n < 4 and time.time() < deadline:
            time.sleep(0.25)
            n = corpus()
        assert n == 4, "refresh thread never picked up the new doc"
        # and it is actually searchable through the serving path (the
        # random-init encoder gives no ranking guarantee; with top_k=4
        # over 4 docs, presence proves the delta doc is served)
        body = json.dumps({"query": "tropical geometry", "top_k": 4}).encode()
        req = urllib.request.Request(
            base + "/search", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert "2407.99999" in [r["paper_id"] for r in out["results"]]
    finally:
        srv.stop()
        if sched is not None:
            sched.shutdown()
        cat.close()


def test_rebuild_serves_only_latest_slogans(tmp_path):
    """The spool is append-only; when a theorem's slogan is REGENERATED
    (new prompt -> higher slogan_id), a rebuild must pack only the
    CURRENT latest slogan per theorem — not both (the reference serves
    exactly the latest via DISTINCT ON, streamlit_app.py:254-259)."""
    cat = Catalog()
    sources = {}
    for i, topic in enumerate(["prime gaps", "modular forms", "elliptic curves"]):
        _add_paper(cat, sources, f"2401.{i:05d}", topic)
    parse_papers(cat, source_fetcher=lambda pid: sources[pid], timeout_s=30)
    generate_slogans(cat, load_prompt("body-only-v1"), OfflineStubClient())
    spool = str(tmp_path / "spool")
    engine = build_engine_from_catalog(cat, _hash_encode, spool, use_pallas=False)
    assert engine.n_valid == 3

    # regenerate slogans under a different prompt: every theorem gets a
    # NEW latest slogan
    generate_slogans(cat, load_prompt("body-and-abstract-v1"), OfflineStubClient())
    engine2 = build_engine_from_catalog(cat, _hash_encode, spool, use_pallas=False)
    assert engine2.n_valid == 3          # one doc per theorem, not 6
    rows = engine2.search(
        _hash_encode(["prime gaps"])[0], SearchFilters(top_k=3)
    )
    assert len({r["paper_id"] for r in rows}) == 3  # no duplicate theorems


def test_refresh_tombstones_superseded_slogan(tmp_path):
    """Live refresh after slogan regeneration: the theorem's old doc is
    tombstoned as the new latest slogan goes live — search keeps one doc
    per theorem without a rebuild."""
    cat = Catalog()
    sources = {}
    for i, topic in enumerate(["prime gaps", "modular forms"]):
        _add_paper(cat, sources, f"2401.{i:05d}", topic)
    parse_papers(cat, source_fetcher=lambda pid: sources[pid], timeout_s=30)
    generate_slogans(cat, load_prompt("body-only-v1"), OfflineStubClient())
    engine = build_engine_from_catalog(
        cat, _hash_encode, str(tmp_path / "spool"), use_pallas=False
    )
    assert engine.n_valid == 2 and engine.num_live == 2

    generate_slogans(cat, load_prompt("body-and-abstract-v1"), OfflineStubClient())
    added = refresh_engine_from_catalog(cat, engine, _hash_encode)
    assert added == 2
    assert engine.num_live == 2          # 2 tombstoned + 2 added
    rows = engine.search(_hash_encode(["prime gaps"])[0], SearchFilters(top_k=2))
    assert len({r["paper_id"] for r in rows}) == 2   # one doc per theorem
    # and the served docs are the NEW slogans (delta ids >= 2)
    assert all(r["doc_id"] >= 2 for r in rows)
