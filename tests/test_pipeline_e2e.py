"""Full-pipeline integration: papers -> parse -> slogans -> embed ->
index -> engine -> serve, all through the catalog, plus the CLI surface
and the quality probes."""

import gzip
import json
import subprocess
import sys

import numpy as np
import pytest

from theoremsearch_tpu.encoder import BatchedEncoder, SimpleTokenizer
from theoremsearch_tpu.core.config import EncoderConfig
from theoremsearch_tpu.encoder.model import init_params
from theoremsearch_tpu.eval.quality import (
    MismatchEstimate,
    estimate_source_mismatch,
    parse_rating,
    rate_slogans_quality,
)
from theoremsearch_tpu.index.builder import IndexBuilder
from theoremsearch_tpu.ingest.catalog import Catalog
from theoremsearch_tpu.ingest.parse_driver import parse_papers
from theoremsearch_tpu.pipeline import build_engine_from_catalog, embed_missing_slogans
from theoremsearch_tpu.search.filters import SearchFilters
from theoremsearch_tpu.serve.app import SearchService
from theoremsearch_tpu.slogans import OfflineStubClient, generate_slogans, load_prompt

TOPICS = ["prime numbers", "graph colorings", "elliptic curves", "banach spaces", "random walks"]


def _paper_tex(i):
    return (
        "\\documentclass{article}\n"
        "\\newtheorem{theorem}{Theorem}[section]\n"
        "\\begin{document}\\section{Intro}\n"
        f"\\begin{{theorem}}\\label{{t{i}}} Every result about {TOPICS[i % 5]} "
        f"holds with constant {i}. \\end{{theorem}}\n"
        "\\end{document}\n"
    ).encode()


@pytest.fixture(scope="module")
def full_catalog():
    cat = Catalog()
    sources = {}
    for i in range(10):
        pid = f"2401.{i:05d}"
        cat.upsert_paper(
            {
                "paper_id": pid,
                "title": f"A paper on {TOPICS[i % 5]}",
                "authors": [f"Author {i % 3}"],
                "summary": f"We study {TOPICS[i % 5]}.",
                "link": f"https://arxiv.org/abs/{pid}",
                "last_updated": "2024-01-01",
                "journal_ref": "J" if i % 2 else None,
                "primary_category": "math.NT",
                "categories": ["math.NT"],
                "citations": 10 * i,
            }
        )
        sources[pid] = gzip.compress(_paper_tex(i))
    stats = parse_papers(cat, source_fetcher=lambda pid: sources[pid], timeout_s=30)
    assert stats.parsed == 10
    cost = generate_slogans(cat, load_prompt("body-only-v1"), OfflineStubClient())
    assert cat.count("theorem_slogan") == 10
    return cat


def _hash_encode(texts):
    out = np.zeros((len(texts), 128), np.float32)
    for i, t in enumerate(texts):
        for tok in t.lower().split():
            out[i, hash(tok) % 128] += 1.0
    n = np.linalg.norm(out, axis=1, keepdims=True)
    return out / np.maximum(n, 1e-9)


def test_full_pipeline_catalog_to_serving(full_catalog, tmp_path):
    engine = build_engine_from_catalog(
        full_catalog, _hash_encode, str(tmp_path / "spool"), use_pallas=False
    )
    assert engine.n_valid == 10
    svc = SearchService(engine, _hash_encode)
    rows = svc.search_and_display("graph colorings", SearchFilters(top_k=3))
    assert len(rows) == 3
    assert "graph colorings" in rows[0]["theorem_body"]
    assert rows[0]["theorem_name"].startswith("Theorem 1.1")
    assert rows[0]["paper_title"].startswith("A paper on")
    # filters flow through metadata joined from the catalog
    rows2 = svc.search_and_display(
        "graph colorings", SearchFilters(top_k=5, citation_range=(0, 30), include_unknown_citations=False)
    )
    assert rows2 and all(r["citations"] <= 30 for r in rows2)


def test_embed_resume(full_catalog, tmp_path):
    b = IndexBuilder(tmp_path / "sp2")
    n1 = embed_missing_slogans(full_catalog, _hash_encode, b, embedder="resume-test", limit=4)
    assert n1 == 4
    n2 = embed_missing_slogans(full_catalog, _hash_encode, b, embedder="resume-test")
    assert n2 == 6
    assert b.total_rows == 10


def test_real_encoder_through_pipeline(tmp_path):
    # tiny real transformer encoder end-to-end (not the hash stub)
    cat = Catalog()
    cat.upsert_paper({"paper_id": "p1", "title": "t", "authors": [], "summary": "",
                      "link": "https://arxiv.org/abs/p1", "last_updated": "2024",
                      "journal_ref": None, "primary_category": "math.AG",
                      "categories": [], "citations": 1})
    cat.replace_theorems("p1", [{"name": "Theorem 1.", "body": "On prime gaps."}], "scanner")
    generate_slogans(cat, load_prompt("body-only-v1"), OfflineStubClient())
    cfg = EncoderConfig.tiny()
    import jax

    be = BatchedEncoder(init_params(cfg, jax.random.PRNGKey(0)), cfg,
                        tokenizer=SimpleTokenizer(vocab_size=cfg.vocab_size), batch_size=4)
    engine = build_engine_from_catalog(cat, be.encode, str(tmp_path / "sp3"), use_pallas=False)
    svc = SearchService(engine, be.encode)
    rows = svc.search_and_display("prime gaps", SearchFilters(top_k=1))
    assert len(rows) == 1 and rows[0]["theorem_name"] == "Theorem 1."


def test_quality_probes(full_catalog):
    report = rate_slogans_quality(full_catalog, sample_size=5)
    # the offline stub judge echoes text, not JSON ratings -> no ratings;
    # use a deterministic fake judge instead
    class FakeJudge:
        model_name = "fake-judge"

        def complete(self, instructions, payload, temperature):
            from theoremsearch_tpu.slogans.client import Completion

            r = 5 if "constant" in (payload.get("slogan") or "") else 2
            return Completion(json.dumps({"rating": r, "reason": "x"}), 1, 1, 0.0)

    report = rate_slogans_quality(full_catalog, judge=FakeJudge(), sample_size=5)
    assert len(report.ratings) == 5
    assert report.mean == 5.0 and not report.flagged

    assert parse_rating('{"rating": 3, "reason": "ok"}') == 3
    assert parse_rating('the rating is {"rating": 4}') == 4
    assert parse_rating("garbage") is None
    assert parse_rating(None) is None


def test_mismatch_estimator():
    est = estimate_source_mismatch(
        [f"p{i}" for i in range(100)],
        compare_fn=lambda pid: int(pid[1:]) % 10 != 0,  # 10% mismatch
    )
    assert est.n == 100 and est.mismatches == 10
    lo, hi = est.ci95
    assert lo < 0.1 < hi
    assert "p̂=0.100" in est.summary()
    assert MismatchEstimate(0, 0).ci95 == (0.0, 0.0)


def test_cli_help_and_eval(tmp_path, validation_csv):
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin", "PYTHONPATH": "/root/repo", "HOME": "/root"}
    out = subprocess.run(
        [sys.executable, "-m", "theoremsearch_tpu", "--help"],
        capture_output=True, text=True, env=env,
    )
    assert out.returncode == 0
    for cmd in ("ingest-arxiv", "parse", "slogans", "embed", "search", "eval", "quality"):
        assert cmd in out.stdout


def test_pipeline_residual_capacity_path(full_catalog, tmp_path):
    """Catalog -> engine with the int8-global-residual config: the rebuilt
    index must keep global_scale, hand the engine row-order ids, and
    auto-adopt the residual rescore data (the production capacity mode)."""
    from theoremsearch_tpu.core import IndexConfig

    engine = build_engine_from_catalog(
        full_catalog,
        _hash_encode,
        str(tmp_path / "spool_resid"),
        embedder="resid-path",  # distinct: the shared catalog already has
        # rows embedded under the default embedder name
        index_config=IndexConfig(
            dim=128, pad_multiple=8, dtype="int8", int8_scale="global",
            residual=True,
        ),
        use_pallas=False,
    )
    assert engine._global_scale > 0, "global_scale lost in the rebuild"
    assert engine.rescore_residual is not None, "residual not adopted"
    n = engine.n_valid
    assert np.array_equal(np.asarray(engine.ids[:n]).ravel(), np.arange(n))
    svc = SearchService(engine, _hash_encode)
    rows = svc.search_and_display("graph colorings", SearchFilters(top_k=3))
    assert len(rows) == 3
    assert "graph colorings" in rows[0]["theorem_body"]
