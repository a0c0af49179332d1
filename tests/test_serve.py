"""Serving layer tests: LaTeX display cleanup goldens, SearchService
end-to-end with facets, UI-dict filter translation, feedback persistence."""

import json

import numpy as np
import pytest

from theoremsearch_tpu.core import IndexConfig
from theoremsearch_tpu.eval.oracle import l2_normalize
from theoremsearch_tpu.index import FlatIndex
from theoremsearch_tpu.search import CorpusMetadata, SearchEngine
from theoremsearch_tpu.serve import SearchService, clean_latex_for_display


# ---------------- display cleaner goldens ----------------


def test_clean_repairs_truncation():
    out = clean_latex_for_display(r"Let $x be truncated")
    assert out.count("$") % 2 == 0
    out2 = clean_latex_for_display("ends with \\end{align")
    assert "\\end{align}" in out2 or "aligned" in out2


def test_clean_strips_noise_commands():
    src = r"\newcommand{\R}{\mathbb{R}} Statement \label{x} with \cite{paper} refs."
    out = clean_latex_for_display(src)
    assert "newcommand" not in out and "label" not in out and "cite" not in out
    assert "Statement" in out


def test_clean_align_to_aligned():
    src = "Before \\begin{align} a &= b \\\\ c &= d \\label{eq} \\end{align} after"
    out = clean_latex_for_display(src)
    assert "\\begin{aligned}" in out and "$$" in out
    assert "label" not in out
    assert "align}" not in out.replace("aligned}", "")


def test_clean_display_math_isolated():
    out = clean_latex_for_display(r"text \[ E = mc^2 \] more")
    # $$ block on its own lines with blank-line padding
    assert "\n\n$$\nE = mc^2\n$$\n\n" in out


def test_clean_itemize_to_bullets():
    src = "\\begin{itemize}\n\\item first\n\\item second\n\\end{itemize}"
    out = clean_latex_for_display(src)
    assert "- first" in out and "- second" in out and "itemize" not in out


def test_clean_empty_passthrough():
    assert clean_latex_for_display("") == ""


# ---------------- service ----------------


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    n, d = 500, 256

    def encode(texts):
        # deterministic bag-of-words hash encoder: query-time vectors must
        # equal index-time vectors for retrieval assertions to hold.
        # (md5, NOT builtin hash() — that one is salted per process and
        # made this test collide-or-not at random)
        import hashlib

        out = np.zeros((len(texts), d), dtype=np.float32)
        for i, t in enumerate(texts):
            for tok in t.lower().split():
                h = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
                out[i, h % d] += 1.0
        return np.asarray(l2_normalize(out))

    bodies = [f"Theorem body about topic {i % 40} with $x_{i}$" for i in range(n)]
    emb = encode(bodies)
    rows = [
        {
            "paper_id": f"24{i:05d}",
            "paper_title": f"Title {i}",
            "authors": [f"Author {i % 9}"],
            "link": "https://arxiv.org/abs/x" if i % 3 else "https://stacks.math.columbia.edu/tag/x",
            "year": 2015 + i % 10,
            "primary_category": "math.CO",
            "journal_ref": "J" if i % 2 else None,
            "citations": i,
            "theorem_name": f"Theorem {i}.",
            "theorem_body": bodies[i],
            "slogan": f"slogan {i}",
        }
        for i in range(n)
    ]
    meta = CorpusMetadata.from_rows(rows)
    idx = FlatIndex.build(emb, config=IndexConfig(pad_multiple=128), normalize=True)
    eng = SearchEngine(idx, meta=meta, use_pallas=False, row_block=128)
    fb = tmp_path_factory.mktemp("fb") / "feedback.jsonl"
    return SearchService(eng, encode, feedback_path=str(fb)), fb


def test_search_and_display(service):
    svc, _ = service
    rows = svc.search_and_display("topic 7", {"top_k": 5})
    assert len(rows) == 5
    assert all("display_markdown" in r for r in rows)
    assert rows[0]["similarity"] >= rows[-1]["similarity"]
    # the hash encoder should retrieve topic-7 bodies first
    assert "topic 7" in rows[0]["theorem_body"]


def test_search_with_ui_filter_dict(service):
    svc, _ = service
    rows = svc.search_and_display(
        "topic 3",
        {"sources": ["Stacks Project"], "top_k": 4, "citation_weight": 0.2},
    )
    assert rows and all(r["source"] == "Stacks Project" for r in rows)
    assert all(rows[i]["score"] >= rows[i + 1]["score"] for i in range(len(rows) - 1))


def test_no_sources_returns_empty(service):
    svc, _ = service
    assert svc.search_and_display("x", {"sources": []}) == []


def test_facets(service):
    svc, _ = service
    assert svc.load_theorem_count() == 500
    authors = svc.load_authors()
    assert len(authors) == 9
    tags = svc.load_tags_per_source()
    assert "arXiv" in tags and "Stacks Project" in tags


def test_search_batch(service):
    svc, _ = service
    s, i = svc.search_batch(["topic 1", "topic 2", "topic 3"], k=7)
    assert s.shape == (3, 7) and i.shape == (3, 7)


def test_feedback_persisted(service):
    svc, fb = service
    svc.save_feedback("up", "my query", "http://x", "Theorem 1.")
    rec = json.loads(fb.read_text().splitlines()[-1])
    assert rec["feedback"] == "up" and rec["query"] == "my query"
