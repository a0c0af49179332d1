"""Ingest pipeline tests: bundle locator byte ranges, format-sniffing
extraction, main-tex selection, hard-timeout parse driver end-to-end into
the catalog, Stacks ingest, citations fallback chain, date partitioning."""

import gzip
import os
import io
import json
import tarfile
import zipfile
from datetime import datetime
from pathlib import Path

import pytest

from theoremsearch_tpu.ingest.arxiv_api import ArxivPaper, MATH_CATEGORIES, date_partitions, upsert_arxiv
from theoremsearch_tpu.ingest.catalog import Catalog
from theoremsearch_tpu.ingest.citations import get_paper_citations
from theoremsearch_tpu.ingest.main_tex import find_main_tex, score_tex_candidate
from theoremsearch_tpu.ingest.parse_driver import parse_papers, parse_with_hard_timeout
from theoremsearch_tpu.ingest.sources import (
    extract_source_tree,
    fetch_paper_source,
    locate_in_bundles,
    member_name_to_arxiv_id,
    normalize_arxiv_id,
)
from theoremsearch_tpu.ingest.stacks import load_tag_map, upsert_stacks_from_json, upsert_stacks_from_tex

PAPER_TEX = rb"""
\documentclass{article}
\newtheorem{theorem}{Theorem}[section]
\begin{document}
\title{T}\author{A}\maketitle
\section{One}
\begin{theorem}\label{main} Something always holds. \end{theorem}
\end{document}
"""


def _gz(data: bytes) -> bytes:
    return gzip.compress(data)


def _make_bundle(papers: dict[str, bytes]) -> bytes:
    """tar of {arxiv_id: gzipped source}."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        for pid, payload in papers.items():
            info = tarfile.TarInfo(name=f"2401/{pid}.gz")
            info.size = len(payload)
            tar.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def test_arxiv_id_normalization():
    assert normalize_arxiv_id("2401.12345v2") == "2401.12345"
    assert member_name_to_arxiv_id("2401/2401.12345.gz") == "2401.12345"
    assert member_name_to_arxiv_id("math0309136.gz") == "math/0309136"


def test_locator_records_valid_byte_ranges(tmp_path):
    cat = Catalog()
    gz1, gz2 = _gz(PAPER_TEX), _gz(b"other")
    bundle = _make_bundle({"2401.00001": gz1, "2401.00002": gz2})
    bundle_path = tmp_path / "arXiv_src_2401_001.tar"
    bundle_path.write_bytes(bundle)
    for pid in ("2401.00001", "2401.00002"):
        cat.upsert_paper({"paper_id": pid, "title": "t", "authors": [], "summary": "",
                          "link": "", "last_updated": "", "journal_ref": None,
                          "primary_category": "", "categories": [], "citations": None})
    progress = list(locate_in_bundles(cat, [("arXiv_src_2401_001.tar", str(bundle_path))]))
    assert progress == [("arXiv_src_2401_001.tar", 2)]
    row = cat.conn.execute(
        "SELECT bundle_tar, offset_start, offset_end FROM paper_arxiv_s3_location WHERE paper_id='2401.00001'"
    ).fetchone()
    # the recorded range must slice out exactly the gzip member
    data = bundle[row[1] : row[2] + 1]
    assert gzip.decompress(data) == PAPER_TEX


def test_extract_source_tree_formats(tmp_path):
    # gzip -> single tex
    d1 = extract_source_tree(_gz(PAPER_TEX), tmp_path / "a")
    assert (d1 / "main.tex").read_bytes() == PAPER_TEX
    # gzip -> tar
    tb = io.BytesIO()
    with tarfile.open(fileobj=tb, mode="w") as tar:
        info = tarfile.TarInfo("paper.tex")
        info.size = len(PAPER_TEX)
        tar.addfile(info, io.BytesIO(PAPER_TEX))
    d2 = extract_source_tree(_gz(tb.getvalue()), tmp_path / "b")
    assert (d2 / "paper.tex").exists()
    # zip
    zb = io.BytesIO()
    with zipfile.ZipFile(zb, "w") as zf:
        zf.writestr("x.tex", PAPER_TEX)
    d3 = extract_source_tree(zb.getvalue(), tmp_path / "c")
    assert (d3 / "x.tex").exists()
    # raw
    d4 = extract_source_tree(PAPER_TEX, tmp_path / "d")
    assert (d4 / "main.tex").read_bytes() == PAPER_TEX


def test_main_tex_selection(tmp_path):
    (tmp_path / "main.tex").write_text(PAPER_TEX.decode())
    (tmp_path / "section1.tex").write_text("\\section{Included}")
    (tmp_path / "slides.tex").write_text("\\documentclass{beamer}\\begin{document}x\\end{document}")
    (tmp_path / "referee.tex").write_text(
        "\\documentclass{article}\nResponse to referee\n\\begin{document}thanks\\end{document}"
    )
    # main includes section1, so section1 is not a root
    with open(tmp_path / "main.tex", "a") as f:
        f.write("\n\\input{section1}\n")
    best = find_main_tex(tmp_path)
    assert best.name == "main.tex"
    assert score_tex_candidate("\\documentclass{beamer}") < 0


def test_parse_with_hard_timeout_ok(tmp_path):
    (tmp_path / "p.tex").write_bytes(PAPER_TEX)
    status, rows = parse_with_hard_timeout(tmp_path, timeout_s=20)
    assert status == "ok"
    assert rows and rows[0]["name"] == "Theorem 1.1."
    assert rows[0]["label"] == "main"


def test_parse_papers_end_to_end():
    cat = Catalog()
    sources = {}
    for i in range(3):
        pid = f"2401.0000{i}"
        cat.upsert_paper({"paper_id": pid, "title": "t", "authors": [], "summary": "",
                          "link": "", "last_updated": "", "journal_ref": None,
                          "primary_category": "", "categories": [], "citations": None})
        sources[pid] = _gz(PAPER_TEX)
    # one paper has broken source
    sources["2401.00002"] = b"\x00garbage-not-gzip"

    stats = parse_papers(cat, source_fetcher=lambda pid: sources[pid], timeout_s=20)
    assert stats.parsed == 3  # raw payload still parses as main.tex... garbage yields 0 theorems
    assert cat.count("theorem") == 2
    # resume: the theorem-less paper parsed OK (0 theorems) and must
    # LEAVE the queue — re-fetching it every run would pay its S3 ranged
    # GET forever (parse_status records the outcome)
    remaining = [r["paper_id"] for pg in cat.unparsed_papers() for r in pg]
    assert remaining == []
    st = cat.conn.execute(
        "SELECT status, theorems FROM parse_status WHERE paper_id = ?",
        ("2401.00002",),
    ).fetchone()
    assert st[0] == "ok" and st[1] == 0


def test_stacks_json_and_tex_ingest(tmp_path):
    cat = Catalog()
    tags = tmp_path / "tags"
    tags.write_text("# comment\n0001,section-one-lemma\n0002,other-label\n")
    tag_map = load_tag_map(tags)
    assert tag_map == {"section-one-lemma": "0001", "other-label": "0002"}

    sec = [{"theorem": "Lemma 1.2.", "body": "Stacks lemma body", "label": "section-one-lemma"}]
    (tmp_path / "section-one.json").write_text(json.dumps(sec))
    n = upsert_stacks_from_json(cat, tmp_path, tag_map)
    assert n == 1
    row = cat.conn.execute("SELECT link, authors FROM paper").fetchone()
    assert "stacks.math.columbia.edu/tag/0001" in row[0]
    assert "Aise Johan de Jong" in row[1]

    tex = tmp_path / "chapter.tex"
    tex.write_text("\\begin{lemma}\\label{other-label} From tex. \\end{lemma}")
    n2 = upsert_stacks_from_tex(cat, [tex], tag_map)
    assert n2 == 1
    assert cat.count("theorem") == 2


def test_citations_fallback_chain():
    calls = []

    def fetch(url, params):
        calls.append(url)
        if "openalex" in url:
            return None                      # step 1 fails
        if "paper/arXiv:" in url:
            return {"citationCount": None}   # step 2: wrong type
        if "paper/search" in url:
            return {"data": [{"title": "My Paper", "citationCount": 42}]}
        return None

    assert get_paper_citations("2401.00001v3", "My Paper", fetch) == 42
    assert len(calls) == 3
    # exact-title check: mismatch -> None
    def fetch2(url, params):
        if "paper/search" in url:
            return {"data": [{"title": "Different", "citationCount": 9}]}
        return None
    assert get_paper_citations("2401.00001", "My Paper", fetch2) is None
    # step-1 success short-circuits
    def fetch3(url, params):
        return {"cited_by_count": 7} if "openalex" in url else None
    assert get_paper_citations("2401.00001", "T", fetch3) == 7


def test_date_partitions():
    parts = list(date_partitions("month", datetime(2023, 11, 1), datetime(2024, 2, 1)))
    assert parts == [
        ("20231101000000", "20231201000000"),
        ("20231201000000", "20240101000000"),
        ("20240101000000", "20240201000000"),
    ]
    weeks = list(date_partitions("week", datetime(2024, 1, 1), datetime(2024, 1, 20)))
    assert len(weeks) == 3
    with pytest.raises(ValueError):
        list(date_partitions("hour", datetime(2024, 1, 1), datetime(2024, 1, 2)))


def test_upsert_arxiv_with_fake_source():
    cat = Catalog()

    def source(cat_name):
        for i in range(3):
            yield ArxivPaper(
                paper_id=f"{cat_name.split('.')[1]}.{i:05d}",
                title=f"Paper {i}",
                authors=["A"],
                summary="s",
                link="https://arxiv.org/abs/x",
                last_updated="2024",
                journal_ref=None,
                primary_category=cat_name,
            )

    n = upsert_arxiv(
        cat,
        categories=["math.AG", "math.NT"],
        paper_source=source,
        citation_lookup=lambda pid, title: 5,
    )
    assert n == 6
    assert cat.count("paper", ["citations = 5"]) == 6
    assert len(MATH_CATEGORIES) == 32


def test_hard_timeout_drains_large_payload(tmp_path):
    """A >64KB result must come back intact, not be misclassified as a
    timeout (the OS pipe buffer blocks the child's queue feeder thread
    until the parent drains it)."""
    from theoremsearch_tpu.ingest.parse_driver import parse_with_hard_timeout

    body = "x = y + z " * 400  # ~4KB per theorem body
    thms = "\n".join(
        f"\\begin{{theorem}}\\label{{t{i}}} {body}\\end{{theorem}}" for i in range(64)
    )
    (tmp_path / "main.tex").write_text(
        "\\documentclass{article}\\usepackage{amsthm}"
        "\\newtheorem{theorem}{Theorem}"
        f"\\begin{{document}}\n{thms}\n\\end{{document}}\n"
    )
    status, rows = parse_with_hard_timeout(tmp_path, timeout_s=30.0)
    assert status == "ok"
    assert len(rows) == 64
    assert sum(len(r["body"]) for r in rows) > 64 * 1024


def test_normalize_arxiv_id_trailing_version_only():
    from theoremsearch_tpu.ingest.sources import normalize_arxiv_id

    assert normalize_arxiv_id("solv-int/9701001v2") == "solv-int/9701001"
    assert normalize_arxiv_id("2401.12345v11") == "2401.12345"
    assert normalize_arxiv_id("math/0309136") == "math/0309136"


REAL_PAPER = "/root/reference/downloaded_sources/2509.19389v1_source/2509.19389v1.tar.gz"


@pytest.mark.skipif(not os.path.exists(REAL_PAPER), reason="real-paper fixture not mounted")
def test_real_arxiv_payload_pdf_only(tmp_path):
    """Real arXiv payload (2509.19389v1): despite the .tar.gz name the
    bytes are a PDF — arXiv serves PDF when a paper has no TeX source.
    The sniffer must not masquerade it as main.tex, and the parse path
    must yield zero theorems cleanly instead of crashing."""
    from theoremsearch_tpu.ingest.parse_driver import parse_with_hard_timeout
    from theoremsearch_tpu.ingest.sources import extract_source_tree

    data = open(REAL_PAPER, "rb").read()
    src = extract_source_tree(data, tmp_path / "src")
    assert (src / "paper.pdf").exists()
    assert not list(src.rglob("*.tex"))
    status, rows = parse_with_hard_timeout(src, timeout_s=20)
    assert status == "ok"
    assert rows == []
