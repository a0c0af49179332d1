"""Catalog tests: schema, idempotent upsert, keyset pagination resume,
NOT-EXISTS work queues, delete-then-insert re-parse semantics."""

from theoremsearch_tpu.ingest.catalog import Catalog


def _paper(i):
    return {
        "paper_id": f"2401.{i:05d}",
        "title": f"Paper {i}",
        "authors": [f"A{i}"],
        "summary": "s",
        "link": f"https://arxiv.org/abs/2401.{i:05d}",
        "last_updated": "2024-01-01",
        "journal_ref": None,
        "primary_category": "math.AG",
        "categories": ["math.AG"],
        "citations": i,
    }


def test_upsert_idempotent():
    cat = Catalog()
    cat.upsert_paper(_paper(1))
    cat.upsert_paper(_paper(1))
    assert cat.count("paper") == 1
    p = dict(_paper(1), citations=99)
    cat.upsert_paper(p)
    row = cat.conn.execute("SELECT citations FROM paper").fetchone()
    assert row[0] == 99


def test_keyset_pagination_resume():
    cat = Catalog()
    for i in range(25):
        cat.upsert_paper(_paper(i))
    pages = list(cat.paginate("SELECT paper_id FROM paper", "paper_id", page_size=10))
    assert [len(p) for p in pages] == [10, 10, 5]
    seen = [r["paper_id"] for pg in pages for r in pg]
    assert seen == sorted(seen) and len(set(seen)) == 25
    # resume after a crash: start_after the 10th key yields the rest
    resumed = list(
        cat.paginate("SELECT paper_id FROM paper", "paper_id", page_size=10, start_after=seen[9])
    )
    assert [r["paper_id"] for pg in resumed for r in pg] == seen[10:]


def test_work_queues_and_replace_theorems():
    cat = Catalog()
    for i in range(3):
        cat.upsert_paper(_paper(i))
    unparsed = [r["paper_id"] for pg in cat.unparsed_papers() for r in pg]
    assert len(unparsed) == 3
    cat.replace_theorems(
        unparsed[0],
        [
            {"name": "Theorem 1.", "body": "b1", "label": "l1"},
            {"name": "Theorem 2.", "body": "b2", "label": None},
            {"name": "Theorem 1.", "body": "dup name disambiguated", "label": None},
        ],
        parsing_method="scanner",
    )
    # duplicated headings (unnumbered envs all titled alike) keep ALL
    # rows, suffixing later ones — dropping them would lose theorems
    assert cat.count("theorem") == 3
    names0 = {r[0] for r in cat.conn.execute(
        "SELECT name FROM theorem WHERE paper_id = ?", (unparsed[0],))}
    assert "Theorem 1. (2)" in names0
    unparsed2 = [r["paper_id"] for pg in cat.unparsed_papers() for r in pg]
    assert len(unparsed2) == 2
    # re-parse replaces
    cat.replace_theorems(unparsed[0], [{"name": "Lemma 1.", "body": "x"}], "scanner")
    names = [r[0] for r in cat.conn.execute("SELECT name FROM theorem").fetchall()]
    assert names == ["Lemma 1."]


def test_slogan_and_embedding_queues():
    cat = Catalog()
    cat.upsert_paper(_paper(0))
    cat.replace_theorems("2401.00000", [{"name": "Theorem 1.", "body": "b"}], "scanner")
    tid = cat.conn.execute("SELECT theorem_id FROM theorem").fetchone()[0]
    missing = [r for pg in cat.theorems_missing_slogan("m", "p1") for r in pg]
    assert len(missing) == 1
    cat.upsert_row(
        "theorem_slogan",
        {"theorem_id": tid, "model": "m", "prompt_id": "p1", "slogan": "s1"},
        ["theorem_id", "model", "prompt_id"],
    )
    assert not list(cat.theorems_missing_slogan("m", "p1"))
    # second slogan version: embedding queue picks the LATEST slogan only
    cat.upsert_row(
        "theorem_slogan",
        {"theorem_id": tid, "model": "m", "prompt_id": "p2", "slogan": "s2"},
        ["theorem_id", "model", "prompt_id"],
    )
    missing_emb = [r for pg in cat.slogans_missing_embedding("qwen") for r in pg]
    assert len(missing_emb) == 1 and missing_emb[0]["slogan"] == "s2"
    cat.upsert_row(
        "embedding_manifest",
        {"embedder": "qwen", "slogan_id": missing_emb[0]["slogan_id"], "shard": "shard_0000", "row": 0},
        ["embedder", "slogan_id"],
    )
    assert not list(cat.slogans_missing_embedding("qwen"))


def test_build_query_and_random_sample():
    cat = Catalog()
    for i in range(10):
        cat.upsert_paper(_paper(i))
    q = cat.build_query("paper", ["paper_id"], ["citations > 5"], random_sample=3)
    rows = cat.conn.execute(q).fetchall()
    assert len(rows) == 3
    assert cat.count("paper", ["citations > 5"]) == 4
