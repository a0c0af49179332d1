"""Slogan subsystem tests: prompt configs, offline client, paged
generation with retry + resume, batch JSONL build/ingest, cost tracking."""

import json

import pytest

from theoremsearch_tpu.ingest.catalog import Catalog
from theoremsearch_tpu.slogans import (
    CostTracker,
    OfflineStubClient,
    PromptConfig,
    format_usd,
    generate_slogans,
    load_prompt,
)
from theoremsearch_tpu.slogans.batch import build_batch_prompts, ingest_batch_results
from theoremsearch_tpu.utils.tracing import JsonlTracer


@pytest.fixture
def catalog():
    cat = Catalog()
    for i in range(5):
        cat.upsert_paper(
            {
                "paper_id": f"2401.{i:05d}",
                "title": f"P{i}",
                "authors": [f"A{i}"],
                "summary": f"paper summary {i}",
                "link": "https://arxiv.org/abs/x",
                "last_updated": "2024-01-01",
                "journal_ref": None,
                "primary_category": "math.AG",
                "categories": ["math.AG"],
                "citations": i,
            }
        )
        cat.replace_theorems(
            f"2401.{i:05d}",
            [{"name": "Theorem 1.", "body": f"Let $x_{i} > 0$. Then $x^2 \\geq 0$. This is fact {i}."}],
            "scanner",
        )
    return cat


def test_load_prompt_builtin_and_file(tmp_path):
    p = load_prompt("body-only-v1")
    assert p.prompt_id == "body-only-v1"
    assert p.context_fields == [("theorem", "body")]
    custom = {"prompt_id": "custom-v1", "instructions": ["Do a thing."], "context": ["theorem.body", "paper.summary"], "temperature": 0.7}
    f = tmp_path / "custom-v1.prompt"
    f.write_text(json.dumps(custom))
    p2 = load_prompt(str(f))
    assert p2.temperature == 0.7
    assert ("paper", "summary") in p2.context_fields
    p3 = load_prompt("custom-v1", prompts_dir=tmp_path)
    assert p3.prompt_id == "custom-v1"
    with pytest.raises(FileNotFoundError):
        load_prompt("nope-v9")


def test_offline_stub_strips_latex():
    c = OfflineStubClient()
    out = c.complete([], {"theorem_body": r"Let $G$ be a group. Then \emph{every} subgroup of $G$ is nice."}, 0.2)
    assert out.text and "$" not in out.text
    assert "subgroup" in out.text
    assert out.cost_usd == 0.0


def test_generate_slogans_end_to_end(catalog, tmp_path):
    prompt = load_prompt("body-and-summary-v1")
    tracer = JsonlTracer(tmp_path / "trace.jsonl")
    cost = generate_slogans(catalog, prompt, OfflineStubClient(), page_size=2, tracer=tracer)
    assert catalog.count("theorem_slogan") == 5
    assert cost.calls == 5
    # resume: nothing left to do
    cost2 = generate_slogans(catalog, prompt, OfflineStubClient())
    assert cost2.calls == 0
    # traces written
    lines = (tmp_path / "trace.jsonl").read_text().splitlines()
    assert len(lines) == 5
    rec = json.loads(lines[0])
    assert rec["prompt_id"] == "body-and-summary-v1" and "latency_s" in rec


def test_generate_slogans_retry():
    cat = Catalog()
    cat.upsert_paper({"paper_id": "p1", "title": "t", "authors": [], "summary": "", "link": "", "last_updated": "", "journal_ref": None, "primary_category": "", "categories": [], "citations": 0})
    cat.replace_theorems("p1", [{"name": "Theorem 1.", "body": "b"}], "scanner")

    class Flaky:
        model_name = "flaky"

        def __init__(self):
            self.n = 0

        def complete(self, instructions, payload, temperature):
            self.n += 1
            if self.n == 1:
                raise RuntimeError("transient")
            from theoremsearch_tpu.slogans.client import Completion

            return Completion("ok", 1, 1, 0.0)

    generate_slogans(cat, load_prompt("body-only-v1"), Flaky(), max_retries=2)
    assert cat.count("theorem_slogan") == 1


def test_batch_build_and_ingest(catalog, tmp_path):
    prompt = load_prompt("body-only-v1")
    parts = build_batch_prompts(catalog, prompt, "DeepSeek-V3.1", tmp_path, records_per_part=2)
    assert len(parts) == 3  # 5 records, 2 per part
    rec = json.loads(parts[0].read_text().splitlines()[0])
    assert "recordId" in rec and rec["modelInput"]["messages"][0]["role"] == "user"
    # simulate provider output and ingest
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    outs = []
    for p in parts:
        for line in p.read_text().splitlines():
            r = json.loads(line)
            outs.append(json.dumps({
                "recordId": r["recordId"],
                "modelOutput": {"choices": [{"message": {"content": f"slogan for {r['recordId']}"}}]},
            }))
    (out_dir / "results.jsonl").write_text("\n".join(outs))
    n = ingest_batch_results(catalog, out_dir, "DeepSeek-V3.1", "body-only-v1")
    assert n == 5
    assert catalog.count("theorem_slogan") == 5


def test_cost_tracker():
    c = CostTracker()
    c.add(1000, 500, 0.01)
    c.add(1000, 500, 0.03)
    assert c.total_usd == pytest.approx(0.04)
    assert c.avg_usd == pytest.approx(0.02)
    assert format_usd(0.5) == "$0.500000"
    assert c.summary()["calls"] == 2


def test_shipped_prompt_configs_load():
    """The three versioned .prompt files ship with the package and resolve
    by id (reference parity: ec2/slogan_prompts/)."""
    from theoremsearch_tpu.slogans.prompts import load_prompt

    for pid in ("body-only-v1", "body-and-abstract-v1", "body-and-introduction-v1"):
        cfg = load_prompt(pid)
        assert cfg.prompt_id == pid
        assert cfg.instructions
        assert all("." in c for c in cfg.context)
