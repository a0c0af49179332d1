"""HTTP API tests: drive a live server over a real socket."""

import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from theoremsearch_tpu.core import IndexConfig
from theoremsearch_tpu.eval.oracle import l2_normalize
from theoremsearch_tpu.index import FlatIndex
from theoremsearch_tpu.search import CorpusMetadata, SearchEngine
from theoremsearch_tpu.serve.app import SearchService
from theoremsearch_tpu.serve.http_api import SearchServer


@pytest.fixture(scope="module")
def server():
    n, d = 300, 128

    def encode(texts):
        import hashlib

        out = np.zeros((len(texts), d), np.float32)
        for i, t in enumerate(texts):
            for tok in t.lower().split():
                # md5, not builtin hash(): hash() is salted per process,
                # so collisions (and this test) would depend on
                # PYTHONHASHSEED (same fix as test_serve)
                h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:4], "little")
                out[i, h % d] += 1.0
        return np.asarray(l2_normalize(out))

    bodies = [f"statement about subject {i % 30}" for i in range(n)]
    rows = [
        {"paper_id": f"p{i}", "paper_title": f"Title {i}", "authors": [f"A{i % 5}"],
         "link": "https://arxiv.org/abs/x", "year": 2020, "primary_category": "math.NT",
         "journal_ref": None, "citations": i, "theorem_name": "Theorem 1.",
         "theorem_body": bodies[i], "slogan": f"slogan {i}"}
        for i in range(n)
    ]
    idx = FlatIndex.build(encode(bodies), config=IndexConfig(pad_multiple=128), normalize=True)
    eng = SearchEngine(idx, meta=CorpusMetadata.from_rows(rows), use_pallas=False, row_block=128)
    srv = SearchServer(SearchService(eng, encode)).start()
    yield srv
    srv.stop()


def _get(server, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{server.port}{path}", timeout=10) as r:
        return r.status, json.loads(r.read())


def _post(server, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health_and_facets(server):
    code, health = _get(server, "/health")
    assert code == 200 and health["status"] == "ok" and health["corpus"] == 300
    code, facets = _get(server, "/facets")
    assert code == 200 and len(facets["authors"]) == 5


def test_metrics_without_scheduler(server):
    # direct (unscheduled) service still exposes the corpus gauge
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/metrics", timeout=10
    ) as r:
        text = r.read().decode()
    assert "theoremsearch_corpus_rows 300" in text
    assert "theoremsearch_requests_total" not in text


def test_search_endpoint(server):
    code, res = _post(server, "/search", {"query": "subject 7", "top_k": 4})
    assert code == 200
    assert len(res["results"]) == 4
    top = res["results"][0]
    assert "subject 7" in top["theorem_body"]
    assert "display_markdown" in top and "similarity" in top


def test_search_with_filters(server):
    code, res = _post(
        server, "/search",
        {"query": "subject 3", "top_k": 5,
         "filters": {"authors": ["A2"], "citation_weight": 0.1}},
    )
    assert code == 200
    assert res["results"] and all("A2" in r["authors"] for r in res["results"])


def test_bad_requests(server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/search", data=b"{not json",
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            code = r.status
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 400


def test_unknown_path_404(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server, "/nope")
    assert ei.value.code == 404


def test_scheduler_routed_service_and_admission_control():
    """SearchService over a BatchScheduler: results match the direct
    path (incl. citation-weighted rerank), and an overloaded scheduler
    surfaces HTTP 429."""
    import json
    import urllib.request

    import numpy as np

    from theoremsearch_tpu.core import IndexConfig
    from theoremsearch_tpu.eval.oracle import l2_normalize
    from theoremsearch_tpu.index import FlatIndex
    from theoremsearch_tpu.search import CorpusMetadata, SearchEngine
    from theoremsearch_tpu.serve.app import SearchService
    from theoremsearch_tpu.serve.http_api import SearchServer
    from theoremsearch_tpu.serve.scheduler import BatchScheduler, SchedulerOverloaded

    rng = np.random.default_rng(5)
    emb = np.asarray(l2_normalize(rng.standard_normal((512, 32)).astype(np.float32)))
    rows = [
        {"paper_id": f"p{i}", "paper_title": f"T{i}", "authors": [],
         "link": "https://arxiv.org/abs/x", "year": 2020,
         "primary_category": "math.NT", "journal_ref": None,
         "citations": (i * 7) % 50, "theorem_name": "Theorem 1.",
         "theorem_body": "$x$", "slogan": f"slogan {i}"}
        for i in range(512)
    ]
    meta = CorpusMetadata.from_rows(rows)
    idx = FlatIndex.build(emb, config=IndexConfig(pad_multiple=128), normalize=False)
    eng = SearchEngine(idx, meta=meta, use_pallas=False, row_block=128)

    def encode(texts):
        return np.stack([emb[int(t)] for t in texts])

    sched = BatchScheduler(eng, max_batch=8, max_wait_ms=5, encode_fn=encode)
    svc = SearchService(eng, encode, scheduler=sched)
    svc_direct = SearchService(eng, encode)
    from theoremsearch_tpu.search import SearchFilters

    f = SearchFilters(top_k=5, citation_weight=0.3)
    a = svc.search_and_display("17", f)
    b = svc_direct.search_and_display("17", f)
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert a[0]["doc_id"] is not None

    # admission control: fill the queue beyond max_pending
    # long batching window keeps the saturating requests in flight for
    # the duration of the HTTP call (deterministic 429)
    tiny = BatchScheduler(eng, max_batch=8, max_wait_ms=5000, encode_fn=encode,
                          max_pending=2)
    svc_tiny = SearchService(eng, encode, scheduler=tiny)
    srv = SearchServer(svc_tiny).start()
    try:
        for _ in range(4):  # saturate: the last ones raise, queue stays full
            try:
                tiny.submit(emb[0], k=5)
            except SchedulerOverloaded:
                pass
        body = json.dumps({"query": "3", "top_k": 5}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/search", data=body,
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            code = 200
        except urllib.error.HTTPError as e:
            code = e.code
        assert code == 429
        assert tiny.stats()["shed"] >= 1  # 429s are counted

        # /metrics exposes the scheduler counters in Prometheus text format
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/metrics", timeout=10
        ) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        assert "theoremsearch_corpus_rows 512" in text
        assert "theoremsearch_shed_total" in text
        assert "theoremsearch_inflight" in text
    finally:
        srv.stop()
        tiny.shutdown()
        sched.shutdown()


def test_cli_serve_command_end_to_end(tmp_path):
    """`python -m theoremsearch_tpu serve` wiring: catalog -> engine +
    encoder + scheduler -> HTTP server, driven through a real POST."""
    import gzip
    import json
    import urllib.request
    from argparse import Namespace

    from theoremsearch_tpu.cli import make_search_server
    from theoremsearch_tpu.ingest.catalog import Catalog
    from theoremsearch_tpu.ingest.parse_driver import parse_papers
    from theoremsearch_tpu.slogans import OfflineStubClient, generate_slogans, load_prompt

    cat = Catalog(str(tmp_path / "cat.db"))
    sources = {}
    for i in range(6):
        pid = f"2402.{i:05d}"
        cat.upsert_paper({
            "paper_id": pid, "title": f"Paper {i}", "authors": [f"A{i}"],
            "summary": "s", "link": f"https://arxiv.org/abs/{pid}",
            "last_updated": "2024-01-01", "journal_ref": None,
            "primary_category": "math.NT", "categories": ["math.NT"],
            "citations": i,
        })
        tex = (
            "\\documentclass{article}\n"
            "\\newtheorem{theorem}{Theorem}\n"
            "\\begin{document}\n"
            f"\\begin{{theorem}} Result {i} about primes. \\end{{theorem}}\n"
            "\\end{document}\n"
        ).encode()
        sources[pid] = gzip.compress(tex)
    parse_papers(cat, source_fetcher=lambda pid: sources[pid], timeout_s=30)
    generate_slogans(cat, load_prompt("body-only-v1"), OfflineStubClient())
    cat.close()

    args = Namespace(
        catalog=str(tmp_path / "cat.db"), spool=str(tmp_path / "spool"),
        model_dir=None, host="127.0.0.1", port=0, no_batching=False,
        max_batch=16, max_wait_ms=5.0, max_pending=64, warm=True,
    )
    srv, sched = make_search_server(args)
    srv.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/health", timeout=30
        ) as r:
            assert json.loads(r.read())["corpus"] == 6
        body = json.dumps({"query": "primes", "top_k": 3}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/search", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert len(out["results"]) == 3
        assert out["results"][0]["paper_id"].startswith("2402.")
        assert "display_markdown" in out["results"][0]
    finally:
        srv.stop()
        if sched is not None:
            sched.shutdown()


def test_feedback_endpoint(server):
    # the shared fixture's service has NO feedback_path: the endpoint
    # must answer honestly that nothing was persisted
    code, res = _post(server, "/feedback", {
        "feedback": "up", "query": "prime gaps",
        "url": "https://arxiv.org/abs/1", "theorem_name": "Theorem 1",
    })
    assert code == 200 and res["saved"] is False
    code, res = _post(server, "/feedback", {"feedback": "meh"})
    assert code == 400


def test_feedback_persists_with_path(tmp_path, server):
    import json as _json

    from theoremsearch_tpu.serve.http_api import SearchServer

    svc = server.service if hasattr(server, "service") else None
    # build a tiny service WITH a feedback path
    from theoremsearch_tpu.core.config import IndexConfig
    from theoremsearch_tpu.index.flat import FlatIndex
    from theoremsearch_tpu.search.engine import SearchEngine
    from theoremsearch_tpu.serve.app import SearchService

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((32, 16)).astype(np.float32)
    idx = FlatIndex.build(emb, config=IndexConfig(dim=16, pad_multiple=16), normalize=True)
    eng = SearchEngine(idx, use_pallas=False, row_block=16)
    fb = tmp_path / "fb.jsonl"
    svc2 = SearchService(eng, lambda t: emb[: len(t)], feedback_path=str(fb))
    srv2 = SearchServer(svc2).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv2.port}/feedback",
            data=_json.dumps({
                "feedback": "up", "query": "q", "url": "u",
                "theorem_name": "Theorem 1.", "text": "primes are infinite",
            }).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            assert _json.loads(r.read())["saved"] is True
    finally:
        srv2.stop()
    rec = _json.loads(fb.read_text().strip())
    assert rec["text"] == "primes are infinite"
    # and the training-pair reader picks it up
    from theoremsearch_tpu.train.data import pairs_from_feedback

    assert pairs_from_feedback(fb) == [("q", "primes are infinite")]


def test_gc_freeze_permanent():
    """SearchServer.start() freezes the permanent object graph so
    periodic gen-2 GC passes stop scanning it (the r03 serving p99
    tail: one ~300 ms stop-the-world pass per ~10 s at 1M rows —
    experiments/exp_serve_tail.py). Collection must stay ON for
    post-startup garbage, and the helper must be idempotent."""
    import gc

    from theoremsearch_tpu.utils.gc_tuning import freeze_permanent

    before = gc.get_freeze_count()
    marker = [object() for _ in range(64)]  # live -> must get frozen
    out = freeze_permanent()
    try:
        assert out["frozen"] > before
        assert gc.isenabled()
        # post-freeze cycles are still collectible
        a: list = []
        b = [a]
        a.append(b)
        del a, b
        assert gc.collect() >= 2
        # idempotent re-tiering
        out2 = freeze_permanent()
        assert out2["frozen"] >= len(marker)
    finally:
        gc.unfreeze()  # don't leak frozen test state into other tests


def test_compact_maintains_freeze_discipline():
    """After a frozen process compacts, the replacement host arrays get
    re-tiered into the permanent generation (no collection pass — that
    would itself stop the world mid-serving); a never-frozen process is
    left alone (library code must not impose GC policy)."""
    import gc

    import numpy as np

    from theoremsearch_tpu.core import IndexConfig
    from theoremsearch_tpu.index.flat import FlatIndex
    from theoremsearch_tpu.search.engine import SearchEngine
    from theoremsearch_tpu.utils.gc_tuning import freeze_permanent

    def _make():
        rng = np.random.default_rng(0)
        emb = rng.standard_normal((128, 16)).astype(np.float32)
        idx = FlatIndex.build(
            emb, config=IndexConfig(dim=16, pad_multiple=16), normalize=True
        )
        eng = SearchEngine(idx, use_pallas=False, row_block=16)
        eng.add_documents(rng.standard_normal((4, 16)).astype(np.float32))
        return eng

    gc.unfreeze()
    try:
        eng = _make()
        assert eng.compact() == 4
        assert gc.get_freeze_count() == 0  # never opted in -> untouched

        freeze_permanent()
        n0 = gc.get_freeze_count()
        eng2 = _make()  # new engine is young-gen
        assert eng2.compact() == 4
        assert gc.get_freeze_count() > n0  # re-tiered after the swap
    finally:
        gc.unfreeze()


def test_full_serving_stack_over_mesh():
    """VERDICT r4 item 6: BatchScheduler + SearchService + HTTP over an
    8-device CPU-mesh engine with mixed filtered/unfiltered CONCURRENT
    clients — results must equal the single-device service's, and the
    scheduler's stage traces must populate."""
    import threading

    from theoremsearch_tpu.core import MeshConfig, make_mesh
    from theoremsearch_tpu.serve.scheduler import BatchScheduler

    n, d = 1024, 64

    def encode(texts):
        import hashlib

        out = np.zeros((len(texts), d), np.float32)
        for i, t in enumerate(texts):
            for tok in t.lower().split():
                h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:4], "little")
                out[i, h % d] += 1.0
        return np.asarray(l2_normalize(out))

    bodies = [f"statement about subject {i % 40} flavor {i % 7}" for i in range(n)]
    rows = [
        {"paper_id": f"p{i}", "paper_title": f"Title {i}", "authors": [f"A{i % 5}"],
         "link": "https://arxiv.org/abs/x", "year": 2000 + i % 20,
         "primary_category": "math.NT" if i % 2 else "math.AG",
         "journal_ref": None, "citations": i % 60, "theorem_name": "Theorem 1.",
         "theorem_body": bodies[i], "slogan": f"slogan {i}"}
        for i in range(n)
    ]
    emb = encode(bodies)
    idx = FlatIndex.build(
        emb, config=IndexConfig(pad_multiple=256, dtype="int8", int8_scale="global"),
        normalize=True,
    )
    mesh = make_mesh(MeshConfig(data=1, shard=4))

    def build(m, sched_kw=None):
        eng = SearchEngine(
            idx, meta=CorpusMetadata.from_rows(rows), mesh=m, use_pallas=True,
            pallas_interpret=True, row_block=128,
            rescore_vectors=np.asarray(idx.vectors, np.float32) * idx.global_scale,
            rescore_factor=8,
        )
        sched = (
            BatchScheduler(eng, encode_fn=encode, **sched_kw)
            if sched_kw is not None else None
        )
        return SearchService(eng, encode, scheduler=sched), eng, sched

    svc_m, eng_m, sched = build(
        mesh, dict(max_batch=32, max_wait_ms=10, filter_coalesce_ms=40,
                   filter_coalesce_min=8),
    )
    svc_1, _, _ = build(None)
    assert eng_m._sharded_speed_ok
    srv = SearchServer(svc_m).start()
    try:
        payloads = []
        for i in range(18):
            p = {"query": f"statement about subject {i % 40}", "top_k": 5}
            if i % 3 == 0:
                p["filters"] = {"year_range": [2004, 2012]}
            elif i % 3 == 1:
                p["filters"] = {"tags": ["math.AG"]}
            payloads.append(p)
        results: dict[int, dict] = {}
        errors = []

        def client(i):
            try:
                req = urllib.request.Request(
                    f"http://127.0.0.1:{srv.port}/search",
                    data=json.dumps(payloads[i]).encode(),
                    headers={"Content-Type": "application/json"}, method="POST",
                )
                with urllib.request.urlopen(req, timeout=60) as r:
                    results[i] = json.loads(r.read())
            except Exception as e:  # noqa: BLE001
                errors.append((i, e))

        threads = [threading.Thread(target=client, args=(i,)) for i in range(18)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors[:3]
        # every meshed result equals the single-device service's
        for i, got in results.items():
            ref = svc_1.search_and_display(**_payload_to_args(payloads[i]))
            got_ids = [r["doc_id"] for r in got["results"]]
            ref_ids = [r["doc_id"] for r in ref]
            assert got_ids == ref_ids, f"client {i}: {got_ids} vs {ref_ids}"
        st = sched.stats()
        assert st["batches"] >= 1 and "stages_ms" in st
        assert st["stages_ms"]["total_ms"]["max"] > 0
    finally:
        srv.stop()
        sched.shutdown()


def _payload_to_args(p):
    from theoremsearch_tpu.search import SearchFilters

    f = p.get("filters") or {}
    kw = {}
    if "year_range" in f:
        kw["year_range"] = tuple(f["year_range"])
    if "tags" in f:
        kw["tags"] = f["tags"]
    return {"query": p["query"], "filters": SearchFilters(top_k=p["top_k"], **kw)}
