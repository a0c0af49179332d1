"""Live-update tests: upsert -> searchable-now semantics (the reference's
pgvector behavior: a committed theorem_embedding row is visible to the
next streamlit_app.py query). Adds land in the delta buffer, deletes
tombstone via the masked scan, compact() folds into the packed index."""

import numpy as np
import pytest

from theoremsearch_tpu.core import IndexConfig
from theoremsearch_tpu.eval.oracle import l2_normalize
from theoremsearch_tpu.index import FlatIndex
from theoremsearch_tpu.search import CorpusMetadata, SearchEngine, SearchFilters


def _norm(x):
    return np.asarray(l2_normalize(np.asarray(x, np.float32)))


@pytest.fixture()
def small():
    rng = np.random.default_rng(0)
    emb = _norm(rng.standard_normal((600, 64)))
    new = _norm(rng.standard_normal((20, 64)))
    q = _norm(rng.standard_normal((9, 64)))
    return emb, new, q


def _meta_rows(n, start=0, year=2010):
    return [
        {
            "paper_id": f"p{start + i}",
            "paper_title": f"Paper {start + i}",
            "authors": [f"A{(start + i) % 7}"],
            "link": f"https://arxiv.org/abs/{start + i}",
            "year": year,
            "primary_category": "math.AG",
            "journal_ref": None,
            "citations": 3,
            "theorem_name": "Theorem 1.",
            "theorem_body": f"body {start + i}",
            "slogan": f"slogan {start + i}",
        }
        for i in range(n)
    ]


def _fp32_engine(emb, meta=None, **kw):
    idx = FlatIndex.build(
        emb, config=IndexConfig(pad_multiple=128, dtype="float32"), normalize=False
    )
    return SearchEngine(idx, meta=meta, use_pallas=False, row_block=128, **kw)


def _speed_engine(emb, meta=None):
    idx = FlatIndex.build(
        emb,
        config=IndexConfig(pad_multiple=256, dtype="int8", int8_scale="global"),
        normalize=False,
    )
    return SearchEngine(
        idx, meta=meta, use_pallas=True, pallas_interpret=True, row_block=128,
        rescore_vectors=emb, rescore_factor=8,
    )


def _oracle(q, live_vecs, live_ids, k):
    s = q @ live_vecs.T
    order = np.argsort(-s, axis=1)[:, :k]
    return np.take_along_axis(s, order, 1), live_ids[order]


def test_add_documents_searchable_immediately(small):
    emb, new, q = small
    eng = _fp32_engine(emb)
    ids = eng.add_documents(new, normalize=False)
    assert list(ids) == list(range(600, 620))
    # each new doc is its own nearest neighbor
    s, i = eng.search_vectors(new, k=1)
    np.testing.assert_array_equal(i[:, 0], ids)
    assert (s[:, 0] > 0.999).all()
    # merged results match brute force over the combined corpus
    allv = np.concatenate([emb, new])
    all_ids = np.arange(620)
    ref_s, ref_i = _oracle(q, allv, all_ids, 10)
    s, i = eng.search_vectors(q, k=10)
    np.testing.assert_array_equal(i, ref_i)
    np.testing.assert_allclose(s, ref_s, atol=2e-3)  # delta rows are bf16
    assert eng.num_live == 620


def test_delete_main_and_delta(small):
    emb, new, q = small
    eng = _fp32_engine(emb)
    ids = eng.add_documents(new[:5], normalize=False)
    # delete 3 main docs and 2 delta docs
    s0, i0 = eng.search_vectors(q, k=5)
    victims = [int(i0[0, 0]), int(i0[0, 1]), 17, int(ids[0]), int(ids[3])]
    assert eng.delete_documents(victims) == 5
    assert eng.num_live == 600 + 5 - 5
    s, i = eng.search_vectors(q, k=10)
    live = set(range(600)) | {int(x) for x in ids}
    live -= set(victims)
    for row in i:
        for d in row:
            assert int(d) in live
    # exact agreement with the oracle over live rows
    allv = np.concatenate([emb, new[:5]])
    keep = np.array(sorted(live))
    ref_s, ref_i = _oracle(q, allv[keep], keep, 10)
    np.testing.assert_array_equal(i, ref_i)


def test_update_document_replaces_vector(small):
    emb, new, q = small
    eng = _fp32_engine(emb)
    eng.update_document(42, new[0])
    s, i = eng.search_vectors(new[0][None, :], k=1)
    assert int(i[0, 0]) == 42
    assert s[0, 0] > 0.999
    # the old vector no longer matches doc 42
    s2, i2 = eng.search_vectors(emb[42][None, :], k=1)
    assert int(i2[0, 0]) != 42
    assert eng.num_live == 600
    # delete after update removes it
    assert eng.delete_documents([42]) == 1
    s3, i3 = eng.search_vectors(new[0][None, :], k=3)
    assert 42 not in i3[0].tolist()


def test_delta_docs_respect_filters_and_join(small):
    emb, new, q = small
    meta = CorpusMetadata.from_rows(_meta_rows(600, year=2005))
    eng = _fp32_engine(emb, meta=meta)
    ids = eng.add_documents(new[:4], meta_rows=_meta_rows(4, start=600, year=2021), normalize=False)
    # year filter covering only the delta docs
    f = SearchFilters(year_range=(2020, 2022))
    s, i = eng.search_vectors(new[:4], k=2, filters=f)
    np.testing.assert_array_equal(i[:, 0], ids)
    # second slot has only 3 other passing docs -> valid ids
    assert (i >= 600).all()
    # year filter excluding the delta docs
    f2 = SearchFilters(year_range=(2000, 2010))
    s2, i2 = eng.search_vectors(new[:4], k=2, filters=f2)
    assert (i2 < 600).all()
    # metadata join works for delta docs (search() path)
    rows = eng.search(new[0], SearchFilters(top_k=3))
    assert rows[0]["doc_id"] == int(ids[0])
    assert rows[0]["paper_title"] == "Paper 600"
    assert rows[0]["theorem_slogan"] == "slogan 600"


def test_add_requires_meta_rows_when_meta(small):
    emb, new, _ = small
    meta = CorpusMetadata.from_rows(_meta_rows(600))
    eng = _fp32_engine(emb, meta=meta)
    with pytest.raises(ValueError, match="meta_rows"):
        eng.add_documents(new[:2])


def test_speed_path_live_updates(small):
    """The production path (global int8 + device rescore, pallas interpret)
    merges delta adds and honors tombstones."""
    emb, new, q = small
    eng = _speed_engine(emb)
    assert eng._speed_ok
    ids = eng.add_documents(new, normalize=False)
    s, i = eng.search_vectors(new[:8], k=1)
    np.testing.assert_array_equal(i[:, 0], ids[:8])
    # tombstone the top main hit of q[0]; it must vanish
    s0, i0 = eng.search_vectors(q[:1], k=1)
    victim = int(i0[0, 0])
    eng.delete_documents([victim])
    s1, i1 = eng.search_vectors(q[:1], k=10)
    assert victim not in i1[0].tolist()
    # still agrees with the live oracle at high recall
    allv = np.concatenate([emb, new])
    keep = np.array([d for d in range(620) if d != victim])
    ref_s, ref_i = _oracle(q, allv[keep], keep, 10)
    s2, i2 = eng.search_vectors(q, k=10)
    hit = (i2[:, :, None] == ref_i[:, None, :]).any(2).mean()
    assert hit >= 0.98


def test_compact_folds_delta(small):
    emb, new, q = small
    eng = _speed_engine(emb)
    ids = eng.add_documents(new, normalize=False)
    eng.delete_documents([7, int(ids[2])])
    s_before, i_before = eng.search_vectors(q, k=10)
    folded = eng.compact()
    assert folded == 19  # 20 added, 1 delta row deleted
    assert eng._delta is None or eng._delta.n == 0
    assert eng._speed_ok  # arange ids preserved
    # the deleted delta doc folds as a tombstoned gap row (ids stay dense)
    assert eng.n_valid == 620
    s_after, i_after = eng.search_vectors(q, k=10)
    np.testing.assert_array_equal(i_before, i_after)
    np.testing.assert_allclose(s_before, s_after, atol=2e-3)
    # main tombstone survives compaction
    assert 7 not in i_after.flatten().tolist()
    assert eng.num_live == 600 + 20 - 2
    # engine stays mutable after compaction
    ids2 = eng.add_documents(new[:2], normalize=False)
    s, i = eng.search_vectors(new[:2], k=1)
    np.testing.assert_array_equal(i[:, 0], ids2)


def test_update_then_compact_keeps_arange(small):
    """Updated docs fold back into their original row: no duplicate ids,
    speed path stays active."""
    emb, new, q = small
    eng = _speed_engine(emb)
    eng.update_document(100, new[0])
    eng.add_documents(new[1:3], normalize=False)
    assert eng.compact() == 3
    assert eng._speed_ok
    assert eng.n_valid == 602           # update did NOT append
    ids_h = np.asarray(eng.index.ids[:602])
    np.testing.assert_array_equal(ids_h, np.arange(602))
    # updated vector lives at doc 100
    s, i = eng.search_vectors(new[0][None, :], k=1)
    assert int(i[0, 0]) == 100
    # doc 100 is NOT tombstoned after folding
    assert eng.num_live == 602


def test_compact_residual_mode(small):
    emb, new, q = small
    idx = FlatIndex.build(
        emb,
        config=IndexConfig(
            pad_multiple=256, dtype="int8", int8_scale="global", residual=True
        ),
        normalize=False,
    )
    eng = SearchEngine(
        idx, use_pallas=True, pallas_interpret=True, row_block=128, rescore_factor=8
    )
    assert eng.rescore_residual is not None
    ids = eng.add_documents(new[:6], normalize=False)
    s, i = eng.search_vectors(new[:6], k=1)
    np.testing.assert_array_equal(i[:, 0], ids)
    assert eng.compact() == 6
    assert eng.rescore_residual[0].shape[0] == 606
    s2, i2 = eng.search_vectors(new[:6], k=1)
    np.testing.assert_array_equal(i2[:, 0], ids)


def test_all_main_deleted_serves_from_delta():
    rng = np.random.default_rng(3)
    emb = _norm(rng.standard_normal((64, 32)))
    new = _norm(rng.standard_normal((3, 32)))
    eng = _fp32_engine(emb)
    ids = eng.add_documents(new, normalize=False)
    eng.delete_documents(list(range(64)))
    s, i = eng.search_vectors(new, k=5)
    assert set(i[:, 0].tolist()) == {int(x) for x in ids}
    # only 3 live docs: slots beyond are PAD
    assert (i[:, 3:] == -1).all()


def test_delta_capacity_growth():
    rng = np.random.default_rng(4)
    emb = _norm(rng.standard_normal((128, 16)))
    eng = _fp32_engine(emb)
    a = _norm(rng.standard_normal((900, 16)))
    b = _norm(rng.standard_normal((300, 16)))
    eng.add_documents(a, normalize=False)     # within _MIN_CAP
    eng.add_documents(b, normalize=False)     # crosses the 1024 boundary
    assert eng._delta.cap == 2048
    assert eng.num_live == 128 + 1200
    qs = np.concatenate([a[895:], b[:3]])
    s, i = eng.search_vectors(qs, k=1)
    np.testing.assert_array_equal(
        i[:, 0], np.array([1023, 1024, 1025, 1026, 1027, 128 + 900, 128 + 901, 128 + 902])
    )


def test_service_and_http_live_updates(small):
    emb, _, _ = small
    import json
    import urllib.request

    from theoremsearch_tpu.serve.app import SearchService
    from theoremsearch_tpu.serve.http_api import SearchServer

    meta = CorpusMetadata.from_rows(_meta_rows(600))
    eng = _fp32_engine(emb, meta=meta)

    def encode(texts):
        rng = np.random.default_rng(abs(hash(tuple(texts))) % 2**31)
        return _norm(rng.standard_normal((len(texts), 64)))

    svc = SearchService(eng, encode)
    n0 = svc.load_theorem_count()
    server = SearchServer(svc).start()
    try:
        url = f"http://127.0.0.1:{server.port}"
        body = json.dumps(
            {"documents": _meta_rows(2, start=600, year=2024)}
        ).encode()
        r = urllib.request.urlopen(
            urllib.request.Request(url + "/documents", data=body,
                                   headers={"Content-Type": "application/json"})
        )
        out = json.loads(r.read())
        assert out["doc_ids"] == [600, 601]
        # count reflects the upsert
        health = json.loads(urllib.request.urlopen(url + "/health").read())
        assert health["corpus"] == n0 + 2
        # the new docs join/search (slogan text is what got encoded)
        res = json.loads(urllib.request.urlopen(
            urllib.request.Request(
                url + "/search",
                data=json.dumps({"query": "slogan 600", "top_k": 3}).encode(),
                headers={"Content-Type": "application/json"},
            )
        ).read())
        assert len(res["results"]) == 3
        # delete one over HTTP
        rd = json.loads(urllib.request.urlopen(
            urllib.request.Request(
                url + "/documents/delete",
                data=json.dumps({"doc_ids": [600]}).encode(),
                headers={"Content-Type": "application/json"},
            )
        ).read())
        assert rd["deleted"] == 1
        health = json.loads(urllib.request.urlopen(url + "/health").read())
        assert health["corpus"] == n0 + 1
    finally:
        server.stop()


def test_vector_only_custom_meta_none(small):
    """Vector-only serving (meta=None): ids are assigned sequentially from
    max(existing)+1 and joins return bare dicts."""
    emb, new, _ = small
    eng = _fp32_engine(emb)
    ids1 = eng.add_documents(new[:2], normalize=False)
    ids2 = eng.add_documents(new[2:4], normalize=False)
    assert list(ids1) == [600, 601] and list(ids2) == [602, 603]
    rows = eng._join(np.array([602]), np.array([0.5]))
    assert rows[0]["doc_id"] == 602


def test_scheduler_concurrent_with_mutations(small):
    """Queries batched through the scheduler while another thread adds and
    deletes docs: every response is internally consistent (no crashes, no
    tombstoned ids returned after the delete completes, added docs
    findable afterwards)."""
    import threading

    from theoremsearch_tpu.serve.scheduler import BatchScheduler

    emb, new, q = small
    eng = _fp32_engine(emb)
    sched = BatchScheduler(eng, max_batch=32, max_wait_ms=5)
    stop = threading.Event()
    errors = []

    def mutate():
        try:
            for r in range(6):
                eng.add_documents(new[3 * r : 3 * r + 3], normalize=False)
                eng.delete_documents([r * 40, r * 40 + 1])
        except Exception as e:  # noqa: BLE001
            errors.append(e)
        finally:
            stop.set()

    def query(i):
        try:
            while not stop.is_set():
                s, ids = sched.search(q[i % len(q)], k=5)
                assert ids.shape == (5,)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    mt = threading.Thread(target=mutate)
    qs = [threading.Thread(target=query, args=(i,)) for i in range(4)]
    for t in qs:
        t.start()
    mt.start()
    mt.join()
    for t in qs:
        t.join()
    sched.shutdown()
    assert not errors, errors
    # steady state: all 18 added docs live, 12 deleted gone
    assert eng.num_live == 600 + 18 - 12
    s, i = eng.search_vectors(new[:18], k=1)
    assert (i[:, 0] >= 600).all()
    s2, i2 = eng.search_vectors(q, k=10)
    dead = {r * 40 for r in range(6)} | {r * 40 + 1 for r in range(6)}
    assert not (set(int(x) for x in i2.flatten()) & dead)


def test_compact_after_deleting_lowest_new_id(small):
    """Deleting the LOWEST new id before compacting must not shift the
    dense fold's base: the base anchors at the lowest id ever assigned to
    the delta (dead rows included), so surviving docs keep ids == row and
    the dead id folds as a tombstoned gap row."""
    emb, new, q = small
    eng = _speed_engine(emb)
    ids = eng.add_documents(new[:5], normalize=False)   # 600..604
    eng.delete_documents([int(ids[0])])                 # kill 600
    s_before, i_before = eng.search_vectors(q, k=10)
    assert eng.compact() == 4
    assert eng._speed_ok                                # arange preserved
    assert eng.n_valid == 605 and eng.num_live == 604
    np.testing.assert_array_equal(
        np.asarray(eng.index.ids[:605]), np.arange(605)
    )
    s_after, i_after = eng.search_vectors(q, k=10)
    np.testing.assert_array_equal(i_before, i_after)
    # survivors sit at their original ids; 600 stays dead
    s, i = eng.search_vectors(new[:5], k=1)
    np.testing.assert_array_equal(i[1:5, 0], ids[1:5])
    assert int(i[0, 0]) != 600


def test_compact_all_delta_deleted_folds_gap(small):
    """Every delta row deleted before compact(): the assigned-but-dead
    ids must still fold in as tombstoned gap rows. Discarding them (the
    old early-return shortcut) made the NEXT compact anchor its dense
    id range past the gap, producing non-arange ids — breaking the
    speed path, filter row==id alignment, and future live adds."""
    emb, new, q = small
    eng = _speed_engine(emb)
    ids = eng.add_documents(new[:3], normalize=False)
    eng.delete_documents([int(x) for x in ids] + [5])
    s_before, i_before = eng.search_vectors(q, k=10)
    assert eng.compact() == 0                 # zero LIVE rows folded...
    assert eng._delta is None
    assert eng.n_valid == 603                 # ...but dead ids fold as gaps
    assert eng._main_ids_arange
    s_after, i_after = eng.search_vectors(q, k=10)
    np.testing.assert_array_equal(i_before, i_after)
    assert eng.num_live == 599 and 5 not in i_after.flatten().tolist()
    # id minting is monotonic: the dead ids are never reused
    ids2 = eng.add_documents(new[3:5], normalize=False)
    assert list(ids2) == [603, 604]
    s2, i2 = eng.search_vectors(new[3:5], k=1)
    np.testing.assert_array_equal(i2[:, 0], ids2)
    # REGRESSION (r3 self-review): a SECOND compact after new adds must
    # keep ids == arange and the engine fully functional
    assert eng.compact() == 2
    assert eng._main_ids_arange and eng.n_valid == 605
    s3, i3 = eng.search_vectors(new[3:5], k=1)
    np.testing.assert_array_equal(i3[:, 0], ids2)
    ids3 = eng.add_documents(new[5:6], normalize=False)
    assert list(ids3) == [605]
    _, i4 = eng.search_vectors(new[5:6], k=1)
    assert int(i4[0, 0]) == 605


def test_compact_concurrent_with_queries(small):
    """compact() rebuilds the engine IN PLACE; a query dispatched
    concurrently must never observe half-swapped state (old-shape mask
    vs new programs -> XLA shape errors / wrong merges). The dispatch
    path holds the live-update RLock end-to-end, so this loop is a
    race detector: any interleaving bug surfaces as an exception."""
    import threading

    emb, new, q = small
    eng = _fp32_engine(emb)
    errs: list[Exception] = []
    stop = threading.Event()

    def hammer():
        while not stop.is_set():
            try:
                s, i = eng.search_vectors(q, k=5)
                assert i.shape == (9, 5) and (i >= 0).all()
            except Exception as e:  # noqa: BLE001
                errs.append(e)
                return

    t = threading.Thread(target=hammer)
    t.start()
    try:
        for j in range(4):
            eng.add_documents(new[5 * j : 5 * j + 5], normalize=False)
            assert eng.compact() == 5
    finally:
        stop.set()
        t.join(timeout=30)
    assert not errs, errs
    assert eng.n_valid == 620 and eng._main_ids_arange


def test_compact_update_then_delete_is_noop(small):
    """A delta holding only updates of main rows that then got deleted
    has no new ids and nothing to fold: compact() skips the expensive
    rebuild (re-upload + scan recompile) and tombstones stay correct."""
    emb, new, q = small
    eng = _speed_engine(emb)
    eng.update_document(5, new[0])
    eng.delete_documents([5])
    vecs_before = eng.vectors
    assert eng.compact() == 0
    assert eng._delta is None
    assert eng.n_valid == 600 and eng.vectors is vecs_before
    assert eng.num_live == 599
    _, i = eng.search_vectors(q, k=10)
    assert 5 not in i.flatten().tolist()


def test_add_with_meta_requires_arange_ids(small):
    """Metadata serving indexes columns by doc id; live adds against a
    custom-id corpus would mint colliding ids from len(meta) — rejected."""
    emb, new, _ = small
    idx = FlatIndex.build(
        emb,
        ids=np.arange(1000, 1600, dtype=np.int64),
        config=IndexConfig(pad_multiple=128, dtype="float32"),
        normalize=False,
    )
    meta = CorpusMetadata.from_rows(_meta_rows(600))
    eng = SearchEngine(idx, meta=meta, use_pallas=False, row_block=128)
    with pytest.raises(ValueError, match="row-order doc ids"):
        eng.add_documents(new[:2], meta_rows=_meta_rows(2, 600), normalize=False)


def test_compact_custom_ids(small):
    """Custom-id corpora: new ids continue from max+1; compaction's dense
    fold must anchor at the delta's base id, not at num_rows."""
    emb, new, _ = small
    idx = FlatIndex.build(
        emb,
        ids=np.arange(1000, 1600, dtype=np.int64),
        config=IndexConfig(pad_multiple=128, dtype="float32"),
        normalize=False,
    )
    eng = SearchEngine(idx, use_pallas=False, row_block=128)
    ids = eng.add_documents(new[:4], normalize=False)
    assert list(ids) == [1600, 1601, 1602, 1603]
    eng.delete_documents([1601])
    assert eng.compact() == 3
    # dense fold: rows for 1600..1603, gap at 1601 tombstoned
    assert eng.n_valid == 604
    assert eng.num_live == 603
    s, i = eng.search_vectors(new[:4], k=1)
    assert i[0, 0] == 1600 and i[2, 0] == 1602 and i[3, 0] == 1603
    assert i[1, 0] != 1601
    # delete by custom id still works post-compact
    assert eng.delete_documents([1000]) == 1


def test_tombstone_overfetch_stays_on_fast_path(small):
    """Deletes must not push unfiltered queries onto the ~2.3x-slower
    masked scan: the engine over-fetches k+margin on the fast unfiltered
    path and drops dead ids on host — exact vs the oracle, and the
    tombstone mask cache (masked-path machinery) is never populated."""
    emb, new, q = small
    eng = _fp32_engine(emb)
    rng = np.random.default_rng(1)
    victims = rng.choice(600, size=30, replace=False).tolist()
    assert eng.delete_documents(victims) == 30
    s, i = eng.search_vectors(q, k=10)
    keep = np.array(sorted(set(range(600)) - set(victims)))
    ref_s, ref_i = _oracle(q, emb[keep], keep, 10)
    np.testing.assert_array_equal(i, ref_i)
    np.testing.assert_allclose(s, ref_s, atol=2e-3)
    assert eng._tomb_mask_cache == {}
    # a FILTERED query still routes through the combined mask (the
    # over-fetch drop does not compose with user filters)
    meta = CorpusMetadata.from_rows(_meta_rows(600))
    eng2 = _fp32_engine(emb, meta=meta)
    eng2.delete_documents(victims)
    flt = SearchFilters(top_k=5, year_range=(2005, 2020))
    s2, i2 = eng2.search_vectors(q, k=5, filters=flt)
    assert eng2._tomb_mask_cache  # masked path used
    for row in i2:
        for d in row:
            assert int(d) not in victims


def test_tombstone_overfetch_fallback_exact():
    """Adversarial deletes: when >margin of a query's best k+margin docs
    are ALL deleted, the over-fetch window is exhausted and the engine
    must detect it and fall back to the exact masked scan."""
    rng = np.random.default_rng(7)
    d = 32
    q0 = _norm(rng.standard_normal((1, d)))
    near = _norm(q0 + 0.001 * rng.standard_normal((70, d)))   # best 70
    mid = _norm(q0 + 0.9 * rng.standard_normal((40, d)))
    far = _norm(rng.standard_normal((400, d)))
    emb = np.concatenate([near, mid, far])
    eng = _fp32_engine(emb)
    assert eng.delete_documents(list(range(70))) == 70   # > margin of 64
    s, i = eng.search_vectors(q0, k=5)
    keep = np.arange(70, emb.shape[0])
    ref_s, ref_i = _oracle(q0, emb[keep], keep, 5)
    np.testing.assert_array_equal(i, ref_i)
    assert eng._tomb_mask_cache  # proof the masked fallback ran
    # non-adversarial query against the same engine stays on the fast
    # path and is still exact
    q1 = _norm(rng.standard_normal((4, d)))
    s1, i1 = eng.search_vectors(q1, k=5)
    ref_s1, ref_i1 = _oracle(q1, emb[keep], keep, 5)
    np.testing.assert_array_equal(i1, ref_i1)


def test_broad_filter_overfetch_matches_masked_path(small):
    """A filter passing >=50% of rows rides the fast unfiltered path
    (k+margin over-fetch + host mask drop) instead of compiling the
    masked-scan program — and returns exactly what the masked path
    returns."""
    emb, new, q = small
    # years 2000..2009 cyclically over 600 docs -> (2000, 2007) passes 80%
    rows = _meta_rows(600)
    for i, r in enumerate(rows):
        r["year"] = 2000 + (i % 10)
    meta = CorpusMetadata.from_rows(rows)
    eng = _fp32_engine(emb, meta=meta)
    broad = SearchFilters(top_k=10, year_range=(2000, 2007))
    s, i = eng.search_vectors(q, k=10, filters=broad)
    masked_keys = [kk for kk in eng._search_fn_cache if kk[1] in ("mask", True)]
    assert not masked_keys, "broad filter should not build a masked program"
    # exact agreement with the forced masked path
    s_ref, i_ref = eng.search_vectors_async(
        q, 10, broad, _force_masked=True
    )()
    np.testing.assert_array_equal(i, i_ref)
    np.testing.assert_allclose(s, s_ref, atol=2e-3)
    # all results actually pass the filter
    years = np.array([r["year"] for r in rows])
    assert ((years[i] >= 2000) & (years[i] <= 2007)).all()
    # a NARROW filter (20% pass) still routes through the masked scan
    narrow = SearchFilters(top_k=10, year_range=(2008, 2009))
    s2, i2 = eng.search_vectors(q, k=10, filters=narrow)
    assert any(kk[1] in ("mask", True) for kk in eng._search_fn_cache)
    assert ((years[i2] >= 2008) & (years[i2] <= 2009)).all()


def test_broad_filter_overfetch_with_tombstones_and_delta(small):
    """Broad filter + deletes + live adds compose: the combined mask
    (filter AND alive) drives the host drop; delta rows get their own
    filter bias."""
    emb, new, q = small
    rows = _meta_rows(600)
    for i, r in enumerate(rows):
        r["year"] = 2000 + (i % 10)
    meta = CorpusMetadata.from_rows(rows)
    eng = _fp32_engine(emb, meta=meta)
    ids = eng.add_documents(new[:4], meta_rows=_meta_rows(4, start=600, year=2003),
                            normalize=False)
    victims = list(range(0, 60))
    eng.delete_documents(victims)
    broad = SearchFilters(top_k=10, year_range=(2000, 2007))
    s, i = eng.search_vectors(q, k=10, filters=broad)
    years = np.array([r["year"] for r in rows] + [2003] * 4)
    flat = i.flatten()
    flat = flat[flat >= 0]
    assert not (set(flat.tolist()) & set(victims))
    assert ((years[flat] >= 2000) & (years[flat] <= 2007)).all()
    # oracle over live+passing docs (main + the 4 delta docs)
    allv = np.concatenate([emb, new[:4]])
    passing = np.array(
        [d for d in range(604)
         if d not in set(victims) and 2000 <= years[d] <= 2007]
    )
    ref_s, ref_i = _oracle(q, allv[passing], passing, 10)
    np.testing.assert_array_equal(i, ref_i)


def test_full_search_citation_rerank_with_deletes_and_broad_filter(small):
    """The complete serving path — pool retrieval (k=max(50,10k)),
    citation-weighted rerank, metadata join — composes with live deletes
    and a broad filter riding the over-fetch path: no deleted or
    non-passing doc reaches the ranked results."""
    emb, new, q = small
    rows = _meta_rows(600)
    for i, r in enumerate(rows):
        r["year"] = 2000 + (i % 10)
        r["citations"] = (i * 7) % 500
    meta = CorpusMetadata.from_rows(rows)
    eng = _fp32_engine(emb, meta=meta)
    victims = list(range(100, 160))
    eng.delete_documents(victims)
    flt = SearchFilters(top_k=10, year_range=(2000, 2007), citation_weight=0.3)
    assert eng.search_pool_k(flt) == 100  # rerank pool max(50, 10*k)
    res = eng.search(q[0], filters=flt)
    assert len(res) == 10
    years = np.array([r["year"] for r in rows])
    for r in res:
        d = r["doc_id"]
        assert d not in victims
        assert 2000 <= years[d] <= 2007
        assert "paper_title" in r and "similarity" in r
    # reranked order: sim + w*ln(1+citations) descending
    key = [r["similarity"] + 0.3 * np.log1p(rows[r["doc_id"]]["citations"])
           for r in res]
    assert all(key[i] >= key[i + 1] - 1e-6 for i in range(len(key) - 1))


def test_add_1d_vector_without_normalize(small):
    """A single (D,) vector with normalize=False must become ONE doc —
    regression: the unvalidated branch minted D ids and broadcast the
    vector into D garbage documents."""
    emb, new, _ = small
    eng = _fp32_engine(emb)
    ids = eng.add_documents(new[0], normalize=False)   # 1-D input
    assert list(ids) == [600]
    assert eng.num_live == 601
    _, i = eng.search_vectors(new[0], k=1)
    assert int(i[0, 0]) == 600


def test_update_with_meta_requires_arange_before_mutation(small):
    """update_document on a custom-id corpus with metadata must raise
    BEFORE tombstoning (non-atomic update would permanently lose the
    doc: delete lands, meta step raises)."""
    emb, new, _ = small
    idx = FlatIndex.build(
        emb, ids=np.arange(1000, 1600, dtype=np.int64),
        config=IndexConfig(pad_multiple=128, dtype="float32"), normalize=False,
    )
    meta = CorpusMetadata.from_rows(
        [{"paper_id": f"p{i}", "paper_title": "T", "authors": [], "link": "",
          "year": 2020, "primary_category": "math.NT", "journal_ref": None,
          "citations": 0} for i in range(600)]
    )
    eng = SearchEngine(idx, meta=meta, use_pallas=False, row_block=128)
    with pytest.raises(ValueError, match="row-order"):
        eng.update_document(1005, new[0])
    assert eng.num_live == 600                     # nothing was tombstoned
    _, i = eng.search_vectors(emb[5], k=1)
    assert int(i[0, 0]) == 1005                    # doc still live


def test_filtered_search_requires_arange_ids(small):
    """Filter masks index rows by doc id (id == row == meta position);
    on a custom-id corpus that lookup is silently wrong — must raise."""
    emb, _, q = small
    idx = FlatIndex.build(
        emb, ids=np.arange(1000, 1600, dtype=np.int64),
        config=IndexConfig(pad_multiple=128, dtype="float32"), normalize=False,
    )
    meta = CorpusMetadata.from_rows(
        [{"paper_id": f"p{i}", "paper_title": "T", "authors": [], "link": "",
          "year": 2020, "primary_category": "math.NT", "journal_ref": None,
          "citations": 0} for i in range(600)]
    )
    eng = SearchEngine(idx, meta=meta, use_pallas=False, row_block=128)
    with pytest.raises(ValueError, match="row-order"):
        eng.search_vectors(q, k=5, filters=SearchFilters(tags=["math.NT"]))
    # unfiltered stays fine on custom ids
    s, i = eng.search_vectors(q, k=5)
    assert (i >= 1000).all()


def test_heavily_deleted_corpus_stays_exact(small):
    """With most of the corpus tombstoned (live fraction below the
    over-fetch threshold), queries route to the masked scan and stay
    exact — no over-fetch re-run storm, no dead ids returned."""
    emb, _, q = small
    eng = _fp32_engine(emb)
    dead = list(range(0, 540))                     # 90% deleted
    assert eng.delete_documents(dead) == 540
    s, i = eng.search_vectors(q, k=10)
    live_ids = set(range(540, 600))
    flat = [int(x) for x in i.flatten() if x >= 0]
    assert flat and set(flat) <= live_ids
    live_vecs, live_arr = emb[540:], np.arange(540, 600)
    ref_s, ref_i = _oracle(np.asarray(q), live_vecs, live_arr, 10)
    np.testing.assert_array_equal(i, ref_i)


def test_overfetch_margin_adapts_to_drop_rate(small):
    """The over-fetch margin sizes to the corpus's drop probability
    (6-sigma against exhausting the window): light deletes get the
    smallest ladder entry — whose program scans nearly the plain scan's
    candidate width (the window plus the plain path's rank-noise tail)
    — and a 50%-failing broad filter needs the largest."""
    emb, _, q = small
    eng = _speed_engine(emb)
    assert eng._overfetch_margin(10, 0.001) == 8
    assert eng._overfetch_margin(10, 0.1) == 16
    assert eng._overfetch_margin(10, 0.5) == 64
    # 3 deletes of 600 -> margin 8: the dispatched program is keyed
    # (k+8, unfiltered, base_k=k), so its int8-scan candidate width is
    # k_q + (rescore_factor-1)*k (window + the plain path's rank-noise
    # tail), not rescore_factor*(k+8)
    assert eng.delete_documents([5, 6, 7]) == 3
    s, i = eng.search_vectors(q, k=10)
    assert (18, False, 10) in eng._search_fn_cache
    keep = np.array(sorted(set(range(600)) - {5, 6, 7}))
    ref_s, ref_i = _oracle(q, emb[keep], keep, 10)
    np.testing.assert_array_equal(i, ref_i)


def test_compact_nonblocking_concurrent_latency(small):
    """compact() must not stop the world (VERDICT r3 item 1): with the
    build phase artificially stretched via the pre-swap test seam,
    concurrent queries keep completing in bounded time — the swap
    itself is the only serialized window."""
    import threading
    import time

    emb, new, q = small
    eng = _fp32_engine(emb)
    eng.search_vectors(q, k=5)  # warm the steady-state program
    eng._compact_pre_swap_hook = lambda: time.sleep(1.5)
    lat: list[float] = []
    errs: list[Exception] = []
    stop = threading.Event()

    def hammer():
        while not stop.is_set():
            t0 = time.monotonic()
            try:
                s, i = eng.search_vectors(q, k=5)
                assert i.shape == (9, 5)
            except Exception as e:  # noqa: BLE001
                errs.append(e)
                return
            lat.append(time.monotonic() - t0)

    t = threading.Thread(target=hammer)
    t.start()
    try:
        eng.add_documents(new[:10], normalize=False)
        t0 = time.monotonic()
        assert eng.compact() == 10
        compact_s = time.monotonic() - t0
    finally:
        stop.set()
        t.join(timeout=30)
    assert not errs, errs
    assert compact_s >= 1.5, "hook must have stretched the build"
    assert len(lat) >= 5, "queries must keep flowing during compact"
    assert max(lat) < 0.75 * compact_s, (
        f"a query stalled {max(lat):.2f}s during a {compact_s:.2f}s compact"
    )


def test_compact_mid_build_mutations(small):
    """Adds/deletes/updates arriving DURING the build phase reconcile at
    swap: new adds stay searchable from the delta, a deleted folded doc
    re-tombstones its new row, an updated folded doc serves the newest
    vector."""
    emb, new, q = small
    eng = _fp32_engine(emb)
    ids0 = eng.add_documents(new[:4], normalize=False)          # folded
    mid_state = {}

    def mid_build():
        # runs after the fold is built, before the swap
        mid_state["added"] = eng.add_documents(new[4:8], normalize=False)
        assert eng.delete_documents([ids0[0]]) == 1              # kill folded
        eng.update_document(int(ids0[1]), new[8])                # re-update folded
        assert eng.delete_documents([17]) == 1                   # kill a main row

    eng._compact_pre_swap_hook = mid_build
    assert eng.compact() == 4
    eng._compact_pre_swap_hook = None
    assert eng.n_valid == 604
    # mid-build adds: still in the delta, searchable, correct ids
    s, i = eng.search_vectors(new[4:8], k=1)
    assert i[:, 0].tolist() == [int(x) for x in mid_state["added"]]
    # mid-build delete of a folded doc
    s, i = eng.search_vectors(new[:1], k=3)
    assert int(ids0[0]) not in i.ravel().tolist()
    # mid-build update of a folded doc: newest vector wins, id preserved
    s, i = eng.search_vectors(new[8:9], k=1)
    assert int(i[0, 0]) == int(ids0[1])
    # mid-build main-row delete
    s, i = eng.search_vectors(emb[17:18], k=3)
    assert 17 not in i.ravel().tolist()
    # a second compact folds the leftovers cleanly
    assert eng.compact() == 5   # 4 mid-build adds + 1 re-update
    s, i = eng.search_vectors(new[8:9], k=1)
    assert int(i[0, 0]) == int(ids0[1])
    s, i = eng.search_vectors(new[4:8], k=1)
    assert i[:, 0].tolist() == [int(x) for x in mid_state["added"]]


def test_engine_ivf_route_survives_compact(small):
    """compact() keeps the IVF route live by assigning folded rows to
    their nearest existing centroids (VERDICT r3 item 5) — recall vs the
    flat oracle holds and the folded docs are findable via IVF."""
    from theoremsearch_tpu.index.ivf import IVFIndex

    emb, new, q = small
    n = emb.shape[0]
    ivf = IVFIndex.build(
        emb,
        config=IndexConfig(ivf_nlist=16, dtype="int8", ivf_assign2_margin=0.02),
        slab_rows=128,
        normalize=False,
    )
    idx = FlatIndex.build(
        emb, config=IndexConfig(pad_multiple=128, dtype="float32"), normalize=False
    )
    eng = SearchEngine(
        idx, use_pallas=True, pallas_interpret=True, row_block=128,
        ivf_index=ivf, ivf_nprobe=8, rescore_factor=8,
    )
    ids = eng.add_documents(new, normalize=False)
    assert eng.compact() == len(ids)
    assert eng.ivf is not None, "IVF route must survive compact()"
    assert eng.ivf.num_rows == n + len(ids)
    # unfiltered small batch routes through IVF; folded docs findable
    s, i = eng.search_vectors(new[:8], k=1)
    assert i[:, 0].tolist() == [int(x) for x in ids[:8]]
    # recall vs the exact oracle on the grown corpus
    all_emb = np.concatenate([emb, new])
    s, i = eng.search_vectors(q, k=10)
    from theoremsearch_tpu.eval.metrics import recall_vs_exact
    from theoremsearch_tpu.eval.oracle import exact_topk

    _, ref = exact_topk(q, all_emb, k=10)
    assert recall_vs_exact(i, np.asarray(ref), k=10) >= 0.9
    # update moves a doc between lists on the next compact
    eng.update_document(int(ids[0]), new[10])
    assert eng.compact() == 1
    s, i = eng.search_vectors(new[10:11], k=2)
    assert int(ids[0]) in i.ravel().tolist()


def test_compact_reclaim_drops_tombstones(small):
    """compact(reclaim=True): tombstoned rows are dropped, doc ids
    renumber dense, metadata moves with them, and last_id_map records
    the permutation (VERDICT r3 item 6)."""
    emb, new, q = small
    meta = CorpusMetadata.from_rows(_meta_rows(600))
    eng = _speed_engine(emb, meta)
    victims = list(range(0, 600, 10))          # 60 of 600
    assert eng.delete_documents(victims) == 60
    ids = eng.add_documents(new[:5], meta_rows=_meta_rows(5, start=600),
                            normalize=False)
    n_live = eng.num_live
    assert eng.compact(reclaim=True) == 5
    assert eng.n_valid == 545 and eng.num_live == n_live == 545
    assert eng._tombstone is None
    assert eng._main_ids_arange and len(eng.meta) == 545
    mp = eng.last_id_map
    assert mp is not None and (mp[victims] == -1).all()
    # a surviving doc: new id = map[old], metadata travels with it
    old = 11
    new_id = int(mp[old])
    assert eng.meta.paper_id[new_id] == f"p{old}"
    s, i = eng.search_vectors(emb[old : old + 1], k=1)
    assert int(i[0, 0]) == new_id
    # the folded live adds kept their (renumbered) identity
    s, i = eng.search_vectors(new[:5], k=1)
    assert i[:, 0].tolist() == [int(mp[x]) for x in ids]
    # reclaimed corpus serves the speed path (ids == arange held)
    assert eng._speed_ok
    # no victim ever returns
    s, i = eng.search_vectors(q, k=10)
    assert (i >= 0).all()


def test_compact_reclaim_translates_inflight_ids(small):
    """A query dispatched before compact(reclaim=True) finalizes after
    the renumbering: its ids arrive translated to the NEW numbering."""
    emb, new, q = small
    eng = _fp32_engine(emb)
    assert eng.delete_documents(list(range(0, 100))) == 100
    fin = eng.search_vectors_async(q, k=5)       # dispatched at gen 0
    assert eng.compact(reclaim=True) == 0
    assert eng.n_valid == 500
    s_old, i_old = fin()                          # finalized at gen 1
    s_new, i_new = eng.search_vectors(q, k=5)
    np.testing.assert_array_equal(i_old, i_new)
    np.testing.assert_allclose(s_old, s_new, atol=1e-3)


def test_compact_device_fold_bitexact(small):
    """compact() rebuilds the device arrays device-side from the OLD
    device copies plus delta-row uploads (round 4: only ~delta-sized
    data crosses the host<->device link). The folded device state must
    be BIT-IDENTICAL to what a fresh host upload of the folded index
    would produce — including pad rows (zeros) and in-place updates."""
    emb, new, q = small
    eng = _speed_engine(emb)
    ids = eng.add_documents(new, normalize=False)
    eng.update_document(5, new[0])          # in-place scatter path
    eng.delete_documents([7, int(ids[2])])  # gap + tombstone
    eng.compact()

    fresh = SearchEngine(
        eng.index,
        use_pallas=True,
        pallas_interpret=True,
        row_block=128,
        rescore_vectors=eng.rescore_vectors,
        rescore_factor=8,
    )
    np.testing.assert_array_equal(
        np.asarray(eng.vectors), np.asarray(fresh.vectors)
    )
    assert eng._rescore_device is not None
    np.testing.assert_array_equal(
        np.asarray(eng._rescore_device), np.asarray(fresh._rescore_device)
    )
    # second compact folds on top of the first fold (inductive case)
    eng.add_documents(new[:3], normalize=False)
    eng.compact()
    fresh2 = SearchEngine(
        eng.index,
        use_pallas=True,
        pallas_interpret=True,
        row_block=128,
        rescore_vectors=eng.rescore_vectors,
        rescore_factor=8,
    )
    np.testing.assert_array_equal(
        np.asarray(eng.vectors), np.asarray(fresh2.vectors)
    )
    np.testing.assert_array_equal(
        np.asarray(eng._rescore_device), np.asarray(fresh2._rescore_device)
    )


def test_inflight_host_rescore_survives_reclaim_swap(small):
    """finalize() runs lock-free with OLD-generation candidate ids; a
    reclaim swap replaces rescore_vectors with a row-permuted copy
    mid-flight. The rescore sources are snapshotted at DISPATCH, so the
    in-flight query rescored against the arrays its ids index — then
    gets translated — and must match a fresh post-compact search."""
    emb, new, q = small
    eng = _fp32_engine(emb, rescore_vectors=emb.copy(), rescore_factor=8)
    assert eng.delete_documents(list(range(0, 100))) == 100
    fin = eng.search_vectors_async(q, k=5)        # dispatched at gen 0
    assert eng.compact(reclaim=True) == 0         # rows shift down by 100
    s_old, i_old = fin()                          # finalized at gen 1
    s_new, i_new = eng.search_vectors(q, k=5)
    np.testing.assert_array_equal(i_old, i_new)
    np.testing.assert_allclose(s_old, s_new, atol=1e-3)


def test_update_document_meta_survives_reclaim_build(small):
    """update_document(meta_row=...) landing WHILE a reclaim compact is
    building must not revert: the build copies metadata early
    (_meta_subset) and the swap replays the in-place column updates onto
    the compacted copy, renumbered through the id map."""
    emb, new, q = small
    eng = _fp32_engine(emb, meta=CorpusMetadata.from_rows(_meta_rows(600)))
    assert eng.delete_documents(list(range(0, 50))) == 50

    def mid_build():
        eng.update_document(300, new[0], meta_row={"year": 2031})

    eng._compact_pre_swap_hook = mid_build
    try:
        eng.compact(reclaim=True)
    finally:
        eng._compact_pre_swap_hook = None
    nid = int(eng.last_id_map[300])
    assert nid == 250                       # 50 dropped rows below it
    assert int(np.asarray(eng.meta.year)[nid]) == 2031
    # the updated vector is live under the translated id
    s, i = eng.search_vectors(new[:1], k=1)
    assert int(i[0, 0]) == nid


# ---------------------------------------------------------------------------
# Randomized differential stress: the live-update state machine vs a
# host-side dict oracle. Deterministic per seed; every step's top-k must
# be EXACT against brute force over the oracle's live vectors (fp32
# engine, no quantization), across random interleavings of
# add / update / delete / compact / compact(reclaim=True).
# ---------------------------------------------------------------------------


def _check_topk_vs_oracle(eng, oracle: dict, queries, k, atol=2.5e-3):
    """Engine top-k == brute force over the oracle dict (tie-tolerant:
    the returned ids' oracle scores must match the returned scores AND
    dominate the oracle's kth-best score). atol covers the delta
    buffer's bf16 storage (search/delta.py: ~1e-3 rounding at |s|<=1,
    matching TPU fp32-matmul bf16 truncation); state-machine bugs —
    stale folds, wrong vectors, resurrected deletes — err at >>1e-2."""
    live_ids = np.fromiter(oracle.keys(), np.int64)
    live_vecs = np.stack([oracle[i] for i in live_ids])
    kk = min(k, len(live_ids))
    s, i = eng.search_vectors(queries, k=kk)
    ref = queries @ live_vecs.T                      # (B, L)
    kth_best = np.sort(ref, axis=1)[:, -kk]          # kth-largest per query
    pos = {int(d): r for r, d in enumerate(live_ids)}
    for b in range(queries.shape[0]):
        rows = [pos.get(int(d), -1) for d in i[b]]
        assert -1 not in rows, f"dead/unknown id returned: {i[b]}"
        # distinctness: a duplicated top doc would pass both the
        # score-match and kth-best-domination checks below
        assert len({int(d) for d in i[b]}) == kk, f"duplicate ids: {i[b]}"
        got = ref[b, rows]
        np.testing.assert_allclose(s[b], got, atol=atol)
        assert (got >= kth_best[b] - atol).all(), (
            f"rank violation: {got} vs kth {kth_best[b]}"
        )


def _random_op(rng, eng, oracle, dim, p_compact=0.08):
    """Apply one random mutation to engine AND oracle. Returns op tag.
    p_compact=0 keeps compaction out of the mix (the mid-build hook
    must never nest compact() — _compact_lock is non-reentrant)."""
    r = rng.random() * (1.0 if p_compact else 0.92)
    live = list(oracle.keys())
    if not p_compact and r >= 0.60 and len(live) <= 12:
        # with compaction disabled, the delete branch below must absorb
        # the whole [0.60, 0.92) range; when the live set is too small
        # for a delete, falling through would reach compact() — which
        # deadlocks inside a mid-build hook. No-op instead.
        return "noop"
    if r < 0.40:                                     # add 1-4 docs
        m = int(rng.integers(1, 5))
        vecs = np.asarray(
            l2_normalize(rng.standard_normal((m, dim)).astype(np.float32))
        )
        ids = eng.add_documents(vecs, normalize=False)
        for j, d in enumerate(ids):
            oracle[int(d)] = vecs[j]
        return f"add{m}"
    if r < 0.60 and live:                            # update one live doc
        d = int(live[rng.integers(len(live))])
        v = np.asarray(
            l2_normalize(rng.standard_normal((dim,)).astype(np.float32))
        )
        eng.update_document(d, v)
        oracle[d] = v
        return "update"
    if r < 0.60 + 0.32 and len(live) > 12:           # delete 1-6 docs
        m = int(rng.integers(1, 7))
        picks = rng.choice(live, size=m, replace=False)
        n = eng.delete_documents(picks)
        assert n == m
        for d in picks:
            oracle.pop(int(d))
        return f"del{m}"
    # compact; sometimes reclaim (renumber oracle through last_id_map)
    reclaim = rng.random() < 0.5
    eng.compact(reclaim=reclaim)
    if reclaim:
        mp = eng.last_id_map
        if mp is not None:
            remapped = {}
            for old, vec in oracle.items():
                nid = int(mp[old]) if old < len(mp) else int(old)
                assert nid >= 0, f"live doc {old} dropped by reclaim"
                remapped[nid] = vec
            oracle.clear()
            oracle.update(remapped)
    return "reclaim" if reclaim else "compact"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_randomized_live_ops_vs_oracle(seed):
    dim, n0, steps = 32, 96, 28
    rng = np.random.default_rng(100 + seed)
    base = _norm(rng.standard_normal((n0, dim)))
    eng = _fp32_engine(base)
    oracle = {i: base[i] for i in range(n0)}
    qs = _norm(rng.standard_normal((3, dim)))
    trail = []
    for step in range(steps):
        trail.append(_random_op(rng, eng, oracle, dim))
        assert eng.num_live == len(oracle), f"after {trail}"
        _check_topk_vs_oracle(eng, oracle, qs, k=8)
    # quiesce: a final reclaim folds everything; exactness must hold
    eng.compact(reclaim=True)
    mp = eng.last_id_map
    if mp is not None:
        oracle = {
            (int(mp[d]) if d < len(mp) else d): v for d, v in oracle.items()
        }
    assert eng.num_live == len(oracle)
    _check_topk_vs_oracle(eng, oracle, qs, k=8)


@pytest.mark.parametrize("seed", [0, 1])
def test_randomized_mid_build_mutations_vs_oracle(seed):
    """Random mutations landing WHILE compact() builds (via the pre-swap
    hook) must fold into the post-swap state exactly: the swap's
    reconcile replays snapshot-to-swap deltas into the next delta."""
    dim, n0 = 32, 96
    rng = np.random.default_rng(200 + seed)
    base = _norm(rng.standard_normal((n0, dim)))
    eng = _fp32_engine(base)
    oracle = {i: base[i] for i in range(n0)}
    qs = _norm(rng.standard_normal((3, dim)))
    # dirty the engine first so the compact has real work
    for _ in range(6):
        _random_op(rng, eng, oracle, dim, p_compact=0.0)

    def mid_build():
        for _ in range(4):
            _random_op(rng, eng, oracle, dim, p_compact=0.0)

    eng._compact_pre_swap_hook = mid_build
    try:
        eng.compact()            # non-reclaim: ids stable throughout
    finally:
        eng._compact_pre_swap_hook = None
    assert eng.num_live == len(oracle)
    _check_topk_vs_oracle(eng, oracle, qs, k=8)
    # the replayed mid-build rows then fold cleanly themselves
    eng.compact()
    _check_topk_vs_oracle(eng, oracle, qs, k=8)


@pytest.mark.parametrize("seed", [0, 1])
def test_randomized_live_ops_speed_path(seed):
    """The same randomized interleavings over the PRODUCTION speed path
    (int8 global-scale maxima scan + exact rescore, interpret mode):
    every returned id must be live, and per-query recall@k vs the fp32
    oracle must clear 0.9 (the adaptive over-fetch margin covers the
    tombstone drop rate; the exact rescore bounds rank noise)."""
    dim, n0, steps = 32, 96, 12
    rng = np.random.default_rng(300 + seed)
    base = _norm(rng.standard_normal((n0, dim)))
    eng = _speed_engine(base)
    oracle = {i: base[i] for i in range(n0)}
    qs = _norm(rng.standard_normal((3, dim)))
    for step in range(steps):
        _random_op(rng, eng, oracle, dim)
        assert eng.num_live == len(oracle)
        live_ids = np.fromiter(oracle.keys(), np.int64)
        live_vecs = np.stack([oracle[i] for i in live_ids])
        kk = min(8, len(live_ids))
        s, i = eng.search_vectors(qs, k=kk)
        ref = qs @ live_vecs.T
        kth_best = np.sort(ref, axis=1)[:, -kk]
        pos = {int(d): r for r, d in enumerate(live_ids)}
        for b in range(qs.shape[0]):
            rows = [pos.get(int(d), -1) for d in i[b]]
            assert -1 not in rows, f"dead/unknown id returned: {i[b]}"
            assert len({int(d) for d in i[b]}) == kk, f"duplicate ids: {i[b]}"
            hits = (ref[b, rows] >= kth_best[b] - 2.5e-3).sum()
            assert hits / kk >= 0.9, f"recall {hits}/{kk} at step {step}"


@pytest.mark.parametrize("seed", [0, 1])
def test_randomized_live_ops_with_meta_and_filters(seed):
    """Randomized interleavings WITH metadata serving: meta rows travel
    with adds/updates, year-range-filtered searches agree with a host
    oracle restricted to passing docs, and reclaim renumbering carries
    the metadata columns (the swap-time meta replay surface)."""
    dim, n0, steps = 32, 80, 20
    rng = np.random.default_rng(400 + seed)
    base = _norm(rng.standard_normal((n0, dim)))
    years = list(2000 + rng.integers(0, 20, size=n0))
    meta_rows = _meta_rows(n0)
    for r, y in zip(meta_rows, years):
        r["year"] = int(y)
    eng = _fp32_engine(base, meta=CorpusMetadata.from_rows(meta_rows))
    oracle = {i: (base[i], int(years[i])) for i in range(n0)}
    qs = _norm(rng.standard_normal((2, dim)))

    def rand_meta(i):
        return dict(_meta_rows(1, start=i)[0], year=int(2000 + rng.integers(0, 20)))

    for step in range(steps):
        r = rng.random()
        live = list(oracle.keys())
        if r < 0.35:                                   # add with meta
            m = int(rng.integers(1, 4))
            vecs = np.asarray(l2_normalize(
                rng.standard_normal((m, dim)).astype(np.float32)))
            rows = [rand_meta(0) for _ in range(m)]
            ids = eng.add_documents(vecs, meta_rows=rows, normalize=False)
            for j, d in enumerate(ids):
                oracle[int(d)] = (vecs[j], int(rows[j]["year"]))
        elif r < 0.55 and live:                        # update vec + year
            d = int(live[rng.integers(len(live))])
            v = np.asarray(l2_normalize(
                rng.standard_normal((dim,)).astype(np.float32)))
            nr = rand_meta(d)
            eng.update_document(d, v, meta_row={"year": nr["year"]})
            oracle[d] = (v, int(nr["year"]))
        elif r < 0.85 and len(live) > 10:              # delete
            m = int(rng.integers(1, 5))
            picks = rng.choice(live, size=m, replace=False)
            assert eng.delete_documents(picks) == m
            for d in picks:
                oracle.pop(int(d))
        else:                                          # compact / reclaim
            reclaim = rng.random() < 0.5
            eng.compact(reclaim=reclaim)
            if reclaim and eng.last_id_map is not None:
                mp = eng.last_id_map
                oracle = {
                    (int(mp[d]) if d < len(mp) else d): v
                    for d, v in oracle.items()
                }
        assert eng.num_live == len(oracle)
        # filtered search vs the oracle restricted to passing years
        lo = int(2000 + rng.integers(0, 15))
        f = SearchFilters(year_range=(lo, lo + 5))
        passing = {d: v for d, (v, y) in oracle.items() if lo <= y <= lo + 5}
        s, i = eng.search_vectors(qs, k=6, filters=f)
        if not passing:
            continue
        live_ids = np.fromiter(passing.keys(), np.int64)
        live_vecs = np.stack([passing[d] for d in live_ids])
        kk = min(6, len(live_ids))
        ref = qs @ live_vecs.T
        kth = np.sort(ref, axis=1)[:, -kk]
        pos = {int(d): r2 for r2, d in enumerate(live_ids)}
        for b in range(qs.shape[0]):
            got_ids = [int(d) for d in i[b] if d >= 0][:kk]
            assert len(got_ids) == kk, f"step {step}: {i[b]} vs {kk} passing"
            rows2 = [pos.get(d, -1) for d in got_ids]
            assert -1 not in rows2, (
                f"step {step}: non-passing/dead id in {got_ids}"
            )
            assert len(set(got_ids)) == kk, f"duplicate ids: {got_ids}"
            gotv = ref[b, rows2]
            np.testing.assert_allclose(
                np.asarray(s[b])[: len(gotv)], gotv, atol=2.5e-3
            )
            assert (gotv >= kth[b] - 2.5e-3).all()
        # metadata joins stay consistent for a random passing doc
        d0 = int(live_ids[0])
        assert int(np.asarray(eng.meta.year)[d0]) == oracle[d0][1]


@pytest.mark.parametrize("seed", [0, 1])
def test_randomized_live_ops_ivf_route(seed):
    """Randomized add/update/delete/compact interleavings with the IVF
    route active: the route must survive every compact (folded rows
    assign to nearest centroids), every returned id must be live, and
    small-batch (IVF-routed) recall@k vs the exact oracle must hold."""
    from theoremsearch_tpu.index.ivf import IVFIndex

    dim, n0, steps = 64, 512, 10
    rng = np.random.default_rng(500 + seed)
    centers = np.asarray(l2_normalize(
        rng.standard_normal((16, dim)).astype(np.float32)))
    pts = centers[rng.integers(0, 16, n0)] + (
        0.5 / np.sqrt(dim)
    ) * rng.standard_normal((n0, dim)).astype(np.float32)
    base = np.asarray(l2_normalize(pts))
    ivf = IVFIndex.build(
        base,
        config=IndexConfig(ivf_nlist=16, dtype="int8", ivf_assign2_margin=0.02),
        slab_rows=128,
        normalize=False,
    )
    idx = FlatIndex.build(
        base, config=IndexConfig(pad_multiple=128, dtype="float32"),
        normalize=False,
    )
    eng = SearchEngine(
        idx, use_pallas=True, pallas_interpret=True, row_block=128,
        ivf_index=ivf, ivf_nprobe=8, rescore_factor=8,
    )
    oracle = {i: base[i] for i in range(n0)}

    def new_vec(m=1):
        v = centers[rng.integers(0, 16, m)] + (
            0.5 / np.sqrt(dim)
        ) * rng.standard_normal((m, dim)).astype(np.float32)
        return np.asarray(l2_normalize(v))

    for step in range(steps):
        r = rng.random()
        live = list(oracle.keys())
        if r < 0.35:
            m = int(rng.integers(1, 4))
            vecs = new_vec(m)
            ids = eng.add_documents(vecs, normalize=False)
            for j, d in enumerate(ids):
                oracle[int(d)] = vecs[j]
        elif r < 0.55 and live:
            d = int(live[rng.integers(len(live))])
            v = new_vec(1)[0]
            eng.update_document(d, v)
            oracle[d] = v
        elif r < 0.80 and len(live) > 20:
            m = int(rng.integers(1, 6))
            picks = rng.choice(live, size=m, replace=False)
            assert eng.delete_documents(picks) == m
            for d in picks:
                oracle.pop(int(d))
        else:
            eng.compact()
            assert eng.ivf is not None, f"IVF route lost at step {step}"
        assert eng.num_live == len(oracle)
        # small batch -> IVF route; oracle restricted to live docs
        live_ids = np.fromiter(oracle.keys(), np.int64)
        live_vecs = np.stack([oracle[i] for i in live_ids])
        qs = new_vec(4)
        kk = min(8, len(live_ids))
        s, i = eng.search_vectors(qs, k=kk)
        ref = qs @ live_vecs.T
        kth = np.sort(ref, axis=1)[:, -kk]
        pos = {int(d): r2 for r2, d in enumerate(live_ids)}
        hits = 0
        for b in range(qs.shape[0]):
            rows = [pos.get(int(d), -1) for d in i[b]]
            assert -1 not in rows, f"dead id at step {step}: {i[b]}"
            assert len({int(d) for d in i[b]}) == kk, f"duplicate ids: {i[b]}"
            hits += (ref[b, rows] >= kth[b] - 2.5e-3).sum()
        assert hits / (4 * kk) >= 0.85, (
            f"IVF recall {hits}/{4 * kk} at step {step}"
        )
    # final fold keeps the route and full recall class
    eng.compact()
    assert eng.ivf is not None and eng.ivf.num_rows >= len(oracle)


@pytest.mark.parametrize("seed", [0])
def test_randomized_scheduler_stress_with_compacts(seed):
    """Randomized serving-layer stress: 4 query threads drive mixed
    filtered/unfiltered searches through the BatchScheduler while a
    mutator thread runs random adds/updates/deletes and NON-RECLAIM
    compacts (ids stable). Every response must be structurally valid
    (shape, finite descending scores, ids within the minted range);
    after quiesce the engine must agree exactly with the dict oracle."""
    import threading

    from theoremsearch_tpu.serve.scheduler import BatchScheduler

    dim, n0 = 32, 128
    rng = np.random.default_rng(600 + seed)
    base = _norm(rng.standard_normal((n0, dim)))
    meta_rows = _meta_rows(n0)
    for j, r in enumerate(meta_rows):
        r["year"] = int(2000 + (j % 20))
    eng = _fp32_engine(base, meta=CorpusMetadata.from_rows(meta_rows))
    oracle = {i: (base[i], 2000 + (i % 20)) for i in range(n0)}
    olock = threading.Lock()
    minted = [n0]            # upper bound on ever-minted doc ids
    qs = _norm(rng.standard_normal((8, dim)))
    stop = threading.Event()
    errors = []
    sched = BatchScheduler(eng, max_batch=16, max_wait_ms=3)

    def mutate():
        mrng = np.random.default_rng(1600 + seed)
        try:
            for step in range(24):
                r = mrng.random()
                with olock:
                    live = list(oracle.keys())
                if r < 0.4:
                    m = int(mrng.integers(1, 4))
                    vecs = _norm(mrng.standard_normal((m, dim)))
                    rows = _meta_rows(m, start=minted[0])
                    for rr in rows:
                        rr["year"] = int(2000 + mrng.integers(0, 20))
                    ids = eng.add_documents(vecs, meta_rows=rows,
                                            normalize=False)
                    with olock:
                        for j, d in enumerate(ids):
                            oracle[int(d)] = (vecs[j], rows[j]["year"])
                        minted[0] = max(minted[0], int(ids[-1]) + 1)
                elif r < 0.6 and live:
                    d = int(live[mrng.integers(len(live))])
                    v = _norm(mrng.standard_normal((dim,)))
                    y = int(2000 + mrng.integers(0, 20))
                    try:
                        eng.update_document(d, v, meta_row={"year": y})
                    except KeyError:
                        continue          # raced with nothing: id was live
                    with olock:
                        oracle[d] = (v, y)
                elif r < 0.85 and len(live) > 16:
                    m = int(mrng.integers(1, 5))
                    picks = [int(x) for x in
                             mrng.choice(live, size=m, replace=False)]
                    eng.delete_documents(picks)
                    with olock:
                        for d in picks:
                            oracle.pop(d, None)
                else:
                    eng.compact()
        except Exception as e:  # noqa: BLE001
            errors.append(("mutate", e))
        finally:
            stop.set()

    def query(ti):
        qrng = np.random.default_rng(2600 + 10 * seed + ti)
        try:
            while not stop.is_set():
                k = int(qrng.integers(3, 9))
                f = None
                if qrng.random() < 0.5:
                    lo = int(2000 + qrng.integers(0, 15))
                    f = SearchFilters(year_range=(lo, lo + 6))
                s, ids = sched.search(
                    qs[ti % len(qs)], k=k, filters=f, timeout=30.0
                )
                assert ids.shape == (k,)
                s = np.asarray(s, np.float64)
                real = ids >= 0
                assert np.isfinite(s[real]).all()
                assert (np.diff(s[real]) <= 1e-6).all(), f"not sorted: {s}"
                assert (ids[real] < minted[0] + 8).all(), (
                    f"id beyond minted range: {ids}"
                )
        except Exception as e:  # noqa: BLE001
            errors.append((f"query{ti}", e))

    threads = [threading.Thread(target=query, args=(i,)) for i in range(4)]
    mt = threading.Thread(target=mutate)
    for t in threads:
        t.start()
    mt.start()
    mt.join()
    for t in threads:
        t.join()
    sched.shutdown()
    assert not errors, errors
    # quiesce: exact differential against the oracle (vectors only)
    with olock:
        vec_oracle = {d: v for d, (v, _y) in oracle.items()}
    assert eng.num_live == len(vec_oracle)
    _check_topk_vs_oracle(eng, vec_oracle, qs[:3], k=8)


# ---------------------------------------------------------------------------
# Multi-chip live updates (VERDICT r4 item 1): the reference's rows are
# searchable-on-commit at ANY corpus size (streamlit_app.py:281 — pgvector
# scans whatever is in the table). A sharded engine must therefore accept
# add/update/delete/compact(reclaim) and track the single-device live
# engine id-for-id at every step: the delta buffer replicates across the
# mesh (P()), deletes ride the row-sharded masked scan, and compact's
# build-aside-and-swap rebuilds the sharded arrays off-lock.
# ---------------------------------------------------------------------------

from theoremsearch_tpu.core import MeshConfig, make_mesh  # noqa: E402


def _sharded_fp32_engine(emb, meta=None, n_shards=8):
    mesh = make_mesh(MeshConfig(data=1, shard=n_shards))
    idx = FlatIndex.build(
        emb, config=IndexConfig(pad_multiple=128, dtype="float32"), normalize=False
    )
    return SearchEngine(idx, meta=meta, mesh=mesh, use_pallas=False, row_block=128)


def _sharded_speed_engine(emb, meta=None, n_shards=4):
    mesh = make_mesh(MeshConfig(data=1, shard=n_shards))
    idx = FlatIndex.build(
        emb,
        config=IndexConfig(pad_multiple=256, dtype="int8", int8_scale="global"),
        normalize=False,
    )
    return SearchEngine(
        idx, meta=meta, mesh=mesh, use_pallas=True, pallas_interpret=True,
        row_block=128, rescore_vectors=emb, rescore_factor=8,
    )


def test_sharded_live_mutations_match_single_device(small):
    """add/update/delete on an 8-shard mesh engine == the single-device
    live engine, id-for-id, after every mutation."""
    emb, new, q = small
    eng_m = _sharded_fp32_engine(emb)
    eng_1 = _fp32_engine(emb)

    def check():
        s_m, i_m = eng_m.search_vectors(q, k=8)
        s_1, i_1 = eng_1.search_vectors(q, k=8)
        np.testing.assert_array_equal(i_m, i_1)
        np.testing.assert_allclose(s_m, s_1, atol=2e-3)

    ids_m = eng_m.add_documents(new[:6], normalize=False)
    ids_1 = eng_1.add_documents(new[:6], normalize=False)
    np.testing.assert_array_equal(ids_m, ids_1)
    check()
    eng_m.update_document(42, new[6])
    eng_1.update_document(42, new[6])
    check()
    assert eng_m.delete_documents([17, int(ids_m[0]), 42]) == 3
    assert eng_1.delete_documents([17, int(ids_1[0]), 42]) == 3
    assert eng_m.num_live == eng_1.num_live == 600 + 6 - 3
    check()


def test_sharded_compact_and_reclaim_match_single_device(small):
    """compact() and compact(reclaim=True) on the mesh engine fold/renumber
    exactly as the single-device engine (same id maps, same results)."""
    emb, new, q = small
    eng_m = _sharded_fp32_engine(emb)
    eng_1 = _fp32_engine(emb)
    for e in (eng_m, eng_1):
        e.add_documents(new[:8], normalize=False)
        e.delete_documents([3, 77, 601])
    assert eng_m.compact() == eng_1.compact()
    assert eng_m.n_valid == eng_1.n_valid
    s_m, i_m = eng_m.search_vectors(q, k=10)
    s_1, i_1 = eng_1.search_vectors(q, k=10)
    np.testing.assert_array_equal(i_m, i_1)
    for e in (eng_m, eng_1):
        e.add_documents(new[8:12], normalize=False)
    assert eng_m.compact(reclaim=True) == eng_1.compact(reclaim=True)
    np.testing.assert_array_equal(eng_m.last_id_map, eng_1.last_id_map)
    assert eng_m.n_valid == eng_1.n_valid == 600 + 12 - 3
    s_m, i_m = eng_m.search_vectors(q, k=10)
    s_1, i_1 = eng_1.search_vectors(q, k=10)
    np.testing.assert_array_equal(i_m, i_1)
    np.testing.assert_allclose(s_m, s_1, atol=2e-3)


def test_sharded_speed_path_live_mutations(small):
    """The PRODUCTION sharded speed path (int8 maxima scan + local
    rescore, interpret mode) under live mutations: deletes stream the
    row-sharded tombstone mask through the masked kernel; ids must match
    the single-device speed engine at every step."""
    emb, new, q = small
    eng_m = _sharded_speed_engine(emb)
    eng_1 = _speed_engine(emb)
    assert eng_m._sharded_speed_ok

    def check():
        _, i_m = eng_m.search_vectors(q, k=8)
        _, i_1 = eng_1.search_vectors(q, k=8)
        np.testing.assert_array_equal(i_m, i_1)

    for e in (eng_m, eng_1):
        e.add_documents(new[:5], normalize=False)
    check()
    # both engines route deletes through the k+margin over-fetch (the
    # sharded programs fetch per-shard margins; host drop is
    # layout-agnostic) — ids must stay exact
    for e in (eng_m, eng_1):
        assert e.delete_documents([0, 1, 2, 603]) == 4
    check()
    for e in (eng_m, eng_1):
        e.update_document(10, new[6])
    check()
    assert eng_m.compact() == eng_1.compact()
    check()
    assert eng_m.compact(reclaim=True) == eng_1.compact(reclaim=True)
    np.testing.assert_array_equal(eng_m.last_id_map, eng_1.last_id_map)
    check()


def test_sharded_live_mutations_with_meta_and_filters(small):
    """Metadata serving + filtered search on a mesh engine with live
    mutations: the filter mask covers live-added docs (delta bias) and
    deletes, and reclaim renumbers metadata identically to single-dev."""
    emb, new, q = small
    meta_m = CorpusMetadata.from_rows(_meta_rows(600))
    meta_1 = CorpusMetadata.from_rows(_meta_rows(600))
    eng_m = _sharded_fp32_engine(emb, meta=meta_m)
    eng_1 = _fp32_engine(emb, meta=meta_1)
    rows = _meta_rows(6, start=600, year=2021)
    for e in (eng_m, eng_1):
        e.add_documents(new[:6], meta_rows=rows, normalize=False)
        e.delete_documents([9, 602])
    f = SearchFilters(year_range=(2021, 2021))
    s_m, i_m = eng_m.search_vectors(q, k=4, filters=f)
    s_1, i_1 = eng_1.search_vectors(q, k=4, filters=f)
    np.testing.assert_array_equal(i_m, i_1)
    # only the 2021 delta docs (minus the deleted one) can match
    live_2021 = {600, 601, 603, 604, 605}
    assert {int(d) for d in i_m.ravel() if d >= 0} <= live_2021
    for e in (eng_m, eng_1):
        assert e.compact(reclaim=True) == 5   # doc 602 was deleted
    np.testing.assert_array_equal(eng_m.last_id_map, eng_1.last_id_map)
    s_m, i_m = eng_m.search_vectors(q, k=4, filters=f)
    s_1, i_1 = eng_1.search_vectors(q, k=4, filters=f)
    np.testing.assert_array_equal(i_m, i_1)
    assert all(
        int(np.asarray(eng_m.meta.year)[int(d)]) == 2021
        for d in i_m.ravel() if d >= 0
    )


def test_sharded_compact_concurrent_with_queries(small):
    """The sharded twin of test_compact_concurrent_with_queries: a query
    thread hammers the MESH engine while compact() rebuilds and swaps the
    sharded device state; no interleaving may surface a shape error,
    half-swapped state, or dead id."""
    import threading

    emb, new, q = small
    eng = _sharded_fp32_engine(emb)
    errs: list[Exception] = []
    stop = threading.Event()

    def hammer():
        while not stop.is_set():
            try:
                s, i = eng.search_vectors(q, k=5)
                assert i.shape == (9, 5) and (i >= 0).all()
            except Exception as e:  # noqa: BLE001
                errs.append(e)
                return

    t = threading.Thread(target=hammer)
    t.start()
    try:
        for j in range(4):
            eng.add_documents(new[5 * j : 5 * j + 5], normalize=False)
            assert eng.compact() == 5
    finally:
        stop.set()
        t.join(timeout=60)
    assert not errs, errs
    assert eng.n_valid == 620 and eng._main_ids_arange
    # post-compact results still exact vs brute force
    allv = np.concatenate([emb, new])
    ref_s, ref_i = _oracle(q, allv, np.arange(620), 10)
    s, i = eng.search_vectors(q, k=10)
    np.testing.assert_array_equal(i, ref_i)


@pytest.mark.parametrize("seed", [0, 1])
def test_randomized_sharded_live_ops_vs_oracle(seed):
    """The randomized differential stress suite over the MESH engine:
    random add/update/delete/compact/reclaim interleavings, every step's
    top-k exact against the host dict oracle."""
    dim, n0, steps = 32, 96, 18
    rng = np.random.default_rng(700 + seed)
    base = _norm(rng.standard_normal((n0, dim)))
    eng = _sharded_fp32_engine(base, n_shards=4)
    oracle = {i: base[i] for i in range(n0)}
    qs = _norm(rng.standard_normal((3, dim)))
    trail = []
    for step in range(steps):
        trail.append(_random_op(rng, eng, oracle, dim))
        assert eng.num_live == len(oracle), f"after {trail}"
        _check_topk_vs_oracle(eng, oracle, qs, k=8)
    eng.compact(reclaim=True)
    mp = eng.last_id_map
    if mp is not None:
        oracle = {
            (int(mp[d]) if d < len(mp) else d): v for d, v in oracle.items()
        }
    assert eng.num_live == len(oracle)
    _check_topk_vs_oracle(eng, oracle, qs, k=8)


def test_grouped_filters_survive_compact(small):
    """An engine serving grouped heterogeneous-filter batches must keep
    serving them correctly across compact() and compact(reclaim=True):
    the swap re-initializes the mask-stack/pass-row caches (stale
    wrong-shape device rows would poison every grouped scan), and
    _compact_warm pre-compiles the grouped program keys."""
    emb, new, q = small
    meta = CorpusMetadata.from_rows(_meta_rows(600))
    eng = _fp32_engine(emb, meta=meta)
    flist = [
        None if i % 3 == 0 else SearchFilters(year_range=(2010, 2010))
        if i % 3 == 1 else SearchFilters(authors=[f"A{i % 7}"])
        for i in range(9)
    ]

    def check():
        s_g, i_g = eng.search_vectors(q, k=6, filters=flist)
        for b in range(9):
            _, i1 = eng.search_vectors(q[b : b + 1], k=6, filters=flist[b])
            assert set(i_g[b].tolist()) == set(i1[0].tolist()), f"q{b}"

    check()
    eng.add_documents(new[:5], meta_rows=_meta_rows(5, 600), normalize=False)
    eng.delete_documents([3, 601])
    check()
    assert eng.compact() == 4
    check()
    assert eng.compact(reclaim=True) == 0 or True
    check()


def test_mask_build_counters_survive_compact(small):
    """The monotonic mask-build counters must not reset on compact()'s
    state transplant — the scheduler computes before/after deltas per
    dispatched batch, and a reset mid-window would log negative
    mask_build_ms into the stage traces."""
    emb, new, q = small
    eng = _fp32_engine(emb, meta=CorpusMetadata.from_rows(_meta_rows(600)))
    eng.search_vectors(q[:2], k=4, filters=SearchFilters(year_range=(2010, 2010)))
    b0, s0 = eng.filter_mask_builds, eng.filter_mask_build_s
    assert b0 >= 1 and s0 > 0
    eng.add_documents(new[:3], meta_rows=_meta_rows(3, 600), normalize=False)
    assert eng.compact() == 3
    assert eng.filter_mask_builds >= b0
    assert eng.filter_mask_build_s >= s0
