"""IVF index tests: k-means sanity, build layout invariants, recall vs
exact at high nprobe, nprobe recall monotonicity, spill exactness,
save/load roundtrip."""

import numpy as np
import pytest

from theoremsearch_tpu.core import IndexConfig
from theoremsearch_tpu.eval.metrics import recall_vs_exact
from theoremsearch_tpu.eval.oracle import exact_topk, l2_normalize
from theoremsearch_tpu.index.ivf import IVFIndex, train_kmeans


@pytest.fixture(scope="module")
def clustered_corpus():
    # clustered data: 50 centers, 80 points each
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((50, 64)).astype(np.float32) * 3
    pts = (centers[np.repeat(np.arange(50), 80)] + rng.standard_normal((4000, 64)).astype(np.float32))
    emb = np.asarray(l2_normalize(pts))
    queries = np.asarray(l2_normalize(centers[:20] + 0.5 * rng.standard_normal((20, 64)).astype(np.float32)))
    return emb, queries


def test_kmeans_reduces_quantization_error(clustered_corpus):
    emb, _ = clustered_corpus
    cents = train_kmeans(emb, nlist=50, iters=20, seed=0)
    assert cents.shape == (50, 64)
    np.testing.assert_allclose(np.linalg.norm(cents, axis=1), 1.0, rtol=1e-4)
    sims = (emb @ cents.T).max(axis=1)
    # on clustered unit data, points should sit close to their centroid
    assert sims.mean() > 0.8


def test_ivf_build_layout(clustered_corpus):
    emb, _ = clustered_corpus
    idx = IVFIndex.build(emb, config=IndexConfig(ivf_nlist=50, dtype="int8"), normalize=False)
    L, R, D = idx.slabs.shape
    assert L == 50 and D == 64
    # every doc id appears exactly once across slabs + spill
    all_ids = np.concatenate([idx.slab_ids.ravel(), idx.spill_ids])
    real = all_ids[all_ids >= 0]
    assert len(real) == 4000 and len(set(real.tolist())) == 4000
    # padding slots are zero vectors
    pad_mask = idx.slab_ids < 0
    assert not idx.slabs[pad_mask].any()


def test_ivf_full_probe_matches_exact(clustered_corpus):
    emb, q = clustered_corpus
    idx = IVFIndex.build(
        emb, config=IndexConfig(ivf_nlist=50, dtype="float32"), normalize=False
    )
    s, i = idx.search(q, k=10, nprobe=50)   # probe everything -> exact
    _, ref = exact_topk(q, emb, k=10)
    assert recall_vs_exact(i, ref, k=10) == 1.0


def test_ivf_recall_monotone_in_nprobe(clustered_corpus):
    emb, q = clustered_corpus
    idx = IVFIndex.build(emb, config=IndexConfig(ivf_nlist=50, dtype="float32"), normalize=False)
    _, ref = exact_topk(q, emb, k=10)
    recalls = [
        recall_vs_exact(idx.search(q, k=10, nprobe=p)[1], ref, k=10) for p in (1, 4, 16, 50)
    ]
    assert all(recalls[i] <= recalls[i + 1] + 1e-9 for i in range(len(recalls) - 1))
    assert recalls[-1] == 1.0
    assert recalls[1] > 0.5   # a few probes already catch most neighbors on clustered data


def test_ivf_int8_rescore_recall(clustered_corpus):
    # This synthetic corpus is adversarial for quantization: 80 points per
    # cluster within ~0.005 score spread, comparable to bf16 resolution.
    # int8-scan + bf16-rescore must still beat the raw int8 ranking and
    # clear 0.95; real embedding corpora have far wider score gaps.
    emb, q = clustered_corpus
    idx = IVFIndex.build(emb, config=IndexConfig(ivf_nlist=50, dtype="int8"), normalize=False)
    assert idx.raw_flat is not None  # rescore copies default on for int8
    _, ref = exact_topk(q, emb, k=10)
    _, i_rescored = idx.search(q, k=10, nprobe=50, rescore_factor=8)
    r_rescored = recall_vs_exact(i_rescored, ref, k=10)

    idx_plain = IVFIndex.build(
        emb, config=IndexConfig(ivf_nlist=50, dtype="int8"), normalize=False, rescore=False
    )
    _, i_plain = idx_plain.search(q, k=10, nprobe=50)
    r_plain = recall_vs_exact(i_plain, ref, k=10)

    assert r_rescored >= r_plain
    assert r_rescored >= 0.95


def test_ivf_spill_rows_reachable(clustered_corpus):
    emb, q = clustered_corpus
    # tiny slabs force heavy spill; full-probe search must still be exact
    idx = IVFIndex.build(
        emb, config=IndexConfig(ivf_nlist=50, dtype="float32"), slab_rows=32, normalize=False
    )
    assert (idx.spill_ids >= 0).sum() > 0
    s, i = idx.search(q, k=10, nprobe=50)
    _, ref = exact_topk(q, emb, k=10)
    assert recall_vs_exact(i, ref, k=10) == 1.0


def test_ivf_save_load_roundtrip(clustered_corpus, tmp_path):
    emb, q = clustered_corpus
    idx = IVFIndex.build(emb, config=IndexConfig(ivf_nlist=32, dtype="int8"), normalize=False)
    idx.save(tmp_path / "ivf")
    idx2 = IVFIndex.load(tmp_path / "ivf")
    s1, i1 = idx.search(q[:5], k=5, nprobe=8)
    s2, i2 = idx2.search(q[:5], k=5, nprobe=8)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)
    assert idx2.memory_bytes() > 0


def test_ivf_pallas_probe_major_path(clustered_corpus):
    """The probe-major Pallas path (interpret=True on CPU): unique-chunk
    streaming + approx selection + bf16 rescore must match the XLA
    gather path's quality bar and return duplicate-free ids."""
    emb, q = clustered_corpus
    idx = IVFIndex.build(emb, config=IndexConfig(ivf_nlist=50, dtype="int8"), normalize=False)
    _, ref = exact_topk(q, emb, k=10)
    s, i = idx.search(q, k=10, nprobe=50, rescore_factor=8, use_pallas=True, interpret=True)
    assert recall_vs_exact(i, ref, k=10) >= 0.95
    for row in np.asarray(i):
        real = row[row >= 0]
        assert len(set(real.tolist())) == len(real)
    # rescored scores are exact-grade inner products of the returned rows
    exp = np.take_along_axis(q @ emb.T, np.asarray(i), 1)
    np.testing.assert_allclose(np.asarray(s), exp, atol=5e-3)


def test_ivf_dual_assignment_layout(clustered_corpus):
    """ivf_assign2_margin stores boundary rows twice (slab slack only);
    searches must still return each doc at most once."""
    emb, q = clustered_corpus
    idx = IVFIndex.build(
        emb,
        config=IndexConfig(ivf_nlist=50, dtype="int8", ivf_assign2_margin=0.05),
        normalize=False,
    )
    all_ids = np.concatenate([idx.slab_ids.ravel(), idx.spill_ids])
    real = all_ids[all_ids >= 0]
    # every doc present at least once; SOME stored twice; none three times
    counts = np.bincount(real, minlength=4000)
    assert (counts >= 1).all()
    assert (counts >= 2).any()
    assert counts.max() <= 2
    _, i = idx.search(q, k=10, nprobe=16, rescore_factor=8, use_pallas=True, interpret=True)
    for row in np.asarray(i):
        r = row[row >= 0]
        assert len(set(r.tolist())) == len(r)
    # the XLA fallback path must ALSO dedup (regression: it returned the
    # same boundary doc in two slots), with and without rescoring
    _, ix = idx.search(q, k=10, nprobe=16, rescore_factor=8, use_pallas=False)
    for row in np.asarray(ix):
        r = row[row >= 0]
        assert len(set(r.tolist())) == len(r)
    idx_plain = IVFIndex.build(
        emb,
        config=IndexConfig(
            ivf_nlist=50, dtype="float32", ivf_assign2_margin=0.05,
        ),
        normalize=False,
        rescore=False,
    )
    _, ip = idx_plain.search(q, k=10, nprobe=16, use_pallas=False)
    for row in np.asarray(ip):
        r = row[row >= 0]
        assert len(set(r.tolist())) == len(r)


def test_ivf_global_scale_int8(clustered_corpus):
    emb, _ = clustered_corpus
    idx = IVFIndex.build(emb, config=IndexConfig(ivf_nlist=32, dtype="int8"), normalize=False)
    assert idx.global_scale > 0
    # slab_scales carry the single corpus-wide scale for the XLA path
    real = idx.slab_ids >= 0
    np.testing.assert_allclose(idx.slab_scales[real], idx.global_scale, rtol=1e-6)
    # int8 slab rows are a power-of-two multiple of 128 (Pallas path)
    R = idx.slabs.shape[1]
    assert R % 128 == 0 and (R // 128) & (R // 128 - 1) == 0


@pytest.fixture(scope="module")
def pallas_scale_corpus():
    """Larger clustered corpus whose slab_rows hit the 128-multiple the
    Pallas paths need: 32 clusters x ~512 members at D=128."""
    rng = np.random.default_rng(3)
    centers = np.asarray(l2_normalize(rng.standard_normal((32, 128)).astype(np.float32)))
    assign = rng.integers(0, 32, 16384)
    pts = centers[assign] + (0.7 / np.sqrt(128)) * rng.standard_normal((16384, 128)).astype(np.float32)
    emb = np.asarray(l2_normalize(pts))
    q = centers[rng.integers(0, 32, 16)] + (0.7 / np.sqrt(128)) * rng.standard_normal((16, 128)).astype(np.float32)
    queries = np.asarray(l2_normalize(q))
    idx = IVFIndex.build(
        emb,
        config=IndexConfig(ivf_nlist=32, dtype="int8", ivf_assign2_margin=0.02),
        slab_rows=768,
        normalize=False,
    )
    return emb, queries, idx


def test_sharded_ivf_matches_oracle(pallas_scale_corpus):
    """Multi-chip IVF: lists sharded over an 8-shard CPU mesh, probe-major
    Pallas kernel per shard (interpret), ICI all_gather merge with
    cross-shard dual-assignment dedupe — recall vs exact and agreement
    with the single-device path."""
    from theoremsearch_tpu.core.config import MeshConfig
    from theoremsearch_tpu.core.meshes import make_mesh

    emb, q, idx = pallas_scale_corpus
    _, ref = exact_topk(q, emb, k=10)
    mesh = make_mesh(MeshConfig(data=1, shard=8))

    fn = idx.sharded_searcher(mesh, k=10, nprobe=8, rescore_factor=8, interpret=True)
    s, i = fn(q)
    s, i = np.asarray(s), np.asarray(i)
    rec = recall_vs_exact(i, np.asarray(ref), k=10)
    assert rec >= 0.95, rec
    # no duplicate doc ids within a result row
    for row in i:
        real = row[row >= 0]
        assert len(set(real.tolist())) == len(real)
    # scores are descending and exact (bf16-rescored) inner products
    assert all(np.all(np.diff(row) <= 1e-6) for row in s)

    s1, i1 = idx.search(q, k=10, nprobe=8, rescore_factor=8,
                        use_pallas=True, interpret=True)
    rec1 = recall_vs_exact(i1, np.asarray(ref), k=10)
    # sharded probing sees the same lists; recall should match closely
    assert abs(rec - rec1) <= 0.05, (rec, rec1)


def test_sharded_ivf_xla_fallback(pallas_scale_corpus):
    from theoremsearch_tpu.core.config import MeshConfig
    from theoremsearch_tpu.core.meshes import make_mesh

    emb, q, idx = pallas_scale_corpus
    _, ref = exact_topk(q, emb, k=10)
    mesh = make_mesh(MeshConfig(data=1, shard=4))
    fn = idx.sharded_searcher(mesh, k=10, nprobe=8, rescore_factor=8,
                              use_pallas=False)
    _, i = fn(q)
    assert recall_vs_exact(np.asarray(i), np.asarray(ref), k=10) >= 0.95


def test_engine_with_ivf_route(pallas_scale_corpus):
    """SearchEngine(ivf_index=...) routes unfiltered queries through the
    probe-major IVF path (serving integration); filtered queries keep
    the flat masked scan."""
    from theoremsearch_tpu.search import CorpusMetadata, SearchEngine, SearchFilters
    from theoremsearch_tpu.index import FlatIndex

    emb, q, idx = pallas_scale_corpus
    n = emb.shape[0]
    rows = [
        {"paper_id": f"p{i}", "paper_title": f"T{i}", "authors": [],
         "link": "https://arxiv.org/abs/x", "year": 2000 + (i % 30),
         "primary_category": "math.AG", "journal_ref": None, "citations": i,
         "theorem_name": "Theorem 1.", "theorem_body": "b", "slogan": "s"}
        for i in range(n)
    ]
    flat = FlatIndex.build(emb, config=IndexConfig(pad_multiple=1024, dtype="float32"),
                           normalize=False)
    eng = SearchEngine(
        flat, meta=CorpusMetadata.from_rows(rows), use_pallas=True,
        pallas_interpret=True, row_block=128, ivf_index=idx, ivf_nprobe=8,
        rescore_factor=8,
    )
    _, ref = exact_topk(q, emb, k=10)
    s, i = eng.search_vectors(q, k=10)
    assert recall_vs_exact(i, np.asarray(ref), k=10) >= 0.95
    # async path too
    s2, i2 = eng.search_vectors_async(q, k=10)()
    np.testing.assert_array_equal(i, i2)
    # filtered query uses the flat masked scan and respects the filter
    f = SearchFilters(year_range=(2000, 2004))
    _, fi = eng.search_vectors(q[:2], k=5, filters=f)
    for d in fi.ravel():
        if d >= 0:
            assert 2000 + (int(d) % 30) <= 2004
    # an all-pass filter routes back to the fast (IVF) path
    from theoremsearch_tpu.search.filters import compile_filter_mask
    assert compile_filter_mask(
        SearchFilters(year_range=(1900, 2100)), eng.meta
    ) is None


def test_kmeans_checkpoint_kill_and_resume(clustered_corpus, tmp_path, monkeypatch):
    """A build killed mid-k-means resumes from the last persisted round
    and lands on EXACTLY the centroids of an uninterrupted run (Lloyd
    rounds chain deterministically)."""
    import theoremsearch_tpu.index.ivf as ivf_mod

    emb, _ = clustered_corpus
    full = train_kmeans(emb, 16, iters=9, seed=1, sample=None)

    real = ivf_mod._kmeans_device
    calls = {"n": 0}

    def dying(x, cents, *, nlist, iters):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("killed")
        return real(x, cents, nlist=nlist, iters=iters)

    monkeypatch.setattr(ivf_mod, "_kmeans_device", dying)
    with pytest.raises(RuntimeError):
        train_kmeans(emb, 16, iters=9, seed=1, sample=None,
                     checkpoint_dir=tmp_path, ckpt_every=3)
    monkeypatch.setattr(ivf_mod, "_kmeans_device", real)
    # resume: picks up at round 6, runs only the last 3 iters
    resumed = train_kmeans(emb, 16, iters=9, seed=1, sample=None,
                           checkpoint_dir=tmp_path, ckpt_every=3)
    np.testing.assert_allclose(resumed, full, atol=1e-6)


def test_ivf_build_checkpoint_reuse(clustered_corpus, tmp_path):
    """A checkpointed build persists k-means + assignment outputs, and a
    rebuild from the checkpoints produces an identical index."""
    emb, q = clustered_corpus
    cfg = IndexConfig(ivf_nlist=32, dtype="int8", ivf_assign2_margin=0.02)
    a = IVFIndex.build(emb, config=cfg, checkpoint_dir=tmp_path)
    assert (tmp_path / "kmeans_ckpt.npz").exists()
    assert (tmp_path / "assign_ckpt.npz").exists()
    b = IVFIndex.build(emb, config=cfg, checkpoint_dir=tmp_path)
    np.testing.assert_array_equal(a.slab_ids, b.slab_ids)
    np.testing.assert_array_equal(a.spill_ids, b.spill_ids)
    np.testing.assert_allclose(a.centroids, b.centroids)


def test_calibrate_nprobe_holds_gate(clustered_corpus):
    from theoremsearch_tpu.index.ivf import calibrate_nprobe

    emb, _ = clustered_corpus
    idx = IVFIndex.build(
        emb, config=IndexConfig(ivf_nlist=32, dtype="float32")
    )
    nprobe, rec = calibrate_nprobe(
        idx, emb, gate=0.95, k=10, n_queries=64, n_draws=2,
        candidates=(2, 4, 8, 16, 32),
    )
    assert rec >= 0.95
    assert nprobe <= 32
    # verify the calibrated setting really holds on a fresh draw
    rng = np.random.default_rng(99)
    rows = rng.choice(emb.shape[0], 64, replace=False)
    qv = emb[rows] + (0.25 / np.sqrt(64)) * rng.standard_normal((64, 64)).astype(np.float32)
    qv /= np.linalg.norm(qv, axis=1, keepdims=True)
    _, ref = exact_topk(qv, emb, k=10)
    _, ids = idx.search(qv, k=10, nprobe=nprobe)
    assert recall_vs_exact(ids, np.asarray(ref), k=10) >= 0.9


def test_builder_finalize_ivf(clustered_corpus, tmp_path):
    from theoremsearch_tpu.index.builder import IndexBuilder

    emb, q = clustered_corpus
    b = IndexBuilder(tmp_path / "spool", IndexConfig(
        ivf_nlist=32, dtype="int8", int8_scale="global", ivf_assign2_margin=0.02,
    ))
    ids = np.arange(emb.shape[0], dtype=np.int64)
    b.add(ids[:2000], emb[:2000])
    b.add(ids[2000:], emb[2000:])
    index, calib = b.finalize_ivf(calibrate_gate=0.9)
    assert calib is not None and calib[1] >= 0.5
    assert index.config.ivf_nprobe == calib[0]
    assert (tmp_path / "spool" / "kmeans_ckpt.npz").exists()
    _, ref = exact_topk(q, emb, k=10)
    _, found = index.search(q, k=10, nprobe=32)
    assert recall_vs_exact(found, np.asarray(ref), k=10) >= 0.9


def test_finalize_ivf_uncleared_gate_not_stamped_calibrated(
    clustered_corpus, tmp_path
):
    """When no nprobe candidate clears the gate, calibrate_nprobe returns
    its best effort — finalize_ivf must record it UNCALIBRATED (and warn)
    rather than stamping a below-gate config as trusted, which the engine
    would then use verbatim."""
    import warnings

    from theoremsearch_tpu.index.builder import IndexBuilder

    emb, _ = clustered_corpus
    b = IndexBuilder(tmp_path / "spool", IndexConfig(
        ivf_nlist=32, dtype="int8", int8_scale="global", ivf_assign2_margin=0.02,
    ))
    b.add(np.arange(emb.shape[0], dtype=np.int64), emb)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        index, calib = b.finalize_ivf(calibrate_gate=1.01)  # unclearable
    assert calib is not None and calib[1] < 1.01
    assert not index.config.ivf_nprobe_calibrated
    assert any("did not clear" in str(x.message) for x in w)


def test_checkpoint_invalidated_by_different_corpus(clustered_corpus, tmp_path):
    """A same-shape corpus with DIFFERENT contents must not reuse a stale
    checkpoint (the keys carry a content fingerprint)."""
    emb, _ = clustered_corpus
    cfg = IndexConfig(ivf_nlist=16, dtype="float32")
    a = IVFIndex.build(emb, config=cfg, checkpoint_dir=tmp_path)
    rng = np.random.default_rng(123)
    emb2 = np.asarray(l2_normalize(
        rng.standard_normal(emb.shape).astype(np.float32)))
    b = IVFIndex.build(emb2, config=cfg, checkpoint_dir=tmp_path)
    # fresh k-means on the new corpus, not the old centroids
    assert not np.allclose(a.centroids, b.centroids)
    # and the new index actually retrieves the new corpus
    q = emb2[:4]
    _, ids = b.search(q, k=1, nprobe=16)
    assert (ids[:, 0] == np.arange(4)).all()


def test_calibrated_nprobe_trusted_by_engine(clustered_corpus, tmp_path):
    from theoremsearch_tpu.index.builder import IndexBuilder
    from theoremsearch_tpu.search import SearchEngine

    emb, _ = clustered_corpus
    b = IndexBuilder(tmp_path / "sp", IndexConfig(
        ivf_nlist=32, dtype="int8", int8_scale="global", ivf_assign2_margin=0.02,
    ))
    b.add(np.arange(emb.shape[0], dtype=np.int64), emb)
    ivf, calib = b.finalize_ivf(calibrate_gate=0.9)
    assert ivf.config.ivf_nprobe_calibrated
    flat_idx = __import__("theoremsearch_tpu.index", fromlist=["FlatIndex"]).FlatIndex.build(
        emb, config=IndexConfig(pad_multiple=256, dtype="int8", int8_scale="global"),
        normalize=False,
    )
    eng = SearchEngine(
        flat_idx, use_pallas=True, pallas_interpret=True, row_block=128,
        rescore_vectors=emb, rescore_factor=8, ivf_index=ivf,
    )
    # engine uses the calibrated value verbatim (no floor at 16)
    assert eng.ivf_nprobe == calib[0]


def test_ivf_residual_capacity_mode(clustered_corpus):
    """config.residual: IVF rescore from two-level int8 reconstruction
    (no bf16 copy; 2 bytes/dim). Scores must be ~15-bit-exact inner
    products and recall must match the bf16-rescore build."""
    emb, q = clustered_corpus
    idx_r = IVFIndex.build(
        emb,
        config=IndexConfig(ivf_nlist=50, dtype="int8", residual=True),
        normalize=False,
    )
    assert idx_r.raw_flat is None and idx_r.res_flat is not None
    assert idx_r.has_rescore
    idx_b = IVFIndex.build(
        emb, config=IndexConfig(ivf_nlist=50, dtype="int8"), normalize=False
    )
    # capacity mode is smaller than the bf16-copy build
    assert idx_r.memory_bytes() < idx_b.memory_bytes()
    _, ref = exact_topk(q, emb, k=10)
    # XLA path
    s, i = idx_r.search(q, k=10, nprobe=50, rescore_factor=8, use_pallas=False)
    rec = recall_vs_exact(i, ref, k=10)
    s_b, i_b = idx_b.search(q, k=10, nprobe=50, rescore_factor=8, use_pallas=False)
    rec_b = recall_vs_exact(i_b, ref, k=10)
    assert rec >= rec_b - 1e-9, (rec, rec_b)
    # residual-rescored scores are MUCH closer to fp32 than bf16 grade
    exp = np.take_along_axis(q @ emb.T, np.asarray(i), 1)
    valid = np.asarray(i) >= 0
    np.testing.assert_allclose(np.asarray(s)[valid], exp[valid], atol=5e-4)
    # probe-major Pallas path (interpret on CPU)
    s2, i2 = idx_r.search(q, k=10, nprobe=50, rescore_factor=8,
                          use_pallas=True, interpret=True)
    assert recall_vs_exact(i2, ref, k=10) >= 0.95
    exp2 = np.take_along_axis(q @ emb.T, np.asarray(i2), 1)
    valid2 = np.asarray(i2) >= 0
    np.testing.assert_allclose(np.asarray(s2)[valid2], exp2[valid2], atol=5e-4)


def test_ivf_residual_save_load_roundtrip(clustered_corpus, tmp_path):
    emb, q = clustered_corpus
    idx = IVFIndex.build(
        emb,
        config=IndexConfig(ivf_nlist=50, dtype="int8", residual=True),
        normalize=False,
    )
    idx.save(tmp_path / "ivf_resid")
    idx2 = IVFIndex.load(tmp_path / "ivf_resid")
    assert idx2.res_flat is not None and idx2.res_scales_flat is not None
    np.testing.assert_array_equal(idx2.res_flat, idx.res_flat)
    np.testing.assert_array_equal(idx2.res_scales_flat, idx.res_scales_flat)
    s1, i1 = idx.search(q, k=5, nprobe=20, use_pallas=False)
    s2, i2 = idx2.search(q, k=5, nprobe=20, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_sharded_ivf_residual(pallas_scale_corpus):
    """Sharded IVF in capacity mode: per-shard two-level rescore + ICI
    merge matches the single-device residual path."""
    from theoremsearch_tpu.core.config import MeshConfig
    from theoremsearch_tpu.core.meshes import make_mesh

    emb, q, _ = pallas_scale_corpus
    idx = IVFIndex.build(
        emb,
        config=IndexConfig(
            ivf_nlist=32, dtype="int8", ivf_assign2_margin=0.02, residual=True
        ),
        slab_rows=768,
        normalize=False,
    )
    _, ref = exact_topk(q, emb, k=10)
    mesh = make_mesh(MeshConfig(data=1, shard=4))
    fn = idx.sharded_searcher(mesh, k=10, nprobe=8, rescore_factor=8, interpret=True)
    s, i = fn(q)
    rec = recall_vs_exact(np.asarray(i), np.asarray(ref), k=10)
    assert rec >= 0.95, rec
    s1, i1 = idx.search(q, k=10, nprobe=8, rescore_factor=8,
                        use_pallas=True, interpret=True)
    rec1 = recall_vs_exact(np.asarray(i1), np.asarray(ref), k=10)
    assert abs(rec - rec1) <= 0.05, (rec, rec1)
    # scores are near-fp32 products
    exp = np.take_along_axis(q @ emb.T, np.asarray(i), 1)
    valid = np.asarray(i) >= 0
    np.testing.assert_allclose(np.asarray(s)[valid], exp[valid], atol=5e-4)


def test_engine_ivf_route_with_live_updates(pallas_scale_corpus):
    """Live adds merge into IVF-routed queries (the IVF lists don't cover
    the delta, the merge does); a delete keeps the IVF route — the engine
    over-fetches k+margin and drops tombstoned ids on host — and the
    tombstoned doc vanishes."""
    from theoremsearch_tpu.index import FlatIndex
    from theoremsearch_tpu.search import SearchEngine

    emb, q, idx = pallas_scale_corpus
    flat = FlatIndex.build(
        emb, config=IndexConfig(pad_multiple=1024, dtype="float32"),
        normalize=False,
    )
    eng = SearchEngine(
        flat, use_pallas=True, pallas_interpret=True, row_block=128,
        ivf_index=idx, ivf_nprobe=8, rescore_factor=8,
    )
    rng = np.random.default_rng(9)
    new = np.asarray(l2_normalize(rng.standard_normal((4, 128)).astype(np.float32)))
    ids = eng.add_documents(new, normalize=False)
    # B=4 <= ivf_max_batch: this is the IVF route + delta merge
    s, i = eng.search_vectors(new, k=1)
    np.testing.assert_array_equal(i[:, 0], ids)
    # tombstones do NOT disable the IVF route: the over-fetch drop keeps
    # deletes in the same approximation class as unfiltered IVF queries
    s0, i0 = eng.search_vectors(q[:1], k=1)
    victim = int(i0[0, 0])
    eng.delete_documents([victim])
    s1, i1 = eng.search_vectors(q[:1], k=10)
    assert victim not in i1[0].tolist()
    s2, i2 = eng.search_vectors(new, k=1)
    np.testing.assert_array_equal(i2[:, 0], ids)


def test_ivf_with_updates_append_and_remove(clustered_corpus):
    """Incremental fold (engine compact() path): appended rows land in
    probed homes and are findable, removed ids disappear (including
    dual-assignment copies), and base recall is preserved."""
    emb, q = clustered_corpus
    n = emb.shape[0]
    idx = IVFIndex.build(
        emb,
        config=IndexConfig(ivf_nlist=50, dtype="int8", ivf_assign2_margin=0.05),
        normalize=False,
    )
    rng = np.random.default_rng(3)
    new = np.asarray(l2_normalize(
        emb[:32] + 0.1 * rng.standard_normal((32, 64)).astype(np.float32)
    ))
    new_ids = n + np.arange(32)
    removed = np.arange(0, 200, 10)
    idx2 = idx.with_updates(add_emb=new, add_ids=new_ids, remove_ids=removed)
    assert idx2.num_rows == n - removed.size + 32
    # original index untouched (copy-on-write)
    assert (idx.slab_ids != idx2.slab_ids).any()
    s, i = idx2.search(new, k=1, nprobe=8)
    assert (i[:, 0] == new_ids).all(), "appended rows must be their own top-1"
    s, i = idx2.search(q, k=10, nprobe=50)
    assert not (np.isin(i, removed)).any(), "removed ids must never return"
    live = np.ones(n + 32, bool)
    live[removed] = False
    all_emb = np.concatenate([emb, new])
    _, ref = exact_topk(q, all_emb[live], k=10)
    ref_ids = np.nonzero(live)[0][np.asarray(ref)]
    assert recall_vs_exact(i, ref_ids, k=10) >= 0.95


def test_ivf_with_updates_spill_growth(clustered_corpus):
    """Appends beyond every slab's slack grow the spill segment (padded
    to whole chunks) and stay reachable."""
    emb, _ = clustered_corpus
    n = emb.shape[0]
    idx = IVFIndex.build(
        emb, config=IndexConfig(ivf_nlist=50, dtype="float32"), slab_rows=32,
        normalize=False,
    )
    rng = np.random.default_rng(4)
    new = np.asarray(l2_normalize(rng.standard_normal((400, 64)).astype(np.float32)))
    idx2 = idx.with_updates(add_emb=new, add_ids=n + np.arange(400))
    assert len(idx2.spill_ids) % idx2.slabs.shape[1] == 0
    s, i = idx2.search(new[:16], k=1, nprobe=50)
    assert (i[:, 0] == n + np.arange(16)).all()


def test_ivf_remap_ids(clustered_corpus):
    """compact(reclaim=True) support: ids translate through the map,
    dropped ids become PAD slack."""
    emb, q = clustered_corpus
    n = emb.shape[0]
    idx = IVFIndex.build(
        emb, config=IndexConfig(ivf_nlist=50, dtype="int8"), normalize=False
    )
    drop = np.zeros(n, bool)
    drop[::7] = True
    id_map = np.full(n, -1, np.int64)
    id_map[~drop] = np.arange(int((~drop).sum()))
    idx2 = idx.remap_ids(id_map)
    assert idx2.num_rows == int((~drop).sum())
    s, i = idx2.search(q, k=10, nprobe=50)
    kept = emb[~drop]
    _, ref = exact_topk(q, kept, k=10)
    assert recall_vs_exact(i, np.asarray(ref), k=10) >= 0.95


def test_engine_ivf_route_under_mesh(pallas_scale_corpus):
    """ONE serving surface at any scale (VERDICT r4 item 5): the engine
    accepts ivf_index + mesh, routing small unfiltered batches through
    IVFIndex.sharded_searcher while keeping filters, metadata, delta
    overlay, and deletes — results must track the single-device IVF
    engine."""
    from theoremsearch_tpu.core.config import MeshConfig
    from theoremsearch_tpu.core.meshes import make_mesh
    from theoremsearch_tpu.index import FlatIndex
    from theoremsearch_tpu.search import CorpusMetadata, SearchEngine, SearchFilters

    emb, q, idx = pallas_scale_corpus
    n = emb.shape[0]
    rows = [
        {"paper_id": f"p{i}", "paper_title": f"T{i}", "authors": [],
         "link": "https://arxiv.org/abs/x", "year": 2000 + (i % 30),
         "primary_category": "math.AG", "journal_ref": None, "citations": i,
         "theorem_name": "Theorem 1.", "theorem_body": "b", "slogan": "s"}
        for i in range(n)
    ]
    flat = FlatIndex.build(
        emb, config=IndexConfig(pad_multiple=1024, dtype="float32"),
        normalize=False,
    )
    mesh = make_mesh(MeshConfig(data=1, shard=4))

    def build(m):
        return SearchEngine(
            flat, meta=CorpusMetadata.from_rows(rows), mesh=m, use_pallas=True,
            pallas_interpret=True, row_block=128, ivf_index=idx, ivf_nprobe=8,
            rescore_factor=8,
        )

    eng_m, eng_1 = build(mesh), build(None)
    _, ref = exact_topk(q, emb, k=10)
    s_m, i_m = eng_m.search_vectors(q, k=10)
    assert recall_vs_exact(i_m, np.asarray(ref), k=10) >= 0.95
    # sharded probing sees the same lists as single-device: high overlap
    _, i_1 = eng_1.search_vectors(q, k=10)
    overlap = np.mean([
        len(set(i_m[r].tolist()) & set(i_1[r].tolist())) / 10
        for r in range(len(q))
    ])
    assert overlap >= 0.9, overlap
    # filtered queries fall back to the flat sharded masked path and
    # respect the filter
    f = SearchFilters(year_range=(2000, 2004))
    _, fi = eng_m.search_vectors(q[:2], k=5, filters=f)
    for d in fi.ravel():
        if d >= 0:
            assert 2000 + (int(d) % 30) <= 2004
    # deletes keep the (sharded) IVF route via over-fetch + host drop
    victims = [int(d) for d in i_m[0][:3]]
    for e in (eng_m, eng_1):
        assert e.delete_documents(victims) == 3
    _, i_m2 = eng_m.search_vectors(q, k=10)
    assert not (set(victims) & {int(d) for d in i_m2.ravel()})
    _, i_12 = eng_1.search_vectors(q, k=10)
    overlap2 = np.mean([
        len(set(i_m2[r].tolist()) & set(i_12[r].tolist())) / 10
        for r in range(len(q))
    ])
    assert overlap2 >= 0.9, overlap2
    # the metadata join serves the same dicts at any scale
    out = eng_m.search(q[0], SearchFilters(top_k=5))
    assert out and all("paper_title" in r and "similarity" in r for r in out)
