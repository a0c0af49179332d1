"""Embedder-comparison harness + PCA visualization tests."""

import numpy as np

from theoremsearch_tpu.eval.experiments import (
    best_embedder,
    compare_embedders,
    pca_project,
    plot_category_clusters,
    stratified_reservoir,
)


def _bow(dim):
    def enc(texts):
        out = np.zeros((len(texts), dim), np.float32)
        for i, t in enumerate(texts):
            for tok in t.lower().split():
                out[i, hash(tok) % dim] += 1.0
        n = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.maximum(n, 1e-9)
    return enc


def _random_enc(dim, seed=0):
    state = {"rng": np.random.default_rng(seed)}

    def enc(texts):
        # content-independent and different on every call: the worst
        # possible retriever (same-seed-per-call would make query i equal
        # doc i and accidentally retrieve perfectly)
        out = state["rng"].standard_normal((len(texts), dim)).astype(np.float32)
        return out / np.linalg.norm(out, axis=1, keepdims=True)
    return enc


def test_compare_embedders_ranks_better_encoder_first(validation_csv):
    results = compare_embedders(
        {"bow-512": _bow(512), "random": _random_enc(512)}, validation_csv
    )
    assert [r.name for r in results][0] == "bow-512"
    assert best_embedder(results) == "bow-512"
    assert results[0].metrics["H@5"] > results[1].metrics["H@5"]


def test_compare_all_three_model_families(validation_csv):
    """The reference's model-selection workflow compares three embedders
    (zbMath BERT / qwen / gemma, compare_embeddings.py:429-470). All
    three JAX towers run through the same harness end to end."""
    import jax

    from theoremsearch_tpu.core.config import (
        BertEncoderConfig,
        EncoderConfig,
        GemmaEncoderConfig,
    )
    from theoremsearch_tpu.encoder import bert, gemma, model
    from theoremsearch_tpu.encoder.batching import BatchedEncoder

    encoders = {}
    for name, (cfgcls, mod) in {
        "qwen": (EncoderConfig, model),
        "gemma": (GemmaEncoderConfig, gemma),
        "bert": (BertEncoderConfig, bert),
    }.items():
        cfg = cfgcls.tiny()
        params = mod.init_params(cfg, jax.random.PRNGKey(0))
        encoders[name] = BatchedEncoder(params, cfg, batch_size=16).encode
    results = compare_embedders(encoders, validation_csv)
    assert {r.name for r in results} == {"qwen", "gemma", "bert"}
    for r in results:
        assert r.metrics["num_queries"] > 0
        assert all(np.isfinite(v) for v in r.metrics.values())


def test_stratified_reservoir_bounds_and_coverage():
    stream = [(f"cat{i % 5}", i) for i in range(10_000)]
    res = stratified_reservoir(stream, per_stratum=50, seed=1)
    assert set(res) == {f"cat{i}" for i in range(5)}
    for cat, docs in res.items():
        assert len(docs) == 50
        assert all(f"cat{d % 5}" == cat for d in docs)
    # small stratum keeps everything
    res2 = stratified_reservoir([("x", 1), ("x", 2)], per_stratum=50)
    assert sorted(res2["x"]) == [1, 2]


def test_pca_project_shapes(rng):
    x = rng.standard_normal((300, 64)).astype(np.float32)
    p = pca_project(x, n_components=2)
    assert p.shape == (300, 2)
    # first component captures more variance than second
    assert p[:, 0].var() >= p[:, 1].var()


def test_plot_category_clusters(tmp_path, rng):
    emb = rng.standard_normal((400, 32)).astype(np.float32)
    cats = [f"math.{c}" for c in "ABCD" for _ in range(100)]
    out = plot_category_clusters(emb, cats, tmp_path / "pca.png", per_stratum=40)
    assert out.exists() and out.stat().st_size > 1000


def test_compare_embedders_cli(capsys):
    """CLI wrapper prints the metric table and a best-embedder line."""
    import sys
    from unittest import mock

    from theoremsearch_tpu.cli import main

    argv = ["prog", "compare-embedders", "--families", "qwen", "bert"]
    with mock.patch.object(sys, "argv", argv):
        main()
    out = capsys.readouterr().out
    lines = [l for l in out.strip().splitlines() if l]
    assert lines[0].startswith("embedder\t")
    assert {l.split("\t")[0] for l in lines[1:-1]} == {"qwen", "bert"}
    assert lines[-1].startswith("best (by H@k):")


def test_compare_embedders_role_pairs(validation_csv):
    """(query_encode, doc_encode) pair values: documents must be encoded
    by the doc encoder, not the query one."""
    calls = {"q": 0, "d": 0}

    def q_enc(texts):
        calls["q"] += 1
        return _bow(64)(texts)

    def d_enc(texts):
        calls["d"] += 1
        return _bow(64)(texts)

    results = compare_embedders({"paired": (q_enc, d_enc)}, validation_csv)
    assert calls["q"] == 1 and calls["d"] == 1
    assert results[0].name == "paired"
