"""MIPS kernel correctness: fused Pallas kernel (interpret mode on CPU) and
both XLA paths must agree with the exact brute-force oracle — the
kernel-vs-reference strategy SURVEY.md §4 calls for."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theoremsearch_tpu.kernels import (
    fused_mips_topk,
    merge_topk,
    xla_mips_topk,
    xla_mips_topk_scan,
)


def _make(rng, n=2048, d=128, b=16, dtype=jnp.float32):
    corpus = jnp.asarray(rng.standard_normal((n, d)), dtype)
    queries = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    return queries, corpus


def _exact(queries, corpus, k, n_valid=None):
    s = np.asarray(queries, np.float32) @ np.asarray(corpus, np.float32).T
    if n_valid is not None:
        s[:, n_valid:] = -np.inf
    ids = np.argsort(-s, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(s, ids, axis=1), ids


def _assert_topk_match(scores, ids, ref_scores, ref_ids, atol=1e-4):
    # ids may differ under exact score ties; compare score multisets and
    # the id sets restricted to non-tied scores
    np.testing.assert_allclose(
        np.sort(scores, axis=1), np.sort(ref_scores, axis=1), atol=atol, rtol=1e-4
    )
    assert (np.asarray(scores)[:, :-1] >= np.asarray(scores)[:, 1:] - 1e-6).all(), "not sorted"


def test_xla_full_matches_oracle(rng):
    q, c = _make(rng)
    s, i = xla_mips_topk(q, c, k=10)
    rs, ri = _exact(q, c, 10)
    _assert_topk_match(s, i, rs, ri)
    np.testing.assert_array_equal(np.asarray(i), ri)


def test_xla_scan_matches_full(rng):
    q, c = _make(rng, n=4096)
    s1, i1 = xla_mips_topk(q, c, k=10)
    s2, i2 = xla_mips_topk_scan(q, c, k=10, chunk=512)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_fused_kernel_matches_oracle_f32(rng):
    q, c = _make(rng, n=2048, d=128, b=16)
    s, i = fused_mips_topk(q, c, k=10, row_block=256, interpret=True)
    rs, ri = _exact(q, c, 10)
    _assert_topk_match(s, i, rs, ri)
    np.testing.assert_array_equal(np.asarray(i), ri)


def test_fused_kernel_bf16(rng):
    q, c = _make(rng, n=1024, d=128, b=8, dtype=jnp.bfloat16)
    s, i = fused_mips_topk(q, c, k=5, row_block=256, interpret=True)
    s2, i2 = xla_mips_topk(q, c, k=5)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s2), atol=1e-2)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i2))


def test_fused_kernel_padding_mask(rng):
    # rows >= n_valid are zero padding; zero scores must never be returned
    q, c = _make(rng, n=1024, d=64, b=8)
    c = c.at[900:].set(0.0)
    s, i = fused_mips_topk(q, c, n_valid=900, k=10, row_block=256, interpret=True)
    assert (np.asarray(i) < 900).all()
    rs, ri = _exact(q, c, 10, n_valid=900)
    _assert_topk_match(s, i, rs, ri)
    np.testing.assert_array_equal(np.asarray(i), ri)


def test_fused_kernel_int8(rng):
    from theoremsearch_tpu.index.quant import quantize_int8

    q, c = _make(rng, n=1024, d=128, b=8)
    cn = np.asarray(c) / np.linalg.norm(np.asarray(c), axis=1, keepdims=True)
    codes, scales = quantize_int8(cn)
    s, i = fused_mips_topk(
        q, jnp.asarray(codes), jnp.asarray(scales), k=10, row_block=256, interpret=True
    )
    # int8 top-10 should almost exactly match exact top-10 on the dequantized corpus
    from theoremsearch_tpu.index.quant import dequantize_int8

    rs, ri = _exact(q, dequantize_int8(codes, scales), 10)
    overlap = np.mean([
        len(set(i[r].tolist()) & set(ri[r].tolist())) / 10 for r in range(i.shape[0])
    ])
    assert overlap >= 0.9


def test_fused_kernel_int8_matches_xla_int8(rng):
    from theoremsearch_tpu.index.quant import quantize_int8

    q, c = _make(rng, n=512, d=64, b=8)
    codes, scales = quantize_int8(np.asarray(c))
    codes, scales = jnp.asarray(codes), jnp.asarray(scales)
    s1, i1 = fused_mips_topk(q, codes, scales, k=7, row_block=128, interpret=True)
    s2, i2 = xla_mips_topk(q, codes, scales, k=7)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-3, rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_merge_topk(rng):
    # merging P partial top-k lists == top-k of the union
    b, p, k = 4, 3, 5
    scores = jnp.asarray(rng.standard_normal((b, p * k)), jnp.float32)
    ids = jnp.asarray(rng.permutation(p * k * b).reshape(b, p * k) % 10_000, jnp.int32)
    ms, mi = merge_topk(scores, ids, k)
    ref_sel = np.argsort(-np.asarray(scores), axis=1)[:, :k]
    np.testing.assert_allclose(
        np.asarray(ms), np.take_along_axis(np.asarray(scores), ref_sel, axis=1), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(mi), np.take_along_axis(np.asarray(ids), ref_sel, axis=1)
    )


def test_fused_kernel_k_larger_than_block_count_edge(rng):
    # k close to corpus size still exact
    q, c = _make(rng, n=256, d=64, b=8)
    s, i = fused_mips_topk(q, c, k=32, row_block=128, interpret=True)
    rs, ri = _exact(q, c, 32)
    np.testing.assert_array_equal(np.asarray(i), ri)


# ---------------------------------------------------------------------------
# Global-scale speed path (fused_mips_topk_g + device_rescore)
# ---------------------------------------------------------------------------


def _make_global(rng, n=8192, d=256, b=16):
    from theoremsearch_tpu.index.quant import quantize_global_int8

    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    codes, scale = quantize_global_int8(x)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return x, q, jnp.asarray(codes), scale


def _quantized_oracle(q, codes, scale, k, n_valid=None):
    """Exact int32 ranking of the quantized scores (what the speed kernel
    approximates), with the per-query/global scales applied."""
    from theoremsearch_tpu.kernels.mips import _quantize_queries

    q8, qs = _quantize_queries(jnp.asarray(q))
    s = np.asarray(q8, np.int64) @ np.asarray(codes, np.int64).T
    if n_valid is not None:
        s[:, n_valid:] = -(10**12)
    ids = np.argsort(-s, axis=1, kind="stable")[:, :k]
    return s, ids, np.asarray(qs)


def test_fused_g_returns_true_scores_and_valid_ids(rng):
    from theoremsearch_tpu.kernels import fused_mips_topk_g

    x, q, codes, scale = _make_global(rng)
    n_valid = x.shape[0] - 100
    s_all, ref_ids, qs = _quantized_oracle(q, codes, scale, 10, n_valid)
    s, i = fused_mips_topk_g(
        jnp.asarray(q), codes, scale, n_valid, k=10, row_block=512, interpret=True
    )
    s, i = np.asarray(s), np.asarray(i)
    valid = i >= 0
    assert (i[valid] < n_valid).all()
    # every returned score is the TRUE quantized score of the returned id
    picked = np.take_along_axis(s_all, np.maximum(i, 0), 1).astype(np.float32)
    picked = picked * scale * qs
    np.testing.assert_allclose(picked[valid], s[valid], rtol=1e-5)
    # descending
    assert (np.diff(s, axis=1) <= 1e-5).all()
    # overlap with the quantized-exact oracle (quasi-exact: lane-cell
    # collisions only; tiny config still >= 0.95)
    overlap = (i[:, :, None] == ref_ids[:, None, :]).any(1).mean()
    assert overlap >= 0.95, overlap


def test_fused_g_unpadded_static_path(rng):
    from theoremsearch_tpu.kernels import fused_mips_topk_g

    x, q, codes, scale = _make_global(rng)
    _, ref_ids, _ = _quantized_oracle(q, codes, scale, 10)
    s, i = fused_mips_topk_g(
        jnp.asarray(q), codes, scale, None, k=10, row_block=512, interpret=True
    )
    overlap = (np.asarray(i)[:, :, None] == ref_ids[:, None, :]).any(1).mean()
    assert overlap >= 0.95, overlap


def test_fused_g_rescored_pipeline_recall(rng):
    """The honest serving pipeline: retrieve-40 -> exact rescore -> top-10
    must hit the >=0.99 gate vs the fp32 exact oracle even at toy scale."""
    from theoremsearch_tpu.kernels import device_rescore, fused_mips_topk_g

    x, q, codes, scale = _make_global(rng)
    n_valid = x.shape[0] - 64
    _, i40 = fused_mips_topk_g(
        jnp.asarray(q), codes, scale, n_valid, k=40, row_block=512, interpret=True
    )
    rs, ri = device_rescore(jnp.asarray(q), i40, jnp.asarray(x), n_valid, k=10)
    _, ref = _exact(q, x, 10, n_valid)
    rec = (np.asarray(ri)[:, :, None] == ref[:, None, :]).any(1).mean()
    assert rec >= 0.99, rec
    # rescored scores are exact fp32 inner products of the returned rows
    expected = np.take_along_axis(
        np.asarray(q, np.float32) @ np.asarray(x).T, np.asarray(ri), 1
    )
    np.testing.assert_allclose(np.asarray(rs), expected, rtol=1e-4)


def test_device_rescore_int8_per_row(rng):
    """Plain per-row int8 rescore (rescore_scales arg): scores must be the
    exact fp32 products of the DEQUANTIZED rows. NOTE: one-level int8
    caps recall ~0.975 on this synthetic (8-bit reconstruction error is
    comparable to top-10 score gaps) — that is WHY the supported
    2-bytes/dim capacity mode is the two-level residual path below."""
    from theoremsearch_tpu.kernels import device_rescore, fused_mips_topk_g

    x, q, codes, scale = _make_global(rng)
    absmax = np.abs(x).max(axis=1)
    rscales = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    rcodes = np.clip(np.round(x / rscales[:, None]), -127, 127).astype(np.int8)
    n_valid = x.shape[0] - 64
    _, i40 = fused_mips_topk_g(
        jnp.asarray(q), codes, scale, n_valid, k=40, row_block=512, interpret=True
    )
    rs, ri = device_rescore(
        jnp.asarray(q), i40, jnp.asarray(rcodes), n_valid,
        jnp.asarray(rscales), k=10,
    )
    ri, rs = np.asarray(ri), np.asarray(rs)
    assert (ri >= 0).all() and (ri < n_valid).all()
    deq = rcodes.astype(np.float32) * rscales[:, None]
    expected = np.take_along_axis(q.astype(np.float32) @ deq.T, ri, 1)
    np.testing.assert_allclose(rs, expected, rtol=1e-4)
    _, ref = _exact(q, x, 10, n_valid)
    rec = (ri[:, :, None] == ref[:, None, :]).any(1).mean()
    assert rec >= 0.96, rec


def test_device_rescore_residual_capacity_mode(rng):
    """The supported 2-bytes/dim capacity pipeline: global-int8 scan ->
    TWO-LEVEL (residual) int8 rescore. Reconstruction carries ~15 bits,
    so recall must match the bf16-rescore pipeline and scores must be
    far closer to fp32 than bf16 allows."""
    from theoremsearch_tpu.index.quant import quantize_residual_int8
    from theoremsearch_tpu.kernels import (
        device_rescore,
        device_rescore_residual,
        fused_mips_topk_g,
    )

    x, q, codes, scale = _make_global(rng)
    rcodes, rscales = quantize_residual_int8(x, np.asarray(codes), scale)
    n_valid = x.shape[0] - 64
    _, i40 = fused_mips_topk_g(
        jnp.asarray(q), codes, scale, n_valid, k=40, row_block=512, interpret=True
    )
    rs, ri = device_rescore_residual(
        jnp.asarray(q), i40, codes, scale,
        jnp.asarray(rcodes), jnp.asarray(rscales), n_valid, k=10,
    )
    ri, rs = np.asarray(ri), np.asarray(rs)
    assert (ri >= 0).all() and (ri < n_valid).all()
    # scores == fp32 products of the two-level reconstruction, which is
    # within ~4e-4 of the true fp32 products at unit norm
    expected = np.take_along_axis(q.astype(np.float32) @ x.T, ri, 1)
    np.testing.assert_allclose(rs, expected, atol=5e-4)
    _, ref = _exact(q, x, 10, n_valid)
    rec = (ri[:, :, None] == ref[:, None, :]).any(1).mean()
    # same gate as the bf16-rescore pipeline test above
    assert rec >= 0.99, rec
    # and the residual reconstruction must beat one-level per-row int8
    recon = scale * np.asarray(codes)[: x.shape[0]].astype(
        np.float32
    ) + rscales[:, None] * rcodes.astype(np.float32)
    assert np.abs(recon - x).max() < 2e-4


def test_fused_g_validation():
    from theoremsearch_tpu.kernels import fused_mips_topk_g

    q = jnp.zeros((4, 128), jnp.float32)
    with pytest.raises(ValueError, match="int8"):
        fused_mips_topk_g(q, jnp.zeros((512, 128), jnp.bfloat16), 1.0, interpret=True)
    with pytest.raises(ValueError, match="multiple"):
        fused_mips_topk_g(q, jnp.zeros((500, 128), jnp.int8), 1.0, row_block=256, interpret=True)
    with pytest.raises(ValueError, match="overflow"):
        fused_mips_topk_g(
            jnp.zeros((4, 8192), jnp.float32),
            jnp.zeros((16384, 8192), jnp.int8), 1.0, row_block=4096, interpret=True,
        )


def test_device_rescore_masks_invalid(rng):
    from theoremsearch_tpu.kernels import device_rescore

    x = rng.standard_normal((64, 32)).astype(np.float32)
    q = rng.standard_normal((2, 32)).astype(np.float32)
    ids = jnp.asarray([[3, 5, -1, 63], [0, -1, -1, 10]], jnp.int32)
    s, i = device_rescore(jnp.asarray(q), ids, jnp.asarray(x), 60, k=2)
    i = np.asarray(i)
    assert (i >= 0).all()
    assert (i < 60).all()  # 63 >= n_valid must not be returned


def test_fused_g_with_filter_mask(rng):
    """Masked speed path: excluded rows never surface; the surviving
    ranking matches the exact quantized oracle restricted to the mask;
    queries with < k passing docs pad with -1/-inf."""
    from theoremsearch_tpu.kernels import device_rescore, fused_mips_topk_g

    x, q, codes, scale = _make_global(rng, n=4096, d=256, b=8)
    mask = rng.random(4096) < 0.3
    s, i = fused_mips_topk_g(
        q, codes, scale, 4096, jnp.asarray(mask), k=40, row_block=512,
        recall_target=0.99, interpret=True,
    )
    i = np.asarray(i)
    # nothing excluded leaks through
    sel = i[i >= 0]
    assert mask[sel].all()
    # rescored top-10 ~= exact oracle over the masked rows
    rs, ri = device_rescore(jnp.asarray(q), jnp.asarray(i), jnp.asarray(x), 4096, k=10)
    ref = np.where(mask[None, :], q @ x.T, -np.inf)
    ref_ids = np.argsort(-ref, axis=1)[:, :10]
    overlap = np.mean([
        len(set(np.asarray(ri)[r].tolist()) & set(ref_ids[r].tolist())) / 10
        for r in range(8)
    ])
    assert overlap >= 0.95, overlap

    # near-empty mask: only 3 docs pass -> 3 valid results, rest padded
    tiny = np.zeros(4096, bool)
    tiny[[5, 700, 3000]] = True
    s2, i2 = fused_mips_topk_g(
        q, codes, scale, 4096, jnp.asarray(tiny), k=10, row_block=512,
        recall_target=0.99, interpret=True,
    )
    i2 = np.asarray(i2)
    for r in range(8):
        real = set(i2[r][i2[r] >= 0].tolist())
        assert real == {5, 700, 3000}
    assert (np.asarray(s2)[:, 3:] == -np.inf).all()


def test_exact_topk_wide_matches_lax(rng):
    """The masked-path epilogue's two-stage exact top-k must equal a
    single wide lax.top_k — including when all top values sit in ADJACENT
    columns (the contiguous-filter case approx_max_k collapses on TPU)."""
    from theoremsearch_tpu.kernels.mips import _exact_topk_wide

    # random case, wide enough to take the segmented path (W > seg)
    cand = jnp.asarray(rng.integers(-(2**25), 2**25, (4, 8192)), jnp.int32)
    v, p = _exact_topk_wide(cand, 40)
    rv, rp = jax.lax.top_k(cand, 40)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(v), np.take_along_axis(
        np.asarray(cand), np.asarray(p), axis=1))

    # adversarial: the 40 largest values are contiguous columns inside
    # one segment
    host = np.full((2, 8192), -1000, np.int32)
    host[:, 3000:3040] = np.arange(40, dtype=np.int32)[None, :] + 5
    v2, p2 = _exact_topk_wide(jnp.asarray(host), 40)
    assert set(np.asarray(p2)[0].tolist()) == set(range(3000, 3040))
    assert np.asarray(v2)[0, 0] == 44


def test_fused_g_contiguous_range_mask(rng):
    """A contiguous doc-id filter (year_range over an id-ordered corpus)
    must surface exactly the masked range's best rows — the masked
    epilogue selects exactly, so this holds by construction even where
    approx_max_k's bin reduction would collapse adjacent survivors."""
    from theoremsearch_tpu.kernels import device_rescore, fused_mips_topk_g

    x, q, codes, scale = _make_global(rng, n=8192, d=256, b=8)
    mask = np.zeros(8192, bool)
    mask[4096:4608] = True  # one contiguous 512-row block
    s, i = fused_mips_topk_g(
        q, codes, scale, 8192, jnp.asarray(mask), k=40, row_block=512,
        interpret=True,
    )
    i = np.asarray(i)
    sel = i[i >= 0]
    assert mask[sel].all()
    rs, ri = device_rescore(jnp.asarray(q), jnp.asarray(i), jnp.asarray(x), 8192, k=10)
    ref = np.where(mask[None, :], q @ x.T, -np.inf)
    ref_ids = np.argsort(-ref, axis=1)[:, :10]
    overlap = np.mean([
        len(set(np.asarray(ri)[r].tolist()) & set(ref_ids[r].tolist())) / 10
        for r in range(8)
    ])
    assert overlap >= 0.95, overlap


def test_residual_quantize_dequantize_roundtrip(rng):
    """quantize_residual_int8 -> dequantize_residual_int8 reconstructs x
    to ~15-bit accuracy, and accepts a PAD-EXTENDED codes_g (the natural
    caller passes FlatIndex.vectors, which is padded)."""
    from theoremsearch_tpu.index.quant import (
        dequantize_residual_int8,
        quantize_global_int8,
        quantize_residual_int8,
    )

    x = rng.standard_normal((500, 64)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    cg, gs = quantize_global_int8(x)
    cg_padded = np.concatenate([cg, np.zeros((12, 64), np.int8)])
    rc, rs = quantize_residual_int8(x, cg_padded, gs)
    assert rc.shape == x.shape and rs.shape == (500,)
    recon = dequantize_residual_int8(cg, gs, rc, rs)
    assert np.abs(recon - x).max() < 2e-4
    # residual reconstruction beats one-level dequantization by >10x
    one_level = gs * cg.astype(np.float32)
    assert np.abs(recon - x).max() * 10 < np.abs(one_level - x).max()


def test_fused_g_merge_tiles_parity(rng):
    """merge_tiles accumulates M consecutive corpus tiles into one output
    block (kernels/mips.py:_mips_g_kernel) — id decode, scores, padding
    and the masked path must all match the merge=1 layout and the
    quantized-exact oracle at every M."""
    from theoremsearch_tpu.kernels import fused_mips_topk_g

    x, q, codes, scale = _make_global(rng)   # 8192 rows, rb=512 -> 16 tiles
    n_valid = x.shape[0] - 100
    _, ref_ids, _ = _quantized_oracle(q, codes, scale, 10, n_valid)
    mask = np.zeros(x.shape[0], dtype=bool)
    mask[::3] = True
    s_m, ids_m, _ = _quantized_oracle(q, codes, scale, 10, n_valid)
    s_m[:, ~mask] = -(10**12)
    ref_masked = np.argsort(-s_m, axis=1, kind="stable")[:, :10]

    base = None
    for m in (1, 2, 4):
        s, i = fused_mips_topk_g(
            jnp.asarray(q), codes, scale, n_valid, k=10, row_block=512,
            interpret=True, merge_tiles=m,
        )
        s, i = np.asarray(s), np.asarray(i)
        assert (i[i >= 0] < n_valid).all()
        overlap = (i[:, :, None] == ref_ids[:, None, :]).any(1).mean()
        assert overlap >= 0.95, (m, overlap)
        if base is None:
            base = (s, i)
        else:
            # vs merge=1: same score multisets (ids can swap on the rare
            # lane-cell collision — cells grow with M)
            np.testing.assert_allclose(
                np.sort(s, 1), np.sort(base[0], 1), rtol=1e-5
            )
        # masked path (exact epilogue) under merge
        sm, im = fused_mips_topk_g(
            jnp.asarray(q), codes, scale, n_valid, mask=jnp.asarray(mask),
            k=10, row_block=512, interpret=True, merge_tiles=m,
        )
        im = np.asarray(im)
        assert mask[im[im >= 0]].all()
        overlap = (im[:, :, None] == ref_masked[:, None, :]).any(1).mean()
        assert overlap >= 0.95, (m, overlap)


def test_fused_g_merge_tiles_auto_and_guards(rng):
    """The auto default (_auto_merge_tiles) merges ONLY when the
    post-merge selection width stays >= 8192 columns (do-no-harm: below
    that the epilogue is already cheap and at g=1 the unmerged scan is
    exact per row — compact/delete tests pin that exactness); explicit
    bad configs are rejected loudly."""
    import pytest as _pytest

    from theoremsearch_tpu.kernels import fused_mips_topk_g
    from theoremsearch_tpu.kernels.mips import _auto_merge_tiles

    # headline config: g=32, 256 tiles (1M @ rb=4096) -> M=4 (8192 wide)
    assert _auto_merge_tiles(1024, 32, 256) == 4
    # 2M: still divisible, wider -> 4
    assert _auto_merge_tiles(1024, 32, 512) == 4
    # small corpus (16 tiles @ rb=512): post-merge width < 8192 -> 1
    assert _auto_merge_tiles(256, 4, 16) == 1
    # width allows 4 but packing bound (127*127*D*G*M < 2^31) caps at 2
    assert _auto_merge_tiles(2048, 32, 512) == 2
    # tile count divisible by 2 only
    assert _auto_merge_tiles(1024, 32, 258) == 2
    # odd tile count -> 1 regardless of width
    assert _auto_merge_tiles(1024, 32, 257) == 1

    x, q, codes, scale = _make_global(rng)
    # small corpus: auto (=1) must EXACTLY match explicit merge=1
    s_auto, i_auto = fused_mips_topk_g(
        jnp.asarray(q), codes, scale, None, k=10, row_block=512, interpret=True
    )
    s1, i1 = fused_mips_topk_g(
        jnp.asarray(q), codes, scale, None, k=10, row_block=512,
        interpret=True, merge_tiles=1,
    )
    np.testing.assert_array_equal(np.asarray(i_auto), np.asarray(i1))
    # tile count not a multiple -> loud reject when explicit
    with _pytest.raises(ValueError, match="not a multiple of merge_tiles"):
        fused_mips_topk_g(
            jnp.asarray(q), codes[:512 * 5], scale, None, k=10,
            row_block=512, interpret=True, merge_tiles=4,
        )
    with _pytest.raises(ValueError, match="merge_tiles must be"):
        fused_mips_topk_g(
            jnp.asarray(q), codes, scale, None, k=10, row_block=512,
            interpret=True, merge_tiles=3,
        )


def test_fused_g_negative_scores_stay_valid(rng):
    """Regression (sentinel fix): candidates whose best available score is
    strongly NEGATIVE must not decode as invalid. The old validity test
    compared the PACKED value against a -2^25 threshold, which at larger
    group shifts silently dropped legitimate anti-correlated candidates
    (reachable under a restrictive filter); validity is now equality
    against the exact INT32_MIN sentinel."""
    from theoremsearch_tpu.kernels import fused_mips_topk_g

    d, b = 256, 4
    u = rng.standard_normal(d).astype(np.float32)
    u /= np.linalg.norm(u)
    # queries: tiny perturbations of one direction u; corpus: noisy -u
    # rows only, so EVERY available candidate has cos ~ -1
    q = u[None, :] + 0.01 * rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    x = -u[None, :] + 0.02 * rng.standard_normal((2048, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    from theoremsearch_tpu.index.quant import quantize_global_int8

    codes, scale = quantize_global_int8(x)
    for m in (1, 2, 4):
        s, i = fused_mips_topk_g(
            jnp.asarray(q), jnp.asarray(codes), scale, None, k=10,
            row_block=512, interpret=True, merge_tiles=m,
        )
        s, i = np.asarray(s), np.asarray(i)
        assert (i >= 0).all(), (m, i)          # nothing reported invalid
        assert np.isfinite(s).all(), (m, s)
        # scores really are the (negative) quantized products
        assert (s < -0.5).all(), (m, s)


def test_fused_g_grouped_per_query_masks(rng):
    """Grouped heterogeneous-filter mode: G distinct masks + per-query
    mask ids in ONE scan (the one-hot MXU select). Every returned id
    passes ITS query's mask and dominates that mask's exact quantized
    kth-best; padding rows and a merge window are exercised."""
    from theoremsearch_tpu.kernels import fused_mips_topk_g

    x, q, codes, scale = _make_global(rng, n=4096, d=256, b=16)
    n_valid = 4000
    G = 5
    masks = (rng.random((G, 4096)) < 0.4).astype(np.int8)
    masks[2] = 0
    masks[2, [7, 1234, 3999]] = 1          # tiny group
    mids = rng.integers(0, G, 16).astype(np.int32)
    s, i = fused_mips_topk_g(
        q, codes, scale, n_valid, k=10, row_block=512, interpret=True,
        gmasks=jnp.asarray(masks), mask_ids=jnp.asarray(mids),
    )
    s, i = np.asarray(s), np.asarray(i)
    ref, _, _ = _quantized_oracle(q, codes, scale, 10, n_valid=n_valid)
    for b in range(16):
        m = masks[mids[b], :n_valid].astype(bool)
        rs = np.where(m, ref[b, :n_valid], -(10**12))
        kk = min(10, int(m.sum()))
        kth = np.sort(rs)[-kk]
        valid = i[b][i[b] >= 0]
        assert len(valid) == kk
        assert m[valid].all(), f"query {b}: id fails its own mask"
        assert (rs[valid] >= kth).all(), f"query {b}: rank violation"
        # invalid slots are -inf
        assert (s[b, kk:] == -np.inf).all() if kk < 10 else True


def test_fused_g_grouped_matches_single_mask(rng):
    """A grouped scan where every query shares one signature must equal
    the single-mask path bit-for-bit (same kernel semantics)."""
    from theoremsearch_tpu.kernels import fused_mips_topk_g

    x, q, codes, scale = _make_global(rng, n=2048, d=256, b=8)
    mask = (rng.random(2048) < 0.5).astype(np.int8)
    s1, i1 = fused_mips_topk_g(
        q, codes, scale, 2048, jnp.asarray(mask), k=20, row_block=512,
        interpret=True,
    )
    gm = np.stack([mask, np.zeros_like(mask)])
    s2, i2 = fused_mips_topk_g(
        q, codes, scale, 2048, k=20, row_block=512, interpret=True,
        gmasks=jnp.asarray(gm), mask_ids=jnp.zeros(8, np.int32),
    )
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_xla_scan_grouped_bias(rng):
    """xla_mips_topk_scan bias_groups/mask_ids: per-query bias rows equal
    running the plain scan per query with its own bias."""
    from theoremsearch_tpu.kernels.mips import xla_mips_topk_scan

    queries, corpus = _make(rng, n=1024, d=64, b=6)
    G = 3
    bias_g = np.where(rng.random((G, 1024)) < 0.5, 0.0, -np.inf).astype(np.float32)
    mids = np.array([0, 1, 2, 0, 2, 1], np.int32)
    s_g, i_g = xla_mips_topk_scan(
        queries, corpus, None, 1000, None, k=8, chunk=256,
        bias_groups=jnp.asarray(bias_g), mask_ids=jnp.asarray(mids),
    )
    for b in range(6):
        s1, i1 = xla_mips_topk_scan(
            queries[b : b + 1], corpus, None, 1000,
            jnp.asarray(bias_g[mids[b]]), k=8, chunk=256,
        )
        np.testing.assert_array_equal(np.asarray(i_g)[b], np.asarray(i1)[0])
        np.testing.assert_allclose(np.asarray(s_g)[b], np.asarray(s1)[0], atol=1e-5)
