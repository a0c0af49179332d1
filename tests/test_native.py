"""Native host runtime: builds with the local toolchain and matches the
numpy reference implementations bit-for-bit where exactness is expected."""

import numpy as np
import pytest

from theoremsearch_tpu.utils import native


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native library unavailable (no toolchain)")


def test_native_builds_and_loads():
    assert native.available()


def test_quantize_matches_numpy(rng):
    x = rng.standard_normal((257, 96)).astype(np.float32)
    x[13] = 0.0  # all-zero row edge case
    c1, s1 = native.quantize_int8(x)
    absmax = np.abs(x).max(axis=-1)
    s2 = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    c2 = np.clip(np.rint(x / s2[:, None]), -127, 127).astype(np.int8)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(c1, c2)


def test_l2_normalize(rng):
    x = rng.standard_normal((64, 32)).astype(np.float32)
    x[7] = 0.0
    out = native.l2_normalize_(x.copy())
    norms = np.linalg.norm(out, axis=1)
    np.testing.assert_allclose(norms[np.arange(64) != 7], 1.0, rtol=1e-5)
    assert norms[7] == 0.0


def test_merge_topk_matches_numpy(rng):
    scores = rng.standard_normal((33, 47)).astype(np.float32)
    ids = rng.integers(0, 10_000, (33, 47)).astype(np.int32)
    s1, i1 = native.merge_topk(scores, ids, 10)
    sel = np.argsort(-scores, axis=1, kind="stable")[:, :10]
    np.testing.assert_array_equal(s1, np.take_along_axis(scores, sel, 1))
    np.testing.assert_array_equal(i1, np.take_along_axis(ids, sel, 1))
    # k > C pads with -inf / -1
    s2, i2 = native.merge_topk(scores[:, :4], ids[:, :4], 6)
    assert np.isneginf(s2[:, 4:]).all() and (i2[:, 4:] == -1).all()


def test_strip_comments():
    src = "keep this % drop this\nline two 50\\% kept % gone"
    out = native.strip_comments(src)
    assert "drop this" not in out and "gone" not in out
    assert "50\\% kept" in out and "line two" in out


def test_quantize_global_int8_native_and_fallback():
    """Global-scale quantizer: native path matches the chunked numpy
    fallback (and both match a direct reference) within the +-1 code a
    rounding-boundary multiply-vs-divide can produce."""
    import numpy as np

    from theoremsearch_tpu.utils import native

    rng = np.random.default_rng(3)
    x = rng.standard_normal((1000, 64)).astype(np.float32)
    amax = float(np.abs(x).max())
    ref_scale = amax / 127.0
    ref = np.clip(np.round(x / ref_scale), -127, 127).astype(np.int16)

    codes, scale = native.quantize_global_int8(x)
    assert abs(scale - ref_scale) < 1e-9
    assert int(np.abs(codes.astype(np.int16) - ref).max()) <= 1

    # explicit-scale variant (percentile clipping path)
    codes2, scale2 = native.quantize_global_int8(x, scale=ref_scale * 2)
    assert scale2 == ref_scale * 2
    assert int(np.abs(codes2).max()) <= 64


def test_quantize_global_int8_empty_input():
    """Empty (0, D) input: ts_absmax used to compute chunk = 0 and die on
    integer division-by-zero (SIGFPE kills the process, not catchable) —
    regression for the n<=0 early return."""
    import numpy as np

    from theoremsearch_tpu.utils import native

    codes, scale = native.quantize_global_int8(np.zeros((0, 64), np.float32))
    assert codes.shape == (0, 64) and scale == 1.0
