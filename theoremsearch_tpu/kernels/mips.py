"""Fused MIPS (maximum inner-product search) matmul + top-k kernels.

This is the TPU-native replacement for the reference's entire retrieval
"kernel" — the pgvector `<#>` full-table scan in Postgres
(reference: streamlit_app.py:281 `ORDER BY e.embedding <#> qvec ASC LIMIT k`,
with no ANN index ever created — rds_schema.sql has no CREATE INDEX).

Design (single chip; multi-chip fan-out lives in search/):

- The corpus matrix (N_padded, D) lives in HBM; Pallas streams row tiles
  of ``row_block`` rows into VMEM with automatic double-buffered
  pipelining (grid + BlockSpec index_map).
- Each grid step computes a (B, row_block) score tile on the MXU
  (bf16 x bf16 -> f32, or dequantized int8), masks padding/invalid rows
  to -inf, and folds the tile into a running per-query top-k held in VMEM
  scratch across grid steps.
- The merge is k static rounds of (argmax, mask) over the concatenated
  (B, k + row_block) candidate buffer — exact top-k, no sort. k is small
  (10-128), so the VPU cost is ~k/(2D) of the matmul MACs.
- Queries are batched (B rows per corpus scan) so the corpus is read once
  per B queries: HBM bandwidth amortization is what makes >=100k QPS/chip
  possible (SURVEY.md §7.4 throughput accounting).

Returned ids index the *padded corpus rows*; the caller maps them through
the index id table (FlatIndex.ids).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.shapes import round_up as _round_up

NEG_INF = float("-inf")


def _quantize_queries(queries: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-query int8 (codes, scales (B,1) f32). A positive
    per-query factor never changes that query's ranking, so int8-corpus
    search runs the MXU in native int8 x int8 -> int32 (2x bf16 peak)."""
    qf = queries.astype(jnp.float32)
    qmax = jnp.max(jnp.abs(qf), axis=1, keepdims=True)
    qscales = jnp.where(qmax > 0, qmax / 127.0, 1.0)
    q8 = jnp.clip(jnp.round(qf / qscales), -127, 127).astype(jnp.int8)
    return q8, qscales


# ---------------------------------------------------------------------------
# Exact top-k merge (shared by engine and XLA paths)
# ---------------------------------------------------------------------------


def merge_topk(
    scores_list: jax.Array, ids_list: jax.Array, k: int
) -> tuple[jax.Array, jax.Array]:
    """Merge partial top-k lists: (B, P*k) -> (B, k), exact, sorted desc.

    Used to combine per-shard results after the ICI all-gather
    (search/engine.py) and per-chunk results in the XLA scan path."""
    s, i = jax.lax.top_k(scores_list, k)
    return s, jnp.take_along_axis(ids_list, i, axis=1)


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------


def _mips_kernel(
    nvalid_ref,  # SMEM (1, 1) int32: number of real (non-padding) corpus rows
    q_ref,       # VMEM (B, D) queries (corpus dtype; int8 when corpus is int8)
    qscale_ref,  # VMEM (B, 1) f32 per-query dequant scales (ones unless int8 q)
    *refs,       # [scale_ref], [bias_ref], out_s, out_i, top_s, top_i, s_buf
    k: int,
    row_block: int,
    int8_corpus: bool = False,
    has_scales: bool = False,
    has_bias: bool = False,
):
    """Fused matmul + exact running top-k.

    The merge exploits that after the first few tiles almost no tile score
    beats the current per-query kth best: it counts threshold crossings
    (one VPU pass) and runs only that many extract-and-insert rounds
    (dynamic-trip-count fori_loop on the scalar core). Each round is an
    argmax + clear over the tile plus a k-wide sorted insert, so the
    expected merge cost per tile is ~1-2 rounds instead of k.

    The per-row scale multiply and filter-bias add are statically elided
    when absent — each would otherwise cost an extra VPU pass + a streamed
    (1, row_block) input per tile.

    Per-query dequant scales (int8 queries) multiply only at emission:
    a positive per-query factor never changes that query's ranking."""
    it = iter(refs)
    c_ref = next(it)
    scale_ref = next(it) if has_scales else None
    bias_ref = next(it) if has_bias else None
    out_s_ref, out_i_ref, top_s, top_i, s_buf = it

    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        top_s[:] = jnp.full_like(top_s, NEG_INF)
        top_i[:] = jnp.full_like(top_i, -1)

    b = q_ref.shape[0]
    if int8_corpus:
        # native int8 x int8 -> int32 on the MXU (2x bf16 peak)
        acc = jax.lax.dot_general(
            q_ref[:],
            c_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        s = acc.astype(jnp.float32)
    else:
        s = jax.lax.dot_general(
            q_ref[:],
            c_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if scale_ref is not None:
        s = s * scale_ref[0, :][None, :]
    if bias_ref is not None:
        s = s + bias_ref[0, :][None, :]
    s_buf[:] = s

    # mask padding rows — they exist only in the final tile(s), so the
    # (B, row_block) iota+compare+select pass is predicated out of the
    # steady-state tile loop
    remaining = nvalid_ref[0, 0] - i * row_block

    @pl.when(remaining < row_block)
    def _mask_padding():
        colm = jax.lax.broadcasted_iota(jnp.int32, (b, row_block), 1)
        s_buf[:] = jnp.where(
            colm < remaining, s_buf[:], NEG_INF
        )

    # count per-query threshold crossings; bound the extraction rounds
    sv0 = s_buf[:]
    thresh = top_s[:, k - 1]
    cnt = jnp.sum((sv0 > thresh[:, None]).astype(jnp.int32), axis=1)
    rounds = jnp.minimum(jnp.max(cnt), k)

    kcol = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)

    def _round(_, carry):
        sv = s_buf[:]
        col = jax.lax.broadcasted_iota(jnp.int32, (b, row_block), 1)
        m = jnp.max(sv, axis=1)
        is_max = sv == m[:, None]
        c = jnp.min(jnp.where(is_max, col, row_block), axis=1)
        gid = c + i * row_block
        # clear the extracted element
        s_buf[:] = jnp.where(
            col == c[:, None], NEG_INF, s_buf[:]
        )
        # sorted insert into (top_s, top_i); pos == k -> no-op
        ts = top_s[:]
        ti = top_i[:]
        pos = jnp.sum((ts > m[:, None]).astype(jnp.int32), axis=1)[:, None]
        ts_shift = jnp.concatenate([ts[:, :1], ts[:, :-1]], axis=1)
        ti_shift = jnp.concatenate([ti[:, :1], ti[:, :-1]], axis=1)
        top_s[:] = jnp.where(
            kcol < pos, ts, jnp.where(kcol == pos, m[:, None], ts_shift)
        )
        top_i[:] = jnp.where(
            kcol < pos, ti, jnp.where(kcol == pos, gid[:, None], ti_shift)
        )
        return carry

    jax.lax.fori_loop(0, rounds, _round, 0)

    @pl.when(i == n_tiles - 1)
    def _emit():
        out_s_ref[:] = top_s[:] * qscale_ref[:]
        out_i_ref[:] = top_i[:]


@functools.partial(jax.jit, static_argnames=("k", "row_block", "interpret"))
def fused_mips_topk(
    queries: jax.Array,
    corpus: jax.Array,
    scales: jax.Array | None = None,
    n_valid: jax.Array | int | None = None,
    bias: jax.Array | None = None,
    *,
    k: int = 10,
    row_block: int = 512,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Single-chip fused scan: top-k inner products of each query row
    against the corpus.

    queries: (B, D) float; B should be a multiple of 8 for best tiling.
    corpus:  (N_pad, D) bf16/f32 (already L2-normalized rows), or int8 codes.
    scales:  (N_pad,) f32 per-row dequant scales (int8), or None.
    n_valid: real row count; rows >= n_valid score -inf.
    bias:    (N_pad,) f32 additive per-row bias — 0 to keep, -inf to
             exclude. This is how structured filters reach the kernel
             (masked scoring keeps shapes static for XLA; SURVEY.md §7.4).

    Returns (scores (B, k) f32 desc-sorted, ids (B, k) i32 into corpus rows).
    """
    n_pad, d = corpus.shape
    b = queries.shape[0]
    if n_pad % row_block != 0:
        raise ValueError(f"corpus rows {n_pad} not a multiple of row_block {row_block}")
    if n_valid is None:
        n_valid = n_pad
    nvalid_arr = jnp.asarray(n_valid, dtype=jnp.int32).reshape(1, 1)

    int8_corpus = corpus.dtype == jnp.int8
    if int8_corpus:
        if scales is None:
            raise ValueError("int8 corpus requires scales")
        # per-query factor applied only to emitted scores (rank-invariant)
        qk, qscales = _quantize_queries(queries)
    else:
        qk = queries.astype(corpus.dtype)
        qscales = jnp.ones((b, 1), dtype=jnp.float32)

    n_tiles = n_pad // row_block

    in_specs = [
        pl.BlockSpec((b, d), lambda i, *_: (0, 0)),            # queries, resident
        pl.BlockSpec((b, 1), lambda i, *_: (0, 0)),            # query scales
        pl.BlockSpec((row_block, d), lambda i, *_: (i, 0)),    # corpus tile, streamed
    ]
    inputs = [qk, qscales, corpus]
    if scales is not None:
        in_specs.append(pl.BlockSpec((1, row_block), lambda i, *_: (0, i)))
        inputs.append(scales.reshape(1, n_pad).astype(jnp.float32))
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, row_block), lambda i, *_: (0, i)))
        inputs.append(bias.reshape(1, n_pad).astype(jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((b, k), lambda i, *_: (0, 0)),
            pl.BlockSpec((b, k), lambda i, *_: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, k), jnp.int32),
            pltpu.VMEM((b, row_block), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _mips_kernel,
        k=k,
        row_block=row_block,
        int8_corpus=int8_corpus,
        has_scales=scales is not None,
        has_bias=bias is not None,
    )

    out_s, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * d,
            bytes_accessed=n_pad * d * corpus.dtype.itemsize + b * d * 4,
            transcendentals=0,
        ),
    )(nvalid_arr, *inputs)
    return out_s, out_i


# ---------------------------------------------------------------------------
# Global-scale speed path: int32 scores end-to-end, packed lane-max merge
# ---------------------------------------------------------------------------

INT32_MIN = -(2**31) + 1
# top-k init sentinel: below any real int8xint8 score (|s| <= 127*127*D
# < 2^26 for D <= 4096) but far from int32 overflow when packed (*G)
INT32_LOW = -(2**26)


def _mips_g_kernel(
    *refs,       # [nvalid_ref], q_ref, [oneh_ref], c_ref, [mask_ref], out_ref
    row_block: int,
    has_padding: bool,
    has_mask: bool = False,
    has_gmask: bool = False,
    merge_tiles: int = 1,
):
    """Streaming packed-lane-maxima scan on a GLOBAL-scale int8 corpus —
    the speed path of the MIPS engine.

    Per grid step (corpus tile of `row_block` rows):
      1. MXU: int8 x int8 -> int32 scores (B, row_block).
      2. VPU: ONE fused traversal packs (score << log2(G) | group) and
         max-reduces the G = row_block/128 column groups down to
         per-lane maxima (B, 128), written as this tile's output block.

    That is the ENTIRE kernel. Hard-won design rules (each violation
    measured 2-16x slower on v5e):
      - scores stay int32: a single global corpus scale + per-query
        scale are rank-invariant, applied after selection — no
        astype/dequant passes in the hot loop;
      - the group reduction runs as G strided 2D (B, 128) slices with a
        CONSTANT group id per slice — a (B, G, 128) reshape relayouts
        G into sublanes and costs more than the matmul;
      - output blocks are (B, 128) lane-aligned — any (B,)-valued write
        into a lane-row forces sublane->lane transposes (~2x);
      - NO running top-k, thresholds, or data-dependent loop bounds in
        the kernel: per-tile scalar dependences stall the grid pipeline
        (the previous running-top-k design ran at 2-4x the floor).
        Selection over the (B, n_tiles*128) maxima happens once in the
        XLA epilogue (approx_max_k; exact top_k measured 40ms there).

    The packed value encodes (score, group); the candidate's position
    encodes (tile, lane) — so the epilogue recovers global row ids with
    no extra output. Packing bound: 127*127*D*G < 2^31.

    merge_tiles: max-accumulate M consecutive corpus tiles into ONE
    (B, 128) output block, packing the tile-within-group index into
    extra group bits (G_eff = M*G). The XLA epilogue's approx_max_k
    over the (B, n_tiles*128) maxima measured ~1.2 ms in-stream at
    B=1024/1M (2026-08-19, experiments/exp_epilogue.py) — proportional
    to its width, which this divides by M while keeping the fast
    row_block=4096 matmul tile (raising row_block instead measured
    SLOWER: the 32 MB int32 score tile beats VMEM). Packing bound now
    127*127*D*(M*G) < 2^31 — at D=1024, M*G <= 128, i.e. M <= 4.
    Output revisiting is the standard Mosaic accumulation pattern: the
    out block stays VMEM-resident across the M consecutive grid steps
    that share its index, written back once.

    Exactness: per (query, tile, lane-cell of G rows) only the best
    candidate survives. A true global top-k' item is lost only when a
    better item shares its cell — P ~ k'^2/(2*n_cells) per query
    (~1e-4 at k'=40, 32k cells); bounded by the recall gate and rescued
    by oversample + exact rescoring (the honest serving pipeline).
    Padding rows are masked to INT32_MIN in the final tile only; the
    whole padding path (scalar prefetch + predication) is STATICALLY
    elided when the corpus is unpadded — the predicated branches alone
    measured ~15% slower on the unpadded headline scan.
    """
    it = iter(refs)
    nvalid_ref = next(it) if has_padding else None
    q_ref = next(it)
    oneh_ref = next(it) if has_gmask else None
    c_ref = next(it)
    mask_ref = next(it) if (has_mask or has_gmask) else None
    out_ref = next(it)
    i = pl.program_id(0)
    b = q_ref.shape[0]
    g = row_block // 128
    g_eff = g * merge_tiles
    g_shift = g_eff.bit_length() - 1  # G_eff is a power of two

    acc = jax.lax.dot_general(
        q_ref[:],
        c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    if merge_tiles > 1:
        # group bits gain this tile's index within its merge window, so
        # decode stays (pos, vi & (G_eff-1)) with rb_eff = M*row_block
        grp_base = jax.lax.rem(i, merge_tiles) * g

    if has_gmask:
        # PER-QUERY filter masks (heterogeneous filtered batch):
        # mask_ref is (G, row_block) — G distinct row masks — and each
        # query selects its row through ONE one-hot (B, G) x
        # (G, row_block) int8 matmul on the MXU per tile:
        # m_full[b, c] = masks[mid[b], c]. Contraction length G (<= 32)
        # is ~G/D of the main matmul's work; doing it as a single wide
        # dot instead of per-128-column slices measured 10.66 -> 8.08 ms
        # at G=32 (B=512, 1M x 1024, MASKG_BENCH_r05.json) — G-
        # independent (G8 == G32) where 32 narrow MXU calls per tile
        # cost far more than their FLOPs. This is what lets the
        # scheduler coalesce a whole mixed-filter window into ONE scan
        # instead of per-signature micro-batches.
        m_full = jax.lax.dot_general(
            oneh_ref[:],
            mask_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    def _maxima(masked: bool, remaining=None, lane=None):
        m1 = None
        for grp in range(g):
            sl = acc[:, grp * 128 : (grp + 1) * 128] << g_shift
            if merge_tiles > 1:
                sl = sl | (grp_base + grp)
            else:
                sl = sl | grp
            if has_gmask:
                msel = m_full[:, grp * 128 : (grp + 1) * 128]
                sl = jnp.where(msel != 0, sl, INT32_MIN)
            elif mask_ref is not None:
                # filter mask: excluded rows drop below every real score
                # BEFORE the lane reduction (filtered search at speed-path
                # rates; streamed (1, row_block) int8, 0 = excluded)
                sl = jnp.where(
                    mask_ref[0, grp * 128 : (grp + 1) * 128][None, :] != 0,
                    sl, INT32_MIN,
                )
            if masked:
                sl = jnp.where(lane + grp * 128 < remaining, sl, INT32_MIN)
            m1 = sl if m1 is None else jnp.maximum(m1, sl)
        if merge_tiles == 1:
            out_ref[...] = m1
        else:
            @pl.when(jax.lax.rem(i, merge_tiles) == 0)
            def _first():
                out_ref[...] = m1

            @pl.when(jax.lax.rem(i, merge_tiles) != 0)
            def _accum():
                out_ref[...] = jnp.maximum(out_ref[...], m1)

    if not has_padding:
        _maxima(masked=False)
    else:
        remaining = nvalid_ref[0, 0] - i * row_block
        lane = jax.lax.broadcasted_iota(jnp.int32, (b, 128), 1)

        @pl.when(remaining >= row_block)
        def _full():
            _maxima(masked=False)

        @pl.when(remaining < row_block)
        def _masked():
            _maxima(masked=True, remaining=remaining, lane=lane)


def _exact_topk_wide(cand: jax.Array, k: int, seg: int = 1024):
    """Exact top-k over a wide (B, W) candidate row, two-stage.

    Stage 1 takes per-segment top-k over W//seg segments, stage 2 merges
    the segment winners. Exact: a global top-k element is beaten by fewer
    than k elements overall, hence by fewer than k within its own segment,
    so it survives stage 1. Keeping each sort narrow is markedly cheaper
    on TPU than one W-wide lax.top_k (which measured ~40 ms at W=32k,
    B=1024 on v5e). seg is near-flat in [1024, 8192] on the masked
    headline pipeline (7.03-7.19 ms at B=512/1M; EPILOGUE_SEG_r05.json);
    1024 is the measured best."""
    b, w = cand.shape
    if w <= seg:
        vi, pos = jax.lax.top_k(cand, k)
        return vi, pos.astype(jnp.int32)
    if w % seg:
        # pad to a segment multiple with a below-everything sentinel
        # (falling back to one w-wide top_k here would silently cost
        # ~40 ms/batch for any corpus whose tile count isn't a multiple
        # of seg/128); padded positions decode as invalid downstream
        pad = seg - w % seg
        cand = jnp.pad(cand, ((0, 0), (0, pad)), constant_values=INT32_MIN)
        w += pad
    s = w // seg
    k1 = min(k, seg)
    vi1, p1 = jax.lax.top_k(cand.reshape(b, s, seg), k1)        # (B, S, k1)
    base = (jnp.arange(s, dtype=jnp.int32) * seg)[None, :, None]
    p1 = p1.astype(jnp.int32) + base
    vi2, p2 = jax.lax.top_k(vi1.reshape(b, s * k1), k)
    pos = jnp.take_along_axis(p1.reshape(b, s * k1), p2, axis=1)
    return vi2, pos


def _auto_merge_tiles(d: int, g: int, n_tiles: int) -> int:
    """Default merge window for the maxima scan: the largest M in
    {4, 2, 1} such that (a) the packed (score, group) value still fits
    int32, (b) M divides the tile count (a partial window would
    under-fill its output block), and (c) the POST-merge selection
    width stays >= 8192 columns. (c) is the do-no-harm rule: below
    that width the approx_max_k epilogue is already cheap, so merging
    buys nothing while growing the lane cells (M*G rows each) — and at
    g == 1 the unmerged scan is EXACT per row, a property small-corpus
    paths (and their tests) rely on. At the 1M x 1024 headline config
    (g=32, 256 tiles) this picks M=4: 8192-wide selection, full
    pipeline 8.82 -> 8.36 ms with recall-min unchanged
    (experiments/exp_merge_tiles.py, chip A/B 2026-08-19)."""
    for m in (4, 2):
        if (
            127 * 127 * d * g * m < 2**31
            and n_tiles % m == 0
            and (n_tiles // m) * 128 >= 8192
        ):
            return m
    return 1


def fused_mips_topk_g(
    queries: jax.Array,
    codes: jax.Array,
    global_scale: jax.Array | float,
    n_valid: jax.Array | int | None = None,
    mask: jax.Array | None = None,
    *,
    k: int = 40,
    row_block: int = 4096,
    recall_target: float = 0.97,
    interpret: bool = False,
    exact_epilogue: bool | None = None,
    merge_tiles: int | None = None,
    gmasks: jax.Array | None = None,
    mask_ids: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Global-scale int8 fused scan (the speed path; see _mips_g_kernel).

    queries: (B, D) float (L2-normalized); quantized per-query int8 here.
    codes:   (N_pad, D) int8 with ONE corpus-wide scale (index/quant.py
             quantize_global_int8) — per-row-scale corpora need
             fused_mips_topk instead.
    k:       candidates to return; pair with device_rescore for the
             honest serving pipeline (retrieve-k -> exact rescore).
    recall_target: approx_max_k epilogue target (selection over the
             per-lane maxima; misses are rescued by oversampling).
    mask:    optional (N_pad,) bool/int8 filter, True/1 = doc passes —
             excluded rows drop to INT32_MIN before the lane reduction,
             so FILTERED search runs at speed-path rates (the streamed
             mask adds 1 byte/row of bandwidth).
    exact_epilogue: None (default) selects exact top-k for masked scans
             and approx_max_k otherwise; True/False overrides (the
             masked default exists because contiguous-doc-id filters put
             every survivor in adjacent columns, which approx_max_k's
             bin reduction collapses on real TPU).
    gmasks/mask_ids: PER-QUERY masks for heterogeneous filtered batches —
             gmasks (G, N_pad) int8/bool rows (1 = doc passes) and
             mask_ids (B,) int32 giving each query its row. The kernel
             selects each query's mask through a one-hot (B, G) MXU
             matmul per column slice (~G/D of the main matmul's work),
             so a window of B queries spanning G distinct filter
             signatures runs as ONE scan. G must be <= 128 and is
             cheapest as a small power of two; mutually exclusive with
             `mask`. Uses the exact epilogue (same contiguous-survivor
             argument as `mask`).
    merge_tiles: accumulate M consecutive corpus tiles per output block
             (see _mips_g_kernel), dividing the epilogue width by M.
             None (default) picks the largest M in {4, 2, 1} that the
             packing bound, the tile count, and the retrieval width
             allow — measured 8.75 -> 7.52 ms on the full headline
             pipeline at B=1024/1M (experiments/exp_merge_tiles.py);
             pass 1 to force the unmerged layout. Selection cells grow
             to M*128 rows; the cell-collision loss stays ~k'/cells per
             item, immaterial next to approx_max_k's own (1-rt) at
             k'=40, 1M rows (recall min over draws measured unchanged).

    Returns (scores (B, k) f32 desc, ids (B, k) i32 corpus rows; -1 ids
    and -inf scores for invalid slots).

    This dispatcher stays UN-jitted so `n_valid`'s padded-ness is decided
    on the python value (inside jit it is a tracer and isinstance(int)
    is always False — that silently kept the padding machinery on and
    cost ~15% on the unpadded headline scan).
    """
    n_pad, d = codes.shape
    if codes.dtype != jnp.int8:
        raise ValueError("fused_mips_topk_g requires an int8 corpus")
    if n_pad % row_block != 0:
        raise ValueError(f"corpus rows {n_pad} not a multiple of row_block {row_block}")
    g = row_block // 128
    if g & (g - 1):
        raise ValueError("row_block must be a power-of-two multiple of 128")
    if 127 * 127 * d * g >= 2**31:
        raise ValueError(f"packing overflow: D={d} too large for row_block={row_block}")
    n_tiles = n_pad // row_block
    if merge_tiles is None:
        merge_tiles = _auto_merge_tiles(d, g, n_tiles)
    elif merge_tiles not in (1, 2, 4):
        raise ValueError(f"merge_tiles must be 1, 2 or 4, got {merge_tiles}")
    elif merge_tiles > 1:
        if 127 * 127 * d * g * merge_tiles >= 2**31:
            raise ValueError(
                f"packing overflow: D={d}, row_block={row_block}, "
                f"merge_tiles={merge_tiles} exceeds int32"
            )
        if n_tiles % merge_tiles:
            raise ValueError(
                f"tile count {n_tiles} not a multiple of merge_tiles={merge_tiles}"
            )
    if n_valid is None:
        n_valid = n_pad
    has_padding = not (isinstance(n_valid, (int, np.integer)) and int(n_valid) == n_pad)
    if gmasks is not None:
        if mask is not None:
            raise ValueError("pass mask OR gmasks, not both")
        if mask_ids is None:
            raise ValueError("gmasks requires mask_ids")
        if gmasks.shape[1] != n_pad:
            raise ValueError(f"gmasks must be (G, {n_pad}), got {gmasks.shape}")
        if gmasks.shape[0] > 128:
            raise ValueError("at most 128 mask groups per scan")
        gmasks = jnp.asarray(gmasks).astype(jnp.int8)
        mask_ids = jnp.asarray(mask_ids, jnp.int32)
    if exact_epilogue is None:
        exact_epilogue = mask is not None or gmasks is not None
    if mask is not None:
        mask = jnp.asarray(mask).astype(jnp.int8).reshape(1, n_pad)
    return _fused_mips_topk_g_impl(
        queries, codes, global_scale,
        jnp.asarray(n_valid, jnp.int32), mask, gmasks, mask_ids,
        k=k, row_block=row_block, recall_target=recall_target,
        interpret=interpret, has_padding=has_padding,
        exact_epilogue=exact_epilogue, merge_tiles=merge_tiles,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "row_block", "recall_target", "interpret", "has_padding",
        "exact_epilogue", "merge_tiles",
    ),
)
def _fused_mips_topk_g_impl(
    queries: jax.Array,
    codes: jax.Array,
    global_scale: jax.Array | float,
    n_valid: jax.Array,
    mask: jax.Array | None,
    gmasks: jax.Array | None = None,
    mask_ids: jax.Array | None = None,
    *,
    k: int,
    row_block: int,
    recall_target: float,
    interpret: bool,
    has_padding: bool,
    exact_epilogue: bool = False,
    merge_tiles: int = 1,
) -> tuple[jax.Array, jax.Array]:
    n_pad, d = codes.shape
    b = queries.shape[0]
    g = row_block // 128
    g_eff = g * merge_tiles
    qk, qscales = _quantize_queries(queries)
    oneh = None
    if gmasks is not None:
        # one-hot per-query mask selector; int8 so the in-kernel select
        # rides the MXU's native int8 path
        n_groups_m = gmasks.shape[0]
        oneh = (
            mask_ids[:, None] == jnp.arange(n_groups_m, dtype=jnp.int32)[None, :]
        ).astype(jnp.int8)

    n_tiles = n_pad // row_block
    n_blocks = n_tiles // merge_tiles  # output blocks (tile merge windows)
    # VMEM high-water: int32 score tile + double-buffered corpus tiles +
    # resident queries; raise the Mosaic cap above its 16MB default when
    # the config needs it (v5e has headroom)
    need = b * row_block * 4 + 2 * row_block * d + b * d + 2 * b * 128 * 4
    if gmasks is not None:
        # the per-query mask-select tile (B, row_block) int32 + the
        # streamed (G, row_block) mask block
        need += b * row_block * 4 + 2 * gmasks.shape[0] * row_block
    params = {}
    if need > 14 * 2**20:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(int(need * 1.75), 110 * 2**20)
        )

    common = dict(
        out_shape=jax.ShapeDtypeStruct((b, n_blocks * 128), jnp.int32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * d,
            bytes_accessed=n_pad * d + b * d,
            transcendentals=0,
        ),
        **params,
    )
    has_mask = mask is not None
    has_gmask = gmasks is not None
    kernel = functools.partial(
        _mips_g_kernel, row_block=row_block, has_padding=has_padding,
        has_mask=has_mask, has_gmask=has_gmask, merge_tiles=merge_tiles,
    )
    n_gm = gmasks.shape[0] if has_gmask else 0
    pre_args = (oneh,) if has_gmask else ()
    mask_args = (mask,) if has_mask else ((gmasks,) if has_gmask else ())
    if has_padding:
        nvalid_arr = jnp.asarray(n_valid, dtype=jnp.int32).reshape(1, 1)
        in_specs = [pl.BlockSpec((b, d), lambda i, *_: (0, 0))]
        if has_gmask:
            in_specs.append(pl.BlockSpec((b, n_gm), lambda i, *_: (0, 0)))
        in_specs.append(pl.BlockSpec((row_block, d), lambda i, *_: (i, 0)))
        if has_mask:
            in_specs.append(pl.BlockSpec((1, row_block), lambda i, *_: (0, i)))
        elif has_gmask:
            in_specs.append(pl.BlockSpec((n_gm, row_block), lambda i, *_: (0, i)))
        cand = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_tiles,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec(
                    (b, 128), lambda i, *_: (0, i // merge_tiles)
                ),
            ),
            **common,
        )(nvalid_arr, qk, *pre_args, codes, *mask_args)
    else:
        in_specs = [pl.BlockSpec((b, d), lambda i: (0, 0))]
        if has_gmask:
            in_specs.append(pl.BlockSpec((b, n_gm), lambda i: (0, 0)))
        in_specs.append(pl.BlockSpec((row_block, d), lambda i: (i, 0)))
        if has_mask:
            in_specs.append(pl.BlockSpec((1, row_block), lambda i: (0, i)))
        elif has_gmask:
            in_specs.append(pl.BlockSpec((n_gm, row_block), lambda i: (0, i)))
        cand = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((b, 128), lambda i: (0, i // merge_tiles)),
            **common,
        )(qk, *pre_args, codes, *mask_args)

    # epilogue: selection over the packed maxima, then unpack ids
    k_eff = min(k, n_blocks * 128)
    if exact_epilogue:
        # EXACT selection for the masked path. approx_max_k bin-reduces
        # adjacent columns on real TPU; a contiguous-doc-id filter (e.g.
        # year_range over an id-ordered corpus) leaves all survivors in
        # adjacent columns of `cand`, which a bin reduction collapses —
        # filtered recall would silently die on chip while interpret-mode
        # CI (where approx_max_k is exact) stays green.
        vi, pos = _exact_topk_wide(cand, k_eff)
    else:
        # unfiltered: survivors land in random columns, where
        # approx_max_k's loss model holds (f32 cast rounds the low packed
        # bits — only reorders near-ties; the original int32 is
        # re-gathered for exact decode)
        _, pos = jax.lax.approx_max_k(
            cand.astype(jnp.float32), k_eff, recall_target=recall_target
        )
        pos = pos.astype(jnp.int32)
        vi = jnp.take_along_axis(cand, pos, axis=1)
        # exact re-sort of the selected k (approx_max_k order is
        # approximate and the f32 cast rounds near-ties) — (B, k) only
        vi, order = jax.lax.top_k(vi, k_eff)
        pos = jnp.take_along_axis(pos, order, axis=1)
    # pos encodes (merge window, lane); the group bits of vi encode
    # (tile-within-window, column group) — rb_eff = merge_tiles*row_block
    ids = (pos // 128) * (merge_tiles * row_block) + (vi & (g_eff - 1)) * 128 + pos % 128
    # a cell is invalid iff EVERY row in it was masked/padding — then its
    # packed value is exactly INT32_MIN (also _exact_topk_wide's pad).
    # The packing guard (127*127*D*G_eff < 2^31) keeps every legitimate
    # packed value strictly above it, so equality is the precise test; a
    # threshold on the packed value is NOT (at g_shift=7 a threshold of
    # -2^25 would drop legitimate candidates below cos ~ -0.26 — reachable
    # under a restrictive filter whose few surviving docs anti-correlate
    # with the query).
    valid = vi != INT32_MIN
    g_shift = g_eff.bit_length() - 1
    scores = jnp.where(
        valid,
        jax.lax.shift_right_arithmetic(vi, g_shift).astype(jnp.float32)
        * jnp.asarray(global_scale, jnp.float32)
        * qscales,
        NEG_INF,
    )
    ids = jnp.where(valid, ids, -1)
    if k_eff < k:  # tiny corpora: pad out to the requested k
        pad = k - k_eff
        scores = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=NEG_INF)
        ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
    return scores, ids


def _ivf_scores_kernel(
    uids_ref,   # scalar prefetch (P,) int32: unique probed chunk indices
    q_ref,      # VMEM (B, D) int8 queries
    slab_ref,   # VMEM (1, R, D) int8 — chunk uids[i], DMA'd via index_map
    out_ref,    # (B, R) int32 raw scores for this chunk
):
    """Probe-major IVF scan step: score the whole batch against ONE chunk.

    The scalar-prefetched chunk index drives the slab DMA through the
    BlockSpec index_map, so each UNIQUE probed chunk is fetched from HBM
    exactly once for the whole query batch — the gather the XLA path
    materializes as (B, nprobe, R, D) (which LOSES to brute force, 21ms
    vs 3ms at B=8) becomes (P_unique, R, D) streaming reads.

    Unlike the flat scan's lane-maxima reduction, IVF emits RAW int32
    scores: the candidate matrix is only (B, P*R) at small serving
    batches, and clustered corpora concentrate the true top-k inside one
    hot chunk where any per-lane reduction measurably loses recall."""
    del uids_ref  # consumed by the index_map
    out_ref[...] = jax.lax.dot_general(
        q_ref[:],
        slab_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def ivf_probe_scores(
    queries: jax.Array,
    slabs: jax.Array,
    uids: jax.Array,
    *,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Scan the unique probed chunks: (B, P*R) raw int32 scores + qscales.

    queries: (B, D) f32; slabs: (C, R, D) int8 GLOBAL-scale codes;
    uids: (P,) int32 chunk indices (duplicates/fills should point at an
    empty all-padding chunk). R must be a multiple of 128.
    """
    b, d = queries.shape
    c_total, r, d2 = slabs.shape
    assert d == d2
    if r % 128:
        raise ValueError("slab_rows must be a multiple of 128")
    qk, qscales = _quantize_queries(queries)
    p = uids.shape[0]
    need = 2 * b * r * 4 + 2 * r * d + b * d
    params = {}
    if need > 14 * 2**20:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(int(need * 1.75), 110 * 2**20)
        )
    cand = pl.pallas_call(
        _ivf_scores_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(p,),
            in_specs=[
                pl.BlockSpec((b, d), lambda i, uids: (0, 0)),
                pl.BlockSpec((1, r, d), lambda i, uids: (uids[i], 0, 0)),
            ],
            out_specs=pl.BlockSpec((b, r), lambda i, uids: (0, i)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, p * r), jnp.int32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * p * r * d,
            bytes_accessed=p * r * d + b * d,
            transcendentals=0,
        ),
        **params,
    )(jnp.asarray(uids, jnp.int32), qk, slabs)
    return cand, qscales


@functools.partial(jax.jit, static_argnames=("k",))
def device_rescore(
    queries: jax.Array,
    cand_ids: jax.Array,
    rescore_corpus: jax.Array,
    n_valid: jax.Array | int | None = None,
    rescore_scales: jax.Array | None = None,
    *,
    k: int = 10,
) -> tuple[jax.Array, jax.Array]:
    """Exact on-device rescoring of oversampled candidates.

    Gathers the bf16/f32 originals for each (query, candidate), recomputes
    inner products with f32 accumulation, and re-ranks — the second half
    of the honest serving pipeline (fused retrieve-k' -> rescore -> top-k).

    queries: (B, D) f32; cand_ids: (B, C) i32 rows into rescore_corpus;
    rescore_corpus: (N, D) bf16/f32 — or int8 per-row codes with
    rescore_scales (N,) f32, the 2-bytes/dim capacity mode (codes for
    the scan + codes for the rescore; no bf16 copy), which stretches one
    chip's HBM to ~6M rows at D=1024. Returns (scores (B,k) f32,
    ids (B,k)).
    """
    n = rescore_corpus.shape[0]
    # ascending ids improve the scattered-row gather's DRAM locality
    # (measured 2.12 -> 1.85 ms for the 40960x2KB gather on v5e,
    # experiments/exp_gather.py); rescoring re-ranks, so candidate
    # order is free
    cand_ids = jnp.sort(cand_ids, axis=1)
    safe = jnp.clip(cand_ids, 0, n - 1)
    cand = jnp.take(rescore_corpus, safe, axis=0)              # (B, C, D)
    prec = None
    if rescore_scales is not None:
        # dequantize the gathered per-row int8 rows in f32 (tiny: B*C*D)
        cs = jnp.take(rescore_scales, safe, axis=0)            # (B, C)
        cand = cand.astype(jnp.float32) * cs[..., None]
        # keep the dequantized f32 rows at full precision (TPU default
        # would truncate the operands back to bf16)
        prec = jax.lax.Precision.HIGHEST
    s = jax.lax.dot_general(
        cand,
        queries.astype(cand.dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec,
    )                                                          # (B, C)
    valid = cand_ids >= 0
    if n_valid is not None:
        valid &= cand_ids < jnp.asarray(n_valid, jnp.int32)
    s = jnp.where(valid, s, NEG_INF)
    top_s, sel = jax.lax.top_k(s, k)
    top_i = jnp.take_along_axis(cand_ids, sel, axis=1)
    return top_s, jnp.where(jnp.isfinite(top_s), top_i, -1)


@functools.partial(jax.jit, static_argnames=("k",))
def device_rescore_residual(
    queries: jax.Array,
    cand_ids: jax.Array,
    codes_g: jax.Array,
    gscale: jax.Array | float,
    res_codes: jax.Array,
    res_scales: jax.Array,
    n_valid: jax.Array | int | None = None,
    *,
    k: int = 10,
) -> tuple[jax.Array, jax.Array]:
    """Exact rescoring from TWO-LEVEL int8 codes — the 2-bytes/dim index.

    Reconstructs each candidate row as gscale*cg + s_r*cr where cg are the
    global-scale scan codes (already device-resident for the maxima scan)
    and cr/s_r are per-row int8 codes of the RESIDUAL x - gscale*cg
    (quantize_residual_int8). The residual lies within half a coarse step,
    so its quantizer step is ~gscale/254: reconstruction carries ~15
    effective bits — ~50x less error than the bf16 rescore copy at unit
    norm — while the rescore gather moves the same 2 bytes/dim/row the
    bf16 copy did. Net: equal-or-better recall, equal rescore cost, and
    2 bytes/dim total instead of 3 (~6M rows/chip at D=1024 on v5e).

    queries (B,D) f32; cand_ids (B,C) i32 rows; codes_g (>=N,D) int8
    (may be pad-extended); res_codes (N,D) int8; res_scales (N,) f32.
    """
    n = res_codes.shape[0]
    # ascending ids improve gather DRAM locality (see device_rescore)
    cand_ids = jnp.sort(cand_ids, axis=1)
    safe = jnp.clip(cand_ids, 0, n - 1)
    cg = jnp.take(codes_g, safe, axis=0).astype(jnp.float32)    # (B, C, D)
    cr = jnp.take(res_codes, safe, axis=0).astype(jnp.float32)  # (B, C, D)
    sr = jnp.take(res_scales, safe, axis=0)                     # (B, C)
    cand = jnp.asarray(gscale, jnp.float32) * cg + sr[..., None] * cr
    # HIGHEST precision: TPU fp32 matmuls default to bf16-truncated
    # operands, which would round the 15-bit reconstruction back to 8
    # bits and forfeit the accuracy this mode exists for (measured:
    # default precision ranked WORSE than the bf16 copy on chip). The
    # rescore matmul is (B, C, D) — tiny next to the scan — so the
    # multi-pass fp32 emulation costs ~nothing.
    s = jax.lax.dot_general(
        cand,
        queries.astype(jnp.float32),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                           # (B, C)
    valid = cand_ids >= 0
    if n_valid is not None:
        valid &= cand_ids < jnp.asarray(n_valid, jnp.int32)
    s = jnp.where(valid, s, NEG_INF)
    top_s, sel = jax.lax.top_k(s, k)
    top_i = jnp.take_along_axis(cand_ids, sel, axis=1)
    return top_s, jnp.where(jnp.isfinite(top_s), top_i, -1)


# ---------------------------------------------------------------------------
# XLA paths (reference for correctness; also the CPU-mesh fallback)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k",))
def xla_mips_topk(
    queries: jax.Array,
    corpus: jax.Array,
    scales: jax.Array | None = None,
    n_valid: jax.Array | int | None = None,
    bias: jax.Array | None = None,
    *,
    k: int = 10,
) -> tuple[jax.Array, jax.Array]:
    """Materialize the full (B, N) score matrix, then lax.top_k.

    Exact; memory O(B*N) — the small-corpus / testing path, numerically
    the twin of the fused kernel (same dtypes, masking, bias, and int8
    query quantization)."""
    n_pad = corpus.shape[0]
    if corpus.dtype == jnp.int8:
        q, qscales = _quantize_queries(queries)
        acc = jax.lax.dot_general(
            q, corpus, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        s = acc.astype(jnp.float32) * qscales
    else:
        q = queries.astype(corpus.dtype)
        s = jax.lax.dot_general(
            q, corpus, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if scales is not None:
        s = s * scales[None, :].astype(jnp.float32)
    if bias is not None:
        s = s + bias[None, :].astype(jnp.float32)
    if n_valid is not None:
        ids = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
        s = jnp.where(ids < jnp.asarray(n_valid, jnp.int32), s, NEG_INF)
    scores, ids = jax.lax.top_k(s, k)
    return scores, ids.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def xla_mips_topk_scan(
    queries: jax.Array,
    corpus: jax.Array,
    scales: jax.Array | None = None,
    n_valid: jax.Array | int | None = None,
    bias: jax.Array | None = None,
    *,
    k: int = 10,
    chunk: int = 65536,
    bias_groups: jax.Array | None = None,
    mask_ids: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """lax.scan over corpus chunks with a running top-k carry.

    Exact with O(B*chunk) live memory — the XLA analogue of the fused
    kernel, used when Pallas is unavailable and for large corpora on CPU.

    bias_groups/mask_ids: PER-QUERY additive biases for heterogeneous
    filtered batches — bias_groups (G, N_pad) f32 rows (0 keep / -inf
    exclude) and mask_ids (B,) selecting each query's row; the per-query
    bias is gathered per chunk ((B, chunk) live memory), never
    materialized (B, N)."""
    n_pad, d = corpus.shape
    b = queries.shape[0]
    if n_pad % chunk != 0:
        raise ValueError(f"corpus rows {n_pad} not a multiple of chunk {chunk}")
    int8_corpus = corpus.dtype == jnp.int8
    if int8_corpus:
        q, qscales = _quantize_queries(queries)
    else:
        q = queries.astype(corpus.dtype)
        qscales = None
    n_valid = jnp.asarray(n_pad if n_valid is None else n_valid, jnp.int32)

    n_chunks = n_pad // chunk
    corpus_t = corpus.reshape(n_chunks, chunk, d)
    scales_t = scales.reshape(n_chunks, chunk) if scales is not None else None
    bias_t = bias.reshape(n_chunks, chunk) if bias is not None else None
    biasg_t = (
        bias_groups.reshape(bias_groups.shape[0], n_chunks, chunk)
        .transpose(1, 0, 2)
        if bias_groups is not None
        else None
    )

    def step(carry, xs):
        top_s, top_i = carry
        c_chunk, sc, bs, bg, start = xs
        if int8_corpus:
            acc = jax.lax.dot_general(
                q, c_chunk, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            s = acc.astype(jnp.float32) * qscales
        else:
            s = jax.lax.dot_general(
                q, c_chunk, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if sc is not None:
            s = s * sc[None, :].astype(jnp.float32)
        if bs is not None:
            s = s + bs[None, :].astype(jnp.float32)
        if bg is not None:
            s = s + jnp.take(bg, mask_ids, axis=0)   # (B, chunk)
        gids = jax.lax.broadcasted_iota(jnp.int32, (b, chunk), 1) + start
        s = jnp.where(gids < n_valid, s, NEG_INF)
        cand_s = jnp.concatenate([top_s, s], axis=1)
        cand_i = jnp.concatenate([top_i, gids], axis=1)
        new_s, sel = jax.lax.top_k(cand_s, k)
        new_i = jnp.take_along_axis(cand_i, sel, axis=1)
        return (new_s, new_i), None

    init = (
        jnp.full((b, k), NEG_INF, jnp.float32),
        jnp.full((b, k), -1, jnp.int32),
    )
    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    xs = (corpus_t, scales_t, bias_t, biasg_t, starts)
    (top_s, top_i), _ = jax.lax.scan(step, init, xs)
    return top_s, top_i
