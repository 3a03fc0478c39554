"""Stencil (neighbourhood) operators via halo-exchange joins: blur, sobel, dilate,
extrapolate (nearest-neighbour NaN fill).

Spark has no stencil concept; the engine builds one: each tile needs a ring of
``h`` boundary cells from its ≤8 neighbours, so ``with_halo`` turns the tile table
into (target_tile ← neighbour strips) messages — **strips, not whole tiles**: the
shuffle carries O(h·T) cells per neighbour edge instead of O(T²). Strip slicing is
pure JVM (sequence/slice/flatten higher-order functions); only the per-tile padded
assembly + numpy kernel crosses the Arrow boundary.

Numerics are replicated from the reference's scipy/skimage backends (none of which
exist here):

- blur   ≡ scipy.ndimage.gaussian_filter(sigma, truncate=4.0, mode='reflect')
           (reference src/rastr/raster.py:1185-1221)
- sobel  ≡ skimage.filters.sobel: sqrt(2·(h²+v²)) with smooth [1,2,1]/4 ⊗ deriv
           [1,0,-1]/2 kernels, reflect border, / cell_size
           (reference src/rastr/raster.py:1164-1183; golden test_raster.py:1878-1906)
- dilate ≡ skimage.morphology.dilation with disk(ceil(r/cell)) footprint, padded
           with (global min − 1), NaN filled then restored
           (reference src/rastr/raster.py:1223-1288)
- extrapolate ≡ scipy NearestNDInterpolator on array indices, Euclidean distance,
           ties → lowest (row, col) (reference src/rastr/arr/fill.py:11-32).
           Influence radius is unbounded → a cheap h=8 sweep proves/fills the
           typical case, then a per-tile DONOR SUMMARY (one representative donor
           per tile, computed JVM-side in a single pass) gives every remaining
           NaN tile a proven-sufficient exact radius, and ONE targeted round at
           per-tile radius finishes. A cell is filled only when its nearest
           donor is *proven* within the window (min distance ≤ h ⇒ no unseen
           donor can be nearer, and every tied donor is inside the window) —
           exact for any donor layout.
"""

from __future__ import annotations

import math
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..meta import RasterMeta
from ..tiles import RasterFrame, denull, tile_dims_cols

HALO_MSG_SCHEMA = T.StructType(
    [
        T.StructField("tile_row", T.IntegerType(), False),
        T.StructField("tile_col", T.IntegerType(), False),
        T.StructField("gr0", T.IntegerType(), False),
        T.StructField("gc0", T.IntegerType(), False),
        T.StructField("n_rows", T.IntegerType(), False),
        T.StructField("n_cols", T.IntegerType(), False),
        T.StructField("strip", T.ArrayType(T.DoubleType()), False),
        T.StructField("h", T.IntegerType(), False),
    ]
)


def halo_messages(rf: RasterFrame, h: int) -> DataFrame:
    """Strip messages: every tile sends each target the band of its own array that
    falls inside the target's (th+2h)×(tw+2h) halo window.

    Generalized to halos larger than a tile: the offset ring spans ±⌈h/T⌉ tiles,
    so a blur with σ·4 > T still works (inner-ring offsets ship whole tiles,
    boundary offsets ship strips). All slicing is JVM columnar; message =
    (target tile, global strip origin, dims, row-major strip values).

    Per offset (dr, dc), the source-local row slice is the intersection of the
    source tile [0, th) with the target window [dr·T − h, dr·T + tth + h):
    lo = max(0, dr·T − h) is a constant, hi = min(th, dr·T + tth + h) is a column.
    """
    meta = rf.meta
    Tsz = meta.tile_size
    ntr, ntc = meta.n_tile_rows, meta.n_tile_cols
    R = max(1, math.ceil(h / Tsz))
    th, tw = tile_dims_cols(meta)
    df = rf.df.select("tile_row", "tile_col", th.alias("th"), tw.alias("tw"), "values")

    msgs = []
    for dr in range(-R, R + 1):
        for dc in range(-R, R + 1):
            if dr == 0 and dc == 0:
                # the centre message always covers the whole tile (r_lo=0,
                # r_hi=th, c_lo=0, c_hi=tw for the self offset) — pass the
                # values array through instead of reconstructing it
                # element-by-element with interpreted slice/flatten (one
                # per-cell HOF eval per cell of the raster per stencil call)
                msgs.append(
                    F.struct(
                        F.col("tile_row").cast("int").alias("tile_row"),
                        F.col("tile_col").cast("int").alias("tile_col"),
                        (F.col("tile_row") * Tsz).cast("int").alias("gr0"),
                        (F.col("tile_col") * Tsz).cast("int").alias("gc0"),
                        F.col("th").cast("int").alias("n_rows"),
                        F.col("tw").cast("int").alias("n_cols"),
                        F.col("values").alias("strip"),
                        F.lit(int(h)).cast("int").alias("h"),
                    )
                )
                continue
            ttr = F.col("tile_row") + dr
            ttc = F.col("tile_col") + dc
            tth = F.least(F.lit(Tsz), F.lit(meta.height) - ttr * Tsz)
            ttw = F.least(F.lit(Tsz), F.lit(meta.width) - ttc * Tsz)
            r_lo = F.lit(max(0, dr * Tsz - h))
            r_hi = F.least(F.col("th"), F.lit(dr * Tsz + h) + tth)
            c_lo = F.lit(max(0, dc * Tsz - h))
            c_hi = F.least(F.col("tw"), F.lit(dc * Tsz + h) + ttw)
            n_rows = r_hi - r_lo
            n_cols = c_hi - c_lo
            tw_col = F.col("tw")

            def _strip(r_lo=r_lo, r_hi=r_hi, c_lo=c_lo, n_cols=n_cols, tw_col=tw_col):
                return F.flatten(
                    F.transform(
                        F.sequence(r_lo, r_hi - 1),
                        lambda r: F.slice(F.col("values"), r * tw_col + c_lo + 1, n_cols),
                    )
                )

            msgs.append(
                F.struct(
                    ttr.cast("int").alias("tile_row"),
                    ttc.cast("int").alias("tile_col"),
                    (F.col("tile_row") * Tsz + r_lo).cast("int").alias("gr0"),
                    (F.col("tile_col") * Tsz + c_lo).cast("int").alias("gc0"),
                    n_rows.cast("int").alias("n_rows"),
                    n_cols.cast("int").alias("n_cols"),
                    F.when(
                        (n_rows > 0) & (n_cols > 0) & (ttr >= 0) & (ttr < ntr) & (ttc >= 0) & (ttc < ntc),
                        _strip(),
                    )
                    .otherwise(F.lit(None))
                    .alias("strip"),
                    F.lit(int(h)).cast("int").alias("h"),
                )
            )
    exploded = df.select(F.explode(F.array(*msgs)).alias("m")).select("m.*").filter(
        F.col("strip").isNotNull()
    )
    return exploded


def halo_messages_targeted(rf: RasterFrame, h: int | None, targets: DataFrame) -> DataFrame:
    """Strip messages for a RESTRICTED target-tile set — the scale path for
    wide-radius extrapolate rounds, where only a few NaN-remaining tiles need
    a (very wide) halo but every tile is a potential donor.

    The ring-offset builder (:func:`halo_messages`) enumerates (2R+1)² offsets
    per SOURCE tile — O(n_tiles · R²) generated rows regardless of how few
    targets survive a downstream filter, which explodes at R ≈ n_tile_rows
    (the full-radius round: every tile × every offset). Here the message set
    is built as sources ⋈ broadcast(targets) filtered to the Chebyshev ring —
    O(n_tiles · n_targets) rows — with the SAME strip-slice arithmetic, dr/dc
    as columns instead of literals. Identical messages, different generator.

    ``targets`` may carry a per-tile integer ``h`` column (the exact-radius
    extrapolate round — each tile gathers only the window its own proven
    donor distance needs); the scalar ``h`` is then ignored (pass ``None``).
    """
    meta = rf.meta
    Tsz = meta.tile_size
    th, tw = tile_dims_cols(meta)
    # source tile coords renamed: the output select aliases ttr/ttc BACK to
    # tile_row/tile_col, and column references captured inside the strip
    # lambda resolve against the PROJECTED schema (higher-order-function
    # binding) — reusing the names would silently flip dr/dc to 0 there
    # (found by the ring-vs-targeted message-equality test)
    src = rf.df.select(
        F.col("tile_row").alias("s_tr"), F.col("tile_col").alias("s_tc"),
        th.alias("th"), tw.alias("tw"), "values",
    )
    if "h" in targets.columns:
        tgt_sel = targets.select(
            F.col("tile_row").alias("ttr"), F.col("tile_col").alias("ttc"),
            F.col("h").cast("int").alias("t_h"),
        )
    else:
        tgt_sel = targets.select(
            F.col("tile_row").alias("ttr"), F.col("tile_col").alias("ttc")
        ).distinct().withColumn("t_h", F.lit(int(h)))
    tgt = F.broadcast(tgt_sel)
    h_c = F.col("t_h")
    # per-row Chebyshev tile ring: R = max(1, ceil(h / T)) — same prefilter the
    # scalar builder applies as a literal
    R_c = F.greatest(F.lit(1), F.ceil(h_c / F.lit(float(Tsz)))).cast("int")
    pairs = src.join(
        tgt,
        (F.abs(F.col("ttr") - F.col("s_tr")) <= R_c)
        & (F.abs(F.col("ttc") - F.col("s_tc")) <= R_c),
    )
    drc = F.col("ttr") - F.col("s_tr")
    dcc = F.col("ttc") - F.col("s_tc")
    tth = F.least(F.lit(Tsz), F.lit(meta.height) - F.col("ttr") * Tsz)
    ttw = F.least(F.lit(Tsz), F.lit(meta.width) - F.col("ttc") * Tsz)
    r_lo = F.greatest(F.lit(0), drc * Tsz - h_c)
    r_hi = F.least(F.col("th"), drc * Tsz + h_c + tth)
    c_lo = F.greatest(F.lit(0), dcc * Tsz - h_c)
    c_hi = F.least(F.col("tw"), dcc * Tsz + h_c + ttw)
    n_rows = r_hi - r_lo
    n_cols = c_hi - c_lo
    tw_col = F.col("tw")
    # self pair (dr=dc=0) always covers the whole tile — pass values through
    # instead of the per-cell interpreted slice/flatten reconstruction
    # (same fast path as the ring-offset builder's centre message)
    strip = F.when(
        (drc == 0) & (dcc == 0), F.col("values")
    ).otherwise(
        F.flatten(
            F.transform(
                F.sequence(r_lo, r_hi - 1),
                lambda r: F.slice(F.col("values"), r * tw_col + c_lo + 1, n_cols),
            )
        )
    )
    return pairs.filter((n_rows > 0) & (n_cols > 0)).select(
        F.col("ttr").cast("int").alias("tile_row"),
        F.col("ttc").cast("int").alias("tile_col"),
        (F.col("s_tr") * Tsz + r_lo).cast("int").alias("gr0"),
        (F.col("s_tc") * Tsz + c_lo).cast("int").alias("gc0"),
        n_rows.cast("int").alias("n_rows"),
        n_cols.cast("int").alias("n_cols"),
        strip.alias("strip"),
        F.col("t_h").cast("int").alias("h"),
    )


def stencil_apply(
    rf: RasterFrame,
    h: int,
    kernel: Callable[[np.ndarray, np.ndarray, tuple], np.ndarray],
    *,
    out_meta: RasterMeta | None = None,
    targets: DataFrame | None = None,
    n_targets: int | None = None,
    clip_to_grid: bool = False,
) -> RasterFrame:
    """Run ``kernel(padded, valid_mask, (r0, c0, th, tw, h))`` per tile.

    ``padded`` is the (th+2h)×(tw+2h) window in float64 with NaN where no data was
    received (outside-grid or missing tiles); ``valid_mask`` marks cells inside the
    grid. The kernel returns the (th, tw) core. The h ≤ T constraint applies
    only to the ring-offset builder path (``targets is None`` with small R);
    the targeted builder routinely assembles per-tile radii far above T, up
    to the grid diagonal (ADVICE r6 docstring fix).

    ``targets``: optional (tile_row, tile_col) set — only these tiles are
    computed (the caller merges untouched tiles back). Message generation
    picks the cheaper builder from driver-known bounds: the ring-offset
    builder costs O(n_tiles·(2R+1)²) generated rows, the broadcast-join
    targeted builder O(n_tiles·n_targets); ``n_targets`` supplies the bound
    (unknown → targeted builder, the safe choice at large R). If ``targets``
    carries an integer ``h`` column, each tile is assembled at its OWN radius
    (the exact-radius extrapolate round) and the scalar ``h`` may be ``None``;
    the targeted builder is then always used.

    ``clip_to_grid``: allocate only the window ∩ grid instead of the full
    (th+2h)×(tw+2h) square — at h approaching the raster span the unclipped
    allocation is (2h)² ≈ 4× the whole raster PER TILE (measured: the 16.8M
    cell extrapolate bench OOM'd the JVM at h=5793); clipped it is bounded by
    the raster's own footprint. The kernel then receives a 7-tuple info
    ``(r0, c0, th, tw, h, top, left)`` where (top, left) is the core's offset
    inside the clipped window, and an all-true valid mask (the window is
    entirely in-grid). Only kernels that understand the 7-tuple may set this
    (extrapolate's two-pass NN path); reflect-padding kernels (blur/sobel)
    need the full square.
    """
    meta = rf.meta
    Tsz = meta.tile_size
    H, W = meta.height, meta.width
    raster_id = rf.raster_id  # primitive capture — closures must not capture rf (DataFrame)
    if targets is None:
        msgs = halo_messages(rf, h)
    elif "h" in targets.columns:
        msgs = halo_messages_targeted(rf, None, targets)
    else:
        R = max(1, math.ceil(h / Tsz))
        ring_cost = (2 * R + 1) ** 2
        if n_targets is not None and ring_cost <= n_targets:
            msgs = halo_messages(rf, h).join(
                F.broadcast(targets.select("tile_row", "tile_col").distinct()),
                ["tile_row", "tile_col"],
                "left_semi",
            )
        else:
            msgs = halo_messages_targeted(rf, h, targets)

    clip = bool(clip_to_grid)

    def assemble(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        tr, tc = int(key[0]), int(key[1])
        # per-group radius from the messages (constant within a target tile;
        # differs across tiles in the exact-radius extrapolate round)
        h_ = int(pdf["h"].iloc[0])
        r0, c0 = tr * Tsz, tc * Tsz
        th_, tw_ = min(Tsz, H - r0), min(Tsz, W - c0)
        if clip:
            rs, re = max(r0 - h_, 0), min(r0 + th_ + h_, H)
            cs, ce = max(c0 - h_, 0), min(c0 + tw_ + h_, W)
        else:
            rs, re = r0 - h_, r0 + th_ + h_
            cs, ce = c0 - h_, c0 + tw_ + h_
        padded = np.full((re - rs, ce - cs), np.nan)
        for gr0, gc0, n_rows, n_cols, strip in zip(
            pdf["gr0"].to_numpy(), pdf["gc0"].to_numpy(),
            pdf["n_rows"].to_numpy(), pdf["n_cols"].to_numpy(), pdf["strip"].to_numpy(),
        ):
            rr = int(gr0) - rs
            cc = int(gc0) - cs
            frag = np.asarray(strip, dtype=np.float64).reshape(int(n_rows), int(n_cols))
            padded[rr : rr + frag.shape[0], cc : cc + frag.shape[1]] = frag
        if clip:
            valid = np.ones(padded.shape, dtype=bool)
            info = (r0, c0, th_, tw_, h_, r0 - rs, c0 - cs)
        else:
            rows = np.arange(rs, re)[:, None]
            cols = np.arange(cs, ce)[None, :]
            valid = np.broadcast_to(
                (rows >= 0) & (rows < H) & (cols >= 0) & (cols < W), padded.shape
            )
            info = (r0, c0, th_, tw_, h_)
        core = kernel(padded, valid, info)
        from ..grid import morton_encode

        return pd.DataFrame(
            {
                "raster_id": [raster_id],
                "tile_row": [tr],
                "tile_col": [tc],
                "cell_id": [int(morton_encode(np.array([tr]), np.array([tc]))[0])],
                "values": [core.astype(np.float64).ravel()],
            }
        )

    from ..tiles import TILE_SCHEMA

    out = msgs.groupBy("tile_row", "tile_col").applyInPandas(assemble, TILE_SCHEMA)
    out = out.withColumn("values", denull(F.col("values")))
    return RasterFrame(out, out_meta or meta, rf.raster_id)


def _reflect_index(i: int, lo: int, hi: int) -> int:
    """Half-sample-symmetric ('reflect') index fold into [lo, hi] — the repeated
    reflection scipy applies when the pad is wider than the data band:
    ... d c b a | a b c d | d c b a ..."""
    n = hi - lo + 1
    m = (i - lo) % (2 * n)
    if m >= n:
        m = 2 * n - 1 - m
    return lo + m


def _symmetric_fill(padded: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Replace outside-grid halo cells with their half-sample-symmetric mirror.

    Index-folded reflection (row axis, then col axis — matches scipy's separable
    'reflect'), valid for ANY halo width: a halo wider than the grid band repeats
    the reflection instead of reading still-NaN halo rows."""
    a = padded.copy()
    n_r, n_c = a.shape
    # find grid-valid row/col bands inside the padded window
    vrows = np.where(valid.any(axis=1))[0]
    vcols = np.where(valid.any(axis=0))[0]
    if len(vrows) == 0:
        return a
    rlo, rhi = vrows[0], vrows[-1]
    clo, chi = vcols[0], vcols[-1]
    for i in range(0, rlo):
        a[i, :] = a[_reflect_index(i, rlo, rhi), :]
    for i in range(rhi + 1, n_r):
        a[i, :] = a[_reflect_index(i, rlo, rhi), :]
    for j in range(0, clo):
        a[:, j] = a[:, _reflect_index(j, clo, chi)]
    for j in range(chi + 1, n_c):
        a[:, j] = a[:, _reflect_index(j, clo, chi)]
    return a


def _gaussian_weights(sigma: float, radius: int) -> np.ndarray:
    """scipy.ndimage gaussian_filter1d weights (truncate·sigma radius, normalized)."""
    x = np.arange(-radius, radius + 1)
    w = np.exp(-0.5 * (x / sigma) ** 2)
    return w / w.sum()


def _corr1d(a: np.ndarray, w: np.ndarray, axis: int) -> np.ndarray:
    """Vectorized 1-D correlation via shifted adds. np.roll wrap-around only
    contaminates cells within radius of the PADDED edge, which the caller crops —
    core cells only ever see true halo data."""
    r = len(w) // 2
    out = np.zeros_like(a)
    for k, wk in enumerate(w):
        out += wk * np.roll(a, r - k, axis=axis)
    return out


def blur(rf: RasterFrame, sigma: float, *, preserve_nan: bool = True) -> RasterFrame:
    """Gaussian blur, σ in world units (reference src/rastr/raster.py:1185-1221).

    preserve_nan: NN-extrapolate → blur → restore NaN mask (exactly the reference
    composition). The extrapolate pre-pass is skipped JVM-cheaply when the raster
    has no NaN.
    """
    cell_sigma = sigma / rf.meta.cell_size
    radius = int(4.0 * cell_sigma + 0.5)  # scipy truncate=4.0 default
    dtype = np.dtype(rf.meta.dtype)

    src = rf
    nan_mask_rf = None
    if preserve_nan:
        has_nan = (
            rf.df.select(
                F.max(F.exists("values", lambda v: F.isnan(v)).cast("int")).alias("x")
            ).collect()[0]["x"]
            or 0
        )
        if has_nan:
            nan_mask_rf = rf
            if radius == 0:
                # degenerate σ: no smoothing happens, so extrapolate + NaN
                # restore is the whole composition (the fused path below
                # requires radius ≥ 1); extrapolate is only invoked here —
                # the fused path never runs its planning jobs
                src = extrapolate(rf)

    if radius > 0 and nan_mask_rf is not None:
        # FUSED single round (r7): local exact NN fill + reflect + blur + NaN
        # restore in ONE stencil pass over the ORIGINAL raster, replacing the
        # extrapolate pre-pass (its own flags scan + stencil round), the blur
        # round, and the _binary restore join (guide §2.4: remove shuffles
        # outright). Exactness: the restored output keeps only originally
        # valid cells, and a valid cell's blur reads the ±radius Chebyshev
        # box; every read NaN cell c therefore has a valid cell within
        # Chebyshev radius, so its true nearest donor is within Euclidean
        # radius·√2 — filling the extended core (core ± radius) with proof
        # margin hp = ⌈radius·√2⌉ via the PROVEN extrapolate kernel
        # reproduces extrapolate's fill (same donor, same tie-break) for
        # every cell that can influence a surviving output. Deeper NaN cells
        # stay NaN and contaminate only cells that are restored to NaN
        # anyway. Reflection needs no extra margin: an out-of-grid position
        # read by valid cell v mirrors to an in-grid cell within Chebyshev
        # radius of v (|r_v − (k−1)| ≤ radius − 1 when r_v + k ≤ radius), so
        # reflected reads obey the same bound. Interleaved A/B on the
        # 16.8M-cell bench raster: 6.7-8.5 s → (see OPTIMIZATION_r07.md),
        # full-raster bit-equality against the composed path verified on
        # scattered-NaN, blob, edge-band, and mostly-NaN layouts.
        ext = radius
        hp = int(math.ceil(radius * math.sqrt(2.0)))
        h_fused = ext + hp
        fill_kern = _nn_fill_kernel(hp)

        def kern_fused(padded, valid, info):
            r0, c0, th, tw, h_ = info
            core_nan = np.isnan(padded[h_ : h_ + th, h_ : h_ + tw])
            sub_info = (r0 - ext, c0 - ext, th + 2 * ext, tw + 2 * ext, hp)
            filled_ext = fill_kern(padded, valid, sub_info)
            a = padded.copy()
            a[hp : hp + th + 2 * ext, hp : hp + tw + 2 * ext] = filled_ext
            a = _symmetric_fill(a, valid).astype(dtype)
            w = _gaussian_weights(cell_sigma, radius).astype(dtype)
            tmp = _corr1d(a, w, axis=0)
            tmp = _corr1d(tmp, w, axis=1)
            out = tmp[h_ : h_ + th, h_ : h_ + tw].astype(np.float64).copy()
            out[core_nan] = np.nan
            return out

        return stencil_apply(nan_mask_rf, h_fused, kern_fused)

    if radius == 0:
        out = src
    else:
        def kern(padded, valid, info):
            r0, c0, th, tw, h = info
            a = _symmetric_fill(padded, valid).astype(dtype)
            w = _gaussian_weights(cell_sigma, radius).astype(dtype)
            tmp = _corr1d(a, w, axis=0)
            tmp = _corr1d(tmp, w, axis=1)
            return tmp[h : h + th, h : h + tw]

        out = stencil_apply(src, radius, kern)

    if nan_mask_rf is not None:
        # restore NaN mask: aligned zip keeping NaN where original was NaN
        from .elementwise import _binary

        out = _binary(
            nan_mask_rf,
            out,
            lambda orig, b: F.when(F.isnan(orig), F.lit(float("nan"))).otherwise(b),
            lambda orig, b: np.where(np.isnan(orig), np.nan, b),
        )
    return out


def sobel(rf: RasterFrame) -> RasterFrame:
    """skimage-compatible Sobel gradient magnitude / cell_size
    (reference src/rastr/raster.py:1164-1183)."""
    cs = rf.meta.cell_size
    dtype = np.dtype(rf.meta.dtype)

    def kern(padded, valid, info):
        r0, c0, th, tw, h = info
        a = _symmetric_fill(padded, valid).astype(np.float64)
        smooth = np.array([1.0, 2.0, 1.0]) / 4.0
        deriv = np.array([1.0, 0.0, -1.0]) / 2.0

        v = _corr1d(_corr1d(a, deriv, axis=0), smooth, axis=1)  # vertical derivative
        hgrad = _corr1d(_corr1d(a, smooth, axis=0), deriv, axis=1)
        mag = np.sqrt(2.0 * (v * v + hgrad * hgrad)) / cs
        return mag[h : h + th, h : h + tw].astype(dtype)

    return stencil_apply(rf, 1, kern)


def _disk(radius: int) -> np.ndarray:
    """skimage.morphology.disk: boolean disk, |(i,j)|₂ ≤ radius on integer grid."""
    y, x = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    return (x * x + y * y) <= radius * radius


def dilate(rf: RasterFrame, radius: float) -> RasterFrame:
    """Grey dilation with a disk footprint (reference src/rastr/raster.py:1223-1288):
    pad with (global min − 1) beyond the grid, NaN→fill during the max-filter,
    NaN mask restored after. All-NaN raster short-circuits to a copy."""
    cell_radius = int(math.ceil(radius / rf.meta.cell_size))
    # dedicated NaN-ignoring global min (Spark orders NaN greater than every
    # double, so array_min/min skip NaN unless ALL cells are NaN): one codegen
    # aggregate instead of rf_stats' interpreted struct-accumulator pass —
    # which additionally deoptimizes to ~5 s/16.8M cells for the rest of the
    # session once any applyInPandas job has run (measured; the dedicated min
    # stays at ~0.1 s). All-NaN raster → NaN/None min → unchanged copy.
    row = rf.df.agg(F.min(F.array_min("values")).alias("mn")).collect()[0]
    if row["mn"] is None or math.isnan(row["mn"]):
        return RasterFrame(rf.df, rf.meta, rf.raster_id)
    fill_val = float(row["mn"]) - 1.0
    dtype = np.dtype(rf.meta.dtype)
    foot = _disk(cell_radius)

    def kern(padded, valid, info):
        r0, c0, th, tw, h = info
        # original core NaN mask BEFORE the fill: the kernel restores the NaN
        # cells itself — the core of the padded window IS the original tile,
        # so the old post-stencil _binary join (a full shuffle join + second
        # pass over the raster just to re-read the original mask) is dead
        # weight. Identical semantics: orig NaN → NaN, else dilated value.
        nan_core = np.isnan(padded[h : h + th, h : h + tw])
        a = padded.copy()
        a[~valid] = fill_val  # outside-grid = reference's pad(min-1)
        a[np.isnan(a)] = fill_val
        a = a.astype(dtype)
        # max filter via shift-stack over the disk footprint
        out = np.full((th, tw), -np.inf, dtype=dtype)
        for dy in range(-h, h + 1):
            for dx in range(-h, h + 1):
                if not foot[dy + h, dx + h]:
                    continue
                out = np.maximum(out, a[h + dy : h + dy + th, h + dx : h + dx + tw])
        out = out.astype(np.float64)
        out[nan_core] = np.nan
        return out

    return stencil_apply(rf, cell_radius, kern)


# Remaining-NaN-tile count under which extrapolate finishes with the exact-
# radius donor-summary round. The radius computation is a broadcast-nested-loop
# join of (remaining NaN tiles) × (donor-tile summary) with the smaller side
# broadcast, and the targeted message builder broadcasts the radii table —
# both need the remaining-tile set to be broadcast-sized. Above the bound the
# plain doubling loop runs (targets-pruned, memory-safe) until the remaining
# count shrinks under it; on real data the h=8 sweep alone gets there.
EXTRAPOLATE_SUMMARY_MAX_TARGETS = 1_000_000


def _donor_tile_summary(rf: RasterFrame) -> DataFrame:
    """Up to 5 rows per tile containing ≥1 donor (non-NaN) cell: the donor
    cells nearest the tile CENTRE and each of the 4 tile CORNERS, in GLOBAL
    (row, col) coordinates (duplicates collapsed).

    Single JVM pass (``transform`` + ``array_min`` per anchor — the packed
    d2·T²+i long orders by min anchor-distance, ties → lowest row-major
    index), no shuffle: the coarse "where are the donors" table the
    exact-radius round is planned from. Five representatives keep the radius bound tight for
    the common shapes (a small hole inside a donor-rich tile sees the
    centre-nearest donor; a donor band along one edge sees its corner
    donors); the residual slack is paid only in window size, never in
    correctness (the radius is an upper bound by construction; the kernel
    still computes the true nearest donor)."""
    meta = rf.meta
    Tsz = meta.tile_size
    H, W = meta.height, meta.width
    # vectorized Arrow pass (r7): the original JVM form (five interpreted
    # transform + array_min passes per tile, one per anchor) cost ~41 s on a
    # dense 16.8M-cell raster and ~1-2 s on the sparse bench raster; the
    # numpy pass is ~1 s regardless of density. Selection is IDENTICAL: the
    # packed d2·T²+i long orders by min anchor-distance with ties → lowest
    # row-major index (i < th·tw ≤ T², d2 ≤ 8(T−1)² keeps the product far
    # below 2⁶³), anchor coords scaled ×2 to stay integral — centre
    # ((th−1)/2, (tw−1)/2) and the 4 corners, duplicates collapsed.
    mult = np.int64(int(Tsz) * int(Tsz))

    def kernel(it):
        for pdf in it:
            trs = pdf["tile_row"].to_numpy()
            tcs = pdf["tile_col"].to_numpy()
            out: dict = {"rep_r": [], "rep_c": []}
            for i in range(len(pdf)):
                vals = np.asarray(pdf["values"].iloc[i], dtype=np.float64)
                idx = np.nonzero(~np.isnan(vals))[0].astype(np.int64)
                if idx.size == 0:
                    continue
                tr, tc = int(trs[i]), int(tcs[i])
                th_ = min(Tsz, H - tr * Tsz)
                tw_ = min(Tsz, W - tc * Tsz)
                r2 = 2 * (idx // tw_)
                c2 = 2 * (idx % tw_)
                anchors = (
                    (th_ - 1, tw_ - 1),
                    (0, 0),
                    (0, 2 * (tw_ - 1)),
                    (2 * (th_ - 1), 0),
                    (2 * (th_ - 1), 2 * (tw_ - 1)),
                )
                best = {
                    int(idx[np.argmin(((r2 - ar) ** 2 + (c2 - ac) ** 2) * mult + idx)])
                    for ar, ac in anchors
                }
                for bi in best:
                    out["rep_r"].append(tr * Tsz + bi // tw_)
                    out["rep_c"].append(tc * Tsz + bi % tw_)
            if out["rep_r"]:
                yield pd.DataFrame(out)

    return rf.df.select("tile_row", "tile_col", "values").mapInPandas(
        kernel, "rep_r int, rep_c int"
    )


def _nan_tile_flags(df: DataFrame, meta: RasterMeta) -> DataFrame:
    """(tile_row, tile_col, max_run) for every tile with ≥1 NaN cell —
    ``max_run`` is the longest NaN run of the row-major values array, or NULL
    when the longest run reaches the tile width (it may then cover a full
    row, so it is no same-row donor bound).

    A flat run of length L < tile width never crosses a full row, so every
    cell in it has a same-row donor within L — a PROVEN radius from this one
    pass alone. For the dense-raster-with-scattered-holes shape (blur's
    preserve_nan pre-pass on real rasters) that settles every tile without
    the donor summary, and the radius is the hole size, not ~half a tile
    diagonal. One packed-long ``aggregate`` ((cur, max) in one 62-bit long),
    no struct allocation, no shuffle."""
    th, tw = tile_dims_cols(meta)
    base = df.select(
        "tile_row", "tile_col", tw.alias("tw"), "values"
    ).filter(F.exists("values", lambda v: F.isnan(v)))
    tw_c = F.col("tw")
    mask = F.lit((1 << 31) - 1).cast("long")

    def step(acc, v):
        cur2 = (
            F.when(F.isnan(v), F.shiftright(acc, 31) + 1)
            .otherwise(F.lit(0))
            .cast("long")
        )
        return F.shiftleft(cur2, 31) + F.greatest(acc.bitwiseAND(mask), cur2)

    run = F.aggregate(
        "values",
        F.lit(0).cast("long"),
        step,
        lambda acc: F.greatest(acc.bitwiseAND(mask), F.shiftright(acc, 31)),
    )
    return base.select(
        "tile_row",
        "tile_col",
        F.when(run < tw_c, run).cast("int").alias("max_run"),
    )


def _nan_tile_bbox(df: DataFrame, meta: RasterMeta, keys: DataFrame) -> DataFrame:
    """(tile_row, tile_col, rmin, rmax, cmin, cmax) — the tile-LOCAL NaN
    bounding box, computed ONLY for the given key tiles (broadcast semi-join;
    the rep-bound path's input, so a small hole in a big tile still gathers
    a hole-sized window)."""
    Tsz = meta.tile_size
    W = meta.width
    base = df.join(
        F.broadcast(keys.select("tile_row", "tile_col")),
        ["tile_row", "tile_col"],
        "left_semi",
    ).select("tile_row", "tile_col", "values")

    # vectorized Arrow pass (r7, same treatment as _donor_tile_summary): the
    # interpreted two-transform form re-evaluated a per-cell lambda twice per
    # cell of every key tile
    def kernel(it):
        for pdf in it:
            trs = pdf["tile_row"].to_numpy()
            tcs = pdf["tile_col"].to_numpy()
            out: dict = {
                "tile_row": [], "tile_col": [],
                "rmin": [], "rmax": [], "cmin": [], "cmax": [],
            }
            for i in range(len(pdf)):
                vals = np.asarray(pdf["values"].iloc[i], dtype=np.float64)
                idx = np.nonzero(np.isnan(vals))[0]
                if idx.size == 0:
                    continue
                tw_ = min(Tsz, W - int(tcs[i]) * Tsz)
                cols = idx % tw_
                out["tile_row"].append(int(trs[i]))
                out["tile_col"].append(int(tcs[i]))
                out["rmin"].append(int(idx[0] // tw_))
                out["rmax"].append(int(idx[-1] // tw_))
                out["cmin"].append(int(cols.min()))
                out["cmax"].append(int(cols.max()))
            if out["tile_row"]:
                yield pd.DataFrame(out)

    return base.mapInPandas(
        kernel,
        "tile_row int, tile_col int, rmin int, rmax int, cmin int, cmax int",
    )


def _donor_cells(rf: RasterFrame) -> DataFrame:
    """(tile_row, tile_col, tw, di, dv): per-tile SPARSE donor lists — the
    positions (row-major index) and values of every non-NaN cell, extracted in
    one vectorized Arrow pass. The sparse-gather extrapolate round replicates
    these few-donor lists to target tiles instead of shipping dense
    mostly-NaN window strips (see :func:`_sparse_nn_fill`)."""
    meta = rf.meta
    Tsz = meta.tile_size
    W = meta.width

    def kernel(it):
        for pdf in it:
            trs = pdf["tile_row"].to_numpy()
            tcs = pdf["tile_col"].to_numpy()
            rows: dict = {"tile_row": [], "tile_col": [], "tw": [], "di": [], "dv": []}
            for i in range(len(pdf)):
                vals = np.asarray(pdf["values"].iloc[i], dtype=np.float64)
                idx = np.nonzero(~np.isnan(vals))[0]
                if idx.size == 0:
                    continue
                rows["tile_row"].append(int(trs[i]))
                rows["tile_col"].append(int(tcs[i]))
                rows["tw"].append(min(Tsz, W - int(tcs[i]) * Tsz))
                rows["di"].append(idx)
                rows["dv"].append(vals[idx])
            if rows["di"]:
                # an empty dict-of-lists DataFrame gets float64 columns,
                # which Arrow cannot convert to the declared list types —
                # skip empty batches instead
                yield pd.DataFrame(rows)

    return rf.df.select("tile_row", "tile_col", "values").mapInPandas(
        kernel, "tile_row int, tile_col int, tw int, di array<long>, dv array<double>"
    )


def _sparse_nn_fill(rf: RasterFrame, radii: DataFrame, donors: DataFrame) -> DataFrame:
    """The exact-radius extrapolate round over a BROADCAST donor set: the
    (driver-bounded, see ``SPARSE_GATHER_MAX_DONORS``) donor cells are
    collected once into three sorted numpy arrays and broadcast; a batched
    ``mapInPandas`` over the tiny radii table then box-queries each target's
    window out of the sorted arrays (``searchsorted`` on the row coordinate)
    and runs the identical proven :func:`_nn_fill_kernel` on a window
    re-assembled from those donors. Result is bit-equal to the dense-strip
    round — the window a kernel sees contains exactly the same donor cells.

    Why this shape: on a mostly-NaN raster the proven radii are necessarily
    wide (the nearest donor IS far), so the dense round ships (T+2h)² window
    cells per target — 244M cells ≈ 15× the raster for the 16.8M-cell bench
    raster at one donor/tile — and a shuffle-gathered sparse variant still
    pays ~2 ms × n_targets of per-group Arrow overhead in applyInPandas
    (measured 8 s for 4096 groups with a trivial kernel). Here NOTHING is
    shuffled: no raster scan, no per-group machinery — the only moving parts
    are one bounded collect+broadcast and one Python crossing of the
    one-row-per-NaN-tile radii table. The padded window is additionally
    shrunk to the bbox of core ∪ in-window donors: excluded cells are
    donor-free by construction, so the kernel's scan result is unchanged."""
    meta = rf.meta
    Tsz = meta.tile_size
    H, W = meta.height, meta.width
    raster_id = rf.raster_id
    rows = donors.select("tile_row", "tile_col", "tw", "di", "dv").collect()
    grs, gcs, dvs = [], [], []
    for r in rows:
        di = np.asarray(r["di"], dtype=np.int64)
        grs.append(r["tile_row"] * Tsz + di // r["tw"])
        gcs.append(r["tile_col"] * Tsz + di % r["tw"])
        dvs.append(np.asarray(r["dv"], dtype=np.float64))
    gr = np.concatenate(grs) if grs else np.empty(0, np.int64)
    gc = np.concatenate(gcs) if gcs else np.empty(0, np.int64)
    dv = np.concatenate(dvs) if dvs else np.empty(0, np.float64)
    order = np.lexsort((gc, gr))
    bc = rf.df.sparkSession.sparkContext.broadcast((gr[order], gc[order], dv[order]))
    kern = _nn_fill_kernel(None)

    def fill(it):
        G, C, V = bc.value
        from ..grid import morton_encode

        for pdf in it:
            out: dict = {
                "raster_id": [], "tile_row": [], "tile_col": [],
                "cell_id": [], "values": [],
            }
            for tr, tc, h_ in zip(
                pdf["tile_row"].to_numpy(), pdf["tile_col"].to_numpy(),
                pdf["h"].to_numpy(),
            ):
                tr, tc, h_ = int(tr), int(tc), int(h_)
                r0, c0 = tr * Tsz, tc * Tsz
                th_, tw_ = min(Tsz, H - r0), min(Tsz, W - c0)
                rs, re = max(r0 - h_, 0), min(r0 + th_ + h_, H)
                cs, ce = max(c0 - h_, 0), min(c0 + tw_ + h_, W)
                lo, hi = np.searchsorted(G, (rs, re))
                m = (C[lo:hi] >= cs) & (C[lo:hi] < ce)
                g2, c2, v2 = G[lo:hi][m], C[lo:hi][m], V[lo:hi][m]
                if g2.size == 0:
                    # no donor in the window (defensive — proven radii imply
                    # one): emit the all-NaN core, like the dense round would
                    core = np.full((th_, tw_), np.nan)
                else:
                    rs2 = min(int(g2.min()), r0)
                    re2 = max(int(g2.max()) + 1, r0 + th_)
                    cs2 = min(int(c2.min()), c0)
                    ce2 = max(int(c2.max()) + 1, c0 + tw_)
                    padded = np.full((re2 - rs2, ce2 - cs2), np.nan)
                    padded[g2 - rs2, c2 - cs2] = v2
                    info = (r0, c0, th_, tw_, h_, r0 - rs2, c0 - cs2)
                    core = kern(padded, np.ones(padded.shape, dtype=bool), info)
                out["raster_id"].append(raster_id)
                out["tile_row"].append(tr)
                out["tile_col"].append(tc)
                out["cell_id"].append(
                    int(morton_encode(np.array([tr]), np.array([tc]))[0])
                )
                out["values"].append(core.astype(np.float64).ravel())
            if out["values"]:
                # skip empty batches (see _donor_cells: Arrow cannot convert
                # an empty float64 column to the declared array type)
                yield pd.DataFrame(out)

    from ..tiles import TILE_SCHEMA

    # the radii table is tiny in BYTES but each row is ~5 ms of kernel work —
    # AQE's byte-based coalescing would collapse it to one partition and run
    # every kernel on one core (measured: 28 s single-core vs ~1 s spread).
    # Round-robin repartition to the session's parallelism before the Python
    # stage; the 1-row-per-tile shuffle is negligible.
    n_parts = max(rf.df.sparkSession.sparkContext.defaultParallelism, 1) * 2
    out = radii.select(
        "tile_row", "tile_col", F.col("h").cast("int").alias("h")
    ).repartition(n_parts).mapInPandas(fill, TILE_SCHEMA)
    return out.withColumn("values", denull(F.col("values")))


# dense-window volume bound for the exact-radius round, as a multiple of the
# raster's own cell count: below it the dense strip gather ships ~the raster
# once and stays (the common dense-raster-with-holes shape); above it the
# donor cells are extracted and, when they fit the broadcast bound below, the
# round runs from a broadcast donor set instead (mostly-NaN rasters, where
# proven radii are necessarily wide and dense windows would ship the raster
# 10-20x). The two regimes are complementary: many donors ⇒ small radii ⇒
# dense windows ship ≈ the raster once; few donors ⇒ broadcastable.
SPARSE_GATHER_DENSE_BLOWUP = 4.0

# donor-cell count above which the broadcast round is not attempted (the
# collect+broadcast is ~24 bytes/donor — the bound keeps it a few dozen MB,
# same class as the radii broadcast the targeted builder already relies on)
SPARSE_GATHER_MAX_DONORS = 2_000_000

# pair-count bound above which _exact_target_radii switches from the single
# cross join to the Chebyshev-ring-doubling join: with BOTH sides large
# (~10⁶ rep-needing tiles × ~10⁷ donor reps on a sparse mega-raster) the
# broadcast-nested-loop cross would generate ~10¹³ pair rows — the planner
# itself becoming the scale-killer the plan exists to avoid
EXTRAPOLATE_RADII_MAX_PAIRS = 64_000_000


def _radii_from_pairs(j, Tsz: int, max_h: int) -> DataFrame:
    """min corner-max distance per target over (target × donor-rep) pair rows."""
    gr0 = F.col("ttr").cast("long") * Tsz + F.col("rmin")
    gr1 = F.col("ttr").cast("long") * Tsz + F.col("rmax")
    gc0 = F.col("ttc").cast("long") * Tsz + F.col("cmin")
    gc1 = F.col("ttc").cast("long") * Tsz + F.col("cmax")
    dr = F.greatest(F.abs(gr0 - F.col("rep_r")), F.abs(gr1 - F.col("rep_r")))
    dc = F.greatest(F.abs(gc0 - F.col("rep_c")), F.abs(gc1 - F.col("rep_c")))
    d2 = dr * dr + dc * dc
    return (
        j.groupBy("ttr", "ttc")
        .agg(F.min(d2).alias("d2"))
        .select(
            F.col("ttr").alias("tile_row"),
            F.col("ttc").alias("tile_col"),
            F.greatest(
                F.lit(1), F.least(F.ceil(F.sqrt("d2")), F.lit(max_h))
            ).cast("int").alias("h"),
        )
    )


def _exact_target_radii(
    flags: DataFrame, summary: DataFrame, meta: RasterMeta, max_h: int,
    *, broadcast_flags: bool, ring: bool = False,
) -> DataFrame:
    """(tile_row, tile_col, h) for every NaN tile: a PROVEN-sufficient per-tile
    radius from the donor summary and the tile's NaN bounding box.

    For a fixed donor position, distance over the NaN bbox rectangle is convex
    and separable, so its max is max-over-row-interval + max-over-col-interval;
    min over donor reps of that corner-max bounds every NaN cell's nearest-donor
    distance from above (the rep IS a real donor). Broadcast-nested-loop join
    with the smaller side broadcast, partial-aggregated min per target — the
    only shuffle carries one row per remaining tile.

    ``ring``: bound the pair count when BOTH sides are large — iterate a
    Chebyshev tile-ring join (targets × reps within K tile rings, K×4 per
    pass) instead of the full cross product; any in-ring rep still yields a
    valid upper bound (every rep is a real donor), only possibly looser than
    the global min, and targets resolve as soon as a ring contains a donor.
    Each pass streams the summary once against the broadcast unresolved set."""
    Tsz = meta.tile_size
    t = flags.select(
        F.col("tile_row").alias("ttr"), F.col("tile_col").alias("ttc"),
        "rmin", "rmax", "cmin", "cmax",
    )
    if not ring:
        if broadcast_flags:
            j = F.broadcast(t).crossJoin(summary)
        else:
            j = t.crossJoin(F.broadcast(summary))
        return _radii_from_pairs(j, Tsz, max_h)

    rep_tr = F.floor(F.col("rep_r") / Tsz)
    rep_tc = F.floor(F.col("rep_c") / Tsz)
    max_ring = max(1, math.ceil(max_h / Tsz)) + 1
    unresolved = t.localCheckpoint(eager=True)
    parts = []
    K = 4
    while True:
        in_ring = (F.abs(rep_tr - F.col("ttr")) <= K) & (
            F.abs(rep_tc - F.col("ttc")) <= K
        )
        j = F.broadcast(unresolved).join(summary, in_ring)
        part = _radii_from_pairs(j, Tsz, max_h).localCheckpoint(eager=True)
        parts.append(part)
        unresolved = unresolved.join(
            part.select(
                F.col("tile_row").alias("ttr"), F.col("tile_col").alias("ttc")
            ),
            ["ttr", "ttc"],
            "left_anti",
        ).localCheckpoint(eager=True)
        if not unresolved.count() or K >= max_ring:
            break
        K *= 4
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def extrapolate(rf: RasterFrame, method: str = "nearest") -> RasterFrame:
    """NaN → nearest non-NaN by Euclidean index distance, ties → lowest (row, col)
    (reference src/rastr/raster.py:1290-1309 + arr/fill.py:11-32).

    Two-level plan (SURVEY §2.2): cheap JVM map passes over the original
    raster give every NaN tile an EXACT proven-sufficient radius — the
    NaN-run bound from the flags pass alone when the tile's holes are small
    (the common dense-raster shape: no donor summary at all), a 5-rep
    donor-summary broadcast-nested-loop min only for tiles without a valid
    run bound — and ONE targeted stencil round at per-tile radius finishes,
    always filling from the ORIGINAL raster (scipy NearestNDInterpolator
    semantics: chained propagation would drift). NaN-free tiles never enter
    the shuffle at all. All-NaN rasters return unchanged. A halo-doubling
    fallback covers the adversarial case where the NaN-tile set itself is
    too big to broadcast.
    """
    if method not in ("nearest",):
        raise NotImplementedError(f"Unsupported extrapolation method: {method}")
    meta = rf.meta
    Tsz = meta.tile_size
    make_kernel = _nn_fill_kernel

    # full proof radius = the grid DIAGONAL: max(H, W) would leave a far
    # corner unproven when the only donors sit in the opposite corner
    # (distance up to √(H²+W²) — found by the single-corner-donor test)
    max_h = int(math.ceil(math.hypot(meta.height, meta.width)))
    has_nan = F.exists("values", lambda v: F.isnan(v))

    flags = _nan_tile_flags(rf.df, meta).localCheckpoint(eager=False)
    n_targets = flags.count()
    if not n_targets:  # no NaN anywhere — nothing to fill
        return RasterFrame(rf.df, meta, rf.raster_id)

    # the donor summary is computed lazily: tiles whose run bound is valid
    # never need it, and for the dense-holes shape that is ALL of them
    summary = None
    donor_reps = 0

    def get_summary():
        nonlocal summary, donor_reps
        if summary is None:
            summary = _donor_tile_summary(rf).localCheckpoint(eager=False)
            donor_reps = summary.count()
        return summary, donor_reps

    out_df = rf.df
    if n_targets > EXTRAPOLATE_SUMMARY_MAX_TARGETS:
        # Doubling fallback ONLY while the NaN-tile set is too big to
        # broadcast (adversarial dense-checkerboard layouts); each round
        # recomputes just the still-NaN tiles (fills use only original
        # donors, so a NaN-free tile is final) and localCheckpoint cuts the
        # per-round plan — lineage stays one round deep however many rounds
        # run. Exits into the exact-radius round as soon as the remaining
        # set shrinks under the bound.
        if get_summary()[1] == 0:  # all-NaN raster: returned unchanged
            return RasterFrame(rf.df, meta, rf.raster_id)
        h = 8
        targets = flags.select("tile_row", "tile_col")
        for _ in range(64):  # 2^64 cells ≫ any grid; exits via remaining == 0
            filled = stencil_apply(
                rf, h, make_kernel(h), targets=targets, n_targets=n_targets,
                clip_to_grid=h > 32,
            )
            out_df = out_df.filter(~has_nan).unionByName(filled.df)
            # rebinding out_df each round drops the previous round's
            # reference: its localCheckpoint blocks are reclaimed by the
            # ContextCleaner once this round's checkpoint materializes (the
            # old .cache() loop needed an explicit unpersist; checkpoint
            # blocks are GC-owned)
            out_df = out_df.localCheckpoint(eager=False)
            remaining = out_df.filter(has_nan).select("tile_row", "tile_col")
            n_targets = remaining.count()  # one job: materializes the checkpoint
            if not n_targets or h >= max_h:
                return RasterFrame(out_df, meta, rf.raster_id)
            if n_targets <= EXTRAPOLATE_SUMMARY_MAX_TARGETS:
                # the exact round fills from the ORIGINAL raster, so its
                # radii must be measured on the ORIGINAL tiles too — a run
                # bound taken from the partially-filled table would count
                # round fills as donors and under-size the window (cells
                # proven in earlier rounds get re-proven here, since the
                # whole tile core is re-emitted). Only the tile SET comes
                # from the partially-filled table.
                keys = remaining.localCheckpoint(eager=True)
                flags = (
                    _nan_tile_flags(rf.df, meta)
                    .join(F.broadcast(keys), ["tile_row", "tile_col"], "left_semi")
                    .localCheckpoint(eager=True)
                )
                break
            targets = remaining
            h = min(h * 2, max_h)

    # exact-radius round: run-bound radii from the flags pass alone; tiles
    # without a valid run bound get their NaN bbox (second pass over just
    # those tiles) and the donor-summary broadcast-nested-loop min — then
    # ONE targeted round (two-pass kernel, grid-clipped windows)
    run_radii = flags.filter(F.col("max_run").isNotNull()).select(
        "tile_row", "tile_col",
        F.greatest(F.lit(1), F.least("max_run", F.lit(max_h))).cast("int").alias("h"),
    )
    need_rep = flags.filter(F.col("max_run").isNull()).localCheckpoint(eager=False)
    n_need = need_rep.count()
    if n_need:
        _, reps = get_summary()
        if reps == 0:  # all-NaN raster: reference returns it unchanged
            return RasterFrame(out_df, meta, rf.raster_id)
        # bbox over the ORIGINAL raster's NaN cells (the exact round re-fills
        # every original NaN of the flagged tiles, not just the remaining ones)
        bbox = _nan_tile_bbox(rf.df, meta, need_rep)
        rep_radii = _exact_target_radii(
            bbox, summary, meta, max_h, broadcast_flags=n_need <= reps,
            ring=n_need * reps > EXTRAPOLATE_RADII_MAX_PAIRS,
        )
        radii = run_radii.unionByName(rep_radii)
    else:
        radii = run_radii
    # gather-representation choice for the one targeted round, from
    # driver-known volume estimates (radii is tiny — one row per NaN tile):
    # dense strips ship Σ(T+2h)² window cells; sparse donor lists ship each
    # donor once per ring tile. Mostly-NaN rasters have necessarily wide
    # proven radii (the nearest donor IS far), where dense windows move the
    # raster 10-20× — the sparse path moves only the donors. The probe runs
    # only when some tile lacked a valid NaN-run bound (n_need > 0): a pure
    # run-bound radius set has h < T, so the dense volume is bounded by
    # ~9× tile cells and the strip gather is the right plan — gating on it
    # keeps the common dense-raster-with-holes pre-pass (blur preserve_nan)
    # free of the two extra driver actions.
    use_sparse = False
    if n_need:
        radii = radii.localCheckpoint(eager=True)
        vol = radii.agg(
            F.sum(
                (F.lit(float(Tsz)) + 2.0 * F.col("h")) * (F.lit(float(Tsz)) + 2.0 * F.col("h"))
            ).alias("dense")
        ).collect()[0]
        n_cells = float(meta.height) * float(meta.width)
        if vol["dense"] is not None and vol["dense"] > SPARSE_GATHER_DENSE_BLOWUP * n_cells:
            donors = _donor_cells(rf).localCheckpoint(eager=True)
            n_donors = donors.agg(F.sum(F.size("di"))).collect()[0][0] or 0
            use_sparse = n_donors <= SPARSE_GATHER_MAX_DONORS
    if use_sparse:
        filled_df = _sparse_nn_fill(rf, radii, donors)
    else:
        filled_df = stencil_apply(
            rf, None, make_kernel(None), targets=radii, clip_to_grid=True
        ).df
    out_df = out_df.filter(~has_nan).unionByName(filled_df)
    return RasterFrame(out_df, meta, rf.raster_id)


def _nn_fill_kernel(h):
    """Per-tile nearest-donor fill kernel with proof radius ``h`` (module level
    so the two code paths — offset sweep for h ≤ 32, two-pass column scan for
    larger radii — are directly testable against each other; semantics in
    :func:`extrapolate`)."""

    def kern(padded, valid, info):
        # 5-tuple = full (th+2h)×(tw+2h) window (core offset = h);
        # 7-tuple = grid-clipped window with explicit core offsets (the
        # large-radius memory path — see stencil_apply clip_to_grid)
        if len(info) == 7:
            r0, c0, th, tw, h_, top, left = info
        else:
            r0, c0, th, tw, h_ = info
            top = left = h_
        core = padded[top : top + th, left : left + tw]
        out = core.copy()
        nan_mask = np.isnan(core)
        if not nan_mask.any() or np.isnan(padded).all():
            return out
        # offsets sorted by (d², dy, dx): first non-NaN donor in this order IS
        # the min-distance donor with lowest-(row,col) tie-break — because for
        # tied d², smaller dy ⇒ smaller donor row (dy = donor_row - cell_row),
        # then smaller dx ⇒ smaller donor col. Only offsets with d ≤ h qualify
        # (a donor outside the window is at Chebyshev > h ⇒ Euclid > h, so a
        # hit within h is globally optimal and every tied donor is in-window).
        if len(info) == 5 and h_ <= 32:
            # small radius, full (unclipped) window: offset-ordered sweep,
            # fully vectorized per offset. Clipped 7-tuple windows always take
            # the two-pass scan — the sweep's padded[top+dy ...] indexing
            # assumes a full h_ margin on every side.
            offs = [
                (dy * dy + dx * dx, dy, dx)
                for dy in range(-h_, h_ + 1)
                for dx in range(-h_, h_ + 1)
                if 0 < dy * dy + dx * dx <= h_ * h_
            ]
            offs.sort()
            pend = nan_mask.copy()
            for _, dy, dx in offs:
                if not pend.any():
                    break
                cand = padded[top + dy : top + dy + th, left + dx : left + dx + tw]
                take = pend & ~np.isnan(cand)
                out[take] = cand[take]
                pend &= ~take
            return out
        # large radius (sparse data): exact two-pass nearest-donor search.
        # Pass 1 — per COLUMN, the nearest donor row (two vectorized accumulate
        # scans; tie |Δrow| above/below → the smaller row). Pass 2 — per output
        # row, a vectorized lexicographic argmin over all padded columns: min
        # total d², ties by (donor row, donor col) — exactly the reference's
        # ordering. A donor that is not the nearest within its own column can
        # never tie the global optimum (its column's nearest has strictly
        # smaller total), so pass 1 loses nothing. O(core_cells × padded_width)
        # numpy work instead of a Python loop per NaN cell with a full
        # donor-array distance scan each iteration (VERDICT r3 item 3).
        mask = ~np.isnan(padded)
        P_r, P_c = padded.shape
        ri = np.arange(P_r, dtype=np.int64)[:, None]
        LARGE = P_r + P_c + 10  # > any real distance; empty columns never win
        up = np.maximum.accumulate(np.where(mask, ri, -LARGE), axis=0)
        down = np.minimum.accumulate(np.where(mask, ri, 3 * LARGE)[::-1], axis=0)[::-1]
        d_up = ri - up
        d_down = down - ri
        nr = np.where(d_up <= d_down, up, down)  # tie → smaller donor row
        dr = np.minimum(d_up, d_down)
        dr2 = dr * dr  # ≥ LARGE² > h² wherever the column has no donor
        cols = np.arange(P_c, dtype=np.int64)
        h2 = h_ * h_
        sentinel = np.iinfo(np.int64).max
        for i in range(th):
            row_nan = nan_mask[i]
            if not row_nan.any():
                continue
            r = i + top
            cc = (np.nonzero(row_nan)[0] + left)[:, None]
            dc = cc - cols[None, :]
            tot = dr2[r][None, :] + dc * dc
            best = tot.min(axis=1)
            sel = best <= h2
            if not sel.any():
                continue
            tie_key = np.where(
                tot == best[:, None], nr[r][None, :] * P_c + cols[None, :], sentinel
            )
            j = tie_key.argmin(axis=1)[sel]
            fill_cols = np.nonzero(row_nan)[0][sel]
            out[i, fill_cols] = padded[nr[r, j], j]
        return out

    return kern


# -- attach ------------------------------------------------------------------
RasterFrame.blur = lambda self, sigma, preserve_nan=True: blur(self, sigma, preserve_nan=preserve_nan)
RasterFrame.sobel = lambda self: sobel(self)
RasterFrame.dilate = lambda self, radius: dilate(self, radius)
RasterFrame.extrapolate = lambda self, method="nearest": extrapolate(self, method)
