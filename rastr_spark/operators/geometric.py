"""Grid-geometry operators: crop, pad, trim — filter + re-tile stages.

These change the grid extent, so tiles must be re-keyed: the implementation is
(1) a **tile-level predicate** on tile bounds — Catalyst prunes whole tiles before
any array work — then (2) a JVM posexplode→filter→shift of surviving cells, and
(3) one shuffle (groupBy new tile key) to re-pack arrays. Transform bookkeeping is
bit-exact to the reference:

- crop:  reference src/rastr/raster.py:1376-1459 (centre±half-cell strategies,
         new transform = rasterio.transform.from_bounds of kept centres ± half)
- pad:   reference src/rastr/raster.py:1311-1374 (ceil(width/cell) cells all sides)
- trim:  reference src/rastr/raster.py:1554-1615 (transform shifted by
         translation(min_col, min_row))
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..meta import Affine, RasterMeta
from ..tiles import RasterFrame
from .aggregates import valid_extent


def _cast_dtype(value: float, dtype: str) -> float:
    return float(np.asarray(value, dtype=np.dtype(dtype)))


def from_bounds_transform(west: float, south: float, east: float, north: float, width: int, height: int) -> Affine:
    """rasterio.transform.from_bounds: north-up affine from outer bounds."""
    return Affine((east - west) / width, 0.0, west, 0.0, (south - north) / height, north)


def window(rf: RasterFrame, r0: int, r1: int, c0: int, c1: int, new_meta: RasterMeta) -> RasterFrame:
    """Sub-window [r0..r1]×[c0..c1] (inclusive) re-tiled under ``new_meta``.

    Tile-level pruning first: only tiles overlapping the window are exploded.
    The same rectangle is also expressed as Morton ``cell_id`` ranges
    (grid.morton_range_set): on a persisted tile store partitioned by cell_id
    these become PartitionFilters, so the crop prunes at the FILE level — the
    tile_row/tile_col predicates alone are data filters that still read every
    partition's footer.
    """
    from functools import reduce

    from ..grid import morton_range_set

    Tsz = rf.meta.tile_size
    ranges = morton_range_set(r0 // Tsz, r1 // Tsz, c0 // Tsz, c1 // Tsz)
    cell_pred = reduce(
        lambda a, b: a | b, [F.col("cell_id").between(lo, hi) for lo, hi in ranges]
    )
    pruned = rf.df.filter(
        cell_pred
        & (F.col("tile_row") * Tsz <= r1)
        & ((F.col("tile_row") + 1) * Tsz > r0)
        & (F.col("tile_col") * Tsz <= c1)
        & ((F.col("tile_col") + 1) * Tsz > c0)
    )
    cells = (
        RasterFrame(pruned, rf.meta, rf.raster_id)
        .cells()
        .filter((F.col("row").between(r0, r1)) & (F.col("col").between(c0, c1)))
        .select(
            (F.col("row") - r0).alias("row"),
            (F.col("col") - c0).alias("col"),
            "value",
        )
    )
    return RasterFrame.from_cells(cells, new_meta, raster_id=rf.raster_id, dense=False)


def crop(rf: RasterFrame, bounds, *, strategy: str = "underflow") -> RasterFrame:
    """Crop to world bounds (reference src/rastr/raster.py:1376-1459).

    The kept-index computation is O(H+W) driver-side arithmetic on cell-centre
    coordinates — exactly the reference's mask logic — then distributed re-tiling.
    """
    bounds = np.asarray(bounds, dtype=np.float64)
    if len(bounds) != 4:
        raise ValueError(
            f"bounds must be a sequence of length 4 (minx, miny, maxx, maxy); got length {len(bounds)}"
        )
    minx, miny, maxx, maxy = bounds
    meta = rf.meta
    t = meta.transform
    half = meta.cell_size / 2
    # reference cell_x_coords: y_idx = 0 (meta.py:57-72); cell_y_coords: x_idx = 0
    cols = np.arange(meta.width) + 0.5
    rows = np.arange(meta.height) + 0.5
    x_coords = t.a * cols + t.c
    y_coords = t.e * rows + t.f
    if strategy == "underflow":
        x_idx = (x_coords >= minx + half) & (x_coords <= maxx - half)
        y_idx = (y_coords >= miny + half) & (y_coords <= maxy - half)
    elif strategy == "overflow":
        x_idx = (x_coords > minx - half) & (x_coords < maxx + half)
        y_idx = (y_coords > miny - half) & (y_coords < maxy + half)
    else:
        raise NotImplementedError(f"Unsupported cropping strategy: {strategy}")
    if not x_idx.any() or not y_idx.any():
        raise ValueError("Cropped array is empty; no cells within the specified bounds.")
    (kc,) = np.where(x_idx)
    (kr,) = np.where(y_idx)
    c0, c1 = int(kc[0]), int(kc[-1])
    r0, r1 = int(kr[0]), int(kr[-1])
    kept_x = x_coords[x_idx]
    kept_y = y_coords[y_idx]
    new_w, new_h = c1 - c0 + 1, r1 - r0 + 1
    new_t = from_bounds_transform(
        kept_x.min() - half, kept_y.min() - half, kept_x.max() + half, kept_y.max() + half, new_w, new_h
    )
    new_meta = meta.with_(transform=new_t, height=new_h, width=new_w)
    return window(rf, r0, r1, c0, c1, new_meta)


def pad(rf: RasterFrame, width: float, *, value: float = np.nan) -> RasterFrame:
    """Grow by ceil(width/cell) cells on all sides, constant fill
    (reference src/rastr/raster.py:1311-1374).

    Distributed: original cells shift by +pad; the border comes from the
    ``full`` generator filtered to the frame region — a JVM-only filter, no join.
    """
    meta = rf.meta
    p = int(np.ceil(width / meta.cell_size))
    if p == 0:
        return rf
    xmin, ymin, xmax, ymax = meta.bounds()
    cs = meta.cell_size
    new_h, new_w = meta.height + 2 * p, meta.width + 2 * p
    new_t = from_bounds_transform(xmin - p * cs, ymin - p * cs, xmax + p * cs, ymax + p * cs, new_w, new_h)
    new_meta = meta.with_(transform=new_t, height=new_h, width=new_w)
    fill = _cast_dtype(value, meta.dtype)

    inner = rf.cells().select(
        (F.col("row") + p).alias("row"), (F.col("col") + p).alias("col"), "value"
    )
    spark = rf.df.sparkSession
    border = (
        RasterFrame.full(spark, new_meta, fill)
        .cells()
        .filter(
            (F.col("row") < p)
            | (F.col("row") >= p + meta.height)
            | (F.col("col") < p)
            | (F.col("col") >= p + meta.width)
        )
    )
    return RasterFrame.from_cells(inner.unionByName(border), new_meta, raster_id=rf.raster_id, dense=False)


def _trim(rf: RasterFrame, *, value: float | None) -> RasterFrame:
    r0, r1, c0, c1 = valid_extent(rf, value=value)
    meta = rf.meta
    new_t = meta.transform * Affine.translation(c0, r0)
    new_meta = meta.with_(transform=new_t, height=r1 - r0 + 1, width=c1 - c0 + 1)
    return window(rf, r0, r1, c0, c1, new_meta)


def trim_nan(rf: RasterFrame) -> RasterFrame:
    return _trim(rf, value=None)


def trim_zeros(rf: RasterFrame) -> RasterFrame:
    return _trim(rf, value=0.0)


# -- attach ------------------------------------------------------------------
RasterFrame.crop = lambda self, bounds, strategy="underflow": crop(self, bounds, strategy=strategy)
RasterFrame.pad = lambda self, width, value=np.nan: pad(self, width, value=value)
RasterFrame.trim_nan = lambda self: trim_nan(self)
RasterFrame.trim_zeros = lambda self: trim_zeros(self)
