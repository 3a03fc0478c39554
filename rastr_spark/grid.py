"""Hierarchical grid index (quadkey/Z-order) + fishnet generation + salting.

The north rule asks for "batched H3/S2 cell encoding"; neither library exists in this
environment, so the engine ships a deterministic hierarchical grid index with the same
API shape (``cell(x, y, res)``, ``parent``, ``k_ring``) built on Morton/Z-order bit
interleaving over the raster's affine grid (SURVEY.md §2.12, §7 choice). All encoders
are vectorized numpy — the Spark-side entry points are pandas UDFs / column expressions
that call these on whole Arrow batches (no per-row Python).

Fishnet semantics mirror reference src/rastr/gis/fishnet.py:13-93.
"""

from __future__ import annotations

import numpy as np

from .meta import Affine, RasterMeta

MAX_RES = 26  # 26 bits per axis → 52-bit Morton codes fit in a signed int64


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 26 bits of v so there is a zero bit between each."""
    v = v.astype(np.uint64) & np.uint64(0x3FFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _unpart1by1(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x3FFFFFF)
    return v


def morton_encode(rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
    """(row, col) → Z-order code. Vectorized; inputs int arrays ≥ 0."""
    r = np.asarray(rows, dtype=np.int64)
    c = np.asarray(cols, dtype=np.int64)
    if (r < 0).any() or (c < 0).any():
        raise ValueError("morton_encode requires non-negative indices")
    return ((_part1by1(r.astype(np.uint64)) << np.uint64(1)) | _part1by1(c.astype(np.uint64))).astype(np.int64)


def morton_decode(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    z = np.asarray(codes, dtype=np.int64).astype(np.uint64)
    cols = _unpart1by1(z)
    rows = _unpart1by1(z >> np.uint64(1))
    return rows.astype(np.int64), cols.astype(np.int64)


def cell_of_xy(xs: np.ndarray, ys: np.ndarray, meta: RasterMeta, res: int | None = None) -> np.ndarray:
    """World coordinate → grid cell id at resolution ``res``.

    Resolution r means cells of ``tile_size * cell_size`` at r = base; coarser
    parents shift the Morton code. Default: tile-level cells (the partitioning key).
    Out-of-grid coordinates are clamped into the index domain (they still receive
    a deterministic cell so joins can reject them explicitly).
    """
    rows, cols = meta.world_to_index(np.asarray(xs), np.asarray(ys))
    t = meta.tile_size
    tr = np.clip(rows // t, 0, (1 << MAX_RES) - 1)
    tc = np.clip(cols // t, 0, (1 << MAX_RES) - 1)
    code = morton_encode(tr, tc)
    if res is not None:
        code = parent_cell(code, res)
    return code


def parent_cell(codes: np.ndarray, levels: int) -> np.ndarray:
    """Coarsen a Morton cell by ``levels`` (each level halves both axes)."""
    return (np.asarray(codes, dtype=np.int64) >> np.int64(2 * levels)).astype(np.int64)


def k_ring(code: int, k: int) -> np.ndarray:
    """All cell ids within Chebyshev distance k of ``code`` (incl. itself).

    The kNN join widens k until enough candidates are found (SURVEY.md §2.3).
    """
    r, c = morton_decode(np.array([code]))
    r, c = int(r[0]), int(c[0])
    rr, cc = np.meshgrid(
        np.arange(max(0, r - k), r + k + 1), np.arange(max(0, c - k), c + k + 1), indexing="ij"
    )
    return morton_encode(rr.ravel(), cc.ravel())


def morton_range_set(
    tr0: int, tr1: int, tc0: int, tc1: int, *, max_ranges: int = 64
) -> list[tuple[int, int]]:
    """Inclusive Morton-code ranges covering the tile rectangle [tr0..tr1]×[tc0..tc1].

    Budgeted quadtree decomposition: a quad fully inside the rectangle
    contributes its whole contiguous code range [base, base + 4^level − 1];
    partial quads recurse while a work budget (O(max_ranges)) lasts, then emit
    their full quad range as a SUPERSET — still a valid pruning predicate, just
    less tight. Work is therefore O(max_ranges · log extent) regardless of
    rectangle size (a naive exact decomposition is O(extent) along boundary
    rows — unusable for a 10⁶×10⁶-tile bbox). Adjacent ranges are coalesced;
    if more than ``max_ranges`` survive, ranges separated by the smallest gaps
    are merged.

    This is the file-level pruning path for spatial reads: the tile store is
    partitioned by ``cell_id`` (Morton), so ``cell_id BETWEEN lo AND hi``
    predicates become PartitionFilters at the parquet scan.
    """
    if tr1 < tr0 or tc1 < tc0:
        raise ValueError("empty tile rectangle")
    if min(tr0, tc0) < 0:
        raise ValueError("tile indices must be non-negative")
    top = max(tr1, tc1).bit_length()  # quads of size 2^top cover the rectangle

    out: list[tuple[int, int]] = []
    budget = [max(64, 8 * max_ranges) if max_ranges < 2**30 else 2**62]

    def rec(level: int, qr: int, qc: int) -> None:
        size = 1 << level
        r_lo, c_lo = qr * size, qc * size
        r_hi, c_hi = r_lo + size - 1, c_lo + size - 1
        if r_lo > tr1 or r_hi < tr0 or c_lo > tc1 or c_hi < tc0:
            return
        inside = r_lo >= tr0 and r_hi <= tr1 and c_lo >= tc0 and c_hi <= tc1
        if inside or level == 0 or budget[0] <= 0:
            # level-0 non-disjoint quads are single in-rect tiles (exact);
            # budget-exhausted partial quads emit a superset range
            base = int(morton_encode(np.array([r_lo]), np.array([c_lo]))[0])
            out.append((base, base + size * size - 1))
            return
        budget[0] -= 1
        # child order (0,0),(0,1),(1,0),(1,1) is ascending Morton order
        for dr in (0, 1):
            for dc in (0, 1):
                rec(level - 1, qr * 2 + dr, qc * 2 + dc)

    rec(top, 0, 0)
    out.sort()
    merged: list[list[int]] = []
    for lo, hi in out:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    while len(merged) > max_ranges:
        # merge across the smallest inter-range gap (superset, still prunes)
        gaps = [(merged[i + 1][0] - merged[i][1], i) for i in range(len(merged) - 1)]
        _, i = min(gaps)
        merged[i][1] = merged[i + 1][1]
        del merged[i + 1]
    return [(lo, hi) for lo, hi in merged]


def ring_offsets(k: int) -> np.ndarray:
    """(dr, dc) offsets of the k-ring (square Chebyshev ring), shape (n, 2)."""
    d = np.arange(-k, k + 1)
    rr, cc = np.meshgrid(d, d, indexing="ij")
    return np.column_stack([rr.ravel(), cc.ravel()])


# ---------------------------------------------------------------------------
# Fishnet / point-grid (reference: src/rastr/gis/fishnet.py)
# ---------------------------------------------------------------------------

def point_grid_shape(bounds, cell_size: float) -> tuple[int, int]:
    """Number of (rows, cols) of cell centres covering bounds.

    Mirrors fishnet.py:49-57: use round when the span is an isclose-multiple of
    cell_size, else ceil — the isclose guard avoids float-noise off-by-ones.
    """
    xmin, ymin, xmax, ymax = bounds
    out = []
    for span in (ymax - ymin, xmax - xmin):
        ratio = span / cell_size
        n = round(ratio) if np.isclose(ratio, round(ratio)) else int(np.ceil(ratio))
        out.append(max(1, int(n)))
    return out[0], out[1]


def point_grid(bounds, cell_size: float) -> tuple[np.ndarray, np.ndarray]:
    """Cell-centre meshgrid (x, y) from bounds with half-cell offsets
    (fishnet.py:31-32: ``np.arange(min + cell/2, max, cell)``)."""
    xmin, ymin, xmax, ymax = bounds
    xs = np.arange(xmin + cell_size / 2, xmax, cell_size)
    ys = np.arange(ymin + cell_size / 2, ymax, cell_size)
    gx, gy = np.meshgrid(xs, ys, indexing="xy")
    return gx.ravel(), gy.ravel()


def fishnet_cell_bounds(cx: np.ndarray, cy: np.ndarray, cell_size: float) -> np.ndarray:
    """Square cell polygons around centres as (xmin, ymin, xmax, ymax) rows
    (fishnet.py:83-91 buffers; closed-form here — no buffer op needed)."""
    h = cell_size / 2
    return np.column_stack([cx - h, cy - h, cx + h, cy + h])


# ---------------------------------------------------------------------------
# Salting for skewed dense cells (north rule; SURVEY.md §2.12, §4.2)
# ---------------------------------------------------------------------------

def salt_factors(cell_counts: dict[int, int], target_per_partition: int) -> dict[int, int]:
    """Per-cell salt fan-out from a pre-pass count aggregation.

    Cells whose row count exceeds ``target_per_partition`` are split into
    ``ceil(count / target)`` salted sub-keys; the broadcast side of a salted join
    replicates each such cell's rows across all its salt values.
    """
    return {
        cell: max(1, int(np.ceil(cnt / target_per_partition)))
        for cell, cnt in cell_counts.items()
        if cnt > target_per_partition
    }
