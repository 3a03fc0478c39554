"""Raster metadata: affine georeferencing, bounds, CRS axis conventions.

Re-expresses the reference's ``RasterMeta`` (reference: src/rastr/meta.py:17-29) as a
plain dataclass carried on the driver and broadcast/closure-captured into Spark stages.
The affine transform is six doubles ``(a, b, c, d, e, f)`` mapping array indices to
world coordinates::

    x = a * col + b * row + c
    y = d * col + e * row + f

Cell *centres* are at ``transform * (col + 0.5, row + 0.5)``
(reference: src/rastr/meta.py:57-89).

No pyproj/affine/pydantic dependency — everything is closed-form numpy/maths, which is
what lets the same code run inside executor-side pandas UDFs.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from typing import NamedTuple

import numpy as np


class Bounds(NamedTuple):
    """Outer cell-edge bounds (reference: src/rastr/raster.py:1861-1875)."""

    xmin: float
    ymin: float
    xmax: float
    ymax: float


@dataclass(frozen=True)
class Affine:
    """Six-coefficient affine transform, same layout as ``affine.Affine``."""

    a: float
    b: float
    c: float
    d: float
    e: float
    f: float

    @staticmethod
    def scale(sx: float, sy: float | None = None) -> "Affine":
        sy = sx if sy is None else sy
        return Affine(sx, 0.0, 0.0, 0.0, sy, 0.0)

    @staticmethod
    def translation(tx: float, ty: float) -> "Affine":
        return Affine(1.0, 0.0, tx, 0.0, 1.0, ty)

    def __mul__(self, other: "Affine | tuple[float, float]"):
        if isinstance(other, Affine):
            return Affine(
                self.a * other.a + self.b * other.d,
                self.a * other.b + self.b * other.e,
                self.a * other.c + self.b * other.f + self.c,
                self.d * other.a + self.e * other.d,
                self.d * other.b + self.e * other.e,
                self.d * other.c + self.e * other.f + self.f,
            )
        col, row = other
        return (
            self.a * col + self.b * row + self.c,
            self.d * col + self.e * row + self.f,
        )

    def invert(self) -> "Affine":
        det = self.a * self.e - self.b * self.d
        if det == 0.0:
            raise ValueError("degenerate affine transform")
        ia, ib = self.e / det, -self.b / det
        id_, ie = -self.d / det, self.a / det
        return Affine(ia, ib, -(ia * self.c + ib * self.f), id_, ie, -(id_ * self.c + ie * self.f))

    def forward(self, cols: np.ndarray, rows: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized index→world. Inputs are float arrays (add 0.5 for centres)."""
        x = self.a * cols + self.b * rows + self.c
        y = self.d * cols + self.e * rows + self.f
        return x, y

    def inverse(self, xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized world→fractional index (cols, rows)."""
        inv = self.invert()
        cols = inv.a * xs + inv.b * ys + inv.c
        rows = inv.d * xs + inv.e * ys + inv.f
        return cols, rows

    def to_list(self) -> list[float]:
        return [self.a, self.b, self.c, self.d, self.e, self.f]

    @staticmethod
    def from_list(v) -> "Affine":
        return Affine(*[float(x) for x in v])


def affine_sign_for_crs(crs: str) -> tuple[int, int]:
    """Axis-direction sign convention (reference: src/rastr/gis/crs.py:9-67).

    Projected CRSs conventionally have x increasing east (a>0) and y increasing
    north, stored top-down so e<0. Without pyproj we carry the authority string
    only and use the (east, north) = (+1, -1) raster convention.
    """
    return (1, -1)


@dataclass(frozen=True)
class RasterMeta:
    """cell_size + CRS + affine + shape (reference: src/rastr/meta.py:17-29).

    ``height``/``width`` are the full-grid dimensions in cells; ``tile_size`` is
    the engine's physical tiling (not present in the reference — its arrays are
    monolithic; tiling is our distribution strategy).
    """

    cell_size: float
    crs: str
    transform: Affine
    height: int
    width: int
    tile_size: int = 256
    dtype: str = "float64"

    def __post_init__(self):
        if self.cell_size <= 0:
            raise ValueError("cell_size must be positive")
        if self.height < 0 or self.width < 0:
            raise ValueError("shape must be non-negative")

    # -- geometry of the grid ------------------------------------------------
    @property
    def shape(self) -> tuple[int, int]:
        return (self.height, self.width)

    @property
    def n_tile_rows(self) -> int:
        return max(1, math.ceil(self.height / self.tile_size)) if self.height else 0

    @property
    def n_tile_cols(self) -> int:
        return max(1, math.ceil(self.width / self.tile_size)) if self.width else 0

    def bounds(self) -> Bounds:
        """Outer cell-edge bounds ≡ rasterio.transform.array_bounds
        (reference: src/rastr/raster.py:549-553)."""
        t = self.transform
        corners_x, corners_y = [], []
        for col, row in ((0, 0), (self.width, 0), (0, self.height), (self.width, self.height)):
            x, y = t * (col, row)
            corners_x.append(x)
            corners_y.append(y)
        return Bounds(min(corners_x), min(corners_y), max(corners_x), max(corners_y))

    def cell_centres(self, rows: np.ndarray, cols: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        return self.transform.forward(cols + 0.5, rows + 0.5)

    def world_to_index(self, xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """World → integer (row, col) of the containing cell (floor of fractional)."""
        cols, rows = self.transform.inverse(np.asarray(xs, dtype=np.float64), np.asarray(ys, dtype=np.float64))
        return np.floor(rows).astype(np.int64), np.floor(cols).astype(np.int64)

    # -- equality used by alignment preconditions ----------------------------
    def same_grid(self, other: "RasterMeta") -> bool:
        """``is_like`` (reference: src/rastr/raster.py:172-181): meta + shape equal."""
        return (
            self.cell_size == other.cell_size
            and self.crs == other.crs
            and self.transform == other.transform
            and self.shape == other.shape
        )

    def with_(self, **kw) -> "RasterMeta":
        return replace(self, **kw)

    def to_row(self, raster_id: str) -> dict:
        return {
            "raster_id": raster_id,
            "cell_size": float(self.cell_size),
            "crs": self.crs,
            "transform": self.transform.to_list(),
            "height": int(self.height),
            "width": int(self.width),
            "tile_size": int(self.tile_size),
            "dtype": self.dtype,
        }

    @staticmethod
    def from_row(row) -> "RasterMeta":
        return RasterMeta(
            cell_size=float(row["cell_size"]),
            crs=row["crs"],
            transform=Affine.from_list(row["transform"]),
            height=int(row["height"]),
            width=int(row["width"]),
            tile_size=int(row["tile_size"]),
            dtype=row["dtype"],
        )

    @staticmethod
    def example() -> "RasterMeta":
        """Deterministic example meta (reference: src/rastr/meta.py:31-38)."""
        return RasterMeta(
            cell_size=2.0,
            crs="EPSG:2193",
            transform=Affine.scale(2.0, 2.0),
            height=256,
            width=256,
        )

    @staticmethod
    def infer(
        x: np.ndarray,
        y: np.ndarray,
        *,
        crs: str,
        cell_size: float | None = None,
    ) -> "RasterMeta":
        """Infer grid meta from scattered points (reference: src/rastr/meta.py:91-117).

        cell_size heuristic when absent: half the 5th-percentile nearest-neighbour
        distance (reference: src/rastr/meta.py:166-187), computed here with a
        vectorized grid-bucketed NN search (no scipy KDTree available).
        """
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        if cell_size is None:
            cell_size = infer_cell_size(x, y)
        xmin, xmax = float(np.min(x)), float(np.max(x))
        ymin, ymax = float(np.min(y)), float(np.max(y))
        width = max(1, int(math.ceil((xmax - xmin) / cell_size)) + 1)
        height = max(1, int(math.ceil((ymax - ymin) / cell_size)) + 1)
        # top-left origin, y decreasing with row (north-up convention)
        transform = Affine(cell_size, 0.0, xmin - cell_size / 2, 0.0, -cell_size, ymax + cell_size / 2)
        return RasterMeta(cell_size=cell_size, crs=crs, transform=transform, height=height, width=width)


def infer_cell_size(x: np.ndarray, y: np.ndarray) -> float:
    """Half the 5th percentile of nearest-neighbour distances
    (reference: src/rastr/meta.py:166-187). Brute-force blocked pairwise
    distances — point clouds are small relative to grids; O(n²) blocked at
    2048² chunks keeps memory bounded."""
    n = len(x)
    if n < 2:
        raise ValueError("need at least 2 points to infer cell size")
    pts = np.column_stack([x, y])
    nn = np.full(n, np.inf)
    block = 2048
    for i0 in range(0, n, block):
        chunk = pts[i0 : i0 + block]
        d2 = ((chunk[:, None, :] - pts[None, :, :]) ** 2).sum(axis=2)
        for k in range(len(chunk)):
            d2[k, i0 + k] = np.inf
        nn[i0 : i0 + block] = np.sqrt(d2.min(axis=1))
    nn = nn[nn > 0]  # drop coincident duplicates (reference filters distances > 0)
    if len(nn) == 0:
        raise ValueError("all points are coincident; cannot infer cell size")
    return float(np.percentile(nn, 5)) / 2.0
