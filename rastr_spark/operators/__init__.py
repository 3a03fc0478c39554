"""Operator modules. Importing this package attaches the reference's fluent
operator surface (arithmetic, stats, crop/pad/trim, …) onto ``RasterFrame``."""

from . import (  # noqa: F401
    aggregates,
    elementwise,
    geometric,
    interpolate,
    joins,
    rasterize,
    resample,
    stencils,
    vectorize,
)
