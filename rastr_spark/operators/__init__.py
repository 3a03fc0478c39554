"""Operator modules. Importing this package attaches the reference's fluent
operator surface (arithmetic, stats, crop/pad/trim, …) onto ``RasterFrame``."""

from . import aggregates, elementwise, geometric, joins, resample, stencils  # noqa: F401
