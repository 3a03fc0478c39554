"""Sources & sinks: tile stores (parquet / bucketed catalog tables), GeoTIFF,
GSAG grids, DXF/CAD, the interleaved document table, and checkpointed lineage."""

from .cad import read_cad_gdf
from .checkpoint import CheckpointManager
from .documents import generate_documents, generate_text_corpus
from .io import (
    read_file,
    read_geotiff_raster,
    read_gsag,
    read_raster,
    read_raster_bucketed,
    read_raster_mosaic,
    to_file,
    write_geotiff_raster,
    write_gsag,
    write_raster,
    write_raster_bucketed,
)

__all__ = [
    "CheckpointManager",
    "generate_documents",
    "generate_text_corpus",
    "read_cad_gdf",
    "read_file",
    "read_geotiff_raster",
    "read_gsag",
    "read_raster",
    "read_raster_bucketed",
    "read_raster_mosaic",
    "to_file",
    "write_geotiff_raster",
    "write_gsag",
    "write_raster",
    "write_raster_bucketed",
]
