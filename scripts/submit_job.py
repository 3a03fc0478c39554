"""Minimal spark-submit job proving the --py-files packaging path (north rule).

    python scripts/package.py
    spark-submit --master 'local[8]' --py-files dist/rastr_spark.zip scripts/submit_job.py

The job imports rastr_spark FROM THE ZIP (no repo on sys.path), builds a raster,
runs the flagship zonal pipeline on generated docs, and prints one JSON line.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

# imports resolve from the --py-files zip on the executors AND the driver
from rastr_spark.geometry import Geometry
from rastr_spark.meta import Affine, RasterMeta
from rastr_spark.plans.flagship import doc_zonal_stats
from rastr_spark.sources.documents import generate_documents
from rastr_spark.tiles import RasterFrame


def main():
    spark = SparkSession.builder.appName("rastr-spark-submit-smoke").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    meta = RasterMeta(32.0, "EPSG:2193", Affine(32, 0, 0, 0, -32, 512), 16, 16, tile_size=4)
    rf = RasterFrame.full(spark, meta, 1.0, raster_id="r")
    docs = generate_documents(spark, 2000, seed=42, n_tile_rows=4, n_tile_cols=4, raster_id="r")
    zones = [("all", Geometry.box(0, 0, 512, 512)), ("west", Geometry.box(0, 0, 256, 512))]
    out = doc_zonal_stats(docs, rf, zones, salt_threshold=500)
    n = out.count()
    total = out.groupBy().sum("cell_count").collect()[0][0]
    print(json.dumps({"rows": n, "total_cells": int(total), "ok": n > 0}))
    spark.stop()


if __name__ == "__main__":
    main()
