"""Structured Streaming over cell updates.

The reference is batch-only ("streaming support planned", reference README.md:158);
the engine adds the Spark-native path: a stream of cell updates
(ts, row, col, value) → watermarked tumbling-window aggregation per tile →
checkpoint-backed sink. Late data beyond the watermark is dropped by Spark's state
store; per-tile partial aggregates mirror the batch partial/final model
(operators/aggregates.py), so a streaming zonal-stats consumer composes the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

UPDATE_SCHEMA = "ts timestamp, row int, col int, value double"


def read_update_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of cell updates (parquet drops into ``path``)."""
    return spark.readStream.schema(UPDATE_SCHEMA).parquet(path)


def windowed_tile_stats(
    updates: DataFrame,
    *,
    tile_size: int = 256,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Tumbling-window per-tile NaN-ignoring stats with late-data watermark."""
    ok = ~F.isnan("value")
    return (
        updates.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window).alias("win"),
            (F.col("row") / tile_size).cast("int").alias("tile_row"),
            (F.col("col") / tile_size).cast("int").alias("tile_col"),
        )
        .agg(
            F.sum(ok.cast("long")).alias("cnt"),
            F.sum(F.when(ok, F.col("value")).otherwise(0.0)).alias("s"),
            F.min(F.when(ok, F.col("value"))).alias("mn"),
            F.max(F.when(ok, F.col("value"))).alias("mx"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "tile_row",
            "tile_col",
            "cnt",
            "s",
            (F.col("s") / F.col("cnt")).alias("mean"),
            "mn",
            "mx",
        )
    )


def run_to_memory(stats: DataFrame, query_name: str):
    """Drain the stream with availableNow into an in-memory table (tests/demos)."""
    return (
        stats.writeStream.format("memory")
        .queryName(query_name)
        # complete mode: append would emit only watermark-finalized windows, which
        # never happens within a single availableNow drain
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
