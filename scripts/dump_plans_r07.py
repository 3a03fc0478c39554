"""Dump .explain('formatted') for the r7-touched query paths to plans/r07/.

Usage: python scripts/dump_plans_r07.py <suffix>
  suffix: 'before' (run from a round-start checkout) or 'after'.

The judge cannot run Spark; these files are the plan-shape evidence for
OPTIMIZATION_r07.md. Plans only — nothing is executed except tiny driver
metadata actions the plan builders themselves need (e.g. extrapolate's radii
decision aggregates and connected_components' edge count, which run small
jobs at plan-build time).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "after"
# plans always land in the MAIN repo's plans/r07, even when this script runs
# from a round-start worktree checkout
OUT = Path(os.environ.get("PLANS_OUT", str(REPO / "plans" / "r07")))
OUT.mkdir(parents=True, exist_ok=True)
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))


def save(df, name):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    (OUT / f"{name}_{SUFFIX}.txt").write_text(buf.getvalue())
    print("wrote", name, flush=True)


def main():
    import tempfile

    # PLANS_EXPAND=1: no-op the localCheckpoint materialization barriers so
    # explain() shows the full operator tree instead of truncating every
    # checkpointed subtree to `Scan ExistingRDD`. NOTE the expanded form
    # duplicates a checkpointed subtree once per consumer — in the real
    # execution each barrier materializes once; the default (real) plans show
    # the barriers as ExistingRDD scans.
    if os.environ.get("PLANS_EXPAND") == "1":
        from pyspark.sql import DataFrame as _DF

        _DF.localCheckpoint = lambda self, eager=True: self
        try:  # Spark 4: the concrete class lives in pyspark.sql.classic
            from pyspark.sql.classic.dataframe import DataFrame as _CDF

            _CDF.localCheckpoint = lambda self, eager=True: self
        except ImportError:
            pass

    import bench as B
    from rastr_spark.functions import dedup as D
    from rastr_spark.plans.datapipe import curate_corpus
    from rastr_spark.plans.flagship import doc_zonal_stats
    from rastr_spark.sources.documents import generate_text_corpus
    from rastr_spark.tiles import RasterFrame

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("plan-dump-r07")
        .config("spark.sql.shuffle.partitions", str(max(CPUS * 2, 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="plans_r07_")

    n = 20000
    base = generate_text_corpus(spark, n, seed=11)
    near = base.filter(F.col("doc_id") % 20 == 3).select(
        (F.col("doc_id") + n).alias("doc_id"),
        F.concat("text", F.lit(" zzq")).alias("text"),
    )
    base.unionByName(near).write.mode("overwrite").parquet(f"{tmp}/corpus")
    corpus = spark.read.parquet(f"{tmp}/corpus")
    kw = dict(n=3, num_hashes=8, bands=4, threshold=0.8, max_bucket_size=1000)

    save(D.duplicated_window_stats(corpus, window=16), "text_dup_windows")

    keyed, keys = D._group_keys(corpus.select("doc_id", "text"), "text", "fingerprint")
    reps = D.exact_rep_table(keyed, keys, "doc_id").select("doc_id", "text")
    save(D.verified_near_dup_edges(reps, **kw), "fuzzy_verified_edges")

    # curate: the changed piece is the annotation stage (the fuzzy stack is
    # covered by the edges plan above; a full curate plan cannot be dumped
    # with checkpoints no-op'd — its eager clustering loop would execute the
    # whole un-truncated lineage). Version-adaptive: the after-tree has the
    # fused doc_annotations; the before-tree uses the four column functions
    # exactly as round-start curate_corpus did.
    try:
        from rastr_spark.functions.text import doc_annotations

        ann = corpus.select(
            "doc_id", "text", doc_annotations(F.col("text")).alias("_ann")
        ).select(
            "doc_id", "text",
            F.col("_ann.quality").alias("quality"),
            F.col("_ann.lang").alias("lang"),
            F.col("_ann.bpe_tokens").alias("bpe_tokens"),
            F.col("_ann.ws_tokens").alias("ws_tokens"),
        )
    except ImportError:
        from rastr_spark.functions.text import (
            bpe_token_count,
            lang_id,
            quality_score,
            token_count,
        )

        ann = corpus.select(
            "doc_id", "text",
            quality_score(F.col("text")).alias("quality"),
            lang_id(F.col("text")).alias("lang"),
            bpe_token_count(F.col("text")).cast("long").alias("bpe_tokens"),
            token_count(F.col("text")).cast("long").alias("ws_tokens"),
        )
    save(ann, "curate_annotation")

    # stencils on a small bench-shaped raster (256² grid, 64-tile): dilate and
    # the sparse-regime extrapolate
    from rastr_spark.meta import Affine, RasterMeta

    meta = RasterMeta(8.0, "EPSG:2193", Affine(8, 0, 0, 0, -8, 2048), 256, 256, tile_size=64)
    rf0 = RasterFrame.full(spark, meta, 0.0, raster_id="plan")
    Tsz = meta.tile_size
    dense = RasterFrame(
        rf0.df.select(
            "raster_id", "tile_row", "tile_col", "cell_id",
            F.transform(
                F.sequence(F.lit(0), F.size("values") - 1),
                lambda i: F.when(
                    F.pmod(F.xxhash64(F.col("tile_row") * 1000 + F.col("tile_col") * 100 + i), 100) < 1,
                    F.lit(float("nan")),
                ).otherwise((F.col("tile_row") + i).cast("double")),
            ).alias("values"),
        ).cache(), meta, "plan",
    )
    dense.df.count()
    sparse = RasterFrame(
        rf0.df.select(
            "raster_id", "tile_row", "tile_col", "cell_id",
            F.transform(
                "values", lambda v, i: F.when(i == 0, F.lit(1.0)).otherwise(F.lit(float("nan")))
            ).alias("values"),
        ).cache(), meta, "plan_sparse",
    )
    sparse.df.count()
    save(dense.dilate(16.0).df, "raster_dilate")
    from rastr_spark.operators.stencils import extrapolate

    save(extrapolate(sparse).df, "raster_extrapolate_sparse")

    spark.stop()


if __name__ == "__main__":
    main()
