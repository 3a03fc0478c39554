"""Dump .explain('formatted') for the SECOND r7 optimization batch to plans/r07/.

Usage: python scripts/dump_plans_r07b.py <suffix>
  suffix: 'before' (run from a checkout of the tree before this batch,
  e.g. a worktree at the session-start commit, with PLANS_OUT pointing at
  the main repo's plans/r07) or 'after'.

Covers the paths changed after the first r7 checkpoint: LSH candidate-pair
generation (self-join → grouped pair-gen), the fuzzy rep-table broadcast,
the Arrow minhash signature stage, the spread-scan Jaccard path, and the
fused preserve_nan blur round. Plans only — the fuzzy plan builders run
their own small driver jobs (rep counts, the CC shortcut) at build time.
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

    import bench as B
    from rastr_spark.functions import dedup as D
    from rastr_spark.sources.documents import generate_text_corpus
    from rastr_spark.tiles import RasterFrame

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("plan-dump-r07b")
        .config("spark.sql.shuffle.partitions", str(max(CPUS * 2, 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="plans_r07b_")

    n = 20000
    base = generate_text_corpus(spark, n, seed=11)
    near = base.filter(F.col("doc_id") % 20 == 3).select(
        (F.col("doc_id") + n).alias("doc_id"),
        F.concat("text", F.lit(" zzq")).alias("text"),
    )
    base.unionByName(near).write.mode("overwrite").parquet(f"{tmp}/corpus")
    corpus = spark.read.parquet(f"{tmp}/corpus")
    kw = dict(n=3, num_hashes=8, bands=4, threshold=0.8, max_bucket_size=1000)

    save(D.minhash_signatures_df(corpus, n=3, num_hashes=8), "minhash_signatures")
    save(D.minhash_candidate_pairs(corpus, **{k: v for k, v in kw.items() if k != "threshold"}),
         "dedup_candidate_pairs")
    save(D.fuzzy_dedup_assign(corpus, **kw), "dedup_fuzzy_assign_full")
    save(D.ngram_jaccard_pairs(corpus, n=3, threshold=0.5, max_doc_freq=50,
                               hash_grams=True), "ngram_jaccard_capped")

    # fused preserve_nan blur on a small bench-shaped raster with scattered NaN
    from rastr_spark.meta import Affine, RasterMeta

    meta = RasterMeta(8.0, "EPSG:2193", Affine(8, 0, 0, 0, -8, 2048), 256, 256, tile_size=64)
    rf0 = RasterFrame.full(spark, meta, 0.0, raster_id="plan")
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
    save(dense.blur(2 * 8.0, preserve_nan=True).df, "raster_blur_nan")

    spark.stop()


if __name__ == "__main__":
    main()
