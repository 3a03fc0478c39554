"""Round-7 stage-level profiler (guide §1: measure first, noop-sink isolation).

Times the expensive bench operators stage by stage on the SAME corpora and
session config bench.py uses, so the numbers decompose the frozen bench lines.
Not part of the driver contract — bench.py stays the measurement instrument.

Usage: python scripts/profile_r07.py [stage ...]
  stages: fuzzy windows curate stencil flagship sf
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS = Path(__file__).resolve().parent.parent / "plans" / "r07"
PLANS.mkdir(parents=True, exist_ok=True)


def session() -> SparkSession:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("rastr-profile-r07")
        .config("spark.sql.shuffle.partitions", str(max(CPUS * 2, 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, fn, reps=3):
    walls = []
    for _ in range(reps):
        spark.sparkContext.setJobDescription(label)
        t0 = time.time()
        fn()
        walls.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
    print(f"PROF {label}: min={min(walls)} walls={walls}", flush=True)
    return min(walls)


def save_plan(df, name):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    (PLANS / f"{name}.txt").write_text(buf.getvalue())


def make_fuzzy_corpus(spark, tmp, n_base=200000):
    from rastr_spark.sources.documents import generate_text_corpus

    base = generate_text_corpus(spark, n_base, seed=11)
    near = base.filter(F.col("doc_id") % 20 == 3).select(
        (F.col("doc_id") + n_base).alias("doc_id"),
        F.concat("text", F.lit(" zzq")).alias("text"),
    )
    base.unionByName(near).write.mode("overwrite").parquet(f"{tmp}/fuzzy_corpus")
    return spark.read.parquet(f"{tmp}/fuzzy_corpus")


def prof_fuzzy(spark, tmp):
    from rastr_spark.functions import dedup as D

    corpus = make_fuzzy_corpus(spark, tmp)
    kw = dict(n=3, num_hashes=8, bands=4, threshold=0.8, max_bucket_size=1000)

    keyed, keys = D._group_keys(corpus.select("doc_id", "text"), "text", "fingerprint")
    timed(spark, "fuzzy/0-keyed", lambda: noop(keyed))
    reps = D.exact_rep_table(keyed, keys, "doc_id")
    timed(spark, "fuzzy/1-reps", lambda: noop(reps))
    reps_tx = reps.select("doc_id", "text")
    b = D.minhash_lsh_buckets(reps_tx, n=3, num_hashes=8, bands=4)
    timed(spark, "fuzzy/2-buckets", lambda: noop(b))
    cands = D.candidate_pairs_from_buckets(b, max_bucket_size=1000)
    timed(spark, "fuzzy/3-cands", lambda: noop(cands))
    edges = D.verified_near_dup_edges(reps_tx, **kw)
    timed(spark, "fuzzy/4-edges", lambda: noop(edges))
    timed(spark, "fuzzy/5-cc", lambda: D.connected_components(edges).count(), reps=2)
    timed(
        spark,
        "fuzzy/6-full",
        lambda: D.fuzzy_dedup_assign(corpus, **kw)
        .filter(F.col("doc_id") != F.col("canonical_id"))
        .count(),
    )
    save_plan(D.fuzzy_dedup_assign(corpus, **kw), "dedup_fuzzy_assign_before")


def prof_windows(spark, tmp):
    from rastr_spark.functions.dedup import duplicated_window_stats

    corpus = make_fuzzy_corpus(spark, tmp)
    # decompose: window hashing alone, then explode+groupBy, then full
    from rastr_spark.functions.text import tokens

    th = F.transform(tokens(F.col("text")), lambda t: F.xxhash64(t))
    n = F.size(th)
    window = 16

    def win_hash(i):
        return F.xxhash64(*[F.element_at(th, i + k + 1) for k in range(window)])

    win_expr = F.transform(F.sequence(F.lit(0), n - window), win_hash)
    wins = corpus.select(
        "doc_id",
        F.when(n >= window, F.array_distinct(win_expr))
        .otherwise(F.array().cast("array<bigint>"))
        .alias("ws"),
    )
    timed(spark, "windows/0-hash-only", lambda: noop(wins))
    exploded = wins.select("doc_id", F.explode("ws").alias("wh"))
    timed(spark, "windows/1-explode", lambda: noop(exploded))
    shared = exploded.groupBy("wh").agg(F.count("*").alias("nd")).filter(F.col("nd") > 1)
    timed(spark, "windows/2-shared", lambda: print("  shared rows:", shared.count()))
    full = duplicated_window_stats(corpus, window=16)
    timed(
        spark,
        "windows/3-full",
        lambda: duplicated_window_stats(corpus, window=16)
        .agg(F.sum("n_dup_windows"), F.sum("n_windows"))
        .collect(),
    )
    save_plan(full, "text_dup_windows_before")


def prof_curate(spark, tmp):
    from rastr_spark.plans.datapipe import curate_corpus

    corpus = make_fuzzy_corpus(spark, tmp)
    timed(
        spark,
        "curate/full-200k",
        lambda: curate_corpus(
            corpus, min_quality=0.5, langs=("en", "unk"), n=3,
            num_hashes=8, bands=4, jaccard_threshold=0.8, max_bucket_size=1000,
        )
        .filter(F.col("keep"))
        .agg(F.count("*"), F.sum("bpe_tokens"))
        .collect(),
    )


def _bench_raster(spark):
    import bench as B

    rf = B.build_bench_raster(spark)
    from rastr_spark.tiles import RasterFrame

    rf = RasterFrame(rf.df.cache(), rf.meta, rf.raster_id)
    rf.df.count()
    return rf


def prof_stencil(spark, tmp):
    import bench as B
    from rastr_spark.operators.stencils import extrapolate
    from rastr_spark.tiles import RasterFrame

    rf = _bench_raster(spark)
    timed(spark, "stencil/blur", lambda: rf.blur(2 * B.BENCH_CELL, preserve_nan=True).df.count())
    timed(spark, "stencil/blur-nonan", lambda: rf.blur(2 * B.BENCH_CELL, preserve_nan=False).df.count())
    timed(spark, "stencil/dilate", lambda: rf.dilate(2 * B.BENCH_CELL).df.count())
    timed(spark, "stencil/sobel", lambda: rf.sobel().df.count())
    sparse = RasterFrame(
        rf.df.select(
            "raster_id", "tile_row", "tile_col", "cell_id",
            F.transform(
                "values", lambda v, i: F.when(i == 0, v).otherwise(F.lit(float("nan")))
            ).alias("values"),
        ).cache(),
        B.BENCH_META,
        "bench_sparse",
    )
    sparse.df.count()
    timed(spark, "stencil/extrapolate-sparse", lambda: extrapolate(sparse).df.count())
    save_plan(rf.dilate(2 * B.BENCH_CELL).df, "raster_dilate_before")
    save_plan(rf.blur(2 * B.BENCH_CELL, preserve_nan=True).df, "raster_blur_before")


def prof_flagship(spark, tmp):
    import bench as B
    from rastr_spark.plans.flagship import doc_zonal_stats, tile_zone_partials
    from rastr_spark.sources.documents import generate_documents

    rf = _bench_raster(spark)
    generate_documents(
        spark, 1000000, seed=42, n_tile_rows=B.BENCH_META.n_tile_rows,
        n_tile_cols=B.BENCH_META.n_tile_cols, raster_id="bench", world_size=B.BENCH_WORLD,
    ).write.mode("overwrite").parquet(f"{tmp}/documents")
    docs = spark.read.parquet(f"{tmp}/documents")
    zones = B.bench_zones()
    from rastr_spark.sources.documents import media_refs

    refs = media_refs(docs).filter(F.col("raster_id") == rf.raster_id)
    timed(spark, "flagship/0-refs", lambda: noop(refs))
    partials = tile_zone_partials(rf, zones)
    timed(spark, "flagship/1-partials", lambda: noop(partials))
    timed(
        spark,
        "flagship/2-full",
        lambda: doc_zonal_stats(docs, rf, zones, salt_threshold=20000).count(),
        reps=5,
    )
    save_plan(doc_zonal_stats(docs, rf, zones, salt_threshold=20000), "flagship_doc_zonal_before")


def prof_sf(spark, tmp):
    import __spark_entry__ as E
    from rastr_spark.functions.dedup import minhash_candidate_pairs, ngram_jaccard_pairs

    qs = E.queries()
    sf_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    timed(
        spark, "sf/minhash_fast",
        lambda: minhash_candidate_pairs(sf_docs, n=3, num_hashes=8, bands=4).count(),
    )
    timed(
        spark, "sf/jaccard_fast",
        lambda: ngram_jaccard_pairs(
            sf_docs, n=3, threshold=0.5, max_doc_freq=50, hash_grams=True
        ).count(),
    )
    for name in [
        "raster_zonal_stats", "raster_sample_points", "raster_add", "raster_knn",
        "dedup_ngram_jaccard", "sim_embedding_topk", "text_token_stats",
        "tpch_q1_pricing_summary",
    ]:
        timed(spark, f"sf/{name}", lambda name=name: qs[name](spark, SF_DIR).count())


STAGES = {
    "fuzzy": prof_fuzzy,
    "windows": prof_windows,
    "curate": prof_curate,
    "stencil": prof_stencil,
    "flagship": prof_flagship,
    "sf": prof_sf,
}


def main():
    import shutil
    import tempfile

    which = sys.argv[1:] or list(STAGES)
    spark = session()
    tmp = tempfile.mkdtemp(prefix="prof_r07_")
    try:
        for w in which:
            print(f"=== stage {w} ===", flush=True)
            STAGES[w](spark, tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
