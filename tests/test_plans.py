"""Physical-plan regression tests: the properties that make the engine hold at
100 TB are asserted on `.explain` output, not just claimed in docstrings —
no cartesian products in core joins, broadcast where intended, salt keys in the
skew path, parquet filter pushdown + column pruning, whole-stage codegen on the
elementwise hot path."""

import contextlib
import io

import numpy as np
import pytest
from pyspark.sql import functions as F

import rastr_spark  # noqa: F401
from rastr_spark.geometry import Geometry
from rastr_spark.meta import Affine, RasterMeta
from rastr_spark.tiles import RasterFrame

SF001 = "/root/testdata/sf0.01"


def plan(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@pytest.fixture()
def rf(spark):
    meta = RasterMeta(1.0, "EPSG:2193", Affine(1, 0, 0, 0, -1, 8), 8, 8, tile_size=4)
    return RasterFrame.from_numpy(spark, np.arange(64.0).reshape(8, 8), meta)


class TestJoinShapes:
    def test_no_cartesian_in_core_joins(self, spark, rf):
        from rastr_spark.functions.dedup import minhash_lsh_buckets, ngram_jaccard_pairs
        from rastr_spark.operators.joins import knn_join, zonal_stats

        docs = spark.createDataFrame([(0, "a b c d"), (1, "a b c e")], "doc_id long, text string")
        pts = spark.createDataFrame([(0, 1.0, 1.0)], "query_id long, x double, y double")
        pool = spark.createDataFrame([(2.0, 2.0), (5.0, 5.0)], "x double, y double")
        from rastr_spark.functions.dedup import fuzzy_dedup_assign

        plans = {
            "zonal": plan(zonal_stats(rf, [("z", Geometry.box(0, 0, 4, 4))])),
            "minhash_pairs": plan(
                minhash_lsh_buckets(docs, n=2, num_hashes=4, bands=2)
            ),
            "jaccard": plan(ngram_jaccard_pairs(docs, n=2, threshold=0.1, max_doc_freq=10)),
            "knn": plan(knn_join(pool, pts, 1, cell_size=4.0, max_rounds=1)),
            "fuzzy": plan(fuzzy_dedup_assign(docs, n=2, num_hashes=4, bands=2)),
        }
        for name, p in plans.items():
            assert "CartesianProduct" not in p, f"{name} plan degraded to cartesian:\n{p}"

    def test_flagship_salt_key_in_plan(self, spark, rf):
        from rastr_spark.plans.flagship import doc_zonal_stats
        from rastr_spark.sources.documents import generate_documents

        docs = generate_documents(spark, 50, seed=1, n_tile_rows=2, n_tile_cols=2)
        salted = doc_zonal_stats(docs, rf, [("z", Geometry.box(0, 0, 8, 8))], salt_threshold=1)
        p = plan(salted)
        assert "salt" in p, f"salted flagship plan lost its salt key:\n{p}"

    def test_mosaic_and_resample_shapes(self, spark, rf):
        from rastr_spark.meta import Affine, RasterMeta
        from rastr_spark.operators.joins import mosaic
        from rastr_spark.operators.resample import resample

        m = plan(mosaic([rf, rf]).df)
        assert "CartesianProduct" not in m and "NestedLoop" not in m, m
        r = plan(resample(rf, 2.0).df)
        assert "CartesianProduct" not in r and "NestedLoop" not in r, r

    def test_sample_join_is_hash_based(self, spark, rf):
        from rastr_spark.operators.joins import sample_df

        pts = spark.createDataFrame([(1.5, 2.5)], "x double, y double")
        p = plan(sample_df(rf, pts))
        assert "BroadcastHashJoin" in p or "SortMergeJoin" in p or "ShuffledHashJoin" in p, p
        assert "NestedLoop" not in p and "CartesianProduct" not in p, p


class TestScanShapes:
    def test_parquet_filter_pushdown(self, spark):
        li = spark.read.parquet(f"{SF001}/lineitem.parquet")
        q = li.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
        p = plan(q)
        assert "PushedFilters" in p and "l_quantity" in p.split("PushedFilters")[1][:200], p

    def test_parquet_column_pruning(self, spark):
        li = spark.read.parquet(f"{SF001}/lineitem.parquet")
        q = li.select("l_orderkey", "l_quantity")
        p = plan(q)
        read_schema = p.split("ReadSchema:")[1].splitlines()[0]
        assert "l_orderkey" in read_schema and "l_quantity" in read_schema
        assert "l_comment" not in read_schema, f"scan reads pruned columns: {read_schema}"

    def test_tile_store_partition_pruning(self, spark, rf, tmp_path):
        from rastr_spark.sources.io import read_raster, write_raster

        write_raster(rf, tmp_path / "r")
        back = read_raster(spark, tmp_path / "r")
        q = back.df.filter(F.col("cell_id") == 0)
        p = plan(q)
        assert "PartitionFilters" in p and "cell_id" in p.split("PartitionFilters")[1][:120], p


class TestCodegen:
    def test_elementwise_chain_fuses_jvm_side(self, spark, rf):
        # three chained ops must FUSE into one JVM Project of nested transforms
        # (no Python eval, no extra stages) — Catalyst collapses the lambda chain
        out = ((rf + 1.0) * 2.0).clamp(0.0, 100.0)
        p = plan(out.df)
        assert p.count("Project") >= 1 and "transform(transform(transform" in p.replace(" ", ""), (
            f"elementwise chain did not fuse:\n{p}"
        )
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, (
            f"float64 elementwise path must not touch Python:\n{p}"
        )
        assert "Exchange" not in p, f"elementwise chain must be shuffle-free:\n{p}"

    def test_minhash_fast_path_is_jvm_only(self, spark):
        from rastr_spark.functions.dedup import minhash_lsh_buckets

        docs = spark.createDataFrame([(0, "a b c d e")], "doc_id long, text string")
        p = plan(minhash_lsh_buckets(docs, n=2, num_hashes=4, bands=2))
        assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p


class TestFingerprintShuffleKeys:
    """At 100 TB the exact-dedup groupBy and the fuzzy rep join-back must key
    their shuffles on the fixed-width 128-bit fingerprint, never the document
    bytes — text travels as VALUES into LSH exactly once."""

    def _hash_part_lines(self, p: str) -> list[str]:
        return [ln for ln in p.splitlines() if "hashpartitioning" in ln]

    def test_dedup_exact_keys_on_fingerprint(self, spark):
        from rastr_spark.functions.dedup import dedup_exact

        docs = spark.createDataFrame(
            [(0, "alpha beta"), (1, "alpha beta"), (2, "gamma")], "doc_id long, text string"
        )
        p = plan(dedup_exact(docs))
        lines = self._hash_part_lines(p)
        assert lines, f"expected a hash shuffle in the dedup plan:\n{p}"
        assert any("_fp1" in ln for ln in lines), f"fingerprint key missing:\n{p}"
        assert all("text#" not in ln for ln in lines), (
            f"document text used as a shuffle key:\n{p}"
        )

    def test_dedup_exact_text_mode_still_available(self, spark):
        from rastr_spark.functions.dedup import dedup_exact

        docs = spark.createDataFrame([(0, "a"), (1, "a")], "doc_id long, text string")
        p = plan(dedup_exact(docs, key="text"))
        assert any("text#" in ln for ln in self._hash_part_lines(p)), p

    def test_fuzzy_rep_mapping_keys_on_fingerprint(self, spark):
        from rastr_spark.functions.dedup import fuzzy_dedup_assign

        docs = spark.createDataFrame(
            [(0, "a b c d"), (1, "a b c d"), (2, "a b c e f")], "doc_id long, text string"
        )
        p = plan(fuzzy_dedup_assign(docs, n=2, num_hashes=4, bands=2))
        lines = self._hash_part_lines(p)
        assert lines and all("text#" not in ln for ln in lines), (
            f"fuzzy pipeline shuffles document text as a key:\n{p}"
        )


class TestBucketedStore:
    def test_bucketed_raster_add_is_shuffle_free(self, spark, rf, tmp_path):
        # the 100 TB co-location path: two rasters bucketed on the tile key join
        # with NO Exchange on either side
        from rastr_spark.sources.io import read_raster_bucketed, write_raster_bucketed

        # warehouse.dir is a static conf — managed tables land in ./spark-warehouse
        # (gitignored) and are dropped below
        write_raster_bucketed(rf, "rb_a", n_buckets=4)
        write_raster_bucketed(rf, "rb_b", n_buckets=4)
        a = read_raster_bucketed(spark, "rb_a")
        b = read_raster_bucketed(spark, "rb_b")
        assert a.meta == rf.meta
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            out = a + b
            p = plan(out.df)
            assert "Exchange" not in p, f"bucketed aligned add still shuffles:\n{p}"
            np.testing.assert_array_equal(out.to_numpy(), rf.to_numpy() * 2)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.sql("DROP TABLE IF EXISTS rb_a")
            spark.sql("DROP TABLE IF EXISTS rb_b")


class TestFlagshipBroadcastGuard:
    """VERDICT r2 item 2: the partials-side broadcast hint must be dropped when
    the driver-side row bound (n_tiles × n_zones) exceeds
    BROADCAST_PARTIALS_MAX_ROWS — at 10⁶+ tiles the 'bounded by construction'
    side no longer fits a broadcast."""

    def _refs_partials(self, spark, rf):
        from rastr_spark.plans.flagship import tile_zone_partials
        from rastr_spark.sources.documents import generate_documents, media_refs

        docs = generate_documents(spark, 50, seed=1, n_tile_rows=2, n_tile_cols=2)
        refs = media_refs(docs)
        partials = tile_zone_partials(rf, [("z", Geometry.box(0, 0, 8, 8))])
        return refs, partials

    def test_broadcast_below_bound_shuffle_above(self, spark, rf):
        from rastr_spark.plans.flagship import (
            BROADCAST_PARTIALS_MAX_ROWS,
            _join_refs_partials,
        )

        refs, partials = self._refs_partials(spark, rf)
        # threshold -1 isolates the HINT: without it Catalyst's stats-based
        # choice would broadcast the tiny test refs side on its own
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            below = plan(_join_refs_partials(refs, partials, partials_rows_bound=4))
            assert "BroadcastHashJoin" in below, (
                f"small partials side lost its broadcast:\n{below}"
            )
            above = plan(
                _join_refs_partials(
                    refs, partials, partials_rows_bound=BROADCAST_PARTIALS_MAX_ROWS + 1
                )
            )
            assert "BroadcastHashJoin" not in above, (
                f"partials side above the bound must NOT be broadcast-planned:\n{above}"
            )
            assert "SortMergeJoin" in above or "ShuffledHashJoin" in above, above
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    def test_results_identical_across_guard(self, spark, rf):
        from rastr_spark.plans.flagship import _join_refs_partials

        refs, partials = self._refs_partials(spark, rf)
        a = _join_refs_partials(refs, partials, salt_threshold=1, partials_rows_bound=4)
        b = _join_refs_partials(refs, partials, salt_threshold=1, partials_rows_bound=10**9)
        ra = sorted(map(tuple, a.collect()))
        rb = sorted(map(tuple, b.collect()))
        assert ra == rb and len(ra) > 0


class TestCropPartitionPruning:
    def test_bbox_crop_prunes_store_partitions(self, spark, rf, tmp_path):
        # VERDICT r2 item 9: a bbox crop over a persisted cell_id-partitioned
        # store must prune at the FILE level (PartitionFilters on cell_id
        # ranges), not just filter tile_row/tile_col after reading every footer
        from rastr_spark.sources.io import read_raster, write_raster

        write_raster(rf, tmp_path / "r")
        back = read_raster(spark, tmp_path / "r")
        q = back.crop((0.0, 4.0, 4.0, 8.0))  # top-left quarter → tile (0,0) only
        p = plan(q.df)
        assert "PartitionFilters" in p, p
        seg = p.split("PartitionFilters")[1][:300]
        assert "cell_id" in seg, f"crop did not push cell_id ranges to the scan:\n{seg}"
        np.testing.assert_array_equal(
            q.to_numpy(), np.arange(64.0).reshape(8, 8)[:4, :4]
        )
