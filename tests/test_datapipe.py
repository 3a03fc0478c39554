"""Composed curation pipeline (plans/datapipe.py): quality gate → dedup →
token budgeting → keep decision."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from rastr_spark.plans.datapipe import curate_corpus


class TestCurateCorpus:
    def test_end_to_end_decisions(self, spark):
        good = "the quick brown fox jumps over the lazy dog and runs on for a while longer"
        rows = [
            (0, good),                          # keeper (en, quality passes)
            (1, good),                          # exact dup of 0 → dropped
            (2, good + " extra"),               # near dup of 0 → dropped
            (3, "short text"),                  # quality reject (too few tokens)
            (4, "ein text ohne englische stoppwoerter aber mit vielen langen woertern hier drin ja"),  # lang reject
            (5, "the second keeper document is about morton codes and it is long enough for the gate to pass"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r["doc_id"]: r
            for r in curate_corpus(
                docs, min_quality=0.5, langs=("en",), n=3, num_hashes=8,
                bands=4, jaccard_threshold=0.5,
            ).collect()
        }
        assert out[0]["keep"] and out[0]["canonical_id"] == 0
        assert not out[1]["keep"] and out[1]["canonical_id"] == 0
        assert not out[2]["keep"] and out[2]["canonical_id"] == 0
        assert not out[3]["keep"] and out[3]["canonical_id"] is None  # rejected pre-dedup
        assert not out[4]["keep"] and out[4]["canonical_id"] is None
        assert out[5]["keep"] and out[5]["canonical_id"] == 5
        # token budget of the curated corpus = sum over keepers
        assert all(out[i]["bpe_tokens"] >= out[i]["ws_tokens"] for i in out)

    def test_budget_aggregation(self, spark):
        docs = spark.createDataFrame(
            [(i, f"the quick brown fox number {i} jumps over the lazy dog repeatedly today") for i in range(20)],
            "doc_id long, text string",
        )
        out = curate_corpus(docs, min_quality=0.5, langs=("en",))
        budget = (
            out.filter("keep").agg(F.sum("bpe_tokens").alias("b")).collect()[0]["b"]
        )
        assert budget > 0
