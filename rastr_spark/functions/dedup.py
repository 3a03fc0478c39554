"""Deduplication operators for web-scale corpora.

Four families (all distributed, shuffle-aware):

- **exact**: hash-groupBy on normalized text — one shuffle keyed by the hash; the
  canonical survivor is min(doc_id) (deterministic).
- **n-gram Jaccard**: shingle → explode → self-equi-join on shingle → per-pair
  intersection counts → Jaccard = ∩ / (|A|+|B|−∩). The join is on gram (never a
  cartesian); hot grams can be frequency-capped.
- **MinHash + LSH**: signature = per-hash-function MIN over shingle hashes. Hash
  family = md5(gram || ':' || i) — *portable*: identical strings in Spark and
  DuckDB, so the driver's oracle can reproduce signatures bit-for-bit. Banding
  buckets docs by (band_idx, band_value); candidate pairs share ≥1 bucket.
- **SimHash**: 64-bit sign-aggregated token hashes; near-dups = equal simhash
  (or small Hamming distance via band rotation).

At the 10^12-doc regime: exact + LSH are the scale paths (linear, bounded fan-out);
full Jaccard runs only on LSH candidates. Embedding near-dup lives in similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens, word_ngrams


def exact_duplicates(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical texts: (canonical_id, dup_count), dup_count ≥ 2."""
    return (
        docs.groupBy(F.col(text_col).alias("_t"))
        .agg(F.min(id_col).alias("canonical_id"), F.count("*").alias("dup_count"))
        .filter(F.col("dup_count") >= 2)
        .drop("_t")
    )


def dedup_exact(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one row per distinct text — min(id) survivor, deterministic."""
    w_ids = docs.groupBy(text_col).agg(F.min(id_col).alias(id_col))
    return docs.join(w_ids, [text_col, id_col], "left_semi")


def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    n: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate pairs (id_a < id_b) with word-n-gram Jaccard ≥ threshold.

    Shuffle profile: one explode (docs × grams), one equi-join on gram, one
    groupBy pair. Skew guard: grams shared by more than ``2^31`` docs would need
    capping — left to the caller's corpus stats at extreme scale.
    """
    grams = docs.select(
        F.col(id_col).alias("id"), F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
    )
    sizes = grams.groupBy("id").agg(F.count("*").alias("n_grams"))
    a = grams.alias("a")
    b = grams.alias("b")
    inter = (
        a.join(b, "gram")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_grams", "na"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_grams", "nb"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_signature(text: Column, *, n: int = 3, num_hashes: int = 16) -> Column:
    """MinHash signature as array<string>: element i = min(md5(gram || ':' || i)).

    md5-as-hex-string MIN is portable across Spark and DuckDB (both lowercase hex)
    — chosen so the correctness oracle can verify signatures exactly. Swap for
    xxhash64 ints for raw speed in production.
    """
    grams = word_ngrams(text, n)

    def _min_hash(i: int):
        # one-arg lambda only: a 2-param lambda would be bound as (element, index)
        return F.array_min(F.transform(grams, lambda g: F.md5(F.concat(g, F.lit(f":{i}")))))

    return F.array(*[_min_hash(i) for i in range(num_hashes)])


def minhash_lsh_buckets(
    docs: DataFrame,
    *,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(band, bucket, id) rows: docs sharing a bucket are near-dup candidates."""
    rows_per_band = num_hashes // bands
    # materialize grams ONCE as a column — inlining word_ngrams into each of the
    # num_hashes min-hash expressions would re-tokenize the document per hash fn
    grams_df = docs.select(
        F.col(id_col).alias("id"), word_ngrams(F.col(text_col), n).alias("grams")
    ).filter(F.size("grams") > 0)

    def _min_hash(i: int):
        return F.array_min(F.transform("grams", lambda g: F.md5(F.concat(g, F.lit(f":{i}")))))

    d = grams_df.select("id", F.array(*[_min_hash(i) for i in range(num_hashes)]).alias("sig"))
    bands_arr = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.concat_ws("|", F.slice("sig", bi * rows_per_band + 1, rows_per_band)).alias("bucket"),
            )
            for bi in range(bands)
        ]
    )
    return d.select("id", F.explode(bands_arr).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def minhash_candidate_pairs(
    docs: DataFrame, *, n: int = 3, num_hashes: int = 16, bands: int = 4,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Distinct candidate pairs from shared LSH buckets (id_a < id_b)."""
    b = minhash_lsh_buckets(docs, n=n, num_hashes=num_hashes, bands=bands, id_col=id_col, text_col=text_col)
    a, c = b.alias("a"), b.alias("b")
    return (
        a.join(c, ["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def simhash64(text: Column) -> Column:
    """64-bit SimHash over tokens: bit j = sign of Σ_tokens (±1 by token-hash bit j).

    JVM-only: per-token xxhash64, per-bit contribution via shiftright/bit-and,
    aggregated with higher-order functions.
    """
    toks = tokens(text)
    th = F.transform(toks, lambda t: F.xxhash64(t))

    def _bit_sum(j: int):
        # closure factory: Spark inspects lambda arity, so the bit index must be
        # captured outside the 2-arg merge lambda
        def merge(acc, h):
            return acc + F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1))

        return F.aggregate(th, F.lit(0).cast("long"), merge)

    bit_sums = [_bit_sum(j) for j in range(64)]
    out = F.lit(0).cast("long")
    for j, s in enumerate(bit_sums):
        out = out + F.when(s > 0, F.lit(1 << j if j < 63 else -(1 << 63)).cast("long")).otherwise(F.lit(0))
    return out


def simhash_groups(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Docs grouped by identical simhash (near-dup clusters at Hamming distance 0)."""
    return (
        docs.select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("simhash"))
        .groupBy("simhash")
        .agg(F.count("*").alias("n"), F.min("id").alias("canonical_id"))
        .filter(F.col("n") >= 2)
    )
