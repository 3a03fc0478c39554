"""Training-data curation pipeline: the composed workflow a corpus owner runs.

One declarative plan over a raw document table:

    quality/lang annotation → exact dedup (min-id survivor) → fuzzy near-dup
    clustering → token budgeting → per-doc keep/drop decision

Every stage is an already-oracled operator (functions/text.py,
functions/dedup.py). Execution shape: the annotation/filter/join stages are
lazy Catalyst plans; the fuzzy-dedup stage's connected-components loop is
EAGER (it runs a few small Spark jobs at ``curate_corpus`` call time to reach
the label fixpoint — see connected_components), with the resulting component
table held in a GC-bounded localCheckpoint. Total cost is a handful of
shuffles regardless of corpus size: one groupBy(text) for the exact pass, the
LSH banding joins for the fuzzy pass, and one final join back to the
annotations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dedup import fuzzy_dedup_assign
from ..functions.text import bpe_token_count, lang_id, quality_score, token_count


def curate_corpus(
    docs: DataFrame,
    *,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    jaccard_threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_family: str = "xxhash64",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Per-doc curation decision table.

    Returns (doc_id, quality, lang, bpe_tokens, ws_tokens, canonical_id, keep):

    - ``canonical_id``: the doc's near-dup cluster representative
      (fuzzy_dedup_assign — exact pre-pass + LSH + Jaccard verify + connected
      components), computed over the quality/lang-passing subset only (there
      is no reason to pay LSH for docs already rejected).
    - ``keep``: passes the quality floor AND the language allowlist AND is its
      cluster's canonical member. ``sum(bpe_tokens) WHERE keep`` is the
      training-token budget of the curated corpus.
    """
    annotated = docs.select(
        id_col,
        text_col,
        quality_score(F.col(text_col)).alias("quality"),
        lang_id(F.col(text_col)).alias("lang"),
        bpe_token_count(F.col(text_col)).cast("long").alias("bpe_tokens"),
        token_count(F.col(text_col)).cast("long").alias("ws_tokens"),
    )
    passing = annotated.filter(
        (F.col("quality") >= min_quality) & (F.col("lang").isin(list(langs)))
    ).select(id_col, text_col)
    assign = fuzzy_dedup_assign(
        passing, n=n, num_hashes=num_hashes, bands=bands,
        threshold=jaccard_threshold, id_col=id_col, text_col=text_col,
        hash_family=hash_family, max_bucket_size=max_bucket_size,
    )
    out = annotated.join(assign, id_col, "left")
    return out.select(
        id_col,
        "quality",
        "lang",
        "bpe_tokens",
        "ws_tokens",
        "canonical_id",  # NULL = rejected before dedup
        (
            F.col("canonical_id").isNotNull()
            & (F.col("canonical_id") == F.col(id_col))
        ).alias("keep"),
    )
