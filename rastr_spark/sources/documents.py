"""The north-rule input: an Iceberg-style table of interleaved text+media documents.

Schema (BASELINE.json ``input_hint``):

    doc_id: string,
    spans:  array<struct<kind: string, text: string, media_ref: string, offset: int>>

- ``kind == "media"`` spans carry ``media_ref = "raster_id/tile_row/tile_col"``
  resolving to rows of the tile table.
- ``kind == "text"`` spans carry a serialized geometry (geometry.Geometry.encode)
  in ``text``.

The generator is fully distributed and deterministic: every column is a pure
function of (doc_id, span index) via splittable hash arithmetic on ``spark.range``
— no driver-side data, no RNG state, so the same (n_docs, seed) always produces
bit-identical tables at any parallelism. Span placement over tiles is Zipfian to
exercise the salting path (FIXTURES.md §1).

Span-sequence invariant (input_hint): per-doc ``(kind, text, media_ref, order)``
must survive every stage — ``span_fingerprint`` computes a per-doc order-sensitive
hash; ``assert_span_invariant`` compares two stages' tables distributively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = (
    "doc_id string, spans array<struct<kind: string, text: string, media_ref: string, offset: int>>"
)


def _h(col: Column, salt: int) -> Column:
    """Deterministic non-negative 63-bit hash as a JVM expression (xxhash64 is
    Spark's builtin splittable hash — overflow-safe under ANSI mode)."""
    return F.abs(F.xxhash64(col.cast("long"), F.lit(int(salt))))


def generate_documents(
    spark: SparkSession,
    n_docs: int,
    *,
    seed: int = 42,
    max_spans: int = 16,
    n_tile_rows: int = 16,
    n_tile_cols: int = 16,
    raster_id: str = "r0",
    world_size: float = 512.0,
    zipf_sharpness: int = 4,
) -> DataFrame:
    """Deterministic interleaved document table.

    Zipfian tile skew: each media span's tile index is min of ``zipf_sharpness``
    independent uniform draws — a cheap heavy-head distribution that concentrates
    mass on low tile indices (hot cells) without any non-JVM code.
    """
    def span_expr(i, j):
        """One span struct as a pure expression of (doc index, span index)."""
        key = i * F.lit(max_spans * 2 + 1) + j.cast("long")
        is_media = (_h(key, seed + 1) % 2) == 0
        # Zipfian-ish tile: min of k uniforms over the tile grid
        draws = [
            _h(key, seed + 10 + d) % (n_tile_rows * n_tile_cols) for d in range(zipf_sharpness)
        ]
        tile_idx = F.least(*draws)
        tile_row = (tile_idx / n_tile_cols).cast("int")
        tile_col = (tile_idx % n_tile_cols).cast("int")
        media_ref = F.concat_ws(
            "/", F.lit(raster_id), tile_row.cast("string"), tile_col.cast("string")
        )
        # text spans: a small axis-aligned box geometry, deterministic from the key
        bx = (_h(key, seed + 20) % 1000).cast("double") / 1000.0 * (world_size * 0.9)
        by = (_h(key, seed + 21) % 1000).cast("double") / 1000.0 * (world_size * 0.9)
        bw = (_h(key, seed + 22) % 100).cast("double") / 100.0 * (world_size * 0.1) + 1.0
        x0, y0, x1, y1 = bx, by, bx + bw, by + bw
        geom_text = F.concat_ws(
            ";",
            F.lit("polygon"),
            F.concat_ws(
                ",",
                x0.cast("string"), y0.cast("string"),
                x1.cast("string"), y0.cast("string"),
                x1.cast("string"), y1.cast("string"),
                x0.cast("string"), y1.cast("string"),
                x0.cast("string"), y0.cast("string"),
            ),
            F.lit("0,5"),
            F.lit("0,1"),
        )
        return F.struct(
            F.when(is_media, F.lit("media")).otherwise(F.lit("text")).alias("kind"),
            F.when(is_media, F.lit(None).cast("string")).otherwise(geom_text).alias("text"),
            F.when(is_media, media_ref).otherwise(F.lit(None).cast("string")).alias("media_ref"),
            j.cast("int").alias("offset"),
        )

    # Shuffle-free: the spans array is built in place with transform(sequence(...)) —
    # an explode→groupBy→collect_list formulation would shuffle every span row
    # (measured: it dominated the flagship wall time and killed scaling at 10⁷ docs).
    docs = spark.range(n_docs).select(F.col("id").alias("i"))
    n_spans = (_h(F.col("i"), seed) % (max_spans - 1) + 1).cast("int")
    return docs.select(
        F.concat(F.lit("doc-"), F.col("i").cast("string")).alias("doc_id"),
        F.transform(
            F.sequence(F.lit(0), n_spans - 1), lambda j: span_expr(F.col("i"), j)
        ).alias("spans"),
    )


def explode_spans(docs: DataFrame) -> DataFrame:
    """doc_id, offset-ordered span columns + original position (the carrier of the
    span-sequence invariant through downstream stages)."""
    return docs.select("doc_id", F.posexplode("spans").alias("pos", "span")).select(
        "doc_id",
        "pos",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def media_refs(docs: DataFrame) -> DataFrame:
    """Resolve media spans to tile keys: (doc_id, pos, raster_id, tile_row, tile_col)."""
    s = explode_spans(docs).filter(F.col("kind") == "media")
    parts = F.split("media_ref", "/")
    return s.select(
        "doc_id",
        "pos",
        parts.getItem(0).alias("raster_id"),
        parts.getItem(1).cast("int").alias("tile_row"),
        parts.getItem(2).cast("int").alias("tile_col"),
    )


def text_span_geometries(docs: DataFrame) -> DataFrame:
    """Geometry ingestion from text spans (SURVEY §2.1: CAD-read replacement).

    Decodes the ``kind;coords;rings;parts`` text payload to (doc_id, pos, kind,
    bbox) entirely JVM-side: split + transform/cast + aggregate for the bbox —
    the full flat-coords struct is only materialized in kernels that need it.
    """
    s = explode_spans(docs).filter(F.col("kind") == "text")
    parts = F.split("text", ";")
    coords = F.transform(F.split(parts.getItem(1), ","), lambda v: v.cast("double"))
    n = F.size(coords)
    idx = F.sequence(F.lit(0), (n / 2).cast("int") - 1)  # sequence needs integral bounds
    xs = F.transform(idx, lambda i: F.element_at(coords, i * 2 + 1))
    ys = F.transform(idx, lambda i: F.element_at(coords, i * 2 + 2))
    return s.select(
        "doc_id",
        "pos",
        parts.getItem(0).alias("geom_kind"),
        F.array_min(xs).alias("xmin"),
        F.array_min(ys).alias("ymin"),
        F.array_max(xs).alias("xmax"),
        F.array_max(ys).alias("ymax"),
        F.col("text").alias("geom_encoded"),
    )


def span_fingerprint(docs: DataFrame) -> DataFrame:
    """Per-doc order-sensitive hash of (kind, text, media_ref, order).

    xxhash64 over the concatenated ordered span encoding — one row per doc,
    comparable across stages with a single anti-join.
    """
    enc = F.transform(
        "spans",
        lambda s: F.concat_ws(
            "\x1f",
            s["kind"],
            F.coalesce(s["text"], F.lit("\x00")),
            F.coalesce(s["media_ref"], F.lit("\x00")),
            s["offset"].cast("string"),
        ),
    )
    return docs.select(
        "doc_id", F.xxhash64(F.concat_ws("\x1e", enc)).alias("span_fp")
    )


def assert_span_invariant(before: DataFrame, after: DataFrame) -> None:
    """Distributed span-sequence equality check (input_hint contract): same doc set,
    same per-doc fingerprint. Raises AssertionError with a sample of violations."""
    a = span_fingerprint(before).alias("a")
    b = span_fingerprint(after).alias("b")
    bad = (
        a.join(b, "doc_id", "full")
        .filter(
            F.col("a.span_fp").isNull()
            | F.col("b.span_fp").isNull()
            | (F.col("a.span_fp") != F.col("b.span_fp"))
        )
        .limit(5)
        .collect()
    )
    if bad:
        raise AssertionError(f"span-sequence invariant violated for docs: {[r['doc_id'] for r in bad]}")


def generate_text_corpus(
    spark: SparkSession,
    n_docs: int,
    *,
    seed: int = 7,
    n_words: int = 40,
    vocab: int = 50_000,
    dup_every: int = 10,
) -> DataFrame:
    """Deterministic synthetic text corpus for dedup benchmarks: (doc_id, text).

    Fully distributed (spark.range + JVM expressions, no driver data). Every
    ``dup_every``-th doc is an exact duplicate of its predecessor (content_id
    collapses), so MinHash/LSH buckets see realistic collisions. Word j of doc d
    is ``"w" + (xxhash64(content_id, j, seed) mod vocab)`` — same (n_docs, seed)
    always yields a bit-identical corpus at any parallelism.
    """
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    content_id = F.when(
        (F.pmod(F.col("doc_id"), F.lit(int(dup_every))) == F.lit(int(dup_every - 1)))
        & (F.col("doc_id") > 0),
        F.col("doc_id") - 1,
    ).otherwise(F.col("doc_id"))
    d = base.select("doc_id", content_id.alias("_cid"))
    words = F.transform(
        F.sequence(F.lit(0), F.lit(int(n_words - 1))),
        lambda j: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("_cid"), j.cast("long"), F.lit(int(seed))), F.lit(int(vocab))).cast(
                "string"
            ),
        ),
    )
    return d.select("doc_id", F.concat_ws(" ", words).alias("text"))
