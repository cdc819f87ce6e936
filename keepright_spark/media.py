"""Multimodal (media-span) operators over the interleaved docs table.

The input docs interleave text and media spans (BASELINE.json
input_hint); the relational decode (codec.py) carries media spans
through untouched (pass-through invariant, tests/test_codec.py).
These operators *compute over* the media column — the engine-grade
analogs of a training-data pipeline's media bookkeeping:

* ``media_view``    — media spans as a relational view
  (object_type, id, mime, caption, media_ref, offset), native
  explode/split only.
* ``tiled_media``   — the view keyed by tile via the object→tile
  assignment (margin duplication included, like every other view).
* ``media_census``  — per (tile, mime) span/ref/doc counts: the
  per-partition media profile written next to check metrics.
* ``media_dup_refs``— cross-doc exact duplicate detection on
  media_ref (content-hash refs ⇒ ref equality = content equality):
  hash-shuffle on (tile, media_ref), never all-pairs — the media twin
  of the error-table exact dedup.
* ``media_integrity`` — referential hygiene: dangling refs (media
  span without a ref) and mime conflicts (one ref claiming several
  mimes).

Decode / feature-extraction of the actual bytes is out of scope in
this container (no image/audio libs): ``decode_media_stub`` keeps the
Spark-side plumbing (schema, batch shape, mapInPandas signature) real
and testable while raising NotImplementedError at the codec boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import pipeline


def media_view(docs: DataFrame) -> DataFrame:
    s = docs.select(
        F.split("doc_id", "/").getItem(0).alias("object_type"),
        F.split("doc_id", "/").getItem(1).cast("long").alias("id"),
        F.col("doc_id"),
        F.explode("spans").alias("span"),
    ).filter(F.col("span.kind") == "media")
    return s.select(
        "object_type",
        "id",
        "doc_id",
        F.split(F.col("span.text"), "\t").getItem(0).alias("mime"),
        F.split(F.col("span.text"), "\t").getItem(1).alias("caption"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def tiled_media(spark: SparkSession, dataset_dir: str) -> DataFrame:
    """media_view × object tile assignment (from the materialized
    engine views, margin duplication included)."""
    docs = pipeline.load_docs(spark, dataset_dir)
    mv = media_view(docs)
    v = pipeline.tiled_views(spark, dataset_dir, share_partitioning=False)
    ot = (
        v.nodes.select(F.lit("node").alias("object_type"), "id", "tile")
        .unionByName(v.ways.select(F.lit("way").alias("object_type"), "id", "tile"))
        .unionByName(
            v.relations.select(
                F.lit("relation").alias("object_type"), "id", "tile"
            )
        )
        .distinct()
    )
    return mv.join(ot, ["object_type", "id"])


def media_census(tm: DataFrame) -> DataFrame:
    """Per-(tile, mime) profile: spans, distinct refs, docs."""
    return (
        tm.groupBy("tile", "mime")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.count_distinct("media_ref").alias("n_refs"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
    )


DUP_ROSTER_CAP = 20


def media_dup_refs(tm: DataFrame) -> DataFrame:
    """Refs shared by more than one doc in a tile (exact dedup
    candidates; refs are content hashes).

    ``n_docs`` is exact; ``docs`` is a deterministic top-K sample
    (first ``DUP_ROSTER_CAP`` doc_ids in sort order).  The cap is
    load-bearing at scale: a planet-hot ref (one logo referenced by
    10^7 docs) would otherwise produce one multi-GB aggregation value
    in a single task.  The row_number/count windows stay linear in the
    hot key's rows; the aggregation buffer is bounded by the cap."""
    from pyspark.sql import Window

    base = (
        tm.filter(F.col("media_ref").isNotNull())
        .select("tile", "media_ref", "doc_id")
        .distinct()
    )
    part = Window.partitionBy("tile", "media_ref")
    ranked = base.withColumn(
        "_rn", F.row_number().over(part.orderBy("doc_id"))
    ).withColumn("_total", F.count(F.lit(1)).over(part))
    return (
        ranked.filter(F.col("_rn") <= DUP_ROSTER_CAP)
        .groupBy("tile", "media_ref")
        .agg(
            F.max("_total").alias("n_docs"),
            F.array_join(F.sort_array(F.collect_list("doc_id")), ",").alias(
                "docs"
            ),
        )
        .filter(F.col("n_docs") > 1)
        .withColumn("n_docs", F.col("n_docs").cast("long"))
    )


def media_integrity(tm: DataFrame) -> DataFrame:
    """Hygiene violations: (tile, violation, doc_id, media_ref).

    * ``dangling_ref``  — a media span without a media_ref (doc_id
      set, media_ref NULL);
    * ``mime_conflict`` — a ref claimed under >1 mime (media_ref set,
      doc_id NULL).
    """
    dangling = (
        tm.filter(F.col("media_ref").isNull())
        .select(
            "tile",
            F.lit("dangling_ref").alias("violation"),
            "doc_id",
            F.lit(None).cast("string").alias("media_ref"),
        )
        .distinct()
    )
    conflicts = (
        tm.filter(F.col("media_ref").isNotNull())
        .groupBy("tile", "media_ref")
        .agg(F.count_distinct("mime").alias("nm"))
        .filter(F.col("nm") > 1)
        .select(
            "tile",
            F.lit("mime_conflict").alias("violation"),
            F.lit(None).cast("string").alias("doc_id"),
            "media_ref",
        )
    )
    return dangling.unionByName(conflicts)


# ---------------------------------------------------------------------------
# Decode plumbing (stubbed codec: no media libs in this container)
# ---------------------------------------------------------------------------

DECODED_SCHEMA = (
    "doc_id string, media_ref string, mime string, "
    "width int, height int, n_frames int, feature array<float>"
)


def decode_media_batch(pdf):
    """The per-batch decode hook (mapInPandas contract): takes the
    (doc_id, media_ref, mime) pandas frame of one Arrow batch and
    returns DECODED_SCHEMA rows.  Real deployments plug an image /
    audio codec in here; this container has none."""
    raise NotImplementedError(
        "media byte decoding requires image/audio codecs not present "
        "in this environment; plug a decoder into decode_media_batch"
    )


def decode_media(tm: DataFrame, batch_decoder=None) -> DataFrame:
    """mapInPandas plumbing for media decode / feature extraction.

    Arrow-batched, one task per partition of the (tile, media_ref)
    shuffle — the shape a real decoder runs in.  ``batch_decoder``
    defaults to the stub that raises NotImplementedError."""
    decoder = batch_decoder or decode_media_batch

    def run(batches):
        for pdf in batches:
            yield decoder(pdf)

    return (
        tm.select("doc_id", "media_ref", "mime")
        .repartition("media_ref")
        .mapInPandas(run, DECODED_SCHEMA)
    )
