"""Driver contract for the spark-graft builder (PySpark target).

The engine under test is ``keepright_spark`` — a PySpark-native
spatial-join + tiling engine re-expressing keepright's OSM checks.
The OSM input (interleaved text+media docs, BASELINE.json input_hint)
is synthesized deterministically by ``keepright_spark.datagen`` at a
scale matched to the driver's sf dir; the DuckDB oracles run on the
generator's independently-computed relational views.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from keepright_spark import doc_oracles, docops
from keepright_spark import media as media_mod
from keepright_spark import oracles, pipeline, raster
from keepright_spark.datagen import ensure_dataset, scale_for_sf_dir

# checks with both a Spark implementation and a DuckDB oracle
CHECKS_WITH_ORACLE = [
    20, 30, 40, 50, 60, 70, 90, 100, 110, 120, 130, 150, 160, 170, 180, 190,
    210, 220, 230, 270, 280, 290, 300, 310, 320, 350, 360, 370, 380, 390, 400, 420,
]
# checks implemented in Spark only (rows-only verification)
CHECKS_ROWS_ONLY: list[int] = []

# multimodal operators over the media spans (keepright_spark.media):
# name -> (engine fn over the tiled media view, oracle fn)
MEDIA_QUERIES = {
    "kr_media_census": (media_mod.media_census, "oracle_media_census"),
    "kr_media_dups": (media_mod.media_dup_refs, "oracle_media_dups"),
    "kr_media_integrity": (media_mod.media_integrity, "oracle_media_integrity"),
}

# training-data-pipeline operators over the driver's documents /
# embeddings tables (keepright_spark.docops): name -> (input loader,
# operator, doc_oracles fn).  Oracle SQL references the driver's
# pre-registered `documents` / `embeddings` views.
DOC_QUERIES = {
    "kr_doc_stats": (docops.documents, docops.doc_stats, "oracle_doc_stats"),
    "kr_doc_langid": (docops.documents, docops.doc_langid,
                      "oracle_doc_langid"),
    "kr_doc_fingerprint": (docops.documents, docops.doc_fingerprint,
                           "oracle_doc_fingerprint"),
    "kr_doc_simhash": (docops.documents, docops.doc_simhash,
                       "oracle_doc_simhash"),
    "kr_doc_exact_dups": (docops.documents, docops.doc_exact_dups,
                          "oracle_doc_exact_dups"),
    # positive-path dedup: deterministic planted clones (the raw corpus
    # has no duplicate texts at correctness scale, so the entry above
    # only proves the empty case); exercises the roster cap
    "kr_doc_exact_dups_planted": (docops.documents,
                                  docops.doc_exact_dups_planted,
                                  "oracle_doc_exact_dups_planted"),
    # silent-cap overflow census (loader None: fn takes (spark, sf_dir))
    "kr_doc_cap_census": (None, None, "oracle_doc_cap_census"),
    "kr_doc_minhash_neardups": (docops.documents, docops.doc_minhash_neardups,
                                "oracle_doc_minhash_neardups"),
    "kr_doc_simhash_neardups": (docops.documents, docops.doc_simhash_neardups,
                                "oracle_doc_simhash_neardups"),
    "kr_emb_knn_brute": (docops.embeddings, docops.emb_knn_brute,
                         "oracle_emb_knn_brute"),
    "kr_emb_ann_lsh": (docops.embeddings, docops.emb_ann_lsh,
                       "oracle_emb_ann_lsh"),
    "kr_emb_cosine_neardups": (docops.embeddings, docops.emb_cosine_neardups,
                               "oracle_emb_cosine_neardups"),
}


# raster↔vector zonal join (keepright_spark.raster): the fourth
# north-star operator family; oracle in keepright_spark.oracles
RASTER_QUERIES = {
    "kr_zonal_stats": (raster.zonal_stats, "oracle_zonal_stats"),
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full check suite on the tiny synthetic OSM world."""
    d = ensure_dataset("t")
    return pipeline.run_dataset(spark, d)


def _mk_check_query(cid: int) -> Callable[[SparkSession, str], DataFrame]:
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = ensure_dataset(scale_for_sf_dir(sf_dir))
        return pipeline.run_dataset(spark, d, [cid])

    return q


def _mk_media_query(fn) -> Callable[[SparkSession, str], DataFrame]:
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = ensure_dataset(scale_for_sf_dir(sf_dir))
        return fn(media_mod.tiled_media(spark, d))

    return q


def _mk_raster_query(fn) -> Callable[[SparkSession, str], DataFrame]:
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = ensure_dataset(scale_for_sf_dir(sf_dir))
        return fn(spark, d)

    return q


def _mk_doc_query(loader, fn) -> Callable[[SparkSession, str], DataFrame]:
    if loader is None and fn is None:
        # census query: needs both tables
        def q(spark: SparkSession, sf_dir: str) -> DataFrame:
            return docops.dedup_cap_census(
                docops.documents(spark, sf_dir),
                docops.embeddings(spark, sf_dir),
            )

        return q

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(loader(spark, sf_dir))

    return q


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ensure_dataset("s")  # the oracle side reads files from disk
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for cid in CHECKS_WITH_ORACLE + CHECKS_ROWS_ONLY:
        out[f"kr_{cid:04d}"] = _mk_check_query(cid)
    for name, (fn, _oname) in MEDIA_QUERIES.items():
        out[name] = _mk_media_query(fn)
    for name, (loader, fn, _oname) in DOC_QUERIES.items():
        out[name] = _mk_doc_query(loader, fn)
    for name, (rfn, _oname) in RASTER_QUERIES.items():
        out[name] = _mk_raster_query(rfn)
    return out


def oracle_sql() -> dict[str, str]:
    d = ensure_dataset("s")
    out: dict[str, str] = {}
    for cid in CHECKS_WITH_ORACLE:
        out[f"kr_{cid:04d}"] = getattr(oracles, f"oracle_{cid:04d}")(d)
    for name, (_fn, oname) in MEDIA_QUERIES.items():
        out[name] = getattr(oracles, oname)(d)
    for name, (_loader, _fn, oname) in DOC_QUERIES.items():
        out[name] = getattr(doc_oracles, oname)(d)
    for name, (_rfn, oname) in RASTER_QUERIES.items():
        out[name] = getattr(oracles, oname)(d)
    return out
