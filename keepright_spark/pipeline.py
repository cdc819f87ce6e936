"""End-to-end pipeline: docs → views → tiled views → checks → error_view.

Spark-first equivalent of checks/process_schema.php:37-43 +
run-checks.php — but tiles are a data column, not an outer loop, so a
single job covers every tile and all per-tile work shuffles on
(tile, …) keys.

Two stages, mirroring the reference's updateDB (materialize the
relational model) → run-checks (dataflow over it):

1. ``prepare``  — decode the docs table, assign tiles, and *write the
   tiled views out* (parquet here; Iceberg tables on a cluster).  Every
   check re-reads these views many times, so materializing once is the
   scale-correct choice — it also gives each check a small plan with
   parquet pushdown instead of a giant shared lineage.
2. ``run_checks`` — union the check dataflows over the materialized
   views and build the clipped error_view.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from . import checks as check_registry
from .codec import OsmViews, decode
from .datagen import GEN_VERSION
from .errors import build_error_view
from .tiling import DEFAULT_MARGIN_M, DEFAULT_TILES, Tile, assign_tiles

VIEW_NAMES = [
    "nodes",
    "node_tags",
    "ways",
    "way_nodes",
    "way_tags",
    "relations",
    "relation_members",
    "relation_tags",
]


def load_docs(spark: SparkSession, dataset_dir: str) -> DataFrame:
    return spark.read.parquet(f"{dataset_dir}/docs.parquet")


def decode_and_tile(
    spark: SparkSession,
    dataset_dir: str,
    tiles: list[Tile] | None = None,
    margin_m: float = DEFAULT_MARGIN_M,
) -> OsmViews:
    docs = load_docs(spark, dataset_dir)
    return assign_tiles(decode(docs), tiles or DEFAULT_TILES, margin_m)


def prepare(
    spark: SparkSession,
    dataset_dir: str,
    tiles: list[Tile] | None = None,
    margin_m: float = DEFAULT_MARGIN_M,
    force: bool = False,
) -> str:
    """Materialize the decoded + tiled views under
    ``<dataset_dir>/engine/`` (idempotent per generator version)."""
    out = os.path.join(dataset_dir, "engine")
    stamp = os.path.join(out, "engine_manifest.json")
    if not force and os.path.exists(stamp):
        try:
            with open(stamp) as f:
                if json.load(f).get("gen_version") == GEN_VERSION:
                    return out
        except (json.JSONDecodeError, OSError):
            pass
    from pyspark.storagelevel import StorageLevel

    docs = load_docs(spark, dataset_dir)
    base = decode(docs)
    persisted = [getattr(base, n) for n in VIEW_NAMES]
    for df in persisted:
        df.persist(StorageLevel.MEMORY_AND_DISK)
    v = assign_tiles(base, tiles or DEFAULT_TILES, margin_m)
    for name in VIEW_NAMES:
        getattr(v, name).write.mode("overwrite").parquet(f"{out}/{name}.parquet")
    for df in persisted:
        df.unpersist()
    with open(stamp, "w") as f:
        json.dump({"gen_version": GEN_VERSION}, f)
    return out


def tiled_views(
    spark: SparkSession,
    dataset_dir: str,
    tiles: list[Tile] | None = None,
    margin_m: float = DEFAULT_MARGIN_M,
) -> OsmViews:
    """Views over the materialized engine tables (prepared on demand)."""
    out = prepare(spark, dataset_dir, tiles, margin_m)
    return OsmViews(
        **{name: spark.read.parquet(f"{out}/{name}.parquet") for name in VIEW_NAMES}
    )


def run_checks(
    v: OsmViews,
    check_ids: list[int] | None = None,
    tiles: list[Tile] | None = None,
) -> DataFrame:
    """Union the requested checks' _tmp_errors rows and build the
    clipped error_view (deterministic columns)."""
    registry = check_registry.available_checks()
    if check_ids is None:
        check_ids = sorted(registry)
    errors = None
    for cid in check_ids:
        e = registry[cid](v)
        errors = e if errors is None else errors.unionByName(e)
    return build_error_view(errors, v, tiles or DEFAULT_TILES)


def run_dataset(
    spark: SparkSession,
    dataset_dir: str,
    check_ids: list[int] | None = None,
    tiles: list[Tile] | None = None,
    margin_m: float = DEFAULT_MARGIN_M,
) -> DataFrame:
    v = tiled_views(spark, dataset_dir, tiles, margin_m)
    return run_checks(v, check_ids, tiles)
