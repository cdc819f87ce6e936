"""Check 0370 — doubled places (node redundant with surrounding area).

Reference: /root/reference/checks/0370_double_place.php (134 LoC).

* closed ways: node_count > 2 and (first−last)² < 100 Mercator-m²
  (0370:23-29), polygonized by appending the start point;
* candidate nodes: tagged, member of no way (0370:40-56);
* inclusion: ST_Within(node, polygon) (0370:64-71) — re-expressed as
  even-odd ray casting over the polygon's edge list (identical
  formula mirrored in the DuckDB oracle);
* error (0370:87-126): node and way share a k=v with k in the 48-key
  physical-entity list, and way name ILIKE node name (missing names
  compare as ''); message gains "(including the name '$2')" when the
  way has a name.  txt1 = way id, txt2 = way name.

Spark: grid-cell cover join (polygon bbox cells × node point cell),
then the parity count as a plain aggregation — the engine's
point-in-polygon operator, all native column arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec import OsmViews
from ..errors import finish_errors
from ..spatial import bbox_cells, point_cells, way_segments

CELL_M = 256.0

PHYSICAL_KEYS = [
    "abutters", "aerialway", "aeroway", "agricultural", "amenity", "area",
    "barrier", "basin", "boundary", "brewery", "bridge", "building", "club",
    "craft", "emergency", "ford", "fuel", "habitat", "harbour", "healthcare",
    "historic", "landmark", "landuse", "leisure", "location", "man made",
    "mooring", "natural", "parking", "playground", "power", "railway",
    "repair", "reservation", "resource", "route", "ruins", "school",
    "service", "shelter", "shop", "sport", "tourism", "tunnel", "water",
    "waterway", "wood", "zoo",
]

MSG_PLAIN = (
    "This node has tags in common with the surrounding way #$1"
    " and seems to be redundant"
)
MSG_NAMED = (
    "This node has tags in common with the surrounding way #$1"
    " (including the name '$2') and seems to be redundant"
)


def point_in_polygon(cands: DataFrame, edges: DataFrame) -> DataFrame:
    """Even-odd ray cast: keep (tile, way_id, node_id) of candidates
    inside the polygon.  ``cands``: (tile, way_id, node_id, px, py);
    ``edges``: (tile, way_id, ax, ay, bx, by) incl. the closing edge.

    Crossing rule (mirrored verbatim in the oracle):
        (ay > py) != (by > py)  AND  px < ax + (bx-ax)*(py-ay)/(by-ay)
    """
    j = cands.join(edges, ["tile", "way_id"])
    crossing = (
        ((F.col("ay") > F.col("py")) != (F.col("by") > F.col("py")))
        & (
            F.col("px")
            < F.col("ax")
            + (F.col("bx") - F.col("ax"))
            * (F.col("py") - F.col("ay"))
            / (F.col("by") - F.col("ay"))
        )
    )
    par = j.groupBy("tile", "way_id", "node_id").agg(
        F.sum(F.when(crossing, 1).otherwise(0)).alias("ncross")
    )
    return par.filter(F.col("ncross") % 2 == 1).select("tile", "way_id", "node_id")


def run(v: OsmViews) -> DataFrame:
    closed = v.ways.filter(
        (F.col("node_count") > 2)
        & (
            (F.col("first_node_x") - F.col("last_node_x"))
            * (F.col("first_node_x") - F.col("last_node_x"))
            + (F.col("first_node_y") - F.col("last_node_y"))
            * (F.col("first_node_y") - F.col("last_node_y"))
            < 100.0
        )
    ).select("tile", F.col("id").alias("way_id"))

    segs = way_segments(v, closed)
    # closing edge: last node → first node (ST_AddPoint(StartPoint))
    closing = (
        v.ways.join(
            closed.withColumnRenamed("way_id", "id"), ["tile", "id"], "left_semi"
        )
        .select(
            "tile",
            F.col("id").alias("way_id"),
            F.lit(-1).alias("seg_id"),
            F.col("last_node_x").alias("ax"),
            F.col("last_node_y").alias("ay"),
            F.col("first_node_x").alias("bx"),
            F.col("first_node_y").alias("by"),
        )
        .filter((F.col("ax") != F.col("bx")) | (F.col("ay") != F.col("by")))
    )
    edges = segs.select(
        "tile", "way_id", "seg_id", "ax", "ay", "bx", "by"
    ).unionByName(closing)

    # polygon bbox cells
    poly_cells = (
        edges.groupBy("tile", "way_id")
        .agg(
            F.min(F.least("ax", "bx")).alias("minx"),
            F.min(F.least("ay", "by")).alias("miny"),
            F.max(F.greatest("ax", "bx")).alias("maxx"),
            F.max(F.greatest("ay", "by")).alias("maxy"),
        )
        .withColumn(
            "cell",
            F.explode(
                bbox_cells(
                    F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"),
                    CELL_M, 0.0,
                )
            ),
        )
        .select("tile", "way_id", "cell")
    )

    # tagged nodes used by no way
    in_way = v.way_nodes.select("tile", "node_id").distinct()
    tagged = v.node_tags.select("tile", "node_id").distinct()
    cand_nodes = (
        v.nodes.select("tile", F.col("id").alias("node_id"), "x", "y")
        .join(tagged, ["tile", "node_id"], "left_semi")
        .join(in_way, ["tile", "node_id"], "left_anti")
        .withColumn("cell", point_cells(F.col("x"), F.col("y"), CELL_M))
    )

    from ..spatial import spread

    cands = (
        spread(
            cand_nodes, "tile", "cell", stats=v.cell_stats, stat="max_node_cell64"
        ).join(poly_cells, ["tile", "cell"])
        .select(
            "tile", "way_id", "node_id",
            F.col("x").alias("px"), F.col("y").alias("py"),
        )
        .distinct()
    )
    inclusions = point_in_polygon(cands, edges)

    # tag-pair condition over the physical-key list
    wt = v.way_tags.filter(F.col("k").isin(PHYSICAL_KEYS)).select(
        "tile", "way_id", "k", "v"
    )
    pairs = (
        inclusions.join(wt, ["tile", "way_id"])
        .join(
            v.node_tags.select("tile", "node_id", "k", "v"),
            ["tile", "node_id", "k", "v"],
            "left_semi",
        )
        .select("tile", "way_id", "node_id")
        .distinct()
    )

    wname = (
        v.way_tags.filter(F.col("k") == "name")
        .groupBy("tile", "way_id")
        .agg(F.max("v").alias("wname"))
    )
    nname = (
        v.node_tags.filter(F.col("k") == "name")
        .groupBy("tile", "node_id")
        .agg(F.max("v").alias("nname"))
    )
    e = (
        pairs.join(wname, ["tile", "way_id"], "left")
        .join(nname, ["tile", "node_id"], "left")
        .filter(
            # way name ILIKE node name (0370:126); synthetic names
            # carry no LIKE metacharacters, so default escaping is
            # equivalent to the reference's ESCAPE ''
            F.ilike(
                F.coalesce(F.col("wname"), F.lit("")),
                F.coalesce(F.col("nname"), F.lit("")),
            )
        )
        .select(
            "tile",
            F.col("node_id").alias("object_id"),
            F.when(F.col("wname").isNotNull(), F.lit(MSG_NAMED))
            .otherwise(F.lit(MSG_PLAIN))
            .alias("msgid"),
            F.col("way_id").cast("string").alias("txt1"),
            F.col("wname").alias("txt2"),
        )
    )
    return finish_errors(e, 370, "node", None)


# object types this check can emit (error_view resolution pruning)
EMITS = ("node",)
