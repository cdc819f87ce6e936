"""Check 0150 — level crossings without tag.

Reference: /root/reference/checks/0150_level_crossing_without_tag.php:14-68.
Nodes shared by a railway way (excluding tram/disused/platform/...,
and ways tagged disused=yes) and a *different* highway way (excluding
construction/proposed/service), where the node lacks
railway ∈ {level_crossing, crossing, station}.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec import OsmViews
from ..errors import finish_errors

RAIL_EXCLUDED = [
    "disused", "dismantled", "abandoned", "preproposed", "proposed",
    "tram", "tram:disused", "tram;disused", "construction",
    "platform", "Platform", "plattform", "plateform", "razed",
    "station", "abandoned_station", "station_site", "disused_station",
]
HW_EXCLUDED = ["construction", "preproposed", "proposed", "service"]
MSGID = (
    "This crossing of a highway and a railway needs to be tagged as "
    "railway=crossing or railway=level_crossing"
)


def run(v: OsmViews) -> DataFrame:
    rail_ways = (
        v.way_tags.filter(
            (F.col("k") == "railway") & ~F.col("v").isin(RAIL_EXCLUDED)
        )
        .select("tile", "way_id")
        .distinct()
        .join(
            v.way_tags.filter(
                (F.col("k") == "disused") & F.col("v").isin("yes", "true", "1")
            ).select("tile", "way_id"),
            ["tile", "way_id"],
            "left_anti",
        )
    )
    rail_nodes = (
        v.way_nodes.join(rail_ways, ["tile", "way_id"], "left_semi")
        .select("tile", "way_id", "node_id")
        .distinct()
    )

    hw_ways = (
        v.way_tags.filter(
            (F.col("k") == "highway") & ~F.col("v").isin(HW_EXCLUDED)
        )
        .select("tile", "way_id")
        .distinct()
    )
    hw_nodes = (
        v.way_nodes.join(hw_ways, ["tile", "way_id"], "left_semi")
        .select("tile", F.col("way_id").alias("hw_way_id"), "node_id")
        .distinct()
    )

    crossing = (
        rail_nodes.join(hw_nodes, ["tile", "node_id"])
        .filter(F.col("hw_way_id") != F.col("way_id"))
        .select("tile", "node_id")
        .distinct()
    )

    tagged = (
        v.node_tags.filter(
            (F.col("k") == "railway")
            & F.col("v").isin("level_crossing", "crossing", "station")
        )
        .select("tile", "node_id")
        .distinct()
    )
    e = crossing.join(tagged, ["tile", "node_id"], "left_anti")
    return finish_errors(
        e.select("tile", F.col("node_id").alias("object_id")), 150, "node", MSGID
    )


# object types this check can emit (error_view resolution pruning)
EMITS = ('node',)
