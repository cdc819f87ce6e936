"""Check 0320 — *_link connections.

Reference: /root/reference/checks/0320_highway_link_connections.php:13-70.
motorway/trunk/primary/secondary _link ways that share no node with
another way of the same class (or its _link).  txt1 = class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec import OsmViews
from ..errors import finish_errors

MSGID = (
    "This way is tagged as highway=$1_link but doesn't have a connection "
    "to any other $1 or $1_link"
)
LINKS = ["motorway_link", "trunk_link", "primary_link", "secondary_link"]


def run(v: OsmViews) -> DataFrame:
    links = (
        v.way_tags.filter((F.col("k") == "highway") & F.col("v").isin(LINKS))
        .select(
            "tile",
            "way_id",
            F.substring_index("v", "_", 1).alias("cls"),
        )
        .distinct()
    )
    link_nodes = v.way_nodes.join(links, ["tile", "way_id"]).select(
        "tile", "way_id", "cls", "node_id"
    )
    other_wn = v.way_nodes.select(
        "tile", F.col("way_id").alias("way_id2"), "node_id"
    )
    neigh = link_nodes.join(other_wn, ["tile", "node_id"]).filter(
        F.col("way_id2") != F.col("way_id")
    )
    hw = v.way_tags.filter(F.col("k") == "highway").select(
        "tile", F.col("way_id").alias("way_id2"), F.col("v").alias("hv")
    )
    matched = (
        neigh.join(hw, ["tile", "way_id2"])
        .filter(
            (F.col("hv") == F.col("cls"))
            | (F.col("hv") == F.concat(F.col("cls"), F.lit("_link")))
        )
        .select("tile", "way_id")
        .distinct()
    )
    e = links.join(matched, ["tile", "way_id"], "left_anti")
    return finish_errors(
        e.select("tile", F.col("way_id").alias("object_id"), "cls"),
        320,
        "way",
        MSGID,
        txt1=F.col("cls"),
    )


# object types this check can emit (error_view resolution pruning)
EMITS = ('way',)
