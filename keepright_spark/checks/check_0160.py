"""Check 0160 — wrong use of railway=level_crossing.

Reference: /root/reference/checks/0160_wrong_use_of_level_crossing_tag.php:14-71.
At railway=level_crossing nodes: (a) member ways span >1 distinct
layer (find_layer_values semantics, layer as TEXT), or (b) any member
way is a bridge/tunnel.  Both emit error_type 160 on the node; the
reference's insert-ignore keeps the first insert (the layer variant),
which matches our dedupe's lexicographic-min msgid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec import OsmViews
from ..errors import finish_errors
from ..lib import FALSY, way_layers

MSG_LAYERS = "There are ways in different layers coming together in this railway crossing"
MSG_BRIDGE = "There are ways tagged as tunnel or bridge coming together in this railway crossing"


def run(v: OsmViews) -> DataFrame:
    lc_nodes = (
        v.node_tags.filter((F.col("k") == "railway") & (F.col("v") == "level_crossing"))
        .select("tile", "node_id")
        .distinct()
    )
    member = (
        v.way_nodes.join(lc_nodes, ["tile", "node_id"], "left_semi")
        .select("tile", "way_id", "node_id")
        .distinct()
    )
    with_layer = member.join(way_layers(v), ["tile", "way_id"], "left").fillna(
        {"layer": "0"}
    )
    e_layers = (
        with_layer.groupBy("tile", "node_id")
        .agg(F.count_distinct("layer").alias("nl"))
        .filter(F.col("nl") > 1)
        .select("tile", F.col("node_id").alias("object_id"))
    )

    bt_ways = (
        v.way_tags.filter(F.col("k").isin("bridge", "tunnel") & ~F.col("v").isin(FALSY))
        .select("tile", "way_id")
        .distinct()
    )
    e_bridge = (
        member.join(bt_ways, ["tile", "way_id"], "left_semi")
        .select("tile", F.col("node_id").alias("object_id"))
        .distinct()
    )

    return finish_errors(e_layers, 160, "node", MSG_LAYERS).unionByName(
        finish_errors(e_bridge, 160, "node", MSG_BRIDGE)
    )


# object types this check can emit (error_view resolution pruning)
EMITS = ('node',)
