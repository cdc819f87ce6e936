"""Check 0350 — bridge tags.

Reference: /root/reference/checks/0350_bridges.php (105 LoC).
A bridge must share at least one "way-type" tag (highway/railway/...)
with the ways touching its endpoints.  The bridge itself is among
those ways (it contains its own endpoints), so only bridges with no
way-type tag at all can fail.  man_made=pipeline bridges get an extra
('building','') tag (0350:62-66).  Bridges with no neighbour tags at
all produce no error (0350:93-99 HAVING over an empty group).
txt1 = html(group_concat(k=v)) over the neighbour tags (pinned (k,v)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec import OsmViews
from ..errors import finish_errors
from ..lib import FALSY, html_escape

WAY_TYPES = [
    "highway", "railway", "cycleway", "waterway", "footway", "piste",
    "piste:type", "aerialway", "pipeline", "building", "via_ferrata",
    "public_transport", "man_made",
]
MSGID = (
    "This bridge does not have a tag in common with its surrounding ways "
    "that shows the purpose of this bridge. There should be one of these "
    "tags: $1"
)


def run(v: OsmViews) -> DataFrame:
    bridges = (
        v.way_tags.filter((F.col("k") == "bridge") & ~F.col("v").isin(FALSY))
        .select("tile", "way_id")
        .distinct()
        .join(
            v.ways.select(
                "tile",
                F.col("id").alias("way_id"),
                "first_node_id",
                "last_node_id",
            ),
            ["tile", "way_id"],
        )
    )

    bridge_tags = v.way_tags.filter(F.col("k").isin(WAY_TYPES)).join(
        bridges.select("tile", "way_id"), ["tile", "way_id"], "left_semi"
    )
    # pipeline alias (0350:62-66)
    pipeline_extra = (
        bridge_tags.filter((F.col("k") == "man_made") & (F.col("v") == "pipeline"))
        .select("tile", "way_id", F.lit("building").alias("k"), F.lit("").alias("v"))
    )
    bridge_tags = bridge_tags.select("tile", "way_id", "k", "v").unionByName(
        pipeline_extra
    )

    # neighbours = ways sharing the bridge's first or last node
    wn = v.way_nodes.select("tile", F.col("way_id").alias("nb_way_id"), "node_id")
    nb_first = bridges.join(
        wn, (bridges.tile == wn.tile) & (bridges.first_node_id == wn.node_id)
    ).select(bridges.tile, "way_id", "nb_way_id")
    nb_last = bridges.join(
        wn, (bridges.tile == wn.tile) & (bridges.last_node_id == wn.node_id)
    ).select(bridges.tile, "way_id", "nb_way_id")
    neighbours = nb_first.unionByName(nb_last).distinct()

    nb_tags = (
        neighbours.join(
            v.way_tags.filter(F.col("k").isin(WAY_TYPES)).select(
                "tile", F.col("way_id").alias("nb_way_id"), "k", "v"
            ),
            ["tile", "nb_way_id"],
        )
        .select("tile", "way_id", "k", "v")
        .distinct()
    )

    # LEFT JOIN bridge's own tags on (way_id, k, v); EVERY(missing)
    matched = nb_tags.join(
        bridge_tags.withColumn("_hit", F.lit(1)), ["tile", "way_id", "k", "v"], "left"
    )
    e = (
        matched.groupBy("tile", "way_id")
        .agg(
            F.every(F.col("_hit").isNull()).alias("none_shared"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("k", "v"))),
                    lambda s: F.concat(
                        s.getField("k"), F.lit("="), s.getField("v")
                    ),
                ),
            ).alias("taglist"),
        )
        .filter(F.col("none_shared"))
    )
    return finish_errors(
        e.select("tile", F.col("way_id").alias("object_id"), "taglist"),
        350,
        "way",
        MSGID,
        txt1=html_escape(F.col("taglist")),
    )


# object types this check can emit (error_view resolution pruning)
EMITS = ('way',)
