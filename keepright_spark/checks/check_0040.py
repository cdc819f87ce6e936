"""Check 0040 — dead-ended one-ways (subtypes 40-43).

Reference: /root/reference/checks/0040_dead-ended_one-ways.php (171 LoC).

* 40/41 (0040:35-83): the first/last node of a oneway (find_oneways,
  helpers.php:592-700) is not shared with any other way.  Excluded:
  ring ways (first==last), amenity=parking_entrance end nodes, and
  self-loop ends (the end node appears at >1 sequence position within
  the same way).  Explicit coords = 1e7 * end-node lat/lon.
* 42/43 (0040:92-165): junction nodes where ≥2 oneways only start
  (unreachable) or only end (black hole) and no non-participating way
  touches the node; closed-loop oneway nodes excluded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec import OsmViews
from ..errors import finish_errors
from ..lib import find_oneways

MSG_FIRST = "The first node (id $1) of this one-way is not connected to any other way"
MSG_LAST = "The last node (id $1) of this one-way is not connected to any other way"
MSG_UNREACHABLE = "This node cannot be reached, because one-ways only lead away from here"
MSG_NO_ESCAPE = "You cannot escape from this node, because one-ways only lead to here"


def run(v: OsmViews) -> DataFrame:
    ow = find_oneways(v)

    # nodes shared with another way
    wn = v.way_nodes.select("tile", "way_id", "node_id", "sequence_id")
    parking = (
        v.node_tags.filter(
            (F.col("k") == "amenity") & (F.col("v") == "parking_entrance")
        )
        .select("tile", "node_id")
        .distinct()
    )
    # (tile, way_id, node_id) pairs where the node repeats within the way
    self_loop = (
        wn.groupBy("tile", "way_id", "node_id")
        .agg(F.count_distinct("sequence_id").alias("ns"))
        .filter(F.col("ns") > 1)
        .select("tile", "way_id", "node_id")
    )

    parts = []
    for which, etype, msg in (("first", 40, MSG_FIRST), ("last", 41, MSG_LAST)):
        nid = f"{which}_node_id"
        cand = ow.filter(F.col("first_node_id") != F.col("last_node_id")).select(
            "tile",
            "way_id",
            F.col(nid).alias("end_node_id"),
            (F.col(f"{which}_node_lat") * 1e7).alias("lat"),
            (F.col(f"{which}_node_lon") * 1e7).alias("lon"),
        )
        cand = cand.join(
            parking.withColumnRenamed("node_id", "end_node_id"),
            ["tile", "end_node_id"],
            "left_anti",
        )
        # no other way shares the end node
        other = wn.select(
            "tile",
            F.col("node_id").alias("end_node_id"),
            F.col("way_id").alias("other_way"),
        )
        connected = (
            cand.join(other, ["tile", "end_node_id"])
            .filter(F.col("other_way") != F.col("way_id"))
            .select("tile", "way_id", "end_node_id")
            .distinct()
        )
        cand = cand.join(connected, ["tile", "way_id", "end_node_id"], "left_anti")
        # self-loop exclusion
        cand = cand.join(
            self_loop.withColumnRenamed("node_id", "end_node_id"),
            ["tile", "way_id", "end_node_id"],
            "left_anti",
        )
        parts.append(
            finish_errors(
                cand.select(
                    "tile",
                    F.col("way_id").alias("object_id"),
                    "lat",
                    "lon",
                    F.col("end_node_id").cast("string").alias("t1"),
                ),
                etype,
                "way",
                msg,
                txt1=F.col("t1"),
            )
        )

    # 42/43: one-way junction clashes
    ring_nodes = (
        ow.filter(F.col("first_node_id") == F.col("last_node_id"))
        .select("tile", F.col("first_node_id").alias("node_id"))
        .distinct()
    )
    for which, etype, msg in (
        ("first", 42, MSG_UNREACHABLE),
        ("last", 43, MSG_NO_ESCAPE),
    ):
        nid = f"{which}_node_id"
        ends = ow.select("tile", "way_id", F.col(nid).alias("node_id")).filter(
            F.col("node_id").isNotNull()
        )
        junctions = (
            ends.join(ring_nodes, ["tile", "node_id"], "left_anti")
            .groupBy("tile", "node_id")
            .agg(F.count_distinct("way_id").alias("nw"))
            .filter(F.col("nw") > 1)
            .select("tile", "node_id")
        )
        # any way at the node that is NOT a oneway ending here with
        # its <which> node
        other = (
            wn.select("tile", "node_id", "way_id")
            .join(junctions, ["tile", "node_id"], "left_semi")
            .join(
                ends.withColumnRenamed("way_id", "xway").select(
                    "tile", "node_id", F.col("xway").alias("way_id")
                ),
                ["tile", "node_id", "way_id"],
                "left_anti",
            )
            .select("tile", "node_id")
            .distinct()
        )
        e = junctions.join(other, ["tile", "node_id"], "left_anti")
        parts.append(
            finish_errors(
                e.select("tile", F.col("node_id").alias("object_id")),
                etype,
                "node",
                msg,
            )
        )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# object types this check can emit (error_view resolution pruning)
EMITS = ('node', 'way')
