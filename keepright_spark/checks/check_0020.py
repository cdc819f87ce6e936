"""Check 0020 — multiple nodes on the same spot.

Reference: /root/reference/checks/0020_multiple_nodes_on_same_spot.php
(whole file, 86 LoC).  Semantics:

* group nodes by *exact* (lon, lat) doubles; groups with >1 node are
  candidate errors (0020:55-61);
* exception (0020:70-79): no error if the number of nodes on the spot
  equals COUNT(DISTINCT ele) over the per-node elevation values at
  that spot (towers with stacked, distinctly-elevated nodes);
* one error row per spot: object_id = MIN(node id), txt1 =
  group_concat('#'||id) — the reference's group_concat is scan-order;
  we pin ascending node id (the oracle aggregates with ORDER BY id).

Spark plan: two hash aggregations + one broadcast-friendly join, all
keyed by (tile, lon, lat) — partial aggregation map-side, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec import OsmViews
from ..errors import finish_errors

MSGID = "There is more than one node in this spot. Offending node IDs: $1"


def run(v: OsmViews) -> DataFrame:
    # up to one ele value per node id (0020:33-42: MAX(lon/lat/v) per id)
    elevations = (
        v.node_tags.filter(F.col("k") == "ele")
        .join(
            v.nodes.select("tile", F.col("id").alias("node_id"), "lat", "lon"),
            ["tile", "node_id"],
        )
        .groupBy("tile", "node_id")
        .agg(
            F.max("lon").alias("lon"),
            F.max("lat").alias("lat"),
            F.max("v").alias("ele"),
        )
    )
    ele_counts = elevations.groupBy("tile", "lon", "lat").agg(
        F.count_distinct("ele").alias("n_ele")
    )

    dupes = (
        v.nodes.groupBy("tile", "lon", "lat")
        .agg(F.count("id").alias("nodecount"))
        .filter(F.col("nodecount") > 1)
    )

    err = (
        v.nodes.select("tile", "id", "lat", "lon")
        .join(dupes, ["tile", "lon", "lat"])
        .join(ele_counts, ["tile", "lon", "lat"], "left")
        # WHERE NOT(nodecount = (SELECT COUNT(DISTINCT ele) ...)); the
        # scalar subquery yields 0 for spots with no elevations
        .filter(~(F.col("nodecount") == F.coalesce(F.col("n_ele"), F.lit(0))))
        .groupBy("tile", "lon", "lat")
        .agg(
            F.min("id").alias("object_id"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list("id")),
                    lambda x: F.concat(F.lit("#"), x.cast("string")),
                ),
            ).alias("_t1"),
        )
        .drop("lat", "lon")
    )
    return finish_errors(err, 20, "node", MSGID, txt1=F.col("_t1")).drop("_t1")


# object types this check can emit (error_view resolution pruning)
EMITS = ('node',)
