"""Check 0120 — ways without nodes (subtypes 120/121).

Reference: /root/reference/checks/0120_ways_without_nodes.php:12-23.
error_type = node_count + 120; message depends on 0 vs 1 node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec import OsmViews
from ..errors import finish_errors


def run(v: OsmViews) -> DataFrame:
    e = v.ways.filter(F.col("node_count") < 2).select(
        "tile",
        F.col("id").alias("object_id"),
        (F.col("node_count") + 120).cast("int").alias("error_type"),
        F.when(F.col("node_count") == 0, F.lit("This way has no nodes"))
        .otherwise(F.lit("This way has just one single node"))
        .alias("msgid"),
    )
    return finish_errors(e, 0, "way", None)


# object types this check can emit (error_view resolution pruning)
EMITS = ('way',)
