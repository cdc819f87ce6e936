"""Check 0210 — loopings (subtypes 210/211/212).

Reference: /root/reference/checks/0210_loopings.php (122 LoC).

* 210 (0210:49-79): a node used >2× in one way; one error per
  (way, node-spot) with explicit lat/lon (1e7 fixed-point), reporting
  the max-count node (ties → max node id); txt1=node_id, txt2=count.
* 211 (0210:86-98): a way with ≥2 distinct nodes used ≥2×;
  txt1 = '#id' list joined with ', ' (pinned ascending).
* 212 (0210:103-115): a way with ≤2 distinct nodes and a repeat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..codec import OsmViews
from ..errors import finish_errors

MSG_210 = "This way contains node #$1 $2 times. This may or may not be an error"
MSG_211 = (
    "This way contains more than one node at least twice. Nodes are $1. "
    "This may or may not be an error"
)
MSG_212 = (
    "This way has only two different nodes and contains one of them more than once"
)


def run(v: OsmViews) -> DataFrame:
    node_count = (
        v.way_nodes.groupBy("tile", "way_id", "node_id")
        .agg(F.count("sequence_id").alias("node_count"))
        .filter(F.col("node_count") > 1)
    )

    # 210: node used >2 times — explicit fixed-point coordinates
    over2 = node_count.filter(F.col("node_count") > 2).join(
        v.nodes.select(
            "tile",
            F.col("id").alias("node_id"),
            (F.col("lat") * 1e7).alias("lat"),
            (F.col("lon") * 1e7).alias("lon"),
        ),
        ["tile", "node_id"],
    )
    w = Window.partitionBy("tile", "way_id", "lat", "lon").orderBy(
        F.col("node_count").desc(), F.col("node_id").desc()
    )
    e210 = (
        over2.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "tile",
            F.col("way_id").alias("object_id"),
            "lat",
            "lon",
            F.col("node_id").cast("string").alias("t1"),
            F.col("node_count").cast("string").alias("t2"),
        )
    )
    p210 = finish_errors(
        e210, 210, "way", MSG_210, txt1=F.col("t1"), txt2=F.col("t2")
    )

    # 211: ≥2 distinct doubled nodes
    e211 = (
        node_count.groupBy("tile", "way_id")
        .agg(
            F.count("node_id").alias("n"),
            F.concat_ws(
                ", ",
                F.transform(
                    F.array_sort(F.collect_list("node_id")),
                    lambda x: F.concat(F.lit("#"), x.cast("string")),
                ),
            ).alias("nodelist"),
        )
        .filter(F.col("n") > 1)
        .select("tile", F.col("way_id").alias("object_id"), "nodelist")
    )
    p211 = finish_errors(e211, 211, "way", MSG_211, txt1=F.col("nodelist"))

    # 212: ≤2 distinct nodes with a repeat
    few = (
        v.way_nodes.groupBy("tile", "way_id")
        .agg(F.count_distinct("node_id").alias("nd"))
        .filter(F.col("nd") <= 2)
    )
    e212 = (
        node_count.join(few, ["tile", "way_id"], "left_semi")
        .select("tile", F.col("way_id").alias("object_id"))
        .distinct()
    )
    p212 = finish_errors(e212, 212, "way", MSG_212)

    return p210.unionByName(p211).unionByName(p212)


# object types this check can emit (error_view resolution pruning)
EMITS = ('way',)
