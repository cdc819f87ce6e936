"""Check 0230 — layer conflicts (subtypes 231-233).

Reference: /root/reference/checks/0230_layer_conflicts.php (229 LoC).

* 231 (0230:40-178): junction nodes (shared by ≥2 highways, steps
  excluded) whose member highways span ≥2 distinct layers — reported
  ONLY when the node is an intermediate node in every member way
  (all_intermediate, 0230:148-163); the exactly-two-ways-both-at-end
  case is the bridge-meets-road exception (0230:128-146).
  txt1 = group_concat('#way(layer)'), pinned ascending way_id.
* 232 (0230:198-206): bridge with layer -1..-5, or tunnel (not
  no/false/0/building_passage) with layer 1..5.
* 233 (0230:213-226): waterway with ≥4 nodes and layer -1..-5 without
  tunnel/culvert/covered/pipeline/location=underground.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec import OsmViews
from ..errors import finish_errors
from ..lib import html_escape, way_layers

MSG_231 = "This node is a junction of ways on different layers: $1"
MSG_232 = (
    "This $1 is tagged with layer $2. This need not be an error, "
    "but it looks strange"
)
MSG_233 = (
    "This waterway has layer=-1 but no tag indicating that it actually is "
    "underground. Consider adding a tunnel, culvert or pipeline tag or "
    "remove the layer tag."
)
NEG_LAYERS = ["-1", "-2", "-3", "-4", "-5"]
POS_LAYERS = ["1", "2", "3", "4", "5"]


def run(v: OsmViews) -> DataFrame:
    # --- 231 -------------------------------------------------------
    highways = (
        v.way_tags.filter((F.col("k") == "highway") & (F.col("v") != "steps"))
        .select("tile", "way_id")
        .distinct()
    )
    hw_nodes = v.way_nodes.join(highways, ["tile", "way_id"], "left_semi").select(
        "tile", "way_id", "node_id"
    )
    junctions = (
        hw_nodes.groupBy("tile", "node_id")
        .agg(F.count_distinct("way_id").alias("nw"))
        .filter(F.col("nw") > 1)
        .select("tile", "node_id")
    )
    pairs = (
        hw_nodes.join(junctions, ["tile", "node_id"], "left_semi")
        .select("tile", "way_id", "node_id")
        .distinct()
    )
    pairs = pairs.join(way_layers(v), ["tile", "way_id"], "left").fillna(
        {"layer": "0"}
    )
    ends = v.ways.select(
        "tile", F.col("id").alias("way_id"), "first_node_id", "last_node_id"
    )
    pairs = pairs.join(ends, ["tile", "way_id"], "left").withColumn(
        "end_node",
        (F.col("node_id") == F.col("first_node_id"))
        | (F.col("node_id") == F.col("last_node_id")),
    )
    stats = pairs.groupBy("tile", "node_id").agg(
        F.count_distinct("layer").alias("nlayers"),
        F.count("way_id").alias("nrows"),
        F.every("end_node").alias("all_end"),
        F.every(~F.col("end_node")).alias("all_intermediate"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("way_id", "layer"))),
                lambda s: F.concat(
                    F.lit("#"),
                    s.getField("way_id").cast("string"),
                    F.lit("("),
                    html_escape(s.getField("layer")),
                    F.lit(")"),
                ),
            ),
        ).alias("waylist"),
    )
    e231 = stats.filter(
        (F.col("nlayers") >= 2)
        & ~((F.col("nrows") == 2) & F.col("all_end"))
        & F.col("all_intermediate")
    )
    p231 = finish_errors(
        e231.select("tile", F.col("node_id").alias("object_id"), "waylist"),
        231,
        "node",
        MSG_231,
        txt1=F.col("waylist"),
    )

    # --- 232 -------------------------------------------------------
    bt = v.way_tags.filter(
        ((F.col("k") == "bridge") & ~F.col("v").isin("no", "false", "0"))
        | (
            (F.col("k") == "tunnel")
            & ~F.col("v").isin("no", "false", "0", "building_passage")
        )
    ).select("tile", "way_id", F.col("k").alias("btk"))
    layer = v.way_tags.filter(F.col("k") == "layer").select(
        "tile", "way_id", F.col("v").alias("lv")
    )
    e232 = bt.join(layer, ["tile", "way_id"]).filter(
        ((F.col("btk") == "bridge") & F.col("lv").isin(NEG_LAYERS))
        | ((F.col("btk") == "tunnel") & F.col("lv").isin(POS_LAYERS))
    )
    p232 = finish_errors(
        e232.select(
            "tile", F.col("way_id").alias("object_id"), "btk", "lv"
        ),
        232,
        "way",
        MSG_232,
        txt1=html_escape(F.col("btk")),
        txt2=html_escape(F.col("lv")),
    )

    # --- 233 -------------------------------------------------------
    waterway = v.way_tags.filter(F.col("k") == "waterway").select(
        "tile", "way_id"
    )
    big = v.ways.filter(F.col("node_count") >= 4).select(
        "tile", F.col("id").alias("way_id")
    )
    has_neg_layer = (
        v.way_tags.filter((F.col("k") == "layer") & F.col("v").isin(NEG_LAYERS))
        .select("tile", "way_id")
        .distinct()
    )
    covered = (
        v.way_tags.filter(
            ((F.col("k") == "tunnel") & ~F.col("v").isin("no", "false", "0"))
            | ((F.col("k") == "culvert") & (F.col("v") == "yes"))
            | ((F.col("k") == "covered") & F.col("v").isin("yes", "true", "1"))
            | ((F.col("k") == "pipeline") & F.col("v").isin("yes", "true", "1"))
            | ((F.col("k") == "location") & (F.col("v") == "underground"))
        )
        .select("tile", "way_id")
        .distinct()
    )
    e233 = (
        waterway.join(big, ["tile", "way_id"], "left_semi")
        .join(has_neg_layer, ["tile", "way_id"], "left_semi")
        .join(covered, ["tile", "way_id"], "left_anti")
    )
    p233 = finish_errors(
        e233.select("tile", F.col("way_id").alias("object_id")),
        233,
        "way",
        MSG_233,
    )

    return p231.unionByName(p232).unionByName(p233)


# object types this check can emit (error_view resolution pruning)
EMITS = ('node', 'way')
