"""Check 0030 — non-closed areas.

Reference: /root/reference/checks/0030_non-closed_areas.php (417 LoC).

For every area-implying tag rule (k, v) from standard.xml (//rule/area,
0030:48-79; static table data_tables.AREA_RULES): ways tagged with the
rule whose first node ≠ last node must still form a closed loop
together with *same-rule* ways — BFS from the first node over the
rule-class junction graph (nodes used by ≥2 class ways, 0030:146-186)
must reach the last node without traversing the way itself
(is_closed_loop, 0030:366-415).  Unreachable → error
"This way is tagged with '$1=$2' and should be closed-loop",
txt1=k, txt2=v.

The reference runs one BFS per way per rule.  Spark-first shape: the
rule is a data column (broadcast rules join), and the per-subject
reachability runs inside a vectorized applyInPandas operator keyed by
(tile, rule) — tile-local graphs are small, so one shuffle replaces
diameter-many driver rounds (SURVEY §8 hard part 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec import OsmViews
from ..data_tables import AREA_RULES
from ..errors import finish_errors

MSGID = "This way is tagged with '$1=$2' and should be closed-loop"


def run(v: OsmViews) -> DataFrame:
    spark = v.ways.sparkSession
    rules = F.broadcast(
        spark.createDataFrame(
            [(i, k, None if val == "*" else val, val) for i, (k, val) in enumerate(AREA_RULES)],
            "rule_id int, rk string, rv string, rv_disp string",
        )
    )

    # ways per rule class (tile, rule_id, way_id, k, v_disp)
    cw = (
        v.way_tags.join(
            rules,
            (F.col("k") == F.col("rk"))
            & (F.col("rv").isNull() | (F.col("v") == F.col("rv"))),
        )
        .select(
            "tile", "rule_id", "way_id",
            F.col("rk").alias("cls_k"),
            # v='*' rules report the way's own value? No — the
            # reference reports the literal rule value '*'... it
            # interpolates $v into the message, which for '*' rules is
            # the literal '*' (0030:268: txt2 = escape($v))
            F.col("rv_disp").alias("cls_v"),
        )
        .distinct()
    )

    cwn = (
        v.way_nodes.select("tile", "way_id", "node_id")
        .join(cw.select("tile", "rule_id", "way_id").distinct(), ["tile", "way_id"])
        .select("tile", "rule_id", "way_id", "node_id")
        .distinct()
    )
    jn = (
        cwn.groupBy("tile", "rule_id", "node_id")
        .agg(F.count_distinct("way_id").alias("nw"))
        .filter(F.col("nw") > 1)
        .select("tile", "rule_id", "node_id")
    )
    cwn_j = cwn.join(jn, ["tile", "rule_id", "node_id"], "left_semi").persist()

    subjects = (
        cw.join(
            v.ways.select(
                "tile", F.col("id").alias("way_id"),
                "first_node_id", "last_node_id",
            ),
            ["tile", "way_id"],
        )
        .filter(F.col("first_node_id") != F.col("last_node_id"))
        .select(
            "tile", "rule_id",
            F.col("way_id").alias("sw"),
            "first_node_id", "last_node_id", "cls_k", "cls_v",
        )
        .persist()
    )

    # per-(tile, rule) reachability inside a vectorized applyInPandas
    # operator: the rule-class junction graphs are tile-local and
    # small, so one shuffle replaces diameter-many driver BFS rounds.
    # Semantics identical to is_closed_loop (0030:366-415): last node
    # reachable from first node over junction nodes without using the
    # subject way itself.
    import pandas as pd
    from pyspark.sql.types import LongType, IntegerType, StringType, StructField, StructType

    graph = cwn_j.select("tile", "rule_id", "way_id", "node_id")
    subj_in = subjects.select(
        "tile", "rule_id", "sw", "first_node_id", "last_node_id"
    ).withColumnRenamed("sw", "way_id").withColumn(
        "node_id", F.lit(None).cast("long")
    )
    combined = graph.withColumn("first_node_id", F.lit(None).cast("long")) \
        .withColumn("last_node_id", F.lit(None).cast("long")) \
        .unionByName(subj_in.select("tile", "rule_id", "way_id", "node_id",
                                    "first_node_id", "last_node_id"))

    out_schema = StructType([
        StructField("tile", StringType()),
        StructField("rule_id", IntegerType()),
        StructField("sw", LongType()),
    ])

    def open_in_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        gmask = pdf["node_id"].notna()
        g = pdf[gmask]
        subj = pdf[~gmask]
        node_ways: dict = {}
        way_nodes: dict = {}
        for w, nd in zip(g["way_id"].to_numpy(), g["node_id"].to_numpy()):
            w, nd = int(w), int(nd)
            node_ways.setdefault(nd, set()).add(w)
            way_nodes.setdefault(w, set()).add(nd)
        bad = []
        for w, fn, ln in zip(subj["way_id"].to_numpy(),
                             subj["first_node_id"].to_numpy(),
                             subj["last_node_id"].to_numpy()):
            w, fn, ln = int(w), int(fn), int(ln)
            seen_nodes = {fn}
            seen_ways = set()
            frontier = [fn]
            found = False
            while frontier and not found:
                nxt = []
                for nd in frontier:
                    for ow in node_ways.get(nd, ()):  # ways at node
                        if ow == w or ow in seen_ways:
                            continue
                        seen_ways.add(ow)
                        for nd2 in way_nodes[ow]:
                            if nd2 not in seen_nodes:
                                seen_nodes.add(nd2)
                                nxt.append(nd2)
                                if nd2 == ln:
                                    found = True
                frontier = nxt
            if not found:
                bad.append(w)
        if not bad:
            return pd.DataFrame({"tile": [], "rule_id": [], "sw": []}).astype(
                {"tile": str, "rule_id": "int32", "sw": "int64"})
        return pd.DataFrame({
            "tile": pdf["tile"].iloc[0],
            "rule_id": pdf["rule_id"].iloc[0],
            "sw": bad,
        })

    open_keys = combined.groupBy("tile", "rule_id").applyInPandas(
        open_in_group, out_schema
    )
    open_subjects = subjects.join(
        open_keys, ["tile", "rule_id", "sw"], "left_semi"
    )

    e = open_subjects.select(
        "tile",
        F.col("sw").alias("object_id"),
        F.col("cls_k").alias("t1"),
        F.col("cls_v").alias("t2"),
    )
    out = finish_errors(
        e, 30, "way", MSGID, txt1=F.col("t1"), txt2=F.col("t2")
    ).drop("t1", "t2")
    cwn_j.unpersist()
    subjects.unpersist()
    return out


# object types this check can emit (error_view resolution pruning)
EMITS = ("way",)
