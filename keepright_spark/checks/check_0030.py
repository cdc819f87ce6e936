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
rule is a data column (broadcast rules join), and ALL subjects' BFS
frontiers advance together as one iterative frontier join keyed by
(tile, rule, subject_way) — rounds = max component diameter, each
round a pair of hash joins; frontiers are localCheckpoint'ed to cut
lineage (SURVEY §8 hard part 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec import OsmViews
from ..data_tables import AREA_RULES
from ..errors import finish_errors

MSGID = "This way is tagged with '$1=$2' and should be closed-loop"
MAX_ROUNDS = 40


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

    key = ["tile", "rule_id", "sw"]
    targets = subjects.select(*key, F.col("last_node_id").alias("node_id"))

    # frontier: nodes reached last round, per subject
    frontier = subjects.select(*key, F.col("first_node_id").alias("node_id"))
    visited_nodes = frontier
    visited_ways = None  # (key, way_id)
    found = None  # subject keys whose last node was reached

    for _ in range(MAX_ROUNDS):
        # ways (≠ subject) touching the frontier nodes
        new_ways = (
            frontier.join(cwn_j, ["tile", "rule_id", "node_id"])
            .filter(F.col("way_id") != F.col("sw"))
            .select(*key, "way_id")
            .distinct()
        )
        if visited_ways is not None:
            new_ways = new_ways.join(visited_ways, [*key, "way_id"], "left_anti")
        new_ways = new_ways.localCheckpoint(eager=True)
        if new_ways.isEmpty():
            break
        visited_ways = (
            new_ways
            if visited_ways is None
            else visited_ways.unionByName(new_ways).localCheckpoint(eager=True)
        )
        # junction nodes of the newly found ways
        new_nodes = (
            new_ways.join(cwn_j, ["tile", "rule_id", "way_id"])
            .select(*key, "node_id")
            .distinct()
            .join(visited_nodes, [*key, "node_id"], "left_anti")
            .localCheckpoint(eager=True)
        )
        visited_nodes = visited_nodes.unionByName(new_nodes).localCheckpoint(
            eager=True
        )
        hit = new_nodes.join(targets, [*key, "node_id"], "left_semi").select(*key)
        found = hit if found is None else found.unionByName(hit)
        # subjects already satisfied stop expanding
        frontier = new_nodes
        if found is not None:
            frontier = frontier.join(found.distinct(), key, "left_anti")
        if frontier.isEmpty():
            break

    open_subjects = subjects
    if found is not None:
        open_subjects = subjects.join(found.distinct(), key, "left_anti")

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
