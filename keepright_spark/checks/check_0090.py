"""Check 0090 — motorways without ref.

Reference: /root/reference/checks/0090_motorways_without_ref.php:10-40.
highway=motorway ways lacking noref/ref/nat_ref/int_ref on the way
itself and on every containing relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec import OsmViews
from ..errors import finish_errors

REFS = ["noref", "ref", "nat_ref", "int_ref"]
MSGID = (
    "This way is tagged as motorway and therefore needs a ref, "
    "nat_ref or int_ref tag"
)


def run(v: OsmViews) -> DataFrame:
    motorways = (
        v.way_tags.filter((F.col("k") == "highway") & (F.col("v") == "motorway"))
        .select("tile", "way_id")
        .distinct()
    )
    has_ref = v.way_tags.filter(F.col("k").isin(REFS)).select("tile", "way_id").distinct()
    rel_with_ref = (
        v.relation_tags.filter(F.col("k").isin(REFS))
        .select("tile", "relation_id")
        .distinct()
    )
    member_of_ref_rel = (
        v.relation_members.filter(F.col("member_type") == "W")
        .join(rel_with_ref, ["tile", "relation_id"], "left_semi")
        .select("tile", F.col("member_id").alias("way_id"))
        .distinct()
    )
    e = motorways.join(has_ref, ["tile", "way_id"], "left_anti").join(
        member_of_ref_rel, ["tile", "way_id"], "left_anti"
    )
    return finish_errors(
        e.select("tile", F.col("way_id").alias("object_id")), 90, "way", MSGID
    )


# object types this check can emit (error_view resolution pruning)
EMITS = ('way',)
