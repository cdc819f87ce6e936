"""Check 0180 — relations without type.

Reference: /root/reference/checks/0180_relations_without_type.php:7-19.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec import OsmViews
from ..errors import finish_errors

MSGID = "This relation has no type tag, which is mandatory for relations"


def run(v: OsmViews) -> DataFrame:
    typed = (
        v.relation_tags.filter(F.col("k") == "type")
        .select("tile", "relation_id")
        .distinct()
    )
    e = v.relations.select("tile", F.col("id").alias("relation_id")).join(
        typed, ["tile", "relation_id"], "left_anti"
    )
    return finish_errors(
        e.select("tile", F.col("relation_id").alias("object_id")),
        180,
        "relation",
        MSGID,
    )


# object types this check can emit (error_view resolution pruning)
EMITS = ('relation',)
