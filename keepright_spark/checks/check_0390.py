"""Check 0390 — missing tracktype.

Reference: /root/reference/checks/0390_missing_tracktype.php:10-24.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec import OsmViews
from ..errors import finish_errors

MSGID = "This track doesn't have a tracktype"


def run(v: OsmViews) -> DataFrame:
    tracks = (
        v.way_tags.filter((F.col("k") == "highway") & (F.col("v") == "track"))
        .select("tile", "way_id")
        .distinct()
    )
    has_tt = (
        v.way_tags.filter(F.col("k") == "tracktype")
        .select("tile", "way_id")
        .distinct()
    )
    e = tracks.join(has_tt, ["tile", "way_id"], "left_anti")
    return finish_errors(
        e.select("tile", F.col("way_id").alias("object_id")), 390, "way", MSGID
    )


# object types this check can emit (error_view resolution pruning)
EMITS = ('way',)
