"""Check 0300 — missing maxspeed.

Reference: /root/reference/checks/0300_maxspeed.php:18-40.
motorway/trunk/primary/secondary without maxspeed(:forward/:backward),
roundabout, bridge or tunnel, and geometry length > 50 Mercator
meters (ST_Length on the Mercator-meter geometry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec import OsmViews
from ..errors import finish_errors
from ..lib import FALSY, way_lengths

MSGID = "missing maxspeed tag"


def run(v: OsmViews) -> DataFrame:
    major = (
        v.way_tags.filter(
            (F.col("k") == "highway")
            & F.col("v").isin("motorway", "trunk", "primary", "secondary")
        )
        .select("tile", "way_id")
        .distinct()
    )
    exempt = (
        v.way_tags.filter(
            F.col("k").isin("maxspeed", "maxspeed:forward", "maxspeed:backward")
            | ((F.col("k") == "junction") & (F.col("v") == "roundabout"))
            | (F.col("k").isin("bridge", "tunnel") & ~F.col("v").isin(FALSY))
        )
        .select("tile", "way_id")
        .distinct()
    )
    lengths = way_lengths(v)
    e = (
        major.join(exempt, ["tile", "way_id"], "left_anti")
        .join(lengths, ["tile", "way_id"])
        .filter(F.col("length") > 50)
    )
    return finish_errors(
        e.select("tile", F.col("way_id").alias("object_id")), 300, "way", MSGID
    )


# object types this check can emit (error_view resolution pruning)
EMITS = ('way',)
