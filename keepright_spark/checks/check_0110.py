"""Check 0110 — points of interest without name.

Reference: /root/reference/checks/0110_point_of_interest_without_name.php:17-58.
Three amenity groups on nodes, each requiring name / name|operator /
name|operator|brand.  Amenity value per node is MIN(v); txt1=html(v).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec import OsmViews
from ..errors import finish_errors
from ..lib import html_escape

GROUPS = [
    (
        ["place_of_worship", "pub", "restaurant", "school", "university",
         "hospital", "library", "theatre", "courthouse"],
        ["name"],
        "This node is tagged as $1 and therefore needs a name tag",
    ),
    (
        ["bank", "cinema", "pharmacy", "cafe"],
        ["name", "operator"],
        "This node is tagged as $1 and therefore needs a name tag or an operator tag",
    ),
    (
        ["fast_food", "fuel"],
        ["name", "operator", "brand"],
        "This node is tagged as $1 and therefore needs a name, operator or brand tag",
    ),
]


def run(v: OsmViews) -> DataFrame:
    out = None
    for amenities, needed, msgid in GROUPS:
        poi = (
            v.node_tags.filter((F.col("k") == "amenity") & F.col("v").isin(amenities))
            .groupBy("tile", "node_id")
            .agg(F.min("v").alias("amenity_v"))
        )
        has = (
            v.node_tags.filter(F.col("k").isin(needed))
            .select("tile", "node_id")
            .distinct()
        )
        e = finish_errors(
            poi.join(has, ["tile", "node_id"], "left_anti").select(
                "tile", F.col("node_id").alias("object_id"), "amenity_v"
            ),
            110,
            "node",
            msgid,
            txt1=html_escape(F.col("amenity_v")),
        )
        out = e if out is None else out.unionByName(e)
    return out


# object types this check can emit (error_view resolution pruning)
EMITS = ('node',)
