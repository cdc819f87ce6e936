"""Check 0380 — non-physical sport tag.

Reference: /root/reference/checks/0380_nonphysical_sport_tag.php:15-35.
Ways with sport=* but no physical tag.  txt1 = 'sport=' || html(MIN(v)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec import OsmViews
from ..errors import finish_errors
from ..lib import html_escape

PHYSICAL = [
    "leisure", "piste", "building", "natural", "landuse", "highway",
    "bridge", "ski_resort", "route", "tourism", "amenity", "shop",
]
MSGID = (
    "This way is tagged $1 but has no physical tag like e.g. leisure, "
    "building, amenity or highway"
)


def run(v: OsmViews) -> DataFrame:
    sport = (
        v.way_tags.filter(F.col("k") == "sport")
        .groupBy("tile", "way_id")
        .agg(F.min("v").alias("sport_v"))
    )
    physical = (
        v.way_tags.filter(
            F.col("k").isin(PHYSICAL) | F.col("k").like("piste:%")
        )
        .select("tile", "way_id")
        .distinct()
    )
    e = sport.join(physical, ["tile", "way_id"], "left_anti")
    return finish_errors(
        e.select("tile", F.col("way_id").alias("object_id"), "sport_v"),
        380,
        "way",
        MSGID,
        txt1=F.concat(F.lit("sport="), html_escape(F.col("sport_v"))),
    )


# object types this check can emit (error_view resolution pruning)
EMITS = ('way',)
