"""Check 0100 — places of worship without religion.

Reference: /root/reference/checks/0100_places_of_worship_without_religion.php:10-24.
Nodes and ways with amenity=place_of_worship lacking
religion/denomination.  txt1 = object type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec import OsmViews
from ..errors import finish_errors
from ..lib import tags_of

MSGID = "This $1 is tagged as place of worship and therefore needs a religion tag"


def run(v: OsmViews) -> DataFrame:
    out = None
    for otype in ("node", "way"):
        tags = tags_of(v, otype)
        pow_ = (
            tags.filter((F.col("k") == "amenity") & (F.col("v") == "place_of_worship"))
            .select("tile", "id")
            .distinct()
        )
        has_rel = (
            tags.filter(F.col("k").isin("religion", "denomination"))
            .select("tile", "id")
            .distinct()
        )
        e = finish_errors(
            pow_.join(has_rel, ["tile", "id"], "left_anti").select(
                "tile", F.col("id").alias("object_id")
            ),
            100,
            otype,
            MSGID,
            txt1=F.lit(otype),
        )
        out = e if out is None else out.unionByName(e)
    return out


# object types this check can emit (error_view resolution pruning)
EMITS = ('node', 'way')
