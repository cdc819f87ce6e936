"""Check 0360 — language unknown.

Reference: /root/reference/checks/0360_language_unknown.php:28-57.
Objects with a name and some name:XX (exactly two chars) but no
name:XX equal to the name.  txt1=object_type, txt2=html(MAX(name)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec import OsmViews
from ..errors import finish_errors
from ..lib import html_escape, tags_of

MSGID = (
    "It would be nice if this $1 had an additional tag 'name:XX=$2' "
    "where XX shows the language of its name '$2'."
)


def run(v: OsmViews) -> DataFrame:
    out = None
    for otype in ("node", "way", "relation"):
        tags = tags_of(v, otype)
        names = tags.filter(F.col("k") == "name")
        localized = tags.filter(F.col("k").like("name:__")).select(
            "tile", "id", F.col("v").alias("lv")
        )
        has_localized = localized.select("tile", "id").distinct()
        same_value = (
            names.join(localized, ["tile", "id"])
            .filter(F.col("lv") == F.col("v"))
            .select("tile", "id")
            .distinct()
        )
        e = (
            names.join(has_localized, ["tile", "id"], "left_semi")
            .join(same_value, ["tile", "id"], "left_anti")
            .groupBy("tile", "id")
            .agg(F.max("v").alias("name_v"))
        )
        p = finish_errors(
            e.select("tile", F.col("id").alias("object_id"), "name_v"),
            360,
            otype,
            MSGID,
            txt1=F.lit(otype),
            txt2=html_escape(F.col("name_v")),
        )
        out = p if out is None else out.unionByName(p)
    return out


# object types this check can emit (error_view resolution pruning)
EMITS = ('node', 'way', 'relation')
