"""Check 0170 — FIXME tags.

Reference: /root/reference/checks/0170_fixme.php:10-40.
Any tag with 'fixme' in key or value (case-insensitive), name/ref
= 'tbd', or highway=road.  One error per object; msgid is literally
'$1' and txt1 the html-escaped '"k=v"' list of matching tags.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec import OsmViews
from ..errors import finish_errors
from ..lib import html_escape, quoted_tag_list, tags_of


def _cond():
    return (
        F.lower(F.col("k")).contains("fixme")
        | F.lower(F.col("v")).contains("fixme")
        | ((F.col("k") == "name") & (F.col("v") == "tbd"))
        | ((F.col("k") == "ref") & (F.col("v") == "tbd"))
        | ((F.col("k") == "highway") & (F.col("v") == "road"))
    )


def run(v: OsmViews) -> DataFrame:
    out = None
    for otype in ("node", "way", "relation"):
        tags = tags_of(v, otype).filter(_cond())
        lst = quoted_tag_list(tags)
        e = finish_errors(
            lst.select("tile", F.col("id").alias("object_id"), "taglist"),
            170,
            otype,
            "$1",
            txt1=html_escape(F.col("taglist")),
        )
        out = e if out is None else out.unionByName(e)
    return out


# object types this check can emit (error_view resolution pruning)
EMITS = ('node', 'way', 'relation')
