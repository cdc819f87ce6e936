"""Check 0070 — missing / empty tags (subtypes 71-75).

Reference: /root/reference/checks/0070_missing_tags.php (138 LoC).

* 74: node/way/relation with an empty tag key or value; txt2 is the
  html-escaped '"k=v"' list of the offending tags (0070:13-27).
* 71: way with no tags besides created_by/source (0070:31-47), unless
  it is a member of a relation that has any tag (0070:54-63).
* 72: node with no tags that is in no way and no relation (0070:74-93).
* 73: way with tracktype/lanes but no highway-ish tag (0070:96-108);
  one row per way (insert-ignore PK) — we keep MIN(k) as txt1.
* 75: name but no other tag, ways and nodes (0070:113-137); txt1=name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec import OsmViews
from ..errors import finish_errors
from ..lib import html_escape, quoted_tag_list, tags_of


def _empty(col):
    return col.isNull() | (F.length(F.trim(col)) == 0)


def run(v: OsmViews) -> DataFrame:
    parts = []

    # --- 74: empty keys or values ---------------------------------
    for otype in ("node", "way", "relation"):
        tags = tags_of(v, otype)
        bad = tags.filter(_empty(F.col("k")) | _empty(F.col("v")))
        lst = quoted_tag_list(bad)
        parts.append(
            finish_errors(
                lst.select("tile", F.col("id").alias("object_id"), "taglist"),
                74,
                otype,
                "This $1 has an empty tag: $2",
                txt1=F.lit(otype),
                txt2=html_escape(F.col("taglist")),
            )
        )

    # --- 71: ways with no tags (except created_by/source) ---------
    tagged_ways = (
        v.way_tags.filter(~F.col("k").isin("created_by", "source"))
        .select("tile", F.col("way_id").alias("id"))
        .distinct()
    )
    untagged = v.ways.select("tile", "id").join(
        tagged_ways, ["tile", "id"], "left_anti"
    )
    # exception: member of a tagged relation
    tagged_rels = (
        v.relation_tags.filter(F.col("k").isNotNull())
        .select("tile", "relation_id")
        .distinct()
    )
    members_of_tagged = (
        v.relation_members.filter(F.col("member_type") == "W")
        .join(tagged_rels, ["tile", "relation_id"], "left_semi")
        .select("tile", F.col("member_id").alias("id"))
        .distinct()
    )
    e71 = untagged.join(members_of_tagged, ["tile", "id"], "left_anti")
    parts.append(
        finish_errors(
            e71.select("tile", F.col("id").alias("object_id")),
            71,
            "way",
            "This way has no tags",
        )
    )

    # --- 72: lone untagged nodes -----------------------------------
    n = v.nodes.select("tile", "id")
    in_way = v.way_nodes.select("tile", F.col("node_id").alias("id")).distinct()
    has_tags = v.node_tags.select("tile", F.col("node_id").alias("id")).distinct()
    in_rel = (
        v.relation_members.filter(F.col("member_type") == "N")
        .select("tile", F.col("member_id").alias("id"))
        .distinct()
    )
    e72 = (
        n.join(in_way, ["tile", "id"], "left_anti")
        .join(has_tags, ["tile", "id"], "left_anti")
        .join(in_rel, ["tile", "id"], "left_anti")
    )
    parts.append(
        finish_errors(
            e72.select("tile", F.col("id").alias("object_id")),
            72,
            "node",
            "This node is not member of any way and does not have any tags",
        )
    )

    # --- 73: tracktype/lanes but no highway ------------------------
    hwish = (
        v.way_tags.filter(
            F.col("k").isin(
                "highway", "disused:highway", "razed:highway",
                "abandoned:highway", "proposed:highway", "piste:type",
            )
            | ((F.col("k") == "leisure") & (F.col("v") == "track"))
        )
        .select("tile", "way_id")
        .distinct()
    )
    e73 = (
        v.way_tags.filter(F.col("k").isin("tracktype", "lanes"))
        .join(hwish, ["tile", "way_id"], "left_anti")
        .groupBy("tile", "way_id")
        .agg(F.min("k").alias("offending_k"))
    )
    parts.append(
        finish_errors(
            e73.select("tile", F.col("way_id").alias("object_id"), "offending_k"),
            73,
            "way",
            "This way has a $1 tag but no highway tag",
            txt1=F.col("offending_k"),
        )
    )

    # --- 75: name but no other tag ---------------------------------
    for otype, idcol in (("way", "way_id"), ("node", "node_id")):
        tags = tags_of(v, otype)
        named = tags.filter(F.col("k") == "name")
        other = tags.filter(F.col("k") != "name").select("tile", "id").distinct()
        e75 = named.join(other, ["tile", "id"], "left_anti")
        parts.append(
            finish_errors(
                e75.select("tile", F.col("id").alias("object_id"), "v"),
                75,
                otype,
                f"This {otype} has a name ($1) but no other tag",
                txt1=F.col("v"),
            )
        )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# object types this check can emit (error_view resolution pruning)
EMITS = ('node', 'way', 'relation')
