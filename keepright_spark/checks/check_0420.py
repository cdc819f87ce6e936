"""Check 0420 — suspicious tag values (subtypes 421-424).

Reference: /root/reference/checks/0420_suspicious_values.php (103 LoC).

* 421: wrong number/unit format for incline, height/width/length
  family, maxspeed/minspeed (0420:18-43) — Postgres ~ regexes kept
  verbatim (they are RE2/Java compatible).
* 422: ';'-lists in single-valued way keys, and yes;no combinations on
  any object (0420:49-65).
* 423: numeric addr:housename on ways/nodes (0420:69-82).
* 424: suspicious tag combos — golf=bunker with natural=beach
  (0420:87-101).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec import OsmViews
from ..errors import finish_errors
from ..lib import tags_of

MSG_INCLINE = (
    "This $1 is tagged incline=$2 which seems to not use the correct number "
    "format. The unit should be per cent or degrees and no spaces should be added"
)
MSG_UNIT = (
    "This $1 is tagged $2=$3 which seems to not use the correct number format. "
    "The unit should be meter, kilometer, miles or feet/inch. A space should "
    "be added between number and unit"
)
MSG_LIST = (
    "This way is tagged $1=$2. A list of values does not match the purpose "
    "of this key"
)
MSG_YESNO = "This $3 is tagged $1=$2. Having yes and no both in the same value seems wrong."
MSG_HOUSENAME_WAY = (
    "This way is tagged with $1 and a numeric value. This is rather unusual."
)
MSG_HOUSENAME_NODE = (
    "This node is tagged with $1 and a numeric value. This is rather unusual."
)
MSG_COMBO = (
    "This object is tagged $1 = $2 and $3 = $4 which seems wrong. Consider $5."
)

HEIGHT_KEYS = [
    "height", "maxheight", "min_height", "width", "maxwidth", "distance",
    "length", "maxlength",
]
LIST_KEYS = [
    "maxspeed", "oneway", "cycleway", "sidewalk", "highway", "landuse",
    "tracktype", "layer", "width", "lanes", "smoothness", "trail_visibility",
]

RX_DIGIT = r"\d"
# the reference writes [\%\°]; the escapes are redundant in both
# Postgres and Java regex, and RE2 (DuckDB) rejects \° — use the
# equivalent unescaped class on both sides
RX_INCLINE_OK = r"^[+-]?\d+(\.\d+)?[%°]?$"
RX_LEN_OK = r"^[+-]?\d+(\.\d+)?(\s(m|km|mi|nmi))?$"
RX_FEET_OK = "^\\d+'\\d+\\\"$"
RX_SPEED_OK = r"^\d+(\.\d+)?(\s(km/h|mph|knots))?$"
RX_YESNO = r"(yes|no)\s*;\s*(yes|no)"


def run(v: OsmViews) -> DataFrame:
    parts = []

    for otype in ("node", "way", "relation"):
        tags = tags_of(v, otype)

        bad_incline = tags.filter(
            (F.col("k") == "incline")
            & (F.col("v") != "0")
            & F.col("v").rlike(RX_DIGIT)
            & ~F.col("v").rlike(RX_INCLINE_OK)
        )
        parts.append(
            finish_errors(
                bad_incline.select("tile", F.col("id").alias("object_id"), "v"),
                421, otype, MSG_INCLINE,
                txt1=F.lit(otype), txt2=F.col("v"),
            )
        )

        bad_len = tags.filter(
            F.col("k").isin(HEIGHT_KEYS)
            & F.col("v").rlike(RX_DIGIT)
            & ~F.col("v").rlike(RX_LEN_OK)
            & ~F.col("v").rlike(RX_FEET_OK)
        )
        parts.append(
            finish_errors(
                bad_len.select("tile", F.col("id").alias("object_id"), "k", "v"),
                421, otype, MSG_UNIT,
                txt1=F.lit(otype), txt2=F.col("k"), txt3=F.col("v"),
            )
        )

        bad_speed = tags.filter(
            F.col("k").isin("maxspeed", "minspeed")
            & F.col("v").rlike(RX_DIGIT)
            & ~F.col("v").rlike(RX_SPEED_OK)
        )
        parts.append(
            finish_errors(
                bad_speed.select("tile", F.col("id").alias("object_id"), "k", "v"),
                421, otype, MSG_UNIT,
                txt1=F.lit(otype), txt2=F.col("k"), txt3=F.col("v"),
            )
        )

        yesno = tags.filter(F.col("v").rlike(RX_YESNO))
        parts.append(
            finish_errors(
                yesno.select("tile", F.col("id").alias("object_id"), "k", "v"),
                422, otype, MSG_YESNO,
                txt1=F.col("k"), txt2=F.col("v"), txt3=F.lit(otype),
            )
        )

        combo_a = tags.filter((F.col("k") == "golf") & (F.col("v") == "bunker"))
        combo_b = (
            tags.filter((F.col("k") == "natural") & (F.col("v") == "beach"))
            .select("tile", "id")
            .distinct()
        )
        parts.append(
            finish_errors(
                combo_a.join(combo_b, ["tile", "id"], "left_semi").select(
                    "tile", F.col("id").alias("object_id")
                ),
                424, otype, MSG_COMBO,
                txt1=F.lit("golf"), txt2=F.lit("bunker"),
                txt3=F.lit("natural"), txt4=F.lit("beach"),
                txt5=F.lit("natural=sand"),
            )
        )

    # 422 value lists — ways only
    lists = v.way_tags.filter(
        F.col("k").isin(LIST_KEYS) & F.col("v").contains(";")
    )
    parts.append(
        finish_errors(
            lists.select("tile", F.col("way_id").alias("object_id"), "k", "v"),
            422, "way", MSG_LIST,
            txt1=F.col("k"), txt2=F.col("v"),
        )
    )

    # 423 numeric addr:housename
    for otype, msg in (("way", MSG_HOUSENAME_WAY), ("node", MSG_HOUSENAME_NODE)):
        tags = tags_of(v, otype)
        hn = tags.filter(
            (F.col("k") == "addr:housename") & F.col("v").rlike(r"^\d+$")
        )
        parts.append(
            finish_errors(
                hn.select("tile", F.col("id").alias("object_id"), "k"),
                423, otype, msg, txt1=F.col("k"),
            )
        )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# object types this check can emit (error_view resolution pruning)
EMITS = ('node', 'way', 'relation')
