"""Web read-path serialization: message templating + feed exports.

Re-expression of the reference's presentation tier over the published
error view:

* ``render_description`` — the ``$1..$5`` substitution of
  web/export.php:46-48 (plain) and web/points.php:104-217 (with
  per-error-type OSM hyperlink wrapping + partner_objects lists), as
  native column expressions.
* ``points_rows`` — the full web/points.php:29-217 row shape: nearest
  350 errors around a map centre with icon file, description,
  partner_objects and tab-safe field cleanup.
* ``gpx_export`` / ``rss_export`` / ``geojson_export`` — the three
  web/export.php:58-173 serializers over a ``bbox_export`` result.
  Row XML/JSON fragments are built as ONE native format_string column
  (no per-row Python); the final document concatenation collects the
  fragments — bounded by the read path's LIMIT 10000, exactly like the
  reference's while-fetch-echo loop.

The subtyped-decade rule (titles prefix the decade name onto subtype
rows) mirrors web/helpers.inc.php:54-76: a decade is subtyped when the
error-name catalog has an entry strictly inside (d+1 .. d+9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .data_tables import ERROR_NAMES

# decades with named subtypes (helpers.inc.php:54-76)
SUBTYPED_DECADES = sorted(
    {
        (t // 10) * 10
        for t in ERROR_NAMES
        if t % 10 != 0 and ((t // 10) * 10) in ERROR_NAMES
    }
)

OSM_BROWSE = "http://www.openstreetmap.org/browse"


def _hyperlink(object_type: str, id_col: Column) -> Column:
    """points.php:224-226."""
    return F.concat(
        F.lit(f"<a target='_blank' href='{OSM_BROWSE}/{object_type}/"),
        id_col,
        F.lit("'>"),
        id_col,
        F.lit("</a>"),
    )


def _wrap_id_list(txt: Column, object_type: str) -> Column:
    """Wrap every 3-15 digit id inside a free-text list in a hyperlink
    (points.php:117-137); 1-2 digit numbers (layer values) pass
    through."""
    return F.regexp_replace(
        txt,
        r"(\d{3,15})",
        f"<a target='_blank' href='{OSM_BROWSE}/{object_type}/$1'>$1</a>",
    )


def _partner_list(txt: Column, object_type: str) -> Column:
    ids = F.regexp_extract_all(F.coalesce(txt, F.lit("")), F.lit(r"(\d{3,15})"), 1)
    return F.when(F.size(ids) > 0, F.concat(
        F.lit(object_type), F.array_join(ids, "," + object_type)
    )).otherwise(F.lit(""))


def _substitute(msgid: Column, repl: dict[str, Column]) -> Column:
    out = F.coalesce(msgid, F.lit(""))
    for i in range(1, 6):
        out = F.replace(
            out, F.lit(f"${i}"), F.coalesce(repl[f"${i}"], F.lit(""))
        )
    return out


def render_description(df: DataFrame, hyperlinks: bool = False) -> DataFrame:
    """Add ``description`` (and, with ``hyperlinks``,
    ``partner_objects``) columns to published-view rows.

    Plain mode is web/export.php:46-48; hyperlink mode applies the
    per-error-type id wrapping of web/points.php:113-186."""
    et = F.col("error_type")
    txt = {f"${i}": F.col(f"txt{i}") for i in range(1, 6)}
    if not hyperlinks:
        return df.withColumn("description", _substitute(F.col("msgid"), txt))

    repl = dict(txt)
    # id *lists* in txt1 (points.php:117-137)
    list_node = et.isin(20, 211, 294)
    list_way = et == 231
    # single ids (points.php:139-186)
    one_node_t1 = et.isin(40, 41, 210)
    one_way_t1 = et.isin(50, 297, 298, 370)
    one_way_t3 = et.isin(*range(191, 199), *range(201, 209))
    both_ways = et == 401
    node_and_way = et == 295

    repl["$1"] = (
        F.when(list_node, _wrap_id_list(txt["$1"], "node"))
        .when(list_way, _wrap_id_list(txt["$1"], "way"))
        .when(one_node_t1 | node_and_way, _hyperlink("node", txt["$1"]))
        .when(one_way_t1 | both_ways, _hyperlink("way", txt["$1"]))
        .otherwise(txt["$1"])
    )
    repl["$2"] = (
        F.when(both_ways, _hyperlink("way", txt["$2"]))
        .when(node_and_way, _hyperlink("way", txt["$2"]))
        .otherwise(txt["$2"])
    )
    repl["$3"] = F.when(one_way_t3, _hyperlink("way", txt["$3"])).otherwise(
        txt["$3"]
    )

    partner = (
        F.when(list_node, _partner_list(txt["$1"], "node"))
        .when(list_way, _partner_list(txt["$1"], "way"))
        .when(one_node_t1, F.concat(F.lit("node"), txt["$1"]))
        .when(one_way_t1, F.concat(F.lit("way"), txt["$1"]))
        .when(one_way_t3, F.concat(F.lit("way"), txt["$3"]))
        .when(
            both_ways,
            F.concat(F.lit("way"), txt["$1"], F.lit(",way"), txt["$2"]),
        )
        .when(
            node_and_way,
            F.concat(F.lit("node"), txt["$1"], F.lit(",way"), txt["$2"]),
        )
        .otherwise(F.lit(""))
    )
    return df.withColumn(
        "description", _substitute(F.col("msgid"), repl)
    ).withColumn("partner_objects", partner)


def _tab_safe(c: Column) -> Column:
    """strtr(x, {"\\t": " ", "\\r\\n": "<br>", "\\n": "<br>"})."""
    c = F.coalesce(c, F.lit(""))
    c = F.replace(c, F.lit("\t"), F.lit(" "))
    c = F.replace(c, F.lit("\r\n"), F.lit("<br>"))
    return F.replace(c, F.lit("\n"), F.lit("<br>"))


def points_rows(published: DataFrame, lat: float, lon: float,
                error_types: list[int] | None = None,
                limit: int = 350,
                comments: DataFrame | None = None,
                show_ign: bool = False,
                show_tmpign: bool = False) -> DataFrame:
    """The web/points.php row frame: nearest ``limit`` errors with
    rendered description, icon and partner objects.

    With ``comments``, the read folds comment state exactly like
    points.php:65-79: ``state = COALESCE(c.state, e.state)``, the
    comment text rides along, and the ``show_ign`` / ``show_tmpign``
    flags filter on the *comment* state (``c.state IS NULL OR
    c.state <> 'ignore'[_temporarily]``) BEFORE the nearest-350 cut —
    so with the flags on, ignored errors surface with the angel/devil
    icons of points.php:93-102."""
    from .export import viewport_query

    if comments is not None:
        c = comments.select(
            "tile",
            "error_id",
            F.col("state").alias("_cstate"),
            F.col("comment").alias("comment"),
        )
        published = (
            published.join(c, ["tile", "error_id"], "left")
            .withColumn("state", F.coalesce(F.col("_cstate"), F.col("state")))
        )
        if not show_ign:
            published = published.filter(
                F.col("_cstate").isNull() | (F.col("_cstate") != "ignore")
            )
        if not show_tmpign:
            published = published.filter(
                F.col("_cstate").isNull()
                | (F.col("_cstate") != "ignore_temporarily")
            )
        published = published.drop("_cstate")
    else:
        published = published.withColumn(
            "comment", F.lit(None).cast("string")
        )

    df = viewport_query(published, lat, lon, error_types, limit)
    df = render_description(df, hyperlinks=True)
    et = F.col("error_type")
    filenr = (
        F.when(F.col("state") == "ignore_temporarily", F.lit("angel"))
        .when(F.col("state") == "ignore", F.lit("devil"))
        .otherwise((10 * F.floor(et / 10)).cast("int").cast("string"))
    )
    return df.select(
        (F.col("lat") / 1e7).alias("lat"),
        (F.col("lon") / 1e7).alias("lon"),
        "error_name",
        "error_type",
        "object_type",
        "object_id",
        "object_timestamp",
        "user_name",
        F.col("tile").alias("schema"),
        "error_id",
        _tab_safe(F.col("description")).alias("description"),
        _tab_safe(F.coalesce(F.col("comment"), F.lit(""))).alias("comment"),
        F.replace(
            F.replace(F.col("state"), F.lit("\t"), F.lit(" ")),
            F.lit("ignore_temporarily"), F.lit("ignore_t"),
        ).alias("state"),
        F.concat(F.lit("img/zap"), filenr, F.lit(".png")).alias("icon"),
        F.lit("24,24").alias("icon_size"),
        F.lit("1,-24").alias("icon_offset"),
        "partner_objects",
    )


def _titled(df: DataFrame) -> DataFrame:
    """title = [decade name, ] error_name (export.php:86-92)."""
    decade = (10 * F.floor(F.col("error_type") / 10)).cast("int")
    prefix = F.lit("")
    for d in SUBTYPED_DECADES:
        prefix = F.when(
            decade == d, F.lit(ERROR_NAMES[d] + ", ")
        ).otherwise(prefix)
    # only subtype rows get the prefix; a bare decade row keeps its name
    prefix = F.when(F.col("error_type") % 10 == 0, F.lit("")).otherwise(prefix)
    return df.withColumn(
        "title", F.concat(prefix, F.coalesce(F.col("error_name"), F.lit("")))
    )


def _fragments(df: DataFrame, fragment: Column) -> list[str]:
    rows = df.select(fragment.alias("_frag")).collect()
    return [r["_frag"] for r in rows]


def gpx_export(published_bbox: DataFrame) -> str:
    """GPX serializer (web/export.php:108-141) over a bbox_export
    result (≤ LIMIT rows by construction)."""
    df = _titled(render_description(published_bbox))
    frag = F.format_string(
        "\t<wpt lon=\"%s\" lat=\"%s\"><name><![CDATA[%s]]></name>"
        "<desc><![CDATA[%s]]></desc><extensions><schema>%s</schema>"
        "<id>%s</id><error_type>%s</error_type>"
        "<object_type>%s</object_type><object_id>%s</object_id>"
        "</extensions></wpt>",
        (F.col("lon") / 1e7).cast("string"),
        (F.col("lat") / 1e7).cast("string"),
        F.col("title"),
        F.col("description"),
        F.col("tile"),
        F.col("error_id").cast("string"),
        F.col("error_type").cast("string"),
        F.col("object_type"),
        F.col("object_id").cast("string"),
    )
    head = (
        '<?xml version="1.0" encoding="UTF-8" standalone="no" ?>\n'
        '<gpx xmlns="http://www.topografix.com/GPX/1/1" creator="keepright" '
        'version="1.1" xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance" '
        'xsi:schemaLocation="http://www.topografix.com/GPX/1/1 '
        'http://www.topografix.com/GPX/1/1/gpx.xsd">\n'
    )
    return head + "\n".join(_fragments(df, frag)) + "\n</gpx>"


def rss_export(published_bbox: DataFrame, base_url: str = "") -> str:
    """RSS serializer (web/export.php:70-105); the recency filter is
    the caller's min_first_occurrence on bbox_export."""
    df = _titled(render_description(published_bbox))
    link = F.format_string(
        base_url + "report_map.php?schema=%s&amp;error=%s",
        F.col("tile"), F.col("error_id").cast("string"),
    )
    frag = F.format_string(
        "\t\t<item>\n\t\t\t<title>%s on %s #%s</title>\n"
        "\t\t\t<description>%s</description>\n"
        "\t\t\t<link>%s</link>\n\t\t\t<guid>%s</guid>\n\t\t</item>",
        F.concat(F.col("title")),
        F.col("object_type"),
        F.col("object_id").cast("string"),
        F.col("description"),
        link,
        link,
    )
    head = (
        '<?xml version="1.0" encoding="UTF-8"?>\n<rss version="2.0">\n'
        "\t<channel>\n\t\t<title>KeepRight! Newsfeed - Hunting errors in "
        "OpenStreetMap</title>\n\t\t<description>In this newsfeed you can "
        "find all errors that came up during the last three weeks."
        f"</description>\n\t\t<link>{base_url}report_map.php</link>\n"
    )
    return head + "\n".join(_fragments(df, frag)) + "\n\t</channel>\n</rss>"


def geojson_export(published_bbox: DataFrame) -> str:
    """GeoJSON serializer (web/export.php:143-173)."""
    df = _titled(render_description(published_bbox))
    props = F.to_json(
        F.struct(
            F.col("error_type"),
            F.col("object_type"),
            F.col("object_id"),
            F.col("error_id"),
            F.col("tile").alias("schema"),
            F.replace(F.col("description"), F.lit('"'), F.lit("")).alias(
                "description"
            ),
            F.col("title"),
        )
    )
    frag = F.format_string(
        '{ "type": "Feature","geometry":{"type": "Point",'
        '"coordinates": [%s,%s]},\n  "properties":%s}',
        (F.col("lon") / 1e7).cast("string"),
        (F.col("lat") / 1e7).cast("string"),
        props,
    )
    return (
        '{"type": "FeatureCollection", "features": ['
        + ",\n".join(_fragments(df, frag))
        + "]}"
    )
