"""Web serialization: $1..$5 templating, hyperlinks, GPX/RSS/GeoJSON."""

from __future__ import annotations

import json

from keepright_spark import web


def _published(spark, rows):
    return spark.createDataFrame(
        rows,
        "tile string, error_id long, error_type int, object_type string, "
        "object_id long, lat long, lon long, state string, msgid string, "
        "txt1 string, txt2 string, txt3 string, txt4 string, txt5 string, "
        "error_name string, user_name string, object_timestamp string",
    )


def test_description_substitution(spark):
    df = _published(
        spark,
        [
            ("A1", 1, 300, "way", 7, 480100000, 162100000, "new",
             "This $1 is missing $2", "highway", "maxspeed", None, None,
             None, "missing maxspeed", "user_1", "t"),
        ],
    )
    out = web.render_description(df).select("description").first()[0]
    assert out == "This highway is missing maxspeed"


def test_hyperlink_cases_and_partners(spark):
    rows = [
        # 20: node id list in txt1 (with a 2-digit non-id number)
        ("A1", 1, 20, "node", 5, 1, 1, "new", "Spots: $1",
         "1234 and 99 and 567890", None, None, None, None, "n", "u", "t"),
        # 40: single node id in txt1
        ("A1", 2, 40, "way", 6, 1, 1, "new", "End node $1", "4321",
         None, None, None, None, "n", "u", "t"),
        # 191: way id in txt3
        ("A1", 3, 191, "way", 7, 1, 1, "new", "crosses $3", None, None,
         "777", None, None, "n", "u", "t"),
        # 401: way ids in txt1+txt2
        ("A1", 4, 401, "way", 8, 1, 1, "new", "$1 and $2", "11111",
         "22222", None, None, None, "n", "u", "t"),
    ]
    out = {
        r["error_id"]: r
        for r in web.render_description(
            _published(spark, rows), hyperlinks=True
        ).collect()
    }
    d1 = out[1]["description"]
    assert "browse/node/1234" in d1 and "browse/node/567890" in d1
    assert "browse/node/99" not in d1  # 2-digit layer value untouched
    assert out[1]["partner_objects"] == "node1234,node567890"
    assert out[2]["partner_objects"] == "node4321"
    assert "browse/node/4321" in out[2]["description"]
    assert out[3]["partner_objects"] == "way777"
    assert "browse/way/777" in out[3]["description"]
    assert out[4]["partner_objects"] == "way11111,way22222"


def test_points_rows(spark):
    df = _published(
        spark,
        [("A1", 1, 20, "node", 5, 480100000, 162100000, "ignore",
          "m $1", "123", None, None, None, None, "dupe nodes", "u", "t")],
    )
    r = web.points_rows(df, 48.01, 16.21).first()
    assert r["icon"] == "img/zapdevil.png"
    assert r["schema"] == "A1"
    assert abs(r["lat"] - 48.01) < 1e-6


def test_points_rows_comment_fold(spark):
    """points.php:65-102 end-to-end: comment state folds via
    COALESCE, show_ign/show_tmpign gate on the *comment* state, and
    folded states render the angel/devil icons."""
    from keepright_spark import comments as cm

    pub = _published(
        spark,
        [
            ("A1", 1, 20, "node", 5, 480100000, 162100000, "new",
             "m", None, None, None, None, None, "dupe", "u", "t"),
            ("A1", 2, 20, "node", 6, 480100001, 162100001, "new",
             "m", None, None, None, None, None, "dupe", "u", "t"),
            ("A1", 3, 20, "node", 7, 480100002, 162100002, "new",
             "m", None, None, None, None, None, "dupe", "u", "t"),
        ],
    )
    c = cm.empty_comments(spark)
    c, hist = cm.add_comment(c, None, "A1", 1, "ignore", "bogus", 1000)
    c, hist = cm.add_comment(c, hist, "A1", 2, "ignore_t", "later", 1001)

    # default: both ignore flavors are dropped before the top-350 cut
    rows = web.points_rows(pub, 48.01, 16.21, comments=c).collect()
    assert [r["error_id"] for r in rows] == [3]
    assert rows[0]["comment"] == ""

    # flags on: folded states surface with angel/devil icons and the
    # comment text; state spelling matches points.php's ignore_t
    rows = {
        r["error_id"]: r
        for r in web.points_rows(
            pub, 48.01, 16.21, comments=c, show_ign=True, show_tmpign=True
        ).collect()
    }
    assert rows[1]["icon"] == "img/zapdevil.png"
    assert rows[1]["state"] == "ignore"
    assert rows[1]["comment"] == "bogus"
    assert rows[2]["icon"] == "img/zapangel.png"
    assert rows[2]["state"] == "ignore_t"
    assert rows[2]["comment"] == "later"
    assert rows[3]["icon"] == "img/zap20.png"

    # one flag at a time gates exactly its flavor (points.php:77-78)
    only_ign = web.points_rows(
        pub, 48.01, 16.21, comments=c, show_ign=True
    ).collect()
    assert sorted(r["error_id"] for r in only_ign) == [1, 3]


def test_gpx_rss_geojson(spark):
    df = _published(
        spark,
        [("A1", 9, 191, "way", 7, 480100000, 162100000, "new",
          "crossing $3", None, None, "777", None, None,
          "intersections without junctions", "u", "t")],
    )
    gpx = web.gpx_export(df)
    assert gpx.startswith('<?xml version="1.0"')
    assert '<wpt lon="16.21" lat="48.01">' in gpx
    # subtyped decade prefix: 191 gets the 190 decade name prepended
    from keepright_spark.data_tables import ERROR_NAMES
    assert f"<name><![CDATA[{ERROR_NAMES[190]}, intersections without junctions]]>" in gpx
    assert "<error_type>191</error_type>" in gpx
    assert gpx.endswith("</gpx>")

    rss = web.rss_export(df, base_url="http://x/")
    assert "<rss version=" in rss
    assert "error=9</link>" in rss and rss.endswith("</rss>")

    gj = web.geojson_export(df)
    doc = json.loads(gj)
    assert doc["features"][0]["geometry"]["coordinates"] == [16.21, 48.01]
    assert doc["features"][0]["properties"]["schema"] == "A1"
