"""Administrative-boundary helpers shared by checks 0280 and 0310.

Re-expression of the reference's prepare_countries.php:

* ``border_ways``  — the _tmp_border_ways_tmp extraction
  (prepare_countries.php:55-200): ways tagged boundary=administrative
  with left:*/right:* names, plus W-members of type=boundary/
  multipolygon + boundary=administrative relations; standalone rows
  shadowed by identical relation rows are dropped (plain SQL equality
  — NULL admin_level rows survive, as in the reference :173-180);
  relations with members missing from the local extract are dropped
  (:191-199).
* ``stitch_parts`` — the part-ordering algorithm
  (prepare_countries.php:262-413) as a vectorized applyInPandas
  operator per (tile, name, admin_level) group: pre-assigned parts
  for junction-free closed loops, then min-way seeding and the four
  forward/backward straight/reversed extension cases, faithfully
  including the reference's cross-part matching quirk (T0 is *any*
  assigned row with the target sequence, not only the current part's).
* ``lht_country_edges`` — boundary edges of admin_level 1/2 LHT
  countries for check 0310's point-in-polygon test (even-odd ray
  casting over all rings of the multipolygon needs no stitching).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

from .codec import OsmViews

BORDER_ITEMS = [
    "city", "village", "departement", "county", "region", "country",
    "border", "district", "commune", "parish", "state", "suburb", "town",
    "municipality", "province", "governate", "arrondissement", "borough",
    "diocese", "unitary", "prefecture",
]
BORDER_KEYS = [f"{side}:{item}" for item in BORDER_ITEMS for side in ("left", "right")]

# left-hand-traffic country names (0310_roundabouts.php:249-260; the
# reference list carries embedded newlines in some names from PHP
# string wrapping — those entries can never match and are omitted)
LHT_COUNTRIES = [
    "Anguilla", "Antigua and Barbuda", "Australia", "Bahamas",
    "Bangladesh", "Barbados", "Bhutan", "Botswana", "Brunei", "Cyprus",
    "Dominica", "Falkland Islands", "Fiji", "Grenada", "Guernsey",
    "Guyana", "Hong Kong", "India", "Indonesia", "Ireland", "Jamaica",
    "Japan", "Jersey", "Kenya", "Kiribati", "Lesotho", "Macau", "Malawi",
    "Malaysia", "Maldives", "Malta", "Mauritius", "Montserrat",
    "Mozambique", "Namibia", "Nauru", "Nepal", "New Zealand", "Pakistan",
    "Saint Kitts and Nevis", "Saint Lucia", "Seychelles", "Singapore",
    "Solomon Islands", "Sri Lanka", "Suriname", "Swaziland", "Tanzania",
    "Thailand", "Tonga", "Trinidad and Tobago", "Tuvalu", "Uganda",
    "United Kingdom", "Zambia", "Zimbabwe",
]


def border_ways(v: OsmViews) -> DataFrame:
    """(tile, name, admin_level, relation_id, way_id,
    first_node_id, last_node_id)."""
    wt = v.way_tags
    admin_way = (
        wt.filter((F.col("k") == "boundary") & (F.col("v") == "administrative"))
        .select("tile", "way_id")
        .distinct()
    )
    way_admin_level = (
        wt.filter(F.col("k") == "admin_level")
        .groupBy("tile", "way_id")
        .agg(F.max("v").alias("admin_level"))
    )
    standalone = (
        wt.filter(F.col("k").isin(BORDER_KEYS))
        .join(admin_way, ["tile", "way_id"], "left_semi")
        .select("tile", F.col("v").alias("name"), "way_id")
        .join(way_admin_level, ["tile", "way_id"], "left")
        .withColumn("relation_id", F.lit(None).cast("long"))
    )

    rt = v.relation_tags
    brel = (
        rt.filter(
            (F.col("k") == "type") & F.col("v").isin("boundary", "multipolygon")
        )
        .select("tile", "relation_id")
        .distinct()
        .join(
            rt.filter(
                (F.col("k") == "boundary") & (F.col("v") == "administrative")
            ).select("tile", "relation_id"),
            ["tile", "relation_id"],
            "left_semi",
        )
        .join(
            rt.filter(F.col("k") == "name")
            .groupBy("tile", "relation_id")
            .agg(F.max("v").alias("name")),
            ["tile", "relation_id"],
            "left",
        )
        .join(
            rt.filter(F.col("k") == "admin_level")
            .groupBy("tile", "relation_id")
            .agg(F.max("v").alias("admin_level")),
            ["tile", "relation_id"],
            "left",
        )
    )
    rel_rows = (
        brel.join(
            v.relation_members.filter(F.col("member_type") == "W").select(
                "tile", "relation_id", F.col("member_id").alias("way_id")
            ),
            ["tile", "relation_id"],
        )
        .select("tile", "name", "admin_level", "relation_id", "way_id")
    )

    # drop standalone rows shadowed by identical relation rows
    # (plain equality: NULL name/admin rows are never shadowed)
    shadowed = rel_rows.select("tile", "name", "admin_level", "way_id").distinct()
    standalone = standalone.join(
        shadowed, ["tile", "name", "admin_level", "way_id"], "left_anti"
    )

    bw = standalone.select(
        "tile", "name", "admin_level", "relation_id", "way_id"
    ).unionByName(rel_rows)

    wmeta = v.ways.select(
        "tile", F.col("id").alias("way_id"), "first_node_id", "last_node_id"
    )
    bw = bw.join(wmeta, ["tile", "way_id"], "left")

    # drop whole relations with missing member ways
    missing_rel = (
        bw.filter(F.col("relation_id").isNotNull() & F.col("first_node_id").isNull())
        .select("tile", "relation_id")
        .distinct()
    )
    bw = bw.join(missing_rel, ["tile", "relation_id"], "left_anti")
    # standalone ways referencing unknown ways keep NULL endpoints in
    # the reference; they simply never stitch
    return bw


STITCH_SCHEMA = StructType(
    [
        StructField("tile", StringType()),
        StructField("name", StringType()),
        StructField("admin_level", StringType()),
        StructField("relation_id", LongType()),
        StructField("way_id", LongType()),
        StructField("first_node_id", LongType()),
        StructField("last_node_id", LongType()),
        StructField("part", IntegerType()),
        StructField("sequence_id", IntegerType()),
        StructField("direction", IntegerType()),
    ]
)


def stitch_group(rows: list[dict]) -> list[dict]:
    """Order one boundary group's ways into parts — the literal
    algorithm of prepare_countries.php:262-413 on plain dicts.

    ``rows``: dicts with way_id, first_node_id, last_node_id (may be
    None).  Returns the rows with part / sequence_id / direction set.
    Reproduces the reference's quirks: junction-free closed loops get
    their own negative parts upfront; extension matches against *any*
    assigned row with the wanted sequence_id (not only the current
    part); simultaneous matches share a sequence number.
    """
    for r in rows:
        r["part"] = None
        r["sequence_id"] = None
        r["direction"] = 1

    # junction-free single-way closed loops → own negative part
    def touches(a, b):
        return (
            b["first_node_id"] in (a["first_node_id"], a["last_node_id"])
            or b["last_node_id"] in (a["first_node_id"], a["last_node_id"])
        )

    neg = -1
    for r in rows:
        if r["first_node_id"] is None:
            continue
        if r["first_node_id"] == r["last_node_id"] and not any(
            o is not r and o["way_id"] != r["way_id"] and touches(r, o)
            for o in rows
            if o["first_node_id"] is not None
        ):
            r["part"] = neg
            r["sequence_id"] = 0
            neg -= 1

    part = 0
    while True:
        unassigned = [
            r for r in rows if r["sequence_id"] is None and r["first_node_id"] is not None
        ]
        if not unassigned:
            break
        seed = min(unassigned, key=lambda r: r["way_id"])
        seed["part"] = part
        seed["sequence_id"] = 0
        seed["direction"] = 1

        loop = 1
        while True:
            assigned = [r for r in rows if r["sequence_id"] is not None]

            def ends(r):
                # effective (start, end) of a direction-adjusted row
                if r["direction"] == 1:
                    return r["first_node_id"], r["last_node_id"]
                return r["last_node_id"], r["first_node_id"]

            found = 0
            for seq_target, backward in ((loop - 1, False), (1 - loop, True)):
                t0_rows = [r for r in assigned if r["sequence_id"] == seq_target]
                if not t0_rows:
                    continue
                endpoints = set()
                for t0 in t0_rows:
                    s, e = ends(t0)
                    endpoints.add(s if backward else e)
                # straight then reversed, matching statement order
                for reversed_dir in (False, True):
                    matches = [
                        r
                        for r in rows
                        if r["sequence_id"] is None
                        and r["first_node_id"] is not None
                        and (
                            (r["last_node_id"] if (backward != reversed_dir) else r["first_node_id"])
                            in endpoints
                        )
                    ]
                    for m in matches:
                        m["part"] = part
                        m["sequence_id"] = loop if not backward else -loop
                        m["direction"] = -1 if reversed_dir else 1
                        found += 1
            if found == 0:
                break
            loop += 1
        part += 1
    return rows


def stitched_border_ways(v: OsmViews) -> DataFrame:
    """border_ways + (part, sequence_id, direction) via applyInPandas
    per (tile, name, admin_level) group."""
    import pandas as pd

    bw = border_ways(v)

    out_cols = [f.name for f in STITCH_SCHEMA.fields]

    def stitch(pdf: "pd.DataFrame") -> "pd.DataFrame":
        # dict-of-lists conversion: pdf.to_dict("records") + per-row
        # DataFrame construction measured ~3.1 s Python per solo 0280
        # run (~100% of the stitcher's UDF time); tolist + zip is ~10×
        # cheaper and byte-identical
        def ints(col: str) -> list:
            return [None if pd.isna(x) else int(x) for x in pdf[col].tolist()]

        clean = [
            {
                "tile": t, "name": nm, "admin_level": al,
                "relation_id": rl, "way_id": w,
                "first_node_id": fn, "last_node_id": ln,
            }
            for t, nm, al, rl, w, fn, ln in zip(
                pdf["tile"].tolist(), pdf["name"].tolist(),
                pdf["admin_level"].tolist(), ints("relation_id"),
                ints("way_id"), ints("first_node_id"),
                ints("last_node_id"),
            )
        ]
        out = stitch_group(clean)
        return pd.DataFrame({c: [r[c] for r in out] for c in out_cols})

    return (
        bw.groupBy("tile", "name", "admin_level")
        .applyInPandas(stitch, STITCH_SCHEMA)
    )


def lht_country_edges(v: OsmViews) -> DataFrame:
    """(tile, name, ax, ay, bx, by): Mercator segments of admin_level
    1/2 boundaries named as LHT countries (0310:244-264) — the ring
    edges for the even-odd point-in-polygon test."""
    bw = border_ways(v)
    lht = bw.filter(
        F.col("admin_level").isin("1", "2") & F.col("name").isin(LHT_COUNTRIES)
    ).select("tile", "name", "way_id").distinct()
    from .spatial import way_segments

    segs = way_segments(v, lht.select("tile", "way_id").distinct())
    return segs.join(lht, ["tile", "way_id"]).select(
        "tile", "name", "ax", "ay", "bx", "by"
    )
