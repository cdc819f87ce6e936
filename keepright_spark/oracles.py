"""DuckDB oracle SQL for the differential correctness gate.

Each ``oracle_XXXX(dataset_dir)`` returns ANSI SQL that DuckDB runs on
the generator's *independently computed* pre-tiled relational views
(datagen._oracle_views) and that must produce exactly the rows of the
matching Spark check query in ``__spark_entry__.queries()`` — same
column names, same types, same values (order-insensitive).

The shared scaffolding mirrors the engine:

* ``err`` CTE  ≙ the check's _tmp_errors rows,
* ``resolved`` ≙ errors.resolve_locations (1e7 fixed-point ints),
* final SELECT ≙ tiling.clip_errors (half-open tile clip,
  run-checks.php:430-443).
"""

from __future__ import annotations

ORACLE_TABLES = [
    "nodes",
    "node_tags",
    "ways",
    "way_nodes",
    "way_tags",
    "relations",
    "relation_members",
    "relation_tags",
    "users",
    "tiles",
]

NULLTXT = "CAST(NULL AS VARCHAR)"
NULLD = "CAST(NULL AS DOUBLE)"


def preamble(d: str) -> str:
    return ",\n".join(
        f"{t} AS (SELECT * FROM read_parquet('{d}/oracle/{t}.parquet'))"
        for t in ORACLE_TABLES
    )


def err_select(
    error_type: str | int,
    object_type: str,
    object_id: str,
    msgid: str,
    txt1: str = NULLTXT,
    txt2: str = NULLTXT,
    txt3: str = NULLTXT,
    txt4: str = NULLTXT,
    txt5: str = NULLTXT,
    lat_d: str = NULLD,
    lon_d: str = NULLD,
    tile: str = "tile",
) -> str:
    """The uniform 12-column projection every ``err`` CTE must yield."""
    et = (
        f"CAST({error_type} AS INTEGER)"
        if isinstance(error_type, int)
        else f"CAST(({error_type}) AS INTEGER)"
    )
    ot = f"'{object_type}'" if object_type in ("node", "way", "relation") else object_type
    return (
        f"{tile} AS tile, {et} AS error_type, {ot} AS object_type, "
        f"{object_id} AS object_id, {lat_d} AS lat_d, {lon_d} AS lon_d, "
        f"{msgid} AS msgid, {txt1} AS txt1, {txt2} AS txt2, {txt3} AS txt3, "
        f"{txt4} AS txt4, {txt5} AS txt5"
    )


# location resolution + half-open clip; expects an ``err`` CTE with the
# err_select columns.  Mirrors errors.resolve_locations (node → own
# coords, way → first node, relation → pinned member choice).
_FINALIZE = """
rel_node_loc AS (
    SELECT m.tile, m.relation_id,
           arg_min(n.lat, m.sequence_id) AS lat,
           arg_min(n.lon, m.sequence_id) AS lon
    FROM relation_members m
    JOIN nodes n ON m.member_type='N' AND m.tile=n.tile AND m.member_id=n.id
    GROUP BY m.tile, m.relation_id
),
rel_way_loc AS (
    SELECT tile, relation_id, lat, lon FROM (
        SELECT m.tile, m.relation_id, wn.lat, wn.lon,
               ROW_NUMBER() OVER (PARTITION BY m.tile, m.relation_id
                                  ORDER BY m.sequence_id, wn.sequence_id) AS rn
        FROM relation_members m
        JOIN way_nodes wn ON m.member_type='W' AND m.tile=wn.tile
                          AND m.member_id=wn.way_id
        WHERE wn.lat IS NOT NULL
    ) WHERE rn=1
),
rel_loc AS (
    SELECT * FROM rel_node_loc
    UNION ALL
    SELECT w.* FROM rel_way_loc w
    WHERE NOT EXISTS (SELECT 1 FROM rel_node_loc n
                      WHERE n.tile=w.tile AND n.relation_id=w.relation_id)
),
resolved AS (
    SELECT e.tile, e.error_type, e.object_type, e.object_id,
           CAST(ROUND(COALESCE(e.lat_d, 1e7 * COALESCE(n.lat, w.first_node_lat, r.lat))) AS BIGINT) AS lat,
           CAST(ROUND(COALESCE(e.lon_d, 1e7 * COALESCE(n.lon, w.first_node_lon, r.lon))) AS BIGINT) AS lon,
           e.msgid, e.txt1, e.txt2, e.txt3, e.txt4, e.txt5
    FROM err e
    LEFT JOIN nodes n ON e.object_type='node' AND e.tile=n.tile AND e.object_id=n.id
    LEFT JOIN ways w  ON e.object_type='way'  AND e.tile=w.tile AND e.object_id=w.id
    LEFT JOIN rel_loc r ON e.object_type='relation' AND e.tile=r.tile
                        AND e.object_id=r.relation_id
)
SELECT r.tile, r.error_type, r.object_type, r.object_id, r.lat, r.lon,
       r.msgid, r.txt1, r.txt2, r.txt3, r.txt4, r.txt5
FROM resolved r JOIN tiles t ON r.tile=t.tile
WHERE r.lat IS NOT NULL AND r.lon IS NOT NULL
  AND r.lat >= CAST(ROUND(1e7*t.bottom) AS BIGINT)
  AND r.lat <  CAST(ROUND(1e7*t.top) AS BIGINT)
  AND r.lon >= CAST(ROUND(1e7*t."left") AS BIGINT)
  AND r.lon <  CAST(ROUND(1e7*t."right") AS BIGINT)
"""


def wrap(d: str, body_ctes: str) -> str:
    """WITH <views>, <body ctes ending in err>, <finalize>."""
    return f"WITH {preamble(d)},\n{body_ctes},\n{_FINALIZE}"


# ---------------------------------------------------------------------------


def oracle_0020(d: str) -> str:
    msg = "'There is more than one node in this spot. Offending node IDs: $1'"
    body = f"""
elev AS (
    SELECT n.tile, n.id, MAX(n.lon) AS lon, MAX(n.lat) AS lat, MAX(nt.v) AS ele
    FROM nodes n JOIN node_tags nt ON n.id=nt.node_id AND n.tile=nt.tile
    WHERE nt.k='ele'
    GROUP BY n.tile, n.id
),
dupes AS (
    SELECT tile, lon, lat, COUNT(id) AS nodecount
    FROM nodes GROUP BY tile, lon, lat HAVING COUNT(id) > 1
),
err AS (
    SELECT {err_select(20, 'node', 'MIN(n.id)', msg,
                       txt1="string_agg('#' || n.id, ',' ORDER BY n.id)",
                       tile='n.tile')}
    FROM nodes n JOIN dupes d ON n.tile=d.tile AND n.lon=d.lon AND n.lat=d.lat
    WHERE NOT (d.nodecount = (
        SELECT COUNT(DISTINCT e.ele) FROM elev e
        WHERE e.tile=d.tile AND e.lon=d.lon AND e.lat=d.lat))
    GROUP BY n.tile, d.lon, d.lat
)"""
    return wrap(d, body)
