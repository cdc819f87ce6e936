"""Raster↔vector zonal join — the fourth north-star operator family.

The north star names four cell-indexed operator families: batched
cell encode + point-in-polygon (checks 0280/0310/0360), tile-local
kNN (0050/0270), segment-overlap joins (0190/0200) — and
raster↔vector zonal joins for landuse/coastline-style analyses.
This module supplies the fourth: per-zone statistics of raster cells
covered by vector polygons (the closed, area-tagged ways of the OSM
world).

The reference repo has no raster surface, so the raster here is the
deterministic synthetic lattice both sides derive independently: for
every map tile a ``RES``×``RES`` grid whose cell value is the 32-bit
md5-prefix hash of ``rc:<tile>:<i>:<j>`` mod 256 (the exact
hash-mirroring trick of docops.py — Spark ``conv(substring(md5(…)))``
vs DuckDB ``('0x'||substr(md5(…),1,8))::BIGINT``).  In production the
cells would instead be scanned from an imagery/DEM store partitioned
by the SAME tile key.

Scale shape (the part that must survive 1000 executors):

* cells are generated (or scanned) already keyed on ``tile`` and
  repartitioned to the engine's shared tile hash-partitioning, so
  every join below is co-partitioned — no global shuffle;
* candidate generation before exact refine: cells meet zones on
  (tile, raster-row band) keys derived from the zone's bbox — a tile
  dense with zones costs Σ|bbox bands|×res candidates, not
  |zones|×res² — then the bbox filter and, for the survivors, the
  ray cast against the polygon's band-enrolled edges: the same
  candidate→exact-refine shape as the kNN and overlap operators
  (spatial.py);
* the parity test is the even-odd ray cast of check_0310
  (`_ray_cast_count`), all native column arithmetic — no Python in
  the row path.

Known bound (documented deviation, same class as tiling.py's
relation-cycle note): a zone is joined to a tile's cells only if the
zone intersects that tile's padded bbox (completeWays assignment), so
a polygon strictly containing a whole tile while keeping every vertex
farther than the margin from it would miss that tile's cells.  OSM
landuse/leisure zones are orders of magnitude smaller than a tile;
planet-scale deployments with continent-sized polygons would switch
the cut to completeAreas.  The DuckDB oracle mirrors the same tile
assignment, so the invariant is tested, not hidden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import pipeline
from .docops import _h32
from .tiling import Tile

RES = 64  # raster cells per tile axis
VAL_MOD = 256  # cell values in [0, 255]
JBAND = 8  # raster rows per candidate band (the join key unit)
ZONE_KEYS = ["landuse", "natural", "leisure"]


def ray_crossing(cx, cy, ax, ay, bx, by):
    """True when the +x ray from (cx, cy) crosses edge (a→b) — the
    even-odd parity term.  Horizontal edges (ay == by) fall out of the
    first conjunct, so the interpolation's division never decides."""
    return ((ay > cy) != (by > cy)) & (
        cx < ax + (bx - ax) * (cy - ay) / (by - ay)
    )


def raster_cells(spark: SparkSession, tiles: list[Tile],
                 res: int = RES) -> DataFrame:
    """(tile, i, j, cx, cy, val): the deterministic raster lattice.

    Cell centers subdivide the tile bbox in lon/lat; the value is
    h32("rc:<tile>:<i>:<j>") % VAL_MOD.  One row per cell, generated
    natively (sequence + explode) from the small tiles frame and
    shuffled onto the engine's tile partitioning.
    """
    tdf = spark.createDataFrame(
        [(t.name, t.left, t.right, t.top, t.bottom) for t in tiles],
        "tile string, left double, right double, top double, bottom double",
    )
    idx = F.sequence(F.lit(0), F.lit(res - 1))
    return (
        tdf.select("*", F.explode(idx).alias("i"))
        .select("*", F.explode(idx).alias("j"))
        .select(
            "tile",
            "i",
            "j",
            (F.col("left") + (F.col("i") + 0.5)
             * (F.col("right") - F.col("left")) / res).alias("cx"),
            (F.col("bottom") + (F.col("j") + 0.5)
             * (F.col("top") - F.col("bottom")) / res).alias("cy"),
            (_h32(F.concat_ws(
                ":", F.lit("rc"), F.col("tile"), F.col("i"), F.col("j")
            )) % VAL_MOD).alias("val"),
        )
        .repartition("tile")
    )


def _zones(v) -> DataFrame:
    """(tile, way_id, zone_kind, minx..maxy): closed area-tagged ways
    with their lon/lat bbox (candidate-generation key)."""
    closed = v.ways.filter(
        (F.col("first_node_id") == F.col("last_node_id"))
        & (F.col("node_count") >= 4)
    ).select("tile", F.col("id").alias("way_id"))
    tags = v.way_tags.filter(F.col("k").isin(ZONE_KEYS)).select(
        "tile", "way_id", F.concat_ws("=", "k", "v").alias("zone_kind")
    )
    bbox = v.way_nodes.groupBy("tile", "way_id").agg(
        F.min("lon").alias("minx"),
        F.max("lon").alias("maxx"),
        F.min("lat").alias("miny"),
        F.max("lat").alias("maxy"),
    )
    return closed.join(tags, ["tile", "way_id"]).join(
        bbox, ["tile", "way_id"]
    )


def _zone_edges(v, zone_ids: DataFrame) -> DataFrame:
    """Polygon edges in lon/lat from consecutive way_nodes (closed
    ways carry their closing edge because the last node repeats the
    first)."""
    w = Window.partitionBy("tile", "way_id").orderBy("sequence_id")
    return (
        v.way_nodes.join(zone_ids, ["tile", "way_id"], "left_semi")
        .select(
            "tile",
            "way_id",
            F.col("lon").alias("ax"),
            F.col("lat").alias("ay"),
            F.lead("lon").over(w).alias("bx"),
            F.lead("lat").over(w).alias("by"),
        )
        .filter(F.col("bx").isNotNull())
    )


def _band_range(lo_col, hi_col, dy, res: int, jband: int):
    """(band_lo, band_hi) covering every raster row j whose cell
    center cy = bottom + (j+0.5)·dy can satisfy lo ≤ cy ≤ hi, widened
    one row each side (a strict superset — float-slop safe) and
    clamped to the lattice."""
    jlo = F.greatest(
        F.lit(0), F.floor((lo_col - F.col("bottom")) / dy) - 1
    )
    jhi = F.least(
        F.lit(res - 1), F.floor((hi_col - F.col("bottom")) / dy) + 1
    )
    return F.floor(jlo / jband), F.floor(jhi / jband)


def zonal_stats(spark: SparkSession, dataset_dir: str,
                res: int = RES, jband: int = JBAND) -> DataFrame:
    """Per-zone raster statistics: (way_id, zone_kind, n_cells,
    sum_val, min_val, max_val, mean_val) over the cells whose center
    lies inside the zone polygon (even-odd ray cast).

    Zones spanning several tiles aggregate each tile's cells through
    that tile's (margin-duplicated, completeWays) copy of the way;
    cells are globally unique on (tile, i, j), so the final
    per-way aggregation never double-counts.

    Candidate shape (the 1000-executor contract): cells and zones meet
    on (tile, jband) — a raster-row band derived from the zone's bbox —
    not on tile alone, so a tile dense with zones costs
    Σ_zones |bbox row bands| × res instead of |zones| × res².  The
    ray-cast join is banded the same way: an edge is enrolled in every
    band its y-interval (±1 row of float slack) covers, so each
    candidate cell meets only the edges that can cross its scanline.
    Both enrollments are strict supersets of the rows/edges that can
    satisfy the exact predicates (bbox filter / ray crossing), and
    extra edges contribute zero crossings — the result is provably
    identical to the unbanded join, which is what the independent
    DuckDB oracle (oracles.oracle_zonal_stats) computes.
    """
    v = pipeline.tiled_views(spark, dataset_dir)
    tiles = pipeline.dataset_tiles(dataset_dir)
    cells = raster_cells(spark, tiles, res).withColumn(
        "jb", F.floor(F.col("j") / jband)
    )
    zones = _zones(v)
    tgeo = F.broadcast(
        spark.createDataFrame(
            [(t.name, t.top, t.bottom) for t in tiles],
            "tile string, top double, bottom double",
        )
    )
    dy = (F.col("top") - F.col("bottom")) / res

    def banded(df: DataFrame, lo_col, hi_col) -> DataFrame:
        b_lo, b_hi = _band_range(lo_col, hi_col, dy, res, jband)
        return (
            df.join(tgeo, "tile")
            .withColumn("_blo", b_lo)
            .withColumn("_bhi", b_hi)
            .filter(F.col("_blo") <= F.col("_bhi"))
            .withColumn(
                "jb", F.explode(F.sequence(F.col("_blo"), F.col("_bhi")))
            )
            .drop("top", "bottom", "_blo", "_bhi")
        )

    zb = banded(zones, F.col("miny"), F.col("maxy"))
    cand = (
        cells.join(zb, ["tile", "jb"])
        .filter(
            (F.col("cx") >= F.col("minx"))
            & (F.col("cx") <= F.col("maxx"))
            & (F.col("cy") >= F.col("miny"))
            & (F.col("cy") <= F.col("maxy"))
        )
        .select(
            "tile", "jb", "way_id", "zone_kind", "i", "j", "cx", "cy", "val"
        )
    )
    edges = banded(
        _zone_edges(v, zones.select("tile", "way_id").distinct()),
        F.least("ay", "by"), F.greatest("ay", "by"),
    )

    # even-odd ray cast (check_0310._ray_cast_count shape): count edge
    # crossings of the +x ray from the cell center; odd => inside
    j = cand.join(edges, ["tile", "way_id", "jb"])
    crossing = ray_crossing(
        F.col("cx"), F.col("cy"),
        F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"),
    )
    inside = (
        j.groupBy("tile", "way_id", "zone_kind", "i", "j", "val")
        .agg(F.sum(F.when(crossing, 1).otherwise(0)).alias("nc"))
        .filter(F.col("nc") % 2 == 1)
    )
    return inside.groupBy("way_id", "zone_kind").agg(
        F.count("*").alias("n_cells"),
        F.sum("val").alias("sum_val"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
        (F.sum("val") / F.count("*")).alias("mean_val"),
    )
