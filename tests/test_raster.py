"""Raster↔vector zonal join vs its independent DuckDB oracle.

The oracle (oracles.oracle_zonal_stats) re-derives the raster
lattice, the zone set, the bbox candidate filter and the even-odd
ray cast from the generator's relational parquet — no engine output
is consumed.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from keepright_spark import oracles, pipeline, raster
from keepright_spark.datagen import ensure_dataset


@pytest.fixture(scope="module")
def dataset():
    return ensure_dataset("s")


def _norm(df):
    df = df.reindex(sorted(df.columns), axis=1).astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_zonal_stats_matches_oracle(spark, dataset):
    got = raster.zonal_stats(spark, dataset).toPandas()
    con = duckdb.connect()
    exp = con.sql(oracles.oracle_zonal_stats(dataset)).df()
    assert sorted(got.columns) == sorted(exp.columns)
    assert len(got) == len(exp) > 0
    assert _norm(got).equals(_norm(exp))
    # the operator must produce real aggregation (multi-cell zones),
    # not just the degenerate 1-cell case
    assert got.n_cells.max() > 1


def test_raster_cells_deterministic_lattice(spark, dataset):
    tiles = pipeline.dataset_tiles(dataset)
    cells = raster.raster_cells(spark, tiles)
    n = cells.count()
    assert n == len(tiles) * raster.RES * raster.RES
    assert cells.select("tile", "i", "j").distinct().count() == n
    mm = cells.agg(
        F.min("val").alias("lo"), F.max("val").alias("hi")
    ).first()
    assert 0 <= mm.lo and mm.hi < raster.VAL_MOD
    # cell centers stay strictly inside their tile bbox
    tdf = {t.name: t for t in tiles}
    row = cells.filter(F.col("tile") == tiles[0].name).agg(
        F.min("cx"), F.max("cx"), F.min("cy"), F.max("cy")
    ).first()
    t0 = tdf[tiles[0].name]
    assert t0.left < row[0] and row[1] < t0.right
    assert t0.bottom < row[2] and row[3] < t0.top


def test_ray_cast_matches_numpy_reference(spark):
    """Randomized equivalence: the Spark parity expression vs a plain
    python even-odd ray cast, over random (possibly self-intersecting)
    closed polylines — even-odd parity is well-defined for both."""
    import numpy as np

    rng = np.random.default_rng(7)
    edge_rows, pt_rows, want = [], [], {}
    for pid in range(25):
        k = int(rng.integers(3, 9))
        poly = rng.random((k, 2))
        poly = np.vstack([poly, poly[:1]])  # close
        for (ax, ay), (bx, by) in zip(poly[:-1], poly[1:]):
            edge_rows.append((pid, float(ax), float(ay), float(bx), float(by)))
        for q in range(8):
            px, py = (float(x) for x in rng.random(2))
            n = 0
            for (ax, ay), (bx, by) in zip(poly[:-1], poly[1:]):
                if (ay > py) != (by > py) and px < ax + (bx - ax) * (
                    py - ay
                ) / (by - ay):
                    n += 1
            pt_rows.append((pid, q, px, py))
            want[(pid, q)] = n % 2 == 1

    edges = spark.createDataFrame(
        edge_rows, "pid int, ax double, ay double, bx double, by double"
    )
    pts = spark.createDataFrame(
        pt_rows, "pid int, q int, cx double, cy double"
    )
    inside = (
        pts.join(edges, "pid")
        .groupBy("pid", "q")
        .agg(
            F.sum(
                F.when(
                    raster.ray_crossing(
                        F.col("cx"), F.col("cy"),
                        F.col("ax"), F.col("ay"),
                        F.col("bx"), F.col("by"),
                    ),
                    1,
                ).otherwise(0)
            ).alias("nc")
        )
    )
    got = {
        (r.pid, r.q): r.nc % 2 == 1 for r in inside.collect()
    }
    assert got == want
    assert sum(want.values()) > 10  # the sample genuinely hits insides


def test_zonal_plan_stays_native(spark, dataset):
    # the whole operator is column arithmetic: any Python in the row
    # path (BatchEvalPython) is a plan regression
    plan = raster.zonal_stats(spark, dataset)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_banded_candidates_beat_tilewide(spark, dataset):
    """The (tile, jband) candidate key must feed strictly fewer rows
    into the bbox filter and the ray-cast join than the tile-wide
    shape — the r3 verdict's dense-zone scale concern (zonal candidate
    generation was |cells|×|zones| per tile)."""
    from keepright_spark.raster import (
        JBAND, RES, _band_range, _zone_edges, _zones, raster_cells,
    )

    v = pipeline.tiled_views(spark, dataset)
    tiles = pipeline.dataset_tiles(dataset)
    cells = raster_cells(spark, tiles).withColumn(
        "jb", F.floor(F.col("j") / JBAND)
    )
    zones = _zones(v)
    tgeo = spark.createDataFrame(
        [(t.name, t.top, t.bottom) for t in tiles],
        "tile string, top double, bottom double",
    )
    dy = (F.col("top") - F.col("bottom")) / RES
    blo, bhi = _band_range(F.col("miny"), F.col("maxy"), dy, RES, JBAND)
    zb = (
        zones.join(tgeo, "tile").withColumn("_blo", blo)
        .withColumn("_bhi", bhi).filter(F.col("_blo") <= F.col("_bhi"))
        .withColumn("jb", F.explode(F.sequence(F.col("_blo"), F.col("_bhi"))))
    )
    n_banded = cells.join(zb, ["tile", "jb"]).count()
    n_tilewide = cells.join(zones, "tile").count()
    assert 0 < n_banded < n_tilewide / 2, (n_banded, n_tilewide)

    # the ray-cast side: banded candidate×edge rows < unbanded
    bbox = (
        (F.col("cx") >= F.col("minx")) & (F.col("cx") <= F.col("maxx"))
        & (F.col("cy") >= F.col("miny")) & (F.col("cy") <= F.col("maxy"))
    )
    cand = cells.join(zb, ["tile", "jb"]).filter(bbox).select(
        "tile", "jb", "way_id", "i", "j"
    )
    edges = _zone_edges(v, zones.select("tile", "way_id").distinct())
    eb = (
        edges.join(tgeo, "tile")
        .withColumn("_blo", _band_range(
            F.least("ay", "by"), F.greatest("ay", "by"), dy, RES, JBAND)[0])
        .withColumn("_bhi", _band_range(
            F.least("ay", "by"), F.greatest("ay", "by"), dy, RES, JBAND)[1])
        .filter(F.col("_blo") <= F.col("_bhi"))
        .withColumn("jb", F.explode(F.sequence(F.col("_blo"), F.col("_bhi"))))
    )
    n_ray_banded = cand.join(eb, ["tile", "way_id", "jb"]).count()
    n_ray_tilewide = (
        cand.drop("jb").join(edges, ["tile", "way_id"]).count()
    )
    assert 0 < n_ray_banded < n_ray_tilewide, (n_ray_banded, n_ray_tilewide)
