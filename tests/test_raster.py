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


def test_zonal_plan_stays_native(spark, dataset):
    # the whole operator is column arithmetic: any Python in the row
    # path (BatchEvalPython) is a plan regression
    plan = raster.zonal_stats(spark, dataset)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
