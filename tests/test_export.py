"""Export sink + web read-path operators."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from keepright_spark import export, lifecycle, pipeline


def test_split_tag(spark):
    df = spark.createDataFrame(
        [("a;b",), ("plain",), ("x;;y;z",)], "v string"
    ).select(export.split_tag(F.col("v")).alias("parts"))
    got = [r["parts"] for r in df.collect()]
    assert got == [["a", "b"], ["plain"], ["x;y", "z"]]


def test_viewport_and_bbox(spark, tiny_dir):
    v = pipeline.tiled_views(spark, tiny_dir)
    ev = pipeline.run_dataset(spark, tiny_dir, [20, 120])
    errs = lifecycle.sync_errors(None, ev, [20, 120], run_seq=1)
    pub = lifecycle.published_view(errs, v)

    top = export.viewport_query(pub, 48.05, 16.30, error_types=[20], limit=10)
    rows = top.collect()
    assert 0 < len(rows) <= 10
    assert all(r["error_type"] == 20 for r in rows)
    # nearest-first ordering
    import math
    corr = math.cos(math.radians(48.05)) ** 2
    d = [
        (r["lat"] - 480500000) ** 2 + (r["lon"] - 163000000) ** 2 * corr
        for r in rows
    ]
    assert d == sorted(d)

    box = export.bbox_export(pub, 16.2, 48.0, 16.4, 48.1, limit=5)
    assert 0 < box.count() <= 5


def test_export_tsv(spark, tiny_dir, tmp_path):
    v = pipeline.tiled_views(spark, tiny_dir)
    ev = pipeline.run_dataset(spark, tiny_dir, [20])
    errs = lifecycle.sync_errors(None, ev, [20], run_seq=1)
    pub = lifecycle.published_view(errs, v)
    out = str(tmp_path / "exp")
    res = export.export_error_view(pub, out, max_lines_per_file=10)
    assert res["rows"] == pub.count()
    files = [f for f in os.listdir(out) if f.startswith("error_view.")]
    assert len(files) == res["files"] and res["files"] >= 1
    assert os.path.exists(os.path.join(out, "error_statistics.txt"))

    # byte parity with the reference layout: error_id order, 10 rows
    # per file, \N for NULL, chunk boundaries at exact multiples
    cols = pub.columns
    expected = [
        "\t".join("\\N" if r[c] is None else str(r[c]) for c in cols)
        for r in pub.orderBy("error_id").collect()
    ]
    got = []
    for i in range(res["files"]):
        with open(os.path.join(out, f"error_view.{i}.txt")) as f:
            lines = f.read().splitlines()
        assert len(lines) == (10 if i < res["files"] - 1 else len(expected) - 10 * i)
        got.extend(lines)
    assert got == expected
