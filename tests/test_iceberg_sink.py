"""Iceberg MERGE sink: SQL assembly + id plan are catalog-free pure
functions, tested here; the execution path self-skips without an
Iceberg runtime (this sandbox ships none) and runs unchanged where
the jar + a catalog exist.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from keepright_spark import iceberg_sink, lifecycle


def test_merge_sql_covers_all_three_branches():
    sql = iceberg_sink.merge_sql(
        "cat.db.errors", "src", [20, 40], run_seq=7,
        tile_scope=["t1", "t2"],
    )
    # one null-safe equality per state key
    for k in lifecycle.KEY:
        assert f"t.{k} <=> s.{k}" in sql
    assert "WHEN MATCHED THEN UPDATE" in sql
    assert "WHEN NOT MATCHED THEN INSERT" in sql
    assert "WHEN NOT MATCHED BY SOURCE" in sql
    # state machine: cleared→reopened else new; scoped clear only
    assert "WHEN t.state = 'cleared' THEN 'reopened' ELSE 'new'" in sql
    assert "(t.error_type BETWEEN 20 AND 29) OR (t.error_type BETWEEN 40 AND 49)" in sql
    assert "t.tile IN ('t1', 't2')" in sql
    assert "t.state <> 'cleared'" in sql
    assert "t.last_checked = 7" in sql
    # preliminary band on insert
    assert "BETWEEN 410 AND 419" in sql


def test_docs_merge_sql_tombstone_semantics():
    """The docs MERGE twin of docs_store.upsert: replace on match,
    DELETE on empty-spans tombstone, INSERT only non-tombstones."""
    sql = iceberg_sink.docs_merge_sql("cat.db.docs", "batch")
    assert "ON t.doc_id = s.doc_id" in sql
    assert "WHEN MATCHED AND size(s.spans) = 0 THEN DELETE" in sql
    assert "WHEN MATCHED THEN UPDATE SET t.spans = s.spans" in sql
    assert "WHEN NOT MATCHED AND size(s.spans) > 0" in sql
    with pytest.raises(ValueError):
        iceberg_sink.docs_merge_sql("cat.db.docs; DROP TABLE x", "batch")


def test_assign_fresh_ids_matches_parquet_sink(spark):
    """The MERGE sink's id rule must reproduce sync_errors' ids."""
    rows = [
        ("t1", 20, "node", 1, 10, 10, "m", *[None] * 5),
        ("t1", 20, "node", 2, 11, 11, "m", *[None] * 5),
        ("t2", 40, "way", 3, 12, 12, "m", *[None] * 5),
    ]
    schema = (
        "tile string, error_type int, object_type string, object_id long,"
        " lat long, lon long, msgid string, txt1 string, txt2 string,"
        " txt3 string, txt4 string, txt5 string"
    )
    fresh = spark.createDataFrame(rows, schema)
    via_merge = {
        (r.tile, r.object_id): r.error_id
        for r in iceberg_sink.assign_fresh_ids(fresh, max_id=100).collect()
    }
    via_sync = {
        (r.tile, r.object_id): r.error_id - 0
        for r in lifecycle.sync_errors(None, fresh, [20, 40], run_seq=1)
        .collect()
    }
    # same relative order; sync starts from max_id=0, merge from 100
    assert {k: v - 100 for k, v in via_merge.items()} == via_sync


def test_merge_sink_equals_parquet_sink_on_iceberg(spark, tmp_path):
    """Cluster integration recipe: with an Iceberg runtime + catalog
    on the session, the MERGE sink and lifecycle.sync_errors must
    produce identical tables.  Self-skips in this container (no
    Iceberg jar, offline); runs unchanged wherever
    ``iceberg-spark-runtime`` and a catalog conf are present, e.g.::

        spark.sql.extensions=org.apache.iceberg.spark.extensions
            .IcebergSparkSessionExtensions
        spark.sql.catalog.cat=org.apache.iceberg.spark.SparkCatalog
        spark.sql.catalog.cat.type=hadoop
        spark.sql.catalog.cat.warehouse=<shared path>
    """
    if not iceberg_sink.iceberg_available(spark):
        pytest.skip("no Iceberg runtime jar on the classpath")
    table = "cat.db.kr_errors_test"
    cols = ", ".join(
        f.replace(" ", " ") for f in lifecycle.ERRORS_SCHEMA.split(", ")
    )
    spark.sql(f"CREATE TABLE IF NOT EXISTS {table} ({cols}) USING iceberg")
    rows = [
        ("t1", 20, "node", 1, 10, 10, "m", *[None] * 5),
        ("t1", 40, "way", 2, 11, 11, "m", *[None] * 5),
    ]
    schema = (
        "tile string, error_type int, object_type string, object_id long,"
        " lat long, lon long, msgid string, txt1 string, txt2 string,"
        " txt3 string, txt4 string, txt5 string"
    )
    fresh = spark.createDataFrame(rows, schema)
    iceberg_sink.merge_sync_errors(spark, table, fresh, [20, 40], 1)
    got = sorted(
        tuple(str(x) for x in r) for r in spark.table(table).collect()
    )
    want = sorted(
        tuple(str(x) for x in r)
        for r in lifecycle.sync_errors(None, fresh, [20, 40], 1).collect()
    )
    assert got == want
