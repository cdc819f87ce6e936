"""Physical-plan quality gates: predicate pushdown must reach the
parquet scans, hot paths must stay in whole-stage codegen (no
row-at-a-time Python), and broadcast joins must be chosen for the
static rule tables."""

from __future__ import annotations

from keepright_spark import pipeline
from keepright_spark.checks import available_checks


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_tag_filter_pushdown(spark, tiny_dir):
    """0100's amenity filter must reach the node_tags parquet scan."""
    v = pipeline.tiled_views(spark, tiny_dir)
    plan = _plan(available_checks()[100](v))
    assert "PushedFilters" in plan
    assert "place_of_worship" in plan, "tag literal should be pushed to the scan"


def test_no_python_row_udfs(spark, tiny_dir):
    """No BatchEvalPython (row-at-a-time Python) anywhere in the check
    plans; vectorized Arrow ops (ArrowEvalPython / FlatMapGroupsInPandas)
    are the only Python allowed (BASELINE.json input_hint)."""
    v = pipeline.tiled_views(spark, tiny_dir)
    for cid, fn in sorted(available_checks().items()):
        plan = _plan(fn(v))
        assert "BatchEvalPython" not in plan, f"check {cid} uses row Python"


def test_codegen_in_flagship(spark, tiny_dir):
    """The 0190 pair join's geometry arithmetic must sit inside
    whole-stage codegen spans (AQE hides codegen in the pre-execution
    explain, so disable it for the probe)."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        v = pipeline.tiled_views(spark, tiny_dir)
        plan = _plan(available_checks()[190](v))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # formatted explain marks codegen'd operators with '*'
    assert "* Project" in plan or "* HashAggregate" in plan or "* Sort" in plan
    assert "* SortMergeJoin" in plan or "* BroadcastHashJoin" in plan or "* Project" in plan


def test_broadcast_rules(spark, tiny_dir):
    """0060's deprecation rule table must broadcast, not shuffle."""
    v = pipeline.tiled_views(spark, tiny_dir)
    plan = _plan(available_checks()[60](v))
    assert "Broadcast" in plan
