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
    """0100's amenity filter must reach the node_tags parquet scan
    (probed on the uncached views — the shared-partitioning cache
    replaces file scans with InMemoryTableScan)."""
    # the auto-mode cache registers the bare parquet scans with the
    # CacheManager, which would substitute InMemoryTableScan into this
    # uncached probe if an earlier test populated it
    spark.catalog.clearCache()
    v = pipeline.tiled_views(spark, tiny_dir, share_partitioning=False)
    plan = _plan(available_checks()[100](v))
    assert "PushedFilters" in plan
    assert "place_of_worship" in plan, "tag literal should be pushed to the scan"


def test_tile_partition_pruning(spark, tiny_dir):
    """The engine views are hive-partitioned by tile: a per-tile-group
    filter must prune at the scan, not post-filter every file."""
    from pyspark.sql import functions as F

    spark.catalog.clearCache()  # see test_tag_filter_pushdown
    v = pipeline.tiled_views(spark, tiny_dir, share_partitioning=False)
    df = v.ways.filter(F.col("tile").isin(["A1"]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "tile" in plan.split("PartitionFilters", 1)[1][:200]


def test_shared_tile_partitioning_cuts_exchanges(spark, tiny_dir):
    """With the tile-partitioned cache + subset co-partition matching,
    a (tile, …)-keyed join over two views must not insert any
    exchange; the single cached repartition serves every consumer."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # force the shared tile partitioning (auto would skip it on
        # the 2-tile test world — the low-tile gate is the point)
        v = pipeline.tiled_views(spark, tiny_dir, share_partitioning=True)
        j = v.way_tags.join(
            v.way_nodes, ["tile", "way_id"]
        ).groupBy("tile", "way_id").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
    # the only exchanges allowed are the cache's own REPARTITION_BY_NUM
    # (shown inside the InMemoryRelation lineage); a per-join
    # ENSURE_REQUIREMENTS shuffle means the shared partitioning was
    # not reused
    assert "ENSURE_REQUIREMENTS" not in plan, plan


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


def test_auto_partitioning_skips_repartition_on_low_tile_worlds(spark, tiny_dir):
    """share_partitioning="auto" must NOT apply the shared tile
    repartition when tiles are within 4x of the partition count (the
    2-tile test world): tile-hash placement would funnel whole tiles
    through single tasks, so each join shuffles on its full key
    instead."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        v = pipeline.tiled_views(spark, tiny_dir)  # default: auto
        j = v.way_tags.join(
            v.way_nodes, ["tile", "way_id"]
        ).groupBy("tile", "way_id").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
    # the views are cached (scan layout) and the join inserts its own
    # fine-keyed exchange
    assert "InMemory" in plan
    assert "ENSURE_REQUIREMENTS" in plan, plan


def test_staged_lpt_order():
    """Staged submission is longest-first (LPT makespan heuristic),
    deterministic, and covers exactly the requested ids; unmeasured
    checks go last in id order; KR_STAGE_ORDER=id restores ascending."""
    import os

    from keepright_spark.pipeline import _STAGE_COST_ORDER, _lpt_order

    ids = sorted(_STAGE_COST_ORDER)
    out = _lpt_order(ids)
    assert sorted(out) == ids
    # submission follows the measured cost table, longest first (the
    # table itself is re-ranked from BENCH/SOLO.md each round — pin
    # the contract, not a snapshot of the ranking)
    assert out == _STAGE_COST_ORDER
    assert out[0] == 190  # the stable top pole across every round
    # unknown (unmeasured) check ids sort after every measured one
    assert _lpt_order([20, 999, 190])[-1] == 999
    os.environ["KR_STAGE_ORDER"] = "id"
    try:
        assert _lpt_order([190, 20, 50]) == [20, 50, 190]
    finally:
        del os.environ["KR_STAGE_ORDER"]
