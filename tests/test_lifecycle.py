"""Error-lifecycle state machine + resumable persistent runs."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from keepright_spark import lifecycle, pipeline
from keepright_spark.errors import ERROR_COLS


def _fresh(spark, rows):
    return spark.createDataFrame(
        [
            (t, et, ot, oid, lat, lon, msg, None, None, None, None, None)
            for (t, et, ot, oid, lat, lon, msg) in rows
        ],
        "tile string, error_type int, object_type string, object_id long, "
        "lat long, lon long, msgid string, txt1 string, txt2 string, "
        "txt3 string, txt4 string, txt5 string",
    )


def test_state_machine_transitions(spark):
    r1 = _fresh(spark, [("A1", 20, "node", 1, 10, 10, "m"),
                        ("A1", 40, "way", 2, 20, 20, "m")])
    e1 = lifecycle.sync_errors(None, r1, [20, 40], run_seq=1)
    state = {r["object_id"]: r["state"] for r in e1.collect()}
    assert state == {1: "new", 2: "new"}

    # run 2: error 1 persists, error 2 vanishes
    r2 = _fresh(spark, [("A1", 20, "node", 1, 10, 10, "m")])
    e2 = lifecycle.sync_errors(e1, r2, [20, 40], run_seq=2)
    rows = {r["object_id"]: r for r in e2.collect()}
    assert rows[1]["state"] == "new"
    assert rows[1]["first_occurrence"] == 1 and rows[1]["last_checked"] == 2
    assert rows[2]["state"] == "cleared"

    # run 3: error 2 reappears -> reopened; error_id stable
    r3 = _fresh(spark, [("A1", 20, "node", 1, 10, 10, "m"),
                        ("A1", 40, "way", 2, 20, 20, "m")])
    e3 = lifecycle.sync_errors(e2, r3, [20, 40], run_seq=3)
    rows = {r["object_id"]: r for r in e3.collect()}
    assert rows[2]["state"] == "reopened"
    assert rows[2]["error_id"] == [r for r in e1.collect() if r["object_id"] == 2][0]["error_id"]


def test_partial_run_scope(spark):
    r1 = _fresh(spark, [("A1", 20, "node", 1, 10, 10, "m"),
                        ("A1", 40, "way", 2, 20, 20, "m")])
    e1 = lifecycle.sync_errors(None, r1, [20, 40], run_seq=1)
    # partial run of check 40 only: missing error 20 must NOT clear
    r2 = _fresh(spark, [])
    e2 = lifecycle.sync_errors(e1, r2, [40], run_seq=2)
    rows = {r["object_id"]: r for r in e2.collect()}
    assert rows[1]["state"] == "new"      # out of scope, untouched
    assert rows[2]["state"] == "cleared"  # in scope, vanished


def test_persistent_run_resume(spark, tiny_dir, tmp_path):
    state = str(tmp_path / "state")
    errs = lifecycle.run_persistent(spark, tiny_dir, state, check_ids=[20, 120])
    n1 = errs.count()
    assert n1 > 0
    assert errs.filter(F.col("state") == "new").count() == n1
    lineage = os.listdir(os.path.join(state, "lineage"))
    assert lineage, "lineage rows must be written"

    # re-run: same errors, all still 'new' (idempotent recompute),
    # same error ids
    errs2 = lifecycle.run_persistent(spark, tiny_dir, state, check_ids=[20, 120])
    assert errs2.count() == n1
    assert errs2.filter(F.col("state") != "new").count() == 0

    # manifest marks runs committed
    with open(os.path.join(state, "run_manifest.json")) as f:
        m = json.load(f)
    assert m["last_run_seq"] == 2 and m["run_2"]["committed"]

    # error-statistics timeline fill: one snapshot per committed run,
    # per-(date, type) totals equal the live table at each run
    from keepright_spark import comments as cm

    stats = lifecycle.load_error_statistics(spark, state)
    tl = {
        (r["date"], r["error_type"]): (r["count"], r["delta"])
        for r in cm.error_timeline(stats).collect()
    }
    by_type = {
        r["error_type"]: r["c"]
        for r in errs2.groupBy("error_type")
        .agg(F.count(F.lit(1)).alias("c")).collect()
    }
    for et, n in by_type.items():
        assert tl[(1, et)] == (n, None)  # first snapshot, no delta
        assert tl[(2, et)] == (n, 0)     # identical re-run, delta 0


def test_crash_resume_uncommitted_run(spark, tiny_dir, tmp_path):
    """A restart after a crash mid-run must resume the SAME run_seq,
    reuse its committed tile groups, and finish with a committed
    errors table behind the atomic errors_CURRENT pointer."""
    import shutil

    state = str(tmp_path / "state")
    e1 = lifecycle.run_persistent(
        spark, tiny_dir, state, check_ids=[20], tile_group_size=1
    )
    n1 = e1.count()
    mp = os.path.join(state, "run_manifest.json")
    with open(mp) as f:
        m = json.load(f)
    # simulate a crash after all tile groups committed but before the
    # table commit: drop the committed flag, pointer and table
    del m["run_1"]["committed"]
    m.pop("last_run_seq", None)
    with open(mp, "w") as f:
        json.dump(m, f)
    shutil.rmtree(os.path.join(state, "errors_v1.parquet"))
    os.remove(os.path.join(state, "errors_CURRENT"))
    lineage_mtimes = {
        f: os.path.getmtime(os.path.join(state, "lineage", f))
        for f in os.listdir(os.path.join(state, "lineage"))
    }

    e2 = lifecycle.run_persistent(spark, tiny_dir, state, check_ids=[20])
    with open(mp) as f:
        m = json.load(f)
    assert m["last_run_seq"] == 1 and m["run_1"]["committed"]
    assert e2.count() == n1
    with open(os.path.join(state, "errors_CURRENT")) as f:
        assert f.read().strip() == "errors_v1.parquet"
    # completed tile groups were skipped, not recomputed
    for f_, mt in lineage_mtimes.items():
        assert os.path.getmtime(os.path.join(state, "lineage", f_)) == mt


def test_id_assignment_distributed_and_dense(spark):
    # ids must be dense 1..N, follow the KEY total order, and the
    # row_number window must be tile-partitioned (no global funnel)
    rows = [("A%d" % (i % 7), 20, "node", i, i * 10, i * 10, "m")
            for i in range(40)]
    e = lifecycle.sync_errors(None, _fresh(spark, rows), [20], run_seq=1)
    got = sorted(r["error_id"] for r in e.collect())
    assert got == list(range(1, 41))
    # deterministic: same input -> same ids
    e2 = lifecycle.sync_errors(None, _fresh(spark, rows), [20], run_seq=1)
    m1 = {(r["tile"], r["object_id"]): r["error_id"] for r in e.collect()}
    m2 = {(r["tile"], r["object_id"]): r["error_id"] for r in e2.collect()}
    assert m1 == m2
    # plan gate: every row_number window spec is partitioned by tile
    plan = e._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "row_number()" in line:
            assert "windowspecdefinition(tile#" in line, line


def test_published_view(spark, tiny_dir):
    v = pipeline.tiled_views(spark, tiny_dir)
    ev = pipeline.run_dataset(spark, tiny_dir, [20])
    errs = lifecycle.sync_errors(None, ev, [20], run_seq=1)
    pub = lifecycle.published_view(errs, v)
    rows = pub.limit(5).collect()
    assert rows
    for r in rows:
        assert r["error_name"] == "multiple nodes on the same spot"
        assert r["user_name"] and r["user_name"].startswith("user_")
        assert r["object_timestamp"] is not None


def test_explicit_run_seq_rejects_stale_record(spark, tiny_dir, tmp_path):
    """Reusing a run record staged for a different world must raise,
    not silently filter its groups (false-'cleared' hazard)."""
    state = str(tmp_path / "state")
    lifecycle.run_persistent(
        spark, tiny_dir, state, check_ids=[20], tile_group_size=1
    )
    mp = os.path.join(state, "run_manifest.json")
    with open(mp) as f:
        m = json.load(f)
    # a crashed run staged against a different tile scope
    m["run_2"] = {
        "groups": [["bogus_tile"]],
        "scope": ["bogus_tile"],
        "docs_sig": m["run_1"].get("docs_sig", "x"),
    }
    with open(mp, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="different world"):
        lifecycle.run_persistent(
            spark, tiny_dir, state, check_ids=[20], run_seq=2
        )
