"""Watchdog health assertions: empty inputs, stale state, floors."""

from __future__ import annotations

import json
import os

import pytest

from keepright_spark import lifecycle, pipeline, watchdog
from keepright_spark.watchdog import WatchdogError


def test_base_table_guard(spark, tiny_dir):
    v = pipeline.tiled_views(spark, tiny_dir, share_partitioning=False)
    watchdog.assert_base_tables(v)  # populated: no raise

    # empty one view -> loud failure naming the view
    empty_nodes = v.nodes.limit(0)
    broken = type(v)(
        **{
            n: (empty_nodes if n == "nodes" else getattr(v, n))
            for n in pipeline.VIEW_NAMES
        }
    )
    with pytest.raises(WatchdogError, match="nodes"):
        watchdog.assert_base_tables(broken)


def test_watchdog_healthy_and_stale(spark, tiny_dir, tmp_path):
    state = str(tmp_path / "state")
    lifecycle.run_persistent(spark, tiny_dir, state, check_ids=[20])
    assert watchdog.run_watchdog(tiny_dir, state) == []

    # stale: pretend 19 days passed since the last lineage write
    now = os.path.getmtime(
        os.path.join(state, "lineage", os.listdir(state + "/lineage")[0])
    )
    issues = watchdog.run_watchdog(tiny_dir, state, now=now + 19 * 86400)
    assert any("older than 18 days" in i for i in issues)
    with pytest.raises(WatchdogError):
        watchdog.run_watchdog(
            tiny_dir, state, now=now + 19 * 86400, strict=True
        )


def test_watchdog_missing_and_floors(spark, tiny_dir, tmp_path):
    # no committed run at all
    issues = watchdog.run_watchdog(tiny_dir, str(tmp_path / "nostate"))
    assert any("no committed errors table" in i for i in issues)

    # per-group floor: a group lineage row below the floor trips
    state = str(tmp_path / "state")
    lifecycle.run_persistent(spark, tiny_dir, state, check_ids=[20])
    ln = sorted(os.listdir(os.path.join(state, "lineage")))[0]
    p = os.path.join(state, "lineage", ln)
    with open(p) as f:
        row = json.load(f)
    row["error_rows"] = 0
    with open(p, "w") as f:
        json.dump(row, f)
    issues = watchdog.run_watchdog(tiny_dir, state)
    assert any("emitted 0 rows" in i for i in issues)

    # uncommitted latest run trips
    mp = os.path.join(state, "run_manifest.json")
    with open(mp) as f:
        m = json.load(f)
    del m["run_1"]["committed"]
    with open(mp, "w") as f:
        json.dump(m, f)
    issues = watchdog.run_watchdog(tiny_dir, state)
    assert any("not committed" in i for i in issues)
