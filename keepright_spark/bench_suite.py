"""Bench worker: one isolated full-suite measurement.

Each bench measurement runs in its OWN python process → its own JVM.
Two reasons this is load-bearing, found the hard way:

* JIT code-cache fairness — whole-stage codegen emits thousands of
  classes per suite; successive measurements in one JVM inherit a
  progressively fuller code cache until HotSpot disables compilation
  ("CodeHeap ... compilation: disabled") and later runs execute
  interpreted.  A fresh JVM per measurement (plus the enlarged
  ReservedCodeCacheSize in session.get_spark) makes runs comparable.
* spark.driver.extraJavaOptions only applies at JVM launch, so the
  per-session conf is ineffective after the first getOrCreate of a
  process.

Usage::

    python -m keepright_spark.bench_suite <dataset_dir> <cores> \
        <shuffle_partitions> <max_parallel> [check_ids] [nocache]

``check_ids`` (comma list) restricts the worker to a check subset —
the unit a fleet scheduler hands one executor; ``nocache`` skips the
shared tile-partitioned view cache (a worker owning 4 checks would
pay the full cache build for little reuse).

Prints ONE json line: {"rows": n, "wall": sec, "timings": {...}}.
The timed region is the staged check suite + resolve + clip; dataset
prepare is warm-up (the reference equally benches checks against a
bulk-loaded, indexed database, not the loader).

Set ``KR_BENCH_PROFILE=<path>`` to enable the Spark UI for the run
and dump per-stage aggregates (executor run/deserialize/GC time,
dispatch gaps, task counts) from the REST API to ``<path>`` — the
evidence base for the N→4N efficiency decomposition.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from . import pipeline
from .session import get_spark

BENCH_CONF = {
    # KR_BENCH_ADAPTIVE=1 re-enables AQE (the production-session
    # default, session.py) for A/B.  Measured r5 (solo 0190, scale m,
    # local[32], interleaved, steal-bracketed): AQE ON 59.0/61.3 s vs
    # OFF 31.8/50.0 s — at bench scale the per-stage re-planning +
    # coalesce decisions cost more than the tiny-task overhead they
    # remove, so the bench keeps AQE off.  Production (100 TB
    # partitions, real skew) keeps it on via session.get_spark.
    "spark.sql.adaptive.enabled": (
        "true" if os.environ.get("KR_BENCH_ADAPTIVE") else "false"
    ),
    "spark.locality.wait": "0",
    # shuffle compression stays at the Spark default (ON): measured on
    # the xd world at 4 cores, lz4 shuffle is 12% faster end-to-end
    # than uncompressed even with tmpfs local dirs — fewer bytes
    # through the memory subsystem beats the codec cost, and the gap
    # widens with core count (bandwidth is the shared resource).
    "spark.scheduler.revive.interval": "1ms",
}
# Shuffle/spill files default to /tmp (root-overlay virtual disk here);
# KR_BENCH_LOCAL_DIR=/dev/shm/... puts them on tmpfs for probes that
# want storage out of the contention picture.
if os.environ.get("KR_BENCH_LOCAL_DIR"):
    BENCH_CONF["spark.local.dir"] = os.environ["KR_BENCH_LOCAL_DIR"]


def dump_profile(
    spark, path: str, wall: float, cores: int, since_epoch: float | None = None
) -> None:
    """Aggregate per-stage metrics from the UI REST API.

    Where each millisecond of a stage lives:

    * ``executorRunTime``   — task body (the part more cores scale)
    * ``executorDeserializeTime`` — task-binary + closure deserialize
      (driver serializes once per stage, every task deserializes; big
      task binaries show up here AND in the driver's serial time)
    * submission→firstTaskLaunched — pure driver dispatch latency
    * ``jvmGcTime``         — shared-JVM collector pressure
    """
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return
    with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.load(r)

    from datetime import datetime, timezone

    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"

    def ms(s, a, b):
        try:
            ta = datetime.strptime(s[a], fmt)
            tb = datetime.strptime(s[b], fmt)
            return (tb - ta).total_seconds() * 1000.0
        except (KeyError, ValueError):
            return 0.0

    if since_epoch is not None:
        # scope to the timed region: drop prepare / cache-warm-up
        # stages submitted before the measurement started
        def _in_window(s):
            try:
                t = datetime.strptime(s["submissionTime"], fmt).replace(
                    tzinfo=timezone.utc
                )
                return t.timestamp() >= since_epoch - 0.5
            except (KeyError, ValueError):
                return False

        stages = [s for s in stages if _in_window(s)]

    agg = {
        "wall_sec": wall,
        "cores": cores,
        "n_stages": len(stages),
        "n_tasks": sum(s.get("numCompleteTasks", 0) for s in stages),
        "executor_run_sec": round(
            sum(s.get("executorRunTime", 0) for s in stages) / 1000.0, 1
        ),
        "executor_cpu_sec": round(
            sum(s.get("executorCpuTime", 0) for s in stages) / 1e9, 1
        ),
        "deserialize_sec": round(
            sum(s.get("executorDeserializeTime", 0) for s in stages) / 1000.0, 1
        ),
        "gc_sec": round(sum(s.get("jvmGcTime", 0) for s in stages) / 1000.0, 1),
        "result_ser_sec": round(
            sum(s.get("resultSerializationTime", 0) for s in stages) / 1000.0, 1
        ),
        "shuffle_write_mb": round(
            sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6, 1
        ),
        "shuffle_read_mb": round(
            sum(s.get("shuffleReadBytes", 0) for s in stages) / 1e6, 1
        ),
        "input_mb": round(
            sum(s.get("inputBytes", 0) for s in stages) / 1e6, 1
        ),
        "dispatch_gap_sec": round(
            sum(
                ms(s, "submissionTime", "firstTaskLaunchedTime") for s in stages
            )
            / 1000.0,
            1,
        ),
        "stage_wall_sec": round(
            sum(ms(s, "submissionTime", "completionTime") for s in stages)
            / 1000.0,
            1,
        ),
        "utilization": round(
            sum(s.get("executorRunTime", 0) for s in stages)
            / 1000.0
            / max(wall, 1e-9)
            / cores,
            3,
        ),
        "top_stages_by_run": sorted(
            (
                {
                    "stage": s["stageId"],
                    "name": s.get("name", "")[:60],
                    "tasks": s.get("numCompleteTasks", 0),
                    "run_sec": round(s.get("executorRunTime", 0) / 1000.0, 1),
                }
                for s in stages
            ),
            key=lambda x: -x["run_sec"],
        )[:15],
    }
    # per-task time distribution of the heaviest stages: the straggler
    # diagnostic (skewed partitions show as p100 >> p50)
    for st in agg["top_stages_by_run"][:3]:
        try:
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages/{st['stage']}/0/"
                "taskSummary?quantiles=0.0,0.5,0.75,0.95,1.0"
            ) as r:
                q = json.load(r)
            st["task_run_quantiles_sec"] = [
                round(x / 1000.0, 2) for x in q.get("executorRunTime", [])
            ]
            st["shuffle_read_mb_quantiles"] = [
                round(x / 1e6, 1)
                for x in q.get("shuffleReadMetrics", {}).get(
                    "readBytes", []
                )
            ]
        except Exception:
            pass
    with open(path, "w") as f:
        json.dump(agg, f, indent=1)


def main() -> None:
    dataset_dir = sys.argv[1]
    cores = int(sys.argv[2])
    parts = int(sys.argv[3])
    max_parallel = int(sys.argv[4])
    check_ids = None
    if len(sys.argv) > 5 and sys.argv[5] not in ("", "-"):
        check_ids = [int(c) for c in sys.argv[5].split(",")]
    cache = not (len(sys.argv) > 6 and sys.argv[6] == "nocache")
    profile_path = os.environ.get("KR_BENCH_PROFILE")
    conf = dict(BENCH_CONF)
    if profile_path:
        conf["spark.ui.enabled"] = "true"
        conf["spark.ui.port"] = os.environ.get("KR_BENCH_UI_PORT", "4050")
    spark = get_spark(
        f"bench_{cores}c_{parts}p",
        cores=cores,
        shuffle_partitions=parts,
        extra_conf=conf,
    )
    pipeline.prepare(spark, dataset_dir)  # idempotent, untimed
    t_start = time.time()
    v = pipeline.tiled_views(
        spark, dataset_dir, share_partitioning="auto" if cache else False
    )
    tiles = pipeline.dataset_tiles(dataset_dir)
    timings: dict = {}
    t0 = time.time()
    rows = pipeline.run_checks(
        v,
        check_ids,
        tiles=tiles,
        stage_dir=tempfile.mkdtemp(prefix="kr_bench_"),
        max_parallel=max_parallel,
        timings=timings,
    ).count()
    t_end = time.time()
    if profile_path:
        try:
            dump_profile(spark, profile_path, t_end - t0, cores, since_epoch=t0)
        except Exception as e:  # profiling must never fail the bench
            print(f"profile dump failed: {e}", file=sys.stderr)
    print(
        json.dumps(
            {
                "rows": rows,
                "wall": round(t_end - t0, 2),
                "wall_with_setup": round(t_end - t_start, 2),
                "timings": timings,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
