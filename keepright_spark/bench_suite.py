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
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

from . import pipeline
from .session import get_spark

BENCH_CONF = {
    "spark.sql.adaptive.enabled": "false",
    "spark.locality.wait": "0",
    "spark.shuffle.compress": "false",
    "spark.shuffle.spill.compress": "false",
    "spark.scheduler.revive.interval": "1ms",
}


def main() -> None:
    dataset_dir = sys.argv[1]
    cores = int(sys.argv[2])
    parts = int(sys.argv[3])
    max_parallel = int(sys.argv[4])
    check_ids = None
    if len(sys.argv) > 5 and sys.argv[5] not in ("", "-"):
        check_ids = [int(c) for c in sys.argv[5].split(",")]
    cache = not (len(sys.argv) > 6 and sys.argv[6] == "nocache")
    spark = get_spark(
        f"bench_{cores}c_{parts}p",
        cores=cores,
        shuffle_partitions=parts,
        extra_conf=BENCH_CONF,
    )
    pipeline.prepare(spark, dataset_dir)  # idempotent, untimed
    t_start = time.time()
    v = pipeline.tiled_views(spark, dataset_dir, share_partitioning=cache)
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
