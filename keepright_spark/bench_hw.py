"""Hardware scaling-ceiling microbenchmark.

Measures what THIS host gives a *perfectly parallel* Spark job —
pure-JVM whole-stage-codegen sha2 over a range, no shuffle, no
Python, no IO — at a given core count.  The N→4N efficiency of this
job is the sandbox's strong-scaling ceiling: a single box cannot give
4× threads 4× throughput (single-active-core turbo boost, shared
memory subsystem), whereas 4N executors on a real cluster bring
their own cores/caches/bandwidth.  The engine's raw efficiency is
reported alongside this ceiling (BENCH/BASELINE.md).

Usage::

    python -m keepright_spark.bench_hw <cores> [n]

Prints ONE json line: {"cores": c, "wall": sec, "hashes_per_sec": r}.
Run each measurement in its own process (fresh JVM), like
bench_suite.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    cores = int(sys.argv[1])
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 150_000_000
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"hw_ceiling_{cores}")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m",
        )
        .getOrCreate()
    )
    df = spark.range(0, n, 1, max(cores * 8, 8))
    job = df.select(
        F.sha2(F.col("id").cast("string"), 256).alias("h")
    ).agg(F.max("h"))
    job_warm = (
        df.limit(2_000_000)
        .select(F.sha2(F.col("id").cast("string"), 256).alias("h"))
        .agg(F.max("h"))
    )
    job_warm.collect()  # JIT warm-up
    t0 = time.time()
    job.collect()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "cores": cores,
                "wall": round(wall, 2),
                "hashes_per_sec": round(n / wall, 0),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
