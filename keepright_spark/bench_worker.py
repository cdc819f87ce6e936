"""Bench worker: one "executor" of the multi-process scaling probe.

A real deployment runs this engine via spark-submit on a cluster of N
executor JVMs; tiles are the partition unit (the reference's schemas,
run as max_parallel_processes=8 OS processes, checks/main.php:74-75).
The sandbox has no cluster, so the two-cluster-size evidence
(BASELINE.json north_rule) runs N independent worker processes — each
a local[cores] SparkSession with its own scheduler — over disjoint
tile ranges of the same dataset.  Usage:

    python -m keepright_spark.bench_worker <dataset_dir> <lo> <hi> <cores>

processes tiles[lo:hi] and prints one line: ``rows=<n>``.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from . import pipeline
from .session import get_spark


def main() -> None:
    dataset_dir, lo, hi, cores = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
    )
    tiles = pipeline.dataset_tiles(dataset_dir)
    subset = tiles[lo:hi]
    spark = get_spark(f"worker_{lo}_{hi}", cores=cores, shuffle_partitions=max(cores * 2, 8))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    v = pipeline.tiled_views(spark, dataset_dir)
    names = [t.name for t in subset]
    vsub = type(v)(
        **{
            n: getattr(v, n).filter(F.col("tile").isin(names))
            for n in pipeline.VIEW_NAMES
        },
        island_seeds=v.island_seeds,
        cell_stats=v.cell_stats,
        **{
            h: getattr(v, h).filter(F.col("tile").isin(names))
            for h in pipeline.HELPER_NAMES
            if getattr(v, h) is not None
        },
    )
    import tempfile

    stage = tempfile.mkdtemp(prefix="kr_bw_")
    n = pipeline.run_checks(vsub, tiles=subset, stage_dir=stage).count()
    print(f"rows={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
