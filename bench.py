#!/usr/bin/env python3
"""Benchmark: full check suite on the synthetic OSM doc table.

Prints ONE JSON line:
  {"metric": "full_checks_suite_sec", "value": <sec>, "unit": "sec",
   "queries": {"kr_0020": sec, ...}, "sf": <sf>,
   "errors_emitted": N, "rows_per_sec": R,
   "scaling": {"cores_lo": 8, "cores_hi": C, "throughput_lo": ...,
               "throughput_hi": ..., "efficiency": ...}}

The scaling block evidences the north rule's N→4N requirement by
running the *same* composite job (all checks, one action) at two
local parallelism levels on the same materialized input
(BASELINE.md: efficiency = (thr_hi/thr_lo)/(cores_hi/cores_lo)).
Also refreshes BENCH/BASELINE.md with the full breakdown.
"""

from __future__ import annotations

import json
import os
import time

from keepright_spark import pipeline
from keepright_spark.datagen import ensure_dataset, scale_for_sf_dir
from keepright_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CORES_LO = max(2, CPUS // 4)
SF_NAME = os.path.basename(os.path.normpath(SF_DIR)).replace("sf", "")


def timed_suite(cores: int, dataset: str, check_ids=None):
    spark = get_spark(f"bench_{cores}", cores=cores)
    pipeline.prepare(spark, dataset)  # idempotent, untimed
    t0 = time.time()
    rows = pipeline.run_dataset(spark, dataset, check_ids).count()
    dt = time.time() - t0
    spark.stop()
    return rows, dt


def main() -> None:
    scale = scale_for_sf_dir(SF_DIR)
    dataset = ensure_dataset(scale)

    # warm prepare with the full-size session
    spark = get_spark("bench_prepare", cores=CPUS)
    pipeline.prepare(spark, dataset)
    v = pipeline.tiled_views(spark, dataset)

    # per-check timings (resolve+clip included, like the reference's
    # per-check log at run-checks.php:201-214)
    from keepright_spark.checks import available_checks

    per_query: dict[str, float] = {}
    per_rows: dict[str, int] = {}
    for cid in sorted(available_checks()):
        t0 = time.time()
        n = pipeline.run_checks(v, [cid]).count()
        per_query[f"kr_{cid:04d}"] = round(time.time() - t0, 3)
        per_rows[f"kr_{cid:04d}"] = n
    spark.stop()

    # scaling probe: same composite job, two parallelism levels
    rows_lo, t_lo = timed_suite(CORES_LO, dataset)
    rows_hi, t_hi = timed_suite(CPUS, dataset)
    assert rows_lo == rows_hi, (rows_lo, rows_hi)
    thr_lo, thr_hi = rows_lo / t_lo, rows_hi / t_hi
    eff = (thr_hi / thr_lo) / (CPUS / CORES_LO)

    result = {
        "metric": "full_checks_suite_sec",
        "value": round(t_hi, 2),
        "unit": "sec",
        "queries": per_query,
        "sf": float(SF_NAME) if SF_NAME.replace(".", "").isdigit() else SF_NAME,
        "errors_emitted": rows_hi,
        "rows_per_sec": round(thr_hi, 1),
        "scaling": {
            "cores_lo": CORES_LO,
            "cores_hi": CPUS,
            "throughput_lo": round(thr_lo, 1),
            "throughput_hi": round(thr_hi, 1),
            "efficiency": round(eff, 3),
        },
    }

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH — keepright_spark engine\n\n"
            f"Dataset: synthetic OSM docs, scale `{scale}` "
            f"(driver sf dir `{SF_DIR}`).\n\n"
            f"## Headline\n\n"
            f"- full check suite ({len(per_query)} checks): "
            f"**{t_hi:.1f}s** on local[{CPUS}] → "
            f"**{thr_hi:.0f} error rows/sec** ({rows_hi} rows)\n\n"
            f"## Scaling (north rule: N→4N efficiency ≥ 0.8)\n\n"
            f"| cores | suite sec | rows/sec |\n|---|---|---|\n"
            f"| {CORES_LO} | {t_lo:.1f} | {thr_lo:.0f} |\n"
            f"| {CPUS} | {t_hi:.1f} | {thr_hi:.0f} |\n\n"
            f"**efficiency = (thr_{CPUS}/thr_{CORES_LO})/"
            f"({CPUS}/{CORES_LO}) = {eff:.3f}**\n\n"
            "## Per-check (sec / rows)\n\n| check | sec | rows |\n|---|---|---|\n"
            + "\n".join(
                f"| {q} | {per_query[q]} | {per_rows[q]} |" for q in sorted(per_query)
            )
            + "\n"
        )

    print(json.dumps(result))


if __name__ == "__main__":
    main()
