"""Export sink + web read-path operators.

* ``export_error_view`` — the TSV dump sink (checks/export_errors.php:
  27-96): error_view rows ordered by error_id, chunked at 100k rows
  per file, plus the per-(error_type, state) ``error_statistics``
  rollup.  Fully distributed: each chunk file is written by the task
  owning its chunk id; the global row rank comes from a bucket census
  + prefix-sum, never a global sort or driver iteration.
* ``viewport_query`` — errors near a point (web/points.php:29-84):
  type filter with the decade/subtype rule, ±1.5° window (±0.15e8 in
  fixed-point), distance sort with the cos²(lat) longitude correction,
  LIMIT 350 — a textbook Spark top-k (orderBy + limit pushes a
  TakeOrdered physical op, no full sort).
* ``bbox_export`` — GPX/RSS export (web/export.php:19-65): bbox
  filter, optional first_occurrence recency filter, LIMIT 10000.
* ``split_tag`` — ';'-list splitting with the ';;' escape
  (checks/helpers.php:754-767), as a native column expression.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def split_tag(col: Column) -> Column:
    """array<string> of the ';'-separated values of a tag, with ';;'
    escaping a literal semicolon (helpers.php:754-767)."""
    saved = F.replace(col, F.lit(";;"), F.lit("\x00"))
    return F.transform(
        F.split(saved, ";"),
        lambda s: F.replace(s, F.lit("\x00"), F.lit(";")),
    )


def viewport_query(
    error_view: DataFrame,
    lat: float,
    lon: float,
    error_types: list[int] | None = None,
    limit: int = 350,
) -> DataFrame:
    """Top-``limit`` errors nearest to (lat, lon) — web/points.php.

    ``error_types`` entries are either a decade (e.g. 190 selects
    190-199, points.php:44-46) or an exact subtype.  Distance ranking
    uses (Δlat)² + (Δlon)²·cos²(lat) on 1e7 fixed-point coordinates
    (points.php:81-83); the ±0.15e8 window (points.php:48-50) prunes
    before ranking.
    """
    lat7 = math.floor(1e7 * lat)
    lon7 = math.floor(1e7 * lon)
    df = error_view
    if error_types:
        cond = F.lit(False)
        for t in error_types:
            if t % 10 == 0:
                cond = cond | (
                    (10 * F.floor(F.col("error_type") / 10)) == t
                )
            else:
                cond = cond | (F.col("error_type") == t)
        df = df.filter(cond)
    df = df.filter(
        (F.col("lat") >= lat7 - 15_000_000)
        & (F.col("lat") <= lat7 + 15_000_000)
        & (F.col("lon") >= lon7 - 15_000_000)
        & (F.col("lon") <= lon7 + 15_000_000)
    )
    corr = math.cos(math.radians(lat7 / 1e7)) ** 2
    dist = (
        (F.col("lat") - lat7) * (F.col("lat") - lat7)
        + (F.col("lon") - lon7) * (F.col("lon") - lon7) * corr
    )
    return df.orderBy(dist.asc()).limit(limit)


def bbox_export(
    error_view: DataFrame,
    left: float,
    bottom: float,
    right: float,
    top: float,
    min_first_occurrence: int | None = None,
    limit: int = 10000,
) -> DataFrame:
    """Errors within a bbox (web/export.php:19-65); the RSS variant
    restricts to recent first occurrences (:59-61; our timestamps are
    run sequence numbers, so the cutoff is a run_seq)."""
    df = error_view.filter(
        (F.col("lat") >= int(1e7 * bottom))
        & (F.col("lat") <= int(1e7 * top))
        & (F.col("lon") >= int(1e7 * left))
        & (F.col("lon") <= int(1e7 * right))
    )
    if min_first_occurrence is not None:
        df = df.filter(F.col("first_occurrence") >= min_first_occurrence)
    return df.limit(limit)


def export_error_view(
    error_view: DataFrame,
    out_dir: str,
    max_lines_per_file: int = 100_000,
) -> dict:
    """TSV export, 100k rows per chunk file, ordered by error_id
    (export_errors.php:30-77), plus the error_statistics rollup
    (:80-96).  Returns {'files': n, 'rows': n}.

    Distributed sink: no global sort and no driver-side row loop.  The
    global position of each row is derived from a deterministic bucket
    of error_id — per-bucket counts, an exclusive prefix sum over the
    tiny bucket census (≤ rows/chunk_size entries), then offset +
    in-bucket row_number — and each chunk file is written wholly by the
    one task that owns its chunk id, preserving the reference's
    byte-level file layout.  ``out_dir`` must be a filesystem every
    executor can reach (local disk here; a shared/distributed FS on a
    cluster, exactly like the reference's dump directory).
    """
    os.makedirs(out_dir, exist_ok=True)
    for old in os.listdir(out_dir):
        if old.startswith("error_view.") and old.endswith(".txt"):
            os.remove(os.path.join(out_dir, old))
    cols = error_view.columns
    df = error_view.withColumn(
        "_bucket",
        F.floor((F.col("error_id") - 1) / max_lines_per_file).cast("long"),
    )
    census = sorted(
        df.groupBy("_bucket").agg(F.count(F.lit(1)).alias("n")).collect(),
        key=lambda r: r["_bucket"],
    )
    total = sum(r["n"] for r in census)
    offsets, acc = [], 0
    for r in census:
        offsets.append((r["_bucket"], acc))
        acc += r["n"]
    spark = error_view.sparkSession
    if total:
        off_df = F.broadcast(
            spark.createDataFrame(offsets, "_bucket long, _off long")
        )
        w = Window.partitionBy("_bucket").orderBy("error_id")
        ranked = (
            df.join(off_df, "_bucket")
            .withColumn("_rank", F.col("_off") + F.row_number().over(w))
            .withColumn(
                "_chunk",
                F.floor((F.col("_rank") - 1) / max_lines_per_file).cast("long"),
            )
        )
        n_chunks = (total + max_lines_per_file - 1) // max_lines_per_file

        def _write_partition(it):
            f = None
            cur = None
            try:
                for row in it:
                    if row["_chunk"] != cur:
                        if f:
                            f.close()
                        cur = row["_chunk"]
                        f = open(
                            os.path.join(out_dir, f"error_view.{cur}.txt"),
                            "w",
                        )
                    f.write(
                        "\t".join(
                            "\\N" if row[c] is None else str(row[c])
                            for c in cols
                        )
                        + "\n"
                    )
            finally:
                if f:
                    f.close()

        (
            ranked.repartition(n_chunks, "_chunk")
            .sortWithinPartitions("_chunk", "error_id")
            .foreachPartition(_write_partition)
        )
    else:
        n_chunks = 0
    stats = (
        error_view.groupBy("error_type", "state")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("error_type", "state")
    )
    stats.toPandas().to_csv(
        os.path.join(out_dir, "error_statistics.txt"), sep="\t", index=False
    )
    return {"files": n_chunks, "rows": total}
