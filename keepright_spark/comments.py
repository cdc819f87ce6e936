"""Web mirror tables: comments, error_counts, schemata.

The reference's webserver keeps three mirror tables next to the
uploaded error_view (web/setup.sql:48-129):

* ``comments`` / ``comments_historic`` — one user comment + ignore
  state per (schema, error_id); storing a new comment archives the
  previous one (web/comment.php:33-50).
* ``error_counts`` — per-(schema, error_type) row counts, refreshed
  from the freshly uploaded view (web/webUpdateServer.php:414-418);
  served by web/error_count.php.
* ``schemata`` — tile rectangles incl. the padded (margin) boxes
  (web/setup.sql:113-129), the webserver's tile lookup for viewport
  queries.

The read path folds comments into the published view exactly like
web/points.php / web/export.php: ``COALESCE(c.state, e.state)`` with
ignored rows dropped unless explicitly requested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

COMMENTS_SCHEMA = (
    "tile string, error_id long, state string, comment string, "
    "ts long, ip string, user_agent string"
)


def empty_comments(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], COMMENTS_SCHEMA)


def add_comment(
    comments: DataFrame,
    historic: DataFrame | None,
    tile: str,
    error_id: int,
    state: str | None,
    comment: str | None,
    ts: int,
    ip: str | None = None,
    user_agent: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Store a comment (web/comment.php:33-50): the existing comment
    on (tile, error_id) moves to the historic table, the new one
    replaces it.  ``st='ignore_t'`` arrives as 'ignore_temporarily'
    (comment.php:25); comment text is html-escaped by the caller the
    same way the reference's htmlspecialchars does (lib.html_escape).
    Returns (comments, historic)."""
    spark = comments.sparkSession
    if historic is None:
        historic = empty_comments(spark)
    if state == "ignore_t":
        state = "ignore_temporarily"
    old = comments.filter(
        (F.col("tile") == tile) & (F.col("error_id") == error_id)
    )
    historic = historic.unionByName(old)
    kept = comments.filter(
        ~((F.col("tile") == tile) & (F.col("error_id") == error_id))
    )
    new = spark.createDataFrame(
        [(tile, error_id, state, comment, ts, ip, user_agent)],
        COMMENTS_SCHEMA,
    )
    return kept.unionByName(new), historic


def apply_comment_state(
    published: DataFrame,
    comments: DataFrame,
    show_ignored: bool = False,
) -> DataFrame:
    """Fold comment state/text into published rows: state becomes
    COALESCE(comment_state, state) and ignored rows are dropped
    unless requested (web/export.php:46-64, web/points.php:29-57)."""
    c = comments.select(
        "tile",
        "error_id",
        F.col("state").alias("_cstate"),
        F.col("comment").alias("comment"),
    )
    out = (
        published.join(c, ["tile", "error_id"], "left")
        .withColumn("state", F.coalesce(F.col("_cstate"), F.col("state")))
        .drop("_cstate")
    )
    if not show_ignored:
        out = out.filter(
            ~F.col("state").isin("ignore", "ignore_temporarily")
        )
    return out


def error_counts(published: DataFrame) -> DataFrame:
    """Per-(tile, error_type) counts of the uploaded view
    (webUpdateServer.php:414-418)."""
    return published.groupBy("tile", "error_type").agg(
        F.count("error_id").alias("error_count")
    )


STATS_SCHEMA = "tile string, error_type int, count long, date long"


def error_statistics_fill(
    stats: DataFrame | None, errors: DataFrame, date: int
) -> DataFrame:
    """One timeline fill step (stats/generate_error_timeline.php -f:
    ``INSERT INTO error_statistics SELECT schema, error_type,
    COUNT(1), now() FROM error_view GROUP BY ...``): append the
    current per-(tile, error_type) live-error counts stamped with
    ``date`` (the engine uses run_seq; epoch seconds work equally).
    The reference's ``schema`` is the tile here, as everywhere else.

    Append-only — each fill is one partial aggregate of the live
    errors (map-side combinable groupBy); the stats table grows by
    |tiles|x|types| rows per run, never rewritten."""
    snap = (
        errors.filter(F.col("state") != "cleared")
        .groupBy("tile", "error_type")
        .agg(F.count(F.lit(1)).alias("count"))
        .withColumn("date", F.lit(date).cast("long"))
    )
    return snap if stats is None else stats.unionByName(snap)


def error_timeline(stats: DataFrame) -> DataFrame:
    """The per-(date, error_type) count time-series with the change
    vs the previous snapshot — the table the reference renders per
    schema row-pair (stats/generate_error_timeline.php:80-96 reads
    the two newest dates as Errors/LastRun/RunBefore; errorstat.php
    plots the full series).  One groupBy + one lag window over the
    tiny aggregate."""
    per_date = stats.groupBy("date", "error_type").agg(
        F.sum("count").alias("count")
    )
    w = Window.partitionBy("error_type").orderBy("date")
    return per_date.withColumn(
        "delta", F.col("count") - F.lag("count").over(w)
    )


def count_for_types(counts: DataFrame, error_types: list[int]) -> int:
    """web/error_count.php: SUM(error_count) over the requested
    types (0 when none match)."""
    row = (
        counts.filter(F.col("error_type").isin([int(t) for t in error_types]))
        .agg(F.coalesce(F.sum("error_count"), F.lit(0)).alias("c"))
        .first()
    )
    return int(row["c"])


def schemata(spark: SparkSession, tiles, margin_m: float) -> DataFrame:
    """The schemata tile-rectangle table (web/setup.sql:113-129):
    unpadded + margin-padded boxes per tile."""
    rows = []
    for t in tiles:
        pl, pr, pt, pb = t.padded(margin_m)
        rows.append(
            (t.left, t.right, t.top, t.bottom, pl, pr, pt, pb, t.name)
        )
    return spark.createDataFrame(
        rows,
        "`left` double, `right` double, top double, bottom double, "
        "left_padded double, right_padded double, top_padded double, "
        "bottom_padded double, tile string",
    )


def export_comments_tsv(comments: DataFrame) -> list[str]:
    """The comment dump lines (webUpdateServer.php:160-181): ordered
    by (schema, error_id), tab-safe comment text."""
    safe = F.replace(
        F.replace(
            F.replace(F.coalesce(F.col("comment"), F.lit("")), F.lit("\t"), F.lit(" ")),
            F.lit("\r\n"),
            F.lit("<br>"),
        ),
        F.lit("\n"),
        F.lit("<br>"),
    )
    rows = (
        comments.filter(F.col("tile").isNotNull() & (F.col("tile") != ""))
        .orderBy("tile", "error_id")
        .select(
            F.concat_ws(
                "\t",
                F.col("tile"),
                F.col("error_id").cast("string"),
                F.coalesce(F.col("state"), F.lit("")),
                safe,
                F.col("ts").cast("string"),
            ).alias("line")
        )
        .collect()
    )
    return [r["line"] for r in rows]
