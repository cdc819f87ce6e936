"""Web mirror tables: comments lifecycle, error_counts, schemata."""

from __future__ import annotations

from keepright_spark import comments as cm
from keepright_spark.tiling import DEFAULT_TILES, DEFAULT_MARGIN_M


def _published(spark):
    return spark.createDataFrame(
        [
            ("A1", 1, 20, "new"),
            ("A1", 2, 20, "new"),
            ("A2", 3, 191, "reopened"),
        ],
        "tile string, error_id long, error_type int, state string",
    )


def test_comment_lifecycle(spark):
    c0 = cm.empty_comments(spark)
    c1, h1 = cm.add_comment(
        c0, None, "A1", 1, "ignore_t", "false positive", ts=10
    )
    assert c1.count() == 1 and h1.count() == 0
    r = c1.first()
    assert r["state"] == "ignore_temporarily"  # comment.php:25

    # storing again archives the old comment
    c2, h2 = cm.add_comment(c1, h1, "A1", 1, None, "second opinion", ts=20)
    assert c2.count() == 1 and h2.count() == 1
    assert c2.first()["comment"] == "second opinion"
    assert h2.first()["comment"] == "false positive"

    pub = _published(spark)
    vis = cm.apply_comment_state(pub, c1)
    ids = {r["error_id"] for r in vis.collect()}
    assert ids == {2, 3}  # error 1 is ignored_temporarily -> hidden
    all_rows = cm.apply_comment_state(pub, c1, show_ignored=True)
    st = {r["error_id"]: r["state"] for r in all_rows.collect()}
    assert st[1] == "ignore_temporarily" and st[2] == "new"

    lines = cm.export_comments_tsv(c2)
    assert lines == ["A1\t1\t\tsecond opinion\t20"]


def test_error_counts_and_schemata(spark):
    counts = cm.error_counts(_published(spark))
    got = {(r["tile"], r["error_type"]): r["error_count"] for r in counts.collect()}
    assert got == {("A1", 20): 2, ("A2", 191): 1}
    assert cm.count_for_types(counts, [20]) == 2
    assert cm.count_for_types(counts, [999]) == 0

    sch = cm.schemata(spark, DEFAULT_TILES, DEFAULT_MARGIN_M)
    rows = {r["tile"]: r for r in sch.collect()}
    assert rows["A1"]["left_padded"] < rows["A1"]["left"]
    assert rows["A1"]["right_padded"] > rows["A1"]["right"]


def test_error_statistics_timeline(spark):
    """The stats fill + timeline surface
    (stats/generate_error_timeline.php / errorstat.php): each fill
    appends per-(tile, error_type) live counts at a date; the
    timeline sums per (date, type) and deltas vs the previous
    snapshot."""
    from pyspark.sql import functions as F

    def errs(rows):
        return spark.createDataFrame(
            rows, "tile string, error_type int, state string"
        )

    # run 1: three live, one cleared (cleared rows are not counted —
    # the reference fills from error_view, which carries live errors)
    s1 = cm.error_statistics_fill(
        None,
        errs([("A1", 20, "new"), ("A1", 20, "new"), ("A2", 40, "new"),
              ("A2", 20, "cleared")]),
        date=1,
    )
    # run 2: one 20 fixed, one 40 appears on A1
    s2 = cm.error_statistics_fill(
        s1,
        errs([("A1", 20, "reopened"), ("A2", 40, "new"),
              ("A1", 40, "new")]),
        date=2,
    )
    got = {
        (r["date"], r["error_type"]): (r["count"], r["delta"])
        for r in cm.error_timeline(s2).collect()
    }
    assert got == {
        (1, 20): (2, None), (1, 40): (1, None),
        (2, 20): (1, -1), (2, 40): (2, 1),
    }
    # append-only: the run-1 snapshot rows are still in the table
    assert s2.filter(F.col("date") == 1).count() == 2
