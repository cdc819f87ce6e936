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
