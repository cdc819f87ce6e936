"""Structured-Streaming replication follower: a parquet drop in the
feed directory upserts the docs table and triggers a scoped diff
re-run; the resulting live error set must equal a from-scratch run on
the merged docs.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from keepright_spark import diff, lifecycle, pipeline, streaming
from keepright_spark.datagen import ensure_dataset

CHECKS = [20, 120]
LIVE_COLS = ["tile", "error_type", "object_type", "object_id", "lat",
             "lon", "state", "msgid", "txt1"]


def _clone_dataset(src: str, dst: str) -> str:
    os.makedirs(dst, exist_ok=True)
    # docs.parquet is a single file from the generator, a directory
    # after a streaming upsert
    if os.path.isdir(f"{src}/docs.parquet"):
        shutil.copytree(f"{src}/docs.parquet", f"{dst}/docs.parquet")
    else:
        shutil.copy(f"{src}/docs.parquet", f"{dst}/docs.parquet")
    shutil.copy(f"{src}/MANIFEST.json", f"{dst}/MANIFEST.json")
    return dst


def _live(errors):
    rows = (
        errors.filter(F.col("state") != "cleared")
        .select(LIVE_COLS)
        .collect()
    )
    return sorted(tuple(str(x) for x in r) for r in rows)


def test_stream_drop_updates_errors(spark, tmp_path):
    tiny = ensure_dataset("t")
    ds = _clone_dataset(tiny, str(tmp_path / "ds"))
    state = str(tmp_path / "state")
    feed = str(tmp_path / "feed")

    # initial full cycle (no snapshot yet → full run + snapshot)
    diff.diff_update(spark, ds, state, check_ids=CHECKS)

    # build one replication drop: tombstone a node that carries a 0020
    # error (its duplicate partner error must clear), and retag one way
    errs = spark.read.parquet(lifecycle.current_errors_path(state))
    victim = (
        errs.filter(F.col("error_type") == 20)
        .orderBy("object_id")
        .first()["object_id"]
    )
    docs = pipeline.load_docs(spark, ds)
    n_before = docs.count()
    tomb = docs.filter(F.col("doc_id") == f"node/{victim}").select(
        "doc_id", F.expr("array()").cast(docs.schema["spans"].dataType
                                         ).alias("spans")
    )
    assert tomb.count() == 1
    drop_dir = str(tmp_path / "drop")
    tomb.write.mode("overwrite").parquet(drop_dir)
    os.makedirs(feed, exist_ok=True)
    for fn in os.listdir(drop_dir):
        if fn.endswith(".parquet"):
            shutil.copy(os.path.join(drop_dir, fn),
                        os.path.join(feed, "drop1_" + fn))

    streaming.process_available(spark, ds, state, feed, check_ids=CHECKS)

    # the docs table no longer carries the tombstoned doc
    docs2 = pipeline.load_docs(spark, ds)
    assert docs2.filter(F.col("doc_id") == f"node/{victim}").count() == 0
    assert docs2.count() == n_before - 1

    # live errors == a from-scratch run over the merged docs
    scratch_ds = _clone_dataset(ds, str(tmp_path / "scratch_ds"))
    scratch_state = str(tmp_path / "scratch_state")
    scratch = lifecycle.run_persistent(
        spark, scratch_ds, scratch_state, check_ids=CHECKS
    )
    got = _live(spark.read.parquet(lifecycle.current_errors_path(state)))
    want = _live(scratch)
    assert got == want and len(got) > 0

    # draining an empty feed is a no-op (idempotent follower)
    before = got
    streaming.process_available(spark, ds, state, feed, check_ids=CHECKS)
    after = _live(spark.read.parquet(lifecycle.current_errors_path(state)))
    assert after == before
