"""Bucketed docs table — partition-scoped upserts for the follower.

The reference's replication apply touches only changed objects
(osmosis ``--simc`` against the planet file, checks/planet.php:48-129);
the round-4 follower instead rewrote the WHOLE docs table per
micro-batch — correct, but O(|docs|) per drop, which at 100 TB means
rewriting the planet every replication minute.  This module gives the
docs table the same treatment the engine views already get: a
hive-style layout keyed by a deterministic doc-id bucket, where an
upsert rewrites ONLY the buckets containing batch doc_ids.

Layout (under ``<dataset_dir>/docs_store/``)::

    BUCKETS.json            <- the store manifest (single commit point)
    b_empty/part-0.parquet  <- shared zero-row bucket (schema carrier)
    b07_v3/part-*.parquet   <- bucket 7, version 3
    stage_v4/...            <- in-flight write (orphaned by a crash)

``BUCKETS.json`` maps bucket number -> current directory name and is
flipped with one atomic ``os.replace`` — the whole upsert commits or
doesn't (the round-4 two-rename swap had a crash window with no docs
table at all; this has none).  Anything on disk that the manifest does
not reference is a crash leftover and is swept before the next write.

Bucket function: ``pmod(xxhash64(doc_id), n_buckets)`` — deterministic
across runs and sessions, computed JVM-side.  Untouched buckets are
not opened, not rewritten, and their files stay byte-identical
(tests/test_streaming.py asserts exactly that).

On a cluster the same statement is one Iceberg ``MERGE INTO`` on a
``bucket(doc_id)``-partitioned table (iceberg_sink.docs_merge_sql —
the flag-gated twin); this layout emulates Iceberg's
partition-level-rewrite + snapshot-pointer semantics on plain parquet.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STORE_DIR = "docs_store"
MANIFEST = "BUCKETS.json"
EMPTY_BUCKET = "b_empty"
DEFAULT_BUCKETS = 64


def store_root(dataset_dir: str) -> str:
    return os.path.join(dataset_dir, STORE_DIR)


def read_manifest(dataset_dir: str) -> dict | None:
    """The store manifest, or None when the dataset still carries a
    plain ``docs.parquet``."""
    try:
        with open(os.path.join(store_root(dataset_dir), MANIFEST)) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def bucket_expr(n_buckets: int):
    """Deterministic doc-id bucket (JVM-side, no Python)."""
    return F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")


def bucket_paths(dataset_dir: str, manifest: dict | None = None) -> list[str]:
    """Current bucket directories, deduped (empty buckets share one
    zero-row carrier dir) and sorted for a stable read order."""
    man = manifest or read_manifest(dataset_dir)
    if man is None:
        raise FileNotFoundError(f"no docs store under {dataset_dir}")
    root = store_root(dataset_dir)
    return [
        os.path.join(root, d) for d in sorted(set(man["buckets"].values()))
    ]


def read_docs(spark: SparkSession, dataset_dir: str) -> DataFrame:
    """The docs table from the store (union of current bucket dirs —
    the bucket key lives in the directory name, not the rows, so the
    schema is exactly the plain ``docs.parquet`` schema)."""
    return spark.read.parquet(*bucket_paths(dataset_dir))


def _write_manifest(root: str, man: dict) -> None:
    tmp = os.path.join(root, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(root, MANIFEST))  # the commit point


def _sweep_orphans(root: str, man: dict) -> None:
    """Remove anything the manifest does not reference — staging dirs
    and bucket versions left by a crash between write and commit, or
    superseded versions left by a crash between commit and cleanup."""
    live = set(man["buckets"].values()) | {EMPTY_BUCKET, MANIFEST}
    for name in os.listdir(root):
        if name not in live and not name.endswith(".tmp"):
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)
        elif name.endswith(".tmp"):
            os.remove(os.path.join(root, name))


def _move_staged_buckets(
    root: str, stage: str, touched: list[int], version: int, man: dict
) -> dict:
    """Move ``stage/bucket=N`` dirs into place as ``bNN_v<version>``
    and return the updated bucket map (NOT yet committed).  A bucket
    whose rows were all tombstoned produces no staged dir and maps to
    the shared empty carrier."""
    buckets = dict(man["buckets"])
    for t in touched:
        src = os.path.join(stage, f"bucket={t}")
        if os.path.isdir(src):
            dst = f"b{t:02d}_v{version}"
            # a crash mid-move on a PREVIOUS attempt of this same
            # version leaves dst populated but unreferenced (the
            # manifest never committed); rename onto a non-empty dir
            # fails, so clear it first — for upserts _sweep_orphans
            # already did, but a crashed migrate has no manifest yet
            shutil.rmtree(os.path.join(root, dst), ignore_errors=True)
            os.rename(src, os.path.join(root, dst))
            buckets[str(t)] = dst
        else:
            buckets[str(t)] = EMPTY_BUCKET
    return buckets


def migrate(
    spark: SparkSession, dataset_dir: str, n_buckets: int = DEFAULT_BUCKETS
) -> dict:
    """One-time conversion of a plain ``docs.parquet`` (generator or
    XML-ingest output) into the bucketed store.  O(|docs|) exactly
    once — every later upsert is bucket-scoped.  The plain file is
    removed after the manifest commits (the manifest is the authority;
    a crash in between leaves both, and readers prefer the store)."""
    docs_path = os.path.join(dataset_dir, "docs.parquet")

    def _drop_plain() -> None:
        if os.path.isdir(docs_path):
            shutil.rmtree(docs_path, ignore_errors=True)
        elif os.path.exists(docs_path):
            os.remove(docs_path)

    man = read_manifest(dataset_dir)
    if man is not None:
        # a crash between manifest commit and plain-file removal left
        # a stale docs.parquet behind — the manifest is the authority
        _drop_plain()
        return man
    docs = spark.read.parquet(docs_path)
    root = store_root(dataset_dir)
    os.makedirs(root, exist_ok=True)

    # zero-row carrier: keeps the schema readable for empty buckets
    empty_dir = os.path.join(root, EMPTY_BUCKET)
    if not os.path.isdir(empty_dir):
        docs.limit(0).coalesce(1).write.mode("overwrite").parquet(empty_dir)

    stage = os.path.join(root, "stage_v1")
    shutil.rmtree(stage, ignore_errors=True)
    (
        docs.withColumn("bucket", bucket_expr(n_buckets))
        .repartition(n_buckets, "bucket")
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(stage)
    )
    man = {"n_buckets": n_buckets, "version": 1,
           "buckets": {str(t): EMPTY_BUCKET for t in range(n_buckets)}}
    man["buckets"] = _move_staged_buckets(
        root, stage, list(range(n_buckets)), 1, man
    )
    _write_manifest(root, man)
    # post-commit cleanup (retried by the next migrate/upsert call if
    # a crash lands here)
    shutil.rmtree(stage, ignore_errors=True)
    _drop_plain()
    return man


def upsert(
    spark: SparkSession,
    dataset_dir: str,
    batch: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
) -> list[int]:
    """Merge one replication batch; returns the touched bucket list.

    A batch row replaces its previous doc version; an empty (or
    null) ``spans`` array is a tombstone.  Only buckets containing batch doc_ids are
    read or rewritten — cost is O(|batch| + |touched buckets|), never
    O(|docs|).  The touched-bucket list is driver-side but bounded by
    ``n_buckets`` (it is the partition work-list, the same shape as
    diff.affected_tiles)."""
    man = migrate(spark, dataset_dir, n_buckets)
    n = man["n_buckets"]
    root = store_root(dataset_dir)
    _sweep_orphans(root, man)

    b = batch.dropDuplicates(["doc_id"]).withColumn("bucket", bucket_expr(n))
    touched = sorted(
        r["bucket"] for r in b.select("bucket").distinct().collect()
    )
    if not touched:
        return []
    cur_paths = [
        os.path.join(root, man["buckets"][str(t)]) for t in touched
    ]
    cur = spark.read.parquet(*sorted(set(cur_paths))).withColumn(
        "bucket", bucket_expr(n)
    )
    # empty-carrier reads may surface rows of OTHER empty buckets only
    # if the carrier were non-empty — it never is; still, scope to the
    # touched set so the invariant is structural, not incidental
    cur = cur.filter(F.col("bucket").isin(touched))
    merged = (
        cur.join(b.select("doc_id"), "doc_id", "left_anti")
        .unionByName(b.filter(F.size("spans") > 0))
    )

    version = man["version"] + 1
    stage = os.path.join(root, f"stage_v{version}")
    shutil.rmtree(stage, ignore_errors=True)
    (
        merged.repartition(len(touched), "bucket")
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(stage)
    )
    new_buckets = _move_staged_buckets(root, stage, touched, version, man)
    old_dirs = {
        man["buckets"][str(t)] for t in touched
    } - set(new_buckets.values()) - {EMPTY_BUCKET}
    _write_manifest(
        root,
        {"n_buckets": n, "version": version, "buckets": new_buckets},
    )
    # post-commit cleanup of superseded versions (crash here → swept
    # by the next upsert)
    shutil.rmtree(stage, ignore_errors=True)
    for d in old_dirs:
        shutil.rmtree(os.path.join(root, d), ignore_errors=True)
    return touched


def signature_entries(dataset_dir: str):
    """(name, size, mtime_ns) per store file, in stable order — the
    docs-change signature input for pipeline._docs_signature.  Version
    bumps rename directories, so any committed upsert changes the
    signature even if sizes collide."""
    man = read_manifest(dataset_dir)
    if man is None:
        return None
    root = store_root(dataset_dir)
    out = []
    for d in sorted(set(man["buckets"].values())):
        p = os.path.join(root, d)
        for fn in sorted(os.listdir(p)) if os.path.isdir(p) else []:
            try:
                st = os.stat(os.path.join(p, fn))
            except OSError:
                continue
            out.append((f"{d}/{fn}", st.st_size, st.st_mtime_ns))
    return out


def duckdb_docs_source(dataset_dir: str) -> str:
    """DuckDB ``read_parquet`` argument for the docs table in either
    layout (the oracles read whatever the engine reads)."""
    man = read_manifest(dataset_dir)
    if man is None:
        return f"'{dataset_dir}/docs.parquet'"
    globs = ", ".join(
        f"'{p}/*.parquet'" for p in bucket_paths(dataset_dir, man)
    )
    return f"[{globs}]"
