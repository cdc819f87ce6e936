"""Health watchdog: freshness / size / emptiness assertions.

Re-expression of the reference's health checks over the engine's
dataset + state-directory artifacts:

* base-table population guard — the reference refuses to run checks
  when any base table is empty (``LIMIT 1`` probes,
  checks/run-checks.php:66-84, "one of the base tables is empty");
  ``assert_base_tables`` is the same probe over the tiled views and is
  called by ``lifecycle.run_persistent`` before any check executes.
* input ("planet file") size + age — watchdog.php:39-53 with the
  limits of config/config.php:188-207 (planet_minimum_filesize,
  schema_max_age); here the input is the docs.parquet directory.
* result freshness + floors — watchdog.php:57-88 checks result files
  exist, are big enough and young enough; here the results are the
  committed errors table (via the errors_CURRENT pointer), the lineage
  rows, and optionally the TSV export directory.  The per-tile-group
  floor (every group emitted ≥ ``min_rows_per_group`` error rows)
  replaces the error_view_minimum_filesize byte floor.

All filesystem checks are driver-side metadata reads — no Spark jobs
except the eight LIMIT-1 probes, which are partition-pruned scans.
"""

from __future__ import annotations

import json
import os
import time

# Scaled analogs of config/config.php:188-207.  The byte floors are
# deliberately tiny: the synthetic worlds are MBs, not the reference's
# 90 MB planets — on a production deployment pass real floors.
DEFAULT_LIMITS = {
    "docs_minimum_bytes": 1024,           # planet_minimum_filesize
    "state_max_age_sec": 18 * 86400,      # schema_max_age
    "export_minimum_bytes": 16,           # error_view_minimum_filesize
    "min_rows_per_group": 1,              # per-tile-group result floor
}


class WatchdogError(RuntimeError):
    """Raised when ``run_watchdog(strict=True)`` finds issues."""


def assert_base_tables(v) -> None:
    """Refuse to run on an empty base table (run-checks.php:66-84).

    LIMIT-1 probes on each of the eight relational views; raises
    WatchdogError naming the empty view (unlike the reference, which
    famously "won't tell you which one")."""
    from .pipeline import VIEW_NAMES

    empty = [
        name
        for name in VIEW_NAMES
        if len(getattr(v, name).limit(1).take(1)) == 0
    ]
    if empty:
        raise WatchdogError(
            f"base table(s) empty: {', '.join(empty)} — refusing to run"
        )


def _dir_bytes(path: str) -> int:
    """Total bytes of a file OR directory tree (the docs table may be
    a single parquet file or a partitioned directory)."""
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _newest_mtime(path: str) -> float | None:
    if os.path.isfile(path):
        return os.path.getmtime(path)
    newest = None
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                mt = os.path.getmtime(os.path.join(root, f))
            except OSError:
                continue
            newest = mt if newest is None else max(newest, mt)
    return newest


def run_watchdog(
    dataset_dir: str,
    state_dir: str | None = None,
    export_dir: str | None = None,
    limits: dict | None = None,
    strict: bool = False,
    now: float | None = None,
) -> list[str]:
    """Evaluate every health rule; returns the issue list (watchdog.php
    prints it).  With ``strict`` raises WatchdogError when non-empty."""
    from .lifecycle import current_errors_path

    cfg = {**DEFAULT_LIMITS, **(limits or {})}
    now = time.time() if now is None else now
    issues: list[str] = []

    # input file size + age (watchdog.php:39-53) — the docs table is
    # either plain docs.parquet or the bucketed store (docs_store.py);
    # for the store, size/age walk only manifest-referenced buckets so
    # crash orphans cannot mask staleness
    from . import docs_store

    paths = None
    if docs_store.read_manifest(dataset_dir) is not None:
        paths = docs_store.bucket_paths(dataset_dir)
    else:
        docs = os.path.join(dataset_dir, "docs.parquet")
        if os.path.exists(docs):
            paths = [docs]
    if paths is None:
        issues.append(
            f"input docs table not found: {dataset_dir}/docs.parquet"
        )
    else:
        size = sum(_dir_bytes(p) for p in paths)
        if size < cfg["docs_minimum_bytes"]:
            issues.append(f"input docs table is too small. Size is {size}")
        mts = [m for m in (_newest_mtime(p) for p in paths) if m is not None]
        if mts and max(mts) < now - cfg["state_max_age_sec"]:
            issues.append(
                "input docs table is older than "
                f"{cfg['state_max_age_sec'] // 86400} days"
            )

    # committed results exist + freshness + per-group floors
    if state_dir is not None:
        cur = current_errors_path(state_dir)
        if cur is None:
            issues.append(f"no committed errors table under {state_dir}")
        elif len(os.listdir(cur)) == 0:
            issues.append(f"errors table {cur} is empty")

        manifest_path = os.path.join(state_dir, "run_manifest.json")
        manifest = {}
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                manifest = json.load(f)
        else:
            issues.append(f"no run manifest under {state_dir}")
        last = int(manifest.get("last_run_seq", 0))
        if last and not manifest.get(f"run_{last}", {}).get("committed"):
            issues.append(f"run {last} is not committed")

        lineage_dir = os.path.join(state_dir, "lineage")
        if not os.path.isdir(lineage_dir) or not os.listdir(lineage_dir):
            issues.append(f"no lineage rows under {state_dir}")
        else:
            mt = _newest_mtime(lineage_dir)
            if mt is not None and mt < now - cfg["state_max_age_sec"]:
                issues.append(
                    "latest committed run is older than "
                    f"{cfg['state_max_age_sec'] // 86400} days"
                )
            # per-tile-group result floor over the last run's lineage
            if last:
                for fn in sorted(os.listdir(lineage_dir)):
                    if not fn.startswith(f"run_{last}_"):
                        continue
                    with open(os.path.join(lineage_dir, fn)) as f:
                        row = json.load(f)
                    if row.get("error_rows", 0) < cfg["min_rows_per_group"]:
                        issues.append(
                            f"tile group {row.get('group')} of run {last} "
                            f"emitted {row.get('error_rows', 0)} rows "
                            f"(< {cfg['min_rows_per_group']})"
                        )

    # export dump files (watchdog.php:57-88)
    if export_dir is not None:
        chunk0 = os.path.join(export_dir, "error_view.0.txt")
        if not os.path.exists(chunk0):
            issues.append(f"result file not found: {chunk0}")
        elif os.path.getsize(chunk0) < cfg["export_minimum_bytes"]:
            issues.append(
                "result file is too small. Size is "
                f"{os.path.getsize(chunk0)}"
            )

    if strict and issues:
        raise WatchdogError(f"{len(issues)} issues found: " + "; ".join(issues))
    return issues
