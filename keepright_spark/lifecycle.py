"""Persistent error lifecycle, published view, metrics and resume.

Re-expression of run-checks.php's state machinery over a parquet
(Iceberg-on-cluster) errors table:

* ``sync_errors``  — the _tmp_errors ⇄ public.errors state sync
  (run-checks.php:221-277): still-present errors update payload and
  flip cleared→reopened (else →new); vanished errors owned by the
  executed checks' decades are cleared; fresh errors insert as 'new'
  ('preliminary' for 410-419).  The NULL-safe join of the reference
  (`IS NOT DISTINCT FROM`, :250) is Spark's ``eqNullSafe``.
* ``published_view`` — error_view enrichment (run-checks.php:279-478,
  `:440-466`): drop cleared/preliminary, attach error_name (static
  catalog), user_name, object_timestamp.
* ``run_persistent`` — the per-tile-batch driver with checkpointed
  resume (north rule): tiles are processed in groups; each completed
  group commits staged error rows + a lineage row (tile group, checks,
  row count, duration, input counts) to the state directory, and a
  re-run skips committed groups.  Run "timestamps" are deterministic
  run sequence numbers — the reference's NOW() would break replay.
* ``node_density`` — the 0.1°-cell census (run-checks.php:488-514),
  also the skew census feeding hot-cell salting.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import pipeline
from .checks import available_checks
from .data_tables import ERROR_NAMES
from .errors import TXT_COLS

KEY = ["tile", "error_type", "object_type", "object_id", "lat", "lon"]

ERRORS_SCHEMA = (
    "error_id long, tile string, error_type int, object_type string, "
    "object_id long, lat long, lon long, state string, "
    "first_occurrence long, last_checked long, msgid string, "
    "txt1 string, txt2 string, txt3 string, txt4 string, txt5 string"
)


def _decade_scope(executed_checks: list[int], et=None):
    """error_type scope of a partial run (run-checks.php:192-218):
    a run owns the decades of the checks it executed."""
    et = F.col("error_type") if et is None else et
    cond = F.lit(False)
    for cid in executed_checks:
        cond = cond | et.between(cid, cid + 9)
    return cond


def sync_errors(
    existing: DataFrame | None,
    fresh: DataFrame,
    executed_checks: list[int],
    run_seq: int,
    tile_scope: list[str] | None = None,
    release_to: list | None = None,
) -> DataFrame:
    """Next state of the persistent errors table.

    ``fresh``: clipped error_view rows of this run (errors.ERROR_COLS).
    ``existing``: previous errors table (ERRORS_SCHEMA) or None.
    ``tile_scope``: tiles this run actually executed (diff update) —
    vanished errors outside the scope keep their state, exactly like
    the reference's per-schema runs never clear other schemas' rows.
    ``release_to``: optional list; when given, the twice-consumed
    intermediate frame is persisted and appended here, and the caller
    unpersists after materializing the result.  Without it nothing is
    cached (the intermediate is computed twice) — no hidden state to
    leak.
    """
    spark = fresh.sparkSession
    if existing is None:
        existing = spark.createDataFrame([], ERRORS_SCHEMA)
    f = fresh.select(
        *KEY, "msgid", *TXT_COLS
    ).withColumnsRenamed({c: f"f_{c}" for c in ["msgid", *TXT_COLS]})

    cond = None
    for k in KEY:
        c = existing[k].eqNullSafe(f[k])
        cond = c if cond is None else cond & c
    j = existing.join(f, cond, "full_outer")

    # a fresh row exists iff any of its key cols is non-null on the f side
    fresh_side = None
    for k in KEY:
        c = f[k].isNotNull()
        fresh_side = c if fresh_side is None else fresh_side | c
    old_side = existing["error_id"].isNotNull()

    in_scope_old = _decade_scope(executed_checks, existing["error_type"])
    if tile_scope is not None:
        in_scope_old = in_scope_old & existing["tile"].isin(list(tile_scope))

    both = j.filter(old_side & fresh_side).select(
        existing["error_id"],
        *[F.coalesce(existing[k], f[k]).alias(k) for k in KEY],
        F.when(existing["state"] == "cleared", F.lit("reopened"))
        .otherwise(F.lit("new"))
        .alias("state"),
        existing["first_occurrence"],
        F.lit(run_seq).alias("last_checked"),
        f["f_msgid"].alias("msgid"),
        *[f[f"f_{c}"].alias(c) for c in TXT_COLS],
    )
    only_old = j.filter(old_side & ~fresh_side).select(
        existing["error_id"], *[existing[k] for k in KEY],
        F.when(
            in_scope_old & (existing["state"] != "cleared"), F.lit("cleared")
        )
        .otherwise(existing["state"])
        .alias("state"),
        existing["first_occurrence"],
        F.when(
            in_scope_old & (existing["state"] != "cleared"), F.lit(run_seq)
        )
        .otherwise(existing["last_checked"])
        .alias("last_checked"),
        existing["msgid"],
        *[existing[c] for c in TXT_COLS],
    )
    max_id = existing.agg(F.coalesce(F.max("error_id"), F.lit(0))).first()[0]
    # Distributed deterministic id assignment: ids follow the total
    # order of KEY (which starts with tile), so a per-tile row_number
    # plus an exclusive prefix-sum of per-tile counts reproduces the
    # global sequence without funnelling every row through one task.
    # The prefix-sum window runs over the tiny tile-count frame
    # (~#tiles rows), not the error rows.
    fresh_new = (
        j.filter(~old_side & fresh_side)
        .select(
            *[f[k].alias(k) for k in KEY],
            f["f_msgid"].alias("msgid"),
            *[f[f"f_{c}"].alias(c) for c in TXT_COLS],
        )
        .filter(_decade_scope(executed_checks))
    )
    if release_to is not None:
        # consumed by tile_off AND only_new: cache once, caller releases
        fresh_new = fresh_new.persist()
        release_to.append(fresh_new)
    w_tile = Window.partitionBy("tile").orderBy(
        *[F.col(k).asc_nulls_first() for k in KEY if k != "tile"]
    )
    tile_off = (
        fresh_new.groupBy("tile")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("tile").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("tile", "_off")
    )
    only_new = (
        fresh_new.withColumn("_rn", F.row_number().over(w_tile))
        .join(F.broadcast(tile_off), "tile")
        .withColumn(
            "error_id", (F.lit(max_id) + F.col("_off") + F.col("_rn")).cast("long")
        )
        .drop("_rn", "_off")
        .withColumn(
            "state",
            F.when(
                F.col("error_type").between(410, 419), F.lit("preliminary")
            ).otherwise(F.lit("new")),
        )
        .withColumn("first_occurrence", F.lit(run_seq))
        .withColumn("last_checked", F.lit(run_seq))
    )
    cols = [fld.split(" ")[0] for fld in ERRORS_SCHEMA.split(", ")]
    return (
        both.select(cols)
        .unionByName(only_old.select(cols))
        .unionByName(only_new.select(cols))
    )


def published_view(errors: DataFrame, v) -> DataFrame:
    """error_view rows (run-checks.php:292-319 + name/user/timestamp
    resolution at :440-478): cleared/preliminary rows excluded."""
    spark = errors.sparkSession
    names = F.broadcast(
        spark.createDataFrame(
            [(k, n) for k, n in ERROR_NAMES.items()],
            "error_type int, error_name string",
        )
    )
    live = errors.filter(~F.col("state").isin("cleared", "preliminary"))
    # decade fallback: subtype 191 → name of 190 if no exact entry
    live = (
        live.join(names, "error_type", "left")
        .join(
            names.select(
                (F.col("error_type")).alias("_decade"),
                F.col("error_name").alias("_decade_name"),
            ),
            (F.col("error_type") - F.col("error_type") % 10) == F.col("_decade"),
            "left",
        )
        .withColumn(
            "error_name",
            F.coalesce(F.col("error_name"), F.col("_decade_name"), F.lit("")),
        )
        .drop("_decade", "_decade_name")
    )

    def meta(df, id_col, otype):
        return df.select(
            "tile",
            F.col(id_col).alias("object_id"),
            F.lit(otype).alias("object_type"),
            F.col("user_id").alias("_uid"),
            F.col("tstamp").alias("object_timestamp"),
        )

    om = (
        meta(v.nodes, "id", "node")
        .unionByName(meta(v.ways, "id", "way"))
        .unionByName(meta(v.relations, "id", "relation"))
    )
    out = live.join(om, ["tile", "object_id", "object_type"], "left")
    # synthetic users catalog (datagen writes user ids 1..97)
    out = out.withColumn(
        "user_name",
        F.when(
            F.col("_uid").isNotNull(), F.concat(F.lit("user_"), F.col("_uid"))
        ),
    ).drop("_uid")
    return out


def node_density(v) -> DataFrame:
    """Nodes per 0.1° cell (run-checks.php:488-514) — the skew census
    that feeds hot-cell salting decisions."""
    return (
        v.nodes.groupBy(
            (F.round(F.col("lat") * 10) / 10).alias("lat_cell"),
            (F.round(F.col("lon") * 10) / 10).alias("lon_cell"),
        )
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


def run_persistent(
    spark: SparkSession,
    dataset_dir: str,
    state_dir: str,
    check_ids: list[int] | None = None,
    run_seq: int | None = None,
    tile_group_size: int = 64,
    only_tiles: list[str] | None = None,
) -> DataFrame:
    """Full resumable run: staged per-tile-group check execution with
    lineage, then one state sync into the persistent errors table.

    Returns the new persistent errors DataFrame (also written to
    ``state_dir/errors_v<run_seq>.parquet`` and committed via the
    ``errors_CURRENT`` pointer; previous runs' lineage under
    ``state_dir/lineage/``)."""
    os.makedirs(state_dir, exist_ok=True)
    manifest_path = os.path.join(state_dir, "run_manifest.json")
    manifest = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
    registry = available_checks()
    if check_ids is None:
        check_ids = sorted(registry)
    tiles = pipeline.dataset_tiles(dataset_dir) or []
    if only_tiles is not None:
        # diff-update scope: process only the affected tiles; an empty
        # scope (no changes) returns the committed table untouched
        scope_set = set(only_tiles)
        tiles = [t for t in tiles if t.name in scope_set]
        if not tiles:
            cur = current_errors_path(state_dir)
            if cur is not None:
                return spark.read.parquet(cur)
            return spark.createDataFrame([], ERRORS_SCHEMA)
    # the run's identity: exactly which tiles it covers and which docs
    # snapshot it reads — a resumed run must match BOTH, else its
    # staged groups describe a different world than the sync would
    # commit against (newly-affected tiles would be silently skipped
    # yet fall inside the clear scope → false 'cleared' rows)
    scope_names = sorted(t.name for t in tiles)
    docs_sig = pipeline._docs_signature(dataset_dir)
    if run_seq is None:
        # crash-safe resume: pick up the newest *uncommitted* run whose
        # recorded scope + docs signature match this call's (its
        # groups_done lets us skip completed tile groups).  EVERY other
        # uncommitted run is stale — swept (record + staged dir), not
        # just the newest, so crashed runs can't accumulate orphaned
        # staged output.  last_run_seq is only advanced at commit, so a
        # crash mid-run never orphans its staged groups.
        import shutil

        seqs = sorted(
            int(k.split("_", 1)[1])
            for k in manifest
            if k.startswith("run_") and k.split("_", 1)[1].isdigit()
        )
        uncommitted = [
            s for s in seqs if not manifest[f"run_{s}"].get("committed")
        ]
        stale = []
        for s in reversed(uncommitted):
            rec = manifest[f"run_{s}"]
            stored_scope = rec.get("scope") or sorted(
                {n for g in rec.get("groups", []) for n in g}
            )
            if (
                run_seq is None
                and stored_scope == scope_names
                and rec.get("docs_sig", docs_sig) == docs_sig
            ):
                run_seq = s
            else:
                stale.append(s)
        for s in stale:
            shutil.rmtree(
                os.path.join(state_dir, "stage", f"run_{s}"),
                ignore_errors=True,
            )
            del manifest[f"run_{s}"]
        if stale:
            with open(manifest_path, "w") as f:
                json.dump(manifest, f)
        if run_seq is None:
            run_seq = max(
                int(manifest.get("last_run_seq", 0)), *uncommitted, 0
            ) + 1
    # no shared cache here: each tile group filters the views to its
    # tiles, and over the raw tile-partitioned parquet that filter is
    # partition pruning — the group's scan touches only its partitions
    v = pipeline.tiled_views(spark, dataset_dir, share_partitioning=False)
    # refuse to run over an empty base table (run-checks.php:66-84) —
    # a vanished input would otherwise "clear" every error in scope
    from .watchdog import assert_base_tables

    assert_base_tables(v)

    # The tile-group layout is part of the run's durable state: a
    # resumed process must read the staged outputs under the SAME
    # grouping it crashed with, not one re-derived from its own
    # tile_group_size argument.
    run_key = f"run_{run_seq}"
    rec = manifest.get(run_key, {})
    tile_by_name = {t.name: t for t in tiles}
    if rec.get("groups"):
        # run identity holds for ANY reused record — including an
        # explicitly passed run_seq: a stale record's staged groups
        # describe a different world than the sync would commit
        # against (mismatched tiles would be silently skipped yet fall
        # inside the clear scope → false 'cleared' rows).  Raise
        # instead of silently filtering.
        stored_scope = rec.get("scope") or sorted(
            {n for g in rec["groups"] for n in g}
        )
        if stored_scope != scope_names or rec.get("docs_sig", docs_sig) != docs_sig:
            raise ValueError(
                f"{run_key} was staged for a different world "
                f"(stored: {len(stored_scope)} tiles, docs_sig="
                f"{rec.get('docs_sig')!r}; current: {len(scope_names)} "
                f"tiles, docs_sig={docs_sig!r}). Pass a fresh run_seq "
                f"or delete the stale staged run."
            )
        groups = [[tile_by_name[n] for n in g] for g in rec["groups"]]
    else:
        groups = [
            tiles[i : i + tile_group_size]
            for i in range(0, len(tiles), tile_group_size)
        ]
        rec = manifest.setdefault(run_key, {})
        rec["groups"] = [[t.name for t in g] for g in groups]
        # run identity for crash-safe resume: scope + docs snapshot
        rec["scope"] = scope_names
        rec["docs_sig"] = docs_sig
        with open(manifest_path, "w") as f:
            json.dump(manifest, f)
    done = set(manifest.get(run_key, {}).get("groups_done", []))
    lineage_dir = os.path.join(state_dir, "lineage")
    os.makedirs(lineage_dir, exist_ok=True)

    for gi, group in enumerate(groups):
        if gi in done:
            continue
        t0 = time.time()
        names = [t.name for t in group]
        vg = type(v)(
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
        stage = os.path.join(state_dir, "stage", run_key, f"group_{gi}")
        timings: dict = {}
        ev = pipeline.run_checks(
            vg, check_ids, group, stage_dir=stage, timings=timings
        )
        out_path = os.path.join(state_dir, "stage", run_key, f"ev_{gi}.parquet")
        ev.write.mode("overwrite").parquet(out_path)
        n_rows = spark.read.parquet(out_path).count()
        with open(os.path.join(lineage_dir, f"{run_key}_group_{gi}.json"), "w") as f:
            json.dump(
                {
                    "run_seq": run_seq,
                    "group": gi,
                    "tiles": names,
                    "checks": check_ids,
                    "error_rows": n_rows,
                    "seconds": round(time.time() - t0, 3),
                    "per_check_seconds": timings,
                },
                f,
            )
        done.add(gi)
        manifest.setdefault(run_key, {})["groups_done"] = sorted(done)
        with open(manifest_path, "w") as f:
            json.dump(manifest, f)

    fresh = spark.read.parquet(
        *[
            os.path.join(state_dir, "stage", run_key, f"ev_{gi}.parquet")
            for gi in range(len(groups))
        ]
    )
    existing = None
    cur = current_errors_path(state_dir)
    if cur is not None:
        existing = spark.read.parquet(cur)
    release: list = []
    new_errors = sync_errors(
        existing,
        fresh,
        check_ids,
        run_seq,
        tile_scope=[t.name for t in tiles] if only_tiles is not None else None,
        release_to=release,
    )
    # versioned write + atomic pointer swap: the new table is written
    # to its own directory (never overwriting the copy it reads), then
    # errors_CURRENT is flipped with an atomic rename — a crash at any
    # point leaves a readable previous version
    new_path = os.path.join(state_dir, f"errors_v{run_seq}.parquet")
    try:
        new_errors.write.mode("overwrite").parquet(new_path)
    finally:
        for df in release:
            df.unpersist()
    ptr = os.path.join(state_dir, "errors_CURRENT")
    tmp_ptr = ptr + ".tmp"
    with open(tmp_ptr, "w") as f:
        f.write(os.path.basename(new_path))
    os.replace(tmp_ptr, ptr)
    # node-density census alongside (skew metrics)
    node_density(v).write.mode("overwrite").parquet(
        os.path.join(state_dir, "node_density.parquet")
    )
    # error-statistics timeline fill (generate_error_timeline.php -f):
    # one snapshot dir per run_seq — overwrite makes re-running a
    # crashed commit idempotent, the directory stays append-only
    # across runs; comments.error_timeline reads the union
    from .comments import error_statistics_fill

    error_statistics_fill(None, new_errors, run_seq).write.mode(
        "overwrite"
    ).parquet(
        os.path.join(state_dir, "error_statistics", f"run_{run_seq}.parquet")
    )
    manifest.setdefault(run_key, {})["committed"] = True
    manifest["last_run_seq"] = run_seq
    with open(manifest_path, "w") as f:
        json.dump(manifest, f)
    # GC superseded versions (keep the previous one as a safety copy)
    import shutil

    for name in os.listdir(state_dir):
        if name.startswith("errors_v") and name.endswith(".parquet"):
            try:
                ver = int(name[len("errors_v"):-len(".parquet")])
            except ValueError:
                continue
            if ver < run_seq - 1:
                shutil.rmtree(os.path.join(state_dir, name), ignore_errors=True)
    return spark.read.parquet(new_path)


def load_error_statistics(spark: SparkSession, state_dir: str) -> DataFrame:
    """The accumulated error_statistics table (one snapshot per
    committed run) — feed to comments.error_timeline for the series."""
    root = os.path.join(state_dir, "error_statistics")
    paths = sorted(
        os.path.join(root, n) for n in os.listdir(root)
    ) if os.path.isdir(root) else []
    if not paths:
        from .comments import STATS_SCHEMA

        return spark.createDataFrame([], STATS_SCHEMA)
    return spark.read.parquet(*paths)


def current_errors_path(state_dir: str) -> str | None:
    """Resolve the live errors table via the errors_CURRENT pointer
    file (atomic-rename committed); falls back to the legacy
    errors.parquet path for pre-pointer state dirs."""
    ptr = os.path.join(state_dir, "errors_CURRENT")
    if os.path.exists(ptr):
        with open(ptr) as f:
            rel = f.read().strip()
        p = os.path.join(state_dir, rel)
        if os.path.exists(p):
            return p
    legacy = os.path.join(state_dir, "errors.parquet")
    return legacy if os.path.exists(legacy) else None
