"""Check 0010 — deleted items (subtypes 10/11/12).

Reference: /root/reference/checks/0010_deleted_items.php:4-27 — three
joins flagging visible ways that use invisible (deleted) nodes and
visible relations that use invisible nodes/ways.  Disabled upstream
(config/error_types.php:4-6) because the planet import carries no
history: current_* rows never have visible=0 after a planet cut.

In this engine the document store IS the visibility boundary: a
deleted object is a doc that is absent (tombstoned by the replication
follower — streaming.py applies an empty ``spans`` array as a delete).
The check therefore runs at the docs level, where deletions are
observable: a way doc whose noderef spans point at node doc_ids with
no live doc, and relation docs whose member spans point at absent
node/way docs, are exactly the reference's ``visible AND NOT
visible`` joins re-expressed over the document table.  Like the
reference, the check is NOT part of the default suite (pipeline
registry unchanged); it is exposed for follower-maintained datasets
where deletions actually occur.

Spark shape: one explode of the ref spans + left-anti joins against
the live id sets.  No geometry, no tiling, no Python — at 100 TB this
is a pair of shuffle-on-id anti joins that AQE plans as sort-merge
(or broadcast, when the referencing side is a small diff scope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MSG_10 = "There are one or more deleted nodes used in this way."
MSG_11 = "There are one or more deleted nodes used in this relation."
MSG_12 = "There are one or more deleted ways used in this relation."


def _exploded_refs(docs: DataFrame) -> DataFrame:
    """(object_type, id, kind, text) for the reference-carrying spans."""
    s = docs.select(
        F.split("doc_id", "/").getItem(0).alias("object_type"),
        F.split("doc_id", "/").getItem(1).cast("long").alias("id"),
        F.explode("spans").alias("span"),
    )
    return s.select(
        "object_type",
        "id",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
    ).filter(F.col("kind").isin("noderef", "member"))


def run_docs(docs: DataFrame) -> DataFrame:
    """_tmp_errors-shaped rows (error_type, object_type, object_id,
    msgid) for refs from live docs to absent (deleted) docs."""
    ex = _exploded_refs(docs)
    live_nodes = (
        docs.filter(F.col("doc_id").startswith("node/"))
        .select(F.split("doc_id", "/").getItem(1).cast("long").alias("ref_id"))
    )
    live_ways = (
        docs.filter(F.col("doc_id").startswith("way/"))
        .select(F.split("doc_id", "/").getItem(1).cast("long").alias("ref_id"))
    )

    # way → node refs (0010_deleted_items.php:4-9)
    noderefs = ex.filter(F.col("kind") == "noderef").select(
        F.col("id").alias("object_id"),
        F.split("text", "\t").getItem(1).cast("long").alias("ref_id"),
    )
    e10 = (
        noderefs.join(live_nodes, "ref_id", "left_anti")
        .select("object_id")
        .distinct()
        .select(
            F.lit(10).alias("error_type"),
            F.lit("way").alias("object_type"),
            "object_id",
            F.lit(MSG_10).alias("msgid"),
        )
    )

    # relation → node/way members (0010_deleted_items.php:12-27)
    members = ex.filter(F.col("kind") == "member").select(
        F.col("id").alias("object_id"),
        F.split("text", "\t").getItem(1).alias("member_type"),
        F.split("text", "\t").getItem(2).cast("long").alias("ref_id"),
    )

    def rel_clause(mtype: str, live: DataFrame, etype: int, msg: str) -> DataFrame:
        return (
            members.filter(F.col("member_type") == mtype)
            .join(live, "ref_id", "left_anti")
            .select("object_id")
            .distinct()
            .select(
                F.lit(etype).alias("error_type"),
                F.lit("relation").alias("object_type"),
                "object_id",
                F.lit(msg).alias("msgid"),
            )
        )

    e11 = rel_clause("N", live_nodes, 11, MSG_11)
    e12 = rel_clause("W", live_ways, 12, MSG_12)
    return e10.unionByName(e11).unionByName(e12)


# deterministic victim rule for the driver-verified planted entry
# (__spark_entry__.kr_0010 / oracles.oracle_0010_deleted): the K
# smallest referenced ids per clause, deleted before the scan.
VICTIM_WAY_NODES = 6  # smallest node ids used by ways
VICTIM_REL_NODES = 6  # smallest node-type relation members
VICTIM_REL_WAYS = 4  # smallest way-type relation members


def planted_victims(docs: DataFrame) -> DataFrame:
    """doc_ids deleted by the planted entry — same rule as the oracle
    SQL (oracles.oracle_0010_deleted), derived independently here."""
    ex = _exploded_refs(docs)
    noderefs = ex.filter(F.col("kind") == "noderef").select(
        F.split("text", "\t").getItem(1).cast("long").alias("ref_id")
    )
    members = ex.filter(F.col("kind") == "member").select(
        F.split("text", "\t").getItem(1).alias("member_type"),
        F.split("text", "\t").getItem(2).cast("long").alias("ref_id"),
    )
    v1 = (
        noderefs.distinct().orderBy("ref_id").limit(VICTIM_WAY_NODES)
        .select(F.concat(F.lit("node/"), F.col("ref_id")).alias("doc_id"))
    )
    v2 = (
        members.filter(F.col("member_type") == "N")
        .select("ref_id").distinct().orderBy("ref_id").limit(VICTIM_REL_NODES)
        .select(F.concat(F.lit("node/"), F.col("ref_id")).alias("doc_id"))
    )
    v3 = (
        members.filter(F.col("member_type") == "W")
        .select("ref_id").distinct().orderBy("ref_id").limit(VICTIM_REL_WAYS)
        .select(F.concat(F.lit("way/"), F.col("ref_id")).alias("doc_id"))
    )
    return v1.unionByName(v2).unionByName(v3).distinct()


def run_planted(docs: DataFrame) -> DataFrame:
    """Delete the deterministic victim set, then scan — the positive
    path of the check on a world where nothing is otherwise deleted."""
    live = docs.join(planted_victims(docs), "doc_id", "left_anti")
    return run_docs(live)
