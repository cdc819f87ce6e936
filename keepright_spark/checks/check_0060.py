"""Check 0060 — deprecated tags.

Reference: /root/reference/checks/0060_deprecated_tags.php:118-152.
One pass per replacement rule × object type; k/v matched with SQL
LIKE (v='*' = any).  The insert-ignore PK keeps the FIRST matching
rule per object (rules are pre-sorted by key,value), so we join tags
against the broadcast rule table and keep the minimum rule index.

msgid: "This $1 uses deprecated tag '$2=$3'" plus
". Please use &quot;$4&quot; instead!" when a replacement exists (the
''-pairs in the PHP source are SQL quote escapes, so the stored text
carries single quotes).  txt1=object_type, txt2=html(k), txt3=html(v),
txt4=replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..codec import OsmViews
from ..data_tables import DEPRECATED_RULES
from ..errors import finish_errors
from ..lib import html_escape, tags_of

MSG_BASE = "This $1 uses deprecated tag '$2=$3'"
MSG_REPL = MSG_BASE + ". Please use &quot;$4&quot; instead!"


def _rules_df(spark, wild: bool):
    """Rule table split by whether ``rk`` carries a LIKE wildcard
    (``_``/``%``): wildcard-free keys hash-join on plain equality
    (k LIKE 'literal' ≡ k = 'literal'); only the wildcard keys pay
    the broadcast nested-loop LIKE join.  On the dense world this
    cuts the per-tag pattern evaluations ~5× (89 → 18) and moves the
    bulk of the check into an ordinary broadcast hash join."""
    rows = [
        (idx, k, None if v == "*" else v, repl, len(repl.strip()) > 1)
        for idx, k, v, repl in DEPRECATED_RULES
        if (("_" in k) or ("%" in k)) == wild
    ]
    return spark.createDataFrame(
        rows, "rule_idx int, rk string, rv string, repl string, has_repl boolean"
    )


def run(v: OsmViews) -> DataFrame:
    spark = v.nodes.sparkSession
    rules_eq = F.broadcast(_rules_df(spark, wild=False))
    rules_like = F.broadcast(_rules_df(spark, wild=True))
    out = None
    for otype in ("node", "way", "relation"):
        tags = tags_of(v, otype)
        j_eq = tags.join(rules_eq, F.col("k") == rules_eq.rk).filter(
            rules_eq.rv.isNull() | F.like(F.col("v"), rules_eq.rv)
        )
        j_like = tags.join(
            rules_like,
            F.like(F.col("k"), rules_like.rk)
            & (rules_like.rv.isNull() | F.like(F.col("v"), rules_like.rv)),
        )
        j = j_eq.unionByName(j_like)
        w = Window.partitionBy("tile", "id").orderBy("rule_idx")
        first = j.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
        e = first.select(
            "tile",
            F.col("id").alias("object_id"),
            F.lit(otype).alias("object_type"),
            F.when(F.col("has_repl"), F.lit(MSG_REPL))
            .otherwise(F.lit(MSG_BASE))
            .alias("msgid"),
            F.lit(otype).alias("txt1"),
            html_escape(F.col("k")).alias("txt2"),
            html_escape(F.col("v")).alias("txt3"),
            F.when(F.col("has_repl"), F.trim(F.col("repl")))
            .otherwise(F.lit(""))
            .alias("txt4"),
        )
        out = e if out is None else out.unionByName(e)
    return finish_errors(out, 60, None, None)


# object types this check can emit (error_view resolution pruning)
EMITS = ('node', 'way', 'relation')
