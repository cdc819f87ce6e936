"""keepright_spark — a PySpark-native spatial-join + tiling engine.

Re-expresses the query semantics of the keepright OSM data-quality
engine (reference at /root/reference, cited per-module as file:line)
as idiomatic Spark DataFrame plans: cell-indexed spatial joins,
tile partitioning with margin duplication + half-open clipping,
vectorized (Arrow/pandas) geometry UDFs, and an error-lifecycle MERGE.

Input contract (BASELINE.json input_hint): one table of interleaved
text + media documents::

    docs(doc_id string, spans array<struct<kind,text,media_ref,offset>>)

The engine decodes spans into relational views (nodes / ways /
relations / tags), never rewrites documents, and emits the keepright
error_view row format.
"""

__version__ = "0.1.0"
