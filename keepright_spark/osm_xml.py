"""OSM XML source — ingest raw ``.osm`` files into the engine's
interleaved-doc table (the osmosis-free path).

The reference feeds on planet files cut by an external osmosis
process into per-schema pbf + TSV dumps (planet.php:37-41,
updateDB.php:67-130); this source lets the Spark engine start from
the OSM XML itself: every ``<node>``/``<way>``/``<relation>`` element
becomes a (doc_id, spans) row via ``codec.encode_object`` — the SAME
span encoding the synthetic generator writes — so decode, tiling and
every check run unchanged downstream.

Scale shape: one XML file is one stream (exactly as it is for
osmosis), so parallelism is per FILE — the planet workflow ships
per-region extracts, and Spark fans out one task per file via the
binaryFile source.  Parsing runs inside ``mapInPandas`` over the
file-content batches with ``iterparse`` (element-at-a-time, O(1)
memory per element, ``elem.clear()`` after use).  This is Python at
the ingest boundary — the reference's equivalent stage is an external
osmosis JVM — not in any per-row query path.

Compressed planets: ``.osm.bz2``/``.osm.gz`` payloads are
decompressed in-stream per file (magic-byte sniff), matching the
reference's ``bzcat``-style piping.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from .codec import encode_object

DOCS_SCHEMA = (
    "doc_id string, spans array<struct<kind string, text string, "
    "media_ref string, offset int>>"
)

_MEMBER_TYPE = {"node": "N", "way": "W", "relation": "R"}


def _open_stream(content: bytes):
    """File-like over the (possibly compressed) XML payload."""
    import bz2
    import gzip
    import io

    if content[:3] == b"BZh":
        return bz2.BZ2File(io.BytesIO(content))
    if content[:2] == b"\x1f\x8b":
        return gzip.GzipFile(fileobj=io.BytesIO(content))
    return io.BytesIO(content)


def _parse_stream(stream) -> Iterator[tuple[str, list]]:
    """Yield (doc_id, spans) per OSM object, in document order."""
    import xml.etree.ElementTree as ET

    for _ev, elem in ET.iterparse(stream, events=("end",)):
        kind = elem.tag
        if kind not in ("node", "way", "relation"):
            continue
        oid = int(elem.get("id"))
        uid = int(elem.get("uid") or 0)
        ts = (elem.get("timestamp") or "1970-01-01T00:00:00").rstrip("Z")
        tags = [(t.get("k"), t.get("v")) for t in elem.findall("tag")]
        if kind == "node":
            doc_id, spans = encode_object(
                "node", oid, uid, ts, tags,
                coord=(float(elem.get("lat")), float(elem.get("lon"))),
            )
        elif kind == "way":
            noderefs = [
                (seq, int(nd.get("ref")))
                for seq, nd in enumerate(elem.findall("nd"), start=1)
            ]
            doc_id, spans = encode_object(
                "way", oid, uid, ts, tags, noderefs=noderefs
            )
        else:
            members = [
                (seq, _MEMBER_TYPE[m.get("type")], int(m.get("ref")),
                 m.get("role") or "")
                for seq, m in enumerate(elem.findall("member"), start=1)
            ]
            doc_id, spans = encode_object(
                "relation", oid, uid, ts, tags, members=members
            )
        yield doc_id, spans
        elem.clear()


def load_osm_xml(spark: SparkSession, path: str) -> DataFrame:
    """Docs table (doc_id, spans) from ``.osm``/``.osm.bz2``/``.osm.gz``
    files under ``path`` (glob ok) — one parse task per file."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches):
        for pdf in batches:
            ids: list = []
            span_lists: list = []
            for content in pdf["content"]:
                for doc_id, spans in _parse_stream(_open_stream(bytes(content))):
                    ids.append(doc_id)
                    span_lists.append(
                        [
                            {"kind": k, "text": t, "media_ref": m, "offset": o}
                            for k, t, m, o in spans
                        ]
                    )
            yield pd.DataFrame({"doc_id": ids, "spans": span_lists})

    return files.mapInPandas(parse, DOCS_SCHEMA)


def ingest_osm_xml(
    spark: SparkSession, xml_path: str, dataset_dir: str,
    n_files: int | None = None,
) -> str:
    """Materialize an engine dataset directory from raw OSM XML:
    writes ``<dataset_dir>/docs.parquet`` (the driver-contract docs
    table).  Tiles must be supplied via a MANIFEST.json in
    ``dataset_dir`` or the engine falls back to DEFAULT_TILES."""
    import os

    docs = load_osm_xml(spark, xml_path)
    if n_files:
        docs = docs.repartition(n_files)
    os.makedirs(dataset_dir, exist_ok=True)
    docs.write.mode("overwrite").parquet(
        os.path.join(dataset_dir, "docs.parquet")
    )
    return dataset_dir
