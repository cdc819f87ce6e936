"""Multimodal operators: census/dedup/integrity + decode plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from keepright_spark import media, pipeline


def test_media_view_and_census(spark, tiny_dir):
    tm = media.tiled_media(spark, tiny_dir)
    assert tm.count() > 0
    c = media.media_census(tm)
    rows = c.collect()
    assert {r["mime"] for r in rows} <= {"image/jpeg", "audio/ogg", "video/mp4"}
    assert all(r["n_spans"] >= r["n_docs"] for r in rows)


def test_media_anomaly_fixtures(spark, tiny_dir):
    """The generator plants shared refs (oid%101==0) and dangling refs
    (oid%103==0); the operators must surface them."""
    tm = media.tiled_media(spark, tiny_dir)
    dups = media.media_dup_refs(tm)
    integ = media.media_integrity(tm)
    assert dups.filter(F.col("media_ref").startswith("media://shared")).count() > 0
    kinds = {r["violation"] for r in integ.select("violation").distinct().collect()}
    assert "dangling_ref" in kinds and "mime_conflict" in kinds


def test_decode_plumbing(spark, tiny_dir):
    tm = media.tiled_media(spark, tiny_dir).limit(20)

    # the stub decoder raises at the codec boundary
    with pytest.raises(Exception, match="NotImplementedError|media byte"):
        media.decode_media(tm).collect()

    # a plugged-in decoder flows through the same mapInPandas plumbing
    def fake_decoder(pdf):
        import pandas as pd

        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "mime": pdf["mime"],
                "width": 64,
                "height": 64,
                "n_frames": 1,
                "feature": [[0.0, 1.0]] * len(pdf),
            }
        )

    out = media.decode_media(tm, fake_decoder)
    rows = out.collect()
    assert len(rows) == 20
    assert rows[0]["feature"] == [0.0, 1.0]
    assert dict(out.dtypes)["feature"] == "array<float>"
