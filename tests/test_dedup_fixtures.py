"""Planted-fixture tests for the dedup family (VERDICT r3 #5/#7):

* the cap-overflow census reports non-zero drops when a bucket
  actually overflows (the no-silent-caps rule), cross-checked against
  the DuckDB oracle on the same fixture;
* the near-dup operators yield non-empty, correct output at
  *production-grade* thresholds (Jaccard ≥ 0.8 / cosine ≥ 0.95) on
  planted high-similarity pairs — the driver corpus only exercises the
  low test-scale thresholds.

Everything is deterministic: texts are templated, embeddings come from
a fixed-seed numpy generator.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from keepright_spark import doc_oracles, docops

WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango",
]


def _text(rng: np.random.Generator, n: int = 40) -> str:
    return " ".join(WORDS[i] for i in rng.integers(0, len(WORDS), n))


def _overflow_docs() -> pd.DataFrame:
    """70 identical docs (> LSH_BUCKET_CAP and > DUP_ROSTER_CAP in one
    bucket/group) + 30 distinct fillers."""
    rng = np.random.default_rng(7)
    rows = [("hot%03d" % i, "the same hot document text repeated " * 3)
            for i in range(70)]
    rows += [("doc%03d" % i, _text(rng)) for i in range(30)]
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _overflow_embs() -> pd.DataFrame:
    """70 identical vectors (one bucket > EMB_DUP_BUCKET_CAP) + 30
    random."""
    rng = np.random.default_rng(11)
    base = rng.normal(size=docops.EMB_DIM).astype("float32")
    rows = [(i, base.tolist()) for i in range(70)]
    rows += [
        (100 + i, rng.normal(size=docops.EMB_DIM).astype("float32").tolist())
        for i in range(30)
    ]
    return pd.DataFrame(rows, columns=["vec_id", "embedding"])


def test_cap_census_flags_overflow(spark):
    docs = spark.createDataFrame(_overflow_docs())
    emb = spark.createDataFrame(_overflow_embs())
    got = {
        r.operator: r.asDict()
        for r in docops.dedup_cap_census(docs, emb).collect()
    }
    # 70 identical docs: every minhash band bucket and simhash band
    # bucket holds all 70 (> cap 64); the exact-dup roster group holds
    # 70 + its planted clones (> cap 20); the identical vectors share
    # one LSH bucket (> cap 64)
    assert got["minhash_lsh"]["buckets_over"] >= docops.LSH_BANDS
    assert got["minhash_lsh"]["rows_beyond_cap"] >= docops.LSH_BANDS * (
        70 - docops.LSH_BUCKET_CAP
    )
    assert got["simhash_band"]["buckets_over"] >= docops.SIMHASH_BANDS
    assert got["emb_cosine_bucket"]["buckets_over"] >= 1
    assert got["emb_cosine_bucket"]["rows_beyond_cap"] >= (
        70 - docops.EMB_DUP_BUCKET_CAP
    )
    assert got["exact_dup_roster"]["buckets_over"] >= 1
    assert got["exact_dup_roster"]["rows_beyond_cap"] >= 70 - docops.DUP_ROSTER_CAP
    # 70 identical docs: every shingle's posting list is 70 > DF cap
    assert got["ngram_df_filter"]["buckets_over"] >= 1
    assert got["ngram_df_filter"]["rows_beyond_cap"] >= 70 - docops.NGRAM_DF_CAP

    # cross-engine: the DuckDB oracle on the same fixture agrees
    con = duckdb.connect()
    con.register("documents", _overflow_docs())
    con.register("embeddings", _overflow_embs())
    exp = {
        r[0]: r
        for r in con.execute(doc_oracles.oracle_doc_cap_census("x")).fetchall()
    }
    for op, row in got.items():
        assert exp[op] == (
            op, row["cap"], row["buckets_over"], row["rows_beyond_cap"]
        ), op


def _neardup_docs() -> pd.DataFrame:
    """12 planted high-Jaccard pairs (one token of ~40 mutated →
    shingle Jaccard ≈ 0.85) + 40 distinct fillers."""
    rng = np.random.default_rng(23)
    rows = []
    for i in range(12):
        toks = [WORDS[j] for j in rng.integers(0, len(WORDS), 40)]
        rows.append(("orig%03d" % i, " ".join(toks)))
        mut = list(toks)
        mut[5] = "zulu"
        rows.append(("copy%03d" % i, " ".join(mut)))
    rows += [("fill%03d" % i, _text(rng)) for i in range(40)]
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_minhash_neardups_at_production_threshold(spark):
    docs = spark.createDataFrame(_neardup_docs())
    out = docops.doc_minhash_neardups(docs, threshold=0.8).toPandas()
    # LSH banding finds most (not all: band-match prob ≈ 0.88/pair at
    # J≈0.85) of the planted pairs and nothing else at this threshold
    assert len(out) >= 6
    assert (out["jaccard"] >= 0.8).all()
    for _, r in out.iterrows():
        assert r.doc_a.replace("copy", "") == r.doc_b.replace("orig", "")


def test_ngram_jaccard_neardups_at_production_threshold(spark):
    """The sketch-free twin: candidate generation by shared rare
    shingles is exhaustive on this fixture (a J≈0.85 pair shares
    ~29 discriminative shingles), so unlike the probabilistic LSH
    banding it must find ALL planted pairs and nothing else."""
    docs = spark.createDataFrame(_neardup_docs())
    out = docops.doc_ngram_jaccard_neardups(docs, threshold=0.8).toPandas()
    assert len(out) == 12
    assert (out["jaccard"] >= 0.8).all()
    for _, r in out.iterrows():
        assert r.doc_a.replace("copy", "") == r.doc_b.replace("orig", "")


def _neardup_embs() -> pd.DataFrame:
    """30 planted cosine-≥0.95 pairs + 40 random vectors."""
    rng = np.random.default_rng(31)
    rows = []
    vid = 0
    for _ in range(30):
        base = rng.normal(size=docops.EMB_DIM)
        base /= np.linalg.norm(base)
        noise = rng.normal(size=docops.EMB_DIM) * 0.02
        near = base + noise
        near /= np.linalg.norm(near)
        rows.append((vid, base.astype("float32").tolist()))
        rows.append((vid + 1, near.astype("float32").tolist()))
        vid += 2
    for _ in range(40):
        v = rng.normal(size=docops.EMB_DIM)
        rows.append((vid, (v / np.linalg.norm(v)).astype("float32").tolist()))
        vid += 1
    return pd.DataFrame(rows, columns=["vec_id", "embedding"])


def test_cosine_neardups_at_production_threshold(spark):
    emb = spark.createDataFrame(_neardup_embs())
    out = docops.emb_cosine_neardups(emb, threshold=0.95).toPandas()
    # Hamming-3 multi-probe pair recall at cos≈0.99 is
    # Σ_{k≤3} C(8,k) p^k (1-p)^{8-k} ≈ 0.999 (p = θ/π ≈ 0.046);
    # single-bucket probing measured only ≈0.66 on these fixtures
    assert len(out) >= 27  # ≥0.9 of the 30 planted pairs
    assert (out["cosine"] >= 0.95).all()
    # planted pairs are (2k, 2k+1); nothing else reaches 0.95
    assert ((out["vec_b"] - out["vec_a"]) == 1).all()
    assert (out["vec_a"] % 2 == 0).all()
