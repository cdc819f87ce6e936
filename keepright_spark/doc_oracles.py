"""DuckDB oracle SQL for the ``docops`` operators.

These run on the driver's pre-registered ``documents`` /
``embeddings`` views (TESTDATA.md: the sf parquet tables are exposed
under their bare names), so unlike the OSM-check oracles they take no
dataset dir.  Every constant (hash widths, minhash coefficients, LSH
planes, caps, thresholds) is imported from ``docops`` and inlined
into the SQL, so engine and oracle cannot drift apart.

Cross-engine building blocks (validated on DuckDB 1.0 / Spark 4):

* h32(s)   = ('0x'||substr(md5(s),1,8))::BIGINT
             ≙ Spark conv(substring(md5(s),1,8),16,10)::long
* tokens   = list_filter(string_split_regex(lower(x),'[^a-z0-9]+'),
             t -> t <> '')   ≙ Spark filter(split(lower(x),...))
* int/int division yields DOUBLE in both engines
* struct comparison is field-order lexicographic in both engines
"""

from __future__ import annotations

from .docops import (
    ANN_PLANES,
    BPE_PRETOKEN_RE,
    DUP_ROSTER_CAP,
    EMB_DIM,
    IVF_NPROBE,
    IVF_SCALE,
    IVF_SEED_MOD,
    KNN_K,
    KNN_QUERY_MOD,
    LANG_MARKERS,
    LSH_BANDS,
    LSH_BUCKET_CAP,
    MERSENNE31,
    MINHASH_K,
    NEARDUP_JACCARD,
    NGRAM_DF_CAP,
    ROLL_BASE,
    SHINGLE_K,
    SIMHASH_BANDS,
    SIMHASH_BITS,
    SIMHASH_BUCKET_CAP,
    SIMHASH_HAMMING_MAX,
    STOPWORDS,
    ann_planes,
    ann_probe_offsets,
    minhash_coeffs,
)

TOKS = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
    "t -> t <> '')"
)


def _shingle_hashes_sql(toks: str = "toks") -> str:
    """Distinct sorted 32-bit shingle hashes mod MERSENNE31."""
    k = SHINGLE_K
    parts = " || ' ' || ".join(f"{toks}[i+{j}]" for j in range(k))
    return (
        f"list_sort(list_distinct(list_transform("
        f"CASE WHEN len({toks}) >= {k} "
        f"THEN range(1, len({toks}) - {k - 2}) ELSE [] END, "
        f"i -> ('0x'||substr(md5({parts}),1,8))::BIGINT % {MERSENNE31})))"
    )


def oracle_doc_stats(d: str) -> str:
    stop_list = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    return f"""
WITH t AS (SELECT doc_id, text, {TOKS} AS toks FROM documents)
SELECT doc_id,
  length(text) AS n_chars,
  len(toks) AS n_tokens,
  round(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
        / greatest(length(text), 1), 6) AS punct_ratio,
  round(length(regexp_replace(text, '[^A-Z]', '', 'g'))
        / greatest(length(text), 1), 6) AS upper_ratio,
  round(len(list_filter(toks, t -> list_contains({stop_list}, t)))
        / greatest(len(toks), 1), 6) AS stop_ratio,
  round(coalesce(list_aggregate(list_transform(toks, t -> length(t)),
                                'sum'), 0)
        / greatest(len(toks), 1), 6) AS mean_tok_len,
  round(
    (CASE WHEN len(toks) BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END)
    * (1.0 - least(round(length(regexp_replace(text, '[a-zA-Z0-9 ]', '',
                                               'g'))
                         / greatest(length(text), 1), 6) * 4, 1.0))
    * (0.5 + least(round(len(list_filter(toks,
                             t -> list_contains({stop_list}, t)))
                         / greatest(len(toks), 1), 6) * 5, 0.5)),
    6) AS quality
FROM t
"""


def oracle_doc_token_stats(d: str) -> str:
    # the exact engine-side pattern, SQL-quoted; Java regex and RE2
    # are both leftmost-first so the two engines pre-tokenize
    # identically (docops.BPE_PRETOKEN_RE docstring + test cases)
    pat = BPE_PRETOKEN_RE.replace("'", "''")
    return f"""
WITH t AS (
  SELECT doc_id, text,
    list_filter(string_split_regex(text, '[ \t\n\r]+'),
                x -> x <> '') AS ws,
    list_filter(regexp_extract_all(text, '{pat}'),
                m -> regexp_matches(m, '[^ \t\n\r]')) AS bpe
  FROM documents)
SELECT doc_id,
  len(ws)::BIGINT AS n_ws_tokens,
  len(bpe)::BIGINT AS n_bpe_tokens,
  len(list_distinct(bpe))::BIGINT AS n_bpe_distinct,
  round(length(text) / greatest(len(bpe), 1), 6) AS chars_per_bpe,
  round(len(bpe) / greatest(len(ws), 1), 6) AS bpe_per_ws
FROM t
"""


def oracle_doc_langid(d: str) -> str:
    structs = []
    for idx, (_lang, markers) in enumerate(LANG_MARKERS):
        mlist = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
        structs.append(
            f"{{'s': len(list_filter(toks, "
            f"t -> list_contains({mlist}, t))), 'ni': {-idx}}}"
        )
    langs = "[" + ", ".join(f"'{lang}'" for lang, _ in LANG_MARKERS) + "]"
    return f"""
WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
s AS (SELECT doc_id, list_max([{", ".join(structs)}]) AS best FROM t)
SELECT doc_id,
  CASE WHEN best.s <= 0 THEN 'und'
       ELSE ({langs})[-best.ni + 1] END AS pred_lang,
  CAST(best.s AS BIGINT) AS marker_hits
FROM s
"""


def oracle_doc_fingerprint(d: str) -> str:
    return f"""
WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents)
SELECT doc_id,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(toks,
        t -> ('0x'||substr(md5(t),1,8))::BIGINT % {MERSENNE31})),
    (a, h) -> (a * {ROLL_BASE} + h) % {MERSENNE31}) AS fingerprint,
  CAST(len(list_distinct(toks)) AS BIGINT) AS vocab_size
FROM t
"""


def _simhash_expr() -> str:
    """The SIMHASH_BITS-bit fingerprint as one SQL expression over the
    shingle-hash list column ``hs`` (shared by oracle_doc_simhash and
    oracle_doc_simhash_neardups)."""
    bit_terms = []
    for j in range(SIMHASH_BITS):
        vote = (
            f"coalesce(list_aggregate(list_transform(hs, "
            f"h -> CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END), "
            f"'sum'), 0)"
        )
        bit_terms.append(
            f"(CASE WHEN {vote} > 0 THEN CAST({2 ** j} AS BIGINT) "
            f"ELSE 0 END)"
        )
    return " + ".join(bit_terms)


def oracle_doc_simhash(d: str) -> str:
    return f"""
WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
h AS (SELECT doc_id, {_shingle_hashes_sql()} AS hs FROM t)
SELECT doc_id,
  {_simhash_expr()} AS simhash,
  CAST(len(hs) AS BIGINT) AS n_shingles
FROM h
"""


def _simhash_banded_cte() -> str:
    """CTE chain t → h → s → banded (doc_id, simhash, band, bkey)."""
    width = SIMHASH_BITS // SIMHASH_BANDS
    return f"""t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
h AS (SELECT doc_id, {_shingle_hashes_sql()} AS hs FROM t),
s AS (SELECT doc_id, {_simhash_expr()} AS simhash FROM h
      WHERE len(hs) > 0),
banded AS (SELECT doc_id, simhash, bb.range AS band,
  (simhash >> (bb.range * {width})) & {(1 << width) - 1} AS bkey
  FROM s, range({SIMHASH_BANDS}) bb)"""


def oracle_doc_simhash_neardups(d: str) -> str:
    return f"""
WITH {_simhash_banded_cte()},
capped AS (SELECT * FROM (SELECT *, row_number() OVER
  (PARTITION BY band, bkey ORDER BY doc_id) AS rn FROM banded)
  WHERE rn <= {SIMHASH_BUCKET_CAP}),
pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
  a.simhash AS sa, b.simhash AS sb
  FROM capped a JOIN capped b
  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM pairs WHERE bit_count(xor(sa, sb)) <= {SIMHASH_HAMMING_MAX}
"""


def _exact_dups_sql(src: str) -> str:
    """Exact-dedup query body over a (doc_id, text) source CTE/view."""
    return f"""
t AS (SELECT doc_id,
  md5(coalesce(list_aggregate({TOKS}, 'string_agg', ' '), ''))
    AS content_hash FROM {src}),
r AS (SELECT content_hash, doc_id,
  row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn,
  count(*) OVER (PARTITION BY content_hash) AS total FROM t)
SELECT content_hash, CAST(max(total) AS BIGINT) AS n_docs,
  string_agg(doc_id, ',' ORDER BY doc_id) AS docs
FROM r WHERE rn <= {DUP_ROSTER_CAP}
GROUP BY content_hash HAVING max(total) > 1
"""


def oracle_doc_exact_dups(d: str) -> str:
    return "WITH " + _exact_dups_sql("documents")


def _planted_sql() -> str:
    """CTEs deriving the planted-duplicate corpus (docops.
    planted_dup_docs): one clone per h32(doc_id)%MOD==0 doc plus
    PLANT_BIG_GROUP clones of the min-doc_id doc."""
    from .docops import PLANT_BIG_GROUP, PLANT_DUP_MOD

    return f"""
pbase AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents),
pclones AS (SELECT doc_id || '#dup' AS doc_id, text FROM pbase
  WHERE ('0x'||substr(md5(doc_id),1,8))::BIGINT % {PLANT_DUP_MOD} = 0),
pbig AS (SELECT b.doc_id || '#big' || lpad(CAST(i.range AS VARCHAR), 2, '0')
    AS doc_id, b.text
  FROM pbase b, range(1, {PLANT_BIG_GROUP + 1}) i
  WHERE b.doc_id = (SELECT min(doc_id) FROM pbase)),
planted AS (SELECT * FROM pbase UNION ALL SELECT * FROM pclones
  UNION ALL SELECT * FROM pbig)"""


def oracle_doc_exact_dups_planted(d: str) -> str:
    return "WITH " + _planted_sql() + ",\n" + _exact_dups_sql("planted")


def _minhash_banded_cte(src: str = "documents") -> str:
    """CTE chain t → h → sigs → banded (doc_id, hs, band, bkey) over
    a (doc_id, text) source — shared by the near-dup oracle, the cap
    census, and the dedup-group oracle (which runs it over the
    planted corpus)."""
    r = MINHASH_K // LSH_BANDS
    sig_cols = ", ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {MERSENNE31}))"
        f" AS sig{i}"
        for i, (a, b) in enumerate(minhash_coeffs())
    )
    band_selects = []
    for band in range(LSH_BANDS):
        key = " || '_' || ".join(
            f"CAST(sig{band * r + j} AS VARCHAR)" for j in range(r)
        )
        band_selects.append(
            f"SELECT doc_id, hs, {band} AS band, md5({key}) AS bkey FROM sigs"
        )
    banded = " UNION ALL ".join(band_selects)
    return f"""t AS (SELECT doc_id, {TOKS} AS toks FROM {src}),
h AS (SELECT doc_id, {_shingle_hashes_sql()} AS hs FROM t),
sigs AS (SELECT doc_id, hs, {sig_cols} FROM h WHERE len(hs) > 0),
banded AS ({banded})"""


def _minhash_pairs_sql(src: str = "documents") -> str:
    """CTE chain ending in ``mdup (doc_a, doc_b, jaccard)`` — the
    exact-Jaccard-scored MinHash candidate pairs over ``src``
    (filter on jaccard at the use site)."""
    return f"""{_minhash_banded_cte(src)},
capped AS (SELECT * FROM (
  SELECT *, row_number() OVER (PARTITION BY band, bkey ORDER BY doc_id)
    AS rn FROM banded) WHERE rn <= {LSH_BUCKET_CAP}),
mpairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM capped a JOIN capped b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
mdup AS (SELECT p.doc_a, p.doc_b,
  round(len(list_intersect(ha.hs, hb.hs))
        / greatest(len(list_distinct(list_concat(ha.hs, hb.hs))), 1), 6)
    AS jaccard
  FROM mpairs p
  JOIN h ha ON ha.doc_id = p.doc_a
  JOIN h hb ON hb.doc_id = p.doc_b)"""


def oracle_doc_minhash_neardups(d: str) -> str:
    return f"""
WITH {_minhash_pairs_sql()}
SELECT doc_a, doc_b, jaccard FROM mdup
WHERE jaccard >= {NEARDUP_JACCARD}
"""


def _ngram_postings_cte() -> str:
    """CTE chain t → h → posts → dfc → rare: the discriminative-
    shingle inverted index of docops._ngram_postings + the DF filter."""
    return f"""t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
h AS (SELECT doc_id, {_shingle_hashes_sql()} AS hs FROM t),
posts AS (SELECT doc_id, hs, UNNEST(hs) AS sh FROM h WHERE len(hs) > 0),
dfc AS (SELECT sh, count(*) AS df FROM posts GROUP BY sh),
rare AS (SELECT p.doc_id, p.hs, p.sh FROM posts p JOIN dfc USING (sh)
  WHERE df <= {NGRAM_DF_CAP})"""


def oracle_doc_ngram_jaccard_neardups(d: str) -> str:
    return f"""
WITH {_ngram_postings_cte()},
pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM rare a JOIN rare b ON a.sh = b.sh AND a.doc_id < b.doc_id),
scored AS (SELECT p.doc_a, p.doc_b,
  round(len(list_intersect(ha.hs, hb.hs))
        / greatest(len(list_distinct(list_concat(ha.hs, hb.hs))), 1), 6)
    AS jaccard
  FROM pairs p
  JOIN h ha ON ha.doc_id = p.doc_a
  JOIN h hb ON hb.doc_id = p.doc_b)
SELECT * FROM scored WHERE jaccard >= {NEARDUP_JACCARD}
"""


def _dot_sql(a: str, b_literal_or_col: str) -> str:
    """Sequential left-to-right double dot product (matches Spark's
    aggregate-over-zip_with fold order)."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {EMB_DIM + 1}), "
        f"i -> {a}[i]::DOUBLE * {b_literal_or_col}[i]::DOUBLE)), "
        f"(acc, x) -> acc + x)"
    )


_NORM_CTE = f"""
base AS (SELECT vec_id, embedding,
  sqrt({_dot_sql("embedding", "embedding")}) AS norm
  FROM embeddings)
"""


def oracle_emb_knn_brute(d: str) -> str:
    return f"""
WITH {_NORM_CTE},
q AS (SELECT vec_id AS q_id, embedding AS q_emb, norm AS q_norm
      FROM base WHERE vec_id % {KNN_QUERY_MOD} = 0),
scored AS (SELECT q.q_id, c.vec_id AS n_id,
  round({_dot_sql("q.q_emb", "c.embedding")}
        / greatest(q.q_norm * c.norm, 1e-12), 6) AS score
  FROM q JOIN base c ON q.q_id <> c.vec_id),
ranked AS (SELECT *, row_number() OVER (
    PARTITION BY q_id ORDER BY score DESC, n_id ASC) AS rank
  FROM scored)
SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, score
FROM ranked WHERE rank <= {KNN_K}
"""


def _bucket_sql() -> str:
    terms = []
    for p, plane in enumerate(ann_planes()):
        lit = "[" + ", ".join(str(v) for v in plane) + "]"
        terms.append(
            f"(CASE WHEN {_dot_sql('embedding', lit)} > 0 "
            f"THEN {2 ** p} ELSE 0 END)"
        )
    return " + ".join(terms)


def oracle_emb_ann_lsh(d: str) -> str:
    masks = "[" + ", ".join(str(m) for m in ann_probe_offsets()) + "]"
    return f"""
WITH {_NORM_CTE},
bucketed AS (SELECT vec_id, embedding, norm,
  {_bucket_sql()} AS bucket FROM base),
q AS (SELECT vec_id AS q_id, embedding AS q_emb, norm AS q_norm, bucket
      FROM bucketed WHERE vec_id % {KNN_QUERY_MOD} = 0),
probes AS (SELECT q_id, q_emb, q_norm, xor(bucket, m.mask) AS bucket
      FROM q CROSS JOIN (SELECT unnest({masks}) AS mask) m),
scored AS (SELECT p.q_id, p.bucket, c.vec_id AS n_id,
  round({_dot_sql("p.q_emb", "c.embedding")}
        / greatest(p.q_norm * c.norm, 1e-12), 6) AS score
  FROM probes p JOIN bucketed c
    ON p.bucket = c.bucket AND p.q_id <> c.vec_id),
ranked AS (SELECT *, row_number() OVER (
    PARTITION BY q_id ORDER BY score DESC, n_id ASC) AS rank
  FROM scored)
SELECT q_id, CAST(bucket AS BIGINT) AS bucket,
  CAST(rank AS BIGINT) AS rank, n_id, score
FROM ranked WHERE rank <= {KNN_K}
"""


def oracle_emb_cosine_neardups(d: str) -> str:
    from .docops import COSINE_NEARDUP, EMB_DUP_BUCKET_CAP

    masks = "[" + ", ".join(str(m) for m in ann_probe_offsets()) + "]"
    return f"""
WITH {_NORM_CTE},
bucketed AS (SELECT vec_id, embedding, norm,
  {_bucket_sql()} AS bucket FROM base),
capped AS (SELECT * FROM (SELECT *, row_number() OVER
  (PARTITION BY bucket ORDER BY vec_id) AS rn FROM bucketed)
  WHERE rn <= {EMB_DUP_BUCKET_CAP}),
probed AS (SELECT a.bucket AS ba, a.vec_id, a.embedding, a.norm,
  xor(a.bucket, m.mask) AS bucket
  FROM capped a CROSS JOIN (SELECT unnest({masks}) AS mask) m),
pairs AS (SELECT least(a.ba, b.bucket) AS bucket,
  a.vec_id AS vec_a, b.vec_id AS vec_b,
  round({_dot_sql("a.embedding", "b.embedding")}
        / greatest(a.norm * b.norm, 1e-12), 6) AS cosine
  FROM probed a JOIN capped b
  ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT vec_a, vec_b, CAST(bucket AS BIGINT) AS bucket, cosine
FROM pairs WHERE cosine >= {COSINE_NEARDUP}
"""


def oracle_emb_ann_ivf(d: str) -> str:
    """Independent SQL derivation of docops.emb_ann_ivf: the same
    deterministic medoid seeds, one Lloyd step over exact scaled-long
    sums, nprobe-nearest-list search — assignment via row_number
    windows where the engine uses min-of-struct (equivalent order:
    1 - score is strictly monotonic and ties break on cid)."""
    pos_range = f"(SELECT unnest(range(1, {EMB_DIM + 1})) AS pos)"
    return f"""
WITH {_NORM_CTE},
seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
  embedding AS c_emb, norm AS c_norm
  FROM base WHERE vec_id % {IVF_SEED_MOD} = 1),
a0 AS (SELECT b.vec_id, b.embedding, s.cid,
  round({_dot_sql("b.embedding", "s.c_emb")}
        / greatest(b.norm * s.c_norm, 1e-12), 6) AS score
  FROM base b CROSS JOIN seeds s),
best0 AS (SELECT vec_id, embedding, cid AS cell FROM
  (SELECT *, row_number() OVER (PARTITION BY vec_id
     ORDER BY score DESC, cid ASC) AS rn FROM a0) WHERE rn = 1),
comp AS (SELECT cell, i.pos, embedding[i.pos]::DOUBLE AS x
  FROM best0 CROSS JOIN {pos_range} i),
cent AS (SELECT cell, pos,
  sum(CAST(round(x * {IVF_SCALE}) AS BIGINT))
    / (count(*) * {IVF_SCALE}.0) AS c
  FROM comp GROUP BY cell, pos),
refined AS (SELECT cell AS cid, c_emb,
    sqrt({_dot_sql("c_emb", "c_emb")}) AS c_norm
  FROM (SELECT cell, list(c ORDER BY pos) AS c_emb
        FROM cent GROUP BY cell)),
a1 AS (SELECT b.vec_id, b.embedding, b.norm, r.cid,
  round({_dot_sql("b.embedding", "r.c_emb")}
        / greatest(b.norm * r.c_norm, 1e-12), 6) AS score
  FROM base b CROSS JOIN refined r),
lists AS (SELECT vec_id, embedding, norm, cid AS cell FROM
  (SELECT *, row_number() OVER (PARTITION BY vec_id
     ORDER BY score DESC, cid ASC) AS rn FROM a1) WHERE rn = 1),
qs AS (SELECT q.vec_id AS q_id, q.embedding AS q_emb,
    q.norm AS q_norm, r.cid,
  round({_dot_sql("q.embedding", "r.c_emb")}
        / greatest(q.norm * r.c_norm, 1e-12), 6) AS c_score
  FROM base q CROSS JOIN refined r
  WHERE q.vec_id % {KNN_QUERY_MOD} = 0),
probes AS (SELECT q_id, q_emb, q_norm, cid AS cell FROM
  (SELECT *, row_number() OVER (PARTITION BY q_id
     ORDER BY c_score DESC, cid ASC) AS rn FROM qs)
  WHERE rn <= {IVF_NPROBE}),
scored AS (SELECT p.q_id, p.cell, c.vec_id AS n_id,
  round({_dot_sql("p.q_emb", "c.embedding")}
        / greatest(p.q_norm * c.norm, 1e-12), 6) AS score
  FROM probes p JOIN lists c
    ON p.cell = c.cell AND p.q_id <> c.vec_id),
ranked AS (SELECT *, row_number() OVER (
    PARTITION BY q_id ORDER BY score DESC, n_id ASC) AS rank
  FROM scored)
SELECT q_id, CAST(cell AS BIGINT) AS cell,
  CAST(rank AS BIGINT) AS rank, n_id, score
FROM ranked WHERE rank <= {KNN_K}
"""


def _overflow_select(counts_cte_tail: str, name: str, cap: int) -> str:
    """One census row over a subquery ending in a CTE ``c`` with a
    per-bucket count column ``n`` (mirrors docops._bucket_overflow)."""
    return f"""SELECT * FROM (WITH {counts_cte_tail}
  SELECT '{name}' AS operator, CAST({cap} AS BIGINT) AS cap,
    CAST(coalesce(sum(CASE WHEN n > {cap} THEN 1 END), 0) AS BIGINT)
      AS buckets_over,
    CAST(coalesce(sum(CASE WHEN n > {cap} THEN n - {cap} END), 0) AS BIGINT)
      AS rows_beyond_cap
  FROM c)"""


def oracle_doc_cap_census(d: str) -> str:
    from .docops import EMB_DUP_BUCKET_CAP

    minhash = _overflow_select(
        _minhash_banded_cte()
        + ",\nc AS (SELECT count(*) AS n FROM banded GROUP BY band, bkey)",
        "minhash_lsh", LSH_BUCKET_CAP,
    )
    simhash = _overflow_select(
        _simhash_banded_cte()
        + ",\nc AS (SELECT count(*) AS n FROM banded GROUP BY band, bkey)",
        "simhash_band", SIMHASH_BUCKET_CAP,
    )
    embc = _overflow_select(
        _NORM_CTE
        + f",\nbucketed AS (SELECT vec_id, {_bucket_sql()} AS bucket"
        + " FROM base),\nc AS (SELECT count(*) AS n FROM bucketed"
        + " GROUP BY bucket)",
        "emb_cosine_bucket", EMB_DUP_BUCKET_CAP,
    )
    exact = _overflow_select(
        _planted_sql()
        + f""",
k AS (SELECT md5(coalesce(list_aggregate({TOKS}, 'string_agg', ' '), ''))
  AS content_hash FROM planted),
c AS (SELECT count(*) AS n FROM k GROUP BY content_hash)""",
        "exact_dup_roster", DUP_ROSTER_CAP,
    )
    ngram = _overflow_select(
        f"""t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
h AS (SELECT doc_id, {_shingle_hashes_sql()} AS hs FROM t),
posts AS (SELECT doc_id, UNNEST(hs) AS sh FROM h WHERE len(hs) > 0),
c AS (SELECT count(*) AS n FROM posts GROUP BY sh)""",
        "ngram_df_filter", NGRAM_DF_CAP,
    )
    return "\nUNION ALL\n".join([minhash, simhash, embc, exact, ngram])


def oracle_doc_dedup_groups(d: str) -> str:
    """Independent CC derivation of docops.doc_dedup_groups: the same
    edge set (exact-dup chain edges ∪ verified MinHash pairs over the
    planted corpus), components via a recursive transitive-closure
    CTE (min reachable doc_id) instead of the engine's pointer-
    jumping label propagation."""
    from .docops import NEARDUP_JACCARD as THR

    return f"""
WITH RECURSIVE {_planted_sql()},
{_minhash_pairs_sql("planted")},
near AS (SELECT doc_a, doc_b FROM mdup WHERE jaccard >= {THR}),
ek AS (SELECT doc_id,
  md5(coalesce(list_aggregate({TOKS}, 'string_agg', ' '), ''))
    AS content_hash FROM planted),
chain AS (SELECT prev AS doc_a, doc_id AS doc_b FROM (
  SELECT doc_id, lag(doc_id) OVER (
    PARTITION BY content_hash ORDER BY doc_id) AS prev FROM ek)
  WHERE prev IS NOT NULL),
allp AS (SELECT doc_a, doc_b FROM near
  UNION SELECT doc_a, doc_b FROM chain),
edges AS (SELECT doc_a AS s, doc_b AS t2 FROM allp
  UNION SELECT doc_b, doc_a FROM allp),
reach AS (SELECT s, t2 FROM edges
  UNION SELECT r.s, e.t2 FROM reach r JOIN edges e ON r.t2 = e.s),
lab AS (SELECT s AS doc_id, least(s, min(t2)) AS group_id
  FROM reach GROUP BY s)
SELECT doc_id, group_id,
  CAST(count(*) OVER (PARTITION BY group_id) AS BIGINT) AS group_size,
  CASE WHEN doc_id = group_id THEN 1 ELSE 0 END AS is_canonical
FROM lab
"""


def oracle_doc_keep(d: str) -> str:
    """Composed keep/drop verdict: quality + langid re-derived via
    their own oracle queries as CTE subqueries, near-dup losers from
    the verified MinHash pairs; reason codes in the same fixed
    (alphabetical) order as docops.doc_keep_decision."""
    from .docops import (
        KEEP_LANGS,
        KEEP_MAX_TOKENS,
        KEEP_MIN_TOKENS,
        KEEP_QUALITY_MIN,
    )

    langs = "[" + ", ".join(f"'{x}'" for x in KEEP_LANGS) + "]"
    return f"""
WITH stats AS ({oracle_doc_stats(d)}),
lang AS ({oracle_doc_langid(d)}),
losers AS (SELECT DISTINCT doc_b AS doc_id, 1 AS dupf
  FROM ({oracle_doc_minhash_neardups(d)})),
r AS (SELECT s.doc_id,
  list_filter([
    CASE WHEN NOT list_contains({langs}, l.pred_lang)
      THEN 'lang' END,
    CASE WHEN s.quality < {KEEP_QUALITY_MIN} THEN 'low_quality' END,
    CASE WHEN d2.dupf IS NOT NULL THEN 'near_dup' END,
    CASE WHEN s.n_tokens > {KEEP_MAX_TOKENS} THEN 'too_long' END,
    CASE WHEN s.n_tokens < {KEEP_MIN_TOKENS} THEN 'too_short' END
  ], x -> x IS NOT NULL) AS rl
  FROM stats s
  JOIN lang l USING (doc_id)
  LEFT JOIN losers d2 USING (doc_id))
SELECT doc_id,
  CASE WHEN len(rl) = 0 THEN 1 ELSE 0 END AS keep,
  coalesce(array_to_string(rl, ','), '') AS reasons
FROM r
"""


def oracle_doc_pack_sequences(d: str) -> str:
    """Single-engine (window) derivation of the two-level prefix sum
    in docops.doc_pack_sequences — DuckDB computes the same global
    token prefix directly; equality proves the bucket-parallel
    decomposition exact."""
    from .docops import PACK_BUDGET, PACK_NBUCKETS

    return f"""
WITH t AS (SELECT doc_id, CAST(len({TOKS}) AS BIGINT) AS n_tokens,
  ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT
    % {PACK_NBUCKETS} AS bucket
  FROM documents),
p AS (SELECT *, coalesce(sum(n_tokens) OVER (
    ORDER BY bucket, doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS gpre
  FROM t)
SELECT doc_id,
  CAST(floor(gpre / {PACK_BUDGET}) AS BIGINT) AS pack_id,
  CAST(gpre % {PACK_BUDGET} AS BIGINT) AS tok_start,
  n_tokens
FROM p
"""


def oracle_doc_split_assign(d: str) -> str:
    from .docops import SPLIT_TRAIN_PCT, SPLIT_VAL_PCT

    return f"""
WITH t AS (SELECT doc_id,
  CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 100
    AS INTEGER) AS split_bucket
  FROM documents)
SELECT doc_id, split_bucket,
  CASE WHEN split_bucket < {SPLIT_TRAIN_PCT} THEN 'train'
       WHEN split_bucket < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
       ELSE 'test' END AS split
FROM t
"""
