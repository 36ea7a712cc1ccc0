"""LLM-data-pipeline operators registered as driver-checkable queries:
dedup (exact / MinHash+LSH / SimHash / n-gram Jaccard / embedding
cosine / connected components), text analysis (language-ID, quality
scoring, token counting, fingerprinting).

The testdata ``documents`` table has no duplicates, so every dedup
query first PLANTS deterministic duplicates (the same construction in
Spark and in the oracle SQL):

* exact copies:  ``doc_id % 7 == 0`` → ``doc_id + 100000``, text verbatim
* near copies:   ``doc_id % 5 == 0`` → ``doc_id + 200000``, first token
  dropped (``regexp_replace(text, '^\\S+\\s*', '')``)

Cross-engine determinism: all hashes are md5-derived (``hash60``),
folds sequential, per-doc ratios rounded before decimal-stabilized
averaging (see ``mevi_spark.plans.registry`` docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from mevi_spark.functions import text_analysis as TA
from mevi_spark.functions.text import norm_text, normalize_text
from mevi_spark.operators import dedup as D
from mevi_spark.plans.registry import register
from mevi_spark.sources.io import load_table

# ---------------------------------------------------------------------------
# shared corpus-with-planted-duplicates (Spark + SQL twin definitions)


def _docs_spread(spark: SparkSession, sf_dir: str, *cols: str) -> DataFrame:
    """``documents`` scan spread to cluster width for the
    tokenizer-heavy consumers (regex split + higher-order-function
    metrics are the map-side CPU of the whole text tier; the fixture's
    single-row-group file otherwise plans ONE scan task). Identity at
    production listing widths — see ``sources/io.py::spread_small_scan``."""
    from mevi_spark.sources.io import spread_small_scan

    df = load_table(spark, sf_dir, "documents")
    if cols:
        df = df.select(*cols)
    return spread_small_scan(spark, df)


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mevi_spark.sources.io import spread_small_scan

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    exact = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    near = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.regexp_replace("text", r"^\S+\s*", "").alias("text"),
    )
    # every consumer of the planted corpus runs regex/md5-heavy per-row
    # work (tokenize, shingle, hash-keying); the documents fixture is a
    # single row group, so the union plans |branches| scan tasks and
    # the whole map stage serializes onto 3 cores (measured at the sf1
    # tier: the 5-gram shingle pass alone was ~5 s on 3 of 32 cores).
    # spread_small_scan is the scale-adaptive fix: identity whenever
    # the scan already plans at least cluster width (guide §2.5 input
    # skew / §2.6 idle capacity).
    return spread_small_scan(
        spark, docs.unionByName(exact).unionByName(near)
    )


_SQL_CORPUS = r"""
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 200000 AS doc_id, regexp_replace(text, '^\S+\s*', '') AS text
  FROM documents WHERE doc_id % 5 = 0
)
"""

# normalized text + whitespace tokens + distinct word 3-shingles
_SQL_TOKS = r"""
toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
  FROM corpus
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(t) < 3 THEN []::VARCHAR[]
              ELSE list_distinct(list_transform(range(1, len(t) - 1),
                     i -> array_to_string(list_slice(t, i, i + 2), ' ')))
         END AS s
  FROM toks
)
"""

# md5-derived 60-bit hash (DuckDB side of text_analysis.hash60)
def _h60(seed_expr: str, val_expr: str) -> str:
    return (
        f"('0x' || substring(md5({seed_expr} || '|' || {val_expr}), 1, 15))::BIGINT"
    )


# ---------------------------------------------------------------------------
# exact dedup


@register(
    "dedup_exact",
    oracle=f"""
WITH {_SQL_CORPUS},
k AS (
  SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS key
  FROM corpus)
SELECT MIN(doc_id) AS canonical_id, COUNT(*) AS n_dups,
       array_to_string(list_sort(list(doc_id)), ',') AS member_ids
FROM k GROUP BY key
""",
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5-of-normalized-text groups over the planted
    corpus — one shuffle, map-side hashing (the hash-groupBy tier of
    web-scale dedup)."""
    out = D.dedup_exact(_corpus(spark, sf_dir))
    return out.select(
        "canonical_id",
        "n_dups",
        F.concat_ws(
            ",", F.transform("member_ids", lambda x: x.cast("string"))
        ).alias("member_ids"),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH

_NH, _BANDS, _ROWS = 12, 4, 3  # 12 hashes, 4 bands × 3 rows

_SQL_MINHASH = f"""
hpair AS (
  SELECT doc_id, list_transform(s, x -> md5(x)) AS m FROM sh),
sig AS (
  SELECT doc_id,
         list_transform(range(0, {_NH}),
           i -> coalesce(list_min(list_transform(m,
                  h -> ('0x' || substring(h, 1, 14))::BIGINT
                       + i * (('0x' || substring(h, 15, 14))::BIGINT | 1))),
                1152921504606846976)) AS sig
  FROM hpair),
banded AS (
  SELECT doc_id, b AS band,
         array_to_string(list_slice(sig, b * {_ROWS} + 1, b * {_ROWS} + {_ROWS}), ',') AS key
  FROM sig, (SELECT unnest(range(0, {_BANDS})) AS b)),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
"""


@register(
    "dedup_minhash_pairs",
    oracle=f"""
WITH {_SQL_CORPUS}, {_SQL_TOKS}, {_SQL_MINHASH}
SELECT id_a, id_b, ROUND(jaccard, 6) AS jaccard FROM (
  SELECT c.id_a, c.id_b,
         CASE WHEN len(list_distinct(list_concat(sa.s, sb.s))) = 0 THEN 0.0
              ELSE len(list_intersect(sa.s, sb.s))::DOUBLE
                   / len(list_distinct(list_concat(sa.s, sb.s))) END AS jaccard
  FROM cand c JOIN sh sa ON sa.doc_id = c.id_a
              JOIN sh sb ON sb.doc_id = c.id_b)
WHERE jaccard >= 0.5
""",
)
def dedup_minhash_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs: MinHash(12) → LSH(4 bands × 3) → exact-Jaccard
    verify ≥ 0.5. Candidates come from the band equi-join — never
    all-pairs (the C4/GPT-3 dedup recipe)."""
    out = D.dedup_minhash(
        _corpus(spark, sf_dir),
        num_hashes=_NH,
        bands=_BANDS,
        threshold=0.5,
    )
    return out.withColumn("jaccard", F.round("jaccard", 6))


# ---------------------------------------------------------------------------
# n-gram Jaccard (inverted-index exact pairs)


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH {_SQL_CORPUS}, {_SQL_TOKS}
SELECT id_a, id_b, ROUND(jaccard, 6) AS jaccard FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CASE WHEN len(list_distinct(list_concat(a.s, b.s))) = 0 THEN 0.0
              ELSE len(list_intersect(a.s, b.s))::DOUBLE
                   / len(list_distinct(list_concat(a.s, b.s))) END AS jaccard
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
WHERE jaccard >= 0.6
""",
)
def dedup_ngram_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard ≥ 0.6 pairs via the inverted-shingle-index join
    (complete — no LSH misses; the oracle brute-forces all pairs, the
    Spark plan only materializes pairs sharing ≥1 shingle)."""
    out = D.ngram_jaccard_pairs(_corpus(spark, sf_dir), threshold=0.6)
    return out.withColumn("jaccard", F.round("jaccard", 6))


@register(
    "dedup_ngram_dfcut",
    oracle=f"""
WITH {_SQL_CORPUS}, {_SQL_TOKS},
inv AS (SELECT doc_id, unnest(s) AS shg FROM sh),
rare AS (SELECT shg FROM (SELECT shg, COUNT(*) AS df FROM inv GROUP BY shg)
         WHERE df <= 10),
ki AS (SELECT i.doc_id, i.shg FROM inv i JOIN rare USING (shg)),
ks AS (SELECT doc_id, list(shg) AS s FROM ki GROUP BY doc_id)
SELECT id_a, id_b, ROUND(jaccard, 6) AS jaccard FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CASE WHEN len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) = 0
              THEN 0.0
              ELSE len(list_intersect(a.s, b.s))::DOUBLE
                   / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
         END AS jaccard
  FROM ks a JOIN ks b ON a.doc_id < b.doc_id)
WHERE jaccard >= 0.6
""",
)
def dedup_ngram_dfcut_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path of :func:`~mevi_spark.operators.dedup.ngram_jaccard_pairs`:
    identical inverted-index join but with the ``max_doc_freq=10``
    df-cut, so a shingle shared by many docs (here the planted
    duplicates' common shingles) is dropped *before* the self-join —
    bounding the posting lists that would otherwise go quadratic.
    Jaccard is over the surviving shingle sets on both engines."""
    out = D.ngram_jaccard_pairs(
        _corpus(spark, sf_dir), threshold=0.6, max_doc_freq=10
    )
    return out.withColumn("jaccard", F.round("jaccard", 6))


# ---------------------------------------------------------------------------
# SimHash


@register(
    "dedup_simhash",
    oracle=f"""
WITH {_SQL_CORPUS}, {_SQL_TOKS},
th AS (
  SELECT doc_id, {_h60("'sh'", "tok")} AS h
  FROM (SELECT doc_id, unnest(list_distinct(t)) AS tok FROM toks)),
bits AS (
  SELECT doc_id, b, SUM(((h >> b) & 1) * 2 - 1) AS sgn
  FROM th, (SELECT unnest(range(0, 60)) AS b)
  GROUP BY doc_id, b),
sim AS (
  SELECT doc_id,
         SUM(CASE WHEN sgn > 0 THEN (1::BIGINT << b) ELSE 0 END) AS sh
  FROM bits GROUP BY doc_id)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.sh, b.sh)) AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= 3
""",
)
def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(60-bit) pairs within Hamming ≤ 3. Spark candidates via
    the 4-chunk pigeonhole equi-join (complete for Hamming ≤ 3), so the
    all-pairs oracle and the banded plan agree exactly."""
    return D.simhash_pairs(_corpus(spark, sf_dir), max_hamming=3)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup

_DIM, _NPLANES, _EBANDS = 64, 8, 2
_PLANES = D.deterministic_planes(_DIM, _NPLANES)


def _sql_plane_list(plane: list[int]) -> str:
    return "[" + ", ".join(f"{v}.0" for v in plane) + "]"


def _sql_band_key(band: int) -> str:
    per = _NPLANES // _EBANDS
    terms = []
    for i in range(per):
        p = band * per + i
        terms.append(
            f"(CASE WHEN list_dot_product(v, {_sql_plane_list(_PLANES[p])}) > 0 "
            f"THEN {1 << i} ELSE 0 END)"
        )
    return " + ".join(terms)


@register(
    "dedup_embedding_cosine",
    oracle=f"""
WITH evec AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id % 10 = 0),
keyed AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
         {_sql_band_key(0)} AS b0, {_sql_band_key(1)} AS b1
  FROM evec),
banded AS (
  SELECT vec_id, v, nrm, 0 AS band, b0 AS key FROM keyed
  UNION ALL
  SELECT vec_id, v, nrm, 1 AS band, b1 AS key FROM keyed),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id)
SELECT id_a, id_b, ROUND(cosine, 6) AS cosine FROM (
  SELECT c.id_a, c.id_b,
         list_dot_product(ka.v, kb.v) / (ka.nrm * kb.nrm) AS cosine
  FROM cand c
  JOIN (SELECT DISTINCT vec_id, v, nrm FROM keyed) ka ON ka.vec_id = c.id_a
  JOIN (SELECT DISTINCT vec_id, v, nrm FROM keyed) kb ON kb.vec_id = c.id_b)
WHERE cosine >= 0.9
""",
)
def dedup_embedding_cosine_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: deterministic sign-LSH buckets (8 planes, 2
    bands) → cosine-verified ≥ 0.9 over the embeddings table with
    planted copies (``vec_id % 10 == 0`` → ``+100000``)."""
    emb = load_table(spark, sf_dir, "embeddings")
    planted = emb.unionByName(
        emb.filter(F.col("vec_id") % 10 == 0).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
        )
    )
    out = D.embedding_near_dup(
        planted,
        threshold=0.9,
        n_planes=_NPLANES,
        bands=_EBANDS,
        dim=_DIM,
    )
    return out.withColumn("cosine", F.round("cosine", 6))


# ---------------------------------------------------------------------------
# connected components over near-dup pairs


# shared by dedup_components AND its streaming twin
# (plans/streaming_ops.py::streaming_components): the drained
# incremental state must equal the one-shot batch answer, so both
# queries certify against the identical transitive closure
COMPONENTS_ORACLE = f"""
WITH RECURSIVE {_SQL_CORPUS}, {_SQL_TOKS},
pairs AS (
  SELECT id_a, id_b FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CASE WHEN len(list_distinct(list_concat(a.s, b.s))) = 0 THEN 0.0
                ELSE len(list_intersect(a.s, b.s))::DOUBLE
                     / len(list_distinct(list_concat(a.s, b.s))) END AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
  WHERE jaccard >= 0.6),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs),
reach(id, m) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.m FROM edges e JOIN reach r ON r.id = e.dst)
SELECT id, MIN(m) AS component FROM reach GROUP BY id
"""


@register("dedup_components", oracle=COMPONENTS_ORACLE)
def dedup_components_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization: connected components (min-label propagation)
    over the Jaccard ≥ 0.6 near-dup graph — each dup cluster collapses
    to its minimum doc_id. Oracle = recursive-CTE transitive closure."""
    pairs = D.ngram_jaccard_pairs(_corpus(spark, sf_dir), threshold=0.6)
    return D.connected_components(pairs)


# ---------------------------------------------------------------------------
# text analysis

# quality stats are averaged per source with decimal stabilization
# DuckDB string_split('', ' ') returns [''] while the Spark twin
# (functions/text.py::tokens) returns [] for empty normalized text —
# the CASE keeps a punctuation-only document tokenizing to ZERO tokens
# on both engines (without it the oracles' own len(t)=0 guards were
# dead code and such docs hash-diverged)
_SQL_NORM_T = r"""
(CASE WHEN trim(regexp_replace(regexp_replace(lower(text),
  '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) = '' THEN []::VARCHAR[]
 ELSE string_split(trim(regexp_replace(regexp_replace(lower(text),
  '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') END)
"""

_STOP_SQL = "['" + "','".join(TA.STOPWORDS) + "']"


@register(
    "text_quality_stats",
    oracle=f"""
WITH d AS (
  SELECT source, {_SQL_NORM_T} AS t, text FROM documents),
m AS (
  SELECT source,
         ROUND(len(t)::DOUBLE, 6) AS ws_tokens,
         ROUND(len(regexp_extract_all(lower(text), '{TA.BPE_PATTERN}'))::DOUBLE, 6) AS bpe_tokens,
         ROUND(CASE WHEN len(t) = 0 THEN 0.0
               ELSE len(list_filter(t, x -> list_contains({_STOP_SQL}, x)))::DOUBLE / len(t) END, 6) AS sw_ratio,
         ROUND(CASE WHEN len(t) = 0 THEN 0.0
               ELSE len(list_distinct(t))::DOUBLE / len(t) END, 6) AS ttr,
         ROUND(CASE WHEN len(t) = 0 THEN 0.0
               ELSE list_sum(list_transform(t, x -> len(x)))::DOUBLE / len(t) END, 6) AS tok_len
  FROM d)
SELECT source, COUNT(*) AS n_docs,
       ROUND(CAST(SUM(CAST(ws_tokens AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_ws_tokens,
       ROUND(CAST(SUM(CAST(bpe_tokens AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_bpe_tokens,
       ROUND(CAST(SUM(CAST(sw_ratio AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_stopword_ratio,
       ROUND(CAST(SUM(CAST(ttr AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_type_token_ratio,
       ROUND(CAST(SUM(CAST(tok_len AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_token_len
FROM m GROUP BY source
""",
)
def text_quality_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring rolled up per source: token counts (whitespace +
    BPE-ish regex), stopword ratio, type-token ratio, mean token length.
    Per-doc ratios round(6) then decimal-sum → order-independent
    averages (map-side partial agg does the heavy lifting at scale)."""
    from mevi_spark.functions.text import norm_tokens
    from mevi_spark.sources.io import spread_small_scan

    # regex-heavy per-row stage over a bounded input: spread it
    # (identity when the scan already plans wide — see spread_small_scan)
    docs = spread_small_scan(spark, load_table(spark, sf_dir, "documents"))
    # stage the token array ONCE as a real column: the ratio metrics are
    # higher-order-function expressions (interpreted, no codegen CSE),
    # so inlining the tokenizer would re-run the normalize+split regex
    # per metric per row — the shingle_frame staging pattern
    staged = docs.select(
        "source", "text", norm_tokens("text").alias("_toks")
    )
    t = F.col("_toks")
    per_doc = staged.select(
        "source",
        F.round(F.size(t).cast("double"), 6).alias("ws"),
        F.round(TA.bpe_token_count("text").cast("double"), 6).alias("bpe"),
        F.round(TA.stopword_ratio("text", toks=t), 6).alias("sw"),
        F.round(TA.type_token_ratio("text", toks=t), 6).alias("ttr"),
        F.round(TA.mean_token_len("text", toks=t), 6).alias("tl"),
    )

    def _avg(c: str):
        from mevi_spark.functions.agg import exact_sum

        return F.round(exact_sum(c) / F.count("*"), 6)

    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        _avg("ws").alias("avg_ws_tokens"),
        _avg("bpe").alias("avg_bpe_tokens"),
        _avg("sw").alias("avg_stopword_ratio"),
        _avg("ttr").alias("avg_type_token_ratio"),
        _avg("tl").alias("avg_token_len"),
    )


def _sql_lang_pred() -> str:
    """Generate the argmax-with-first-wins CASE chain mirroring
    ``text_analysis.lang_id``'s fold."""
    hits = {
        name: (
            f"len(list_filter(t, x -> list_contains(["
            + ",".join(f"'{w}'" for w in words)
            + "], x)))"
        )
        for name, words in TA.LANG_PROFILES
    }
    names = [n for n, _ in TA.LANG_PROFILES]
    pred = f"'{names[0]}'"
    best = hits[names[0]]
    for name in names[1:]:
        h = hits[name]
        pred = f"CASE WHEN {h} > ({best}) THEN '{name}' ELSE ({pred}) END"
        best = f"CASE WHEN {h} > ({best}) THEN ({h}) ELSE ({best}) END"
    return pred


@register(
    "text_lang_id",
    oracle=f"""
WITH d AS (SELECT doc_id, {_SQL_NORM_T} AS t FROM documents)
SELECT doc_id, {_sql_lang_pred()} AS pred_lang FROM d
""",
)
def text_lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: argmax of per-language stopword-profile
    hits (first profile wins ties) — the n-gram-free tier of web-corpus
    lang filtering. Tokens staged once, read by all five profiles."""
    from mevi_spark.functions.text import norm_tokens

    docs = _docs_spread(spark, sf_dir)
    staged = docs.select(
        "doc_id", norm_tokens("text").alias("_toks")
    )
    return staged.select(
        "doc_id",
        TA.lang_id("_toks", toks=F.col("_toks")).alias("pred_lang"),
    )


@register(
    "text_token_counts",
    oracle=f"""
WITH aug AS (
  SELECT doc_id, text || ' (v' || doc_id || ')' AS text FROM documents)
SELECT doc_id,
       len(string_split(trim(regexp_replace(regexp_replace(lower(text),
         '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')) AS n_ws,
       len(regexp_extract_all(lower(text), '{TA.BPE_PATTERN}')) AS n_bpe
FROM aug
""",
)
def text_token_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens vs BPE-ish regex pre-tokens
    over text with injected punctuation/digits (``' (v<id>)'`` suffix)
    so the two counters genuinely diverge."""
    docs = _docs_spread(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" (v"), F.col("doc_id").cast("string"), F.lit(")")
        ).alias("text"),
    )
    return docs.select(
        "doc_id",
        F.size(
            F.split(
                F.trim(
                    F.regexp_replace(
                        F.regexp_replace(F.lower("text"), r"[^a-z0-9\s]", " "),
                        r"\s+",
                        " ",
                    )
                ),
                " ",
            )
        ).alias("n_ws"),
        TA.bpe_token_count("text").alias("n_bpe"),
    )


@register(
    "doc_fingerprints",
    oracle=f"""
WITH d AS (
  SELECT doc_id,
         list_transform({_SQL_NORM_T},
           x -> {_h60("'fp'", "x")} % 1048573) AS hs
  FROM documents)
SELECT doc_id,
       list_reduce(list_prepend(0, hs), (a, b) -> (a * 131 + b) % 1048573) AS fp,
       CASE WHEN len(hs) < 5
            THEN list_reduce(list_prepend(0, hs), (a, b) -> (a * 131 + b) % 1048573)
            ELSE list_min(list_transform(range(1, len(hs) - 3),
                   i -> list_reduce(list_prepend(0, list_slice(hs, i, i + 4)),
                          (a, b) -> (a * 131 + b) % 1048573)))
       END AS winnow_fp
FROM d
""",
)
def doc_fingerprints_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: whole-doc polynomial rolling hash +
    winnowing-style min-of-5-token-windows hash (edit-robust)."""
    docs = _docs_spread(spark, sf_dir)
    return docs.select(
        "doc_id",
        TA.doc_fingerprint("text").alias("fp"),
        TA.winnow_fingerprint("text", k=5).alias("winnow_fp"),
    )


# ---------------------------------------------------------------------------
# F3: padded/truncated tokenization (the HF tokenizer contract)


@register(
    "tokenize_padded",
    oracle=f"""
WITH p AS (
  SELECT doc_id,
         list_transform(
           list_slice(regexp_extract_all(lower(text), '{TA.BPE_PATTERN}'), 1, 15),
           t -> (2 + {_h60("'tok'", "t")} % 29998)::INT) AS ids
  FROM documents),
e AS (SELECT doc_id, list_append(ids, 0 + 1) AS we FROM p)
SELECT doc_id,
       array_to_string(
         list_concat(we, list_transform(range(1, 17 - len(we)), x -> 0::INT)),
         ',') AS input_ids,
       array_to_string(
         list_concat(list_transform(we, x -> 1::INT),
                     list_transform(range(1, 17 - len(we)), x -> 0::INT)),
         ',') AS attention_mask,
       len(we)::BIGINT AS n_tokens
FROM e
""",
)
def tokenize_padded_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: fixed-length (input_ids, attention_mask) with pad/truncate at
    max_len=16 over a deterministic hash vocabulary — the engine-side
    semantics of the reference's HF tokenizer calls
    (``MEVI/main_models.py:445-466``). The id/mask arrays are
    CSV-serialized per the registry convention (position order matters,
    so no sort) — the driver's canonicalizer cannot hash raw arrays."""
    docs = _docs_spread(spark, sf_dir)
    tok = TA.tokenize_padded("text", max_len=16, vocab_size=30000)
    return docs.select("doc_id", tok.alias("t")).select(
        "doc_id",
        F.array_join(
            F.col("t.input_ids").cast("array<string>"), ","
        ).alias("input_ids"),
        F.array_join(
            F.col("t.attention_mask").cast("array<string>"), ","
        ).alias("attention_mask"),
        F.col("t.n_tokens").cast("long").alias("n_tokens"),
    )


@register(
    "corpus_prep_pipeline",
    oracle=f"""
WITH {_SQL_CORPUS},
k AS (
  SELECT doc_id, text,
         md5(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS key
  FROM corpus),
canon AS (SELECT key, MIN(doc_id) AS doc_id FROM k GROUP BY key),
kept AS (SELECT k.doc_id, k.text FROM k JOIN canon
         ON k.key = canon.key AND k.doc_id = canon.doc_id),
d AS (SELECT doc_id, {_SQL_NORM_T} AS t FROM kept),
f AS (
  SELECT doc_id, t FROM d
  WHERE ({{LANG_PRED}}) = 'en' AND len(t) >= 30
    AND (CASE WHEN len(t) = 0 THEN 0.0
         ELSE len(list_filter(t, x -> list_contains({_STOP_SQL}, x)))::DOUBLE
              / len(t) END) <= 0.10),
j AS (SELECT doc.source, f.t FROM f
      JOIN documents doc ON f.doc_id % 100000 = doc.doc_id)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(len(t)) AS BIGINT) AS total_tokens
FROM j GROUP BY source
""".replace("{LANG_PRED}", _sql_lang_pred()),
)
def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data pipeline, end to end in ONE plan:
    planted corpus → exact dedup (md5-of-normalized groupBy, survivor =
    min id) → language filter (en) → quality filter (≥30 tokens,
    stopword ratio ≤ 0.10) → per-source rollup.

    Every stage is the library operator the standalone queries test
    (dedup_exact / lang_id / quality metrics); composing them shows the
    stages FUSE — dedup's shuffle is the only corpus-wide exchange, the
    filters run map-side on the staged token column, and the rollup
    partial-aggregates. Token totals are integer sums — deterministic
    with no decimal stabilization needed.
    """
    from mevi_spark.functions.text import norm_tokens

    corpus = _corpus(spark, sf_dir)
    keyed = corpus.select(
        "doc_id", "text", F.md5(norm_text("text")).alias("_k")
    )
    canon = keyed.groupBy("_k").agg(F.min("doc_id").alias("doc_id"))
    kept = keyed.join(canon, ["_k", "doc_id"]).select("doc_id", "text")
    staged = kept.select(
        "doc_id", norm_tokens("text").alias("_toks")
    )
    t = F.col("_toks")
    f = staged.filter(
        (TA.lang_id("_toks", toks=t) == "en")
        & (F.size(t) >= 30)
        & (TA.stopword_ratio("_toks", toks=t) <= 0.10)
    )
    src = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("_src_id"), "source"
    )
    joined = f.join(
        F.broadcast(src), f.doc_id % 100000 == F.col("_src_id")
    )
    return joined.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(t)).cast("bigint").alias("total_tokens"),
    )


_PII_ORACLE = """
WITH planted AS (
  SELECT doc_id, source,
         text
         || CASE WHEN doc_id % 4 = 0
                 THEN ' contact user' || doc_id::VARCHAR || '@example.com now'
                 ELSE '' END
         || CASE WHEN doc_id % 6 = 0
                 THEN ' call 555-010-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 9 = 0 THEN ' from 10.20.30.40' ELSE '' END
           AS text
  FROM documents),
c AS (
  SELECT source,
         len(regexp_extract_all(text, '@EMAILPAT@')) AS n_email,
         len(regexp_extract_all(text, '@PHONEPAT@')) AS n_phone,
         len(regexp_extract_all(text, '@IPPAT@')) AS n_ipv4,
         regexp_replace(regexp_replace(regexp_replace(text,
           '@EMAILPAT@', '<EMAIL>', 'g'),
           '@PHONEPAT@', '<PHONE>', 'g'),
           '@IPPAT@', '<IP>', 'g') AS red
  FROM planted)
SELECT source,
       CAST(SUM(CASE WHEN n_email + n_phone + n_ipv4 > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_docs_redacted,
       CAST(SUM(n_email) AS BIGINT) AS n_emails,
       CAST(SUM(n_phone) AS BIGINT) AS n_phones,
       CAST(SUM(n_ipv4) AS BIGINT) AS n_ips,
       CAST(SUM(('0x' || substring(md5(red), 1, 6))::BIGINT) AS BIGINT)
         AS red_fingerprint
FROM c GROUP BY source
"""
for _n, _p, _r in TA.PII_PATTERNS:
    _PII_ORACLE = _PII_ORACLE.replace(
        {"email": "@EMAILPAT@", "phone": "@PHONEPAT@", "ipv4": "@IPPAT@"}[_n],
        _p,
    )


@register("text_redact_pii", oracle=_PII_ORACLE)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data hygiene: PII redaction before the corpus ships.

    The clean synthetic corpus carries no PII, so — like the dedup
    queries plant duplicates — deterministic emails / phone numbers /
    IPv4 literals are PLANTED (the same construction in Spark and in
    the oracle), then counted (pre-redaction ``regexp_count``) and
    redacted to typed placeholders. The per-source fingerprint sums an
    md5-prefix integer of every redacted text, so the oracle match
    proves the replacement output is byte-identical, not just the
    counts. All codegen ``regexp_*`` — a map-only pass at any scale.
    """
    docs = _docs_spread(spark, sf_dir, "doc_id", "source", "text")
    did = F.col("doc_id")
    planted = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                did % 4 == 0,
                F.concat(
                    F.lit(" contact user"),
                    did.cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 6 == 0,
                F.concat(
                    F.lit(" call 555-010-"),
                    F.lpad((did % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
            F.when(did % 9 == 0, F.lit(" from 10.20.30.40")).otherwise(
                F.lit("")
            ),
        ),
    )
    c = planted.select(
        "source",
        *TA.pii_counts("text"),
        TA.redact_pii("text").alias("red"),
    )
    any_pii = (F.col("n_email") + F.col("n_phone") + F.col("n_ipv4")) > 0
    return c.groupBy("source").agg(
        F.sum(F.when(any_pii, 1).otherwise(0)).alias("n_docs_redacted"),
        F.sum("n_email").alias("n_emails"),
        F.sum("n_phone").alias("n_phones"),
        F.sum("n_ipv4").alias("n_ips"),
        F.sum(
            F.conv(F.substring(F.md5("red"), 1, 6), 16, 10).cast("bigint")
        ).alias("red_fingerprint"),
    )


@register(
    "dataset_split",
    oracle="""
WITH s AS (
  SELECT source,
         CASE WHEN ('0x' || substring(md5('split|' || doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 90
              THEN 'train'
              WHEN ('0x' || substring(md5('split|' || doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 95
              THEN 'val'
              ELSE 'test' END AS split
  FROM documents)
SELECT source, split, COUNT(*) AS n_docs
FROM s GROUP BY source, split
""",
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (90/5/5) by hashing the
    stable row id — the curation staple: reproducible across runs and
    engines (no RNG state), stable under corpus growth (a doc's split
    never changes when rows are added), map-only at any scale. Uses the
    same md5-prefix ``hash60`` construction as tokenization/sampling so
    one hash family covers the whole pipeline."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))),
            1, 15,
        ),
        16, 10,
    ).cast("bigint") % 100
    split = (
        F.when(h < 90, "train").when(h < 95, "val").otherwise("test")
    )
    return docs.select("source", split.alias("split")).groupBy(
        "source", "split"
    ).agg(F.count("*").alias("n_docs"))


# ---------------------------------------------------------------------------
# round-7 additions: sparse ranking, distribution stats, canonicalization


@register(
    "text_tfidf_topterms",
    oracle=r"""
WITH toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
  FROM documents),
n AS (SELECT COUNT(*) AS n_docs FROM toks),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(t) AS term FROM toks)
  GROUP BY doc_id, term),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(tf.tf * (ln((n.n_docs + 1)::DOUBLE / (dfreq.df + 1)) + 1.0),
               6) AS s
  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
ranked AS (
  SELECT doc_id, term, s,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY s DESC, term ASC) AS rnk
  FROM scored)
SELECT doc_id, term, s AS tfidf, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 5
""",
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse keyword ranking: per-doc top-5 terms by smoothed TF-IDF
    (``tf · (ln((N+1)/(df+1)) + 1)``) — the classic sparse complement
    to the dense retrieval tier (the reference is embedding-only; a
    training-data platform needs the lexical signal too, e.g. for
    BM25-style mining and quality filters). Plan shape at 100 TB: one
    explode + two partial-aggregated shuffles (term stats are
    corpus-wide but term-keyed), broadcast of the single-row corpus
    count, per-doc window over ≤|terms-per-doc| rows. The tf⋈df join
    is deliberately NOT broadcast-hinted: df is vocabulary-sized
    (billions of terms at corpus scale) and both sides are already
    partitioned by ``term`` from the same aggregation, so the planner
    joins them on the existing exchange; at toy SF its stats pick a
    broadcast on their own.

    Ranking orders by the score ROUNDED to 6 decimals (+ term
    tiebreak) on both engines, mirroring ``bm25_search``: near-equal
    tf·idf products from different (tf, df) pairs differ only past the
    6th decimal when a last-ulp ``ln`` disagrees, so rounding first
    keeps the cross-engine rank identical."""
    from mevi_spark.functions.text import norm_tokens
    from mevi_spark.operators.topk import topk_per_group

    docs = _docs_spread(spark, sf_dir, "doc_id", "text")
    toks = docs.select(
        "doc_id", norm_tokens("text").alias("t")
    )
    terms = toks.select("doc_id", F.explode("t").alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = toks.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + 1).cast("double")
                        / (F.col("df") + 1)
                    )
                    + F.lit(1.0)
                )
            ).alias("s"),
        )
    )
    top = topk_per_group(
        scored.withColumn("s", F.round("s", 6)),
        ["doc_id"], "s", 5, ["term"], rank_col="rnk",
    )
    return top.select(
        "doc_id",
        "term",
        F.col("s").alias("tfidf"),
        F.col("rnk").cast("int").alias("rnk"),
    )


# shared by events_value_quantiles AND its maintenance twin
# (plans/streaming_ops.py::streaming_quantiles): the streaming query's
# exact drain pass must equal the one-shot grouped quantiles
EV_QUANTILES_ORACLE = """
WITH q AS (
  SELECT event_type,
         quantile_cont(value, [0.25, 0.5, 0.75, 0.95]) AS qs,
         COUNT(*) AS n
  FROM events GROUP BY event_type)
SELECT event_type, p, ROUND(v, 6) AS v, n
FROM (
  SELECT event_type, n,
         unnest(['p25','p50','p75','p95']) AS p,
         unnest(qs) AS v
  FROM q)
"""


@register(
    "events_value_quantiles",
    oracle=EV_QUANTILES_ORACLE,
)
def events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped quantiles (R-7 linear interpolation — Spark
    ``percentile`` and DuckDB ``quantile_cont`` share the method) —
    the distribution profile every curation/quality pass reads before
    choosing filter thresholds. Exact percentile sorts per group: fine
    for grouped profiles (group state bounds it); corpus-wide
    single-key quantiles at 100 TB switch to ``approx_percentile``
    (t-digest, mergeable partial aggregation) — documented tradeoff,
    same API shape. Under INGEST the maintained form is the
    deterministic compactor summary (``streaming_quantiles``), whose
    drain shares :func:`exact_grouped_quantiles` and this oracle."""
    return exact_grouped_quantiles(load_table(spark, sf_dir, "events"))


def exact_grouped_quantiles(ev: DataFrame) -> DataFrame:
    """The exact pass shared by the batch query and the streaming
    twin's drain — one definition, one oracle."""
    q = ev.groupBy("event_type").agg(
        F.expr(
            "percentile(value, array(0.25D, 0.5D, 0.75D, 0.95D))"
        ).alias("qs"),
        F.count("*").alias("n"),
    )
    labels = F.array(*[F.lit(x) for x in ("p25", "p50", "p75", "p95")])
    return (
        q.select(
            "event_type",
            "n",
            F.explode(F.arrays_zip(labels.alias("p"), F.col("qs").alias("v"))),
        )
        .select(
            "event_type",
            F.col("col.p").alias("p"),
            F.round(F.col("col.v"), 6).alias("v"),
            "n",
        )
    )


CANONICALIZE_ORACLE = f"""
WITH RECURSIVE {_SQL_CORPUS}, {_SQL_TOKS},
pairs AS (
  SELECT id_a, id_b FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CASE WHEN len(list_distinct(list_concat(a.s, b.s))) = 0 THEN 0.0
                ELSE len(list_intersect(a.s, b.s))::DOUBLE
                     / len(list_distinct(list_concat(a.s, b.s))) END AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
  WHERE jaccard >= 0.6),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs),
reach(id, m) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.m FROM edges e JOIN reach r ON r.id = e.dst),
comp AS (SELECT id, MIN(m) AS component FROM reach GROUP BY id),
labeled AS (
  SELECT t.doc_id, COALESCE(c.component, t.doc_id) AS component,
         len(t.t) AS n_t
  FROM toks t LEFT JOIN comp c ON c.id = t.doc_id),
canon AS (
  SELECT component, doc_id AS canonical_id FROM (
    SELECT component, doc_id,
           ROW_NUMBER() OVER (PARTITION BY component
                              ORDER BY n_t DESC, doc_id ASC) AS r
    FROM labeled) WHERE r = 1)
SELECT l.doc_id, l.component, c.canonical_id,
       l.doc_id = c.canonical_id AS keep
FROM labeled l JOIN canon c USING (component)
"""


@register("dedup_canonicalize", oracle=CANONICALIZE_ORACLE)
def dedup_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step after near-dup detection that an actual corpus build
    needs: map EVERY doc (dup or singleton) to the canonical survivor
    of its duplicate cluster — keep the longest doc, ties to the
    smallest id. Composition of the component labeling
    (``dedup_components``) with a per-component argmax; singletons are
    their own canonical. Plan: the near-dup graph work is the dedup
    tier's (bounded by its df-cut), then one broadcast-sized join of
    component labels and one partial-aggregated argmax."""
    corpus = _corpus(spark, sf_dir)
    comps = D.connected_components(
        D.ngram_jaccard_pairs(corpus, threshold=0.6)
    )
    return canonicalize_from_labels(corpus, comps)


def canonicalize_from_labels(corpus: DataFrame, labels: DataFrame) -> DataFrame:
    """The canonical-survivor projection given component labels
    ``(id, component)`` — one definition shared by the batch query
    (labels from :func:`~mevi_spark.operators.dedup.connected_components`)
    and the maintained-state serving path
    (``streaming_ops.py::streaming_canonicalize``, labels read from the
    ``incremental_components`` store), so serving from state cannot
    drift. Keep the longest doc, ties to the smallest id; singletons
    (no label row) are their own canonical."""
    from mevi_spark.functions.text import norm_tokens

    labeled = (
        corpus.select(
            "doc_id", F.size(norm_tokens("text")).alias("n_t")
        )
        .join(labels.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("component"),
            "n_t",
        )
    )
    canon = labeled.groupBy("component").agg(
        F.min(F.struct((-F.col("n_t")).alias("a"), F.col("doc_id").alias("d")))[
            "d"
        ].alias("canonical_id")
    )
    return labeled.join(canon, "component").select(
        "doc_id",
        "component",
        "canonical_id",
        (F.col("doc_id") == F.col("canonical_id")).alias("keep"),
    )


# ---------------------------------------------------------------------------
# round-7 additions #2: eval-set decontamination, repetition filtering


# shared by decontaminate_eval AND bloom_decontaminate: the Bloom
# pre-filter + exact verify composition is bit-identical to the exact
# operator, so both run against the same SQL
DECONTAMINATE_ORACLE = f"""
WITH {_SQL_CORPUS}, {_SQL_TOKS},
sh5 AS (
  SELECT doc_id,
         CASE WHEN len(t) < 5 THEN []::VARCHAR[]
              ELSE list_distinct(list_transform(range(1, len(t) - 3),
                     i -> array_to_string(list_slice(t, i, i + 4), ' ')))
         END AS s
  FROM toks),
ev AS (SELECT DISTINCT unnest(s) AS g FROM sh5 WHERE doc_id >= 100000),
tr AS (SELECT doc_id, s FROM sh5 WHERE doc_id < 100000),
hits AS (
  SELECT doc_id, COUNT(*) AS n
  FROM (SELECT doc_id, unnest(s) AS g FROM tr) x JOIN ev USING (g)
  GROUP BY doc_id)
SELECT tr.doc_id, COALESCE(hits.n, 0) AS n_overlap,
       COALESCE(hits.n, 0) > 0 AS contaminated
FROM tr LEFT JOIN hits USING (doc_id)
"""


@register("decontaminate_eval", oracle=DECONTAMINATE_ORACLE)
def decontaminate_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination — the GPT-3/Gopher hygiene step: flag
    every training document sharing any word 5-gram with a held-out
    eval set (the planted corpus copies play the eval split:
    ``doc_id >= 100000``; originals are the train candidates, so exact
    and near copies must flag). Per train doc: the count of its
    distinct 5-shingles found in the eval union, and the flag.

    100 TB plan shape: eval sets are benchmark-sized (thousands of
    docs), so the eval shingle union is broadcast — the corpus-sized
    side is map-only explode + broadcast-hash-join + partial-agg
    count; the corpus never shuffles on the shingle key. Shingles are
    STAGED through :func:`~mevi_spark.operators.dedup.shingle_frame`
    (not the composed ``word_shingles`` expression): CollapseProject
    would otherwise inline the normalize+split regex into every
    downstream lambda and explode consumer, re-running it per array
    element — the same plan pathology that turned dedup_minhash's
    sf0.1 run into 783 s, re-found here as a single 1100 s regex task
    at sf1. The shingled frame is PERSISTED before its explodes: a
    Generate over an expensive array expression re-evaluates the child
    per OUTPUT ELEMENT (measured 64x at sf1; the barrier removes it) —
    the dedup_minhash persisted-block pattern, released at
    session-cache teardown.
    """
    from mevi_spark.operators.cache import defer_unpersist

    sh = D.shingle_frame(_corpus(spark, sf_dir), shingle_n=5).select(
        "doc_id", F.col("shingles").alias("s")
    ).persist()
    defer_unpersist(sh)
    ev = (
        sh.filter(F.col("doc_id") >= 100000)
        .select(F.explode("s").alias("g"))
        .distinct()
    )
    hits = (
        sh.filter(F.col("doc_id") < 100000)
        .select("doc_id", F.explode("s").alias("g"))
        .join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
    )
    # zero-overlap rows need only ids — a shingle-free scan, so the
    # train side tokenizes exactly once (in the hits pipeline)
    ids = _corpus(spark, sf_dir).select("doc_id").filter(
        F.col("doc_id") < 100000
    )
    return ids.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n", F.lit(0)).alias("n_overlap"),
        (F.coalesce("n", F.lit(0)) > 0).alias("contaminated"),
    )


@register(
    "text_repetition_stats",
    oracle=r"""
WITH rep AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 300000 AS doc_id, text || ' ' || text AS text
  FROM documents WHERE doc_id % 11 = 0),
toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
  FROM rep),
bi AS (
  SELECT doc_id, t,
         CASE WHEN len(t) < 2 THEN []::VARCHAR[]
              ELSE list_transform(range(1, len(t)),
                     i -> array_to_string(list_slice(t, i, i + 1), ' '))
         END AS b
  FROM toks),
stats AS (
  SELECT doc_id,
         len(t) AS n_tok,
         CASE WHEN len(t) = 0 THEN 0.0
              ELSE 1.0 - len(list_distinct(t))::DOUBLE / len(t) END
           AS dup_word_frac,
         CASE WHEN len(b) = 0 THEN 0.0
              ELSE 1.0 - len(list_distinct(b))::DOUBLE / len(b) END
           AS dup_bigram_frac,
         CASE WHEN len(b) = 0 THEN 0.0
              ELSE list_max(list_transform(list_distinct(b),
                     g -> len(list_filter(b, x -> x = g))))::DOUBLE / len(b)
         END AS top_bigram_frac
  FROM bi)
SELECT doc_id, n_tok,
       ROUND(dup_word_frac, 6) AS dup_word_frac,
       ROUND(dup_bigram_frac, 6) AS dup_bigram_frac,
       ROUND(top_bigram_frac, 6) AS top_bigram_frac,
       dup_bigram_frac > 0.2 OR top_bigram_frac > 0.1 AS repetitive
FROM stats
""",
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition filtering (the Gopher quality rules):
    duplicate-token fraction, duplicate-bigram fraction, and the most
    frequent bigram's share, with a ``repetitive`` flag. A doubled-text
    variant is planted (``doc_id % 11 == 0`` → ``doc_id + 300000``,
    text self-concatenated) so the flag has a known-true population.

    100 TB plan shape: ZERO keyed shuffles — every statistic is an
    array expression over the doc's own token list (``array_distinct``
    / ``filter`` / ``array_max``), whole-stage codegen, embarrassingly
    parallel; the O(d·u) per-doc frequency scan is bounded by doc
    length, not corpus size. The only exchange is the opt-in
    ``spread_small_scan`` round-robin repartition that widens the
    tiny fixture scan; at production listing widths the guard makes
    it the identity and the plan is map-only again.
    """
    from mevi_spark.functions.text import norm_tokens

    from mevi_spark.sources.io import spread_small_scan

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    rep = spread_small_scan(
        spark,
        docs.unionByName(
            docs.filter(F.col("doc_id") % 11 == 0).select(
                (F.col("doc_id") + 300000).alias("doc_id"),
                F.concat_ws(" ", "text", "text").alias("text"),
            )
        ),
    )
    t = norm_tokens("text")
    frame = rep.select("doc_id", t.alias("t")).select(
        "doc_id",
        "t",
        F.when(F.size("t") < 2, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.concat_ws(" ", F.slice("t", i, 2)),
            )
        ).alias("b"),
    )
    n_tok = F.size("t")
    n_bi = F.size("b")
    dup_word = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct("t")).cast("double") / n_tok
    )
    dup_bi = F.when(n_bi == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct("b")).cast("double") / n_bi
    )
    top_count = F.array_max(
        F.transform(
            F.array_distinct("b"),
            lambda g: F.size(F.filter("b", lambda x: x == g)),
        )
    )
    top_bi = F.when(n_bi == 0, F.lit(0.0)).otherwise(
        top_count.cast("double") / n_bi
    )
    return frame.select(
        "doc_id",
        n_tok.alias("n_tok"),
        F.round(dup_word, 6).alias("dup_word_frac"),
        F.round(dup_bi, 6).alias("dup_bigram_frac"),
        F.round(top_bi, 6).alias("top_bigram_frac"),
        ((dup_bi > 0.2) | (top_bi > 0.1)).alias("repetitive"),
    )


# ---------------------------------------------------------------------------
# round-7 additions #3: domain mixing, sequence packing


@register(
    "domain_mix_sample",
    oracle=f"""
WITH rates AS (
  SELECT source, 100 + {_h60("'rate'", "source")} % 800 AS rate_permille
  FROM (SELECT DISTINCT source FROM documents))
SELECT d.doc_id, d.source, r.rate_permille
FROM documents d JOIN rates r USING (source)
WHERE {_h60("'mix'", "CAST(d.doc_id AS VARCHAR)")} % 1000 < r.rate_permille
""",
)
def domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing — the data-mix step of every pretraining corpus
    (Pile/LLaMA-style per-source sampling rates): keep each document
    with a per-source probability, decided by a seedless deterministic
    hash of the doc id so the sample is reproducible under reruns,
    retries, and corpus growth (the same contract as ``dataset_split``).
    Rates here derive from a hash of the source name (100–899 permille)
    so the query carries no table-specific literals.

    100 TB plan shape: the rate table is |sources|-sized → broadcast;
    the corpus side is a map-only hash-filter — no shuffle at all, and
    the filter prunes before any downstream work."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    rates = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            (100 + TA.hash60("source", seed="rate") % 800).alias(
                "rate_permille"
            ),
        )
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(
            TA.hash60(F.col("doc_id").cast("string"), seed="mix") % 1000
            < F.col("rate_permille")
        )
        .select("doc_id", "source", "rate_permille")
    )


_SEQ_LEN = 512


@register(
    "sequence_pack",
    oracle=rf"""
WITH toks AS (
  SELECT doc_id,
         len(string_split(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ')) AS n_tok
  FROM documents
  WHERE trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) <> ''),
cum AS (
  SELECT doc_id, n_tok,
         SUM(n_tok) OVER (ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) - n_tok AS cum_before
  FROM toks)
SELECT doc_id, n_tok,
       CAST(cum_before // {_SEQ_LEN} AS BIGINT) AS start_seq,
       CAST(cum_before % {_SEQ_LEN} AS BIGINT) AS seq_offset,
       CAST((cum_before + n_tok - 1) // {_SEQ_LEN} AS BIGINT) AS end_seq
FROM cum
""",
)
def sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — concat-and-chunk: lay every document's tokens
    end-to-end in doc_id order and cut fixed {SEQ_LEN}-token training
    sequences, reporting where each doc lands (first sequence, offset
    within it, last sequence). The GPT-style pretraining packer, as a
    deterministic metadata query (the writer that materializes token
    blocks follows this map).

    The global running total is the two-pass value-bucket pattern of
    :func:`mevi_spark.operators.cumsum.bucketed_cum_before` (shared
    with the block writer ``packed_sequences``; ``corpus_sample_remap``
    mirrors it for dense ranks): one job for per-bucket token sums,
    driver-accumulated bucket offsets (bounded by 2·parallelism
    entries), then a per-bucket window — parallel, no single-partition
    global window, both passes see identical groups by construction.
    Counts stay < 2^53 (25T tokens ≈ 100 TB of text) so the
    floor-division parity with the oracle's integer ``//`` is exact."""
    from mevi_spark.functions.text import norm_tokens
    from mevi_spark.operators.cumsum import bucketed_cum_before

    docs = (
        _docs_spread(spark, sf_dir)
        .select(
            "doc_id",
            F.size(norm_tokens("text")).alias("n_tok"),
        )
        .filter(F.col("n_tok") > 0)
    )
    with_cum = bucketed_cum_before(docs, "doc_id", "n_tok", out_col="c")
    if with_cum is None:
        return spark.createDataFrame(
            [], "doc_id long, n_tok int, start_seq long, "
            "seq_offset long, end_seq long"
        )
    return with_cum.select(
        "doc_id",
        "n_tok",
        F.expr(f"c div {_SEQ_LEN}").alias("start_seq"),
        (F.col("c") % _SEQ_LEN).alias("seq_offset"),
        F.expr(f"(c + n_tok - 1) div {_SEQ_LEN}").alias("end_seq"),
    )


# blocks reconstructed independently on the DuckDB side: concatenate
# all tokens in doc order, chunk at _SEQ_LEN, hash each chunk — shared
# by the one-shot writer (packed_sequences) and the incremental
# append-maintained state (packed_append), whose final states must be
# identical by construction
_SQL_PACKED_RECONSTRUCT = rf"""
WITH toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
  FROM documents
  WHERE trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) <> ''),
flat AS (
  SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS ord
  FROM toks),
cum AS (
  SELECT doc_id,
         SUM(len(t)) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
           - len(t) AS cb
  FROM toks),
pos AS (
  SELECT f.tok, c.cb + f.ord - 1 AS p
  FROM flat f JOIN cum c USING (doc_id)),
seqs AS (
  SELECT p // {_SEQ_LEN} AS seq_id,
         string_agg(tok, ' ' ORDER BY p) AS s,
         COUNT(*) AS n_tokens
  FROM pos GROUP BY p // {_SEQ_LEN})
SELECT CAST(seq_id AS BIGINT) AS seq_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       md5(s) AS tok_hash
FROM seqs
"""


@register("packed_sequences", oracle=_SQL_PACKED_RECONSTRUCT)
def packed_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The packed-sequence WRITER, driver-checked end to end: the
    corpus token stream is materialized as fixed-{_SEQ_LEN} blocks by
    :func:`mevi_spark.sources.packed.write_packed_sequences` (the
    table a training job actually consumes — ``sequence_pack`` emits
    the doc→sequence map, this materializes the blocks it describes),
    written to parquet range-ordered by ``seq_id``, read back, and
    reduced to ``(seq_id, n_tokens, md5 of the block's tokens)``.

    The oracle RECONSTRUCTS every block independently on the DuckDB
    side — concatenate all tokens in doc order, chunk at {_SEQ_LEN},
    hash each chunk — so a hash match proves the written blocks carry
    exactly the right tokens in exactly the right order, gapless, with
    the final partial block at its true length. Plan shape per the
    module docstring: shared prefix-sum, span fan-out (≤ n_tok/L + 1
    per doc), ONE seq_id-keyed shuffle, range-partitioned ordered
    sink."""
    import shutil
    import tempfile

    from mevi_spark.functions.text import norm_tokens
    from mevi_spark.sources.packed import write_packed_sequences

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", norm_tokens("text").alias("toks")
    )
    base = tempfile.mkdtemp(prefix="mevi_packed_")
    try:
        write_packed_sequences(docs, f"{base}/blocks", _SEQ_LEN)
        out = (
            spark.read.parquet(f"{base}/blocks")
            .select(
                "seq_id",
                "n_tokens",
                F.md5(F.concat_ws(" ", "tokens")).alias("tok_hash"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


@register("packed_append", oracle=_SQL_PACKED_RECONSTRUCT)
def packed_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The packed-block state maintained INCREMENTALLY: the corpus
    arrives as three doc-id-ordered batches and
    :func:`mevi_spark.sources.packed.append_packed_sequences` extends
    the state per batch — only the tail partial block re-packs, every
    full block written once is immutable, each batch's blocks land in
    their own idempotent subdir (the operational packer: re-running
    the batch packer over the whole corpus per ingest is exactly what
    a 100 TB pipeline cannot afford). The drained state — read back
    through :func:`read_packed_state`'s latest-batch-wins merge —
    must hash-equal the one-shot batch pack of the full corpus, which
    the oracle reconstructs block by block on the DuckDB side (same
    reconstruct-and-hash check as ``packed_sequences``)."""
    import shutil
    import tempfile

    from mevi_spark.functions.text import norm_tokens
    from mevi_spark.sources.packed import (
        append_packed_sequences,
        read_packed_state,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", norm_tokens("text").alias("toks")
    )
    mx = docs.agg(F.max("doc_id")).first()[0] or 0
    cuts = (int(mx) // 3, 2 * int(mx) // 3)
    base = tempfile.mkdtemp(prefix="mevi_packapp_")
    try:
        batches = [
            docs.filter(F.col("doc_id") <= cuts[0]),
            docs.filter(
                (F.col("doc_id") > cuts[0]) & (F.col("doc_id") <= cuts[1])
            ),
            docs.filter(F.col("doc_id") > cuts[1]),
        ]
        for b in batches:
            append_packed_sequences(spark, f"{base}/state", b, _SEQ_LEN)
        out = (
            read_packed_state(spark, f"{base}/state")
            .select(
                "seq_id",
                "n_tokens",
                F.md5(F.concat_ws(" ", "tokens")).alias("tok_hash"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


# the SQL twin of functions/text.py::tokens(normalize_text(...)) — the
# tokenization every lexical oracle must share (bm25_search, the hybrid
# ensemble's lexical leg, streaming_lexical_stats)
_SQL_BTOKS = r"""
btoks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
  FROM documents)"""

# the BM25 run as a reusable oracle CTE chain (ends in `bm25ranked`);
# shared by bm25_search and the hybrid ensemble's lexical leg
# (plans/retrieval.py::ensemble_hybrid)
_SQL_BM25_CTES = f"""
{_SQL_BTOKS},
bdl AS (SELECT doc_id, t, len(t) AS dl FROM btoks),
bstats AS (SELECT COUNT(*) AS n, SUM(dl)::DOUBLE / COUNT(*) AS avgdl FROM bdl),
btf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(t) AS term FROM btoks)
  GROUP BY doc_id, term),
bdf AS (SELECT term, COUNT(*) AS df FROM btf GROUP BY term),
bq AS (
  SELECT doc_id AS query_id, unnest(list_distinct(t[1:5])) AS term
  FROM bdl WHERE doc_id % 50 = 0),
bcontrib AS (
  SELECT bq.query_id, btf.doc_id,
         ln((s.n - bdf.df + 0.5) / (bdf.df + 0.5) + 1.0)
           * (btf.tf * 2.2)
           / (btf.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / s.avgdl)) AS c
  FROM bq JOIN btf USING (term)
         JOIN bdf ON bdf.term = bq.term
         JOIN bdl d ON d.doc_id = btf.doc_id
         CROSS JOIN bstats s),
bscored AS (
  SELECT query_id, doc_id,
         CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE) AS score
  FROM bcontrib GROUP BY query_id, doc_id),
bm25ranked AS (
  SELECT query_id, doc_id, ROUND(score, 6) AS score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY ROUND(score, 6) DESC, doc_id ASC) AS rnk
  FROM bscored)
"""


@register(
    "bm25_search",
    oracle=f"""
WITH {_SQL_BM25_CTES}
SELECT query_id, doc_id, score, CAST(rnk AS INT) AS rnk
FROM bm25ranked WHERE rnk <= 5
""",
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 sparse retrieval (Okapi, k1=1.2, b=0.75, Lucene idf
    smoothing): every 50th document's first five distinct tokens act as
    the query set (the same eval density the dense tier samples), each
    query scored against the whole corpus, top-5 per query. The lexical
    baseline the reference's dense/generative retrieval is normally
    ensembled against in IR practice.

    Cross-engine determinism: per-term contributions are summed through
    the decimal-stabilized path (scaled-long == the oracle's
    DECIMAL(18,6) accumulation) and ranking orders by the ROUNDED
    score + doc_id, so a last-ulp difference in ``ln`` can never flip
    ranks. 100 TB plan: query terms broadcast (eval-sized), postings
    term-keyed partial-aggregated shuffles, per-query window over
    candidate docs only (docs sharing ≥1 query term)."""
    return bm25_run(spark, sf_dir, k=5)


def bm25_run(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """The lexical run ``(query_id, doc_id, score, rnk)`` — BM25 top-k
    per query (see :func:`bm25_search` for scoring + determinism
    rules). Shared by the registered query (k=5) and the hybrid
    ensemble's lexical leg (k=10, ``plans/retrieval.py``). The
    corpus-wide statistics (df, n, avgdl) are recomputed inline here;
    ``plans/streaming_ops.py::streaming_bm25_serve`` runs the SAME
    scorer (:func:`bm25_score_with_stats`) against stats read from the
    maintained lexical state instead."""
    from mevi_spark.functions.text import norm_tokens

    docs = _docs_spread(spark, sf_dir, "doc_id", "text")
    toks = docs.select("doc_id", norm_tokens("text").alias("t")).select(
        "doc_id", "t", F.size("t").alias("dl")
    )
    n, avgdl = toks.agg(
        F.count("*"), F.sum("dl").cast("double") / F.count("*")
    ).first()
    tf = toks.select("doc_id", "dl", F.explode("t").alias("term")).groupBy(
        "doc_id", "dl", "term"
    ).agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    return bm25_score_with_stats(toks, tf, dfreq, float(n), float(avgdl), k)


def bm25_score_with_stats(
    toks: DataFrame,
    tf: DataFrame,
    dfreq: DataFrame,
    n: float,
    avgdl: float,
    k: int,
) -> DataFrame:
    """The BM25 scorer proper, with the corpus-wide statistics
    (``dfreq``/``n``/``avgdl``) taken as INPUTS — one definition shared
    by the batch path (:func:`bm25_run`, stats recomputed inline) and
    the maintained-state serving path
    (``streaming_ops.py::streaming_bm25_serve``, stats read from the
    lexical maintenance store), so serving from state cannot drift from
    the batch searcher. ``toks`` is ``(doc_id, t, dl)`` from the shared
    tokenizer; ``tf`` is the per-``(doc_id, dl, term)`` counts frame."""
    from mevi_spark.functions.agg import scaled_long
    from mevi_spark.operators.topk import topk_per_group

    q = (
        toks.filter(F.col("doc_id") % 50 == 0)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.array_distinct(F.slice("t", 1, 5))).alias("term"),
        )
    )
    # the query term list is eval-sized (thousands of rows at any
    # corpus scale) — PIN the broadcast rather than leaving it to
    # planner stats: a misestimate here would shuffle the corpus-sized
    # postings table on `term` instead of streaming it map-side
    contrib = (
        F.broadcast(q).join(tf, "term")
        .join(dfreq, "term")
        .select(
            "query_id",
            "doc_id",
            (
                F.log(
                    (F.lit(float(n)) - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1.0
                )
                * (F.col("tf") * 2.2)
                / (
                    F.col("tf")
                    + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.lit(float(avgdl)))
                )
            ).alias("c"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        (F.sum(scaled_long("c")).cast("double") / F.lit(1e6)).alias("score")
    )
    ranked = topk_per_group(
        scored.withColumn("score", F.round("score", 6)),
        ["query_id"], "score", k, ["doc_id"], rank_col="rnk",
    )
    return ranked.select(
        "query_id", "doc_id", "score", F.col("rnk").cast("int").alias("rnk")
    )


# ---------------------------------------------------------------------------
# exact stratified sampling (round-8 curation tier extension)


_STRAT_N = 8


@register(
    "stratified_sample_exact",
    oracle=f"""
WITH ranked AS (
  SELECT doc_id, source, lang,
         ROW_NUMBER() OVER (
           PARTITION BY source, lang
           ORDER BY {_h60("'strat'", "CAST(doc_id AS VARCHAR)")} ASC,
                    doc_id ASC) AS rn
  FROM documents)
SELECT doc_id, source, lang, CAST(rn AS INT) AS rn
FROM ranked WHERE rn <= {_STRAT_N}
""",
)
def stratified_sample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-count stratified sampling: keep exactly ``min(N, |stratum|)``
    documents per (source, lang) stratum, chosen by rank of a seedless
    deterministic hash of the doc id — the fixed-quota twin of the
    rate-based :func:`domain_mix_sample` (a data-mix step needs both:
    rates for proportional mixes, quotas for "at most N docs of X").
    The hash ranking makes the sample reproducible under reruns and
    stable under corpus growth: a new document only enters a stratum's
    sample by displacing the current max-hash member, never by
    reshuffling the whole selection.

    100 TB plan shape: one shuffle keyed on the stratum — and because
    the per-stratum quota is a row_number over a hash, AQE's skew-join
    split cannot apply, so a skewed stratum (one source dominating the
    corpus) is the hazard; the mitigation is the standard two-phase
    top-k (per-partition quota then final window, exactly
    ``operators/topk.py:topk_per_group``'s blocked shape) which this
    composes with when |stratum| >> N."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang"
    )
    w = Window.partitionBy("source", "lang").orderBy(
        TA.hash60(F.col("doc_id").cast("string"), seed="strat").asc(),
        F.col("doc_id").asc(),
    )
    return (
        docs.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= _STRAT_N)
        .select("doc_id", "source", "lang", "rn")
    )


# ---------------------------------------------------------------------------
# n-gram language-model quality scoring (CCNet-style perplexity filter)


@register(
    "ngram_lm_quality",
    oracle=r"""
WITH ltoks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
  FROM documents),
occ AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)),
                i -> t[i] || ' ' || t[i + 1])) AS bg
  FROM ltoks WHERE len(t) >= 2),
docbg AS (SELECT doc_id, bg, COUNT(*) AS occ FROM occ GROUP BY doc_id, bg),
c2 AS (SELECT bg, COUNT(*) AS c2 FROM occ GROUP BY bg),
c1 AS (
  SELECT string_split(bg, ' ')[1] AS w1, SUM(c2) AS c1
  FROM c2 GROUP BY 1),
vocab AS (
  SELECT COUNT(DISTINCT tok) AS v
  FROM (SELECT unnest(t) AS tok FROM ltoks)),
model AS (
  SELECT c2.bg,
         ROUND(ln((c2.c2 + 1.0) / (c1.c1 + vocab.v)), 6) AS logp
  FROM c2
  JOIN c1 ON c1.w1 = string_split(c2.bg, ' ')[1]
  CROSS JOIN vocab),
scored AS (
  SELECT d.doc_id,
         SUM(d.occ) AS n_bigrams,
         CAST(SUM(CAST(m.logp * d.occ AS DECIMAL(18,6))) AS DOUBLE)
           AS logp_sum
  FROM docbg d JOIN model m USING (bg)
  GROUP BY d.doc_id)
SELECT l.doc_id,
       CAST(COALESCE(s.n_bigrams, 0) AS INT) AS n_bigrams,
       ROUND(s.logp_sum / s.n_bigrams, 6) AS lm_score
FROM ltoks l LEFT JOIN scored s USING (doc_id)
""",
)
def ngram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model quality scoring — the CCNet/LLaMA-style
    "perplexity against a reference corpus" quality filter, with the
    corpus itself as the LM training set: per document, the mean add-one
    log-probability ``ln((c(w1 w2)+1)/(c(w1)+V))`` over its bigram
    occurrences (V = distinct unigram types). Low scores flag
    boilerplate/garbled text; the curation tier thresholds on this the
    same way it thresholds ``text_quality_stats``.

    Cross-engine determinism: each distinct bigram's log-prob is rounded
    to 6 decimals ONCE in the model table, per-doc accumulation then
    multiplies by the exact occurrence count and sums through the
    scaled-long/DECIMAL path — order-independent in both engines, and a
    last-ulp ``ln`` difference can shift a score by at most 1e-6 per
    bigram (the same accepted hazard as ``bm25_search``).

    100 TB plan shape: bigram occurrences partial-aggregate per doc
    map-side, then ONE bigram-keyed shuffle builds c2; c1 is a second
    aggregation of the (vocabulary-sized, far smaller) c2 table; the
    per-doc score join is bigram-keyed against the model. At real scale
    the model table gets the df-cut treatment (drop hapax bigrams —
    `dedup_ngram_dfcut`'s discipline) before the scoring join; the only
    driver value is the scalar V."""
    from mevi_spark.functions.agg import scaled_long
    from mevi_spark.functions.text import norm_tokens

    toks = _docs_spread(spark, sf_dir).select(
        "doc_id", norm_tokens("text").alias("t")
    )
    occ = toks.filter(F.size("t") >= 2).select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("t", 1, F.size("t") - 1),
                F.slice("t", 2, F.size("t") - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("bg"),
    )
    docbg = occ.groupBy("doc_id", "bg").agg(F.count("*").alias("occ"))
    c2 = occ.groupBy("bg").agg(F.count("*").alias("c2"))
    c1 = (
        c2.withColumn("w1", F.split("bg", " ").getItem(0))
        .groupBy("w1")
        .agg(F.sum("c2").alias("c1"))
    )
    v = (
        toks.select(F.explode("t").alias("tok"))
        .agg(F.countDistinct("tok"))
        .first()[0]
    )
    model = (
        c2.withColumn("w1", F.split("bg", " ").getItem(0))
        .join(c1, "w1")
        .select(
            "bg",
            F.round(
                F.log((F.col("c2") + 1.0) / (F.col("c1") + F.lit(float(v)))),
                6,
            ).alias("logp"),
        )
    )
    scored = (
        docbg.join(model, "bg")
        .groupBy("doc_id")
        .agg(
            F.sum("occ").alias("n_bigrams"),
            (
                F.sum(scaled_long(F.col("logp") * F.col("occ"))).cast("double")
                / F.lit(1e6)
            ).alias("logp_sum"),
        )
    )
    return (
        toks.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("int").alias("n_bigrams"),
            F.round(F.col("logp_sum") / F.col("n_bigrams"), 6).alias(
                "lm_score"
            ),
        )
    )


# ---------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis–Spirakis A-ES)


_WSAMP_K = 100


@register(
    "weighted_sample_topk",
    oracle=f"""
WITH wk AS (
  SELECT doc_id, source,
         greatest(n_chars, 1) AS w,
         ROUND(
           -ln(({_h60("'wsamp'", "CAST(doc_id AS VARCHAR)")} + 1)
               / 1152921504606846976.0)
           / greatest(n_chars, 1), 6) AS key
  FROM documents),
rk AS (
  SELECT doc_id, source, w, key,
         ROW_NUMBER() OVER (ORDER BY key ASC, doc_id ASC) AS rn
  FROM wk)
SELECT doc_id, source, CAST(w AS BIGINT) AS w, key, CAST(rn AS INT) AS rn
FROM rk WHERE rn <= {_WSAMP_K}
""",
)
def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement — Efraimidis–Spirakis
    A-ES: each doc draws ``key = -ln(u)/w`` from a hash-derived
    uniform ``u`` and the K smallest keys form an exact weighted
    sample (here w = doc length, the quality-weighted pick a curation
    pass uses when long documents should survive sampling more often
    than stubs). Deterministic end to end: u comes from the seedless
    md5 hash, so the sample is reproducible and — like the stratified
    and rate-based samplers — stable under corpus growth (a new doc
    only displaces the current worst key).

    Cross-engine determinism: keys are rounded to 6 decimals BEFORE
    ranking with a doc_id tiebreak (the ``bm25_search`` discipline —
    a last-ulp ``ln`` difference cannot flip ranks).

    100 TB plan shape: map-only key computation, then a global top-K
    via ``orderBy().limit(K)`` — TakeOrderedAndProject, per-partition
    top-K merged at the driver, never a full sort shuffle; the rank
    window runs over the already-selected K rows only (K rows, one
    bounded partition)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    w = F.greatest(F.col("n_chars"), F.lit(1))
    u = (
        TA.hash60(F.col("doc_id").cast("string"), seed="wsamp") + 1
    ).cast("double") / F.lit(float(1 << 60))
    keyed = docs.select(
        "doc_id",
        "source",
        w.cast("long").alias("w"),
        F.round(-F.log(u) / w, 6).alias("key"),
    )
    top = keyed.orderBy(F.col("key").asc(), F.col("doc_id").asc()).limit(
        _WSAMP_K
    )
    wdw = Window.orderBy(F.col("key").asc(), F.col("doc_id").asc())
    return top.withColumn("rn", F.row_number().over(wdw).cast("int"))


# ---------------------------------------------------------------------------
# frequent items: Misra-Gries candidates + exact recount


# shared with streaming_heavy_hitters (plans/streaming_ops.py): the
# drained incremental summary + exact recount must equal this same
# full group-by
HH_TERMS_ORACLE = r"""
WITH toks AS (
  SELECT unnest(string_split(trim(regexp_replace(regexp_replace(lower(text),
    '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ')) AS term
  FROM documents),
t AS (SELECT term FROM toks WHERE term <> '')
SELECT term, COUNT(*) AS cnt
FROM t GROUP BY term
HAVING COUNT(*) >= CEIL(0.005 * (SELECT COUNT(*) FROM t))
"""


@register("heavy_hitters_terms", oracle=HH_TERMS_ORACLE)
def heavy_hitters_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters (every token at ≥0.5% support, with
    its exact count) via the two-pass Misra-Gries construction
    (``operators/sketch.py``): a shuffle-free bounded-memory candidate
    summary per partition, then an exact recount gated by the
    BROADCAST candidate set — shuffle volume scales with the answer,
    not the vocabulary (the module docstring carries the pigeonhole
    completeness argument). The oracle is the full group-by the
    construction provably equals at this support."""
    from mevi_spark.functions.text import norm_tokens
    from mevi_spark.operators.sketch import heavy_hitters

    docs = _docs_spread(spark, sf_dir)
    toks = docs.select(
        F.explode(norm_tokens("text")).alias("term")
    ).filter(F.col("term") != "")
    return heavy_hitters(toks, "term", 5, 1000)


# ---------------------------------------------------------------------------
# line-level boilerplate removal (CCNet / RefinedWeb)


@register(
    "line_boilerplate_strip",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(lower(text),
    '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
  FROM documents),
lines AS (
  SELECT doc_id,
         ['corpus header boilerplate line'] ||
         list_transform(range(0, GREATEST(1, CAST((len(t)+7)//8 AS INT))),
           i -> array_to_string(list_slice(t, i*8+1, i*8+8), ' ')) ||
         ['corpus footer boilerplate line'] AS ls
  FROM toks),
ex AS (SELECT doc_id, unnest(ls) AS line,
              generate_subscripts(ls, 1) AS line_no
       FROM lines),
dfc AS (SELECT line, COUNT(DISTINCT doc_id) AS df FROM ex GROUP BY line),
boiler AS (SELECT line FROM dfc
           WHERE df > (SELECT COUNT(*) // 5 FROM documents))
SELECT e.doc_id,
       COALESCE(string_agg(e.line, chr(10) ORDER BY e.line_no)
                FILTER (WHERE b.line IS NULL), '') AS clean_text,
       COUNT(*) FILTER (WHERE b.line IS NULL) AS n_kept,
       COUNT(*) FILTER (WHERE b.line IS NOT NULL) AS n_dropped
FROM ex e LEFT JOIN boiler b USING (line)
GROUP BY e.doc_id
""",
)
def line_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level boilerplate removal (CCNet §4.1 / RefinedWeb line-
    wise filtering; ``operators/dedup.py::strip_frequent_lines``): any
    line occurring in >20% of documents is corpus boilerplate and is
    stripped; each document is reassembled from its surviving lines in
    order, with kept/dropped counts.

    The testdata corpus is single-line, so the line STRUCTURE is
    planted deterministically on both engines: tokens chunked into
    8-token lines, wrapped in a shared header and footer line — the
    header/footer hit df = 100% and must be the exact drop set. The
    frequency pass counts on ``hash60(line)`` (8-byte shuffle keys);
    the drop set is broadcast; reassembly is the one doc-keyed
    shuffle."""
    from mevi_spark.functions.text import norm_tokens
    from mevi_spark.operators.dedup import strip_frequent_lines

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    t = _docs_spread(spark, sf_dir).select(
        "doc_id", norm_tokens("text").alias("_t")
    )
    n_lines = F.greatest(
        F.lit(1), F.floor((F.size("_t") + 7) / 8).cast("int")
    )
    body = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.array_join(F.slice(F.col("_t"), i * 8 + 1, 8), " "),
    )
    ls = F.concat(
        F.array(F.lit("corpus header boilerplate line")),
        body,
        F.array(F.lit("corpus footer boilerplate line")),
    )
    lines = t.select(
        "doc_id", F.posexplode(ls).alias("line_no", "line")
    )
    return strip_frequent_lines(lines, n_docs // 5)


# ---------------------------------------------------------------------------
# BPE tokenizer: distributed word-count training + Arrow encode


@register(
    "bpe_roundtrip",
    oracle=r"""
WITH n AS (
  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
    '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS nt
  FROM documents)
SELECT doc_id, md5(nt) AS detok_md5, strlen(nt)::BIGINT AS n_chars_norm
FROM n
""",
)
def bpe_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer end-to-end (``operators/bpe.py``; Sennrich et al.
    2016): learn 50 merges from the corpus's word frequencies (one
    term-keyed shuffle + a bounded driver merge loop — the staged-
    codebook split), encode every document with the map-only Arrow
    kernel, then DETOKENIZE in-plan (concat → replace(EOW, ' ') →
    rtrim) and emit the md5 — the oracle recomputes the same md5
    straight from the normalized source text, so a green row proves
    the learned tokenizer is LOSSLESS over the whole corpus, the
    property a training pipeline actually relies on. Merge semantics
    and compression are pinned against an independent
    re-implementation in ``tests/test_bpe.py`` (iterative training is
    not SQL-expressible; losslessness is, and is checked here)."""
    from mevi_spark.functions.text import norm_tokens
    from mevi_spark.operators.bpe import (
        EOW,
        bpe_encode,
        train_merges,
        word_frequencies,
    )

    docs = _docs_spread(spark, sf_dir)
    t = docs.select("doc_id", norm_tokens("text").alias("_toks"))
    stream = t.select(F.explode("_toks").alias("term")).filter(
        F.col("term") != ""
    )
    merges = train_merges(word_frequencies(stream, min_freq=2), 50)
    enc = bpe_encode(t, merges)
    detok = F.rtrim(
        F.regexp_replace(F.array_join("tokens", ""), EOW, " ")
    )
    return enc.select(
        "doc_id",
        F.md5(detok).alias("detok_md5"),
        F.length(detok).cast("long").alias("n_chars_norm"),
    )


@register(
    "events_value_winsorize",
    oracle="""
WITH q AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS lo,
         quantile_cont(value, 0.95) AS hi
  FROM events GROUP BY event_type)
SELECT e.event_id, e.event_type,
       ROUND(LEAST(GREATEST(e.value, q.lo), q.hi), 6) AS value_w,
       CASE WHEN e.value < q.lo THEN -1
            WHEN e.value > q.hi THEN 1 ELSE 0 END AS clamped
FROM events e JOIN q USING (event_type)
""",
)
def events_value_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization — the standard outlier treatment before
    any value-weighted aggregate or model feature: clamp each event's
    value to its type's exact [p05, p95] band (the same R-7 quantiles
    as ``events_value_quantiles``), flagging which side clamped. The
    quantile table is groups-sized and BROADCASTS back onto the event
    scan, so the rewrite pass is map-only — one grouped sort for the
    thresholds, zero extra shuffles for the data; at 100 TB the
    threshold pass switches to the documented ``approx_percentile``
    t-digest with the identical join shape."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05D)").alias("lo"),
        F.expr("percentile(value, 0.95D)").alias("hi"),
    )
    e = ev.join(F.broadcast(q), "event_type")
    w = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return e.select(
        "event_id",
        "event_type",
        F.round(w, 6).alias("value_w"),
        F.when(F.col("value") < F.col("lo"), -1)
        .when(F.col("value") > F.col("hi"), 1)
        .otherwise(0)
        .alias("clamped"),
    )


# ---------------------------------------------------------------------------
# round-9 additions: chunk-level exact-substring dedup, training-order
# materialization (deterministic global shuffle → fixed-size blocks)


_SQL_CHUNK_DEDUP = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words,
         CAST(ceil(len(string_split(text, ' ')) / 8.0) AS BIGINT) AS nc
  FROM documents),
c AS (
  SELECT doc_id,
         unnest(generate_series(0, nc - 1)) AS idx,
         unnest(list_transform(generate_series(0, nc - 1),
                i -> array_to_string(words[(i*8+1):(i*8+8)], ' '))) AS chunk
  FROM w),
r AS (
  SELECT doc_id, idx, chunk,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS rn
  FROM c),
k AS (SELECT doc_id, idx, chunk FROM r WHERE rn = 1),
agg AS (
  SELECT doc_id, COUNT(*)::BIGINT AS n_kept,
         md5(string_agg(chunk, ' ' ORDER BY idx)) AS rebuilt_md5
  FROM k GROUP BY doc_id)
SELECT d.doc_id,
       CAST(ceil(len(string_split(d.text, ' ')) / 8.0) AS BIGINT)
         AS n_chunks,
       COALESCE(agg.n_kept, 0)::BIGINT AS n_kept,
       COALESCE(agg.rebuilt_md5, md5('')) AS rebuilt_md5
FROM documents d LEFT JOIN agg USING (doc_id)
"""


@register("chunk_dedup_reconstruct", oracle=_SQL_CHUNK_DEDUP)
def chunk_dedup_reconstruct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact-substring dedup at chunk granularity + document
    reconstruction — the distributed form of ExactSubstr dedup (Lee et
    al., "Deduplicating Training Data Makes Language Models Better",
    ACL 2022): each document splits into non-overlapping 8-word chunks;
    a chunk's FIRST occurrence in global (doc_id, position) order
    survives, every later literal repeat anywhere in the corpus is cut;
    documents are rebuilt from their surviving chunks. (The paper's
    suffix-array finds overlapping repeats; fixed chunking is the
    shuffle-friendly approximation — same spirit as MinHash banding vs
    all-pairs.)

    Plan shape (100 TB): chunking is a map-side explode (no shuffle);
    first-occurrence is ONE hash-keyed ``groupBy(md5(chunk)).agg(min(
    struct(doc_id, idx, chunk)))`` — partial-aggregable, so map-side
    combine shrinks the shuffle to ~distinct chunks, strictly better
    than the window row_number() the oracle uses (full sort, no
    combine); rebuild is a second shuffle over the SURVIVOR set only.
    No all-pairs anywhere. The GROUP KEY is the 128-bit md5 of the
    chunk, not the raw 8-word text: the exchange moves 16 key bytes +
    one text payload per (map partition, distinct chunk) instead of
    the text as the key itself — the same hash-key discipline as the
    shingle df-cut and boilerplate strip. Collision tradeoff (same
    accounting as ``operators/dedup.py``): two DIFFERENT chunks
    sharing an md5 would merge their occurrence groups and wrongly
    cut one of them; birthday bound at N distinct chunks is
    ~N²/2^129 — at 2^50 distinct chunks (~40 PB of unique text)
    that is ~2^-29, far below hardware-corruption rates.
    The left join keeps fully-deduplicated docs visible
    (n_kept=0, md5('')) — dropping them silently is how dedup bugs
    hide.
    """
    from mevi_spark.sources.io import spread_small_scan

    # chunking + per-chunk md5 is the map-side CPU; spread the
    # single-row-group scan (identity at production widths)
    docs = spread_small_scan(spark, load_table(spark, sf_dir, "documents"))
    kept = chunk_winners(chunk_grid(docs, 8))
    return rebuild_kept_docs(docs, kept, 8)


def chunk_grid(
    docs: DataFrame,
    w_words: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Map-side explode of ``docs`` into aligned w-word chunks →
    ``(doc_id, idx, chunk)``. ONE definition shared by the batch query
    (``chunk_dedup_reconstruct``), the incremental index
    (``streaming/incremental.py::append_chunk_kept``), and their
    shared oracle — the chunk geometry must not fork."""
    words = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(words) / w_words).cast("long")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
                lambda i: F.array_join(
                    F.slice(words, i * w_words + 1, w_words), " "
                ),
            )
        ).alias("idx", "chunk"),
    )


def chunk_winners(chunked: DataFrame) -> DataFrame:
    """Global first occurrence per chunk — the hash-keyed
    partial-aggregable min-struct kernel → ``(_h, doc_id, idx,
    chunk)``. Shared by the batch pass and the incremental index
    (collision accounting in ``chunk_dedup_reconstruct``)."""
    return (
        chunked.groupBy(F.md5("chunk").alias("_h"))
        .agg(F.min(F.struct("doc_id", "idx", "chunk")).alias("w"))
        .select(
            "_h",
            F.col("w.doc_id").alias("doc_id"),
            F.col("w.idx").alias("idx"),
            F.col("w.chunk").alias("chunk"),
        )
    )


def rebuild_kept_docs(
    docs: DataFrame, kept: DataFrame, w_words: int
) -> DataFrame:
    """Per-doc reconstruction from surviving chunk occurrences →
    ``(doc_id, n_chunks, n_kept, rebuilt_md5)``; fully-deduplicated
    docs stay visible at n_kept=0 / md5(''). Shared by the one-shot
    and incremental chunk-dedup queries against the one oracle."""
    words = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(words) / w_words).cast("long")
    agg = kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "chunk"))),
                    lambda s: s["chunk"],
                ),
                " ",
            )
        ).alias("rebuilt_md5"),
    )
    return (
        docs.select("doc_id", n_chunks.alias("n_chunks"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_chunks",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("rebuilt_md5", F.md5(F.lit(""))).alias("rebuilt_md5"),
        )
    )


@register(
    "global_shuffle_blocks",
    oracle="""
WITH k AS (
  SELECT doc_id,
         ('0x' || substring(md5('shuf|' || doc_id), 1, 15))::BIGINT AS k
  FROM documents),
r AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY k % 32, k, doc_id) - 1 AS pos
  FROM k)
SELECT doc_id, (pos // 64)::BIGINT AS block_id,
       (pos % 64)::BIGINT AS pos_in_block
FROM r
""",
)
def global_shuffle_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-order materialization: a DETERMINISTIC global shuffle
    (hash-ordered, seed-replayable — what a dataloader needs so every
    re-run / resume sees the same sample order) followed by fixed-size
    block assignment (block_id, pos_in_block), the unit a trainer
    checkpoint-resumes at.

    The naive plan is ``row_number() OVER (ORDER BY hash)`` — a GLOBAL
    sort whose final row-numbering collapses to one partition. The
    scale-correct plan materializes the same total order bucket-major:
    hash-bucket each row (``pmod(h, P)``), row_number WITHIN each
    bucket (P-way parallel, one shuffle), then add per-bucket base
    offsets — a P-row agg collected and inlined as a literal map (the
    artifact-vs-corpus split: the corpus never sees a single-partition
    stage). Global position = offset[bucket] + local_rank; the oracle
    pins the exact same order (``ORDER BY k % P, k, doc_id``).
    """
    docs = load_table(spark, sf_dir, "documents")
    assigned, _n = shuffle_block_assign(
        docs, start=0, n_buckets=32, block=64
    )
    return assigned


def shuffle_block_assign(
    df: DataFrame, start: int, n_buckets: int, block: int
) -> tuple[DataFrame, int]:
    """The bucket-major deterministic-shuffle position kernel shared by
    the one-shot materialization and the incremental append: hash-order
    ``df``'s rows (seed-replayable), number them ``start..start+n-1``
    with the P-way-parallel rank + literal offset map (never a
    single-partition sort), and cut positions into ``block``-sized
    blocks. Returns ``(assignment_frame, n_rows)`` — ``n_rows`` is the
    caller's next high-water mark."""
    keyed = df.select(
        "doc_id", TA.hash60(F.col("doc_id").cast("string"), "shuf").alias("k")
    ).withColumn("bucket", F.pmod("k", F.lit(n_buckets)))
    counts = {
        r["bucket"]: r["cnt"]
        for r in keyed.groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    offsets, acc = {}, int(start)
    for b in range(n_buckets):
        offsets[b] = acc
        acc += counts.get(b, 0)
    off_expr = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(b) for b in range(n_buckets)]),
            F.array(*[F.lit(offsets[b]) for b in range(n_buckets)]),
        ),
        F.col("bucket").cast("int"),
    )
    rank = F.row_number().over(
        Window.partitionBy("bucket").orderBy("k", "doc_id")
    )
    pos = (off_expr + rank - 1).cast("long")
    out = keyed.select(
        "doc_id",
        pos.alias("_pos"),
    ).select(
        "doc_id",
        F.expr(f"_pos div {block}").cast("long").alias("block_id"),
        F.pmod("_pos", F.lit(block)).cast("long").alias("pos_in_block"),
    )
    return out, acc - int(start)


_CURR_BUCKETS = 32

# shared by curriculum_order AND streaming_curriculum: the maintained
# order is served through the same ranked_with_bounds kernel over the
# same scoring kernel, so both run against the same SQL
CURRICULUM_ORACLE = f"""
WITH d AS (SELECT doc_id, {_SQL_NORM_T} AS t FROM documents),
s AS (
  SELECT doc_id,
         ROUND(CASE WHEN len(t) = 0 THEN 0.0
               ELSE len(list_filter(t, x -> list_contains({_STOP_SQL}, x)))::DOUBLE / len(t) END, 6) AS score
  FROM d)
SELECT doc_id, score,
       CAST(ROW_NUMBER() OVER (ORDER BY score ASC, doc_id ASC) AS BIGINT)
         AS global_rank
FROM s
"""


@register("curriculum_order", oracle=CURRICULUM_ORACLE)
def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: a TOTAL order over the corpus by a quality
    score (stopword ratio here — the shared ``text_quality_stats``
    kernel; ascending = noisiest text last-to-first removed, the
    easy-to-hard schedule a curriculum dataloader consumes), with the
    global rank materialized WITHOUT a single-partition sort.

    The naive ``row_number() OVER (ORDER BY score)`` collapses the
    final numbering onto one partition — the same trap
    ``global_shuffle_blocks`` documents for hash order, now for a
    VALUE order, where hash bucketing cannot work (buckets must be
    order-aligned: every score in bucket b sorts before every score in
    bucket b+1). The scale-correct plan:

    1. range boundaries from ONE streaming-sketch pass
       (``percentile_approx`` at P−1 equispaced quantiles — mergeable,
       never a sort; boundaries only affect bucket BALANCE, never the
       output, so sketch error is benign and a low-cardinality score
       degrades balance, not correctness);
    2. bucket = count of boundaries strictly below the score (a
       map-side fold over the P−1-element literal array — ties land
       in one bucket together);
    3. exact per-bucket counts → prefix-sum offsets, collected and
       inlined as a P-row literal map (the artifact-vs-corpus split of
       ``shuffle_block_assign``);
    4. ``global_rank = offset[bucket] + rank within bucket`` — P
       parallel windows over (score, doc_id), one keyed shuffle.

    The oracle pins the identical total order with a global
    ROW_NUMBER (it only needs to be correct, not scale)."""
    from mevi_spark.sources.io import spread_small_scan

    # same single-row-group spread as token_budget_mixture: the
    # stopword-ratio scoring tokenizes every row
    docs = spread_small_scan(
        spark,
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
    )
    return ranked_by_range_buckets(
        curriculum_scored(docs), "score", ["doc_id"], n_buckets=_CURR_BUCKETS
    )


_MIX_BUDGET = 12_000
_MIX_WEIGHTS = {"en": 0.40, "fr": 0.20, "de": 0.15, "es": 0.15, "zh": 0.10}
_MIX_ALLOCS = {
    lang: int(w * _MIX_BUDGET) for lang, w in _MIX_WEIGHTS.items()
}


BUDGET_MIXTURE_ORACLE = f"""
WITH d AS (SELECT doc_id, lang, {_SQL_NORM_T} AS t FROM documents),
s AS (
  SELECT doc_id, lang,
         ROUND(CASE WHEN len(t) = 0 THEN 0.0
               ELSE len(list_filter(t, x -> list_contains({_STOP_SQL}, x)))::DOUBLE / len(t) END, 6) AS score,
         len(t) AS n_tok
  FROM d),
c AS (
  SELECT *, SUM(n_tok) OVER (PARTITION BY lang ORDER BY score, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tok
  FROM s),
a AS (SELECT * FROM (VALUES {", ".join(f"('{lang}', {alloc})" for lang, alloc in sorted(_MIX_ALLOCS.items()))})
      AS t(lang, alloc))
SELECT c.lang, doc_id, score, CAST(n_tok AS BIGINT) AS n_tok,
       CAST(cum_tok AS BIGINT) AS cum_tok
FROM c JOIN a USING (lang) WHERE cum_tok <= alloc
"""


@register("token_budget_mixture", oracle=BUDGET_MIXTURE_ORACLE)
def token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture fill — the dataset-assembly step after
    curation: given a total token budget and per-domain mixture
    weights ("fill 1T tokens at 40% en / 20% fr / …"), select each
    domain's BEST documents (the curriculum quality kernel — stopword
    ratio ASC, doc_id tie-break) until its token allocation
    ``floor(w_d · B)`` is exhausted: a doc is selected iff the running
    token total through it stays within the domain's allocation.
    Deterministic (hash-free order, pure token counts), so the fill is
    reproducible and oracle-checkable.

    100 TB shape: token counting and scoring are map-side over ONE
    staged tokenization (the normalize+split chain runs once per row —
    the attribute-staging rule of ``shingle_frame``), persisted as the
    NARROW (doc_id, lang, score, n_tok) frame so the fill's three
    bounded passes never re-tokenize; the per-domain running token
    total goes through :func:`grouped_cumsum_with_bounds` — the
    (group × score-range)-bucketed prefix sum, |domains|·P parallel
    window partitions instead of ONE per domain (partitioning the
    window on the ~5-value lang key alone puts corpus/5 rows in a
    single task at scale — the r12 weak mark); the tiny allocation
    table rides along as a literal map, no join. Greedy
    prefix-by-quality is the standard budget-fill policy (a knapsack
    would buy ≤ one doc per domain). No reference counterpart (the
    reference assembles by fixed id lists); beyond-reference pipeline
    operator."""
    from mevi_spark.operators.cache import defer_unpersist
    from mevi_spark.sources.io import spread_small_scan

    # the one tokenize pass is the query's map-side CPU: spread the
    # single-row-group scan so it runs cluster-wide (identity at
    # production listing sizes; the maintenance store's per-batch
    # budget_scored is NOT spread — small batches, see kmv note)
    docs = spread_small_scan(
        spark,
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "text"
        ),
    )
    scored = budget_scored(docs).persist()
    defer_unpersist(scored)
    probes = [i / _CURR_BUCKETS for i in range(1, _CURR_BUCKETS)]
    bounds = sorted(
        float(b)
        for b in scored.agg(
            F.percentile_approx("score", probes, 10_000).alias("b")
        ).first()["b"]
    )
    return budget_fill(scored, bounds)


def budget_scored(docs: DataFrame) -> DataFrame:
    """``(doc_id, lang, score, n_tok)`` under the budget fill's
    quality kernel — the curriculum's stopword-ratio score plus the
    token count, from ONE staged tokenization. ONE definition shared
    by the batch fill above and the maintenance store's per-batch
    scoring (``streaming/incremental.py``), so the maintained fill
    cannot drift from the batch answer (or their shared oracle)."""
    from mevi_spark.functions.text import norm_tokens

    staged = docs.select(
        "doc_id", "lang", norm_tokens("text").alias("_toks")
    )
    t = F.col("_toks")
    return staged.select(
        "doc_id",
        "lang",
        F.round(TA.stopword_ratio("_toks", toks=t), 6).alias("score"),
        F.size(t).cast("long").alias("n_tok"),
    )


def budget_fill(scored: DataFrame, bounds: list[float]) -> DataFrame:
    """The fill served from a scored frame: per-lang running token
    total in (score, doc_id) order via the bucketed prefix sum under
    ``bounds``, kept while it stays within the lang's literal
    allocation. Shared by the batch query (bounds sketched from the
    same frame) and the maintenance read (bounds pinned in the store's
    sidecar) — output is boundary-invariant like every
    ``ranked_with_bounds`` consumer."""
    filled = grouped_cumsum_with_bounds(
        scored, "lang", "score", ["doc_id"], "n_tok", bounds, "cum_tok"
    )
    langs = sorted(_MIX_ALLOCS)
    alloc = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(lang) for lang in langs]),
            F.array(*[F.lit(_MIX_ALLOCS[lang]) for lang in langs]),
        ),
        F.col("lang"),
    )
    return filled.filter(F.col("cum_tok") <= alloc).select(
        "lang", "doc_id", "score", "n_tok", "cum_tok"
    )


_RAKE_SWEEPS = 6


def _raking_oracle() -> str:
    """Unroll the fixed-sweep IPF recursion as SQL CTEs evaluating the
    LITERAL SAME formula as ``operators/raking.py::ipf_weights6``:
    integer w6 state, exact integer marginals (Σ n·w6 — no float
    accumulation), one double division per scale, floor(x+0.5)
    re-round. With bit-identical inputs every step is bit-identical,
    which is what lets a driver-side Python kernel and a SQL engine
    agree on an iterative fixpoint to the last bit."""
    case = "CASE lang " + " ".join(
        f"WHEN '{lang}' THEN {w}" for lang, w in sorted(_MIX_WEIGHTS.items())
    ) + " END"
    ctes = [
        "cells AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n"
        " FROM documents GROUP BY 1, 2)",
        "tot AS (SELECT CAST(SUM(n) AS BIGINT) AS N FROM cells)",
        # FLOOR before the BIGINT cast: Python's int() truncates while
        # DuckDB's double->BIGINT cast rounds to nearest — at corpus
        # sizes where w·N·1e6 is non-integral the two diverge by one
        # micro-unit and the difference compounds through every IPF
        # sweep (targets are positive, so FLOOR == truncation)
        f"rt AS (SELECT lang, CAST(FLOOR(({case} * CAST(N AS DOUBLE))"
        " * 1000000.0) AS BIGINT) AS t6"
        " FROM (SELECT DISTINCT lang FROM cells) CROSS JOIN tot)",
        "ct AS (SELECT source, CAST(SUM(n) AS BIGINT) * 1000000 AS t6"
        " FROM cells GROUP BY source)",
        "w0 AS (SELECT lang, source, n, CAST(1000000 AS BIGINT) AS w6"
        " FROM cells)",
    ]
    prev = "w0"
    for k in range(_RAKE_SWEEPS):
        ctes.append(
            f"w{k}r AS (SELECT lang, source, n,"
            " CAST(FLOOR(w6 * (t6 / CAST(SUM(n * w6) OVER (PARTITION BY"
            " lang) AS DOUBLE)) + 0.5) AS BIGINT) AS w6"
            f" FROM {prev} JOIN rt USING (lang))"
        )
        ctes.append(
            f"w{k + 1} AS (SELECT lang, source, n,"
            " CAST(FLOOR(w6 * (t6 / CAST(SUM(n * w6) OVER (PARTITION BY"
            " source) AS DOUBLE)) + 0.5) AS BIGINT) AS w6"
            f" FROM w{k}r JOIN ct USING (source))"
        )
        prev = f"w{k + 1}"
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT lang, source, n, CAST(w6 AS DOUBLE) / 1000000.0"
        f" AS weight FROM {prev}"
    )


RAKING_ORACLE = _raking_oracle()


@register("mixture_raking_weights", oracle=RAKING_ORACLE)
def mixture_raking_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPF raking (Deming-Stephan biproportional fitting) of mixture
    weights: per-(lang, source) cell weights such that the weighted
    LANGUAGE marginals hit the training target mix
    (``_MIX_WEIGHTS`` — the same targets the token-budget fill uses)
    while each SOURCE keeps its observed mass — the reweighting a
    domain-mixture pass applies before sampling, when documents can't
    be moved between sources but languages must match the recipe.

    100 TB shape (the artifact-vs-corpus split): the corpus appears in
    exactly ONE groupBy building the |langs|·|sources| cell table; the
    fixed-sweep iterations run driver-side on the collected k-bounded
    cells through ``operators/raking.py::ipf_weights6`` — the
    codebook-class bounded collect, zero iteration shuffles (16
    window-function passes over a 100-row frame would buy nothing but
    exchanges). Deterministic to the bit against the oracle's unrolled
    SQL recursion because both run integer-exact marginals and the
    identical floor(x+0.5) re-round (see the kernel docstring)."""
    cells = [
        (r["lang"], r["source"], r["n"])
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count("*").cast("long").alias("n"))
        .collect()
    ]
    return rake_cells(spark, cells)


def rake_cells(
    spark: SparkSession, cells: list[tuple[str, str, int]]
) -> DataFrame:
    """Driver-side re-rake of a collected (lang, source, n) cell list
    against the ``_MIX_WEIGHTS`` targets — ONE definition shared by
    the batch query above and the maintenance read
    (``streaming/incremental.py::mixture_cells_state`` → re-rake), so
    the maintained weights cannot drift from the batch answer (or
    their shared oracle)."""
    from mevi_spark.operators.raking import ipf_weights6

    extra = sorted({lang for lang, _, _ in cells} - set(_MIX_WEIGHTS))
    if extra:
        # the oracle's CASE yields NULL weights for a lang outside the
        # target mix while the kernel's skip convention would keep
        # w6 = 1.0 — refuse loudly instead of diverging silently
        raise ValueError(
            f"rake_cells: observed langs {extra} have no"
            f" target in _MIX_WEIGHTS {sorted(_MIX_WEIGHTS)}"
        )
    n_total = sum(n for _, _, n in cells)
    row_t6 = {
        lang: int((w * float(n_total)) * 1_000_000.0)
        for lang, w in _MIX_WEIGHTS.items()
    }
    col_t6: dict[str, int] = {}
    for _, src, n in cells:
        col_t6[src] = col_t6.get(src, 0) + int(n) * 1_000_000
    w6 = ipf_weights6(cells, row_t6, col_t6, sweeps=_RAKE_SWEEPS)
    rows = [
        (lang, src, int(n), w6[(lang, src)] / 1_000_000.0)
        for lang, src, n in cells
    ]
    return spark.createDataFrame(
        rows, "lang string, source string, n bigint, weight double"
    )


def curriculum_scored(docs: DataFrame) -> DataFrame:
    """``(doc_id, score)`` under the curriculum's quality kernel
    (stopword ratio, rounded 6dp) — ONE definition shared by the batch
    ordering above and the maintenance store's per-batch scoring
    (``streaming/incremental.py::incremental_curriculum``), so the
    maintained order cannot drift from the batch answer (or their
    shared oracle)."""
    from mevi_spark.functions.text import norm_tokens

    return docs.select(
        "doc_id",
        F.round(
            TA.stopword_ratio(
                "text", toks=norm_tokens("text")
            ),
            6,
        ).alias("score"),
    )


def ranked_by_range_buckets(
    df: DataFrame,
    score_col: str,
    tie_cols: list[str],
    n_buckets: int,
) -> DataFrame:
    """Attach ``global_rank`` = position in the total order
    ``(score_col ASC, *tie_cols ASC)`` via order-aligned range buckets
    — the value-ordered sibling of :func:`shuffle_block_assign`'s
    bucket-major numbering (never a single-partition window).

    ``df`` is persisted here: the one-shot ordering reads it THREE
    times (the percentile sketch, the per-bucket counts, the final
    windows), and when the score is an expression over raw text —
    ``curriculum_order``'s tokenizer — each un-persisted pass re-runs
    the whole map-side CPU (measured at sf1: 6.7 s → ~3 s). The
    maintenance path calls :func:`ranked_with_bounds` directly on its
    store read and is unaffected."""
    from mevi_spark.operators.cache import defer_unpersist

    df = df.persist()
    defer_unpersist(df)
    probes = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.agg(
        F.percentile_approx(score_col, probes, 10_000).alias("b")
    ).first()["b"]
    return ranked_with_bounds(df, score_col, tie_cols, list(bounds))


def ranked_with_bounds(
    df: DataFrame,
    score_col: str,
    tie_cols: list[str],
    bounds: list[float],
) -> DataFrame:
    """The bucket-assign → offsets → per-bucket windows tail of
    :func:`ranked_by_range_buckets`, parameterized on an EXPLICIT
    boundary list — the shared kernel between the one-shot ordering
    (boundaries sketched from the same frame) and the maintenance
    store (boundaries pinned in a sidecar, refined by re-split:
    ``streaming/incremental.py::curriculum_state``). The output is
    invariant to the boundary choice — boundaries only balance the P
    parallel windows; bucket = count of boundaries strictly below the
    score, so every score in bucket b orders before every score in
    bucket b+1 for ANY sorted boundary list, and refining boundaries
    can never reorder."""
    n_buckets = len(bounds) + 1
    bounds_arr = F.array(*[F.lit(float(b)) for b in bounds])
    bucket = F.aggregate(
        bounds_arr,
        F.lit(0),
        lambda acc, b: acc
        + F.when(F.col(score_col) > b, F.lit(1)).otherwise(F.lit(0)),
    )
    keyed = df.withColumn("_bkt", bucket)
    counts = {
        r["_bkt"]: r["cnt"]
        for r in keyed.groupBy("_bkt").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for b in range(n_buckets):
        offsets[b] = acc
        acc += counts.get(b, 0)
    off_expr = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(b) for b in range(n_buckets)]),
            F.array(*[F.lit(offsets[b]) for b in range(n_buckets)]),
        ),
        F.col("_bkt").cast("int"),
    )
    rank = F.row_number().over(
        Window.partitionBy("_bkt").orderBy(
            F.asc(score_col), *[F.asc(c) for c in tie_cols]
        )
    )
    return keyed.select(
        *df.columns, (off_expr + rank).cast("long").alias("global_rank")
    )


def grouped_cumsum_with_bounds(
    df: DataFrame,
    group_col: str,
    score_col: str,
    tie_cols: list[str],
    weight_col: str,
    bounds: list[float],
    out_col: str,
) -> DataFrame:
    """Per-group running total of ``weight_col`` in ``(score_col ASC,
    *tie_cols ASC)`` order — the grouped sibling of
    ``operators/cumsum.py::bucketed_cum_before`` on
    :func:`ranked_with_bounds`' order-aligned range buckets. A window
    partitioned on the group key alone puts each group's ENTIRE
    history through one task (one reducer per domain when the key has
    ~5 values); instead:

    1. bucket = count of ``bounds`` strictly below the score (map-side
       literal fold — identical to ``ranked_with_bounds``, so every
       score in bucket b orders before bucket b+1 within its group for
       ANY sorted boundary list, and the result is boundary-INVARIANT);
    2. exact per-(group, bucket) weight totals → per-group prefix
       offsets, collected and inlined as a literal map (bounded at
       |groups|·|buckets| entries — artifact, never corpus);
    3. running total = offset[(group, bucket)] + within-bucket window
       sum — |groups|·P parallel window partitions, one keyed shuffle.

    ``weight_col`` must be integral: the driver-side offsets
    accumulate in Python ints and would silently truncate fractional
    sums (the ``bucketed_cum_before`` contract)."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    wt = df.schema[weight_col].dataType
    if not isinstance(wt, (ByteType, ShortType, IntegerType, LongType)):
        raise TypeError(
            f"grouped_cumsum_with_bounds needs an integral weight column;"
            f" {weight_col} is {wt.simpleString()}"
        )
    if bounds:
        bounds_arr = F.array(*[F.lit(float(b)) for b in bounds])
        bucket = F.aggregate(
            bounds_arr,
            F.lit(0),
            lambda acc, b: acc
            + F.when(F.col(score_col) > b, F.lit(1)).otherwise(F.lit(0)),
        )
    else:
        bucket = F.lit(0)
    keyed = df.withColumn("_bkt", bucket)
    totals = (
        keyed.groupBy(group_col, "_bkt")
        .agg(F.sum(weight_col).alias("_w"))
        .collect()
    )
    per_group: dict[str, list[tuple[int, int]]] = {}
    for r in totals:
        per_group.setdefault(r[group_col], []).append(
            (int(r["_bkt"]), int(r["_w"]))
        )
    entries: list[tuple[str, int]] = []
    for g, lst in per_group.items():
        acc = 0
        for b, wsum in sorted(lst):
            entries.append((f"{g}\x1f{b}", acc))
            acc += wsum
    if entries:
        offset = F.element_at(
            F.map_from_arrays(
                F.array(*[F.lit(k) for k, _ in entries]),
                F.array(*[F.lit(v).cast("long") for _, v in entries]),
            ),
            F.concat_ws(
                "\x1f", F.col(group_col), F.col("_bkt").cast("string")
            ),
        )
    else:
        offset = F.lit(0).cast("long")
    w = (
        Window.partitionBy(group_col, "_bkt")
        .orderBy(F.asc(score_col), *[F.asc(c) for c in tie_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return keyed.select(
        *df.columns,
        (offset + F.sum(weight_col).over(w)).cast("long").alias(out_col),
    )


def append_shuffle_blocks(
    spark: SparkSession,
    state_dir: str,
    batch: DataFrame,
    batch_id: int,
    n_buckets: int = 32,
    block: int = 64,
) -> int:
    """Extend the deterministic training order with an appended batch
    WITHOUT reshuffling history (VERDICT r9 next-round #7): the batch
    gets positions ``total..total+n-1`` — its rows continue from the
    current high-water mark, filling the trailing partial block first
    and then opening blocks past it — ordered within the batch by the
    same bucket-major hash order as the one-shot kernel. Every prior
    row's ``(block_id, pos_in_block)`` is immutable, which is the
    property a checkpoint-resuming trainer actually needs.

    The maintained order is therefore batch-major then hash-ordered:
    ``ORDER BY batch, k % P, k, doc_id`` — deterministic given batch
    boundaries (the oracle pins exactly this order).

    State is one dir per batch (``b<batch_id:09>``) holding that
    batch's assignment rows plus a ``_meta.json`` with its ``(start,
    n)``. Replay-idempotent with no merge step, like the rollup sink:
    a replayed batch recomputes the SAME start (sum of strictly-prior
    batch dirs' counts — its own possibly-half-written dir never
    feeds its offset) and overwrites its own dir with identical rows.
    Per batch: one P-way window over the BATCH plus a P-row collect —
    history is never read, let alone reshuffled. Returns the batch's
    row count."""
    import glob
    import json
    import os
    import re

    bid = int(batch_id)
    start = 0
    for d in sorted(glob.glob(os.path.join(state_dir, "b*"))):
        m = re.fullmatch(r"b(\d{9})", os.path.basename(d))
        if m is None or int(m.group(1)) >= bid:
            continue
        meta_path = os.path.join(d, "_meta.json")
        try:
            with open(meta_path, encoding="utf-8") as fh:
                start += int(json.load(fh)["n"])
        except (OSError, ValueError, KeyError) as e:
            raise RuntimeError(
                f"shuffle-block state dir {d} has no readable _meta.json"
                f" — a prior batch never finished publishing; rerun the"
                f" stream from its checkpoint"
            ) from e
    assigned, n = shuffle_block_assign(batch, start, n_buckets, block)
    out_dir = os.path.join(state_dir, f"b{bid:09d}")
    assigned.write.mode("overwrite").parquet(out_dir)
    with open(os.path.join(out_dir, "_meta.json"), "w", encoding="utf-8") as fh:
        json.dump({"start": start, "n": int(n)}, fh)
    return int(n)


def read_shuffle_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The maintained assignment: union of the per-batch dirs."""
    import glob
    import os
    import re

    dirs = sorted(
        d
        for d in glob.glob(os.path.join(state_dir, "b*"))
        if re.fullmatch(r"b(\d{9})", os.path.basename(d))
    )
    if not dirs:
        raise FileNotFoundError(f"no shuffle-block state under {state_dir}")
    return spark.read.parquet(*dirs)


# ---------------------------------------------------------------------------
# round-10: overlapping-grid exact-substring coverage


def chunk_cut_positions(
    docs: DataFrame, w_words: int = 8, offsets: tuple[int, ...] = (0,)
) -> DataFrame:
    """Cut positions for chunk-level exact-substring dedup over one or
    more SHIFTED chunk grids (Lee et al., ACL 2022 §4): for each grid
    offset ``o`` a document yields w-word chunks starting at word
    positions ``o, o+w, o+2w, …``; ALL grids' chunks pool into one
    global first-occurrence pass, and every non-first occurrence is a
    cut ``(doc_id, start)``.

    Why multiple grids: the single aligned grid only catches a repeat
    whose two occurrences sit at the SAME word offset modulo w — a
    literal copy shifted by any other amount escapes it entirely (the
    failure mode Lee et al.'s suffix array exists to close). Pooling
    grids at offsets ``(0, w/2)`` catches relative shifts ≡ 0
    (mod w/2), doubling coverage for the cost of 2× chunk rows; the
    general form with offsets ``0..w-1`` degenerates to every-word
    shingles (n-gram Jaccard territory). This is the standard cheap
    midpoint between aligned chunking and a distributed suffix array.

    Plan shape (100 TB): per-grid chunking is the same map-side
    explode; cuts are the non-first rows of a ``row_number`` window
    over ``md5(chunk)`` (16-byte keys on the exchange, not text —
    collision accounting in ``chunk_dedup_reconstruct``). The window
    replaced the r12 form (min-struct aggregate + equi-join of the
    chunk rows back to their group's winner): this query needs every
    NON-winner, so the join side shipped ALL chunk rows regardless —
    the aggregate's map-side combine bought nothing — while the
    self-referencing two-sided plan computed the split+md5 chunk
    subtree twice (no exchange reuse between a groupBy child and the
    bare frame). One window = one chunk-compute pass, one exchange,
    same per-key skew exposure as the join it replaces (both route
    every occurrence of a hot chunk to one task; the window is
    sort-based and spills, never a collect_list). Measured at sf1:
    8.6 s → 3.7-4.2 s warm, 8 Exchanges → 6 per consumer query
    (plans/r13). Unlike
    ``chunk_dedup_reconstruct``, whose winners-only output keeps the
    partial-aggregable min-struct strictly better than a window —
    that one is deliberately unchanged.
    """
    if len({int(o) % int(w_words) for o in offsets}) != len(offsets) or any(
        not (0 <= int(o) < int(w_words)) for o in offsets
    ):
        # offsets equal modulo w duplicate every aligned start row,
        # double-counting n_cut and corrupting cut_md5
        raise ValueError(
            f"grid offsets {offsets} must be distinct and in [0, "
            f"{w_words})"
        )
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    grids = []
    for off in offsets:
        seq = F.sequence(
            F.lit(int(off)), n - 1, F.lit(int(w_words))
        ).cast("array<int>")
        if off > 0:
            seq = F.when(n > off, seq).otherwise(
                F.array().cast("array<int>")
            )
        grids.append(seq)
    starts = grids[0] if len(grids) == 1 else F.concat(*grids)
    chunked = (
        docs.select("doc_id", words.alias("_w"), starts.alias("_starts"))
        .select("doc_id", "_w", F.explode("_starts").alias("start"))
        .select(
            "doc_id",
            "start",
            F.md5(
                F.array_join(
                    F.slice("_w", F.col("start") + 1, w_words), " "
                )
            ).alias("_h"),
        )
    )
    w = Window.partitionBy("_h").orderBy("doc_id", "start")
    return (
        chunked.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .select("doc_id", "start")
    )


def planted_shifted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table planted with exact copies (``doc_id % 7`` →
    ``+100000``, verbatim) and SHIFTED copies (``doc_id % 5`` →
    ``+200000``, 4-word deterministic prefix). ONE definition shared by
    ``chunk_dedup_overlap`` and ``chunk_dedup_overlap_reconstruct`` —
    both oracles repeat the same plant in SQL, so it must not fork.

    Spread like ``_corpus``: the chunkers split/slice/md5 every row,
    and the single-row-group fixture otherwise plans the whole map
    stage onto |branches| tasks (identity at production widths)."""
    from mevi_spark.sources.io import spread_small_scan

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return spread_small_scan(
        spark,
        docs.unionByName(
            docs.filter(F.col("doc_id") % 7 == 0).select(
                (F.col("doc_id") + 100000).alias("doc_id"), "text"
            )
        ).unionByName(
            docs.filter(F.col("doc_id") % 5 == 0).select(
                (F.col("doc_id") + 200000).alias("doc_id"),
                F.concat(
                    F.lit("shift0 shift1 shift2 shift3 "), F.col("text")
                ).alias("text"),
            )
        )
    )


@register(
    "chunk_dedup_overlap",
    oracle="""
WITH src AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 200000 AS doc_id,
         'shift0 shift1 shift2 shift3 ' || text AS text
  FROM documents WHERE doc_id % 5 = 0),
w AS (
  SELECT doc_id, string_split(text, ' ') AS words,
         len(string_split(text, ' ')) AS n
  FROM src),
c AS (
  SELECT doc_id, s AS start,
         array_to_string(words[(s+1):(s+8)], ' ') AS chunk
  FROM (SELECT doc_id, words,
               unnest(list_concat(
                 generate_series(0, n - 1, 8),
                 CASE WHEN n > 4 THEN generate_series(4, n - 1, 8)
                      ELSE []::BIGINT[] END)) AS s
        FROM w)),
r AS (
  SELECT doc_id, start,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, start) AS rn
  FROM c),
agg AS (
  SELECT doc_id, COUNT(*)::BIGINT AS n_cut,
         md5(string_agg(start::VARCHAR, ',' ORDER BY start)) AS cut_md5
  FROM r WHERE rn > 1 GROUP BY doc_id)
SELECT w.doc_id,
       (ceil(w.n / 8.0) + CASE WHEN w.n > 4 THEN ceil((w.n - 4) / 8.0)
                               ELSE 0 END)::BIGINT AS n_chunks,
       COALESCE(agg.n_cut, 0)::BIGINT AS n_cut,
       COALESCE(agg.cut_md5, md5('')) AS cut_md5
FROM w LEFT JOIN agg USING (doc_id)
""",
)
def chunk_dedup_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup with OVERLAPPING grid coverage
    (:func:`chunk_cut_positions` at offsets ``(0, 4)``): the corpus is
    planted with exact copies (``doc_id % 7`` → ``+100000``, verbatim
    — a grid-ALIGNED repeat the base pass also catches) and SHIFTED
    copies (``doc_id % 5`` → ``+200000``, a 4-word deterministic
    prefix prepended — every chunk of the copy sits at offset 4
    relative to the original, which the single aligned grid of
    ``chunk_dedup_reconstruct`` provably misses and the pooled
    half-shifted grid catches; the miss is pinned by
    ``tests/test_chunk_dedup.py``). Output per doc: total pooled chunk
    count, number of cut positions, and the md5 of the sorted cut
    start list — position-exact, so a grid-phase bug cannot hide
    behind counts."""
    planted = planted_shifted_docs(spark, sf_dir)
    cuts = chunk_cut_positions(planted, w_words=8, offsets=(0, 4))
    agg = cuts.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_cut"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("start")),
                    lambda s: s.cast("string"),
                ),
                ",",
            )
        ).alias("cut_md5"),
    )
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    n_chunks = (
        F.ceil(n / 8)
        + F.when(n > 4, F.ceil((n - 4) / 8)).otherwise(F.lit(0))
    ).cast("long")
    return (
        planted.select("doc_id", n_chunks.alias("n_chunks"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_chunks",
            F.coalesce("n_cut", F.lit(0)).cast("long").alias("n_cut"),
            F.coalesce("cut_md5", F.md5(F.lit(""))).alias("cut_md5"),
        )
    )


@register(
    "chunk_dedup_overlap_reconstruct",
    oracle=r"""
WITH src AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 200000 AS doc_id,
         'shift0 shift1 shift2 shift3 ' || text AS text
  FROM documents WHERE doc_id % 5 = 0),
w AS (
  SELECT doc_id, string_split(text, ' ') AS words,
         len(string_split(text, ' ')) AS n
  FROM src),
c AS (
  SELECT doc_id, s AS start,
         array_to_string(words[(s+1):(s+8)], ' ') AS chunk
  FROM (SELECT doc_id, words,
               unnest(list_concat(
                 generate_series(0, n - 1, 8),
                 CASE WHEN n > 4 THEN generate_series(4, n - 1, 8)
                      ELSE []::BIGINT[] END)) AS s
        FROM w)),
r AS (
  SELECT doc_id, start,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, start) AS rn
  FROM c),
cuts AS (SELECT doc_id, start FROM r WHERE rn > 1),
cov AS (
  SELECT DISTINCT c.doc_id, c.start + o.o AS pos
  FROM cuts c CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS o) o),
wp AS (
  SELECT doc_id, words, unnest(generate_series(0, n - 1)) AS pos FROM w),
wp2 AS (SELECT doc_id, pos, words[pos + 1] AS word FROM wp),
kept AS (SELECT wp2.* FROM wp2 ANTI JOIN cov USING (doc_id, pos)),
agg AS (
  SELECT doc_id, COUNT(*)::BIGINT AS n_kept_words,
         md5(string_agg(word, ' ' ORDER BY pos)) AS rebuilt_md5
  FROM kept GROUP BY doc_id)
SELECT w.doc_id, w.n::BIGINT AS n_words,
       COALESCE(agg.n_kept_words, 0)::BIGINT AS n_kept_words,
       COALESCE(agg.rebuilt_md5, md5('')) AS rebuilt_md5
FROM w LEFT JOIN agg USING (doc_id)
""",
)
def chunk_dedup_overlap_reconstruct(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Document REBUILD under overlapping-grid exact-substring dedup —
    the operator a trainer actually runs (VERDICT r10 next-round #3:
    ``chunk_dedup_overlap`` emits cut positions only; this consumes
    them). Cut spans from the two pooled grids (offsets 0 and w/2)
    overlap and interleave, so the kept-text rule is defined at WORD
    granularity: a word is dropped iff it is covered by ANY cut span
    ``[start, start+w)``; the document is rebuilt from the surviving
    words in order. Same plant as ``chunk_dedup_overlap`` (exact copy
    at +100000, 4-word-shifted copy at +200000 — the shifted copy's
    cuts come from the half-offset grid).

    Plan shape (100 TB): cut extraction is :func:`chunk_cut_positions`
    (hash-keyed first-occurrence window — no all-pairs, 16-byte
    exchange keys); the rebuild joins each doc's cut list back
    as ONE sorted array (per-doc bounded: ≤ n_words/ (w/2) cuts) and
    drops covered words in a single map-side higher-order filter —
    word-level coverage never explodes to one row per covered word on
    the Spark side (the oracle does explode; it only needs to be
    correct, not fast)."""
    planted = planted_shifted_docs(spark, sf_dir)
    cuts = chunk_cut_positions(planted, w_words=8, offsets=(0, 4))
    return rebuild_covered_words(planted, cuts, w_words=8)


def rebuild_covered_words(
    docs: DataFrame, cuts: DataFrame, w_words: int
) -> DataFrame:
    """Word-granularity rebuild from a cut-position set → ``(doc_id,
    n_words, n_kept_words, rebuilt_md5)``: drop every word covered by
    any cut span ``[start, start+w)``, keep the rest in order. One
    doc-keyed aggregation of the (per-doc bounded) cut list + one
    broadcast-or-shuffle join back to the docs; the coverage test is a
    map-side ``filter(words, (word, i) -> NOT exists(cut <= i < cut+w))``
    — O(words × cuts) per row with both factors bounded by document
    length, never a corpus-sized explode."""
    cut_arr = cuts.groupBy("doc_id").agg(
        F.array_sort(F.collect_list("start")).alias("_cuts")
    )
    words = F.split(F.col("text"), " ")
    cut_col = F.coalesce(F.col("_cuts"), F.array().cast("array<int>"))
    kept = F.filter(
        words,
        lambda w, i: ~F.exists(
            cut_col, lambda c: (i >= c) & (i < c + F.lit(int(w_words)))
        ),
    )
    return docs.join(cut_arr, "doc_id", "left").select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.size(kept).cast("long").alias("n_kept_words"),
        F.md5(F.array_join(kept, " ")).alias("rebuilt_md5"),
    )


# ---------------------------------------------------------------------------
# round-10: SemDeDup cluster-then-cosine semantic dedup


def planted_embeddings(spark: SparkSession, sf_dir: str, dim: int = 64) -> DataFrame:
    """The embeddings table with planted duplicates — exact copies
    (``vec_id % 10`` → ``+100000``) and first-element-perturbed near
    copies (``vec_id % 7`` → ``+200000``, +0.05 on element 1). ONE
    definition shared by ``semantic_dedup`` and its streaming twin
    (``plans/streaming_ops.py::streaming_semdedup``) — both check
    against the same oracle (``_SQL_SEMDEDUP``'s ``evec`` CTE is the
    SQL twin), so the plant must not fork."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    perturbed = F.concat(
        F.array(F.element_at(v, 1) + F.lit(0.05)), F.slice(v, 2, dim - 1)
    )
    return (
        emb.select("vec_id", "label", v.alias("embedding"))
        .unionByName(
            emb.filter(F.col("vec_id") % 10 == 0).select(
                (F.col("vec_id") + 100000).alias("vec_id"),
                "label",
                v.alias("embedding"),
            )
        )
        .unionByName(
            emb.filter(F.col("vec_id") % 7 == 0).select(
                (F.col("vec_id") + 200000).alias("vec_id"),
                "label",
                perturbed.alias("embedding"),
            )
        )
    )


_SQL_SEMDEDUP = """
WITH evec AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, label, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id % 10 = 0
  UNION ALL
  SELECT vec_id + 200000 AS vec_id, label,
         list_concat([embedding[1]::DOUBLE + 0.05],
                     (embedding::DOUBLE[])[2:]) AS v
  FROM embeddings WHERE vec_id % 7 = 0),
cent AS (
  SELECT code, list(m ORDER BY pos) AS centroid FROM (
    SELECT label AS code, pos,
           CAST(SUM(CAST(val AS DECIMAL(28,12))) AS DOUBLE)/COUNT(*) AS m
    FROM (SELECT label, unnest(v) AS val, generate_subscripts(v, 1) AS pos
          FROM evec)
    GROUP BY label, pos) GROUP BY code),
assigned AS (
  SELECT vec_id, v, code, centroid FROM (
    SELECT e.vec_id, e.v, c.code, c.centroid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             list_dot_product(c.centroid, c.centroid)
               - 2 * list_dot_product(e.v, c.centroid) ASC,
             c.code ASC) AS rn
    FROM evec e, cent c) WHERE rn = 1),
scored AS (
  SELECT vec_id, code, v,
         CASE WHEN sqrt(list_dot_product(v, v))
                   * sqrt(list_dot_product(centroid, centroid)) = 0
              THEN 0.0
              ELSE list_dot_product(v, centroid)
                   / (sqrt(list_dot_product(v, v))
                      * sqrt(list_dot_product(centroid, centroid)))
         END AS cc
  FROM assigned),
pruned AS (
  SELECT a.vec_id
  FROM scored a JOIN scored b
    ON a.code = b.code AND a.vec_id <> b.vec_id
   AND (CASE WHEN sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v)) = 0
             THEN 0.0
             ELSE list_dot_product(a.v, b.v)
                  / (sqrt(list_dot_product(a.v, a.v))
                     * sqrt(list_dot_product(b.v, b.v)))
        END) >= 0.95
   AND (b.cc < a.cc OR (b.cc = a.cc AND b.vec_id < a.vec_id))
  GROUP BY a.vec_id)
SELECT s.vec_id, s.code, ROUND(s.cc, 6) AS cent_cosine,
       CAST(p.vec_id IS NULL AS BIGINT) AS kept
FROM scored s LEFT JOIN pruned p USING (vec_id)
"""


@register("semantic_dedup", oracle=_SQL_SEMDEDUP)
def semantic_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup as a registered curation operator
    (:func:`mevi_spark.operators.dedup.semantic_dedup`, Abbas et al.
    2023): the embeddings table is planted with exact copies
    (``vec_id % 10`` → ``+100000``, cosine exactly 1) and perturbed
    near-copies (``vec_id % 7`` → ``+200000``, first element +0.05 —
    cosine just under 1), clustered by label-seeded centroid-average
    k-means assignment (the same deterministic codebook machinery as
    ``rq_assign_nearest``), and pruned within clusters at τ=0.95
    keeping the lowest-centroid-cosine member of each duplicate
    group. The oracle recomputes assignment, both cosines, and the
    keep-priority tournament in SQL, so a green row pins cluster
    routing AND the prune decision per vector."""
    return semantic_dedup_frame(spark, sf_dir)


@register("semantic_dedup_banded", oracle=_SQL_SEMDEDUP)
def semantic_dedup_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with the giant-cluster guard FORCED ON (cap = 32,
    below the fixture's largest cluster — 70 members at sf0.01), so
    the sign-LSH banded candidate path — the plan every skewed
    cluster takes at 100 TB under the default cap of 1024 — is
    hash-verified against the SAME exact all-pairs tournament oracle
    as ``semantic_dedup``. Equality is a fixture property the gate now
    pins: the planted duplicates sit at cosine 1 and ≈1 (first element
    +0.05), far above τ=0.95, so every true pair shares sign bands
    and the banded candidates lose nothing (the r12 cap-default drop
    to 1024 left the above-cap path verified only by a toy pytest —
    this row puts it under the driver gate at fixture scale)."""
    return semantic_dedup_frame(spark, sf_dir, giant_cluster_cap=32)


def semantic_dedup_frame(
    spark: SparkSession, sf_dir: str, giant_cluster_cap: int = 1024
) -> DataFrame:
    """The registered SemDeDup plan with an overridable giant-cluster
    cap — the scale bench (``tools/bench_compare.py``) times the
    GUARDED path (cap below the planted cluster size) at sf1, the plan
    a 100 TB deployment with a skewed cluster would actually run,
    while the registered query keeps the default cap (exact at fixture
    scale, oracle-checked); ``semantic_dedup_banded`` gate-pins the
    guarded path's oracle equality at sf0.01."""
    from mevi_spark.operators.dedup import semantic_dedup
    from mevi_spark.operators.rq import rq_level_centroids

    planted = planted_embeddings(spark, sf_dir)
    cents = rq_level_centroids(planted, code_col="label", vec_col="embedding")
    return semantic_dedup(
        planted,
        cents,
        id_col="vec_id",
        vec_col="embedding",
        threshold=0.95,
        giant_cluster_cap=giant_cluster_cap,
    )


@register(
    "shuffle_blocks_append",
    oracle="""
WITH m AS (SELECT max(doc_id) AS mx FROM documents),
k AS (
  SELECT doc_id,
         ('0x' || substring(md5('shuf|' || doc_id), 1, 15))::BIGINT AS k,
         CASE WHEN doc_id <= (SELECT mx // 3 FROM m) THEN 0
              WHEN doc_id <= (SELECT 2 * mx // 3 FROM m) THEN 1
              ELSE 2 END AS g
  FROM documents),
r AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY g, k % 32, k, doc_id) - 1 AS pos
  FROM k)
SELECT doc_id, (pos // 64)::BIGINT AS block_id,
       (pos % 64)::BIGINT AS pos_in_block
FROM r
""",
)
def shuffle_blocks_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic-shuffle block assignment maintained
    INCREMENTALLY (:func:`append_shuffle_blocks`): the corpus arrives
    as three doc-id-ordered batches; each gets positions past the
    running high-water mark, hash-ordered within itself, with history
    immutable. The oracle pins the exact documented total order —
    ``ORDER BY batch, k % 32, k, doc_id`` — so a green row proves the
    per-batch offsets, the within-batch bucket-major numbering, AND
    the block arithmetic all compose across appends."""
    import shutil
    import tempfile

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    mx = docs.agg(F.max("doc_id")).first()[0] or 0
    cuts = (int(mx) // 3, 2 * int(mx) // 3)
    batches = [
        docs.filter(F.col("doc_id") <= cuts[0]),
        docs.filter(
            (F.col("doc_id") > cuts[0]) & (F.col("doc_id") <= cuts[1])
        ),
        docs.filter(F.col("doc_id") > cuts[1]),
    ]
    base = tempfile.mkdtemp(prefix="mevi_shufapp_")
    try:
        for i, b in enumerate(batches):
            append_shuffle_blocks(spark, f"{base}/state", b, batch_id=i)
        out = read_shuffle_state(spark, f"{base}/state").localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


@register("chunk_dedup_append", oracle=_SQL_CHUNK_DEDUP)
def chunk_dedup_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact-substring first-occurrence index maintained
    INCREMENTALLY (``streaming/incremental.py::append_chunk_kept``):
    the corpus arrives as three doc-id-ascending batches; each batch's
    within-batch winners probe the index bucket-pruned and only the
    fresh chunks' buckets republish (untouched dirs hardlink forward).
    Because batches ascend in doc_id, first-arrival equals the global
    (doc_id, idx) minimum, so the drained index reconstructs documents
    EXACTLY as the one-shot ``chunk_dedup_reconstruct`` — the
    identical oracle checks n_chunks, n_kept, and the rebuilt-document
    md5 per doc."""
    import shutil
    import tempfile

    from mevi_spark.streaming.incremental import append_chunk_kept

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mx = docs.agg(F.max("doc_id")).first()[0] or 0
    cuts = (int(mx) // 3, 2 * int(mx) // 3)
    batches = [
        docs.filter(F.col("doc_id") <= cuts[0]),
        docs.filter(
            (F.col("doc_id") > cuts[0]) & (F.col("doc_id") <= cuts[1])
        ),
        docs.filter(F.col("doc_id") > cuts[1]),
    ]
    base = tempfile.mkdtemp(prefix="mevi_chapp_")
    try:
        for b in batches:
            append_chunk_kept(spark, f"{base}/state", b)
        kept = spark.read.parquet(f"{base}/state")
        out = rebuild_kept_docs(docs, kept, 8).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# KMV bottom-k distinct sketch: shingle-space cardinality + uniform sample

# shared by kmv_shingle_sample AND its maintenance twin
# (plans/streaming_ops.py::streaming_kmv): the drained sketch must
# equal the one-shot bottom-k over the same corpus
KMV_SHINGLE_ORACLE = f"""
WITH {_SQL_BTOKS},
shs AS (
  SELECT CASE WHEN len(t) < 3 THEN []::VARCHAR[]
         ELSE list_distinct(list_transform(range(1, len(t) - 1),
                i -> array_to_string(list_slice(t, i, i + 2), ' ')))
         END AS s
  FROM btoks),
terms AS (SELECT DISTINCT shingle
          FROM (SELECT unnest(s) AS shingle FROM shs)),
h AS (SELECT shingle, md5('kmv|' || shingle) AS hh FROM terms),
b AS (SELECT shingle, hh FROM h ORDER BY hh LIMIT 256)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY hh) AS INT) AS rnk,
       shingle, hh,
       ('0x' || substring(hh, 1, 15))::BIGINT AS h60
FROM b
"""

KMV_K = 256


def kmv_sample_frame(sketch: DataFrame) -> DataFrame:
    """Present a drained/batch bottom-k sketch as the oracle-facing
    frame — rank by hash, the key, the full hash, and the 60-bit
    numeric prefix (``_h60`` convention). Shared by the batch query
    and the streaming twin's drain so the two cannot drift. The
    unpartitioned window is fine: the sketch is ≤ k rows by
    construction (the heavy-hitters exact pass makes the same
    argument)."""
    w = Window.orderBy("hh")
    return sketch.select(
        F.row_number().over(w).cast("int").alias("rnk"),
        F.col("key").alias("shingle"),
        "hh",
        F.conv(F.substring("hh", 1, 15), 16, 10).cast("bigint").alias("h60"),
    )


def shingle_keys(docs: DataFrame, shingle_n: int = 3) -> DataFrame:
    """Exploded distinct-per-doc word n-shingles of a documents frame
    (default 3; the decontamination blocklist store uses 5) — the
    keyed input both the batch sketch and each micro-batch's partial
    hash. One definition (``operators/dedup.py::shingle_frame``
    staging, so the normalize+split chain runs once per row).

    The shingled frame is PERSISTED before the explode: a Generate
    over an expensive array expression re-evaluates the child per
    OUTPUT ELEMENT (measured 64× at sf1 — explode of the same arrays
    fell from ~140 s to 0.3 s behind a materialization barrier), the
    same trap ``dedup_minhash`` dodges with its persisted signature
    block. Released at session-cache teardown (``defer_unpersist``)."""
    from mevi_spark.operators.cache import defer_unpersist

    sh = D.shingle_frame(docs, shingle_n=shingle_n).persist()
    defer_unpersist(sh)
    return sh.select(F.explode("shingles").alias("shingle"))


@register("kmv_shingle_sample", oracle=KMV_SHINGLE_ORACLE)
def kmv_shingle_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-shingle cardinality + uniform shingle sample via a KMV
    bottom-k sketch (``operators/sketch.py::kmv_bottom_k``) — the
    sizing read a near-dup deployment does FIRST: the shingle-space
    cardinality picks the MinHash band/row config and the uniform
    sample is the inspection window into what the space looks like,
    without ever materializing the distinct universe. Scale shape:
    JVM-side md5, per-partition Arrow prune to k rows (the shuffle
    carries k·P rows, never the shingle universe — a
    ``COUNT(DISTINCT)`` at 100 TB shuffles billions of keys for one
    number), TakeOrderedAndProject merge. The estimate is certified
    in-query against the exact distinct count (fixture-scale
    instrumentation, the ``mp_certify`` pattern); under ingest the
    maintained form is ``streaming_kmv``, whose drain shares
    :func:`kmv_sample_frame` and this oracle."""
    from mevi_spark.operators.sketch import kmv_bottom_k, kmv_certify
    from mevi_spark.sources.io import spread_small_scan

    # regex+md5-heavy per-row stage over a single-row-group scan:
    # spread it (identity once the listing exceeds cluster width).
    # The micro-batch twin's per-batch shingle_keys is deliberately
    # NOT spread — an exchange per small batch is pure overhead there.
    keys = shingle_keys(
        spread_small_scan(
            spark,
            load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        )
    )
    # the sketch is ≤ k rows: pin it once so the certificate's collect
    # and the returned frame share one execution of the prune
    sketch = kmv_bottom_k(keys, "shingle", KMV_K).localCheckpoint(
        eager=True
    )
    kmv_certify(sketch.collect(), keys.distinct().count(), KMV_K)
    return kmv_sample_frame(sketch)


GROUPED_KMV_ORACLE = """
WITH h AS (
  SELECT lang, source, CAST(doc_id AS VARCHAR) AS key,
         md5('gsample|' || CAST(doc_id AS VARCHAR)) AS hh
  FROM documents),
r AS (SELECT lang, source, key, hh,
             ROW_NUMBER() OVER (PARTITION BY lang, source
                                ORDER BY hh) AS rnk
      FROM h)
SELECT lang, source, key, hh, CAST(rnk AS INT) AS rnk
FROM r WHERE rnk <= 8
"""


@register("grouped_kmv_sample", oracle=GROUPED_KMV_ORACLE)
def grouped_kmv_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform sample PER STRATUM — k docs per
    (lang, source) cell by smallest salted-md5 doc_id
    (``operators/sketch.py::kmv_bottom_k_grouped``): the "show me 8
    random documents from every language×source cell" inspection read
    a curation pass does after every filter stage, stable across
    re-runs
    (hash order, no RNG) and therefore oracle-checkable. Scale shape:
    the per-partition Arrow prune carries ≤ k rows per group per
    partition, so the rank window sees k·P rows per group, never the
    corpus — a bare ``ROW_NUMBER() OVER (PARTITION BY ...)`` shuffles
    every row at 100 TB to keep 8 per cell."""
    from mevi_spark.operators.sketch import kmv_bottom_k_grouped

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
    return kmv_bottom_k_grouped(
        docs, "doc_id", 8, ["lang", "source"], salt="gsample"
    ).select("lang", "source", "key", "hh", "rnk")


@register("bloom_decontaminate", oracle=DECONTAMINATE_ORACLE)
def bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination with a Bloom-bitset pre-filter
    (``functions/bloom.py``) — the shape for when the blocklist side
    outgrows a raw broadcast: the eval 5-gram union is compressed to
    an m-bit bitset probed MAP-SIDE over the corpus (zero shuffle; no
    false negatives by construction), and only the bloom-positive
    survivors meet the real eval set in the exact verify join — its
    volume is true hits + false positives
    (``(1 − e^{−k·n/m})^k`` ≈ 2% at the m=2^18/k=4/n≈16k fixture),
    never the corpus. Composed, the result is bit-identical to
    ``decontaminate_eval`` — SAME oracle. The pruning property
    (candidates < exploded corpus while candidates ⊇ verified hits —
    the Bloom no-false-negative guarantee) is pinned by
    ``tests/test_bloom.py``; the oracle equality is the end-to-end
    proof.
    Shingles are staged through ``shingle_frame`` for the same
    regex-inlining reason as :func:`decontaminate_eval`.

    Pass accounting (shingle construction is THE corpus cost — the
    probe itself adds ~20% on top of one pass, measured at the sf1
    fixture): the blocklist side tokenizes once into a pinned frame,
    the train side tokenizes once in the probe pipeline, and the
    zero-overlap rows come from a shingle-FREE id scan — no third
    tokenize. The verify join is deliberately NOT a broadcast: the
    whole point of the bitset is a blocklist too big to broadcast raw,
    so the survivors meet it in a keyed shuffle join sized by
    candidates + blocklist keys, never the corpus."""
    from mevi_spark.functions.bloom import (
        bloom_build,
        bloom_probe,
        bloom_size_bits,
    )
    from mevi_spark.operators.cache import defer_unpersist

    k_h = 4
    # persisted for the same per-element Generate re-evaluation reason
    # as decontaminate_eval (and both eval/train legs read it)
    sh = D.shingle_frame(_corpus(spark, sf_dir), shingle_n=5).select(
        "doc_id", F.col("shingles").alias("s")
    ).persist()
    defer_unpersist(sh)
    # blocklist union pinned once: the bitset build and the verify
    # join both read the materialized frame, not the tokenize lineage
    ev = (
        sh.filter(F.col("doc_id") >= 100000)
        .select(F.explode("s").alias("g"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # m sized to the MEASURED blocklist (guide-§3.2 discipline: a
    # Bloom filter is only a filter when m tracks n): the fixed 2^18
    # of rounds 11-12 saturates at ~2.8M sf1 keys (k·n/m ≈ 43 → every
    # bit 1 → 100% pass, pure per-row overhead, measured). The count
    # is a one-job read of the already-checkpointed blocklist; the
    # result is invariant to m (no false negatives + exact verify),
    # so the oracle pins this re-sizing as a pure plan change.
    m = bloom_size_bits(ev.count())
    words = bloom_build(ev, "g", m, k_h)
    cand = (
        sh.filter(F.col("doc_id") < 100000)
        .select("doc_id", F.explode("s").alias("g"))
        .filter(bloom_probe(F.col("g"), words, m, k_h))
    )
    hits = cand.join(ev, "g").groupBy("doc_id").agg(
        F.count("*").alias("n")
    )
    ids = _corpus(spark, sf_dir).select("doc_id").filter(
        F.col("doc_id") < 100000
    )
    return ids.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n", F.lit(0)).alias("n_overlap"),
        (F.coalesce("n", F.lit(0)) > 0).alias("contaminated"),
    )
