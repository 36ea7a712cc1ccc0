"""Explicit StructTypes for every logical table in the engine.

The reference hard-codes schemas at read sites (schema-on-read with
``names=``/dtypes, e.g. corpus at ``MEVI/main_utils.py:190-197``); here
they are first-class. SURVEY.md §1.1 is the source of truth.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- retrieval data model (reference tables) -------------------------------

# corpus.tsv: (oldid, title, content) — MEVI/main_utils.py:190-197
CORPUS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

# train_mevi.tsv: one row per (query, positive doc) — MEVI/main_utils.py:114-127
QUERIES_TRAIN = T.StructType(
    [
        T.StructField("query", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
    ]
)

# dev_mevi_dedup.tsv: multi-positive — MEVI/main_utils.py:264-278
QUERIES_DEV = T.StructType(
    [
        T.StructField("query", T.StringType(), False),
        T.StructField("doc_ids", T.ArrayType(T.LongType()), False),
    ]
)

# docemb.bin / query_emb.bin — MEVI/generate.py:87-113, 152-187
EMBEDDING = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("vector", T.ArrayType(T.FloatType()), False),
    ]
)

# RQ codebook — MEVI/pq.py:67-68 (subvector_num, 2^bits, dim)
CODEBOOK = T.StructType(
    [
        T.StructField("level", T.IntegerType(), False),
        T.StructField("code", T.IntegerType(), False),
        T.StructField("centroid", T.ArrayType(T.DoubleType()), False),
    ]
)

# rqmapping*.pkl: doc_id -> RQ code — MEVI/pq.py:217-247
PQ_MAPPING = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("code", T.ArrayType(T.IntegerType()), False),
        T.StructField("code_flat", T.LongType(), False),
    ]
)

# run TSV: (query, clusters, preds, scores) — MEVI/ensemble_marco.py:92-111
RUN = T.StructType(
    [
        T.StructField("query", T.StringType(), False),
        T.StructField("clusters", T.ArrayType(T.ArrayType(T.IntegerType())), True),
        T.StructField("preds", T.ArrayType(T.LongType()), False),
        T.StructField("scores", T.ArrayType(T.DoubleType()), False),
    ]
)

# qrels.train.tsv 4-column form — dataprocess/msmarco_passage/prepare_origin.py:38-48
QRELS = T.StructType(
    [
        T.StructField("qid", T.LongType(), False),
        T.StructField("iteration", T.IntegerType(), True),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("rel", T.IntegerType(), True),
    ]
)

# inverse answers, CSR normalized to pairs — dataprocess/NQ_dpr/get_inverse_answers.py:10-27
ANSWERS_INVERSE = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("query_idx", T.LongType(), False),
    ]
)

# --- driver-provided testdata (TESTDATA.md) --------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
