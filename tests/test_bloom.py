"""Bloom bitset: no false negatives (the guarantee the exact-verify
composition rests on), a sane false-positive rate at the designed
load, bit-position parity with a pure-python replica, and real
pruning in the registered composition."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from mevi_spark.functions.bloom import bloom_build, bloom_positions, bloom_probe

M, K = 1 << 14, 4


def _py_positions(key: str, m: int, k: int, salt: str = "bloom"):
    # Kirsch-Mitzenmacher double hashing, mirroring functions/bloom.py
    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    h1 = h60(f"{salt}a|{key}") % m
    h2 = (h60(f"{salt}b|{key}") * 2 + 1) % m
    return [(h1 + i * h2) % m for i in range(k)]


def test_positions_match_python_replica(spark):
    keys = [f"key-{i}" for i in range(50)]
    df = spark.createDataFrame([(x,) for x in keys], "g string")
    got = {
        r["g"]: list(r["pos"])
        for r in df.select(
            "g", bloom_positions(F.col("g"), M, K).alias("pos")
        ).collect()
    }
    assert got == {x: _py_positions(x, M, K) for x in keys}


def test_no_false_negatives_and_bounded_fp(spark):
    members = [f"in-{i}" for i in range(2000)]
    others = [f"out-{i}" for i in range(2000)]
    df = spark.createDataFrame([(x,) for x in members], "g string")
    words = bloom_build(df, "g", M, K)
    probe = spark.createDataFrame(
        [(x,) for x in members + others], "g string"
    ).select("g", bloom_probe(F.col("g"), words, M, K).alias("hit"))
    res = {r["g"]: r["hit"] for r in probe.collect()}
    # Bloom guarantee: every member probes true
    assert all(res[x] for x in members)
    # designed FP rate at n=2000, m=2^14, k=4 is ~1.2%; allow 4x slack
    fp = sum(1 for x in others if res[x])
    assert fp / len(others) < 0.05, fp


def test_registered_composition_prunes(spark):
    from mevi_spark.functions.bloom import bloom_build as _bb
    from mevi_spark.functions.text import word_shingles
    from mevi_spark.plans.pipeline_ops import _corpus

    sf = "/root/testdata/sf0.001"
    sh = _corpus(spark, sf).select(
        "doc_id", word_shingles("text", 5).alias("s")
    )
    ev = (
        sh.filter(F.col("doc_id") >= 100000)
        .select(F.explode("s").alias("g"))
        .distinct()
    )
    words = _bb(ev, "g", 1 << 18, 4)
    tr = sh.filter(F.col("doc_id") < 100000).select(
        "doc_id", F.explode("s").alias("g")
    )
    total = tr.count()
    cand = tr.filter(bloom_probe(F.col("g"), words, 1 << 18, 4))
    n_cand = cand.count()
    exact = tr.join(F.broadcast(ev), "g").count()
    # the pre-filter keeps every true hit and drops most of the rest
    assert exact <= n_cand < 0.8 * total, (exact, n_cand, total)
