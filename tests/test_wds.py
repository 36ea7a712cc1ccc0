"""WebDataset sharded-tar sink/scan (sources/wds.py): byte-exact
payload + metadata roundtrip, NULL-payload normalization, deterministic
shard bytes under re-write, multiple whole shards per task, and the
shard-count layout contract."""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import Row

from mevi_spark.sources.wds import (
    SAMPLE_SCHEMA,
    read_wds_shards,
    write_wds_shards,
)


def _mk_samples(spark, n=40, payload=lambda i: bytes([i % 251]) * (i + 1)):
    rows = [
        Row(
            doc_id=i,
            media_type=("image", "audio", "video")[i % 3],
            payload=payload(i),
            width=i % 16 + 4,
            height=i % 8 + 2,
            n_frames=i % 7 + 1,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, SAMPLE_SCHEMA)


def _roundtrip(spark, df, n_shards):
    root = tempfile.mkdtemp(prefix="mevi_wds_t_")
    out = os.path.join(root, "shards")
    try:
        manifest = write_wds_shards(df, out, n_shards).collect()
        back = read_wds_shards(spark, out).collect()
        tars = sorted(f for f in os.listdir(out) if f.endswith(".tar"))
        return manifest, back, tars, [
            hashlib.md5(open(os.path.join(out, t), "rb").read()).hexdigest()
            for t in tars
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_wds_roundtrip_exact(spark):
    df = _mk_samples(spark)
    manifest, back, tars, _ = _roundtrip(spark, df, n_shards=4)
    # every sample survives with payload bytes and metadata intact
    got = {r.doc_id: r for r in back}
    assert len(got) == 40
    for r in df.collect():
        b = got[r.doc_id]
        assert bytes(b.payload) == bytes(r.payload)
        assert (b.media_type, b.width, b.height, b.n_frames) == (
            r.media_type,
            r.width,
            r.height,
            r.n_frames,
        )
    # 4 shards, doc_id % 4 assignment, manifest counts add up
    assert len(tars) == 4
    assert sum(m.n_samples for m in manifest) == 40
    assert all(m.n_samples == 10 for m in manifest)


def test_wds_null_payload_normalizes_to_empty(spark):
    df = _mk_samples(spark, n=6, payload=lambda i: None if i % 2 else b"x")
    _, back, _, _ = _roundtrip(spark, df, n_shards=2)
    for r in back:
        expect = b"" if r.doc_id % 2 else b"x"
        assert bytes(r.payload) == expect


def test_wds_shard_bytes_deterministic(spark):
    """Same rows -> byte-identical tars (zeroed tar metadata + key-sorted
    samples), which is what makes the tmp-then-replace publish safely
    replayable."""
    df = _mk_samples(spark)
    _, _, _, md5s_a = _roundtrip(spark, df, n_shards=4)
    _, _, _, md5s_b = _roundtrip(spark, df.repartition(7), n_shards=4)
    assert md5s_a == md5s_b


def test_wds_many_shards_per_task(spark):
    """More shards than upstream partitions: the streaming writer must
    close/open across shard boundaries within one task."""
    df = _mk_samples(spark, n=30).coalesce(1)
    manifest, back, tars, _ = _roundtrip(spark, df, n_shards=10)
    assert len(tars) == 10
    assert len(back) == 30
    assert sorted(m.shard_id for m in manifest) == list(range(10))
