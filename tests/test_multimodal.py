"""Multimodal binary-column operators vs in-test NumPy oracles."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from mevi_spark.operators import multimodal as MM


def _media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return MM.attach_media(docs)


def test_attach_media_schema_and_payload(spark, sf_dir):
    m = _media(spark, sf_dir)
    row = m.orderBy("doc_id").first()
    assert set(m.columns) == {
        "doc_id", "media_type", "payload", "width", "height", "n_frames"
    }
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.media_type in MM.MEDIA_TYPES
    text = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") == row.doc_id)
        .first()
        .text
    )
    assert bytes(row.payload) == text.encode("utf-8")


def test_decode_stats_matches_numpy(spark, sf_dir):
    m = _media(spark, sf_dir).limit(20).cache()
    got = {r.doc_id: r for r in MM.decode_stats(m, hist_bins=8).collect()}
    for r in m.collect():
        arr = np.frombuffer(bytes(r.payload), dtype=np.uint8)
        g = got[r.doc_id]
        assert g.n_bytes == len(arr)
        assert abs(g.mean_byte - float(arr.mean())) < 1e-9
        hist = np.histogram(arr, bins=np.linspace(0, 256, 9))[0]
        assert list(g.byte_hist) == hist.tolist()


def test_resize_matches_numpy(spark, sf_dir):
    m = _media(spark, sf_dir)
    out = {r.doc_id: r for r in MM.resize_images(m, 8, 6).collect()}
    assert out, "no image rows"
    src = {
        r.doc_id: r
        for r in m.filter(F.col("media_type") == "image").collect()
    }
    assert set(out) == set(src)
    for did, r in out.items():
        s = src[did]
        w, h = s.width, s.height
        buf = np.zeros(w * h, dtype=np.uint8)
        raw = np.frombuffer(bytes(s.payload), dtype=np.uint8)[: w * h]
        buf[: len(raw)] = raw
        img = buf.reshape(h, w)
        ri = (np.arange(6) * h) // 6
        ci = (np.arange(8) * w) // 8
        expect = img[np.ix_(ri, ci)]
        assert r.out_len == 48
        assert bytes(r.resized) == expect.tobytes()
        assert r.checksum == int(expect.sum())


def test_sample_frames_reassembles_evens(spark, sf_dir):
    m = _media(spark, sf_dir)
    frames = MM.sample_frames(m, stride=2).collect()
    assert frames
    vids = {
        r.doc_id: r
        for r in m.filter(F.col("media_type") == "video").collect()
    }
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(vids)
    for did, rows in by_doc.items():
        v = vids[did]
        chunks = np.array_split(
            np.frombuffer(bytes(v.payload), dtype=np.uint8), v.n_frames
        )
        rows.sort(key=lambda r: r.frame_idx)
        expect_idx = list(range(0, v.n_frames, 2))
        assert [r.frame_idx for r in rows] == expect_idx
        for r in rows:
            assert bytes(r.frame) == chunks[r.frame_idx].tobytes()
            assert r.frame_len == len(chunks[r.frame_idx])


def test_real_codec_gated(spark, sf_dir):
    if MM.HAVE_PIL:
        return  # container unexpectedly has PIL; the stub path is moot
    import pytest

    with pytest.raises(NotImplementedError):
        MM.decode_image_real(_media(spark, sf_dir))
