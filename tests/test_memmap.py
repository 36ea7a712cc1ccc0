"""S3/S6: fixed-width .bin matrix scan + shard sink
(``MEVI/faiss_search.py:9-10``, ``MemmapList`` ``MEVI/main_models.py:332-350``,
shard write ``MEVI/generate.py:87-113``)."""

from __future__ import annotations

import glob
import json
import os

import numpy as np

from mevi_spark.sources.memmap import read_memmap_matrix, write_memmap_shards


def test_read_single_file(spark, tmp_path):
    mat = np.arange(24, dtype=np.float32).reshape(6, 4)
    p = tmp_path / "emb.bin"
    mat.tofile(p)

    df = read_memmap_matrix(spark, str(p), dim=4, dtype="float32")
    rows = sorted(df.collect(), key=lambda r: r.row_id)
    assert [r.row_id for r in rows] == list(range(6))
    got = np.array([r.vec for r in rows], dtype=np.float32)
    np.testing.assert_array_equal(got, mat)


def test_read_multi_file_concat_in_path_order(spark, tmp_path):
    """MemmapList semantics: files concatenated in path order with
    global row ids."""
    a = np.full((3, 2), 1, dtype=np.int64)
    b = np.full((2, 2), 2, dtype=np.int64)
    a.tofile(tmp_path / "part_0.bin")
    b.tofile(tmp_path / "part_1.bin")

    df = read_memmap_matrix(spark, str(tmp_path / "*.bin"), dim=2, dtype="int64")
    rows = sorted(df.collect(), key=lambda r: r.row_id)
    assert [r.row_id for r in rows] == list(range(5))
    assert [r.vec[0] for r in rows] == [1, 1, 1, 2, 2]


def test_read_rejects_ragged_file(spark, tmp_path):
    np.arange(7, dtype=np.float32).tofile(tmp_path / "bad.bin")
    try:
        read_memmap_matrix(spark, str(tmp_path / "bad.bin"), dim=4)
    except ValueError as e:
        assert "not a multiple" in str(e)
    else:
        raise AssertionError("ragged file accepted")


def test_shard_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(7)
    mat = rng.standard_normal((40, 8)).astype(np.float32)
    src = tmp_path / "src.bin"
    mat.tofile(src)
    out = str(tmp_path / "shards")

    df = read_memmap_matrix(spark, str(src), dim=8, dtype="float32")
    write_memmap_shards(df, out, dtype="float32")

    index = json.load(open(os.path.join(out, "_index.json")))
    shards = sorted(glob.glob(os.path.join(out, "*.bin")))
    assert sum(index.values()) == 40
    assert {os.path.basename(s) for s in shards} == set(index)

    back = read_memmap_matrix(spark, os.path.join(out, "*.bin"), dim=8)
    rows = sorted(back.collect(), key=lambda r: r.row_id)
    got = np.array([r.vec for r in rows], dtype=np.float32)
    np.testing.assert_array_equal(got, mat)
