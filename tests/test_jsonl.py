"""JSONL corpus sink/scan: byte-exact roundtrip of the characters TSV
cannot carry (tabs, newlines, quotes, backslashes, unicode), explicit
schema honored, corrupt lines dropped not crashed."""

from __future__ import annotations

import os
import shutil
import tempfile

from mevi_spark.sources.io import read_corpus_jsonl, write_corpus_jsonl

_SCHEMA = "doc_id bigint, text string"


def test_jsonl_roundtrip_hostile_text(spark):
    rows = [
        (1, "plain"),
        (2, "tab\there"),
        (3, "new\nline and \r return"),
        (4, 'quotes " and \\ backslash'),
        (5, "unicode: naïve — 模型 🚀"),
        (6, ""),
        (7, None),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    path = tempfile.mkdtemp(prefix="mevi_jsonl_t_") + "/data"
    try:
        write_corpus_jsonl(df, path)
        back = read_corpus_jsonl(spark, path, _SCHEMA)
        got = {r.doc_id: r.text for r in back.collect()}
        assert got == dict(rows)
    finally:
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)


def test_jsonl_scan_drops_corrupt_lines(spark):
    path = tempfile.mkdtemp(prefix="mevi_jsonl_c_") + "/data"
    try:
        os.makedirs(path)
        with open(os.path.join(path, "part-0.json"), "w") as fh:
            fh.write('{"doc_id": 1, "text": "ok"}\n')
            fh.write("this is not json\n")
            fh.write('{"doc_id": 2, "text": "also ok"}\n')
        back = read_corpus_jsonl(spark, path, _SCHEMA)
        rows = back.collect()
        # DROPMALFORMED: the corrupt line yields NO row (not an
        # all-null phantom row, which is what PERMISSIVE would emit)
        assert len(rows) == 2
        assert {(r.doc_id, r.text) for r in rows} == {
            (1, "ok"),
            (2, "also ok"),
        }
    finally:
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)
