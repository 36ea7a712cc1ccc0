"""S3/S6: fixed-width binary matrix ("memmap") source and sink.

The reference stores every large numeric artifact as a row-major
``np.memmap`` matrix: doc/query embeddings ``(n × 768) float32``
(``MEVI/faiss_search.py:9-10``, ``MEVI/generate.py:170-181``), token ids
``(n × 128) int64`` (``MEVI/main_models.py:1487-1492``), CSR offset/array
int32 pairs (``get_inverse_answers.py:10-27``). Multi-file variants are
concatenated in path order (``MemmapList``, ``MEVI/main_models.py:332-350``);
writers emit one shard per rank and rank 0 concatenates
(``MEVI/generate.py:87-113``).

Spark restatement:

* scan — ``binaryFile`` source → ``mapInPandas`` reshape. Row ids are
  global across files in lexicographic path order (the MemmapList
  contract): shard offsets come from file *sizes* (no data read on the
  driver), so planning is O(#files).
* sink — one ``.bin`` shard per partition written executor-side to a
  shared filesystem plus a ``_index.json`` manifest; no driver
  concatenation (rank-0 merge disappears, exactly like S5/S6's
  "Spark handles partitioned write").

Scale note: ``binaryFile`` materializes one whole file per task, so
shards should be executor-memory-sized (the reference's per-rank shards
already are). The sink enforces this by writing one shard per partition.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

_SPARK_TYPES = {
    "float32": "float",
    "float64": "double",
    "int32": "int",
    "int64": "long",
}


def read_memmap_matrix(
    spark: SparkSession,
    path: str,
    dim: int,
    dtype: str = "float32",
    id_col: str = "row_id",
    vec_col: str = "vec",
) -> DataFrame:
    """Scan ``.bin`` fixed-width matrices → ``(row_id, vec)``.

    ``path`` is a file, directory, or glob understood by the
    ``binaryFile`` source. Row ids are global across files in path
    order, matching ``MemmapList``'s concat semantics.
    """
    itemsize = np.dtype(dtype).itemsize
    row_bytes = dim * itemsize
    files = (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "length")
        .collect()
    )
    ordered = sorted((r["path"], r["length"]) for r in files)
    offsets: dict[str, int] = {}
    total = 0
    for p, length in ordered:
        if length % row_bytes:
            raise ValueError(
                f"{p}: {length} bytes is not a multiple of row size {row_bytes}"
            )
        offsets[p] = total
        total += length // row_bytes
    bc = spark.sparkContext.broadcast((offsets, dim, dtype))

    def explode_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        offs, d, dt = bc.value
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                mat = np.frombuffer(content, dtype=dt).reshape(-1, d)
                base = offs[p]
                yield pd.DataFrame(
                    {
                        id_col: np.arange(base, base + len(mat), dtype=np.int64),
                        vec_col: list(mat),
                    }
                )

    elem = _SPARK_TYPES[dtype]
    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .mapInPandas(explode_files, f"{id_col} long, {vec_col} array<{elem}>")
    )


def write_memmap_shards(
    df: DataFrame,
    out_dir: str,
    dtype: str = "float32",
    id_col: str = "row_id",
    vec_col: str = "vec",
) -> None:
    """Sink ``(row_id, vec)`` → per-partition ``.bin`` shards named so
    path order == row order (zero-padded min row id), plus an
    ``_index.json`` manifest ``{shard: n_rows}``. Rows are
    range-partitioned and sorted by ``id_col`` first, so a subsequent
    :func:`read_memmap_matrix` of ``out_dir`` yields ids 0..n−1 in the
    original order — the reference's rank-shard write + concat
    (``MEVI/generate.py:87-113``) without the rank-0 merge step.
    """
    os.makedirs(out_dir, exist_ok=True)
    ordered = df.select(id_col, vec_col).repartitionByRange(
        F.asc(id_col)
    ).sortWithinPartitions(id_col)

    def write_shard(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: list[np.ndarray] = []
        min_id = None
        for pdf in batches:
            if len(pdf):
                if min_id is None:
                    min_id = int(pdf[id_col].iloc[0])
                rows.extend(
                    np.asarray(v, dtype=dtype) for v in pdf[vec_col]
                )
        if min_id is None:
            return
        # zero-pad to the full long width: 12 digits breaks the
        # lexicographic==numeric ordering contract past 10^12 rows
        name = f"shard_{min_id:020d}.bin"
        np.stack(rows).tofile(os.path.join(out_dir, name))
        yield pd.DataFrame({"shard": [name], "n_rows": [len(rows)]})

    manifest = ordered.mapInPandas(
        write_shard, "shard string, n_rows long"
    ).collect()
    index = {r["shard"]: r["n_rows"] for r in manifest}
    with open(os.path.join(out_dir, "_index.json"), "w") as fh:
        json.dump(index, fh, sort_keys=True)
