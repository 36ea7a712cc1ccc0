"""Deterministic text embedder (U1 stand-in).

The reference encodes text with neural twin towers
(``MEVI/document_encoder.py:104-126``, invoked over row blocks at batch
sizes 64-1024). The engine's semantics — quantize, join, rank, fuse,
metric — are encoder-agnostic (SURVEY §7.1), so tests and fixtures use a
**seeded random-projection embedder**: each token hashes to a seed, the
seed drives a Gaussian vector, the document embedding is the L2-normalized
sum of its token vectors. Same text → same vector, forever, no
checkpoints, no GPU.

Spark-side this is exactly the shape of real model application: an
Arrow-batched ``mapInPandas`` with per-executor state (a real model would
be broadcast weights; here it's just the dimension/seed).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _token_seed(token: str, seed: int) -> int:
    h = hashlib.md5(f"{seed}:{token}".encode()).digest()
    return int.from_bytes(h[:8], "little")


def embed_text_np(text: str, dim: int = 64, seed: int = 42) -> np.ndarray:
    """NumPy reference implementation (shared by tests/oracles)."""
    vec = np.zeros(dim, dtype=np.float64)
    for tok in text.lower().split():
        rng = np.random.default_rng(_token_seed(tok, seed))
        vec += rng.standard_normal(dim)
    n = np.linalg.norm(vec)
    if n > 0:
        vec /= n
    return vec.astype(np.float32)


def embed_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """U1: batch encode ``text_col`` → ``array<float>`` embedding.

    ``mapInPandas`` so each Arrow batch is vectorized in one Python hop —
    the Spark analog of the reference's encode_batch_size=1024 blocks
    (``MEVI/main.py:802-803``).
    """
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema)
    out_schema = f"{fields}, `{out_col}` array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                embed_text_np(t if isinstance(t, str) else "", dim, seed)
                for t in pdf[text_col]
            ]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
