"""OPQ — optimized product quantization (learned-rotation PQ).

The reference's third quantizer type (``MEVI/pq.py:60-72`` ``pq_type in
('pq','opq','rq')``): OPQ rotates vectors with a learned orthogonal
matrix before the subspace split — ``vecs @ rotate.T`` at
``MEVI/pq.py:320-321``, rotation trained/extracted from faiss's
``OPQx,PQyxz`` pretransform at ``MEVI/pq.py:146-153,172-182`` — so the
M independent subspace codebooks see balanced, decorrelated slices
(Ge et al., "Optimized Product Quantization", CVPR 2013). Everything
downstream of the rotation is UNCHANGED plain PQ (``operators/pq.py``):
encode, ADC LUTs, IVF composition all operate on rotated vectors.

Spark-first split:

* **training** — the corpus-sized work is ONE pass: per-partition
  ``Vᵀ·V`` second-moment partials from an Arrow ``mapInPandas`` kernel,
  each partition contributing a single d×d row — the collect is
  O(partitions·d²), never O(n). The eigendecomposition + eigenvalue
  allocation runs driver-side on the d×d moment (d ≤ a few hundred for
  retrieval embeddings — microseconds; the same artifact-vs-corpus
  split as the staged RQ codebook). This is OPQ's *parametric* solution
  (Ge et al. 2013 §4): under the Gaussian assumption the optimal
  rotation is the PCA basis with eigenvalues balanced across subspaces
  by greedy allocation of the variance product — faiss uses the same
  construction to initialize ``OPQMatrix``.
* **apply** — the rotation is a BROADCAST d×d literal applied as one
  map-only matmul expression (``rotate_expr``): each output component
  is the same left-to-right ``zip_with``/``aggregate`` fold as
  :func:`~mevi_spark.functions.vector.dot`, so rotated values are
  bit-identical to DuckDB's ``list_dot_product`` folds and every
  downstream PQ oracle stays exact. Zero shuffle, fused into the scan.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from mevi_spark.functions.vector import sql_ident, sql_json_literal


def second_moment(
    emb: DataFrame, vec_col: str = "embedding"
) -> np.ndarray:
    """The distributed half of OPQ training: the uncentered second
    moment ``E[v·vᵀ]`` as a d×d numpy array. One corpus scan; each
    partition yields ONE (count, flattened d×d partial) row, summed
    driver-side — the collect is bounded by partition count, not rows.
    """
    schema = StructType(
        [
            StructField("n", LongType()),
            StructField("g", ArrayType(DoubleType())),
        ]
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: np.ndarray | None = None
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            g = mat.T @ mat
            acc = g if acc is None else acc + g
            n += mat.shape[0]
        if acc is not None:
            yield pd.DataFrame({"n": [n], "g": [acc.ravel().tolist()]})

    rows = emb.select(vec_col).mapInPandas(partials, schema).collect()
    if not rows:
        raise ValueError("second_moment: empty input")
    total_n = sum(r["n"] for r in rows)
    gram = np.zeros_like(np.array(rows[0]["g"], dtype=np.float64))
    for r in rows:
        gram += np.array(r["g"], dtype=np.float64)
    d = int(round(math.sqrt(gram.shape[0])))
    return (gram / total_n).reshape(d, d)


def opq_train_rotation(moment: np.ndarray, m_subs: int) -> np.ndarray:
    """OPQ parametric rotation from the second moment (Ge et al. 2013
    §4, the faiss ``OPQMatrix`` init): eigendecompose, then greedily
    allocate eigenvectors (descending eigenvalue) to the M subspace
    buckets, always filling the bucket with the smallest current
    log-eigenvalue PRODUCT — balancing per-subspace variance, which is
    what makes the M independent codebooks equally useful. Returns the
    d×d rotation R (rows orthonormal; apply as ``R @ v``). Determinism:
    eigenvector sign is normalized (largest-|component| positive) and
    ties in the allocation break on bucket index.
    """
    d = moment.shape[0]
    if d % m_subs:
        raise ValueError(f"dim {d} not divisible by m_subs {m_subs}")
    w, v = np.linalg.eigh((moment + moment.T) / 2.0)
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order]
    for j in range(d):
        i = int(np.argmax(np.abs(v[:, j])))
        if v[i, j] < 0:
            v[:, j] = -v[:, j]
    sub = d // m_subs
    buckets: list[list[int]] = [[] for _ in range(m_subs)]
    logprod = [0.0] * m_subs
    for j in range(d):
        b = min(
            (bi for bi in range(m_subs) if len(buckets[bi]) < sub),
            key=lambda bi: (logprod[bi], bi),
        )
        buckets[b].append(j)
        logprod[b] += math.log(max(float(w[j]), 1e-300))
    perm = [j for bucket in buckets for j in bucket]
    return np.ascontiguousarray(v[:, perm].T)


def rotate_expr(rotation, vec_col: str) -> Column:
    """Map-only matmul ``R @ v`` as ONE expression: the d×d matrix
    inlines via ``from_json`` (2 analysis-time nodes, constant-folded
    to a single Literal — the big-constant discipline of
    ``sql_json_literal``) and each output component folds left-to-right
    exactly like :func:`~mevi_spark.functions.vector.dot`, so rotated
    doubles are bit-identical to DuckDB's ``list_dot_product(row, v)``.
    Zero shuffle; at d=64 the per-row cost is 64 fused codegen folds.
    """
    rows = [[float(x) for x in r] for r in rotation]
    rlit = sql_json_literal(rows, "array<array<double>>")
    qv = f"cast({sql_ident(vec_col)} as array<double>)"
    return F.expr(
        f"transform({rlit}, r -> aggregate(zip_with(r, {qv},"
        f" (x, y) -> x * y), 0.0D, (acc, x) -> acc + x))"
    )


def hadamard_rotation(dim: int) -> list[list[float]]:
    """The normalized Sylvester-Hadamard matrix ``H_dim/√dim`` — the
    classic STRUCTURED orthogonal rotation (entries ±1/√dim; exactly
    representable when dim is an even power of two, e.g. ±0.125 at
    d=64). Used as the fixed, data-independent rotation in the
    cross-engine ``opq_encode_reconstruct`` oracle row: the DuckDB
    oracle must inline the SAME literal, so the driver-checked query
    pins the rotate→encode→reconstruct PIPELINE bit-for-bit, while the
    data-dependent PCA trainer (not SQL-expressible — an
    eigendecomposition) is pinned by the MSE/orthogonality pytests.
    Hadamard rotations are themselves standard practice for variance
    balancing (e.g. the fast rotations in LSH/QuickADC literature)."""
    if dim & (dim - 1):
        raise ValueError(f"dim must be a power of two, got {dim}")
    h = [[1.0]]
    while len(h) < dim:
        h = [r + r for r in h] + [r + [-x for x in r] for r in h]
    s = 1.0 / math.sqrt(dim)
    return [[x * s for x in r] for r in h]
