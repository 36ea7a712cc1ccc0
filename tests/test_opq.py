"""OPQ rotation: the distributed second-moment, the parametric trainer
(orthogonality + eigenvalue balancing + MSE ≤ plain PQ on anisotropic
data), and the map-only rotate expression."""

from __future__ import annotations

import math

import numpy as np
import pytest

from mevi_spark.operators.opq import (
    hadamard_rotation,
    opq_train_rotation,
    rotate_expr,
    second_moment,
)

DIM, M = 16, 4


@pytest.fixture(scope="module")
def aniso():
    """Anisotropic fixture: all the variance lives in the FIRST plain-PQ
    subspace (dims 0-3 at σ=10, the rest σ=0.1), the worst case for an
    unrotated subspace split and exactly what OPQ's eigenvalue
    allocation fixes."""
    rng = np.random.RandomState(7)
    scales = np.array([10.0] * 4 + [0.1] * (DIM - 4))
    return rng.randn(400, DIM) * scales


def _np_kmeans(x: np.ndarray, k: int, iters: int = 25) -> np.ndarray:
    """Deterministic Lloyd k-means (first-k init) — the test's own
    per-subspace trainer, independent of any repo code path."""
    cents = x[:k].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        for j in range(k):
            if (a == j).any():
                cents[j] = x[a == j].mean(0)
    return cents


def _pq_mse(x: np.ndarray, m: int, k: int) -> float:
    """Reconstruction MSE of per-subspace k-means PQ over ``x``."""
    sub = x.shape[1] // m
    err = 0.0
    for mi in range(m):
        xs = x[:, mi * sub : (mi + 1) * sub]
        cents = _np_kmeans(xs, k)
        d = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        err += d.min(1).sum()
    return err / x.size


def test_trainer_orthogonal_and_balances_variance(aniso):
    moment = aniso.T @ aniso / len(aniso)
    r = opq_train_rotation(moment, M)
    assert np.allclose(r @ r.T, np.eye(DIM), atol=1e-9)
    # each subspace of the rotated data carries one of the four
    # high-variance directions — per-subspace variance is balanced
    rot = aniso @ r.T
    sub = DIM // M
    sv = [rot[:, i * sub : (i + 1) * sub].var() for i in range(M)]
    assert max(sv) / min(sv) < 3.0  # plain split: ratio ~1e4


def test_opq_mse_beats_plain_pq(aniso):
    moment = aniso.T @ aniso / len(aniso)
    r = opq_train_rotation(moment, M)
    mse_plain = _pq_mse(aniso, M, 8)
    mse_opq = _pq_mse(aniso @ r.T, M, 8)
    assert mse_opq < mse_plain * 0.5, (mse_opq, mse_plain)


def test_second_moment_matches_numpy(spark, aniso):
    df = spark.createDataFrame(
        [(i, [float(x) for x in aniso[i]]) for i in range(50)],
        "vec_id long, embedding array<double>",
    ).repartition(4)
    got = second_moment(df)
    want = aniso[:50].T @ aniso[:50] / 50
    assert np.allclose(got, want, atol=1e-9)


def test_rotate_expr_matches_numpy(spark, aniso):
    moment = aniso.T @ aniso / len(aniso)
    r = opq_train_rotation(moment, M)
    df = spark.createDataFrame(
        [(i, [float(x) for x in aniso[i]]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    got = {
        row.vec_id: np.array(row.v)
        for row in df.select(
            "vec_id", rotate_expr(r, "embedding").alias("v")
        ).collect()
    }
    for i in range(10):
        assert np.allclose(got[i], r @ aniso[i], atol=1e-12), i


def test_hadamard_is_orthogonal_and_exact():
    h = np.array(hadamard_rotation(64))
    assert np.allclose(h @ h.T, np.eye(64), atol=0)  # exact: ±2⁻³ entries
    assert set(np.unique(np.abs(h))) == {0.125}
    assert h[0, 0] == 0.125 and h[1, 1] == -0.125
    with pytest.raises(ValueError):
        hadamard_rotation(48)


def test_rotation_preserves_l2_distances(aniso):
    """Orthogonality in action: pairwise L2 (the PQ assignment metric)
    is invariant, so OPQ changes WHICH codebook sees what, never the
    geometry being quantized."""
    moment = aniso.T @ aniso / len(aniso)
    r = opq_train_rotation(moment, M)
    a, b = aniso[:20], aniso[20:40]
    d0 = ((a - b) ** 2).sum(1)
    d1 = ((a @ r.T - b @ r.T) ** 2).sum(1)
    assert np.allclose(d0, d1, rtol=1e-12)
    assert not math.isclose(float(np.abs(r - np.eye(DIM)).sum()), 0.0)


def test_opq_adc_composition_reuses_pq_unchanged(spark, aniso):
    """The OPQ pipeline downstream of the rotation IS plain PQ: rotate
    docs+queries with rotate_expr, then encode/LUT/ADC-score with the
    untouched operators/pq.py path — scores must equal a NumPy ADC
    oracle computed from the very rotated vectors Spark produced."""
    from pyspark.sql import functions as F

    from mevi_spark.operators.pq import (
        adc_lut,
        adc_scan_scores,
        pq_codebook_from_centroids,
        pq_encode,
        split_subvectors,
    )

    moment = aniso.T @ aniso / len(aniso)
    r = opq_train_rotation(moment, M)
    docs = spark.createDataFrame(
        [(i, [float(x) for x in aniso[i]]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    rot = docs.select(
        "vec_id", rotate_expr(r, "embedding").alias("embedding")
    )
    rot_rows = {
        row.vec_id: np.array(row.embedding) for row in rot.collect()
    }
    rng = np.random.RandomState(3)
    cents = (rng.randn(6, DIM) * 3).round(3)
    cent_df = spark.createDataFrame(
        [(k, [float(x) for x in cents[k]]) for k in range(6)],
        "code int, centroid array<double>",
    )
    sub = DIM // M
    cb = pq_codebook_from_centroids(cent_df, M, sub)
    codes = pq_encode(split_subvectors(rot, M, sub), cb).drop("err_e6")
    qrot = rot.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    lut = adc_lut(split_subvectors(qrot, M, sub, "qid", "qv"), cb)
    got = {
        (row.qid, row.vec_id): row.score_e6
        for row in adc_scan_scores(codes, lut).collect()
    }
    # NumPy oracle over the exact rotated values Spark produced
    np_codes = {}
    for vid, v in rot_rows.items():
        np_codes[vid] = [
            int(
                np.argmin(
                    ((v[m * sub : (m + 1) * sub] - cents[:, m * sub : (m + 1) * sub]) ** 2).sum(1)
                )
            )
            for m in range(M)
        ]
    for (qid, vid), s in got.items():
        want = sum(
            round(
                float(
                    rot_rows[qid][m * sub : (m + 1) * sub]
                    @ cents[np_codes[vid][m], m * sub : (m + 1) * sub]
                )
                * 1e6
            )
            for m in range(M)
        )
        assert abs(s - want) <= M, (qid, vid)  # ≤1 ulp per e6 rounding
