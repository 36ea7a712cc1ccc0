"""Real-model hook integration (VERDICT r3 stretch #8): a weight
checkpoint on disk → loaded on the driver → broadcast → applied inside
the Arrow ``impl='pandas'`` kernels. Proves the broadcast-weights path
the reference's real checkpoints would take
(``MEVI/main_models.py:1054-1160`` PassageEmbeddingProjection /
UnifiedEmbeddingProjection), beyond the deterministic stand-in."""

from __future__ import annotations

import numpy as np
import pytest

from mevi_spark.operators.projection import (
    cluster_positional_projection,
    projection_weights,
)
from mevi_spark.sources.io import load_table


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    """A tiny seeded npz 'checkpoint' — the on-disk artifact a trained
    dense head would ship as."""
    w, b = projection_weights(4, 3, seed=99)
    path = tmp_path_factory.mktemp("ckpt") / "proj_head.npz"
    np.savez(path, w=w, b=b)
    return str(path)


def _proj_fixture(spark):
    cands = spark.createDataFrame(
        [(1, 10, [1.0, 2.0], 100), (1, 11, [0.5, -1.0], 200),
         (2, 12, [3.0, 0.25], 300)],
        "query_id long, doc_id long, doc_vec array<double>, code_flat long",
    )
    coarse = spark.createDataFrame(
        [(1, 100, 1), (2, 300, 1)],
        "query_id long, code_flat long, coarse_rank int",
    )
    logprobs = spark.createDataFrame(
        [(1, 100, -0.1), (2, 300, -0.5)],
        "query_id long, code_flat long, logprob double",
    )
    return cands, coarse, logprobs


def test_checkpoint_drives_pandas_projection(spark, checkpoint):
    """Load W/b from the checkpoint file and run the Arrow projection
    kernel with them; the expr path with the same weights is the
    independent oracle."""
    ck = np.load(checkpoint)
    w, b = ck["w"], ck["b"]
    cands, coarse, logprobs = _proj_fixture(spark)
    out = {}
    for impl in ("expr", "pandas"):
        rows = cluster_positional_projection(
            cands, coarse, logprobs, w, b, ntopk=4, impl=impl
        ).collect()
        out[impl] = {(r.query_id, r.doc_id): np.array(r.projected) for r in rows}
    assert set(out["expr"]) == set(out["pandas"])
    for k in out["expr"]:
        np.testing.assert_allclose(out["expr"][k], out["pandas"][k], rtol=1e-12)


def test_broadcast_checkpoint_batch_inference(spark, sf_dir, checkpoint):
    """The UnifiedEmbeddingProjection shape: broadcast the checkpoint
    arrays explicitly and apply them over corpus embedding batches in
    ``mapInPandas``; compare against a driver-side NumPy replay."""
    import pandas as pd

    ck = np.load(checkpoint)
    w, b = ck["w"], ck["b"]
    bc = spark.sparkContext.broadcast((w, b))

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).limit(64)

    def adaptor(batches):
        wt, bias = bc.value
        for pdf in batches:
            mat = np.stack(
                pdf["embedding"].map(lambda v: np.asarray(v[: wt.shape[0]]))
            ).astype(np.float64)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "out": list(mat @ wt + bias)}
            )

    got = {
        r.vec_id: np.array(r.out)
        for r in emb.mapInPandas(
            adaptor, "vec_id long, out array<double>"
        ).collect()
    }
    want = {
        r.vec_id: np.asarray(r.embedding[: w.shape[0]], dtype=np.float64) @ w + b
        for r in emb.collect()
    }
    assert set(got) == set(want)
    for k in got:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-10)
