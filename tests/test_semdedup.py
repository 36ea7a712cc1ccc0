"""SemDeDup (Abbas et al. 2023) — cluster-scoped cosine dedup with the
far-from-centroid keep-policy, pinned on hand-built vectors."""

from __future__ import annotations

from mevi_spark.operators.dedup import semantic_dedup


def _centroids(spark, cents: dict[int, list[float]]):
    return spark.createDataFrame(
        [(k, v) for k, v in cents.items()], "code long, centroid array<double>"
    )


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_keeps_lowest_centroid_cosine_member(spark):
    # cluster centroid along +x; two near-identical vectors, one tilted
    # further off-axis (lower centroid cosine) — SemDeDup keeps THAT one
    cents = _centroids(spark, {0: [1.0, 0.0]})
    vecs = _vecs(
        spark,
        [
            (1, [1.0, 0.10]),  # closer to centroid → pruned
            (2, [1.0, 0.12]),  # farther (lower cc) → kept
        ],
    )
    out = {r.vec_id: r.kept for r in semantic_dedup(
        vecs, cents, threshold=0.95
    ).collect()}
    assert out == {1: 0, 2: 1}


def test_cluster_scoping_blocks_cross_cluster_compare(spark):
    # identical vectors that route to DIFFERENT clusters are never
    # compared — both kept (the within-cluster contract that makes the
    # self-join scale)
    cents = _centroids(spark, {0: [1.0, 0.0], 1: [0.0, 1.0]})
    vecs = _vecs(
        spark,
        [
            (1, [0.7, 0.69]),  # argmin → cluster 0 (barely)
            (2, [0.69, 0.7]),  # argmin → cluster 1
        ],
    )
    rows = {r.vec_id: r for r in semantic_dedup(
        vecs, cents, threshold=0.9
    ).collect()}
    assert rows[1].code == 0 and rows[2].code == 1
    assert rows[1].kept == 1 and rows[2].kept == 1


def test_exact_tie_breaks_on_lower_id(spark):
    # bit-identical vectors have EQUAL centroid cosine: the lower id
    # survives, deterministically
    cents = _centroids(spark, {0: [1.0, 0.0]})
    vecs = _vecs(spark, [(5, [1.0, 0.5]), (9, [1.0, 0.5])])
    out = {r.vec_id: r.kept for r in semantic_dedup(
        vecs, cents, threshold=0.95
    ).collect()}
    assert out == {5: 1, 9: 0}


def test_below_threshold_pairs_untouched(spark):
    cents = _centroids(spark, {0: [1.0, 0.0]})
    vecs = _vecs(spark, [(1, [1.0, 0.0]), (2, [1.0, 1.0])])  # cos ≈ 0.707
    out = {r.vec_id: r.kept for r in semantic_dedup(
        vecs, cents, threshold=0.95
    ).collect()}
    assert out == {1: 1, 2: 1}


def test_dup_group_keeps_exactly_one_max_priority(spark):
    # a 3-member duplicate group (all pairwise >= τ): only the single
    # lowest-centroid-cosine member survives
    cents = _centroids(spark, {0: [1.0, 0.0]})
    vecs = _vecs(
        spark,
        [
            (1, [1.0, 0.10]),
            (2, [1.0, 0.11]),
            (3, [1.0, 0.12]),  # lowest cc → the survivor
        ],
    )
    out = {r.vec_id: r.kept for r in semantic_dedup(
        vecs, cents, threshold=0.99
    ).collect()}
    assert out == {1: 0, 2: 0, 3: 1}
