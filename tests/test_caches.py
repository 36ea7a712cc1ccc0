"""Session-cache lifecycle: the chain/run artifacts are keyed weakly by
session, and ``clear_session_caches`` frees the persisted blocks
deterministically (VERDICT r3 #5 — service safety)."""

from __future__ import annotations

from pyspark import StorageLevel

from mevi_spark.plans import retrieval as R


def test_clear_session_caches_frees_blocks(spark, sf_dir):
    mapping, codebook = R._codebook2(spark, sf_dir)
    run = R._ann_run(spark, sf_dir)
    assert spark in R._CHAIN_CACHE and spark in R._RUN_CACHE
    assert mapping.storageLevel != StorageLevel.NONE
    assert run.storageLevel != StorageLevel.NONE

    R.clear_session_caches(spark)

    assert spark not in R._CHAIN_CACHE and spark not in R._RUN_CACHE
    assert mapping.storageLevel == StorageLevel.NONE
    assert codebook.storageLevel == StorageLevel.NONE
    assert run.storageLevel == StorageLevel.NONE

    # idempotent on an empty session, and a rebuild re-populates
    R.clear_session_caches(spark)
    m2, _ = R._codebook2(spark, sf_dir)
    assert m2.storageLevel != StorageLevel.NONE
    assert sorted(r["id"] for r in m2.limit(5).collect()) == sorted(
        r["id"] for r in mapping.limit(5).collect()
    )


def test_clear_frees_persisted_level_frames(spark, sf_dir):
    """The K-row per-level centroid frames persisted inside
    rq_encode_seeded(persist_levels=True) are tracked in the cache entry
    and unpersisted on clear — not left for session GC (ADVICE r5)."""
    R.clear_session_caches(spark)
    R._codebook2(spark, sf_dir)
    entry = R._CHAIN_CACHE[spark][sf_dir]
    assert len(entry) > 2, "level frames should ride along in the entry"
    levels = entry[2:]
    assert all(df.storageLevel != StorageLevel.NONE for df in levels)
    R.clear_session_caches(spark)
    assert all(df.storageLevel == StorageLevel.NONE for df in levels)


def test_caches_are_per_session_maps(spark, sf_dir):
    """The weak keying is by session object — no id()-tuple keys that a
    recycled id could alias."""
    R._codebook2(spark, sf_dir)
    assert set(R._CHAIN_CACHE[spark]) == {sf_dir}
    for key in R._RUN_CACHE.get(spark, {}):
        assert isinstance(key, tuple) and key[0] == sf_dir
