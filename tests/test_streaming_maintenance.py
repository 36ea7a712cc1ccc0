"""Round-8 maintenance operators: incremental near-dup convergence to
the batch answer, rollup partial replay-idempotence, and the
compaction state bound (buckets×types rows in one dir, crash-safe
watermark semantics)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from mevi_spark.operators.rollup import (
    finalize_rollup,
    merge_rollup_partials,
    rollup_partials,
)
from mevi_spark.streaming.incremental import (
    _rollup_parts,
    compact_rollup,
    rollup_state,
)


def _events(spark):
    # two types, timestamps spread over 3 minutes within one hour
    rows = [
        (i, 1000 + i % 2, f"t{i % 2}", float(i) / 4) for i in range(24)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    )
    return df.withColumn(
        "ts", F.timestamp_micros((F.col("event_id") * 7_000_000 + F.lit(1_000_000_000)))
    )


def test_rollup_partials_merge_equals_whole(spark):
    """Mergeability, the claim itself: partials over disjoint halves,
    merged, equal partials over the union — for counts and exact sums."""
    ev = _events(spark)
    a = rollup_partials(ev.filter(F.col("event_id") < 12))
    b = rollup_partials(ev.filter(F.col("event_id") >= 12))
    merged = {
        (r.resolution, r.bucket_us, r.event_type): (r.n_events, r.sum_e6)
        for r in merge_rollup_partials(a.unionByName(b)).collect()
    }
    whole = {
        (r.resolution, r.bucket_us, r.event_type): (r.n_events, r.sum_e6)
        for r in rollup_partials(ev).collect()
    }
    assert merged == whole


def test_rollup_state_compaction_bound_and_idempotent_replay(spark):
    ev = _events(spark)
    base = tempfile.mkdtemp(prefix="mevi_test_rollup_")
    out = f"{base}/out"
    os.makedirs(out)
    # three "micro-batches" as per-batch partial dirs
    for i in range(3):
        part = rollup_partials(
            ev.filter(F.col("event_id") % 3 == i)
        )
        part.write.mode("overwrite").parquet(f"{out}/b{i:09d}")
    want = {
        (r.resolution, r.bucket_us, r.event_type): (r.n_events, r.sum_e6)
        for r in rollup_partials(ev).collect()
    }

    def state():
        return {
            (r.resolution, r.bucket_us, r.event_type): (r.n_events, r.sum_e6)
            for r in rollup_state(spark, out).collect()
        }

    assert state() == want
    # replay-idempotence: a crashed batch re-writes ITS OWN dir with
    # identical content — state unchanged (no double counting)
    rollup_partials(ev.filter(F.col("event_id") % 3 == 1)).write.mode(
        "overwrite"
    ).parquet(f"{out}/b{1:09d}")
    assert state() == want
    # compaction folds all three, state identical, live dirs gone
    assert compact_rollup(spark, out) == 3
    _, upto, live = _rollup_parts(out)
    assert upto == 2 and live == []
    assert state() == want
    # the eviction bound: the base holds exactly buckets×types rows
    n_combo = len(want)
    assert spark.read.parquet(f"{out}/base").count() == n_combo
    # a late batch after compaction: only dirs > watermark are live
    rollup_partials(ev.filter(F.col("event_id") < 6)).write.mode(
        "overwrite"
    ).parquet(f"{out}/b{3:09d}")
    _, _, live = _rollup_parts(out)
    assert [os.path.basename(p) for p in live] == ["b000000003"]
    # finalize shape
    fin = finalize_rollup(rollup_state(spark, out))
    assert set(fin.columns) == {
        "resolution", "bucket_us", "event_type", "n_events", "sum_value",
    }


def test_incremental_neardup_converges_to_batch(spark):
    """Two batches, every near-dup pair SPANNING them: the drained
    index+pairs state equals the one-shot batch dedup_minhash — the
    cross-batch probe finds exactly what the self-join would."""
    from mevi_spark.operators.dedup import dedup_minhash
    from mevi_spark.streaming.incremental import incremental_neardup

    words = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    docs = [
        (1, words),
        (2, words + " kilo"),             # near dup of 1
        (3, "totally different content here nothing shared at all x y"),
        (4, words),                        # exact dup of 1
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    want = {
        (r.id_a, r.id_b): round(r.jaccard, 6)
        for r in dedup_minhash(df, num_hashes=12, bands=4, threshold=0.5)
        .collect()
    }
    assert want  # fixture must actually contain qualifying pairs

    base = tempfile.mkdtemp(prefix="mevi_test_ndup_")
    for i, pred in enumerate((F.col("doc_id") <= 2, F.col("doc_id") > 2)):
        df.filter(pred).coalesce(1).write.mode("overwrite").parquet(
            f"{base}/in/s{i:02d}"
        )
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/in/s*")
    )
    q = incremental_neardup(
        stream, f"{base}/out", f"{base}/ckpt",
        num_hashes=12, bands=4, threshold=0.5,
    )
    q.awaitTermination()
    got = {
        (r.id_a, r.id_b): round(r.jaccard, 6)
        for r in spark.read.parquet(f"{base}/out/pairs").collect()
    }
    assert got == want
    # the index carries every ingested doc exactly once
    assert sorted(
        r.doc_id for r in spark.read.parquet(f"{base}/out/index").collect()
    ) == [1, 2, 3, 4]
    import shutil

    shutil.rmtree(base, ignore_errors=True)


def test_incremental_heavy_hitters_complete_and_replay_safe(spark):
    """The maintained MG summary (a) never exceeds capacity, (b) keeps
    every term above N/(capacity+1) across multi-batch ingest with a
    skewed vocabulary larger than capacity, and (c) re-running the
    drained stream against the SAME checkpoint absorbs nothing twice
    (the batch-id replay guard)."""
    import shutil

    from collections import Counter

    from mevi_spark.streaming import incremental_heavy_hitters
    from mevi_spark.streaming.incremental import stream_parquet_source

    import random

    data = []
    for i in range(4):
        data += [f"h{i}"] * (120 + 40 * i)
    for j in range(120):
        data += [f"t{j}"] * (1 + j % 2)
    random.Random(3).shuffle(data)
    cnt, n, cap = Counter(data), len(data), 24
    base = tempfile.mkdtemp(prefix="mevi_hh_t_")
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(data)], "i long, term string"
    )
    try:
        for s in range(3):
            df.filter(F.col("i") % 3 == s).coalesce(1).write.mode(
                "overwrite"
            ).parquet(f"{base}/in/s{s:02d}")
        stream = stream_parquet_source(
            spark, f"{base}/in/s*", df.schema, max_files_per_trigger=1
        )
        terms = stream.select("term")

        def run():
            q = incremental_heavy_hitters(
                terms, f"{base}/out", f"{base}/ckpt", cap, col="term"
            )
            q.awaitTermination()
            return {
                r.term: r.cnt
                for r in spark.read.parquet(f"{base}/out").collect()
            }

        state = run()
        assert len(state) <= cap
        must = {t for t, c in cnt.items() if c > n / (cap + 1)}
        assert must <= set(state), must - set(state)
        # undercount bound: stored ≤ true, deficit ≤ N/(cap+1)
        for t, c in state.items():
            assert c <= cnt[t]
            assert cnt[t] - c <= n / (cap + 1) + 1e-9
        # replay: same checkpoint, no new files → state unchanged
        assert run() == state
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_rollup_partials_single_resolution(spark):
    """A one-entry resolutions dict is a legal use of the documented
    parameter — it must produce a constant-label rollup, not crash on
    an empty when-chain (round-8 review finding)."""
    ev = _events(spark)
    got = {
        (r.resolution, r.bucket_us, r.event_type): (r.n_events, r.sum_e6)
        for r in rollup_partials(
            ev, resolutions={"1h": 3_600_000_000}
        ).collect()
    }
    assert got
    assert {k[0] for k in got} == {"1h"}
    full = {
        k: v
        for k, v in (
            (
                (r.resolution, r.bucket_us, r.event_type),
                (r.n_events, r.sum_e6),
            )
            for r in rollup_partials(ev).collect()
        )
        if k[0] == "1h"
    }
    assert got == full


def test_neardup_probe_bucket_pruning(spark):
    """The wired bucketed band layout (VERDICT r8 next-round #5): the
    published band table is hive-partitioned by the band-key bucket,
    the probe's bucket filter plans as PartitionFilters, and the
    scanned-file set SHRINKS with bucket count — n_buckets=1 must read
    every band file, n_buckets=16 only the batch's buckets. Also pins
    the n_buckets restart guard."""
    import glob
    import os
    import shutil

    import pytest

    from mevi_spark.operators.dedup import banded_keys, minhash_frame
    from mevi_spark.streaming.incremental import (
        band_bucket_expr,
        incremental_neardup,
    )

    rng_words = [
        " ".join(f"w{i}x{j}" for j in range(12)) for i in range(40)
    ]
    df = spark.createDataFrame(
        [(i, rng_words[i]) for i in range(40)], "doc_id long, text string"
    )
    base = tempfile.mkdtemp(prefix="mevi_test_ndbkt_")
    try:
        df.coalesce(1).write.mode("overwrite").parquet(f"{base}/in/s00")

        def build(nb_count, out):
            stream = (
                spark.readStream.schema(df.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{base}/in/s*")
            )
            q = incremental_neardup(
                stream, f"{base}/{out}", f"{base}/ckpt_{out}",
                num_hashes=12, bands=4, threshold=0.5,
                n_buckets=nb_count,
            )
            q.awaitTermination()
            return f"{base}/{out}/bands"

        b16 = build(16, "o16")
        b1 = build(1, "o1")

        def band_files(bands_dir, bkts=None):
            real = os.path.realpath(bands_dir)
            pat = (
                f"{real}/_bkt=*/*.parquet"
                if bkts is None
                else None
            )
            if pat:
                return sorted(glob.glob(pat))
            return sorted(
                f
                for b in bkts
                for f in glob.glob(f"{real}/_bkt={b}/*.parquet")
            )

        # the probe's bucket set for a one-doc batch
        probe_doc = spark.createDataFrame(
            [(999, rng_words[3])], "doc_id long, text string"
        )
        nb = banded_keys(
            minhash_frame(probe_doc, "text", "doc_id", 12, 3),
            "doc_id", "sig", 4, sig_len=12,
        )
        bk16 = [
            r[0]
            for r in nb.withColumn("_bkt", band_bucket_expr(16))
            .select("_bkt").distinct().collect()
        ]
        bk1 = [
            r[0]
            for r in nb.withColumn("_bkt", band_bucket_expr(1))
            .select("_bkt").distinct().collect()
        ]
        all16, hit16 = band_files(b16), band_files(b16, bk16)
        all1, hit1 = band_files(b1), band_files(b1, bk1)
        assert len(bk16) <= 4  # ≤ bands buckets for a one-doc batch
        # the scanned FRACTION of the band table shrinks with bucket
        # count: at n_buckets=1 the probe must read every file, at 16
        # only the batch's ≤4 buckets' files
        assert 0 < len(hit16) < len(all16), (len(hit16), len(all16))
        assert hit1 == all1  # one bucket: pruning impossible
        # dir-level: the probe opens at most the batch's bucket dirs
        real16 = os.path.realpath(b16)
        n_dirs = len(glob.glob(f"{real16}/_bkt=*"))
        assert n_dirs > len(bk16), (n_dirs, bk16)
        # the probe scan itself plans partition pruning on _bkt
        probe = spark.read.parquet(b16).filter(
            F.col("_bkt").isin([int(b) for b in bk16])
        )
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan and "_bkt" in plan
        # probing the pruned buckets still finds doc 3's band rows
        got = probe.join(
            nb.select("band", "key"), ["band", "key"]
        ).select("_id").distinct().collect()
        assert 3 in {r["_id"] for r in got}
        # restart with a different n_buckets fails loudly
        df.coalesce(1).write.mode("overwrite").parquet(f"{base}/in2/s00")
        stream2 = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/in2/s*")
        )
        q2 = incremental_neardup(
            stream2, f"{base}/o16", f"{base}/ckpt_guard",
            num_hashes=12, bands=4, threshold=0.5, n_buckets=4,
        )
        with pytest.raises(Exception, match="n_buckets"):
            q2.awaitTermination()
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_neardup_survives_all_short_first_batch(spark):
    """Review r9: a FIRST micro-batch whose docs all have fewer words
    than shingle_n yields zero band rows; the partitioned bands publish
    must still leave a READABLE version (a zero-row hive-partitioned
    write emits only _SUCCESS — no schema-bearing file — and every
    later batch then dies at read.parquet, wedging the stream across
    restarts). After the fix the stream drains and the cross-batch
    pair is still found."""
    import shutil

    from mevi_spark.streaming.incremental import incremental_neardup

    words = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    docs = [
        (1, "tiny"),          # batch 0: shorter than shingle_n -> no bands
        (2, "a b"),
        (10, words),          # batch 1 and 2: a cross-batch near-dup pair
        (11, words + " kilo"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    base = tempfile.mkdtemp(prefix="mevi_test_ndshort_")
    try:
        splits = (
            F.col("doc_id") < 10,
            F.col("doc_id") == 10,
            F.col("doc_id") == 11,
        )
        for i, pred in enumerate(splits):
            df.filter(pred).coalesce(1).write.mode("overwrite").parquet(
                f"{base}/in/s{i:02d}"
            )
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/in/s*")
        )
        q = incremental_neardup(
            stream, f"{base}/out", f"{base}/ckpt",
            num_hashes=12, bands=4, threshold=0.5,
        )
        q.awaitTermination()
        pairs = {
            (r.id_a, r.id_b)
            for r in spark.read.parquet(f"{base}/out/pairs").collect()
        }
        assert (10, 11) in pairs
        assert sorted(
            r.doc_id
            for r in spark.read.parquet(f"{base}/out/index").collect()
        ) == [1, 2, 10, 11]
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_neardup_publish_copies_untouched_buckets_forward(spark):
    """The bucket-incremental publish (VERDICT r9 next-round #2): a
    second batch rewrites ONLY the buckets it touches — every
    untouched band-bucket and doc-bucket directory in the new version
    is the PREVIOUS version's directory carried forward by hardlink
    (same file names, same inodes, hence byte-identical with zero
    copied data) — while the drained state still equals the one-shot
    batch dedup."""
    import glob
    import os
    import shutil

    from mevi_spark.operators.dedup import (
        banded_keys,
        dedup_minhash,
        minhash_frame,
    )
    from mevi_spark.streaming.incremental import (
        band_bucket_expr,
        doc_bucket_expr,
        incremental_neardup,
    )

    words = [" ".join(f"a{i}b{j}" for j in range(12)) for i in range(30)]
    b1 = spark.createDataFrame(
        [(i, words[i]) for i in range(30)], "doc_id long, text string"
    )
    b2 = spark.createDataFrame(
        [(999, words[7] + " extra")], "doc_id long, text string"
    )
    n_buckets = 16
    base = tempfile.mkdtemp(prefix="mevi_test_ndcf_")
    try:
        b1.coalesce(1).write.mode("overwrite").parquet(f"{base}/in/s00")

        def drain():
            stream = (
                spark.readStream.schema(b1.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{base}/in/s*")
            )
            q = incremental_neardup(
                stream, f"{base}/out", f"{base}/ckpt",
                num_hashes=12, bands=4, threshold=0.5,
                n_buckets=n_buckets,
            )
            q.awaitTermination()

        drain()

        def snapshot(table_dir):
            real = os.path.realpath(table_dir)
            out = {}
            for d in glob.glob(f"{real}/*=*"):
                files = {}
                for f in sorted(os.listdir(d)):
                    if f.startswith(("_", ".")):
                        continue
                    st = os.stat(os.path.join(d, f))
                    files[f] = (st.st_ino, st.st_size)
                out[os.path.basename(d)] = files
            return real, out

        bands_dir, idx_dir = f"{base}/out/bands", f"{base}/out/index"
        old_bands_real, old_bands = snapshot(bands_dir)
        old_idx_real, old_idx = snapshot(idx_dir)
        assert len(old_bands) > 4  # enough buckets for "untouched" to exist

        b2.coalesce(1).write.mode("overwrite").parquet(f"{base}/in/s01")
        drain()

        new_bands_real, new_bands = snapshot(bands_dir)
        new_idx_real, new_idx = snapshot(idx_dir)
        assert new_bands_real != old_bands_real  # fresh version published

        # expected touched sets for the one-doc batch
        nb = banded_keys(
            minhash_frame(b2, "text", "doc_id", 12, 3),
            "doc_id", "sig", 4, sig_len=12,
        )
        touched_band = {
            r[0]
            for r in nb.withColumn("_bkt", band_bucket_expr(n_buckets))
            .select("_bkt").distinct().collect()
        }
        touched_doc = {
            r[0]
            for r in b2.withColumn("_dbkt", doc_bucket_expr(n_buckets))
            .select("_dbkt").distinct().collect()
        }

        def check(old, new, col, touched):
            untouched = [k for k in old if k not in
                         {f"{col}={v}" for v in touched}]
            assert untouched, "fixture must leave some buckets untouched"
            for k in untouched:
                # identical file names AND inodes: the directory was
                # hardlinked forward, not rewritten
                assert new.get(k) == old[k], k
            # and at least one touched bucket was genuinely rewritten
            rewritten = [
                k for k in new
                if k in {f"{col}={v}" for v in touched}
            ]
            assert rewritten

        check(old_bands, new_bands, "_bkt", touched_band)
        check(old_idx, new_idx, "_dbkt", touched_doc)

        # the maintained state still converges to the batch engine
        full = b1.unionByName(b2)
        want = {
            (r.id_a, r.id_b): round(r.jaccard, 6)
            for r in dedup_minhash(
                full, num_hashes=12, bands=4, threshold=0.5
            ).collect()
        }
        got = {
            (r.id_a, r.id_b): round(r.jaccard, 6)
            for r in spark.read.parquet(f"{base}/out/pairs").collect()
        }
        assert got == want
        assert sorted(
            r.doc_id
            for r in spark.read.parquet(f"{base}/out/index").collect()
        ) == sorted([*range(30), 999])
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_neardup_reingest_drops_stale_band_rows_everywhere(spark):
    """A doc re-ingested with DIFFERENT text changes its signature, so
    its old band rows live in buckets the new keys may not touch. The
    publish must rewrite those buckets too (old-signature lookup via
    the doc-bucketed index) or stale rows would keep colliding on a
    signature the doc no longer has."""
    import shutil

    from mevi_spark.operators.dedup import banded_keys, minhash_frame
    from mevi_spark.streaming.incremental import incremental_neardup

    old_text = " ".join(f"o{i}" for i in range(12))
    new_text = " ".join(f"n{i}" for i in range(12))
    # doc 6 is a near-dup of doc 5's OLD text, so batch 1 publishes the
    # verified pair (5, 6) — which must DISAPPEAR when doc 5's text
    # changes (stale pairs are state like stale band rows)
    b1 = spark.createDataFrame(
        [(5, old_text), (6, old_text + " extra")],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame([(5, new_text)], "doc_id long, text string")
    base = tempfile.mkdtemp(prefix="mevi_test_ndri_")
    try:
        b1.coalesce(1).write.mode("overwrite").parquet(f"{base}/in/s00")

        def drain():
            stream = (
                spark.readStream.schema(b1.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{base}/in/s*")
            )
            q = incremental_neardup(
                stream, f"{base}/out", f"{base}/ckpt",
                num_hashes=12, bands=4, threshold=0.5, n_buckets=16,
            )
            q.awaitTermination()

        drain()
        assert {
            (r.id_a, r.id_b)
            for r in spark.read.parquet(f"{base}/out/pairs").collect()
        } == {(5, 6)}
        b2.coalesce(1).write.mode("overwrite").parquet(f"{base}/in/s01")
        drain()
        # the (5, 6) pair was about doc 5's OLD text — it must be gone
        assert spark.read.parquet(f"{base}/out/pairs").count() == 0

        want = {
            (r.band, r.key)
            for r in banded_keys(
                minhash_frame(b2, "text", "doc_id", 12, 3),
                "doc_id", "sig", 4, sig_len=12,
            ).collect()
        }
        got = {
            (r.band, r.key)
            for r in spark.read.parquet(f"{base}/out/bands")
            .filter(F.col("_id") == 5)
            .collect()
        }
        # exactly the NEW signature's keys — no stale old-text rows
        assert got == want
        # and the index carries the new signature once
        idx = spark.read.parquet(f"{base}/out/index").filter(
            F.col("doc_id") == 5
        ).collect()
        assert len(idx) == 1
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_neardup_reingest_below_threshold_collision_stays_dropped(spark):
    """Re-ingest where the NEW text still band-collides with the old
    partner but falls BELOW the Jaccard threshold: the stale pair must
    stay dropped. Regression for the verify-corpus bug where a
    re-ingested id kept BOTH its old index row and its new batch row in
    the shingle frame, so the verify join fanned out and could re-admit
    the pair scored against the OLD text."""
    import shutil

    from mevi_spark.operators.dedup import banded_keys, minhash_frame
    from mevi_spark.streaming.incremental import incremental_neardup

    old_text = " ".join(f"o{i}" for i in range(16))
    # new text keeps half the words: shares a shingle prefix with doc
    # 6 (the x1w* suffix was picked so the deterministic minhash DOES
    # band-collide at 12 one-hash bands — double hashing correlates
    # bands, so not every below-threshold text collides) while exact
    # Jaccard is 6/22 — well under the 0.5 threshold; both premises
    # asserted below so a hash change fails loudly
    new_text = " ".join(
        [f"o{i}" for i in range(8)] + [f"x1w{i}" for i in range(8)]
    )
    b1 = spark.createDataFrame(
        [(5, old_text), (6, old_text)], "doc_id long, text string"
    )
    b2 = spark.createDataFrame([(5, new_text)], "doc_id long, text string")

    # premise 1: the new signature still band-collides with doc 6
    sigs = minhash_frame(
        spark.createDataFrame(
            [(5, new_text), (6, old_text)], "doc_id long, text string"
        ),
        "text", "doc_id", 12, 3,
    )
    by_id: dict = {}
    for r in banded_keys(sigs, "doc_id", "sig", 12, sig_len=12).collect():
        by_id.setdefault(r._id, set()).add((r.band, r.key))
    assert by_id[5] & by_id[6], "fixture must band-collide"
    # premise 2: exact Jaccard of the new text vs doc 6 is < threshold
    sh = {r.doc_id: set(r.shingles) for r in sigs.collect()}
    jac = len(sh[5] & sh[6]) / len(sh[5] | sh[6])
    assert jac < 0.5, f"fixture jaccard {jac} must be below threshold"

    base = tempfile.mkdtemp(prefix="mevi_test_ndbt_")
    try:
        b1.coalesce(1).write.mode("overwrite").parquet(f"{base}/in/s00")

        def drain():
            stream = (
                spark.readStream.schema(b1.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{base}/in/s*")
            )
            q = incremental_neardup(
                stream, f"{base}/out", f"{base}/ckpt",
                num_hashes=12, bands=12, threshold=0.5, n_buckets=16,
            )
            q.awaitTermination()

        drain()
        assert {
            (r.id_a, r.id_b)
            for r in spark.read.parquet(f"{base}/out/pairs").collect()
        } == {(5, 6)}
        b2.coalesce(1).write.mode("overwrite").parquet(f"{base}/in/s01")
        drain()
        # the band collision puts (5, 6) back in the candidate set, but
        # the verify must score it against doc 5's NEW shingles only —
        # below threshold, so the stale pair stays dropped
        assert spark.read.parquet(f"{base}/out/pairs").count() == 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_neardup_zero_key_batch_preserves_state(spark):
    """A batch contributing no band keys (empty-shingle doc) must leave
    the band table's content intact — the touched set is empty, the
    publish is pure copy-forward — while the doc itself still joins
    the index."""
    import shutil

    from mevi_spark.streaming.incremental import incremental_neardup

    b1 = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(12))),
         (2, " ".join(f"v{i}" for i in range(12)))],
        "doc_id long, text string",
    )
    # normalize_text strips punctuation-only text → empty shingles
    b2 = spark.createDataFrame([(3, "!!! ... ???")], "doc_id long, text string")
    base = tempfile.mkdtemp(prefix="mevi_test_ndz_")
    try:
        b1.coalesce(1).write.mode("overwrite").parquet(f"{base}/in/s00")

        def drain():
            stream = (
                spark.readStream.schema(b1.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{base}/in/s*")
            )
            q = incremental_neardup(
                stream, f"{base}/out", f"{base}/ckpt",
                num_hashes=12, bands=4, threshold=0.5, n_buckets=8,
            )
            q.awaitTermination()

        drain()
        before = sorted(
            (r._id, r.band, r.key)
            for r in spark.read.parquet(f"{base}/out/bands").collect()
        )
        b2.coalesce(1).write.mode("overwrite").parquet(f"{base}/in/s01")
        drain()
        after = sorted(
            (r._id, r.band, r.key)
            for r in spark.read.parquet(f"{base}/out/bands").collect()
        )
        assert after == before  # band content carried forward intact
        assert sorted(
            r.doc_id
            for r in spark.read.parquet(f"{base}/out/index").collect()
        ) == [1, 2, 3]
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _semdd_drain(spark, base, cents, schema, threshold=0.95, n_buckets=8):
    from mevi_spark.streaming.incremental import incremental_semdedup

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/in/s*")
    )
    q = incremental_semdedup(
        stream, cents, f"{base}/out", f"{base}/ckpt",
        threshold=threshold, n_buckets=n_buckets,
    )
    q.awaitTermination()
    return {
        r._id: (r.code, r.kept)
        for r in spark.read.parquet(f"{base}/out/scored").collect()
    }


def test_semdedup_cross_batch_demotion(spark):
    """A later arrival with LOWER centroid cosine must demote the
    already-kept member of its duplicate group — the cross-batch state
    transition that makes this maintenance, not append."""
    import shutil

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0])], "code long, centroid array<double>"
    )
    b1 = spark.createDataFrame(
        [(1, [1.0, 0.10])], "vec_id long, embedding array<double>"
    )
    b2 = spark.createDataFrame(
        [(2, [1.0, 0.12])], "vec_id long, embedding array<double>"
    )
    base = tempfile.mkdtemp(prefix="mevi_sdd_t_")
    try:
        b1.coalesce(1).write.mode("overwrite").parquet(f"{base}/in/s00")
        got = _semdd_drain(spark, base, cents, b1.schema)
        assert got == {1: (0, 1)}  # alone → kept
        b2.coalesce(1).write.mode("overwrite").parquet(f"{base}/in/s01")
        got = _semdd_drain(spark, base, cents, b1.schema)
        # doc 2 is farther from the centroid → it wins, doc 1 demoted
        assert got == {1: (0, 0), 2: (0, 1)}
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_semdedup_reingest_moves_cluster_and_promotes_orphan(spark):
    """A re-ingested vector that moves clusters must (a) leave exactly
    one row, in the NEW cluster, and (b) re-run its OLD cluster's
    tournament — its departure promotes the member it had demoted."""
    import shutil

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "code long, centroid array<double>",
    )
    # batch 1: ids 1 and 2 near-identical in cluster 0; id 1 farther
    # from the centroid → id 2 demoted
    b1 = spark.createDataFrame(
        [(1, [1.0, 0.12]), (2, [1.0, 0.10])],
        "vec_id long, embedding array<double>",
    )
    # batch 2: id 1 re-ingested pointing into cluster 1
    b2 = spark.createDataFrame(
        [(1, [0.05, 1.0])], "vec_id long, embedding array<double>"
    )
    base = tempfile.mkdtemp(prefix="mevi_sdd_ri_")
    try:
        b1.coalesce(1).write.mode("overwrite").parquet(f"{base}/in/s00")
        got = _semdd_drain(spark, base, cents, b1.schema)
        assert got == {1: (0, 1), 2: (0, 0)}
        b2.coalesce(1).write.mode("overwrite").parquet(f"{base}/in/s01")
        got = _semdd_drain(spark, base, cents, b1.schema)
        # one row per id; id 1 now in cluster 1; id 2 promoted
        assert got == {1: (1, 1), 2: (0, 1)}
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_semdedup_untouched_buckets_copy_forward(spark):
    """A batch that touches one cluster leaves every other scored
    bucket directory inode-identical (hardlinked forward)."""
    import glob
    import os
    import shutil

    # 8 clusters spread across buckets; batch 2 touches only cluster 0
    cents = spark.createDataFrame(
        [(c, [float(c + 1), float(8 - c)]) for c in range(8)],
        "code long, centroid array<double>",
    )
    import random

    rng = random.Random(7)
    rows = [
        (i, [float(c + 1) + rng.uniform(-0.01, 0.01),
             float(8 - c) + rng.uniform(-0.01, 0.01)])
        for i, c in enumerate(list(range(8)) * 3)
    ]
    b1 = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    b2 = spark.createDataFrame(
        [(999, [1.0, 7.0])], "vec_id long, embedding array<double>"
    )
    base = tempfile.mkdtemp(prefix="mevi_sdd_cf_")
    try:
        b1.coalesce(1).write.mode("overwrite").parquet(f"{base}/in/s00")
        _semdd_drain(spark, base, cents, b1.schema, n_buckets=8)

        def snap():
            real = os.path.realpath(f"{base}/out/scored")
            return {
                os.path.basename(d): {
                    f: os.stat(os.path.join(d, f)).st_ino
                    for f in os.listdir(d)
                    if not f.startswith(("_", "."))
                }
                for d in glob.glob(f"{real}/_kbkt=*")
            }

        before = snap()
        assert len(before) > 2
        b2.coalesce(1).write.mode("overwrite").parquet(f"{base}/in/s01")
        _semdd_drain(spark, base, cents, b1.schema, n_buckets=8)
        after = snap()
        changed = [k for k in before if after.get(k) != before[k]]
        # exactly the bucket(s) of the touched cluster rewrote
        assert len(changed) <= 2 and len(changed) >= 1, changed
        untouched = [k for k in before if k not in changed]
        assert untouched
        for k in untouched:
            assert after[k] == before[k], k
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_neardup_crash_between_bands_and_idx_publish_replays_clean(
    spark, monkeypatch
):
    """Publish-order crash-safety (round-10 review finding): the docs
    index must flip LAST. A crash after the bands publish but before
    the idx publish, during a batch that re-ingests a doc with new
    text, must on replay still sweep the doc's OLD-signature band rows
    — the replay derives the old buckets from the still-unflipped
    index. (With idx flipped first, the replay would compute 'old'
    buckets from the NEW signature and strand the stale rows in
    copy-forwarded buckets forever.)"""
    import shutil

    from mevi_spark.operators.dedup import banded_keys, minhash_frame
    from mevi_spark.streaming import incremental as inc

    old_text = " ".join(f"o{i}" for i in range(12))
    new_text = " ".join(f"n{i}" for i in range(12))
    b1 = spark.createDataFrame(
        [(5, old_text), (6, "some other entirely unrelated words go here")],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame([(5, new_text)], "doc_id long, text string")
    base = tempfile.mkdtemp(prefix="mevi_test_ndcrash_")
    real_publish = inc._publish_version
    crash = {"armed": False}

    def crashing_publish(out, output_dir, *a, **kw):
        if crash["armed"] and output_dir.endswith("/index"):
            crash["armed"] = False
            raise RuntimeError("injected crash before idx publish")
        return real_publish(out, output_dir, *a, **kw)

    try:

        def drain():
            stream = (
                spark.readStream.schema(b1.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{base}/in/s*")
            )
            q = inc.incremental_neardup(
                stream, f"{base}/out", f"{base}/ckpt",
                num_hashes=12, bands=4, threshold=0.5, n_buckets=16,
            )
            q.awaitTermination()

        b1.coalesce(1).write.mode("overwrite").parquet(f"{base}/in/s00")
        drain()
        b2.coalesce(1).write.mode("overwrite").parquet(f"{base}/in/s01")
        monkeypatch.setattr(inc, "_publish_version", crashing_publish)
        crash["armed"] = True
        import pyspark.errors

        try:
            drain()
            raise AssertionError("injected crash did not fire")
        except pyspark.errors.exceptions.captured.StreamingQueryException:
            pass
        assert not crash["armed"]  # it fired exactly once
        # bands are already NEW, idx is still OLD — the wedge state.
        # Replay (same checkpoint; offsets never committed):
        drain()
        want = {
            (r.band, r.key)
            for r in banded_keys(
                minhash_frame(b2, "text", "doc_id", 12, 3),
                "doc_id", "sig", 4, sig_len=12,
            ).collect()
        }
        got = {
            (r.band, r.key)
            for r in spark.read.parquet(f"{base}/out/bands")
            .filter(F.col("_id") == 5)
            .collect()
        }
        assert got == want  # no stale old-signature rows anywhere
        idx = spark.read.parquet(f"{base}/out/index").filter(
            F.col("doc_id") == 5
        ).collect()
        assert len(idx) == 1
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_chunk_kept_incremental_first_owner_wins_and_copy_forward(spark):
    """Exact-substring index under ingest: a chunk's first-arrival
    owner survives later repeats; only fresh chunks' buckets rewrite
    (untouched dirs inode-identical); a replayed batch is a pure
    copy-forward no-op."""
    import glob
    import os
    import shutil

    from mevi_spark.streaming.incremental import (
        append_chunk_kept,
        incremental_chunk_dedup,
    )

    w1 = " ".join(f"a{i}" for i in range(8))
    w2 = " ".join(f"b{i}" for i in range(8))
    w3 = " ".join(f"c{i}" for i in range(8))
    b1 = spark.createDataFrame(
        [(1, w1 + " " + w2)], "doc_id long, text string"
    )
    # doc 2 repeats w1 (owned by doc 1) and introduces w3
    b2 = spark.createDataFrame(
        [(2, w1 + " " + w3)], "doc_id long, text string"
    )
    base = tempfile.mkdtemp(prefix="mevi_chk_t_")
    try:
        append_chunk_kept(spark, f"{base}/s", b1, n_buckets=8)

        def snap():
            real = os.path.realpath(f"{base}/s")
            return {
                os.path.basename(d): {
                    f: os.stat(os.path.join(d, f)).st_ino
                    for f in os.listdir(d)
                    if not f.startswith(("_", "."))
                }
                for d in glob.glob(f"{real}/_hbkt=*")
            }

        before = snap()
        append_chunk_kept(spark, f"{base}/s", b2, n_buckets=8)
        kept = {
            (r.doc_id, r.idx): r.chunk
            for r in spark.read.parquet(f"{base}/s").collect()
        }
        # w1 still owned by (1, 0); w3 fresh at (2, 1); doc 2's repeat
        # of w1 never entered the index
        assert kept == {(1, 0): w1, (1, 1): w2, (2, 1): w3}
        after = snap()
        # at least one batch-1 bucket must be untouched AND carried by
        # inode (hardlink) — a hard assertion, not a fallback: if a
        # bucket-layout change ever makes every batch-1 bucket
        # collide with the fresh chunk's, fail loudly and re-pick the
        # fixture words instead of silently not testing copy-forward
        untouched = [
            k for k in before if after.get(k) == before[k]
        ]
        assert untouched, (before, after)
        # replay of batch 2: nothing fresh → state content unchanged
        append_chunk_kept(spark, f"{base}/s", b2, n_buckets=8)
        kept2 = {
            (r.doc_id, r.idx): r.chunk
            for r in spark.read.parquet(f"{base}/s").collect()
        }
        assert kept2 == kept
        # streaming wrapper equals direct calls
        for i, b in enumerate((b1, b2)):
            b.coalesce(1).write.mode("overwrite").parquet(
                f"{base}/in/s{i:02d}"
            )
        stream = (
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/in/s*")
        )
        q = incremental_chunk_dedup(
            stream, f"{base}/s2", f"{base}/ckpt", n_buckets=8
        )
        q.awaitTermination()
        kept_s = {
            (r.doc_id, r.idx): r.chunk
            for r in spark.read.parquet(f"{base}/s2").collect()
        }
        assert kept_s == kept
    finally:
        shutil.rmtree(base, ignore_errors=True)

def test_incremental_lexical_stats_converges_and_replays(spark):
    """Lexical (BM25/TF-IDF) corpus stats as mergeable partials: the
    merged state over three batch dirs equals an independently computed
    batch answer; a crashed batch's replay (its dir rewritten) changes
    nothing; compaction folds everything into one vocabulary-sized base
    with identical state."""
    import os
    import shutil

    from mevi_spark.operators.lexical import lexical_partials
    from mevi_spark.streaming.incremental import (
        _rollup_parts,
        compact_lexical,
        lexical_state,
    )

    texts = {
        1: "the cat sat",
        2: "the dog sat down",
        3: "a cat ran",
        4: "the the the",          # repeated term counts ONCE for df
        5: "",                     # empty doc: dl 0, no terms
        6: "dog park",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    # independent expectation, computed in Python
    toksets = {k: set(v.split()) if v else set() for k, v in texts.items()}
    want_df = {}
    for s in toksets.values():
        for t in s:
            want_df[t] = want_df.get(t, 0) + 1
    want_n = len(texts)
    want_dl = sum(len(v.split()) if v else 0 for v in texts.values())

    base = tempfile.mkdtemp(prefix="mevi_test_lex_")
    out = f"{base}/out"
    os.makedirs(out)
    try:
        for i in range(3):
            lexical_partials(
                docs.filter(F.col("doc_id") % 3 == i)
            ).write.mode("overwrite").parquet(f"{out}/b{i:09d}")

        def state():
            rows = lexical_state(spark, out).collect()
            dfs = {r.term: r.df for r in rows if r.term is not None}
            sent = [r for r in rows if r.term is None]
            assert len(sent) == 1
            return dfs, sent[0].n_docs, sent[0].sum_dl

        dfs, n, dl = state()
        assert dfs == want_df and n == want_n and dl == want_dl
        # replay-idempotence: batch 1 rewrites ITS OWN dir identically
        lexical_partials(
            docs.filter(F.col("doc_id") % 3 == 1)
        ).write.mode("overwrite").parquet(f"{out}/b{1:09d}")
        assert state() == (want_df, want_n, want_dl)
        # compaction: all three folded, no live dirs, state identical,
        # base bounded at vocabulary + sentinel rows
        assert compact_lexical(spark, out) == 3
        _, upto, live = _rollup_parts(out)
        assert upto == 2 and live == []
        assert state() == (want_df, want_n, want_dl)
        assert (
            spark.read.parquet(f"{out}/base").count() == len(want_df) + 1
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


# ---------------------------------------------------------------------------
# incremental connected components (apply_components_batch)


def _cc_state(spark, base):
    labels = {
        (r["_id"], r["component"])
        for r in spark.read.parquet(f"{base}/labels").collect()
    }
    ids = {
        (r["_id"], r["component"])
        for r in spark.read.parquet(f"{base}/ids").collect()
    }
    return labels, ids


def _cc_apply(spark, base, edges, bid):
    from mevi_spark.streaming.incremental import apply_components_batch

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    apply_components_batch(spark, base, df, bid, n_buckets=4)


def test_components_cross_batch_chain_and_merge(spark):
    """Three batches: two separate components grow, then one edge MERGES
    them — the loser component's existing members (never re-ingested)
    must relabel to the winning min id, and labels/ids must agree with
    the one-shot batch operator over all edges."""
    import shutil
    import tempfile

    from mevi_spark.operators.dedup import connected_components

    base = tempfile.mkdtemp(prefix="cc_test_")
    try:
        b0 = [(10, 11), (1, 2)]
        b1 = [(20, 21), (2, 3)]          # chain 1-2 extends to 3
        b2 = [(11, 20), (30, 31)]        # MERGES {10,11} with {20,21}
        for i, b in enumerate((b0, b1, b2)):
            _cc_apply(spark, base, b, i)
        labels, ids = _cc_state(spark, base)
        assert labels == ids
        all_edges = spark.createDataFrame(
            b0 + b1 + b2, "id_a long, id_b long"
        )
        want = {
            (r["id"], r["component"])
            for r in connected_components(all_edges).collect()
        }
        assert labels == want
        # the merge relabeled 20 and 21 (members of the loser, only 20
        # was an endpoint of the merging edge)
        assert (21, 10) in labels
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_components_replay_and_crash_window(spark):
    """(a) Re-running a batch with the same batch_id is a no-op; (b) the
    documented crash window — labels published (sidecar carries the
    batch id), ids still pre-batch — must complete to the clean state
    on replay, including the loser members ids would otherwise keep
    stale forever."""
    import os
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix="cc_crash_")
    try:
        _cc_apply(spark, base, [(5, 6), (100, 101)], 0)
        # pre-batch-1 ids snapshot (resolve the published symlink)
        ids_dir = f"{base}/ids"
        pre = os.path.join(base, "ids_pre_copy")
        shutil.copytree(os.path.realpath(ids_dir), pre)
        merge_edge = [(6, 100)]          # merges {5,6} and {100,101}
        _cc_apply(spark, base, merge_edge, 1)
        clean = _cc_state(spark, base)
        assert clean[0] == clean[1]
        assert (101, 5) in clean[0]      # loser member relabeled
        # replay with the same batch id: identical state
        _cc_apply(spark, base, merge_edge, 1)
        assert _cc_state(spark, base) == clean
        # crash simulation: wind ids back to its pre-batch-1 content
        # while labels stays post-batch-1 (meta batch_id == 1), then
        # replay batch 1 — the kernel must fetch the loser members from
        # ids (labels no longer carries the loser component) and bring
        # ids back in sync
        os.remove(ids_dir)
        os.symlink(pre, ids_dir)
        stale = _cc_state(spark, base)
        assert stale[1] != clean[1] and stale[0] == clean[0]
        _cc_apply(spark, base, merge_edge, 1)
        assert _cc_state(spark, base) == clean
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_components_monotone_ingest_touches_batch_buckets_only(spark):
    """Ascending-id ingest (the append-only corpus): existing roots win
    every merge, so no existing component relabels and the write set is
    batch-sized — new members adopt the old root."""
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix="cc_mono_")
    try:
        _cc_apply(spark, base, [(1, 2)], 0)
        _cc_apply(spark, base, [(2, 50)], 1)   # 50 joins component 1
        _cc_apply(spark, base, [(50, 60)], 2)  # 60 joins component 1
        labels, ids = _cc_state(spark, base)
        assert labels == ids == {(1, 1), (2, 1), (50, 1), (60, 1)}
    finally:
        shutil.rmtree(base, ignore_errors=True)


# ---------------------------------------------------------------------------
# incremental quantile summaries (mp_batch_partials / quantile_state)


def test_quantile_summary_small_is_exact_and_certifies(spark):
    """n ≤ k: no compaction ever fires, the tracked error stays 0, and
    every weighted rank estimate is exactly the true rank."""
    from mevi_spark.operators.sketch import (
        MP_ERR_LEVEL,
        mp_batch_partials,
        mp_certify,
    )

    rows = [("a", float(v)) for v in range(20)] + [("b", 5.0), ("b", 7.0)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    s = mp_batch_partials(df, k=64)
    errs = {
        r["event_type"]: r["value"]
        for r in s.filter(F.col("level") == MP_ERR_LEVEL).collect()
    }
    assert errs == {"a": 0.0, "b": 0.0}
    rel = mp_certify(s, df, k=64)
    assert rel == {"a": 0.0, "b": 0.0}


def test_quantile_store_batches_compact_and_certify(spark):
    """Three batch partials merged on read: capacity respected at every
    level, tracked bound certifies against the accumulated corpus,
    compaction fold leaves the drained state identical, and a replayed
    batch dir rewrites identical content."""
    import shutil
    import tempfile

    from mevi_spark.operators.sketch import mp_batch_partials, mp_certify
    from mevi_spark.streaming.incremental import (
        compact_quantiles,
        quantile_state,
    )

    k = 16
    base = tempfile.mkdtemp(prefix="mpq_test_")
    try:
        n = 900
        df = spark.createDataFrame(
            [("t", float((i * 37) % n)) for i in range(n)],
            "event_type string, value double",
        )
        for i in range(3):
            mp_batch_partials(
                df.filter(F.col("value").cast("long") % 3 == i), k=k
            ).write.mode("overwrite").parquet(f"{base}/b{i:09d}")

        def state_rows():
            return sorted(
                (r["event_type"], r["level"], r["value"])
                for r in quantile_state(spark, base, k=k).collect()
            )

        before = state_rows()
        rel = mp_certify(quantile_state(spark, base, k=k), df, k=k)
        assert 0.0 < rel["t"] < 0.25  # compactions fired, bound small
        # replay: batch 1 rewrites its own dir with identical content
        mp_batch_partials(
            df.filter(F.col("value").cast("long") % 3 == 1), k=k
        ).write.mode("overwrite").parquet(f"{base}/b{1:09d}")
        assert state_rows() == before
        # compaction fold: state identical, dirs absorbed
        assert compact_quantiles(spark, base, k=k) == 3
        assert state_rows() == before
        mp_certify(quantile_state(spark, base, k=k), df, k=k)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_quantile_certify_catches_lying_bound(spark):
    """A summary whose tracked error is tampered below the real error
    must FAIL certification — the certificate is what stands between
    the maintained state and a silently-wrong bound."""
    import pytest as _pytest

    from mevi_spark.operators.sketch import (
        MP_ERR_LEVEL,
        mp_batch_partials,
        mp_certify,
    )

    k = 8
    df = spark.createDataFrame(
        [("t", float(i)) for i in range(200)],
        "event_type string, value double",
    )
    s = mp_batch_partials(df, k=k)
    assert s.filter(
        (F.col("level") == MP_ERR_LEVEL) & (F.col("value") > 0)
    ).count() == 1  # compactions really fired
    lied = s.withColumn(
        "value",
        F.when(F.col("level") == MP_ERR_LEVEL, F.lit(0.0)).otherwise(
            F.col("value")
        ),
    )
    with _pytest.raises(AssertionError, match="tracked bound"):
        mp_certify(lied, df, k=k)


def test_quantile_estimator_within_certified_bound(spark):
    """The deployment read path: quantiles answered FROM the summary
    must have true rank within err + weight(v) of the target — the
    guarantee mp_quantile_estimates documents."""
    from mevi_spark.operators.sketch import (
        mp_batch_partials,
        mp_quantile_estimates,
    )

    k = 16
    n = 700
    vals = [float((i * 53) % n) for i in range(n)]
    df = spark.createDataFrame(
        [("t", v) for v in vals], "event_type string, value double"
    )
    s = mp_batch_partials(df, k=k)
    est = mp_quantile_estimates(s)
    rows = est.collect()
    assert {round(r["p"], 2) for r in rows} == {0.25, 0.5, 0.75, 0.95}
    sorted_vals = sorted(vals)
    for r in rows:
        true_rank = sum(1 for v in sorted_vals if v <= r["v"])
        # the documented TIGHT bound: err + total weight AT the picked
        # value (exposed as the w column)
        assert abs(true_rank - r["p"] * r["n"]) <= r["err"] + r["w"], (
            r["p"], r["v"], true_rank, r["err"], r["w"],
        )


def test_quantile_estimator_collapses_duplicate_values(spark):
    """Regression: a value present as MULTIPLE summary items (different
    levels) must contribute its FULL weight to est_rank — a partial
    prefix at the first duplicate understates the rank and breaks the
    documented err + w guarantee."""
    from mevi_spark.operators.sketch import (
        MP_ERR_LEVEL,
        MP_K_LEVEL,
        MP_N_LEVEL,
        mp_quantile_estimates,
    )

    rows = [
        ("t", 0, 5.0),            # weight 1
        ("t", 3, 5.0),            # SAME value, weight 8
        ("t", 0, 9.0),            # weight 1
        ("t", MP_ERR_LEVEL, 0.0),
        ("t", MP_N_LEVEL, 10.0),
        ("t", MP_K_LEVEL, 16.0),
    ]
    summary = spark.createDataFrame(
        rows, "event_type string, level int, value double"
    )
    est = {
        round(r["p"], 2): r
        for r in mp_quantile_estimates(summary, ps=(0.5, 0.95)).collect()
    }
    # p=0.5 → target 5.0: value 5.0 qualifies only with its FULL
    # weight 9 (partial prefix 1 would skip to 9.0 — the bug)
    assert est[0.5]["v"] == 5.0
    assert est[0.5]["est_rank"] == 9.0 and est[0.5]["w"] == 9.0
    # p=0.95 → target 9.5 > max est 10? est(9.0)=10 ≥ 9.5 → picks 9.0
    assert est[0.95]["v"] == 9.0 and est[0.95]["w"] == 1.0


def test_components_empty_batches(spark):
    """A zero-edge batch publishes pure copy-forward (state unchanged);
    an empty FIRST batch still creates readable (empty) state instead
    of wedging later reads."""
    import shutil
    import tempfile

    base1 = tempfile.mkdtemp(prefix="cc_empty1_")
    base2 = tempfile.mkdtemp(prefix="cc_empty2_")
    try:
        _cc_apply(spark, base1, [(1, 2)], 0)
        before = _cc_state(spark, base1)
        _cc_apply(spark, base1, [], 1)
        assert _cc_state(spark, base1) == before
        _cc_apply(spark, base1, [(2, 3)], 2)
        labels, ids = _cc_state(spark, base1)
        assert labels == ids == {(1, 1), (2, 1), (3, 1)}
        # empty first batch: readable empty state, then normal growth
        _cc_apply(spark, base2, [], 0)
        assert _cc_state(spark, base2) == (set(), set())
        _cc_apply(spark, base2, [(7, 8)], 1)
        assert _cc_state(spark, base2) == ({(7, 7), (8, 7)},) * 2
    finally:
        shutil.rmtree(base1, ignore_errors=True)
        shutil.rmtree(base2, ignore_errors=True)


# ---------------------------------------------------------------------------
# incremental eval metrics (eval_metric_partials / eval_metrics_state)


def test_incremental_eval_metrics_converges_and_replays(spark):
    """Eval metrics as mergeable partials: per-query contributions
    split across three waves fold to EXACTLY the one-shot evaluate_run
    answer (decimal-stabilized means); a replayed wave rewrites its own
    dir and changes nothing; compaction folds to one |cutoffs|-row base
    with identical finalized metrics."""
    import os
    import shutil
    import tempfile

    from mevi_spark.operators.metrics import (
        eval_metric_partials,
        evaluate_run,
        finalize_eval_metrics,
        per_query_metrics,
    )
    from mevi_spark.streaming.incremental import (
        _rollup_parts,
        compact_eval_metrics,
        eval_metrics_state,
    )

    run = spark.createDataFrame(
        [
            (1, [10, 11, 12]),
            (2, [20, 21]),
            (3, [31, 30]),
            (4, [40]),          # gt absent from preds
            (5, [50, 51, 52]),
        ],
        "query long, preds array<long>",
    )
    gt = spark.createDataFrame(
        [
            (1, [10]),
            (2, [21, 22]),
            (3, [30]),
            (4, [99]),
            (5, [52, 50]),
        ],
        "query long, gt_ids array<long>",
    )
    cutoffs = (1, 3)
    want = {
        (r["k"]): (
            round(r["recall"], 6),
            round(r["mrr"], 6),
            round(r["hitrate"], 6),
            r["n_queries"],
        )
        for r in evaluate_run(run, gt, cutoffs=cutoffs).collect()
    }

    base = tempfile.mkdtemp(prefix="mevi_test_evalm_")
    out = f"{base}/out"
    os.makedirs(out)
    try:

        def wave(i):
            return eval_metric_partials(
                per_query_metrics(
                    run.filter(F.col("query") % 3 == i),
                    gt.filter(F.col("query") % 3 == i),
                    cutoffs=cutoffs,
                )
            )

        for i in range(3):
            wave(i).write.mode("overwrite").parquet(f"{out}/b{i:09d}")

        def state():
            return {
                r["k"]: (r["recall"], r["mrr"], r["hitrate"], r["n_queries"])
                for r in finalize_eval_metrics(
                    eval_metrics_state(spark, out)
                ).collect()
            }

        assert state() == want
        # replay-idempotence: wave 1 rewrites its own dir identically
        wave(1).write.mode("overwrite").parquet(f"{out}/b{1:09d}")
        assert state() == want
        assert compact_eval_metrics(spark, out) == 3
        _, upto, live = _rollup_parts(out)
        assert upto == 2 and live == []
        assert state() == want
    finally:
        shutil.rmtree(base, ignore_errors=True)


# ---------------------------------------------------------------------------
# curriculum maintenance store (r12)


def _curr_scored(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, score double")


def test_curriculum_state_serves_exact_total_order(spark):
    import shutil
    import tempfile

    from mevi_spark.streaming.incremental import (
        _curriculum_bounds,
        curriculum_state,
    )

    base = tempfile.mkdtemp(prefix="curr_test_")
    try:
        rows = [(i, float((i * 37) % 100) / 100.0) for i in range(300)]
        parts = [rows[0::3], rows[1::3], rows[2::3]]
        for i, part in enumerate(parts):
            scored = _curr_scored(spark, part)
            _curriculum_bounds(base, scored, 8)
            scored.write.mode("overwrite").parquet(f"{base}/b{i:09d}")
        got = {
            r["doc_id"]: r["global_rank"]
            for r in curriculum_state(spark, base).collect()
        }
        want = {
            d: i + 1
            for i, (d, _) in enumerate(
                sorted(rows, key=lambda x: (x[1], x[0]))
            )
        }
        assert got == want
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_curriculum_resplit_is_order_invariant_and_rebalances(spark):
    import json
    import shutil
    import tempfile

    from mevi_spark.streaming.incremental import (
        _curriculum_bounds,
        curriculum_state,
        resplit_curriculum,
    )

    base = tempfile.mkdtemp(prefix="curr_test_")
    try:
        # batch 1 pins bounds from LOW scores only; batches 2-3 land a
        # skewed high-score mass, overgrowing the top bucket
        b1 = [(i, i / 1000.0) for i in range(100)]
        b2 = [(1000 + i, 0.9 + (i % 50) / 1000.0) for i in range(200)]
        b3 = [(2000 + i, 0.95 + (i % 50) / 1000.0) for i in range(200)]
        for i, part in enumerate([b1, b2, b3]):
            scored = _curr_scored(spark, part)
            _curriculum_bounds(base, scored, 4)
            scored.write.mode("overwrite").parquet(f"{base}/b{i:09d}")
        before = sorted(
            (r["doc_id"], r["score"], r["global_rank"])
            for r in curriculum_state(spark, base).collect()
        )
        with open(f"{base}/_cbounds.json", encoding="utf-8") as fh:
            n_bounds0 = len(json.load(fh))
        added = resplit_curriculum(spark, base, bucket_cap=120, n_buckets=4)
        assert added > 0
        with open(f"{base}/_cbounds.json", encoding="utf-8") as fh:
            assert len(json.load(fh)) == n_bounds0 + added
        # served order is EXACTLY unchanged by boundary refinement
        after = sorted(
            (r["doc_id"], r["score"], r["global_rank"])
            for r in curriculum_state(spark, base).collect()
        )
        assert after == before
        # a second resplit at the same cap finds nothing new to split
        # beyond ties (idempotent once balanced at this granularity)
        again = resplit_curriculum(spark, base, bucket_cap=120, n_buckets=4)
        assert again <= added
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_curriculum_replay_rewrites_identical_partial(spark):
    import shutil
    import tempfile

    from mevi_spark.streaming.incremental import (
        _curriculum_bounds,
        curriculum_state,
    )

    base = tempfile.mkdtemp(prefix="curr_test_")
    try:
        rows = [(i, float(i % 7) / 7.0) for i in range(120)]
        parts = [rows[0::2], rows[1::2]]
        for i, part in enumerate(parts):
            scored = _curr_scored(spark, part)
            _curriculum_bounds(base, scored, 4)
            scored.write.mode("overwrite").parquet(f"{base}/b{i:09d}")
        before = sorted(
            tuple(r) for r in curriculum_state(spark, base).collect()
        )
        # crash-replay: batch 1 rewrites its own dir (same pure score)
        _curr_scored(spark, parts[1]).write.mode("overwrite").parquet(
            f"{base}/b{1:09d}"
        )
        assert (
            sorted(tuple(r) for r in curriculum_state(spark, base).collect())
            == before
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_compact_curriculum_folds_and_replays(spark):
    import os
    import shutil
    import tempfile

    from mevi_spark.streaming.incremental import (
        _curriculum_bounds,
        _rollup_parts,
        compact_curriculum,
        curriculum_state,
    )

    base = tempfile.mkdtemp(prefix="curr_compact_")
    try:
        rows = [(i, float((i * 37) % 100) / 100.0) for i in range(300)]
        parts = [rows[0::3], rows[1::3], rows[2::3]]
        for i, part in enumerate(parts):
            scored = _curr_scored(spark, part)
            _curriculum_bounds(base, scored, 8)
            scored.write.mode("overwrite").parquet(f"{base}/b{i:09d}")

        def state():
            return sorted(
                tuple(r) for r in curriculum_state(spark, base).collect()
            )

        want = state()
        # replay before the fold: a crashed batch rewrites its own dir
        _curr_scored(spark, parts[1]).write.mode("overwrite").parquet(
            f"{base}/b{1:09d}"
        )
        assert state() == want
        # the fold: served order identical, live dirs absorbed
        assert compact_curriculum(spark, base) == 3
        _, upto, live = _rollup_parts(base)
        assert upto == 2 and live == []
        assert state() == want
        # a late batch after the fold stays live and serves
        late = [(9000 + i, 0.5 + i / 1000.0) for i in range(10)]
        _curr_scored(spark, late).write.mode("overwrite").parquet(
            f"{base}/b{3:09d}"
        )
        all_rows = rows + late
        want_rank = {
            d: i + 1
            for i, (d, _) in enumerate(
                sorted(all_rows, key=lambda x: (x[1], x[0]))
            )
        }
        got = {
            r["doc_id"]: r["global_rank"]
            for r in curriculum_state(spark, base).collect()
        }
        assert got == want_rank
        # a second fold absorbs the late dir too
        assert compact_curriculum(spark, base) == 1
        assert {
            r["doc_id"]: r["global_rank"]
            for r in curriculum_state(spark, base).collect()
        } == want_rank
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_mixture_cells_state_merges_compacts_and_replays(spark):
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from mevi_spark.streaming.incremental import (
        _rollup_parts,
        compact_mixture_cells,
        mixture_cells_state,
    )

    base = tempfile.mkdtemp(prefix="cells_")
    try:
        rows = [
            (i, ["en", "fr", "de"][i % 3], ["web", "books"][i % 2])
            for i in range(120)
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, lang string, source string"
        )
        for i in range(3):
            docs.filter(F.col("doc_id") % 3 == i).groupBy(
                "lang", "source"
            ).agg(F.count("*").cast("long").alias("n")).write.mode(
                "overwrite"
            ).parquet(f"{base}/b{i:09d}")
        want = {
            (r["lang"], r["source"]): r["n"]
            for r in docs.groupBy("lang", "source")
            .agg(F.count("*").cast("long").alias("n"))
            .collect()
        }

        def state():
            return {
                (r["lang"], r["source"]): r["n"]
                for r in mixture_cells_state(spark, base).collect()
            }

        assert state() == want
        # replay-idempotence: re-writing one batch dir changes nothing
        docs.filter(F.col("doc_id") % 3 == 1).groupBy(
            "lang", "source"
        ).agg(F.count("*").cast("long").alias("n")).write.mode(
            "overwrite"
        ).parquet(f"{base}/b{1:09d}")
        assert state() == want
        # the fold: state identical, base bounded at |langs|*|sources|
        assert compact_mixture_cells(spark, base) == 3
        _, upto, live = _rollup_parts(base)
        assert upto == 2 and live == []
        assert state() == want
        assert spark.read.parquet(f"{base}/base").count() == len(want)
    finally:
        shutil.rmtree(base, ignore_errors=True)
