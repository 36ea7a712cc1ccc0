"""Z-order layout: the data-skipping property, proved from parquet
footers — every z-clustered file carries a bounded range in EACH
dimension, so a 2-D box intersects far fewer files than under a
time-sorted layout (where every file spans the full user range)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from mevi_spark.functions.time import epoch_us
from mevi_spark.sources.io import load_table
from mevi_spark.sources.zorder import write_zordered

SF = "/root/testdata/sf0.01"  # 10k events → meaningful per-file stats
N_FILES = 24


def _file_ranges(path: str, cols: list[str]) -> list[dict]:
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        rng = {}
        for c in cols:
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            rng[c] = (lo, hi)
        if md.num_rows:
            out.append(rng)
    return out


def _overlap(ranges, col, lo, hi):
    return sum(1 for r in ranges if r[col][0] <= hi and r[col][1] >= lo)


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("zorder"))
    ev = load_table(spark, SF, "events").withColumn(
        "ts_us", epoch_us(load_table(spark, SF, "events"), "ts")
    )
    zpath, tpath = f"{base}/z", f"{base}/t"
    write_zordered(ev, zpath, F.col("user_id"), F.col("ts_us"), N_FILES)
    # the linear comparison layout: range-sorted by time only
    (
        ev.repartitionByRange(N_FILES, "ts_us")
        .sortWithinPartitions("ts_us")
        .write.mode("overwrite")
        .parquet(tpath)
    )
    return spark, ev, zpath, tpath


def test_zorder_bounds_both_dimensions(layouts):
    spark, ev, zpath, tpath = layouts
    zr = _file_ranges(zpath, ["user_id", "ts_us"])
    tr = _file_ranges(tpath, ["user_id", "ts_us"])
    assert len(zr) >= N_FILES // 2 and len(tr) >= N_FILES // 2

    u_lo, u_hi = 40, 70  # ~20% of the user range
    # time layout: every file spans ~the full user range → no skipping
    assert _overlap(tr, "user_id", u_lo, u_hi) == len(tr)
    # z-order: a user-range slice must skip a real fraction of files
    z_hit = _overlap(zr, "user_id", u_lo, u_hi)
    assert z_hit <= 0.7 * len(zr), (z_hit, len(zr))

    # and the time dimension still prunes under z-order (bounded too):
    t_min = min(r["ts_us"][0] for r in zr)
    t_max = max(r["ts_us"][1] for r in zr)
    span = t_max - t_min
    slice_hit = _overlap(zr, "ts_us", t_min, t_min + span // 5)
    assert slice_hit <= 0.7 * len(zr), (slice_hit, len(zr))


def test_zorder_layout_loses_no_rows(layouts):
    spark, ev, zpath, tpath = layouts
    z = spark.read.parquet(zpath)
    assert z.count() == ev.count()
    box = (
        (F.col("user_id").between(40, 70))
        & (F.col("ts_us") >= 1704844800_000000)
        & (F.col("ts_us") < 1705276800_000000)
    )
    assert (
        z.filter(box).count() == ev.filter(box).count()
    )


def test_zorder_scan_pushes_filters(layouts):
    """The read side needs no code: the box predicate must reach the
    parquet scan as PushedFilters (stats consumption is then the
    reader's row-group pruning)."""
    spark, ev, zpath, tpath = layouts
    z = spark.read.parquet(zpath)
    plan = (
        z.filter(F.col("user_id").between(40, 70))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(user_id,40)" in plan


def test_incremental_zorder_deltas_prune_replay_and_compact(
    spark, tmp_path_factory
):
    """Maintenance twin invariants: (a) each delta dir's files carry
    bounded per-dimension ranges (prune-able before any compaction),
    (b) a replayed batch rewrites the same row set (no duplicates),
    (c) compaction preserves the table exactly and absorbs the dirs,
    (d) bounds pinned by batch 0 CLAMP batch 1's out-of-range rows
    into edge buckets without losing them."""
    from mevi_spark.sources.zorder import write_zordered_bounded
    from mevi_spark.streaming.incremental import (
        _zorder_bounds,
        compact_zorder,
        zorder_state,
    )

    base = str(tmp_path_factory.mktemp("inc_zorder"))
    ev = load_table(spark, SF, "events").withColumn(
        "ts_us", epoch_us(load_table(spark, SF, "events"), "ts")
    )

    def x_of(df):
        return F.col("user_id")

    def y_of(df):
        return F.col("ts_us")

    # batch 0 pins bounds over HALF the user range; batch 1 exceeds it
    b0 = ev.filter(F.col("user_id") < 75)
    b1 = ev.filter(F.col("user_id") >= 75)
    bounds = _zorder_bounds(base, b0, x_of, y_of)
    assert bounds["xmx"] < 75
    for i, b in enumerate((b0, b1)):
        got = _zorder_bounds(base, b, x_of, y_of)
        assert got == bounds  # pinned: batch 1 does NOT re-derive
        write_zordered_bounded(
            b, f"{base}/b{i:09d}", x_of(b), y_of(b), 12, bounds
        )

    # (a) delta files bound BOTH dimensions: a ~40%-of-range user
    # slice must skip files in the un-compacted delta itself
    zr = _file_ranges(f"{base}/b{0:09d}", ["user_id", "ts_us"])
    assert _overlap(zr, "user_id", 40, 70) <= 0.8 * len(zr)

    want = sorted(map(tuple, ev.collect()))

    def state_rows():
        return sorted(map(tuple, zorder_state(spark, base).collect()))

    assert state_rows() == want
    # (b) replay batch 1: same rows, no duplicates
    write_zordered_bounded(
        b1, f"{base}/b{1:09d}", x_of(b1), y_of(b1), 6, bounds
    )
    assert state_rows() == want
    # (c)+(d) compaction folds both dirs, table unchanged (out-of-range
    # rows clamped into edge buckets, never dropped)
    assert compact_zorder(spark, base, x_of, y_of, n_files=12) == 2
    assert state_rows() == want
