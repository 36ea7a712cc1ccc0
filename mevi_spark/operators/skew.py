"""Hot-key skew mitigation: salted equi-join and two-phase salted
aggregation.

AQE's skew-join splitting handles most runtime skew (enabled in
``session.get_spark``), but two situations still want PLANNED salting:
a key so hot one reducer would spill regardless of splitting (the
Zipf-head join), and aggregations whose per-key state is itself large
(collect_list-style) where partial aggregation alone doesn't bound the
final reducer. Both tools here preserve EXACT results — the salt is an
internal key extension, never visible in the output.

The dedup tier already applies the same idea structurally (band keys,
df-cut, chunk-frequency guards cut hot keys before any self-join);
these are the general-purpose forms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SALT = "_mevi_salt"


def _salt_expr(keys: list[str], salts: int):
    """Retry-stable salt that still spreads duplicate rows.

    Two constraints pull against each other:

    * a CONTENT hash is stable under task re-execution but sends every
      copy of a duplicated sentinel row (the canonical hot key) to ONE
      salt — the reducer hotspot survives;
    * a POSITION source (``monotonically_increasing_id``) spreads
      duplicates but changes across task retries when the input is
      itself shuffle output (fetch order is not stable), so recomputed
      rows could land in a different (key, salt) group than copies
      already fetched — silent dup/loss under fault recovery.

    ``hash(spark_partition_id(), join/group keys)`` satisfies both:
    partition MEMBERSHIP (unlike intra-partition order) is
    deterministic for a deterministic input, so the salt is
    retry-stable, and a hot key's rows living in different input
    partitions — the only way a key is big at scale — get different
    salts. A key's rows inside one input partition share a salt,
    bounding per-salt clumps at one input partition's rows (~128 MB).
    Hashing only the KEYS (not every payload column — ADVICE r6) keeps
    the expression valid on frames carrying unhashable payload types
    (MapType raises in ``hash``) and avoids recomputing wide rows
    per-row; membership determinism is all the retry argument needs.
    """
    return F.pmod(
        F.abs(F.hash(F.spark_partition_id(), *[F.col(c) for c in keys])),
        F.lit(salts),
    ).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread across ``salts``
    reducers: the big side gets a retry-stable per-row salt, the small
    side is replicated once per salt value, and the join key becomes
    ``on + [salt]``. Result rows are EXACTLY ``big.join(small, on,
    how)`` — the salt never changes matching, only placement. Costs a
    ``salts×`` blow-up of the SMALL side (keep it the dimension side);
    at 100 TB the win is that no single reducer owns a whole hot key.

    ``how`` ∈ {'inner', 'left'} — flavors where salting the big side
    preserves semantics row-for-row.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if _SALT in big.columns or _SALT in small.columns:
        raise ValueError(f"{_SALT} column already present")
    big_salted = big.withColumn(_SALT, _salt_expr(on, salts))
    small_rep = small.withColumn(
        _SALT,
        F.explode(F.sequence(F.lit(0), F.lit(salts - 1)).cast("array<int>")),
    )
    return big_salted.join(small_rep, [*on, _SALT], how).drop(_SALT)


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for decomposable measures over hot keys:
    phase 1 groups by ``keys + [salt]`` (a hot key's rows split across
    ``salts`` reducers), phase 2 merges the per-salt partials by
    ``keys``. ``aggs`` maps output name → ``(partial_expr,
    merge_expr)`` where the partial runs over input rows and the merge
    runs over the partial column of the same name (e.g. ``{"n":
    (F.count("*"), F.sum("n"))}``). Exact for any commutative-
    associative measure; Spark's map-side partial aggregation does this
    within a task already — the salt extends it across reducers.
    """
    if _SALT in df.columns:
        raise ValueError(f"{_SALT} column already present")
    salted = df.withColumn(_SALT, _salt_expr(keys, salts))
    partial = salted.groupBy(*keys, _SALT).agg(
        *[p.alias(name) for name, (p, _m) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[m.alias(name) for name, (_p, m) in aggs.items()]
    )
