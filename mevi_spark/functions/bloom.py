"""Bloom-filter membership pre-filter (broadcast bitset).

``decontaminate_eval`` broadcasts the RAW eval shingle union — right
while the blocklist fits an executor. When the filter side grows to
billions of n-grams / URLs / content hashes (web-scale blocklists),
broadcast a compact BITSET instead: m bits probed by k salted hashes,
map-side, zero shuffle. Bloom guarantees NO false negatives, so an
exact verify join against the real set over ONLY the bloom-positive
survivors restores exactness — shuffle volume proportional to true
hits + false positives (rate ``(1 − e^{−k·n/m})^k``), never the
corpus. The pre-filter is a pure plan optimization: composed with the
verify join the result is bit-identical to the exact operator, which
is why ``bloom_decontaminate`` shares ``decontaminate_eval``'s oracle
verbatim.

Scale shape of the BUILD: set-bit *positions* are collected distinct —
bounded by m (the sketch size) regardless of key count, because the
map-side partial distinct caps what shuffles; the m/32-word bitset
folds driver-side and inlines into the probe expression via
``sql_json_literal`` (2 analysis-time nodes, ConstantFolding → one
Literal). 32-bit words keep every inlined value and every probe
intermediate inside non-negative BIGINT arithmetic.

Standard construction (Bloom, CACM 1970); no reference counterpart
(the reference has no blocklist analytics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mevi_spark.functions.vector import sql_json_literal

_POW2 = [1 << b for b in range(32)]


def bloom_positions(
    key: Column, m: int, n_hashes: int, salt: str = "bloom"
) -> Column:
    """``array<long>`` of the k bit positions for ``key`` — the SAME
    expression on the build and probe sides (one definition, so the
    no-false-negative guarantee cannot drift).

    Positions derive from TWO ``xxhash64`` hashes via
    Kirsch-Mitzenmacher double hashing, ``pos_i = (h1 + i·h2) mod m``
    (Kirsch & Mitzenmacher, ESA 2006: asymptotically the same FP rate
    as k independent hashes). The hash is Spark's built-in
    ``xxhash64`` — JVM-native long arithmetic inside whole-stage
    codegen, no md5 hex-string round trip: the probe runs per exploded
    corpus n-gram (the hottest map side in the repo), and the bitset
    positions NEVER appear in query output, so the repo's md5
    cross-engine-determinism convention buys nothing here — the shared
    ``decontaminate_eval`` oracle checks only the end result. ``h2``
    is forced odd (an odd value stays odd mod the power-of-two ``m``
    this module requires, so the stride hits distinct residues) and
    both hashes reduce mod m BEFORE the stride multiply, keeping every
    intermediate ≤ k·m — no overflow for any k."""
    h1, h2, mm = _strides(key, m, salt)
    return F.array(
        *[(h1 + F.lit(i) * h2) % mm for i in range(n_hashes)]
    )


def _strides(key: Column, m: int, salt: str):
    """The (h1, h2, m) triple behind ``pos_i = (h1 + i·h2) mod m`` —
    ONE definition shared by :func:`bloom_positions` (build) and
    :func:`bloom_probe`, so the two sides cannot drift apart and
    silently break the no-false-negative guarantee.

    ``m`` must be a power of two: the odd-``h2`` full-period argument
    (odd stays odd, and an odd stride mod 2^b visits distinct
    residues) only holds there — for odd ``m``, ``(2·h+1) mod m`` can
    be 0, collapsing all k probes onto ``h1``. Asserted, not assumed.

    ``xxhash64`` is signed; ``pmod`` (not ``%``) maps it into
    ``[0, m)``. ``h2`` is reduced mod m BEFORE the ·2+1, so the odd
    form never overflows and the final reduce keeps it < m."""
    if m <= 0 or m & (m - 1):
        raise ValueError(f"bloom m must be a power of two, got {m}")
    mm = F.lit(int(m))
    h1 = F.pmod(F.xxhash64(F.lit(f"{salt}a"), key), mm)
    h2 = (F.pmod(F.xxhash64(F.lit(f"{salt}b"), key), mm) * F.lit(2) + F.lit(1)) % mm
    return h1, h2, mm


def bloom_position_frame(
    df: DataFrame, col: str, m: int, n_hashes: int, salt: str = "bloom"
) -> DataFrame:
    """The distinct set-bit positions of a key frame as ``(p long)`` —
    ≤ m rows by construction (map-side partial distinct caps what
    shuffles). Positions are a MERGEABLE SET: the bitset is an OR-fold,
    and OR-folding bitsets ≡ distinct over the position union, which is
    what lets the maintenance store (``streaming/incremental.py::
    incremental_bloom``) equal a from-scratch build exactly —
    position-SET equality, not an approximation."""
    return (
        df.select(
            F.explode(
                bloom_positions(F.col(col), m, n_hashes, salt)
            ).alias("p")
        )
        .distinct()
    )


def words_from_positions(rows, m: int) -> list[int]:
    """Fold collected position rows into the ``ceil(m/32)`` 32-bit
    words the probe expression inlines."""
    words = [0] * ((int(m) + 31) // 32)
    for r in rows:
        p = int(r["p"])
        words[p >> 5] |= 1 << (p & 31)
    return words


def bloom_build(
    df: DataFrame, col: str, m: int, n_hashes: int, salt: str = "bloom"
) -> list[int]:
    """Build the bitset as ``ceil(m/32)`` 32-bit words. One map-only
    pass over the key frame; the distinct-position shuffle is ≤ m rows
    by construction."""
    rows = bloom_position_frame(df, col, m, n_hashes, salt).collect()
    return words_from_positions(rows, m)


def bloom_probe(
    key: Column,
    words: list[int],
    m: int,
    n_hashes: int,
    salt: str = "bloom",
) -> Column:
    """Boolean membership probe against an inlined bitset: for each of
    the k positions, bit b of the word is read as
    ``word % 2^(b+1) >= 2^b`` — pure LONG arithmetic (``/`` would be
    double division; an inexactly-rounded quotient near an integer
    could flip a bit test), whole-stage codegen, no UDF. PySpark's
    ``shiftright`` only takes a literal shift, so the variable bit
    extract goes through a 32-entry power-of-two lookup instead. The
    k position expressions repeat the SAME two xxhash64 subtrees
    (:func:`_strides`), which whole-stage codegen's subexpression
    elimination evaluates once per row — two hashes per probe, not
    k."""
    w = F.expr(sql_json_literal(words, "array<bigint>"))
    pw = F.expr(sql_json_literal(_POW2, "array<bigint>"))
    h1, h2, mm = _strides(key, m, salt)
    out = F.lit(True)
    for i in range(n_hashes):
        p = (h1 + F.lit(i) * h2) % mm
        word = F.element_at(w, (F.shiftright(p, 5) + 1).cast("int"))
        bit = F.element_at(pw, (p % 32 + 1).cast("int"))
        out = out & ((word % (bit * F.lit(2))) >= bit)
    return out
