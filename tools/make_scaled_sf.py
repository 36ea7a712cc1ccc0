"""Deterministically scale the driver testdata up for BENCH-ONLY runs.

The driver ships sf ≤ 0.1; the scaling question the bench leaves open
is whether the per-query Spark floor amortizes as data grows (VERDICT
r6 #7). This tool manufactures an sfN directory by unioning N
id-shifted copies of sf0.1 — same schemas, same per-copy distributions,
joins intact — purely to time the same plans at 10× the rows. It is NOT
testdata: the correctness gate stays on the driver's own parquet.

Copy transforms (copy index c ∈ [0, N)):

* fact keys shift by ``c·10⁸`` (divisible by 50, so the ``vec_id % 50``
  query-subset density is preserved); dimension tables (nation, region,
  supplier, part) stay single-copy so dimension joins keep matching;
* ``documents.text`` gets a per-copy suffix token — verbatim copies
  would make every doc a 10-way near-duplicate and blow the MinHash
  pair count by ~100×, timing a different (and unrealistically
  quadratic) workload;
* ``embeddings.embedding[0]`` is nudged by ``c·10⁻³`` so replicated
  vectors don't manufacture corpus-wide score ties.

Usage: python tools/make_scaled_sf.py [out_dir] [copies] [src_dir]
       defaults: /tmp/mevi_sf1 10 /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys

import duckdb

SHIFT = 100_000_000  # divisible by 50: query-subset density preserved


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mevi_sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE copies AS SELECT unnest(range({copies})) AS c")

    def scale(table: str, select: str) -> None:
        con.execute(
            f"COPY (SELECT {select} FROM '{src}/{table}.parquet', copies"
            f" ORDER BY c) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )

    def copy1(table: str) -> None:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{table}.parquet')"
            f" TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )

    scale(
        "lineitem",
        f"l_orderkey + c*{SHIFT} AS l_orderkey, l_partkey, l_suppkey,"
        " l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
        " l_returnflag, l_linestatus, l_shipdate",
    )
    scale(
        "orders",
        f"o_orderkey + c*{SHIFT} AS o_orderkey,"
        f" o_custkey + c*{SHIFT} AS o_custkey,"
        " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority",
    )
    scale(
        "customer",
        f"c_custkey + c*{SHIFT} AS c_custkey, c_name, c_nationkey,"
        " c_acctbal, c_mktsegment",
    )
    scale(
        "events",
        f"event_id + c*{SHIFT} AS event_id, ts,"
        f" user_id + c*{SHIFT} AS user_id, event_type, value, props",
    )
    # per-copy tokens are INTERLEAVED every 4 words, not appended: a
    # single appended suffix leaves copy pairs at Jaccard ≈ S/(S+1) —
    # still near-duplicates, so the scaled corpus would time an
    # unrealistically quadratic near-dup workload. Interleaving breaks
    # every shingle window that crosses an insertion (~3 of every 5),
    # dropping cross-copy Jaccard to ~0.25, below the 0.5 threshold.
    scale(
        "documents",
        f"doc_id + c*{SHIFT} AS doc_id,"
        " array_to_string(flatten(list_transform("
        "   range(0, CAST(ceil(len(string_split(text, ' ')) / 4.0) AS INT)),"
        "   i -> list_append("
        "          list_slice(string_split(text, ' '), i*4 + 1, i*4 + 4),"
        "          'ct' || CAST(c AS VARCHAR) || 'x' || CAST(i AS VARCHAR))"
        " )), ' ') AS text,"
        " lang, source, n_chars",
    )
    scale(
        "embeddings",
        f"vec_id + c*{SHIFT} AS vec_id,"
        " list_prepend(embedding[1] + c*0.001,"
        " embedding[2:]) AS embedding, label",
    )
    for t in ("supplier", "part", "nation", "region"):
        copy1(t)
    print(f"wrote {copies}x {src} -> {out}")


if __name__ == "__main__":
    main()
