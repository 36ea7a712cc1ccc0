"""IPF raking kernel: marginal convergence, determinism, and the
degenerate shapes the fixed-sweep recursion must survive."""

from __future__ import annotations

from mevi_spark.operators.raking import ipf_weights6


def _masses(cells, w6):
    row, col = {}, {}
    for r, c, n in cells:
        m = n * w6[(r, c)]
        row[r] = row.get(r, 0) + m
        col[c] = col.get(c, 0) + m
    return row, col


def test_ipf_hits_both_marginals():
    cells = [
        ("en", "web", 60), ("en", "books", 20),
        ("fr", "web", 10), ("fr", "books", 10),
    ]
    n = 100
    row_t6 = {"en": int(0.5 * n * 1e6), "fr": int(0.5 * n * 1e6)}
    col_t6 = {"web": 70 * 1_000_000, "books": 30 * 1_000_000}
    w6 = ipf_weights6(cells, row_t6, col_t6, sweeps=12)
    row, col = _masses(cells, w6)
    for k, t in row_t6.items():
        assert abs(row[k] - t) / t < 0.01, (k, row[k], t)
    for k, t in col_t6.items():
        assert abs(col[k] - t) / t < 0.01, (k, col[k], t)


def test_ipf_is_deterministic_and_order_independent():
    cells = [("a", "x", 3), ("a", "y", 7), ("b", "x", 5), ("b", "y", 1)]
    rt = {"a": 4_000_000, "b": 12_000_000}
    ct = {"x": 8_000_000, "y": 8_000_000}
    w1 = ipf_weights6(cells, rt, ct)
    w2 = ipf_weights6(list(reversed(cells)), rt, ct)
    assert w1 == w2


def test_ipf_single_cell_and_missing_combo():
    # a sparse table (no ('b','x') cell) must fit the cells it has
    cells = [("a", "x", 10), ("b", "y", 5)]
    rt = {"a": 20_000_000, "b": 5_000_000}
    ct = {"x": 20_000_000, "y": 5_000_000}
    w6 = ipf_weights6(cells, rt, ct, sweeps=4)
    assert w6[("a", "x")] == 2_000_000   # 10 docs * w2.0 = mass 20
    assert w6[("b", "y")] == 1_000_000


def test_ipf_skips_keys_without_targets():
    # a row/col key absent from the target dicts keeps its cells'
    # current weights (the no-mass-to-move convention, like marg == 0)
    # instead of raising KeyError mid-sweep
    cells = [("a", "x", 10), ("zz", "x", 5), ("a", "qq", 2)]
    rt = {"a": 12_000_000}
    ct = {"x": 15_000_000}
    w6 = ipf_weights6(cells, rt, ct, sweeps=4)
    assert set(w6) == {("a", "x"), ("zz", "x"), ("a", "qq")}
    # the targeted sub-table still fits: row 'a' mass ~ 12, col 'x' ~ 15
    row, col = {}, {}
    for r, c, n in cells:
        row[r] = row.get(r, 0) + n * w6[(r, c)]
        col[c] = col.get(c, 0) + n * w6[(r, c)]
    assert abs(col["x"] - 15_000_000) / 15_000_000 < 0.05
