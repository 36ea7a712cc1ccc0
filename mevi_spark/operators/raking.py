"""Iterative proportional fitting (raking) of mixture weights.

The curation question: "reweight the corpus so the LANGUAGE mix hits
the training target while each SOURCE keeps its observed mass share"
— the classic survey-raking / biproportional-fitting construction
(Deming & Stephan, Ann. Math. Stat. 1940), the same fixed-marginal
reweighting a domain-mixture pass (DoReMi-style targets) applies
before sampling. Given the (lang × source) cell-count table and the
two target marginals, IPF alternately scales rows then columns until
the weighted marginals match.

Determinism discipline (what makes the result oracle-checkable
bit-for-bit): weights live as INTEGER micro-units (w6 = weight·10⁶,
start 10⁶). Each half-sweep computes the weighted marginal EXACTLY as
the integer sum Σ n·w6 (order-independent — no float accumulation),
takes ONE double division scale = target6 / marginal6, and re-rounds
w6' = floor(w6 · scale + 0.5) back to integer — floor(x+0.5), not
round(), because Python round() is banker's while SQL ROUND is
half-away; floor is the same function everywhere, so the Spark-side
kernel and the DuckDB oracle evaluate literally the same formula on
bit-identical doubles. Targets are truncated to micro-units
(int(frac·N·10⁶)) — truncation, not rounding, so both engines agree
without half-way ties. A fixed sweep count (no convergence test)
keeps the computation identical everywhere.

Scale shape: the CORPUS appears only in the one groupBy that builds
the cell table; the iterations run on the k-bounded cell list
(|langs|·|sources| rows — the artifact-vs-corpus split of the
codebook machinery), so this kernel is shared verbatim by the Spark
query (driver-side over the collected cells) and any maintenance
caller. No reference counterpart; public construction only.
"""

from __future__ import annotations

import math


def _half_up(x: float) -> int:
    """floor(x + 0.5) — the rounding both the Python kernel and the
    SQL oracle use verbatim (see module docstring)."""
    return int(math.floor(x + 0.5))


def ipf_weights6(
    cells: list[tuple[str, str, int]],
    row_targets6: dict[str, int],
    col_targets6: dict[str, int],
    sweeps: int = 6,
) -> dict[tuple[str, str], int]:
    """Run ``sweeps`` IPF sweeps (row-scale then col-scale) over
    ``(row_key, col_key, n)`` cells; returns w6 integer micro-weights
    per cell. Cells with n = 0 keep w6 = 10⁶ untouched (no mass to
    move; excluded from marginals by n·w6 = 0 anyway). A row key
    absent from ``row_targets6`` (and likewise a column key absent
    from ``col_targets6``) is SKIPPED — its cells keep their current
    w6, the same no-mass-to-move convention as marg == 0 — rather
    than raising KeyError mid-sweep."""
    w6 = {(r, c): 1_000_000 for r, c, _ in cells}
    n_of = {(r, c): int(n) for r, c, n in cells}
    rows = sorted({r for r, _, _ in cells})
    cols = sorted({c for _, c, _ in cells})
    for _ in range(int(sweeps)):
        for r in rows:
            if r not in row_targets6:
                continue
            marg = sum(
                n_of[(r, c)] * w6[(r, c)] for c in cols if (r, c) in w6
            )
            if marg == 0:
                continue
            scale = row_targets6[r] / marg
            for c in cols:
                if (r, c) in w6:
                    w6[(r, c)] = _half_up(w6[(r, c)] * scale)
        for c in cols:
            if c not in col_targets6:
                continue
            marg = sum(
                n_of[(r, c)] * w6[(r, c)] for r in rows if (r, c) in w6
            )
            if marg == 0:
                continue
            scale = col_targets6[c] / marg
            for r in rows:
                if (r, c) in w6:
                    w6[(r, c)] = _half_up(w6[(r, c)] * scale)
    return w6
