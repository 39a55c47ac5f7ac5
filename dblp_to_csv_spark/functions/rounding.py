"""Tie-down rounding: the convention that retires the display-rounding edge
class (registry.py header; ROADMAP 23; r9 verdict item 8).

The hazard: ``ROUND(x, d)`` can disagree between Spark (BigDecimal HALF_UP
of the double's shortest decimal repr) and DuckDB (scaled-double rounding)
ONLY when ``x`` sits EXACTLY on a half-boundary of the rounding scale — and
a double can sit exactly on a boundary only when x is a dyadic rational.
Aggregates of money (2-dp sums) and transcendental-valued scores (ln/sqrt/
exp) cannot produce such values; RATIOS OF SMALL INTEGERS can: Jaccard
``i/u`` with union 128 and odd intersection is exactly k + 0.5 at 6 dp
(any reduced denominator with 2-adic valuation > 6 or 5-adic valuation > 6
does this). Where the output can be kept integral, convert before rounding
(the ``parts_abc_pareto`` precedent); where the ratio itself is the result,
use THIS helper on BOTH engines:

    round(x - 5e-13, d) + 0.0

Subtracting 5e-13 (IEEE-identical on both engines) moves an exact tie just
below the boundary, so both engines deterministically round DOWN; every
non-tie value is unaffected because the nearest rounding threshold is at
least ~1e-7 away for 6-dp scales while only exact dyadic ties can approach
a threshold closer than the nudge. Values and filters stay engine-portable
with no schema change.

Grep handle: ``round_ties_down`` / ``ROUND_TIES_DOWN_SQL``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TIE_EPS = 5e-13

# SQL twin — format with the expression and scale:
#   ROUND_TIES_DOWN_SQL.format(expr="i * 1.0 / u", scale=6)
ROUND_TIES_DOWN_SQL = "(ROUND(({expr}) - 5e-13, {scale}) + 0.0)"


def round_ties_down(col: Column, scale: int) -> Column:
    """``F.round`` with exact half-boundary ties forced DOWN on both
    engines — use for rounded ratios of small integers (Jaccard,
    containment, clustering coefficients, per-token ratios)."""
    # + 0.0 normalizes the -0.0 a nudged exact zero would produce (IEEE
    # -0.0 + 0.0 = +0.0 on both engines — the repo's existing idiom).
    return F.round(col - F.lit(TIE_EPS), scale) + F.lit(0.0)


# ---------------------------------------------------------------------------
# Measurement-NaN policy (r11 session-2 NaN-landmine sweep): ORDER/RANK
# statistics and variance-based tests treat IEEE NaN in a measurement
# column as MISSING DATA. The engines' NaN semantics are irreconcilable
# there — Spark orders NaN greater than any double and lets it win
# comparisons; DuckDB's var_samp THROWS on NaN input — so the only
# portable contract is the explicit one. Algebraic pass-through/sum paths
# keep faithful NaN propagation (cross-engine-identical, pinned by the
# sweep). Apply BOTH twins in lockstep.
# ---------------------------------------------------------------------------
NAN_AS_NULL_SQL = "(CASE WHEN isnan({col}) THEN NULL ELSE {col} END)"

# Predicate twin for oracles that FILTER missing measurements instead of
# projecting them to NULL (the drift family): isnan(NULL) is NULL, so one
# predicate drops NULL and NaN together on both engines.
NOT_NAN_FILTER_SQL = "NOT isnan({col})"


def nan_as_null(col: Column) -> Column:
    """IEEE NaN → NULL for measurement columns feeding order statistics,
    rank tests, or variance computations (see module note)."""
    return F.when(F.isnan(col), F.lit(None).cast("double")).otherwise(col)


# Variance/correlation-based statistics need the stronger FINITE policy:
# ±Inf is a legitimately ORDERED value (order statistics handle it
# consistently on both engines — the Inf sweep pins that), but DuckDB's
# variance aggregates throw on infinite input and inf−inf/inf·0 inside
# means produces NaN mid-expression, so second-moment statistics are
# defined over finite measurements only.
FINITE_OR_NULL_SQL = "(CASE WHEN isfinite({col}) THEN {col} END)"


def finite_or_null(col: Column) -> Column:
    """Non-finite (NaN, ±Inf) → NULL for measurement columns feeding
    variance/correlation statistics (see note above). Spark has no
    isfinite builtin: NaN and ±Inf are excluded explicitly; NULL input
    stays NULL through the conjunction."""
    return F.when(
        (~F.isnan(col)) & (F.abs(col) != F.lit(float("inf"))), col
    )
