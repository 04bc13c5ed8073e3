"""Portable cross-engine rounding.

``ROUND(x, n)`` is NOT portable across engines for half-way inputs:
Spark rounds the shortest decimal repr (``BigDecimal.valueOf``,
HALF_UP), DuckDB rounds the exact binary value — e.g. the double
nearest 19570.815 rounds to 19570.82 in Spark but 19570.81 in DuckDB.

``pround`` instead computes ``floor(x * 10^n + 0.5) / 10^n`` — plain
double arithmetic that is bit-identical in every engine, so oracle
value-hashes match. Only fp-order-dependent aggregates need it at all;
per-row arithmetic on identical inputs is already bit-identical and
should NOT be rounded.

The SQL-text twins (:func:`sql_pround_avg2`, :func:`sql_pround_iratio`,
:func:`sql_ir38`, :func:`sql_dsum`) emit the mirroring shared-dialect
expressions both engines consume.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(col: Column, n: int) -> Column:
    m = F.lit(float(10 ** n))
    return F.floor(col * m + F.lit(0.5)) / m


# -- exact money aggregation -------------------------------------------------
#
# ``pround(F.sum(double), 2)`` is deterministic per-plan but NOT per-run:
# partial-aggregation order changes the unrounded double sum by an ulp,
# which flips the output when the sum straddles a .xx5 boundary (the
# round-1 ``sql_pricing_summary`` driver flake). Money columns in the
# testdata are exact 2-dp values, so the cure is exact arithmetic:
# cast each term to DECIMAL(18,2) (exact — the double IS a 2-dp value),
# sum in decimal (associative ⇒ order-independent; Spark widens the
# accumulator to DECIMAL(28,2), DuckDB to DECIMAL(38,2) — no overflow
# even at 100 TB row counts), and cast the exact total back to double
# at the output edge (identical nearest-double on both engines).
#
# NOTE: only cast *2-dp-valued* doubles (or exact decimal products of
# them) — casting an arbitrary double to decimal is itself non-portable
# (Spark rounds the shortest repr, DuckDB the binary value).

def dec2(col: Column) -> Column:
    """Exact DECIMAL(18,2) image of a 2-dp-valued double column."""
    return col.cast("decimal(18,2)")


def dsum(col: Column) -> Column:
    """Order-independent sum of a 2-dp money column, as double."""
    return F.sum(dec2(col)).cast("double")


def sql_dsum(expr: str) -> str:
    """DuckDB mirror of :func:`dsum`."""
    return f"CAST(sum(CAST(({expr}) AS DECIMAL(18,2))) AS DOUBLE)"


def davg(col: Column) -> Column:
    """Order-independent mean of a 2-dp money column: exact decimal sum
    cast to double, then one double division — both engines bit-equal."""
    return dsum(col) / F.count(F.lit(1))


def pround_avg2(col: Column, n: int = 6) -> Column:
    """Half-up-rounded (``n`` digits) mean of an exact-2-dp-valued
    column, computed so the output double is uniquely IEEE-determined.

    ``pround(avg(x), n)`` is deterministic only up to the engine's code
    generation: ``x*1e6 + 0.5`` may be contracted to a fused
    multiply-add (one rounding instead of two) by one engine and not the
    other, flipping ``floor`` when the product sits a half-ulp from an
    integer — the ``sql_pricing_summary`` red row in rounds 1/3.

    Cure: exact arithmetic until the quotient is pinned. With S = sum
    (exact decimal) and c = count, ``round_half_up(S/c, n)`` is the
    integer ``M = (A − A % B) / B`` for ``A = 2·S·10^n + c``,
    ``B = 2c`` — all of A, B, A % B and the subtraction are EXACT
    decimal/integer ops in both engines at any magnitude (no double
    image of A is ever taken on the Spark side, so there is no 2^53
    operand cliff; the pre-round-5 form cast A to double, whose own
    rounding reopened the nondeterminism window past ~9e15 — e.g.
    quantity sums around TPC-H sf30+). The division of the exact
    multiple is exact decimal division on Spark; DuckDB lowers decimal
    division to double, so the mirror recovers M with
    ``floor(q + 0.5)``: q carries ≤ ~1.2e-16 relative error, and for
    |mean| < 10^9 (i.e. M < 10^{9+n}) that is < 0.4 absolute — floor
    lands on M in every IEEE engine, fused or not. Explicit bounds
    (not an implicit cliff): S beyond DECIMAL(30,2) (≈ 10^28) fails
    LOUDLY — decimal overflow is an error under Spark ANSI mode and in
    DuckDB, never a silent rounding; |mean| < 10^9 is the documented
    envelope of the DuckDB-side quotient recovery (row averages of
    2-dp measures sit orders of magnitude below it at any corpus
    size — means don't grow with row count).
    """
    s = F.sum(dec2(col)).cast("decimal(30,2)")
    c = F.count(F.lit(1))
    a = s * F.lit(2 * 10 ** n) + c
    b = c * F.lit(2)
    q = (a - a % b) / b
    return F.floor(q + F.lit(0.5)) / F.lit(float(10 ** n))


def sql_pround_avg2(expr: str, n: int = 6) -> str:
    """Shared-dialect mirror of :func:`pround_avg2` — runs unchanged on
    Spark SQL and DuckDB (``sql_pricing_summary`` executes this very
    text on Spark), and lands on the identical integer quotient in
    both: exact-decimal A/B/remainder, then ``floor(q + 0.5)`` absorbs
    DuckDB's double-lowered division error (see :func:`pround_avg2`).
    ``1e6``-style literals keep the result DOUBLE in both dialects."""
    m = 10 ** n
    s = f"CAST(sum(CAST(({expr}) AS DECIMAL(18,2))) AS DECIMAL(30,2))"
    a = f"({s} * {2 * m} + count(*))"
    b = "(2 * count(*))"
    return f"(floor(({a} - {a} % {b}) / {b} + 0.5) / 1e{n})"


def pround_iratio(num: Column, den: Column, n: int = 6) -> Column:
    """Half-up-rounded (``n`` digits) ratio of two exact INTEGER
    columns (e.g. a token sum over a doc count), computed by the same
    remainder-exact protocol as :func:`pround_avg2`: with integer
    N, D, ``round_half_up(N/D, n)`` is ``M = (A − A % B) / B`` for
    ``A = 2·N·10^n + D``, ``B = 2·D`` — A, B, A % B and the
    subtraction are exact decimal ops (no double image of A is taken,
    so no 2^53 operand cliff and no FMA sensitivity; cf. the
    cast-numerator-to-double form this replaces, nondeterministic past
    N ≈ 4.5e9 and silently overflowing long past N ≈ 4.6e12). The
    final exact-multiple division is exact decimal on Spark; the
    DuckDB mirror recovers M with ``floor(q + 0.5)`` (see
    :func:`pround_avg2` for the |ratio| < 10^9 envelope)."""
    a = num.cast("decimal(30,0)") * F.lit(2 * 10 ** n) + den
    b = den.cast("decimal(30,0)") * F.lit(2)
    q = (a - a % b) / b
    return F.floor(q + F.lit(0.5)) / F.lit(float(10 ** n))


def sql_pround_iratio(num: str, den: str, n: int = 6) -> str:
    """Shared-dialect mirror of :func:`pround_iratio`."""
    m = 10 ** n
    a = f"(CAST(({num}) AS DECIMAL(30,0)) * {2 * m} + ({den}))"
    b = f"(CAST(({den}) AS DECIMAL(30,0)) * 2)"
    return f"(floor(({a} - {a} % {b}) / {b} + 0.5) / 1e{n})"


def sql_ir38(num: str, den: str, n: int = 6) -> str:
    """Shared-dialect remainder-exact half-away-from-zero quotient of
    two exact DECIMAL(38,0)-valued SQL expressions — the wide-precision,
    SIGN-SAFE sibling of :func:`sql_pround_iratio` (den > 0 required).

    Every operand stays DECIMAL(38,0): both engines compute width-38
    decimals in int128 exactly (DuckDB widens only on actual 38-digit
    overflow; Spark's capped p=38/s=0 products are exact while values
    fit), and both truncate decimal ``%`` toward zero, so A, B, A % B
    and the exact-multiple quotient match bit-for-bit. The half-step
    offset carries the NUMERATOR's sign (a flat ``+D`` with truncated
    division would bias negative quotients one 1e-n step toward zero),
    giving round-half-AWAY-FROM-ZERO — |result − true ratio| ≤ 0.5 ulp
    either sign, pinned cross-engine by
    ``test_ir38_negative_ratio_cross_engine``. The closing
    ``floor(q + 0.5)`` absorbs DuckDB's double-lowered division (exact
    for |ratio| < 1e9)."""
    m = 10 ** n
    sd = f"(CASE WHEN ({num}) < 0 THEN -({den}) ELSE ({den}) END)"
    a = f"(CAST(({num}) AS DECIMAL(38,0)) * {2 * m} + {sd})"
    b = f"(CAST(({den}) AS DECIMAL(38,0)) * 2)"
    return f"(floor(({a} - {a} % {b}) / {b} + 0.5) / 1e{n})"


def py_pround(x: float, n: int) -> float:
    """Driver-side mirror of :func:`pround` (identical IEEE ops)."""
    import math
    m = float(10 ** n)
    return math.floor(x * m + 0.5) / m
