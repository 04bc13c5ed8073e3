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

Use :func:`sql_pround` to emit the mirroring SQL expression.
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


def sql_davg(expr: str) -> str:
    return f"({sql_dsum(expr)} / count(*))"


def sql_pround(expr: str, n: int) -> str:
    m = float(10 ** n)
    return f"floor(({expr}) * {m!r} + 0.5) / {m!r}"


def py_pround(x: float, n: int) -> float:
    """Driver-side mirror of :func:`pround` (identical IEEE ops)."""
    import math
    m = float(10 ** n)
    return math.floor(x * m + 0.5) / m
