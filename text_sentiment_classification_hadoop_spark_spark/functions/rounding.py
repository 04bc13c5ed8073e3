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


def sql_pround(expr: str, n: int) -> str:
    m = float(10 ** n)
    return f"floor(({expr}) * {m!r} + 0.5) / {m!r}"


def py_pround(x: float, n: int) -> float:
    """Driver-side mirror of :func:`pround` (identical IEEE ops)."""
    import math
    m = float(10 ** n)
    return math.floor(x * m + 0.5) / m
