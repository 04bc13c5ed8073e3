"""Portable deterministic hashing for dedup / fingerprint operators.

The design constraint: every hash must be computable bit-identically by
BOTH Spark SQL and the DuckDB oracle so near-dup operators stay
hash-checkable (driver correctness gate). Neither engine's native
``hash()`` matches the other, so we derive a 60-bit integer from the
first 15 hex chars of ``md5``:

  Spark :  conv(substring(md5(s), 1, 15), 16, 10)  -> bigint
  DuckDB:  cast(('0x' || substr(md5(s), 1, 15)) as bigint)

Both verified to produce identical values. MinHash permutations are then
affine maps ``(a*h + b) % p`` over that base hash — pure int64 arithmetic,
identical on both sides (all intermediates < 2^63: p < 2^31, a,b < p,
h % p < 2^31 so a*(h%p)+b < 2^62).

At 100 TB scale these are single-pass, shuffle-free column expressions;
md5 is whole-stage-codegen'd JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31 - 1: keeps affine-map arithmetic inside int64.
MINHASH_PRIME = 2_147_483_647

# Deterministic coefficient schedule (documented, reproducible in SQL).
def _coeffs(i: int) -> tuple[int, int]:
    a = (1_103_515_245 * (i + 1) + 12_345) % MINHASH_PRIME
    b = (69_069 * (i + 1) + 362_437) % MINHASH_PRIME
    return (a or 1, b)


def portable_hash64(col: Column) -> Column:
    """60-bit integer hash of a string, identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def shingles_expr(text: Column, k: int = 3) -> Column:
    """Word k-shingles of a (cleaned, single-spaced) text as array<string>.

    transform over a sequence of start offsets: zero-UDF, codegen-able.
    Returns an empty array when the text has fewer than ``k`` tokens.

    The token array is BOUND as an outer lambda variable (the
    ``transform(array(split(..)), toks -> ...)`` trick): expressions
    referenced inside HOF lambdas are inlined with no CSE, so a naive
    closure over ``split(text)`` would re-split the text once per
    shingle — O(tokens²) char work per document. Binding evaluates the
    split once and the inner lambdas see an attribute-like variable.
    """
    def _shingles(toks: Column) -> Column:
        n = F.size(toks)
        return F.when(
            n >= k,
            F.transform(F.sequence(F.lit(1), n - (k - 1)),
                        lambda i: F.array_join(F.slice(toks, i, k), " "))
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(
        F.transform(F.array(F.split(text, " ")), _shingles), 1)


def minhash_expr(shingle_hashes: Column, num_perm: int = 16) -> Column:
    """MinHash signature (array<bigint> of length ``num_perm``) from an
    array of base hashes. ``min((a_i * (h % p) + b_i) % p)`` per perm.

    Empty shingle set -> signature of all ``p`` (matches the SQL oracle's
    ``coalesce(min(...), p)``).
    """
    sig = []
    for i in range(num_perm):
        a, b = _coeffs(i)
        # closure factory, not default-arg lambda: PySpark derives the
        # SQL lambda's arity from the Python signature, so default args
        # would be misread as extra lambda variables.
        mapped = F.transform(shingle_hashes, _affine_map(a, b))
        sig.append(F.coalesce(F.array_min(mapped), F.lit(MINHASH_PRIME)))
    return F.array(*sig)


def _affine_map(a: int, b: int):
    def apply(h: Column) -> Column:
        return (F.lit(a) * (h % MINHASH_PRIME) + F.lit(b)) % MINHASH_PRIME
    return apply


# (A per-row fold-based ``simhash_expr`` used to live here; the
# registry path is the aggregation form ``dedup.simhash_fingerprints``
# — one hash per token, map-side partial agg — which dominates it at
# every scale, so the per-row variant was deleted as dead code when the
# registry-audit AST rule surfaced it as consumer-less.)
