"""Cross-engine deterministic hashing: Spark Column expressions that equal
DuckDB's ``md5_number_lower`` derivations bit-for-bit, so hash-based
operators (MinHash, SimHash, fingerprints) get REAL value-level SQL
oracles instead of rows-only checks.

DuckDB's ``md5_number_lower(s)`` is the little-endian reading of the LAST
8 bytes of the md5 digest (verified: md5('abc') = ...d6963f7d28e17f72 ->
0x727fe1287d3f96d6). Spark reproduces it from the hex string: take hex
chars 17..32, reverse byte pairs, split into two 32-bit halves (a full
64-bit conv would overflow signed long).

All arithmetic stays below 2^63 so both engines compute in exact integer
ranges: token hashes live in [0, 2^31-1) (Mersenne prime modulus), affine
MinHash permutations multiply two <2^31 values (<2^62), and per-bit
extraction uses exact floor(v / 2^b) % 2 (v < 2^32, powers of two are
exact in doubles).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

MERSENNE31 = 2147483647  # 2^31 - 1


def md5_lower_halves(col: Column) -> tuple[Column, Column]:
    """(hi, lo) 32-bit halves of DuckDB's md5_number_lower(col), as longs:
    md5_number_lower = hi * 2^32 + lo."""
    hx = F.md5(col)
    pairs = [F.substring(hx, 17 + 2 * i, 2) for i in range(8)]
    rev = F.concat(*reversed(pairs))
    hi = F.conv(F.substring(rev, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(rev, 9, 8), 16, 10).cast("long")
    return hi, lo


def hash31(col: Column) -> Column:
    """== DuckDB ``CAST(md5_number_lower(col) % 2147483647 AS BIGINT)``.

    v mod (2^31-1) from halves: 2^32 ≡ 2 (mod 2^31-1), so
    v ≡ 2*hi + lo — both terms < 2^33, no overflow."""
    hi, lo = md5_lower_halves(col)
    return (hi * 2 + lo) % F.lit(MERSENNE31)


def bit_of_half(half: Column, b: Column) -> Column:
    """Bit ``b`` (0-based, Column) of a 32-bit non-negative long — exact
    floor-division form because F.shiftright needs a literal shift."""
    return (F.floor(half / F.pow(F.lit(2.0), b.cast("double"))).cast("long")) % 2


def md5_bits64(col: Column) -> Column:
    """array<long> of the 64 bits of md5_number_lower(col), LSB first —
    equals DuckDB ``list_transform(range(0,64), b -> CAST((md5_number_lower(s)
    >> b) & 1 AS BIGINT))``."""
    hi, lo = md5_lower_halves(col)
    return F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda b: F.when(b < 32, bit_of_half(lo, b)).otherwise(
            bit_of_half(hi, b - 32)
        ),
    )
