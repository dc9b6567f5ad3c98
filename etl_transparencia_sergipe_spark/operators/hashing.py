"""Cross-engine deterministic hashing.

MinHash/SimHash need integer hashes that the DuckDB oracle can reproduce
exactly. ``xxhash64``/``hash`` differ between engines, so we derive a 60-bit
integer from an md5 prefix (md5 is identical everywhere):

    Spark :  CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)
    DuckDB:  ('0x' || substring(md5(x), 1, 15))::BIGINT

Universal-hash family over a Mersenne-ish prime P = 2^31 - 1:
``h_i(x) = (a_i * (H(x) % P) + b_i) % P`` — products stay < 2^62, so no
bigint overflow under ANSI mode. Coefficients are fixed (seeded) constants
embedded as literals on both sides.

At 100 TB this is all codegen'd JVM expression work per row — no shuffle,
no Python.
"""

from __future__ import annotations

MERSENNE = 2_147_483_647  # 2^31 - 1

# Deterministic Knuth-style coefficient schedule (seed-free, reproducible).
_K_MAX = 64
HASH_A: tuple[int, ...] = tuple(
    ((i + 1) * 2_654_435_761 % MERSENNE) | 1 for i in range(_K_MAX)
)
HASH_B: tuple[int, ...] = tuple(
    ((i + 1) * 40_503 * 65_537 + 17) % MERSENNE for i in range(_K_MAX)
)


def h60_spark(expr: str) -> str:
    """Spark SQL: 60-bit integer hash of a string expression."""
    return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def h60_duck(expr: str) -> str:
    """DuckDB SQL twin of :func:`h60_spark`."""
    return f"(('0x' || substring(md5({expr}), 1, 15))::BIGINT)"


def perm_hash_spark(expr: str, i: int) -> str:
    """Spark SQL: i-th universal hash of a string expression -> [0, P)."""
    return (
        f"(({HASH_A[i]} * ({h60_spark(expr)} % {MERSENNE}) + {HASH_B[i]})"
        f" % {MERSENNE})"
    )


def perm_hash_duck(expr: str, i: int) -> str:
    """DuckDB twin of :func:`perm_hash_spark`."""
    return (
        f"(({HASH_A[i]} * ({h60_duck(expr)} % {MERSENNE}) + {HASH_B[i]})"
        f" % {MERSENNE})"
    )
