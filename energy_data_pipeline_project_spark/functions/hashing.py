"""Deterministic, cross-engine hashing primitives.

Dedup operators (MinHash, SimHash, fingerprints) must produce results
that a DuckDB oracle can reproduce bit-for-bit, so every hash is built
from md5 — the one hash both engines expose identically — rather than
engine-native ``hash()`` (Murmur3 in Spark, different in DuckDB).

At 100 TB scale all of these stay JVM-side (Spark's codegen'd ``md5`` /
``conv`` / integer arithmetic): no Python in the hot path, fully
parallel, no shuffle implied by the hash itself.

Every constant here is embedded in BOTH the Spark expression and the
generated oracle SQL, from this single module, so they cannot drift.
"""

from __future__ import annotations

import random

# Mersenne prime 2^31-1: (a*h + b) stays well inside int64.
P31 = 2_147_483_647

MINHASH_K = 16  # signature length
MINHASH_BANDS = 4  # 4 bands x 4 rows: P(candidate) = 1-(1-j^4)^4
MINHASH_ROWS = MINHASH_K // MINHASH_BANDS

_rng = random.Random(42)
MINHASH_A = [_rng.randrange(1, P31) for _ in range(MINHASH_K)]
MINHASH_B = [_rng.randrange(0, P31) for _ in range(MINHASH_K)]

SIMHASH_BITS = 16

# Bloom-filter rehash family (runtime-filter decontamination). k
# independent arithmetic rehashes of an md5-derived base hash pick k
# bit positions in an m-bit filter; pure int64 arithmetic, identical in
# both engines. Seeded separately from the minhash family so the two
# never correlate.
BLOOM_K = 3
_brng = random.Random(7)
BLOOM_A = [_brng.randrange(1, P31) for _ in range(BLOOM_K)]
BLOOM_B = [_brng.randrange(0, P31) for _ in range(BLOOM_K)]

# Count-min sketch rehash family: depth independent arithmetic
# rehashes map an md5-derived base hash to a column in [0, width).
# Seeded separately from the minhash and bloom families.
CMS_DEPTH = 4
CMS_WIDTH = 256
_crng = random.Random(11)
CMS_A = [_crng.randrange(1, P31) for _ in range(CMS_DEPTH)]
CMS_B = [_crng.randrange(0, P31) for _ in range(CMS_DEPTH)]

# Positional fingerprint (rolling-hash style): fp = sum(h(tok)*(pos+1)) % P31
FINGERPRINT_MOD = P31


def md5_int64(col_sql: str, *, duck: bool) -> str:
    """SQL fragment: first 32 bits of md5(col) as a BIGINT in [0, 2^32).

    Spark: ``conv(substr(md5(x),1,8),16,10)`` (conv returns string).
    DuckDB: ``('0x' || substr(md5(x),1,8))::BIGINT``.
    Verified equal for both engines (same md5 hex, same hex parse).
    """
    if duck:
        return f"(('0x' || substr(md5({col_sql}),1,8))::BIGINT)"
    return f"CAST(conv(substr(md5({col_sql}),1,8),16,10) AS BIGINT)"


def md5_int64_hi(col_sql: str, *, duck: bool) -> str:
    """SQL fragment: md5 bits 33-64 (hex chars 9-16) as a BIGINT.

    Together with :func:`md5_int64` this yields 64 independent hash
    bits per input — used by the 64-bit SimHash signature."""
    if duck:
        return f"(('0x' || substr(md5({col_sql}),9,8))::BIGINT)"
    return f"CAST(conv(substr(md5({col_sql}),9,8),16,10) AS BIGINT)"


def minhash_expr(i: int, h_sql: str) -> str:
    """SQL for permutation i applied to a base-hash column (both engines).

    ``(a*(h % P) + b) % P`` — h < 2^32, a < 2^31 so a*(h%P) < 2^62: no
    int64 overflow in either engine.
    """
    a, b = MINHASH_A[i], MINHASH_B[i]
    return f"(({a} * ({h_sql} % {P31}) + {b}) % {P31})"


def bloom_pos_expr(j: int, h_sql: str, m_bits: int) -> str:
    """SQL for bloom bit position j of a base-hash column (both engines).

    Same overflow-safe shape as :func:`minhash_expr`; the final ``% m``
    maps into the filter's bit space (``m_bits`` must divide evenly into
    64-bit words at the call site).
    """
    a, b = BLOOM_A[j], BLOOM_B[j]
    return f"((({a} * ({h_sql} % {P31}) + {b}) % {P31}) % {m_bits})"


def cms_pos_expr(i: int, h_sql: str, width: int = CMS_WIDTH) -> str:
    """SQL for count-min row i's column of a base-hash column (both
    engines). Same overflow-safe shape as :func:`minhash_expr`."""
    a, b = CMS_A[i], CMS_B[i]
    return f"((({a} * ({h_sql} % {P31}) + {b}) % {P31}) % {width})"


def tokens_sql(text_col: str, *, duck: bool) -> str:
    """Single-SPACE-delimited tokens with empties removed (identical in
    both engines). Deliberately not full-whitespace tokenization: the
    corpus contract is space-joined word soup, Spark's split() takes a
    regex while DuckDB's string_split is literal, and a '\\s+' regex
    pair would have to prove the two engines' regex dialects agree —
    a literal space is the one spelling with nothing to diverge."""
    if duck:
        return f"list_filter(string_split({text_col}, ' '), x -> x != '')"
    return f"filter(split({text_col}, ' '), x -> x != '')"


def shingles_sql(toks_col: str, n: int, *, duck: bool) -> str:
    """Distinct n-word shingles from a token-array *column* (plain name).

    Spark's ``sequence(1,0)`` counts DOWN (returns [1,0]) while DuckDB's
    ``generate_series(1,0)`` is empty, so the Spark side guards short
    docs explicitly.
    """
    t = toks_col
    if duck:
        joined = " || ' ' || ".join(f"{t}[i+{j}]" for j in range(n))
        return (
            f"list_distinct(list_transform("
            f"generate_series(1, len({t})-{n - 1}), i -> {joined}))"
        )
    parts = ", ".join(f"element_at({t}, i+{j})" for j in range(n))
    return (
        f"IF(size({t}) < {n}, array(), "
        f"array_distinct(transform(sequence(1, size({t})-{n - 1}), "
        f"i -> concat_ws(' ', {parts}))))"
    )
