"""Skew mitigation: salted equi-join.

AQE's skew-join splitting (on by default, session.py) handles most
skew at runtime. Salting is the explicit fallback when a single key is
so hot that even a split partition overwhelms one task — the classic
case at 100 TB being a null-ish or default-valued join key holding
whole percents of the fact table.

``salted_join(big, small, key, n_salt)``: the big side gets a
per-row salt in [0, n_salt); the small side is replicated n_salt
times; the join runs on (key, salt), spreading each hot key over
n_salt tasks. Cost: small side shuffled n_salt×, so keep n_salt
modest and the small side small (or broadcast and skip salting
entirely — salting only matters for shuffle joins).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# Collision-proof internal column; a caller-owned "_salt" column must
# survive the join untouched (r07 review).
_SALT = "__skew_salt__"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with key salting.

    Result is identical to ``big.join(small, on, how)`` for inner and
    left joins (each big-side row matches exactly the same small-side
    rows; the salt only routes rows to partitions).

    The salt must be DETERMINISTIC per row content: an earlier version
    derived it from ``monotonically_increasing_id()``, so a fetch-
    failure recompute could re-salt rows differently from the copy a
    reducer had already fetched — silent row loss or duplication under
    task retry (r07 review). ``xxhash64`` over every column is stable
    across recomputes; identical duplicate rows share a salt, which
    only costs spreading when the hot key's rows are bit-identical
    (and identical rows carry no information to split on anyway).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    if n_salt < 1:
        # range(n_salt <= 0) is EMPTY, so the small side would be
        # replicated zero times: an inner join silently returns 0 rows
        # and a left join NULL-extends everything — silent row loss
        # for a dynamically computed knob (r08 review; the same
        # misconfiguration class as ingestion's days_per_task, r07)
        raise ValueError(f"n_salt must be >= 1, got {n_salt}")
    for df, side in ((big, "big"), (small, "small")):
        if _SALT in df.columns:
            raise ValueError(f"{side} side already has a {_SALT} column")
    # xxhash64 rejects MapType (anywhere in a nested type) — skip such
    # columns rather than fail analysis on frames that joined fine
    # before salting (r07 diff review). The key column itself is
    # always included, so the degenerate all-map frame still salts
    # (identically per key — no spread, but correct).
    hashable = [
        c for c, t in big.dtypes if c == on or "map<" not in t.lower()
    ]
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in hashable]), F.lit(n_salt))
    big_s = big.withColumn(_SALT, salt.cast("int"))
    small_s = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(n_salt).select(
                F.col("id").cast("int").alias(_SALT)
            )
        )
    )
    out = big_s.join(small_s, [on, _SALT], how)
    return out.drop(_SALT)
