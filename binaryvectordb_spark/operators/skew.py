"""Skew-aware join (SURVEY north-star: 'skewed keys -> salting, AQE for
runtime re-plan').

AQE's skew-join splitting (enabled in session.py) handles most skew
transparently for sort-merge joins.  ``salted_join`` is the explicit
fallback for cases AQE can't fix (e.g. a hot key on the BUILD side of a
broadcast join, or pre-AQE engines): the big side adds a salt in
[0, n_salts) derived by hashing the full row, the small side is exploded
n_salts times, and the join runs on (key, salt) — splitting each hot key's
rows across n_salts tasks.  Results are exactly those of the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_SAFE_HOW = {"inner", "left", "left_outer", "leftouter", "left_semi",
             "leftsemi", "left_anti", "leftanti"}


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the hot-key rows of ``big``
    spread over ``n_salts`` partitions.  ``small`` is replicated n_salts
    times (keep it small).  Output is identical to
    ``big.join(small, key, how)`` for inner/left/semi/anti joins; RIGHT and
    FULL outer are rejected — an unmatched small-side row would survive once
    per salt replica, so those need the salt applied to the other side.

    The salt mixes a per-row id into the hash so byte-identical duplicate
    rows of a hot key (the degenerate-skew case) still spread across salts.
    """
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _SAFE_HOW}:
        raise ValueError(
            f"salted_join supports inner/left/semi/anti, not {how!r}: "
            "small-side replication would duplicate unmatched rows")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns])
                  + F.monotonically_increasing_id(),
                  F.lit(n_salts)).alias("_salt")
    big_s = big.withColumn("_salt", salt)
    small_s = (small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))))
    out = big_s.join(small_s, [key, "_salt"], how)
    return out.drop("_salt")
