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
_RIGHT_HOW = {"right", "rightouter", "right_outer"}
_FULL_HOW = {"full", "fullouter", "full_outer", "outer"}


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the hot-key rows of ``big``
    spread over ``n_salts`` partitions.  ``small`` is replicated n_salts
    times (keep it small).  Output is identical to
    ``big.join(small, key, how)`` for every supported ``how``.

    inner/left/semi/anti salt directly: the salt mixes a per-row id into
    the hash so byte-identical duplicate rows of a hot key (the
    degenerate-skew case) still spread across salts.

    RIGHT and FULL outer cannot salt directly — an unmatched small-side row
    would survive once per salt replica — so they decompose into the salted
    INNER plus the unmatched rows of each side, null-padded: unmatched
    small rows via anti-join against big's distinct keys (map-side partial
    distinct collapses the hot key before any shuffle), unmatched big rows
    via anti-join against the BROADCAST small key set (a broadcast probe —
    skew-immune by construction).
    """
    hw = how.lower().replace("_", "")
    if hw in {h.replace("_", "") for h in _RIGHT_HOW | _FULL_HOW}:
        inner = salted_join(big, small, key, n_salts, "inner")
        big_rest = [(f.name, f.dataType) for f in big.schema
                    if f.name != key]
        small_rest = [(f.name, f.dataType) for f in small.schema
                      if f.name != key]
        un_small = (small.join(big.select(key).distinct(), key, "left_anti")
                    .select(F.col(key),
                            *[F.lit(None).cast(t).alias(c)
                              for c, t in big_rest],
                            *[F.col(c) for c, _ in small_rest]))
        out = inner.unionByName(un_small)
        if hw in {h.replace("_", "") for h in _FULL_HOW}:
            un_big = (big.join(F.broadcast(small.select(key).distinct()),
                               key, "left_anti")
                      .select(F.col(key),
                              *[F.col(c) for c, _ in big_rest],
                              *[F.lit(None).cast(t).alias(c)
                                for c, t in small_rest]))
            out = out.unionByName(un_big)
        return out
    if hw not in {h.replace("_", "") for h in _SAFE_HOW}:
        raise ValueError(f"salted_join does not support how={how!r}")
    # xor, not +: under ANSI (Spark 4 default) a long + overflows with
    # probability ~id/2^64 per row — monotonically_increasing_id reaches
    # ~partitionIndex*2^33, so at 100k-partition scale a plain add aborts
    # the job with ARITHMETIC_OVERFLOW; xor mixes the same entropy and
    # cannot overflow
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns])
                  .bitwiseXOR(F.monotonically_increasing_id()),
                  F.lit(n_salts)).alias("_salt")
    big_s = big.withColumn("_salt", salt)
    small_s = (small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))))
    out = big_s.join(small_s, [key, "_salt"], how)
    return out.drop("_salt")
