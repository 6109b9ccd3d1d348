"""Shared KMV (bottom-k) sketch primitives — ONE definition of the hash
recipe and the estimator, imported by both the batch registry query
(queries/analytics3.py::sketch_kmv_mergeable) and the streaming twin
(streaming/events.py::foreach_batch_kmv_sketch), so stream/batch
hash-compatibility is by construction, not by hand-copied expressions.

The recipe: h = first 48 bits of md5(str(key)) — 12 hex chars, so the
value fits a BIGINT exactly in both engines (Spark: conv(substr(md5(x),
1, 12), 16, 10); DuckDB: ('0x' || substr(md5(x), 1, 12))::BIGINT), and
the unbiased KMV estimator (Beyer et al., SIGMOD'07) stays pure integer
arithmetic: est = (k-1)·2^48 div h_k, exact count when the sketch holds
fewer than k hashes.  Pure-python property pins: tests/test_kmv_property.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

KMV_SPACE = 1 << 48  # 12 hex chars of md5 = 48 bits


def kmv_hash48(col: str) -> Column:
    """First 48 bits of md5(string(col)) as bigint."""
    return F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 12),
                  16, 10).cast("long")


def kmv_hash48_sql(expr: str) -> str:
    """The DuckDB twin of kmv_hash48 over an arbitrary SQL expression."""
    return (f"('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 12))"
            "::BIGINT")


def kmv_estimate(n_sketch: str, kth_hash: str, k: int) -> Column:
    """NDV estimate from a bottom-k sketch: exact below k, else
    (k-1)·2^48 div h_k — bigint arithmetic only.  The kth_hash > 0
    guard closes a cross-engine divergence at probability ~n/2^48: if
    the k-th smallest hash were 0, Spark's `div` yields NULL while
    DuckDB's `//` raises — both forms fall back to n_sketch (the exact
    lower bound) instead (ADVICE r11)."""
    num = (k - 1) * KMV_SPACE
    return (F.when(F.col(n_sketch) < k, F.col(n_sketch))
            .when(F.expr(f"({kth_hash})") <= 0, F.col(n_sketch))
            .otherwise(F.expr(f"CAST({num} AS BIGINT) div ({kth_hash})"))
            .cast("long"))


def kmv_estimate_sql(n_sketch: str, kth_hash: str, k: int) -> str:
    """The DuckDB twin of kmv_estimate (same kth_hash > 0 guard)."""
    num = (k - 1) * KMV_SPACE
    return (f"CAST(CASE WHEN {n_sketch} < {k} THEN {n_sketch} "
            f"WHEN ({kth_hash}) <= 0 THEN {n_sketch} "
            f"ELSE {num} // ({kth_hash}) END AS BIGINT)")
