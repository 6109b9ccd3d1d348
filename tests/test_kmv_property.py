"""Pure-python property pins for the KMV bottom-k sketch algebra —
the registry row (sketch_kmv_mergeable) pins the merge theorem on the
fixture via the DuckDB oracle; these generalize it to arbitrary data and
arbitrary slicings, and pin the md5-48bit hash recipe the Spark and
DuckDB expressions both implement.

No Spark session needed: the theorem is set algebra, and the hash recipe
is hashlib — if either property failed here, the cross-engine hash
equality the driver records would be a coincidence, not a design."""

from __future__ import annotations

import hashlib
import random

import pytest

K = 128
SPACE = 1 << 48
NUM = (K - 1) * SPACE


def _h48(key) -> int:
    """First 48 bits of md5(str(key)) — the exact recipe of
    queries/analytics3.py::sketch_kmv_mergeable (Spark: conv(substr(
    md5, 1, 12), 16, 10); DuckDB: ('0x' || substr(md5, 1, 12))::BIGINT)."""
    return int(hashlib.md5(str(key).encode()).hexdigest()[:12], 16)


def _bottomk(hashes, k=K):
    return sorted(set(hashes))[:k]


def _est(sketch):
    if len(sketch) < K:
        return len(sketch)
    return NUM // sketch[-1]


@pytest.mark.parametrize("seed", range(20))
def test_merge_of_slice_sketches_equals_direct(seed):
    """bottomK(∪ of per-slice bottomK) == bottomK(global distinct) for
    ANY slicing of the keys into any number of slices, including skewed
    and empty slices — the mergeability theorem the driver row pins on
    one slicing (orderkey % 8)."""
    rng = random.Random(seed)
    n = rng.randrange(0, 4 * K)
    keys = [rng.randrange(0, n + 1) for _ in range(n)]  # duplicates likely
    hashes = [_h48(x) for x in keys]
    direct = _bottomk(hashes)

    n_slices = rng.randrange(1, 12)
    slices = [[] for _ in range(n_slices)]
    for h in hashes:
        slices[rng.randrange(n_slices)].append(h)
    merged = _bottomk([h for s in slices for h in _bottomk(s)])

    assert merged == direct
    assert _est(merged) == _est(direct)


def test_estimator_exact_below_k_and_bounded_above():
    """n < K ⇒ the estimator IS the exact count (the sketch holds every
    distinct hash); n >> K ⇒ the estimate lands within the published
    ~1/sqrt(K-2) relative-error envelope (x5 safety for one draw)."""
    small = [_h48(i) for i in range(K - 1)]
    assert _est(_bottomk(small)) == K - 1

    n = 50_000
    big = _bottomk([_h48(i) for i in range(n)])
    est = _est(big)
    assert abs(est - n) / n < 5 / (K - 2) ** 0.5


def test_hash_recipe_matches_spark_conv_semantics():
    """The 12-hex-char prefix always fits 48 bits and is case-stable —
    the property that lets Spark's conv() and DuckDB's 0x-cast agree."""
    for key in (0, 1, 42, 10**12, "ALL", -7):
        h = _h48(key)
        assert 0 <= h < SPACE
        assert h == int(hashlib.md5(str(key).encode())
                        .hexdigest().upper()[:12].lower(), 16)


def test_estimator_zero_kth_hash_guard_cross_engine(spark):
    """If the k-th smallest hash were 0 (probability ~n/2^48), Spark's
    `div` would yield NULL while DuckDB's `//` raises — the guarded
    estimator (ADVICE r11) falls back to n_sketch on BOTH engines, so
    they still agree instead of diverging.  Exercised on a synthetic
    sketch table (no real md5 prefix is forced to zero here — the point
    is the expression pair, not the data path)."""
    import duckdb

    from binaryvectordb_spark.functions.sketch import (
        kmv_estimate,
        kmv_estimate_sql,
    )

    rows = [("zero", 128, 0), ("normal", 128, 1 << 40), ("small", 5, 77)]
    df = spark.createDataFrame(
        rows, "grp string, n_sketch long, kth_hash long")
    got = {r["grp"]: r["est"] for r in df.select(
        "grp", kmv_estimate("n_sketch", "kth_hash", K).alias("est"))
        .collect()}

    con = duckdb.connect()
    sql = kmv_estimate_sql("n_sketch", "kth_hash", K)
    want = {g: e for g, e in con.execute(
        "SELECT grp, " + sql + " AS est FROM (VALUES "
        + ", ".join(f"('{g}', {n}, {h})" for g, n, h in rows)
        + ") t(grp, n_sketch, kth_hash)").fetchall()}

    assert got == want
    assert got["zero"] == 128          # the guard: exact lower bound
    assert got["normal"] == 127 * (1 << 48) // (1 << 40)
    assert got["small"] == 5           # exact branch untouched


@pytest.mark.parametrize("seed", range(20))
def test_sample_tuple_merge_with_hash_collisions(seed):
    """The bottom-k SAMPLE's merge rule (sketch_bkq_mergeable /
    foreach_batch_bottomk_sample) over (h, key, payload) TUPLES with the
    (h, key) tie-break — the case the hash-only KMV pin cannot exercise:
    FORCED hash collisions at and across the K boundary.  Rows (not
    hash values) merge by keeping the K smallest under the (h, key)
    total order; any slicing of the rows must merge to the direct
    bottom-K, and because (h, key) is a total order over distinct keys
    the result is a unique row SET (payloads ride along untouched)."""
    rng = random.Random(seed)
    n = rng.randrange(K // 2, 6 * K)
    # ~8 distinct hash values -> massive collisions; key disambiguates
    rows = [(rng.randrange(8), key, f"p{key}") for key in range(n)]

    def bottomk(rs):
        return sorted(set(rs), key=lambda r: (r[0], r[1]))[:K]

    direct = bottomk(rows)
    for _ in range(4):
        nparts = rng.randrange(1, 9)
        slices = [[] for _ in range(nparts)]
        for r in rows:
            slices[rng.randrange(nparts)].append(r)
        merged = bottomk([r for s in slices for r in bottomk(s)])
        assert merged == direct
