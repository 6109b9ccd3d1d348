"""The declarative expectations runner (operators/expectations.py):
violation counting semantics per check type, single-scan folding of
row-level checks, and declaration-order output."""

from __future__ import annotations

from binaryvectordb_spark.operators.expectations import (
    accepted_values,
    foreign_key,
    in_range,
    not_null,
    run_expectations,
    unique,
)


def _result(df):
    return {r["check"]: (r["n_violations"], r["ord"]) for r in df.collect()}


def test_expectation_semantics(spark):
    t = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", -1.0), (2, "zz", 50.0), (None, "a", 200.0),
         (2, None, None)],
        "k int, s string, v double")
    parent = spark.createDataFrame([(1,), (2,)], "pk int")
    got = _result(run_expectations(t, [
        not_null("k"),
        accepted_values("s", ["a", "b"]),
        in_range("v", 0.0, 100.0),
        unique("k"),
        foreign_key("k", parent, "pk"),
    ]))
    assert got["not_null(k)"] == (1, 0)
    # NULL violates accepted_values (strict: pair with not_null to allow)
    assert got["accepted_values(s)"] == (2, 1)
    # NULL v does NOT violate in_range; 200.0 and -1.0 do
    assert got["in_range(v)"] == (2, 2)
    # k=2 appears 3x -> 2 rows beyond the first
    assert got["unique(k)"] == (2, 3)
    # NULL k never matches the parent -> orphan
    assert got["foreign_key(k->pk)"] == (1, 4)


def test_row_checks_fold_into_one_scan(spark):
    """All row-level checks must share ONE aggregation over one scan —
    the plan may contain only a single parquet/LocalTableScan of the
    child table regardless of how many row checks are declared."""
    from binaryvectordb_spark.plans import formatted_plan
    from binaryvectordb_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    o = load_table(spark, SF_SMOKE, "orders")
    df = run_expectations(o, [
        not_null("o_custkey"),
        accepted_values("o_orderstatus", ["O", "F", "P"]),
        in_range("o_totalprice", 0.0, 450_000.0),
    ])
    plan = formatted_plan(df)
    # formatted explain prints each scan node twice (tree + detail block);
    # one physical scan == exactly one "(N) Scan parquet" detail header
    details = [l for l in plan.splitlines()
               if l.startswith("(") and "Scan parquet" in l]
    assert len(details) == 1, plan


def test_clean_table_all_zero(spark):
    t = spark.createDataFrame([(1,), (2,)], "k int")
    got = _result(run_expectations(t, [not_null("k"), unique("k")]))
    assert all(v == 0 for v, _ in got.values())


def test_expectations_match_pandas_oracle_random(spark):
    """Property test: violation counts for random tables + random check
    parameters must equal a pure-pandas recomputation (nulls, duplicate
    keys, out-of-domain and out-of-range values all drawn adversarially).
    Mirrors the repo's textindex/gate property-oracle strategy with
    seeded corpora (one Spark job per case keeps the suite fast)."""
    import numpy as np
    import pandas as pd

    for seed in (2, 13, 71):
        rng = np.random.RandomState(seed)
        n = 60
        k = rng.randint(0, 6, n).astype(float)
        k[rng.rand(n) < 0.15] = np.nan
        s = rng.choice(["a", "b", "c", None], n, p=[0.4, 0.3, 0.2, 0.1])
        v = rng.uniform(-50, 150, n)
        v[rng.rand(n) < 0.1] = np.nan
        pdf = pd.DataFrame({"k": k, "s": list(s), "v": v})
        t = spark.createDataFrame(pdf.astype({"k": "object"}),
                                  "k double, s string, v double")
        lo, hi = sorted(rng.uniform(-20, 120, 2))
        vals = ["a", "b"]
        got = {r["check"]: r["n_violations"] for r in run_expectations(t, [
            not_null("k"),
            accepted_values("s", vals),
            in_range("v", lo, hi),
            unique("k"),
        ]).collect()}
        want_nn = int(pdf["k"].isna().sum())
        want_av = int((~pdf["s"].isin(vals)).sum())  # includes None
        want_ir = int(((pdf["v"] < lo) | (pdf["v"] > hi)).sum())  # NaN False
        vc = pdf["k"].dropna().value_counts()
        # NaN keys group together in Spark groupBy — rows beyond the first
        nan_n = int(pdf["k"].isna().sum())
        want_uq = int((vc[vc > 1] - 1).sum()) + max(0, nan_n - 1)
        assert got["not_null(k)"] == want_nn, seed
        assert got["accepted_values(s)"] == want_av, seed
        assert got["in_range(v)"] == want_ir, seed
        assert got["unique(k)"] == want_uq, seed


def test_empty_or_unsupported_checks_raise(spark):
    """ADVICE r9: an empty check list (or one with only unrecognized
    Check subclasses) must raise a clear ValueError, not AttributeError
    on a None plan."""
    import pytest
    from binaryvectordb_spark.operators.expectations import Check

    t = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="at least one"):
        run_expectations(t, [])
    with pytest.raises(ValueError, match="unsupported"):
        run_expectations(t, [not_null("k"), Check(name="mystery")])


def test_empty_table_reports_zero_violations(spark):
    """ADVICE r9: F.sum over zero rows is NULL — an empty table must
    report 0 violations for every check type (callers int() the counts)."""
    t = spark.createDataFrame([], "k int, s string")
    parent = spark.createDataFrame([(1,)], "pk int")
    got = _result(run_expectations(t, [
        not_null("k"),
        accepted_values("s", ["a"]),
        in_range("k", 0, 10),
        unique("k"),
        foreign_key("k", parent, "pk"),
    ]))
    assert all(v == 0 for v, _ in got.values()), got
    assert all(isinstance(v, int) for v, _ in got.values())
