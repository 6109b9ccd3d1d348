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
