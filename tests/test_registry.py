"""Registry hygiene: every _PRIORITY name must resolve (a typo silently
drops the query from the driver's 50-entry hash window), no duplicates,
and every query carries an oracle."""

from __future__ import annotations

from binaryvectordb_spark.queries import ORACLES, QUERIES, _PRIORITY


def test_priority_names_resolve():
    missing = [n for n in _PRIORITY if n not in QUERIES]
    assert not missing, f"_PRIORITY names without a query: {missing}"


def test_priority_no_duplicates():
    dupes = {n for n in _PRIORITY if _PRIORITY.count(n) > 1}
    assert not dupes, dupes


def test_every_query_has_oracle():
    assert set(QUERIES) == set(ORACLES)


def test_registry_order_starts_with_priority():
    assert list(QUERIES)[:len(_PRIORITY)] == [n for n in _PRIORITY
                                              if n in QUERIES]
