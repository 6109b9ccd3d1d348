"""Every registered (query, oracle) pair must hash-match on DuckDB — the same
check the driver runs at sf0.01; here at sf0.001 for speed, with a slow marker
running sf0.01 too."""

from __future__ import annotations

import pytest

from binaryvectordb_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_CORRECT, SF_SMOKE
from tests.oracle_harness import compare, duck_con


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity_smoke(spark, duck, name):
    compare(QUERIES[name](spark, SF_SMOKE), ORACLES[name], duck, name)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity_sf001(spark, name):
    con = duck_con(SF_CORRECT)
    try:
        compare(QUERIES[name](spark, SF_CORRECT), ORACLES[name], con, name)
    finally:
        con.close()


def test_every_query_runs(spark):
    """Queries without oracles must still execute and return a DataFrame."""
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        df = fn(spark, SF_SMOKE)
        assert df.count() >= 0, name


def test_priority_covers_registry_exactly_once():
    """The driver hashes the first ~50 registry entries in _PRIORITY order.
    A registered query absent from _PRIORITY falls to a fallback append and
    silently never rotates into the driver window (this bit
    agg_pricing_summary after its round-7 rewrite); a duplicate would
    shadow a slot.  Pin the invariant: _PRIORITY is a permutation of the
    registry."""
    from binaryvectordb_spark.queries import _PRIORITY

    assert len(_PRIORITY) == len(set(_PRIORITY)), "duplicate priority entries"
    missing = set(QUERIES) - set(_PRIORITY)
    extra = set(_PRIORITY) - set(QUERIES)
    assert not missing, f"registered but never prioritized: {sorted(missing)}"
    assert not extra, f"prioritized but not registered: {sorted(extra)}"
