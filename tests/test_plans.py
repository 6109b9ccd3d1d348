"""Physical-plan assertions — the scale properties the engine depends on
(SURVEY §4): top-k plans as TakeOrderedAndProject (per-partition partial
top-k, no full sort shuffle), candidate joins broadcast, filters and column
pruning reach the Parquet scan."""

from __future__ import annotations

from binaryvectordb_spark.plans import formatted_plan
from binaryvectordb_spark.queries.relational import filter_range_pushdown
from binaryvectordb_spark.queries.vector import knn_cascade, knn_phase1_hamming
from tests.conftest import SF_SMOKE


def test_cascade_plan_shape(spark):
    plan = formatted_plan(knn_cascade(spark, SF_SMOKE))
    # three top-k stages -> no global Sort without limit
    assert "TakeOrderedAndProject" in plan
    # documents join must broadcast the <=30-row candidate side
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_phase1_is_scan_plus_topk(spark):
    plan = formatted_plan(knn_phase1_hamming(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan  # no shuffle in the scan+topk path


def test_filter_pushdown_reaches_scan(spark):
    plan = formatted_plan(filter_range_pushdown(spark, SF_SMOKE))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # column pruning: only the 6 referenced columns in ReadSchema
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_tax" not in read_schema and "l_comment" not in read_schema
