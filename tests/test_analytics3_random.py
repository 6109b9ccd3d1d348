"""Randomized cross-engine robustness for the event-sequence analytics
(queries/analytics3.py): funnel, cohort retention, gaps-and-islands, SCD2
run collapse, adjacent-pattern match, and the salted two-stage agg must
hash-match DuckDB on event streams the fixtures never saw — heavy
timestamp COLLISIONS (the tie-break contract: every window orders by
(ts, event_id)), single-event users, sparse/dense day patterns, three
seeds.  This is the determinism claim under adversarial inputs, not just
the shipped fixtures."""

from __future__ import annotations

import os

import numpy as np
import pytest

import duckdb

from binaryvectordb_spark.queries import ORACLES, QUERIES
from tests.oracle_harness import compare

_TYPES = ["signup", "click", "purchase", "error", "view"]

_QUERIES = [
    "events_funnel_conversion",
    "events_cohort_retention",
    "events_streaks_gaps_islands",
    "scd2_event_state_history",
    "events_error_then_purchase",
    "agg_salted_skew_twostage",
    "join_point_in_time_scd2",
    "events_transition_matrix",
    "sketch_cms_heavy_hitters",
    "events_multitouch_attribution",
    "events_funnel_latency",
    "events_path_trigrams",
]


def _make_events_dir(tmp_path, seed: int, n: int = 400) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(seed)
    d = tmp_path / f"rand_ev_{seed}"
    d.mkdir()
    # ~25 users, skewed activity; COARSE second grid so ties are common
    # (same-user same-second events force the (ts, event_id) tie-break)
    user = rng.zipf(1.5, n) % 25
    base = np.datetime64("2024-03-01T00:00:00", "us")
    secs = rng.randint(0, 86400 * 14, n)
    secs = (secs // 600) * 600  # 10-min grid → frequent exact collisions
    ts = base + secs.astype("timedelta64[s]").astype("timedelta64[us]")
    events = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(user.astype(np.int64), pa.int64()),
        "event_type": pa.array([_TYPES[i] for i in rng.randint(0, 5, n)]),
        "value": pa.array(np.round(rng.uniform(0, 500, n), 2)),
        "props": pa.array(['{"k": %d}' % k for k in rng.randint(0, 100, n)]),
    })
    pq.write_table(events, d / "events.parquet")
    return str(d)


@pytest.mark.parametrize("seed", [11, 42, 77])
@pytest.mark.slow
def test_sequence_analytics_cross_engine_on_random_events(spark, tmp_path,
                                                          seed):
    sf_dir = _make_events_dir(tmp_path, seed)
    con = duckdb.connect()
    p = os.path.join(sf_dir, "events.parquet")
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}')")
    try:
        for name in _QUERIES:
            compare(QUERIES[name](spark, sf_dir), ORACLES[name], con,
                    f"{name}[seed={seed}]")
    finally:
        con.close()


@pytest.mark.parametrize("seed", [5, 31])
def test_pagerank_cross_engine_on_random_graphs(spark, tmp_path, seed):
    """The iterative integer-exact PageRank must match DuckDB on random
    bipartite graphs with power-law degree skew — the exactness claim
    (bigint ranks, truncating division) under adversarial topology, not
    just the fixture."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(seed)
    n = 600
    d = tmp_path / f"rand_g_{seed}"
    d.mkdir()
    li = pa.table({
        "l_suppkey": pa.array((rng.zipf(1.4, n) % 15).astype(np.int64)),
        "l_partkey": pa.array((rng.zipf(1.6, n) % 120).astype(np.int64)),
    })
    pq.write_table(li, d / "lineitem.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{d}/lineitem.parquet')")
    try:
        compare(QUERIES["graph_pagerank_bipartite"](spark, str(d)),
                ORACLES["graph_pagerank_bipartite"], con,
                f"pagerank[seed={seed}]")
    finally:
        con.close()


@pytest.mark.slow
def test_global_rank_matches_window_form_random(spark):
    """operators/ranks.py with_global_rank == row_number() over the
    un-partitioned window, on random frames with heavy key ties (the
    tie-break column makes the order total); ntile_from_rank == ntile()
    for ragged n % tiles."""
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from binaryvectordb_spark.operators.ranks import (
        ntile_from_rank,
        with_global_rank,
    )

    for seed, n in ((5, 97), (29, 256), (77, 33)):
        rng = np.random.RandomState(seed)
        rows = [(int(i), float(v)) for i, v in
                enumerate(rng.randint(0, 12, n).astype(float))]
        df = spark.createDataFrame(rows, "id long, v double")
        ranked, total = with_global_rank(df, ["v", "id"])
        assert total == n
        got = {r["id"]: r["grank"] for r in ranked.collect()}
        w = Window.orderBy("v", "id")
        want = {r["id"]: r["rn"] for r in
                df.withColumn("rn", F.row_number().over(w)).collect()}
        assert got == want, seed
        for tiles in (3, 4, 7):
            gt = {r["id"]: r["b"] for r in ranked.withColumn(
                "b", ntile_from_rank(F.col("grank"), total, tiles))
                .collect()}
            wt = {r["id"]: r["b"] for r in df.withColumn(
                "b", F.ntile(tiles).over(w)).collect()}
            assert gt == wt, (seed, tiles)


def test_group_prefix_sum_matches_window_form_random(spark):
    """with_group_prefix_sum == sum() OVER (PARTITION BY g ORDER BY ...)
    on random frames with few hot groups and tied order keys; totals
    match the per-group window sums."""
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from binaryvectordb_spark.operators.ranks import with_group_prefix_sum

    for seed, n in ((11, 120), (43, 257)):
        rng = np.random.RandomState(seed)
        rows = [(str(rng.choice(list("ABC"))), float(rng.randint(0, 9)),
                 int(i), int(rng.randint(1, 50)))
                for i in range(n)]
        df = spark.createDataFrame(
            rows, "g string, v double, id long, w long")
        cum, totals = with_group_prefix_sum(df, ["g"], ["v", "id"], "w")
        got = {(r["g"], r["id"]): r["cum"] for r in cum.collect()}
        w = (Window.partitionBy("g").orderBy("v", "id")
             .rowsBetween(Window.unboundedPreceding, 0))
        want_df = df.withColumn("cum", F.sum("w").over(w))
        want = {(r["g"], r["id"]): r["cum"] for r in want_df.collect()}
        assert got == want, seed
        want_tot = {r["g"]: r["t"] for r in
                    df.groupBy("g").agg(F.sum("w").alias("t")).collect()}
        assert {k[0]: v for k, v in totals.items()} == want_tot, seed


def test_rank_operators_empty_frames(spark):
    """with_global_rank / with_group_prefix_sum on empty inputs: no
    crash, zero totals, empty output (the sf-independent guard for the
    funnel twin when no user converts)."""
    from binaryvectordb_spark.operators.ranks import (
        with_global_rank,
        with_group_prefix_sum,
    )

    e = spark.createDataFrame([], "g string, v double, id long, w long")
    ranked, n = with_global_rank(e, ["v", "id"])
    assert n == 0 and ranked.collect() == []
    cum, totals = with_group_prefix_sum(e, ["g"], ["v", "id"], "w")
    assert totals == {} and cum.collect() == []
