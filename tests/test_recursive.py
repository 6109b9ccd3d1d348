"""Semi-naive recursive closure (operators/recursive.py) and the two
recursive driver rows (queries/recursion.py) — semantics on hand graphs
with cycles/diamonds, agreement with Spark 4's native recursive CTE on
the acyclic tree, depth gating, and the frontier-broadcast plan pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from binaryvectordb_spark.operators.recursive import semi_naive_closure
from tests.conftest import SF_SMOKE


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _roots(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node long")


def _result(df):
    return sorted((r["node"], r["dist"]) for r in df.collect())


def test_cycle_terminates_without_depth_bound(spark):
    # 0 -> 1 -> 2 -> 0 : UNION ALL recursion loops forever without a
    # guard; semi-naive empties its frontier after the closure
    info: dict = {}
    out = semi_naive_closure(
        _edges(spark, [(0, 1), (1, 2), (2, 0)]), _roots(spark, [0]),
        max_depth=1000, info=info)
    assert _result(out) == [(0, 0), (1, 1), (2, 2)]
    assert info["levels"] == 2  # stopped by the empty frontier, not the cap


def test_diamond_derives_each_node_once(spark):
    # 0 -> {1, 2} -> 3 : two paths to 3, one derivation at dist 2
    info: dict = {}
    out = semi_naive_closure(
        _edges(spark, [(0, 1), (0, 2), (1, 3), (2, 3)]),
        _roots(spark, [0]), max_depth=10, info=info)
    assert _result(out) == [(0, 0), (1, 1), (2, 1), (3, 2)]
    assert info["frontier_sizes"] == [1, 2, 1]


def test_min_distance_across_sources(spark):
    # two roots; 3 is one hop from root 5 and three hops from root 0 —
    # dist must be the min (1), derived at its first level only
    out = semi_naive_closure(
        _edges(spark, [(0, 1), (1, 2), (2, 3), (5, 3)]),
        _roots(spark, [0, 5]), max_depth=10)
    assert _result(out) == [(0, 0), (1, 1), (2, 2), (3, 1), (5, 0)]


def test_max_depth_gates_exploration(spark):
    chain = _edges(spark, [(i, i + 1) for i in range(6)])
    out = semi_naive_closure(chain, _roots(spark, [0]), max_depth=2)
    assert _result(out) == [(0, 0), (1, 1), (2, 2)]
    out0 = semi_naive_closure(chain, _roots(spark, [0]), max_depth=0)
    assert _result(out0) == [(0, 0)]
    with pytest.raises(ValueError):
        semi_naive_closure(chain, _roots(spark, [0]), max_depth=-1)
    with pytest.raises(ValueError):
        semi_naive_closure(chain, _roots(spark, [0]), max_depth=1,
                           node="src")
    with pytest.raises(ValueError):
        semi_naive_closure(chain, _roots(spark, [0]), max_depth=1,
                           dst="dist")


def test_empty_and_duplicate_roots(spark):
    e = _edges(spark, [(0, 1)])
    assert _result(semi_naive_closure(
        e, _roots(spark, []), max_depth=3)) == []
    # duplicate roots dedup to one dist-0 row
    assert _result(semi_naive_closure(
        e, _roots(spark, [0, 0]), max_depth=3)) == [(0, 0), (1, 1)]


def test_matches_native_recursive_cte_on_tree(spark):
    """The semi-naive closure and Spark 4's UnionLoop CTE compute the
    same reachable set on the acyclic part tree (one path per node, so
    UNION ALL needs no dedup and both strategies are exact)."""
    from binaryvectordb_spark.sources.tables import load_table
    part = load_table(spark, SF_SMOKE, "part")
    part.createOrReplaceTempView("part_rec_test")
    cte = spark.sql("""
        WITH RECURSIVE walk(node, dist) AS (
          SELECT CAST(p_partkey AS BIGINT), 0 FROM part_rec_test
          WHERE p_partkey = 5
          UNION ALL
          SELECT CAST(p.p_partkey AS BIGINT), w.dist + 1
          FROM walk w JOIN part_rec_test p
            ON CAST(floor(p.p_partkey / 2.0) AS BIGINT) = w.node
          WHERE w.dist < 30
        ) SELECT node, CAST(dist AS INT) AS dist FROM walk""")
    edges = (part.alias("c").join(
                 part.alias("p"),
                 F.expr("CAST(floor(c.p_partkey / 2.0) AS BIGINT) "
                        "= p.p_partkey"))
             .select(F.col("p.p_partkey").cast("long").alias("src"),
                     F.col("c.p_partkey").cast("long").alias("dst")))
    sn = semi_naive_closure(edges, _roots(spark, [5]), max_depth=30)
    assert _result(sn) == _result(cte)
    assert len(_result(sn)) > 10  # non-trivial subtree at sf0.001


def test_frontier_broadcasts_and_edges_never_shuffle(spark):
    """Plan pin on the OPERATOR'S OWN level join (`_next_level`, the
    function the loop executes): the frontier side must broadcast — the
    edge list (the 100 TB side at scale) stays un-shuffled — and the
    loop must have chosen broadcast at every level (info pin)."""
    from binaryvectordb_spark.operators.recursive import _next_level

    edges = _edges(spark, [(i, i + 1) for i in range(50)])
    lvl = (_roots(spark, [0])
           .select("node", F.lit(0).cast("int").alias("dist"))
           .localCheckpoint(eager=True))
    j = _next_level(lvl, edges, lvl.select("node"), 1,
                    src="src", dst="dst", node="node", do_broadcast=True)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the only sort-merge join allowed is the visited ANTI-join — there
    # the dedup set is the GROWING side, so a broadcast would ship O(V)
    # every level; shuffle-on-node is the honest scale choice for it
    for line in plan.splitlines():
        if "SortMergeJoin" in line:
            assert "LeftAnti" in line, line
    info: dict = {}
    semi_naive_closure(edges, _roots(spark, [0]), max_depth=3, info=info)
    assert info["broadcast_levels"] == [True, True, True]


def test_extra_edge_columns_tolerated(spark):
    """The entry projection makes the (src, dst) contract robust: an
    edges frame carrying a stray column named `node` must not make the
    level join's reference ambiguous."""
    edges = (spark.createDataFrame([(0, 1, 9), (1, 2, 9)],
                                   "src long, dst long, node long"))
    out = semi_naive_closure(edges, _roots(spark, [0]), max_depth=5)
    assert _result(out) == [(0, 0), (1, 1), (2, 2)]


@pytest.mark.parametrize("seed", [11, 23, 47])
@pytest.mark.slow
def test_random_graphs_match_python_bfs(spark, seed):
    """Property: on seeded random digraphs (cycles, self-loops, multi-
    edges, unreachable components all occur at this density), the
    operator equals a reference Python BFS — node set AND min
    distance — both depth-capped and uncapped."""
    import collections
    import random

    rng = random.Random(seed)
    n, m = 40, 90
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    roots = sorted(rng.sample(range(n), 3))
    adj = collections.defaultdict(set)
    for s, t in pairs:
        adj[s].add(t)

    def bfs(cap):
        dist = {r: 0 for r in roots}
        frontier = set(roots)
        d = 0
        while frontier and d < cap:
            d += 1
            nxt = {v for u in frontier for v in adj[u] if v not in dist}
            for v in nxt:
                dist[v] = d
            frontier = nxt
        return sorted(dist.items())

    for cap in (2, 1000):
        out = semi_naive_closure(
            _edges(spark, pairs), _roots(spark, roots), max_depth=cap)
        assert _result(out) == bfs(cap), f"seed={seed} cap={cap}"


def test_driver_rows_match_oracles(spark, duck):
    from binaryvectordb_spark.queries import ORACLES, QUERIES
    from tests.oracle_harness import compare
    for name in ("recursive_cte_subtree_rollup",
                 "recursive_reachability_semi_naive",
                 "recursive_bom_extended_quantity"):
        compare(QUERIES[name](spark, SF_SMOKE), ORACLES[name], duck, name)


def test_bom_quantities_multiply_along_paths(spark):
    """Closed-form pin on a 3-level slice under root 8: children 16/17
    carry ext_qty 1+(k%3), and grandchildren 34/35 carry the PRODUCT of
    their path's per-edge quantities — not the sum."""
    from binaryvectordb_spark.sources.tables import load_table
    load_table(spark, SF_SMOKE, "part").createOrReplaceTempView("part")
    got = {r["node"]: r["ext_qty"] for r in spark.sql("""
        WITH RECURSIVE bom(root, node, ext_qty) AS (
          SELECT p_partkey, p_partkey, CAST(1 AS BIGINT) FROM part
          WHERE p_partkey = 8
          UNION ALL
          SELECT b.root, p.p_partkey, b.ext_qty * (1 + p.p_partkey % 3)
          FROM bom b JOIN part p
            ON CAST(floor(p.p_partkey / 2.0) AS BIGINT) = b.node
        ) SELECT node, ext_qty FROM bom""").collect()}
    assert got[8] == 1
    assert got[16] == 1 + 16 % 3 and got[17] == 1 + 17 % 3
    assert got[34] == got[17] * (1 + 34 % 3)
    assert got[35] == got[17] * (1 + 35 % 3)


def test_materialize_edges_identical_and_single_derivation(spark):
    """r16 optimization pin: `materialize_edges=True` (one lazy
    localCheckpoint of the projected edge frame) must be result- and
    info-identical to the default path on a multi-level cyclic graph,
    and the materialized edge frame must be an RDD scan (no re-derived
    lineage) in the level join."""
    pairs = [(i, (i + 1) % 7) for i in range(7)] + [(0, 3), (3, 6)]
    info_a: dict = {}
    info_b: dict = {}
    a = semi_naive_closure(_edges(spark, pairs), _roots(spark, [0]),
                           max_depth=10, info=info_a)
    b = semi_naive_closure(_edges(spark, pairs), _roots(spark, [0]),
                           max_depth=10, materialize_edges=True,
                           info=info_b)
    assert _result(a) == _result(b)
    assert info_a == info_b

