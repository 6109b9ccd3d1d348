"""Late-interaction (multi-vector / MaxSim) retrieval over the documents
corpus — the ColBERT-family scoring mode: every token carries its own
embedding, and a document's score for a query is

    MaxSim(q, d) = sum over query tokens t_q of
                   max over document tokens t_d of  <emb(t_q), emb(t_d)>

The reference engine scores one pooled vector per document
(BinaryVectorDB/BinaryVectorDB.py:193-252); late interaction is the
higher-fidelity retrieval mode a production corpus pipeline layers on top,
so the engine ships it as a first-class query family next to BM25/RRF
(queries/hybrid.py) and the binary cascade (operators/cascade.py).

Determinism (oracle value-hash contract): token embeddings are derived, in
BOTH engines, from the token's md5 — dim j of emb(t) is

    (hex_int(md5(t)[4j+1 .. 4j+4]) % 13) - 6        for j in 0..7

so every component is a small integer in [-6, 6], every dot product is an
exact integer sum (|dot| <= 8*36), and MaxSim is an exact bigint — no
floating point anywhere, hence bit-identical across Spark and DuckDB
regardless of fold order.  (Same md5-prefix-to-int trick as the MinHash
base hash, functions/text.py:69-76.)

Execution shape (the fast form — two slower shapes were measured and
rejected, NOTES.md round 7):
- The QUERY-side embeddings are tiny and known at plan time, so they are
  computed in Python (hashlib md5 — the same bytes the SQL md5 produces)
  and inlined as INTEGER LITERAL COEFFICIENTS.  No query DataFrame, no
  join, no higher-order functions: per term the dot against a doc token is
  `c0*d0 + ... + c7*d7` — whole-stage-codegen integer arithmetic.
  (The first implementation broadcast a query table and folded
  aggregate(zip_with(...)) per interaction row: HOFs are CodegenFallback,
  and it ran ~4x slower.)
- The DOC-side dims d0..d7 are projected ONCE per distinct token from a
  single md5 (8 references to the hex column keep CollapseProject from
  inlining the hash 8x into the dim expressions).

Scale (100 TB): one explode of distinct per-doc tokens, one projection,
and ONE map-side-combined groupBy(doc_id) holding max-aggregates for every
query term — the shuffle row is (doc_id, one bigint per term) for the
whole batch.  Top-k plans as TakeOrderedAndProject; the batch rank prunes
with a partial WindowGroupLimit before its qid exchange.  In a serving
deployment the same pipeline runs over the ANN candidate set (compose with
cascade_search's top-k ids) — the standard two-stage ColBERT architecture;
the registered queries score the whole fixture corpus so the oracle
exercises the full semantics.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from binaryvectordb_spark.queries import register
from binaryvectordb_spark.sources.tables import load_table

EMB_DIM = 8
# flagship query terms (shared vocabulary with hybrid.TERMS plus one
# mid-frequency term so MaxSim and BM25 lists are comparable but not equal)
QTERMS = ("vector", "window", "merge", "scan")
BATCH_QUERIES = (
    (0, ("vector", "window")),
    (1, ("merge", "scan", "filter")),
    (2, ("join", "shuffle")),
)
K = 10


def _emb_ints(token: str) -> list[int]:
    """The md5-derived integer embedding, computed driver-side for QUERY
    terms only — hashlib md5 of the same bytes gives the same hex digest
    as Spark's and DuckDB's md5(), so the literal coefficients match what
    the oracle derives in SQL."""
    h = hashlib.md5(token.encode("utf-8")).hexdigest()
    return [int(h[4 * j: 4 * j + 4], 16) % 13 - 6 for j in range(EMB_DIM)]


# doc-side dim j from the per-token md5 hex column (one md5 per token; the
# 8 separate references prevent CollapseProject from inlining the hash)
def _dim_expr(j: int) -> F.Column:
    return F.expr(
        f"CAST(conv(substring(hex, {4 * j + 1}, 4), 16, 10) AS BIGINT)"
        f" % 13 - 6")


# DuckDB-side token embedding (1-indexed substr, same bytes, same ints)
_DUCK_EMB = (
    "list_transform(range(0, {hi}), j -> "
    "(CAST('0x' || substr(md5({tok}), j * 4 + 1, 4) AS BIGINT) % 13) - 6)"
).format(hi=EMB_DIM, tok="{tok}")

_DUCK_DOT = ("CAST(list_sum(list_transform(range(1, %d), "
             "j -> qemb[j] * temb[j])) AS BIGINT)" % (EMB_DIM + 1))


def _doc_token_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, d0..d7) for each DISTINCT token of each document —
    distinct because max over duplicate tokens equals max over the
    distinct set."""
    return _dims_of(load_table(spark, sf_dir, "documents"))


def _dims_of(d: DataFrame) -> DataFrame:
    """Token-dim projection over an arbitrary documents frame (the full
    corpus, or a candidate-pruned subset for the rerank composition)."""
    return (d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("tok"))
        .select("doc_id", F.md5("tok").alias("hex"))
        .select("doc_id",
                *[_dim_expr(j).alias(f"d{j}") for j in range(EMB_DIM)]))


def _maxsim(dims: DataFrame,
            queries: list[tuple[int, tuple[str, ...]]]) -> DataFrame:
    """Exact-integer MaxSim for a batch of queries in ONE aggregation pass.

    Per query term the dot against a doc token is a literal-coefficient
    linear form over the projected dims (pure codegen integer math — no
    join, no HOFs), and the per-term maxes are pivoted into aggregates of
    a single groupBy(doc_id), summed per qid in the same projection.  One
    slim map-side-combined shuffle total, regardless of batch size — the
    shuffle row is (doc_id, one bigint per query term).
    Returns (doc_id, qid, maxsim)."""
    aggs = []
    for qid, terms in queries:
        for j, t in enumerate(terms):
            c = _emb_ints(t)
            dot = " + ".join(f"({c[k]}) * d{k}" for k in range(EMB_DIM)
                             if c[k] != 0) or "CAST(0 AS BIGINT)"
            aggs.append(F.max(F.expr(dot)).alias(f"mx_{qid}_{j}"))
    g = dims.groupBy("doc_id").agg(*aggs)
    stack_args = ", ".join(
        "{qid}, {expr}".format(
            qid=qid,
            expr=" + ".join(f"mx_{qid}_{j}" for j in range(len(terms))))
        for qid, terms in queries)
    return g.select(
        "doc_id",
        F.expr(f"stack({len(queries)}, {stack_args}) AS (qid, maxsim)"))


def search_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide MaxSim top-10 for the flagship 4-term query."""
    scores = _maxsim(_doc_token_dims(spark, sf_dir), [(0, QTERMS)])
    return (scores.select("doc_id", "maxsim")
            .orderBy(F.desc("maxsim"), F.asc("doc_id")).limit(K))


_QTERMS_SQL = ", ".join(f"'{t}'" for t in QTERMS)

register("search_maxsim_topk", search_maxsim_topk, oracle=f"""
WITH qt AS (
  SELECT unnest([{_QTERMS_SQL}]) AS qtok
), q AS (
  SELECT qtok, {_DUCK_EMB.format(tok="qtok")} AS qemb FROM qt
), dt AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents
), de AS (
  SELECT doc_id, {_DUCK_EMB.format(tok="tok")} AS temb FROM dt
), inter AS (
  SELECT doc_id, qtok, {_DUCK_DOT} AS dot FROM de CROSS JOIN q
), mx AS (
  SELECT doc_id, qtok, max(dot) AS mx FROM inter GROUP BY 1, 2
)
SELECT doc_id, CAST(sum(mx) AS BIGINT) AS maxsim
FROM mx GROUP BY doc_id
ORDER BY maxsim DESC, doc_id ASC LIMIT {K}
""")


def search_maxsim_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched MaxSim: one pass over the corpus serves a (qid, qtok) query
    table; per-qid top-10 via a rank window (plans under Spark 4's
    window-group-limit — no global sort).  This is the serving-shaped form:
    the doc-token explode is SHARED across all queries in the batch, so the
    corpus-scan cost amortizes exactly like knn_cascade_batch
    (queries/vector.py:295)."""
    scores = _maxsim(_doc_token_dims(spark, sf_dir), list(BATCH_QUERIES))
    w = Window.partitionBy("qid").orderBy(F.desc("maxsim"), F.asc("doc_id"))
    return (scores.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= K)
            .select("qid", "doc_id", "maxsim", "rnk")
            .orderBy("qid", "rnk"))


_BATCH_VALUES = ", ".join(
    f"({qid}, '{t}')" for qid, terms in BATCH_QUERIES for t in terms)

register("search_maxsim_topk_batch", search_maxsim_topk_batch, oracle=f"""
WITH qt(qid, qtok) AS (VALUES {_BATCH_VALUES}),
q AS (
  SELECT qid, qtok, {_DUCK_EMB.format(tok="qtok")} AS qemb FROM qt
), dt AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents
), de AS (
  SELECT doc_id, {_DUCK_EMB.format(tok="tok")} AS temb FROM dt
), inter AS (
  SELECT doc_id, qid, qtok, {_DUCK_DOT} AS dot FROM de CROSS JOIN q
), mx AS (
  SELECT doc_id, qid, qtok, max(dot) AS mx FROM inter GROUP BY 1, 2, 3
), sc AS (
  SELECT qid, doc_id, CAST(sum(mx) AS BIGINT) AS maxsim
  FROM mx GROUP BY 1, 2
), rk AS (
  SELECT qid, doc_id, maxsim,
         row_number() OVER (PARTITION BY qid
                            ORDER BY maxsim DESC, doc_id ASC) AS rnk
  FROM sc
)
SELECT qid, doc_id, maxsim, rnk
FROM rk WHERE rnk <= {K} ORDER BY qid, rnk
""")


# -- two-stage serving composition: cascade recall -> MaxSim rerank ---------

RERANK_POOL = 50


def search_maxsim_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard two-stage ColBERT serving architecture this module's
    header promises: Phase A recalls RERANK_POOL candidates with the cheap
    pooled-vector cascade (operators/cascade.py — hamming scan + binary +
    int8 rescore, the reference's whole search path,
    BinaryVectorDB/BinaryVectorDB.py:193-252), Phase B re-scores ONLY those
    candidates with exact-integer MaxSim and returns the top-K.

    Execution shape: the cascade's <= RERANK_POOL ids are collected
    (candidate-class collect — the NOTES.md pattern: Spark has no
    common-subplan reuse, so downstream rebuilds from an isin() re-read
    instead of referencing the cascade plan twice), then the MaxSim dims
    pipeline runs over documents WHERE doc_id IN (...) — the In filter
    reaches the parquet scan (plan-pinned in tests/test_plans.py), so the
    rerank stage reads candidate rows only, never the corpus.  The
    cascade's cossim rides along as a literal map (50 entries, pure
    codegen) — no second join.  At 100 TB: stage A is the bounded cascade,
    stage B touches 50 docs; rerank cost is independent of corpus size."""
    from binaryvectordb_spark.operators.cascade import (
        build_doc_store,
        build_index,
        cascade_search,
    )
    from binaryvectordb_spark.queries.vector import DIM, _qdf, _tables

    emb, docs = _tables(spark, sf_dir)
    cands = cascade_search(build_index(emb, DIM),
                           build_doc_store(emb, docs), DIM,
                           query_df=_qdf(emb), k=RERANK_POOL)
    rows = cands.select("doc_id", "score_cossim").collect()
    ids = [r["doc_id"] for r in rows]
    cs_map = F.create_map(*[F.lit(x) for r in rows
                            for x in (r["doc_id"], r["score_cossim"])])

    d = (load_table(spark, sf_dir, "documents")
         .where(F.col("doc_id").isin(ids)))
    scores = _maxsim(_dims_of(d), [(0, QTERMS)])
    return (scores
            .select("doc_id", "maxsim",
                    F.element_at(cs_map, F.col("doc_id"))
                    .alias("score_cossim"))
            .orderBy(F.desc("maxsim"), F.asc("doc_id")).limit(K))


# oracle: the knn_cascade CTE chain widened to the RERANK_POOL (LIMITs
# scale with k exactly as cascade_search's oversampling does: binary 10x,
# int8 3x), then the MaxSim chain restricted to the candidate ids
from binaryvectordb_spark.queries.vector import (  # noqa: E402
    _BDOT as _C_BDOT,
    _D_CTE as _C_D,
    _H as _C_H,
    _I8DOT as _C_I8DOT,
    _I8NORM as _C_I8NORM,
    _Q_CTE as _C_Q,
)

register("search_maxsim_rerank", search_maxsim_rerank, oracle=f"""
WITH {_C_Q}, {_C_D},
scored AS (SELECT doc_id, dv, CAST({_C_H} AS INTEGER) AS score_hamming
           FROM d, q),
p1 AS (SELECT * FROM scored ORDER BY score_hamming ASC, doc_id ASC
       LIMIT {RERANK_POOL * 10}),
p2s AS (SELECT doc_id, dv, {_C_BDOT} AS score_binary FROM p1, q),
p2 AS (SELECT * FROM p2s ORDER BY score_binary DESC, doc_id ASC
       LIMIT {RERANK_POOL * 3}),
p3s AS (SELECT doc_id, {_C_I8DOT} / {_C_I8NORM} AS score_cossim FROM p2, q),
cand AS (SELECT * FROM p3s ORDER BY score_cossim DESC, doc_id ASC
         LIMIT {RERANK_POOL}),
qt AS (SELECT unnest([{_QTERMS_SQL}]) AS qtok),
qe AS (SELECT qtok, {_DUCK_EMB.format(tok="qtok")} AS qemb FROM qt),
dt AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
       FROM documents WHERE doc_id IN (SELECT doc_id FROM cand)),
de AS (SELECT doc_id, {_DUCK_EMB.format(tok="tok")} AS temb FROM dt),
inter AS (SELECT doc_id, qtok, {_DUCK_DOT} AS dot FROM de CROSS JOIN qe),
mx AS (SELECT doc_id, qtok, max(dot) AS mx FROM inter GROUP BY 1, 2),
sc AS (SELECT doc_id, CAST(sum(mx) AS BIGINT) AS maxsim
       FROM mx GROUP BY doc_id)
SELECT c.doc_id, sc.maxsim, c.score_cossim
FROM cand c JOIN sc ON sc.doc_id = c.doc_id
ORDER BY sc.maxsim DESC, c.doc_id ASC LIMIT {K}
""")
