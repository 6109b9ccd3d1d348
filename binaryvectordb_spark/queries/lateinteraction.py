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

Scale (100 TB): the doc-token table is ONE explode of distinct per-doc
tokens (duplicates cannot change a max); the query side is |Q| rows and is
broadcast, so the interaction join is a map-side replicate — no shuffle.
The per-term maxes are pivoted into conditional aggregates of a single
groupBy(doc_id) (terms are known at plan time), so the ENTIRE batch costs
exactly ONE map-side-combined shuffle whose rows are (doc_id, one bigint
per query term).  Top-k plans as TakeOrderedAndProject.  In a serving deployment the same pipeline
runs over the ANN candidate set instead of the corpus (compose with
cascade_search's top-k ids), which is the standard two-stage ColBERT
architecture; the registered queries score the whole fixture corpus so the
oracle exercises the full semantics.
"""

from __future__ import annotations

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

# Spark-side token embedding: transform over dims, all-integer
_SPARK_EMB = (
    "transform(sequence(0, {hi}), j -> "
    "CAST(conv(substring(md5({tok}), j * 4 + 1, 4), 16, 10) AS BIGINT) "
    "% 13 - 6)"
).format(hi=EMB_DIM - 1, tok="{tok}")

# DuckDB-side token embedding (1-indexed substr, same bytes, same ints)
_DUCK_EMB = (
    "list_transform(range(0, {hi}), j -> "
    "(CAST('0x' || substr(md5({tok}), j * 4 + 1, 4) AS BIGINT) % 13) - 6)"
).format(hi=EMB_DIM, tok="{tok}")

_SPARK_DOT = ("aggregate(zip_with(qemb, temb, (x, y) -> x * y), "
              "CAST(0 AS BIGINT), (a, x) -> a + x)")
_DUCK_DOT = ("CAST(list_sum(list_transform(range(1, %d), "
             "j -> qemb[j] * temb[j])) AS BIGINT)" % (EMB_DIM + 1))


def _doc_token_embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, temb) for each DISTINCT token of each document — distinct
    because max over duplicate tokens equals max over the distinct set."""
    d = load_table(spark, sf_dir, "documents")
    return (d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("tok"))
        .select("doc_id", F.expr(_SPARK_EMB.format(tok="tok")).alias("temb")))


def _maxsim(tokens: DataFrame, queries: list[tuple[int, tuple[str, ...]]],
            spark: SparkSession) -> DataFrame:
    """Exact-integer MaxSim for a batch of queries in ONE aggregation pass.

    The query terms are known at plan time (true of any submitted batch), so
    instead of groupBy(doc_id, qtok) -> max then groupBy(doc_id) -> sum (two
    shuffles), the per-term maxes are PIVOTED into conditional aggregates of
    a single groupBy(doc_id): max(dot) FILTER (qid, qtok) for each query
    term, summed per qid in the same projection.  One slim map-side-combined
    shuffle total, regardless of batch size — the shuffle row is
    (doc_id, one bigint per query term).  Returns (doc_id, qid, maxsim)."""
    rows = [(qid, t) for qid, terms in queries for t in terms]
    qdf = (spark.createDataFrame(rows, "qid INT, qtok STRING")
           .select("qid", "qtok",
                   F.expr(_SPARK_EMB.format(tok="qtok")).alias("qemb")))
    inter = (tokens.join(F.broadcast(qdf))
             .select("doc_id", "qid", "qtok", F.expr(_SPARK_DOT).alias("dot")))
    aggs = [
        F.max(F.when((F.col("qid") == qid) & (F.col("qtok") == t),
                     F.col("dot"))).alias(f"mx_{qid}_{j}")
        for qid, terms in queries for j, t in enumerate(terms)]
    g = inter.groupBy("doc_id").agg(*aggs)
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
    scores = _maxsim(_doc_token_embs(spark, sf_dir), [(0, QTERMS)], spark)
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
    scores = _maxsim(_doc_token_embs(spark, sf_dir),
                     list(BATCH_QUERIES), spark)
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
