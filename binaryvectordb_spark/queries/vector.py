"""Vector-domain queries: the reference's search surface (SURVEY §2.1, §2.3,
§2.4, §2.5) over the ``embeddings``/``documents`` fixtures.

The fixed query vector is the embedding of ``vec_id = 0`` (deterministic, no
network — replaces the Cohere query-embed call at
BinaryVectorDB/BinaryVectorDB.py:193-196).  dim = 64 (fixture schema).

Oracle parity contract: every float fold is strict left-to-right over
ascending dimension index in BOTH engines, operands widened to DOUBLE before
multiply — results are bit-identical, no tolerance needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binaryvectordb_spark.functions.vector import (
    NUM_LANES,
    cosine,
    dot,
    hamming,
    pack_bits,
    popcount_vec,
)
from binaryvectordb_spark.operators.cascade import (
    build_doc_store,
    build_index,
    cascade_search,
)
from binaryvectordb_spark.queries import register
from binaryvectordb_spark.sources.tables import load_table

DIM = 64
QID = 0

# SQL fragments shared by the DuckDB oracles (dim-level arithmetic — the
# packed-lane layout is a Spark-side physical choice the oracle never sees).
_H = ("list_sum(list_transform(range(1, 65), i -> "
      "CASE WHEN (qv[i] >= 0) <> (dv[i] >= 0) THEN 1 ELSE 0 END))")
_BDOT = ("list_sum(list_transform(range(1, 65), i -> "
         "CAST(qv[i] AS DOUBLE) * (CASE WHEN dv[i] >= 0 THEN "
         "CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)))")
_I8 = ("CAST(ROUND(GREATEST(CAST(-1 AS DOUBLE), LEAST(CAST(1 AS DOUBLE), "
       "CAST(dv[i] AS DOUBLE))) * CAST(127 AS DOUBLE)) AS DOUBLE)")
_I8DOT = f"list_sum(list_transform(range(1, 65), i -> CAST(qv[i] AS DOUBLE) * {_I8}))"
_I8NORM = f"sqrt(list_sum(list_transform(range(1, 65), i -> {_I8} * {_I8})))"
_DOT = ("list_sum(list_transform(range(1, 65), i -> "
        "CAST(qv[i] AS DOUBLE) * CAST(dv[i] AS DOUBLE)))")
_QNORM = ("sqrt(list_sum(list_transform(range(1, 65), i -> "
          "CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))")
_DNORM = ("sqrt(list_sum(list_transform(range(1, 65), i -> "
          "CAST(dv[i] AS DOUBLE) * CAST(dv[i] AS DOUBLE))))")

_Q_CTE = f"q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QID})"
_D_CTE = "d AS (SELECT vec_id AS doc_id, embedding AS dv FROM embeddings)"


def _tables(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    return emb, docs


def _qdf(emb: DataFrame) -> DataFrame:
    return emb.where(F.col("vec_id") == QID).select(
        F.col("embedding").alias("qvec"))


# -- flagship: full 3-phase cascade (SURVEY §2.5) ---------------------------

def knn_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, docs = _tables(spark, sf_dir)
    index_df = build_index(emb, DIM)
    doc_df = build_doc_store(emb, docs)
    return cascade_search(index_df, doc_df, DIM, query_df=_qdf(emb))


register(
    "knn_cascade", knn_cascade,
    oracle=f"""
WITH {_Q_CTE}, {_D_CTE},
scored AS (SELECT doc_id, dv, CAST({_H} AS INTEGER) AS score_hamming FROM d, q),
p1 AS (SELECT * FROM scored ORDER BY score_hamming ASC, doc_id ASC LIMIT 100),
p2s AS (SELECT doc_id, dv, score_hamming, {_BDOT} AS score_binary FROM p1, q),
p2 AS (SELECT * FROM p2s ORDER BY score_binary DESC, doc_id ASC LIMIT 30),
p3s AS (SELECT p2.doc_id, score_hamming, score_binary,
               {_I8DOT} / {_I8NORM} AS score_cossim, dcs.text AS doc
        FROM p2, q, documents dcs WHERE dcs.doc_id = p2.doc_id)
SELECT doc_id, score_hamming, score_binary, score_cossim, doc
FROM p3s ORDER BY score_cossim DESC, doc_id ASC LIMIT 10
""")


# -- IVF-pruned cascade: the pluggable-index serving path (db.py
#    index_type='ivf', reference index_type/index_args :17,:60) -------------

NPROBE_CASCADE = 2


def knn_cascade_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-phase cascade over ONLY the NPROBE_CASCADE IVF partitions
    nearest the query — the deterministic twin of BinaryVectorDB's KMeans
    IVF (db.py build_ivf): clusters = the fixture's label column, centroids
    = exact per-dimension decimal means (order-independent, oracle-exact),
    probe ranking by cosine.  Phases I-III then run unchanged on the pruned
    index — at scale the probe filter becomes partition pruning when the
    index is laid out by cluster."""
    emb, docs = _tables(spark, sf_dir)
    q = _qdf(emb)

    from binaryvectordb_spark.queries.similarity import exact_label_centroids
    centroids = exact_label_centroids(emb, DIM)
    best = (centroids.join(F.broadcast(q))
            .select("label", cosine("qvec", "cvec").alias("cscore"))
            .orderBy(F.desc("cscore"), F.asc("label"))
            .limit(NPROBE_CASCADE))

    pruned = emb.join(F.broadcast(best.select("label")), "label")
    index_df = build_index(pruned, DIM)
    doc_df = build_doc_store(emb, docs)
    return cascade_search(index_df, doc_df, DIM, query_df=q)


_CENT_COS = """
list_sum(list_transform(range(1, 65), i -> CAST(qv[i] AS DOUBLE) * cvec[i]))
/ (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
 * sqrt(list_sum(list_transform(range(1, 65), i -> cvec[i] * cvec[i]))))
"""

register(
    "knn_cascade_ivf", knn_cascade_ivf,
    oracle=f"""
WITH {_Q_CTE},
ex AS (SELECT label, i AS pos, CAST(embedding[i + 1] AS DECIMAL(20,10)) AS v
       FROM embeddings, range(0, 64) t(i)),
cent_dims AS (SELECT label, pos, CAST(SUM(v) AS DOUBLE) / count(*) AS c
              FROM ex GROUP BY label, pos),
centroids AS (SELECT label, list(c ORDER BY pos) AS cvec
              FROM cent_dims GROUP BY label),
best AS (SELECT label, {_CENT_COS} AS cscore FROM centroids, q
         ORDER BY cscore DESC, label ASC LIMIT {NPROBE_CASCADE}),
d AS (SELECT vec_id AS doc_id, embedding AS dv FROM embeddings
      WHERE label IN (SELECT label FROM best)),
scored AS (SELECT doc_id, dv, CAST({_H} AS INTEGER) AS score_hamming FROM d, q),
p1 AS (SELECT * FROM scored ORDER BY score_hamming ASC, doc_id ASC LIMIT 100),
p2s AS (SELECT doc_id, dv, score_hamming, {_BDOT} AS score_binary FROM p1, q),
p2 AS (SELECT * FROM p2s ORDER BY score_binary DESC, doc_id ASC LIMIT 30),
p3s AS (SELECT p2.doc_id, score_hamming, score_binary,
               {_I8DOT} / {_I8NORM} AS score_cossim, dcs.text AS doc
        FROM p2, q, documents dcs WHERE dcs.doc_id = p2.doc_id)
SELECT doc_id, score_hamming, score_binary, score_cossim, doc
FROM p3s ORDER BY score_cossim DESC, doc_id ASC LIMIT 10
""")


# -- Phase I alone: hamming top-k over the packed binary index --------------

def knn_phase1_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, _ = _tables(spark, sf_dir)
    index_df = build_index(emb, DIM)
    q = _qdf(emb).select(pack_bits("qvec", DIM).alias("qbits"))
    return (index_df.join(F.broadcast(q))
            .select("doc_id", hamming("qbits", "vec", NUM_LANES(DIM)).alias("score_hamming"))
            .orderBy(F.asc("score_hamming"), F.asc("doc_id"))
            .limit(100))


register(
    "knn_phase1_hamming", knn_phase1_hamming,
    oracle=f"""
WITH {_Q_CTE}, {_D_CTE}
SELECT doc_id, CAST({_H} AS INTEGER) AS score_hamming
FROM d, q ORDER BY score_hamming ASC, doc_id ASC LIMIT 100
""")


# -- exact brute-force float cosine top-k (the float32 baseline,
#    reference README.md:13 'float32 exact search') ------------------------

def knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, _ = _tables(spark, sf_dir)
    d = emb.select(F.col("vec_id").alias("doc_id"),
                   F.col("embedding").alias("dvec"))
    return (d.join(F.broadcast(_qdf(emb)))
            .select("doc_id", cosine("qvec", "dvec").alias("score_cosine"))
            .orderBy(F.desc("score_cosine"), F.asc("doc_id"))
            .limit(10))


register(
    "knn_bruteforce_cosine", knn_bruteforce_cosine,
    oracle=f"""
WITH {_Q_CTE}, {_D_CTE}
SELECT doc_id,
       CASE WHEN {_QNORM} > 0 AND {_DNORM} > 0
            THEN {_DOT} / ({_QNORM} * {_DNORM}) ELSE CAST(0 AS DOUBLE) END
         AS score_cosine
FROM d, q ORDER BY score_cosine DESC, doc_id ASC LIMIT 10
""")


# -- inner-product top-k ----------------------------------------------------

def knn_dot_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, _ = _tables(spark, sf_dir)
    d = emb.select(F.col("vec_id").alias("doc_id"),
                   F.col("embedding").alias("dvec"))
    return (d.join(F.broadcast(_qdf(emb)))
            .select("doc_id", dot("qvec", "dvec").alias("score_dot"))
            .orderBy(F.desc("score_dot"), F.asc("doc_id"))
            .limit(10))


register(
    "knn_dot_topk", knn_dot_topk,
    oracle=f"""
WITH {_Q_CTE}, {_D_CTE}
SELECT doc_id, {_DOT} AS score_dot
FROM d, q ORDER BY score_dot DESC, doc_id ASC LIMIT 10
""")


# -- index stats: per-label popcount aggregate (verifies bit packing at the
#    aggregate level; the agg itself is §2.4 grouped agg) -------------------

def index_popcount_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, _ = _tables(spark, sf_dir)
    idx = build_index(emb, DIM, id_col="vec_id").join(
        emb.select(F.col("vec_id").alias("doc_id"), "label"), "doc_id")
    return (idx.select("label", popcount_vec("vec").alias("pc"))
            .groupBy("label")
            .agg(F.count("*").alias("n"),
                 F.sum("pc").alias("sum_popcount"),
                 F.min("pc").alias("min_popcount"),
                 F.max("pc").alias("max_popcount"))
            .orderBy("label"))


register(
    "index_popcount_stats", index_popcount_stats,
    oracle="""
WITH pc AS (
  SELECT label,
         CAST(list_sum(list_transform(embedding, x ->
              CASE WHEN x >= 0 THEN 1 ELSE 0 END)) AS INTEGER) AS pc
  FROM embeddings)
SELECT label, count(*) AS n, CAST(sum(pc) AS BIGINT) AS sum_popcount,
       min(pc) AS min_popcount, max(pc) AS max_popcount
FROM pc GROUP BY label ORDER BY label
""")


# -- __len__ (reference :255-259) ------------------------------------------

def db_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, _ = _tables(spark, sf_dir)
    return build_index(emb, DIM).agg(F.count("*").alias("n"))


register("db_len", db_len, oracle="SELECT count(*) AS n FROM embeddings")


# -- KV point read -> broadcast semi-join (reference :238, SURVEY §2.3) -----

def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, docs = _tables(spark, sf_dir)
    keys = spark.range(0, 20).select(F.col("id").alias("doc_id"))
    return (docs.join(F.broadcast(keys), "doc_id", "left_semi")
            .select("doc_id", "text", "lang", "source")
            .orderBy("doc_id"))


register(
    "point_lookup", point_lookup,
    oracle="""
SELECT doc_id, text, lang, source FROM documents
WHERE doc_id IN (SELECT * FROM range(0, 20)) ORDER BY doc_id
""")


# -- batched multi-query cascade (the Spark serving story: per-query overhead
#    amortizes across a query batch; SURVEY §3.1 'multi-query batches') ------

N_BATCH_QUERIES = 8


def knn_cascade_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binaryvectordb_spark.operators.cascade import cascade_search_batch
    emb, docs = _tables(spark, sf_dir)
    index_df = build_index(emb, DIM)
    doc_df = build_doc_store(emb, docs)
    queries_df = emb.where(F.col("vec_id") < N_BATCH_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    return cascade_search_batch(index_df, doc_df, DIM, queries_df, k=5,
                                binary_oversample=10, int8_oversample=3)


register(
    "knn_cascade_batch", knn_cascade_batch,
    oracle=f"""
WITH qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
            WHERE vec_id < {N_BATCH_QUERIES}),
{_D_CTE},
scored AS (SELECT qid, doc_id, dv, qv,
                  CAST({_H} AS INTEGER) AS score_hamming FROM d, qs),
p1 AS (SELECT * FROM (SELECT *, row_number() OVER
           (PARTITION BY qid ORDER BY score_hamming ASC, doc_id ASC) AS rn
       FROM scored) WHERE rn <= 50),
p2s AS (SELECT qid, doc_id, dv, qv, score_hamming,
               {_BDOT} AS score_binary FROM p1),
p2 AS (SELECT * FROM (SELECT *, row_number() OVER
           (PARTITION BY qid ORDER BY score_binary DESC, doc_id ASC) AS rn2
       FROM p2s) WHERE rn2 <= 15),
p3s AS (SELECT qid, p2.doc_id, score_hamming, score_binary,
               {_I8DOT} / {_I8NORM} AS score_cossim, dcs.text AS doc
        FROM p2, documents dcs WHERE dcs.doc_id = p2.doc_id)
SELECT qid, doc_id, score_hamming, score_binary, score_cossim, doc
FROM (SELECT *, row_number() OVER
          (PARTITION BY qid ORDER BY score_cossim DESC, doc_id ASC) AS rn3
      FROM p3s) WHERE rn3 <= 5
""")


# -- filtered search: metadata predicate + cascade (EXT — a standard
#    vector-DB capability the reference lacks; pre-filtering keeps the
#    oversample semantics meaningful under selective predicates) -----------

def knn_cascade_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascade restricted to documents with lang = 'en': the predicate is
    applied to the INDEX before Phase I (left-semi join against the
    filtered metadata), so all three top-k stages run on eligible docs only
    — post-filtering the final k would silently return < k rows.  At scale,
    co-partitioning index and metadata by doc_id (or storing the filter
    column IN the index table) turns this into a pushed-down scan filter."""
    emb, docs = _tables(spark, sf_dir)
    eligible = docs.where(F.col("lang") == "en").select("doc_id")
    index_df = build_index(emb, DIM).join(eligible, "doc_id", "left_semi")
    doc_df = build_doc_store(emb, docs)
    return cascade_search(index_df, doc_df, DIM, query_df=_qdf(emb))


register(
    "knn_cascade_filtered", knn_cascade_filtered,
    oracle=f"""
WITH {_Q_CTE},
d AS (SELECT vec_id AS doc_id, embedding AS dv FROM embeddings
      WHERE vec_id IN (SELECT doc_id FROM documents WHERE lang = 'en')),
scored AS (SELECT doc_id, dv, CAST({_H} AS INTEGER) AS score_hamming FROM d, q),
p1 AS (SELECT * FROM scored ORDER BY score_hamming ASC, doc_id ASC LIMIT 100),
p2s AS (SELECT doc_id, dv, score_hamming, {_BDOT} AS score_binary FROM p1, q),
p2 AS (SELECT * FROM p2s ORDER BY score_binary DESC, doc_id ASC LIMIT 30),
p3s AS (SELECT p2.doc_id, score_hamming, score_binary,
               {_I8DOT} / {_I8NORM} AS score_cossim, dcs.text AS doc
        FROM p2, q, documents dcs WHERE dcs.doc_id = p2.doc_id)
SELECT doc_id, score_hamming, score_binary, score_cossim, doc
FROM p3s ORDER BY score_cossim DESC, doc_id ASC LIMIT 10
""")


# -- adaptive filtered search: selectivity-driven pre/post-filter ----------

def knn_filtered_adaptive_rare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive filtered cascade with a SELECTIVE predicate
    (source = 'src0', ~5% of docs): the measured selectivity falls under the
    0.5 switch, so the operator must choose the PREFILTER branch (exact
    filtered top-k; asserted by the oracle through the strategy column)."""
    from binaryvectordb_spark.operators.cascade import (
        cascade_search_filtered_adaptive,
    )
    emb, docs = _tables(spark, sf_dir)
    eligible = docs.where(F.col("source") == "src0").select("doc_id")
    return cascade_search_filtered_adaptive(
        build_index(emb, DIM), build_doc_store(emb, docs), DIM,
        eligible, query_df=_qdf(emb))


register(
    "knn_filtered_adaptive_rare", knn_filtered_adaptive_rare,
    oracle=f"""
WITH {_Q_CTE},
d AS (SELECT vec_id AS doc_id, embedding AS dv FROM embeddings
      WHERE vec_id IN (SELECT doc_id FROM documents WHERE source = 'src0')),
scored AS (SELECT doc_id, dv, CAST({_H} AS INTEGER) AS score_hamming FROM d, q),
p1 AS (SELECT * FROM scored ORDER BY score_hamming ASC, doc_id ASC LIMIT 100),
p2s AS (SELECT doc_id, dv, score_hamming, {_BDOT} AS score_binary FROM p1, q),
p2 AS (SELECT * FROM p2s ORDER BY score_binary DESC, doc_id ASC LIMIT 30),
p3s AS (SELECT p2.doc_id, score_hamming, score_binary,
               {_I8DOT} / {_I8NORM} AS score_cossim, dcs.text AS doc
        FROM p2, q, documents dcs WHERE dcs.doc_id = p2.doc_id)
SELECT doc_id, score_hamming, score_binary, score_cossim, doc,
       'prefilter' AS strategy
FROM p3s ORDER BY score_cossim DESC, doc_id ASC LIMIT 10
""")


def knn_filtered_adaptive_broad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive filtered cascade with a BROAD predicate (lang <> 'zh',
    ~85% of docs): selectivity exceeds the switch, so the operator must
    choose the POSTFILTER branch — Phase I over-fetches 4x on the
    unfiltered index, ineligible survivors are dropped, Phases II/III run
    on the rest.  The oracle replicates the over-fetch pipeline exactly
    (including its bounded-recall semantics) and pins the strategy."""
    from binaryvectordb_spark.operators.cascade import (
        cascade_search_filtered_adaptive,
    )
    emb, docs = _tables(spark, sf_dir)
    eligible = docs.where(F.col("lang") != "zh").select("doc_id")
    return cascade_search_filtered_adaptive(
        build_index(emb, DIM), build_doc_store(emb, docs), DIM,
        eligible, query_df=_qdf(emb))


register(
    "knn_filtered_adaptive_broad", knn_filtered_adaptive_broad,
    oracle=f"""
WITH {_Q_CTE}, {_D_CTE},
scored AS (SELECT doc_id, dv, CAST({_H} AS INTEGER) AS score_hamming FROM d, q),
p1 AS (SELECT * FROM scored ORDER BY score_hamming ASC, doc_id ASC LIMIT 400),
p1f AS (SELECT * FROM p1 WHERE doc_id IN
        (SELECT doc_id FROM documents WHERE lang <> 'zh')),
p2s AS (SELECT doc_id, dv, score_hamming, {_BDOT} AS score_binary FROM p1f, q),
p2 AS (SELECT * FROM p2s ORDER BY score_binary DESC, doc_id ASC LIMIT 30),
p3s AS (SELECT p2.doc_id, score_hamming, score_binary,
               {_I8DOT} / {_I8NORM} AS score_cossim, dcs.text AS doc
        FROM p2, q, documents dcs WHERE dcs.doc_id = p2.doc_id)
SELECT doc_id, score_hamming, score_binary, score_cossim, doc,
       'postfilter' AS strategy
FROM p3s ORDER BY score_cossim DESC, doc_id ASC LIMIT 10
""")


# -- radius (range) search: the dual of top-k -------------------------------

def knn_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All documents within hamming radius 24 of the query — a range
    predicate on the scored scan rather than a top-k truncation, so the
    result size is data-dependent.  The scan stays filter+project (no sort,
    no window); output ordered for the hash gate."""
    emb, _ = _tables(spark, sf_dir)
    index_df = build_index(emb, DIM)
    q = _qdf(emb).select(pack_bits("qvec", DIM).alias("qbits"))
    return (index_df.join(F.broadcast(q))
            .select("doc_id",
                    hamming("qbits", "vec", NUM_LANES(DIM)).alias("score_hamming"))
            .where(F.col("score_hamming") <= 24)
            .orderBy(F.asc("score_hamming"), F.asc("doc_id")))


register(
    "knn_radius_search", knn_radius_search,
    oracle=f"""
WITH {_Q_CTE}, {_D_CTE}
SELECT doc_id, CAST({_H} AS INTEGER) AS score_hamming
FROM d, q WHERE {_H} <= 24
ORDER BY score_hamming ASC, doc_id ASC
""")


# -- k-NN label vote: majority class among the cosine top-k -----------------

def knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification for 5 query vectors: majority label among each
    query's exact-cosine top-10 (ties broken by smaller label).  Shapes:
    per-query top-k window -> per-(query,label) count -> argmax via a second
    window."""
    from pyspark.sql import Window
    emb, _ = _tables(spark, sf_dir)
    qs = (emb.where(F.col("vec_id") < 5)
          .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")))
    scored = (emb.join(F.broadcast(qs))
              .where(F.col("vec_id") != F.col("qid"))     # leave-one-out
              .select("qid", F.col("vec_id").alias("doc_id"), "label",
                      cosine("qv", "embedding").alias("s")))
    w = Window.partitionBy("qid").orderBy(F.desc("s"), F.asc("doc_id"))
    top = (scored.withColumn("rn", F.row_number().over(w))
           .where(F.col("rn") <= 10))
    votes = top.groupBy("qid", "label").agg(F.count("*").alias("votes"))
    wv = Window.partitionBy("qid").orderBy(F.desc("votes"), F.asc("label"))
    return (votes.withColumn("rk", F.row_number().over(wv))
            .where(F.col("rk") == 1)
            .select("qid", F.col("label").alias("predicted_label"), "votes"))


register(
    "knn_label_vote", knn_label_vote,
    oracle=f"""
WITH qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
d AS (SELECT vec_id AS doc_id, label, embedding AS dv FROM embeddings),
scored AS (SELECT qid, doc_id, label, {_DOT} / ({_QNORM} * {_DNORM}) AS s
           FROM d, qs WHERE doc_id <> qid),
top AS (SELECT * FROM (SELECT qid, doc_id, label,
                              row_number() OVER (PARTITION BY qid
                                                 ORDER BY s DESC, doc_id) AS rn
                       FROM scored) WHERE rn <= 10),
votes AS (SELECT qid, label, count(*) AS votes FROM top GROUP BY qid, label)
SELECT qid, label AS predicted_label, votes
FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY votes DESC, label) AS rk
      FROM votes)
WHERE rk = 1
""")


# -- calibrated int8 quantization error: the quality-retention measurement --

N_CALIB_QUERIES = 8


def quant_int8_score_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibrated measurement of the cascade's Phase-III int8 error
    against the float32 brute-force score, AS DATA — the quantitative
    echo of the reference's quality-retention table (README.md:134-153,
    which reports recall@k for int8 rescoring but never ships the
    harness).  For each of N_CALIB_QUERIES fixed query vectors scored
    against the whole corpus:

    - avg/max absolute error between int8_cosine(q, int8(d)) and the
      float doc-side-norm score dot(q,d)/||d|| (the SAME functional —
      only the quantizer differs, so the delta IS the quantization
      error),
    - overlap_at_10: |top-10 by float  ∩  top-10 by int8| (the recall
      number the reference's table states),
    - top1_match: whether the winner survives quantization.

    Determinism: per-pair error is folded to INTEGER picounits
    (round(err*1e12) -> BIGINT, HALF_UP in both engines — the same
    device as int8_quantize itself) so the re-associable sum is exact
    under any partitioning; max/count are order-independent; rankings
    tie-break on doc_id.

    Scale: the 8-query side broadcasts; scoring is map-side over one
    corpus scan; the per-query top-10 windows compile to WindowGroupLimit
    (per-partition partial top-k, no per-query funnel)."""
    from pyspark.sql import Window

    from binaryvectordb_spark.functions.vector import (
        int8_cosine,
        int8_quantize,
        norm,
    )

    emb, _ = _tables(spark, sf_dir)
    qs = (emb.where(F.col("vec_id") < N_CALIB_QUERIES)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("qvec")))
    d = emb.select(F.col("vec_id").alias("doc_id"),
                   F.col("embedding").alias("dvec"))
    scored = (d.crossJoin(F.broadcast(qs))
              .withColumn("d8", int8_quantize("dvec"))
              .withColumn("f_score",
                          F.when(norm("dvec") > 0,
                                 dot("qvec", "dvec") / norm("dvec"))
                          .otherwise(F.lit(0.0)))
              .withColumn("i_score", int8_cosine("qvec", "d8"))
              .withColumn("err_pico",
                          F.round(F.abs(F.col("i_score") - F.col("f_score"))
                                  * F.lit(1e12)).cast("long")))
    # one scoring pass, three consumers: materialize the NARROW projection
    # (ids + 2 scores + err — the vectors are dropped) so the stats agg and
    # both rankings reuse it instead of re-running the dot products per
    # branch (Spark shares no common subplans across self-join branches);
    # at 100 TB this artifact is smaller than the embedding corpus itself
    scored = (scored.select("query_id", "doc_id", "f_score", "i_score",
                            "err_pico")
              .localCheckpoint(eager=True))
    per_q = scored.groupBy("query_id").agg(
        F.count("*").alias("n_docs"),
        (F.sum("err_pico").cast("double") / F.count("*") / F.lit(1e12))
        .alias("avg_abs_err"),
        (F.max("err_pico").cast("double") / F.lit(1e12))
        .alias("max_abs_err"))
    wf = Window.partitionBy("query_id").orderBy(F.desc("f_score"),
                                                F.asc("doc_id"))
    wi = Window.partitionBy("query_id").orderBy(F.desc("i_score"),
                                                F.asc("doc_id"))
    topf = (scored.withColumn("rn", F.row_number().over(wf))
            .where(F.col("rn") <= 10).select("query_id", "doc_id", "rn"))
    topi = (scored.withColumn("rni", F.row_number().over(wi))
            .where(F.col("rni") <= 10)
            .select("query_id", "doc_id", "rni"))
    ov = (topf.join(topi, ["query_id", "doc_id"])
          .groupBy("query_id")
          .agg(F.count("*").cast("bigint").alias("overlap_at_10"),
               F.sum(F.when((F.col("rn") == 1) & (F.col("rni") == 1), 1)
                     .otherwise(0)).cast("bigint").alias("top1_match")))
    return (per_q.join(ov, "query_id", "left")
            .select("query_id", "n_docs", "avg_abs_err", "max_abs_err",
                    F.coalesce("overlap_at_10", F.lit(0).cast("bigint"))
                    .alias("overlap_at_10"),
                    F.coalesce("top1_match", F.lit(0).cast("bigint"))
                    .alias("top1_match")))


_F_SCORE = (f"CASE WHEN {_DNORM} > 0 THEN {_DOT} / {_DNORM} "
            "ELSE CAST(0 AS DOUBLE) END")
_I_SCORE = (f"CASE WHEN {_I8NORM} > 0 THEN {_I8DOT} / {_I8NORM} "
            "ELSE CAST(0 AS DOUBLE) END")

register(
    "quant_int8_score_error", quant_int8_score_error,
    oracle=f"""
WITH qs AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
            WHERE vec_id < {N_CALIB_QUERIES}),
{_D_CTE},
scored AS (SELECT query_id, doc_id,
                  {_F_SCORE} AS f_score, {_I_SCORE} AS i_score
           FROM d CROSS JOIN qs),
errs AS (SELECT query_id, doc_id, f_score, i_score,
                CAST(ROUND(ABS(i_score - f_score) * 1e12) AS BIGINT)
                  AS err_pico
         FROM scored),
per_q AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(err_pico) AS DOUBLE) / count(*) / 1e12
                   AS avg_abs_err,
                 CAST(max(err_pico) AS DOUBLE) / 1e12 AS max_abs_err
          FROM errs GROUP BY query_id),
topf AS (SELECT query_id, doc_id, rn FROM (
           SELECT query_id, doc_id, row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY f_score DESC, doc_id ASC) AS rn
           FROM errs) WHERE rn <= 10),
topi AS (SELECT query_id, doc_id, rni FROM (
           SELECT query_id, doc_id, row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY i_score DESC, doc_id ASC) AS rni
           FROM errs) WHERE rni <= 10),
ov AS (SELECT f.query_id, CAST(count(*) AS BIGINT) AS overlap_at_10,
              CAST(sum(CASE WHEN f.rn = 1 AND i.rni = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS top1_match
       FROM topf f JOIN topi i
         ON f.query_id = i.query_id AND f.doc_id = i.doc_id
       GROUP BY f.query_id)
SELECT p.query_id, p.n_docs, p.avg_abs_err, p.max_abs_err,
       COALESCE(o.overlap_at_10, 0) AS overlap_at_10,
       COALESCE(o.top1_match, 0) AS top1_match
FROM per_q p LEFT JOIN ov o ON o.query_id = p.query_id
""")


# -- calibrated dimension-truncation error: the MRL quality measurement ----

TRUNC_DIMS = (16, 32)

# truncated-cosine fragments: every fold runs over dims 1..trunc_dim only,
# strict left-to-right, operands widened to DOUBLE — same parity contract
# as the full-dim fragments above
_TDOT = ("list_sum(list_transform(range(1, trunc_dim + 1), i -> "
         "CAST(qv[i] AS DOUBLE) * CAST(dv[i] AS DOUBLE)))")
_TQNORM = ("sqrt(list_sum(list_transform(range(1, trunc_dim + 1), i -> "
           "CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))")
_TDNORM = ("sqrt(list_sum(list_transform(range(1, trunc_dim + 1), i -> "
           "CAST(dv[i] AS DOUBLE) * CAST(dv[i] AS DOUBLE))))")
_T_SCORE = (f"CASE WHEN {_TQNORM} > 0 AND {_TDNORM} > 0 "
            f"THEN {_TDOT} / ({_TQNORM} * {_TDNORM}) "
            "ELSE CAST(0 AS DOUBLE) END")


def _trunc_scored(emb: DataFrame) -> DataFrame:
    """Pre-checkpoint scoring plan for quant_trunc_dim_error: one corpus
    scan, the 16-row (query × dim) side broadcast, all folds in-expr.
    Split out so tests can pin THIS plan's shape — the eager
    localCheckpoint in the query truncates lineage, hiding the broadcast
    from the final explain."""
    qs = (emb.where(F.col("vec_id") < N_CALIB_QUERIES)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("qvec")))
    d = emb.select(F.col("vec_id").alias("doc_id"),
                   F.col("embedding").alias("dvec"))
    t_dot = ("aggregate(zip_with(slice(qvec, 1, trunc_dim), "
             "slice(dvec, 1, trunc_dim), "
             "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
             "CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
    t_qn = ("sqrt(aggregate(zip_with(slice(qvec, 1, trunc_dim), "
            "slice(qvec, 1, trunc_dim), "
            "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "CAST(0 AS DOUBLE), (acc, v) -> acc + v))")
    t_dn = ("sqrt(aggregate(zip_with(slice(dvec, 1, trunc_dim), "
            "slice(dvec, 1, trunc_dim), "
            "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "CAST(0 AS DOUBLE), (acc, v) -> acc + v))")
    # f_score BEFORE the trunc_dim explode: the full-dim cosine depends
    # only on (query, doc), so computing it on the un-exploded pairs and
    # letting Generate duplicate the value halves the dominant map-side
    # scoring work (r11 review)
    return (d.crossJoin(F.broadcast(qs))
            .withColumn("f_score", cosine("qvec", "dvec"))
            .withColumn("trunc_dim",
                        F.explode(F.array(*[F.lit(m) for m in TRUNC_DIMS])))
            .withColumn("t_score",
                        F.expr(f"CASE WHEN {t_qn} > 0 AND {t_dn} > 0 "
                               f"THEN {t_dot} / ({t_qn} * {t_dn}) "
                               "ELSE CAST(0 AS DOUBLE) END"))
            .withColumn("err_pico",
                        F.round(F.abs(F.col("t_score") - F.col("f_score"))
                                * F.lit(1e12)).cast("long"))
            .select("query_id", "trunc_dim", "doc_id", "f_score",
                    "t_score", "err_pico"))


def quant_trunc_dim_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibrated dimension-truncation quality — the Matryoshka-style
    companion of quant_int8_score_error: instead of narrowing each
    dimension to int8 (keeping all 64), keep the FIRST m dimensions at
    full precision (m ∈ TRUNC_DIMS) and measure what the prefix costs.
    Together the two queries bracket the public embedding-compression
    design space the reference occupies (its README's quality-retention
    table covers binary+int8; truncation is the published alternative —
    Kusupati et al., "Matryoshka Representation Learning", NeurIPS'22).

    For each of N_CALIB_QUERIES fixed queries × each trunc dim, against
    the whole corpus: avg/max |cos_m − cos_64| (folded to INTEGER
    picounits so the re-associable sum is exact under any partitioning),
    overlap_at_10 between the full-dim and truncated top-10, and
    top1_match.  Fixture vectors are i.i.d. per-dim, so the prefix is an
    unbiased random projection — the measured overlap is the
    random-feature floor an MRL-trained model must beat.

    Scale: the 16-row (query × dim) side broadcasts; scoring is
    map-side over ONE corpus scan; the narrow (ids + 2 scores + err)
    projection is localCheckpointed once and shared by the stats agg
    and both rankings; per-group top-10 compiles to WindowGroupLimit."""
    from pyspark.sql import Window

    emb, _ = _tables(spark, sf_dir)
    scored = _trunc_scored(emb).localCheckpoint(eager=True)
    per_q = scored.groupBy("query_id", "trunc_dim").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        (F.sum("err_pico").cast("double") / F.count("*") / F.lit(1e12))
        .alias("avg_abs_err"),
        (F.max("err_pico").cast("double") / F.lit(1e12))
        .alias("max_abs_err"))
    wf = Window.partitionBy("query_id", "trunc_dim").orderBy(
        F.desc("f_score"), F.asc("doc_id"))
    wt = Window.partitionBy("query_id", "trunc_dim").orderBy(
        F.desc("t_score"), F.asc("doc_id"))
    topf = (scored.withColumn("rn", F.row_number().over(wf))
            .where(F.col("rn") <= 10)
            .select("query_id", "trunc_dim", "doc_id", "rn"))
    topt = (scored.withColumn("rnt", F.row_number().over(wt))
            .where(F.col("rnt") <= 10)
            .select("query_id", "trunc_dim", "doc_id", "rnt"))
    ov = (topf.join(topt, ["query_id", "trunc_dim", "doc_id"])
          .groupBy("query_id", "trunc_dim")
          .agg(F.count("*").cast("bigint").alias("overlap_at_10"),
               F.sum(F.when((F.col("rn") == 1) & (F.col("rnt") == 1), 1)
                     .otherwise(0)).cast("bigint").alias("top1_match")))
    return (per_q.join(ov, ["query_id", "trunc_dim"], "left")
            .select("query_id", "trunc_dim", "n_docs", "avg_abs_err",
                    "max_abs_err",
                    F.coalesce("overlap_at_10", F.lit(0).cast("bigint"))
                    .alias("overlap_at_10"),
                    F.coalesce("top1_match", F.lit(0).cast("bigint"))
                    .alias("top1_match")))


_TF_SCORE = (f"CASE WHEN {_DNORM} > 0 AND {_QNORM} > 0 "
             f"THEN {_DOT} / ({_QNORM} * {_DNORM}) "
             "ELSE CAST(0 AS DOUBLE) END")

register(
    "quant_trunc_dim_error", quant_trunc_dim_error,
    oracle=f"""
WITH qs AS (SELECT vec_id AS query_id, embedding AS qv, trunc_dim
            FROM embeddings
            CROSS JOIN (VALUES (16), (32)) AS td(trunc_dim)
            WHERE vec_id < {N_CALIB_QUERIES}),
{_D_CTE},
scored AS (SELECT query_id, trunc_dim, doc_id,
                  {_TF_SCORE} AS f_score, {_T_SCORE} AS t_score
           FROM d CROSS JOIN qs),
errs AS (SELECT query_id, trunc_dim, doc_id, f_score, t_score,
                CAST(ROUND(ABS(t_score - f_score) * 1e12) AS BIGINT)
                  AS err_pico
         FROM scored),
per_q AS (SELECT query_id, trunc_dim,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(err_pico) AS DOUBLE) / count(*) / 1e12
                   AS avg_abs_err,
                 CAST(max(err_pico) AS DOUBLE) / 1e12 AS max_abs_err
          FROM errs GROUP BY query_id, trunc_dim),
topf AS (SELECT query_id, trunc_dim, doc_id, rn FROM (
           SELECT query_id, trunc_dim, doc_id, row_number() OVER (
                    PARTITION BY query_id, trunc_dim
                    ORDER BY f_score DESC, doc_id ASC) AS rn
           FROM errs) WHERE rn <= 10),
topt AS (SELECT query_id, trunc_dim, doc_id, rnt FROM (
           SELECT query_id, trunc_dim, doc_id, row_number() OVER (
                    PARTITION BY query_id, trunc_dim
                    ORDER BY t_score DESC, doc_id ASC) AS rnt
           FROM errs) WHERE rnt <= 10),
ov AS (SELECT f.query_id, f.trunc_dim,
              CAST(count(*) AS BIGINT) AS overlap_at_10,
              CAST(sum(CASE WHEN f.rn = 1 AND i.rnt = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS top1_match
       FROM topf f JOIN topt i
         ON f.query_id = i.query_id AND f.trunc_dim = i.trunc_dim
        AND f.doc_id = i.doc_id
       GROUP BY f.query_id, f.trunc_dim)
SELECT p.query_id, p.trunc_dim, p.n_docs, p.avg_abs_err, p.max_abs_err,
       COALESCE(o.overlap_at_10, 0) AS overlap_at_10,
       COALESCE(o.top1_match, 0) AS top1_match
FROM per_q p LEFT JOIN ov o
  ON o.query_id = p.query_id AND o.trunc_dim = p.trunc_dim
""")
