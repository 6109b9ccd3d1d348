"""Similarity-search operators beyond the flagship cascade (SURVEY §2.12):
IVF-style partitioned ANN and LSH sign-bucket ANN over the embedding column.

Scale design: both are prune-then-score.  IVF scores ~dim x n_labels centroid
rows first (tiny), then scans only the nprobe selected partitions — at 100 TB
the embeddings table is partitioned BY the cluster id so partition pruning
skips everything else.  The LSH bucket variant prunes by an 8-bit sign
prefix, an equi-join on the bucket key — no cross product.

Centroids are computed with DECIMAL per-dimension sums (posexplode +
hash-agg) so they are exact and order-independent — a float groupBy-sum
would be nondeterministic across partitionings and could never hash-match an
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binaryvectordb_spark.functions.vector import cosine
from binaryvectordb_spark.queries import register
from binaryvectordb_spark.sources.tables import load_table

DIM = 64
QID = 0
NPROBE = 2

_COS = """
list_sum(list_transform(range(1, 65), i -> CAST(qv[i] AS DOUBLE) * CAST(dv[i] AS DOUBLE)))
/ (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
 * sqrt(list_sum(list_transform(range(1, 65), i -> CAST(dv[i] AS DOUBLE) * CAST(dv[i] AS DOUBLE)))))
"""


def exact_label_centroids(e: DataFrame, dim: int = 64) -> DataFrame:
    """(label, cvec): exact per-dimension centroid of each label partition —
    DECIMAL sums -> double mean, so the result is order-independent and
    bit-identical across partitionings and engines (a float groupBy-sum
    could never hash-match an oracle).  Centroid count = n_labels:
    kilobytes, always broadcastable.

    Shape: posexplode -> (label, pos) decimal sums -> collect per label.
    The tempting no-explode alternative (ONE groupBy(label) carrying dim
    decimal-sum aggregates over element_at) was A/B'd in round 8 and is
    3x SLOWER (0.41 -> 1.19 s at sf0.1): 64 per-row element_at + decimal
    casts in one aggregate don't vectorize, while Generate + two narrow
    aggs do — the explode's extra shuffle rows are slim and cheap."""
    del dim  # posexplode is dim-agnostic; param kept for API stability
    exploded = e.select("label", F.posexplode("embedding").alias("pos", "v"))
    cent_dims = (exploded.groupBy("label", "pos")
                 .agg((F.sum(F.col("v").cast("decimal(20,10)")).cast("double")
                       / F.count("*")).alias("c")))
    return (cent_dims.groupBy("label")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "c")))
                 .alias("pc"))
            .select("label", F.expr("transform(pc, x -> x.c)").alias("cvec")))


# DuckDB twin of exact_label_centroids — CTEs `ex`/`cd`/`cent(label, cvec)`
DUCK_CENTROIDS = """
ex AS (SELECT label, i AS pos, CAST(embedding[i + 1] AS DECIMAL(20,10)) AS v
       FROM embeddings, range(0, 64) t(i)),
cd AS (SELECT label, pos, CAST(SUM(v) AS DOUBLE) / count(*) AS c
       FROM ex GROUP BY label, pos),
cent AS (SELECT label, list(c ORDER BY pos) AS cvec FROM cd GROUP BY label)
"""


def ann_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: centroid per label (exact decimal mean) -> rank centroids by
    cosine to the query -> brute-force cosine top-10 within the NPROBE best
    partitions.  The label column is the fixture's cluster id (FIXTURES.md)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == QID).select(F.col("embedding").alias("qvec"))
    centroids = exact_label_centroids(e)

    best = (centroids.join(F.broadcast(q))
            .select("label", cosine("qvec", "cvec").alias("cscore"))
            .orderBy(F.desc("cscore"), F.asc("label"))
            .limit(NPROBE))

    return (e.join(F.broadcast(best.select("label")), "label")
            .join(F.broadcast(q))
            .select(F.col("vec_id").alias("doc_id"), "label",
                    cosine("qvec", "embedding").alias("score_cosine"))
            .orderBy(F.desc("score_cosine"), F.asc("doc_id"))
            .limit(10))


register("ann_ivf_search", ann_ivf_search, oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QID}),
ex AS (SELECT label, i AS pos, CAST(embedding[i + 1] AS DECIMAL(20,10)) AS v
       FROM embeddings, range(0, 64) t(i)),
cent_dims AS (SELECT label, pos, CAST(SUM(v) AS DOUBLE) / count(*) AS c
              FROM ex GROUP BY label, pos),
centroids AS (SELECT label, list(c ORDER BY pos) AS cvec
              FROM cent_dims GROUP BY label),
best AS (SELECT label,
         list_sum(list_transform(range(1, 65), i -> CAST(qv[i] AS DOUBLE) * cvec[i]))
         / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
          * sqrt(list_sum(list_transform(range(1, 65), i -> cvec[i] * cvec[i])))) AS cscore
         FROM centroids, q
         ORDER BY cscore DESC, label ASC LIMIT {NPROBE}),
d AS (SELECT e.vec_id AS doc_id, e.label, e.embedding AS dv
      FROM embeddings e WHERE e.label IN (SELECT label FROM best))
SELECT doc_id, label, {_COS} AS score_cosine
FROM d, q ORDER BY score_cosine DESC, doc_id ASC LIMIT 10
""")


def ann_lsh_bucket_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH ANN: 8-bit bucket from the sign pattern of the first 8 dimensions
    (a fixed random-hyperplane family degenerate to axis planes —
    deterministic, oracle-friendly); exact cosine top-5 inside the query's
    bucket only."""
    e = load_table(spark, sf_dir, "embeddings")
    bucket = F.expr(
        "aggregate(sequence(0, 7), 0, (acc, i) -> acc + "
        "IF(element_at(embedding, i + 1) >= CAST(0 AS FLOAT), "
        "shiftleft(1, i), 0))")
    eb = e.select(F.col("vec_id").alias("doc_id"),
                  F.col("embedding").alias("dvec"), bucket.alias("bucket"))
    q = (eb.where(F.col("doc_id") == QID)
         .select(F.col("dvec").alias("qvec"), F.col("bucket").alias("qbucket")))
    return (eb.join(F.broadcast(q), eb.bucket == q.qbucket)
            .select("doc_id", "bucket", cosine("qvec", "dvec").alias("score_cosine"))
            .orderBy(F.desc("score_cosine"), F.asc("doc_id"))
            .limit(5))


register("ann_lsh_bucket_search", ann_lsh_bucket_search, oracle=f"""
WITH b AS (SELECT vec_id AS doc_id, embedding,
                  CAST(list_sum(list_transform(range(0, 8), i ->
                       CASE WHEN embedding[i + 1] >= 0 THEN 1 << i ELSE 0 END))
                       AS INTEGER) AS bucket
           FROM embeddings),
q AS (SELECT embedding AS qv, bucket AS qbucket FROM b WHERE doc_id = {QID}),
d AS (SELECT doc_id, bucket, embedding AS dv FROM b)
SELECT doc_id, bucket, {_COS} AS score_cosine
FROM d, q WHERE bucket = qbucket
ORDER BY score_cosine DESC, doc_id ASC LIMIT 5
""")


def _bucketed_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings -> (doc_id, dvec, b0, b1, b2): three independent 8-bit
    sign buckets over dimension groups 0-7, 8-15, 16-23 (a fixed
    random-hyperplane family degenerate to axis planes — deterministic,
    oracle-friendly)."""
    e = load_table(spark, sf_dir, "embeddings")

    def bucket(lo: int):
        return F.expr(
            f"aggregate(sequence(0, 7), 0, (acc, i) -> acc + "
            f"IF(element_at(embedding, {lo} + i + 1) >= CAST(0 AS FLOAT), "
            f"shiftleft(1, i), 0))")

    return e.select(F.col("vec_id").alias("doc_id"),
                    F.col("embedding").alias("dvec"),
                    *[bucket(8 * t).alias(f"b{t}") for t in range(3)])


def _multitable_candidates(eb: DataFrame, q: DataFrame) -> DataFrame:
    """(table, bucket) equi-join form of the multi-table OR-match: both
    sides unpivot their bucket columns to (table, bucket) rows and meet in
    a broadcast HASH join on the composite key — the OR-of-equalities form
    plans as BroadcastNestedLoopJoin (a full scan per query batch), which
    defeats bucket pruning exactly when batching matters.  dropDuplicates
    keeps one candidate per (qid, doc_id): a doc matching in two tables is
    still one candidate (the shuffle carries only candidate rows)."""
    eb_long = eb.select(
        "doc_id", "dvec",
        F.posexplode(F.array("b0", "b1", "b2")).alias("tbl", "bucket"))
    q_long = q.select(
        "qid", "qvec",
        F.posexplode(F.array("qb0", "qb1", "qb2")).alias("qtbl", "qbucket"))
    return (eb_long.join(
        F.broadcast(q_long),
        (eb_long["tbl"] == q_long["qtbl"])
        & (eb_long["bucket"] == q_long["qbucket"]))
        .dropDuplicates(["qid", "doc_id"]))


def ann_lsh_multitable_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table LSH: candidates = union of the query's bucket in EACH of
    3 tables (the standard recall-boosting construction — one table's miss
    is another's hit).  Exact cosine re-ranks the deduped union."""
    eb = _bucketed_embeddings(spark, sf_dir)
    q = (eb.where(F.col("doc_id") == QID)
         .select(F.lit(0).alias("qid"), F.col("dvec").alias("qvec"),
                 *[F.col(f"b{t}").alias(f"qb{t}") for t in range(3)]))
    cand = _multitable_candidates(eb, q)
    return (cand.select("doc_id", cosine("qvec", "dvec").alias("score_cosine"))
            .orderBy(F.desc("score_cosine"), F.asc("doc_id"))
            .limit(10))


_DUCK_BKT = ("CAST(list_sum(list_transform(range(0, 8), i -> "
             "CASE WHEN embedding[{lo} + i + 1] >= 0 THEN 1 << i ELSE 0 END)) "
             "AS INTEGER)")

register("ann_lsh_multitable_search", ann_lsh_multitable_search, oracle=f"""
WITH b AS (SELECT vec_id AS doc_id, embedding,
                  {_DUCK_BKT.format(lo=0)} AS b0,
                  {_DUCK_BKT.format(lo=8)} AS b1,
                  {_DUCK_BKT.format(lo=16)} AS b2
           FROM embeddings),
q AS (SELECT embedding AS qv, b0 AS qb0, b1 AS qb1, b2 AS qb2
      FROM b WHERE doc_id = {QID}),
d AS (SELECT doc_id, b0, b1, b2, embedding AS dv FROM b)
SELECT doc_id, {_COS} AS score_cosine
FROM d, q WHERE b0 = qb0 OR b1 = qb1 OR b2 = qb2
ORDER BY score_cosine DESC, doc_id ASC LIMIT 10
""")

BATCH_QIDS = [0, 1, 2, 3]


def ann_lsh_multitable_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched multi-table LSH: N queries resolve their candidates in ONE
    (table, bucket) broadcast hash join over ONE scan of the bucketed
    embeddings — the scale path the single-query OR-form could not take
    (BroadcastNestedLoopJoin re-scans everything per query batch).
    Per-query exact-cosine top-10, ordered (qid, score desc, doc_id)."""
    from pyspark.sql import Window

    eb = _bucketed_embeddings(spark, sf_dir)
    q = (eb.where(F.col("doc_id").isin(BATCH_QIDS))
         .select(F.col("doc_id").alias("qid"), F.col("dvec").alias("qvec"),
                 *[F.col(f"b{t}").alias(f"qb{t}") for t in range(3)]))
    scored = (_multitable_candidates(eb, q)
              .select("qid", "doc_id",
                      cosine("qvec", "dvec").alias("score_cosine")))
    w = Window.partitionBy("qid").orderBy(F.desc("score_cosine"),
                                          F.asc("doc_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 10).drop("rn")
            .orderBy("qid", F.desc("score_cosine"), F.asc("doc_id")))


register("ann_lsh_multitable_batch", ann_lsh_multitable_batch, oracle=f"""
WITH b AS (SELECT vec_id AS doc_id, embedding,
                  {_DUCK_BKT.format(lo=0)} AS b0,
                  {_DUCK_BKT.format(lo=8)} AS b1,
                  {_DUCK_BKT.format(lo=16)} AS b2
           FROM embeddings),
q AS (SELECT doc_id AS qid, embedding AS qv, b0 AS qb0, b1 AS qb1, b2 AS qb2
      FROM b WHERE doc_id IN ({", ".join(map(str, BATCH_QIDS))})),
d AS (SELECT doc_id, b0, b1, b2, embedding AS dv FROM b),
scored AS (SELECT DISTINCT qid, doc_id, {_COS} AS score_cosine
           FROM d, q WHERE b0 = qb0 OR b1 = qb1 OR b2 = qb2),
ranked AS (SELECT qid, doc_id, score_cosine,
                  row_number() OVER (PARTITION BY qid
                      ORDER BY score_cosine DESC, doc_id ASC) AS rn
           FROM scored)
SELECT qid, doc_id, score_cosine FROM ranked WHERE rn <= 10
ORDER BY qid, score_cosine DESC, doc_id ASC
""")


# -- product quantization (4-bit codes + ADC + exact rerank) -----------------

def ann_pq_adc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/pq.py): train 8x64 sub-codebooks
    on a deterministic sample, encode the corpus to 8-byte codes (32x
    smaller than float32), ADC-shortlist 100 by pure-expression lookup-table
    sums, exact-cosine rerank, top-10.  Output pins the EXACT side (count +
    id checksum, hash-strong) plus invariants of the PQ side: recall@10
    against exact >= 0.7 (measured 0.9-1.0 per fixture) and the 32x code
    compression as an exact fact."""
    from binaryvectordb_spark.operators.pq import (
        pq_encode,
        pq_search,
        train_pq,
    )
    e = load_table(spark, sf_dir, "embeddings")
    qvec = (e.where(F.col("vec_id") == QID)
            .select("embedding").first()["embedding"])
    books = train_pq(e, DIM)
    approx = pq_search(pq_encode(e, books), e, qvec, books,
                       k=10, shortlist_k=100)
    d = e.select("vec_id", F.col("embedding").alias("dvec"))
    qdf = (e.where(F.col("vec_id") == QID)
           .select(F.col("embedding").alias("qvec")))
    exact = (d.join(F.broadcast(qdf))
             .select("vec_id", cosine("qvec", "dvec").alias("s"))
             .orderBy(F.desc("s"), F.asc("vec_id")).limit(10))
    ap = approx.select(F.col("vec_id").alias("a_id"))
    g = (exact.join(F.broadcast(ap), exact.vec_id == ap.a_id, "left")
         .agg(F.count("*").alias("k_exact"),
              F.sum("vec_id").alias("exact_id_sum"),
              F.count("a_id").alias("n_hit")))
    return g.select(
        "k_exact", "exact_id_sum",
        (F.col("n_hit") >= 7).alias("recall_ge_07"),
        F.lit(256 // 8).cast("int").alias("compression_x"))


register("ann_pq_adc_search", ann_pq_adc_search, oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QID}),
d AS (SELECT vec_id, embedding AS dv FROM embeddings),
ex AS (SELECT vec_id, {_COS} AS s
       FROM d, q ORDER BY s DESC, vec_id ASC LIMIT 10)
SELECT CAST(count(*) AS BIGINT) AS k_exact,
       CAST(sum(vec_id) AS BIGINT) AS exact_id_sum,
       TRUE AS recall_ge_07,
       CAST(32 AS INT) AS compression_x
FROM ex
""")

# -- IVF + PQ composition (the faiss-IVFPQ shape, re-expressed) --------------

IVFPQ_SHORTLIST = 50


def ann_ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: the two scale levers composed the way faiss's IVFPQ does —
    the IVF probe prunes WHICH rows are read (at 100 TB the code table is
    partitioned by cluster, so the probe opens nprobe/n_clusters of the
    files — the layout db.py:596 already uses), and PQ prunes HOW MUCH is
    read per row (8-byte codes vs 256-byte floats, 32x).  Pipeline: exact
    decimal centroids per label -> top-NPROBE clusters by query cosine ->
    PQ-encode only the probed rows -> ADC shortlist on codes -> exact-cosine
    rerank of the shortlist.  Output pins the deterministic facts: the
    exact in-probe top-10 (count + id checksum, hash-strong), the probed
    row count and corpus size (the I/O-pruning fraction as data, not a
    claim), recall@10 of the full composition vs the in-probe exact
    baseline >= 0.7 (measured 1.0 at every fixture: within a few hundred
    probed rows a 50-deep shortlist at ksub=64 recovers the exact set),
    and the 32x code compression.

    Reference parity: BinaryVectorDB/BinaryVectorDB.py:200-252 is a flat
    two-tier cascade; IVF-PQ is the standard scale-out of the same
    prune-then-rescore idea (coarse quantizer = IVF probe, fine = PQ/ADC,
    exact tier = rerank)."""
    from binaryvectordb_spark.operators.pq import (
        adc_score_expr,
        pq_encode,
        train_pq,
    )
    e = load_table(spark, sf_dir, "embeddings")
    qvec = (e.where(F.col("vec_id") == QID)
            .select("embedding").first()["embedding"])
    qdf = (e.where(F.col("vec_id") == QID)
           .select(F.col("embedding").alias("qvec")))

    best = (exact_label_centroids(e).join(F.broadcast(qdf))
            .select("label", cosine("qvec", "cvec").alias("cscore"))
            .orderBy(F.desc("cscore"), F.asc("label"))
            .limit(NPROBE))
    probed = e.join(F.broadcast(best.select("label")), "label")

    # fine quantizer: codebooks train on a corpus-wide deterministic sample
    # (cluster-independent — faiss trains PQ on the full training set too);
    # only the PROBED rows are encoded and ADC-scored
    books = train_pq(e, DIM)
    codes = pq_encode(probed, books)
    shortlist = (codes
                 .select("pq_id",
                         adc_score_expr(qvec, books).alias("score_adc"))
                 .orderBy(F.desc("score_adc"), F.asc("pq_id"))
                 .limit(IVFPQ_SHORTLIST))
    approx = (F.broadcast(shortlist)
              .join(probed.select(F.col("vec_id").alias("pq_id"),
                                  F.col("embedding").alias("dvec")), "pq_id")
              .join(F.broadcast(qdf))
              .select("pq_id", cosine("qvec", "dvec").alias("s"))
              .orderBy(F.desc("s"), F.asc("pq_id")).limit(10))

    exact = (probed.join(F.broadcast(qdf))
             .select("vec_id", cosine("qvec", "embedding").alias("s"))
             .orderBy(F.desc("s"), F.asc("vec_id")).limit(10))
    ap = approx.select(F.col("pq_id").alias("a_id"))
    g = (exact.join(F.broadcast(ap), exact.vec_id == ap.a_id, "left")
         .agg(F.count("*").alias("k_exact"),
              F.sum("vec_id").alias("exact_id_sum"),
              F.count("a_id").alias("n_hit")))
    return (g.join(probed.agg(F.count("*").alias("probed_rows")))
            .join(e.agg(F.count("*").alias("total_rows")))
            .select("k_exact", "exact_id_sum",
                    (F.col("n_hit") >= 7).alias("recall_ge_07"),
                    "probed_rows", "total_rows",
                    F.lit(256 // 8).cast("int").alias("compression_x")))


register("ann_ivfpq_search", ann_ivfpq_search, oracle=f"""
WITH {DUCK_CENTROIDS.strip()},
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QID}),
best AS (SELECT label,
         list_sum(list_transform(range(1, 65), i -> CAST(qv[i] AS DOUBLE) * cvec[i]))
         / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
          * sqrt(list_sum(list_transform(range(1, 65), i -> cvec[i] * cvec[i])))) AS cscore
         FROM cent, q
         ORDER BY cscore DESC, label ASC LIMIT {NPROBE}),
probed AS (SELECT e.vec_id, e.embedding AS dv FROM embeddings e
           WHERE e.label IN (SELECT label FROM best)),
ex10 AS (SELECT vec_id, {_COS} AS s FROM probed d, q
         ORDER BY s DESC, vec_id ASC LIMIT 10)
SELECT CAST(count(*) AS BIGINT) AS k_exact,
       CAST(sum(vec_id) AS BIGINT) AS exact_id_sum,
       TRUE AS recall_ge_07,
       (SELECT count(*) FROM probed) AS probed_rows,
       (SELECT count(*) FROM embeddings) AS total_rows,
       CAST(32 AS INT) AS compression_x
FROM ex10
""")
