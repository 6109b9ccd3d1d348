"""MLlib-backed query surface, driver-checked via INVARIANT outputs.

MLlib models (KMeans, BucketedRandomProjectionLSH, MinHashLSH) are
seed-deterministic but not SQL-reproducible, so their raw outputs can't be
value-hashed against a DuckDB oracle.  Each query therefore returns
deterministic DERIVED values the oracle CAN recompute:

  * the exact-side answer (brute-force top-k id checksum, exact pair
    counts) — fully SQL-expressible, hash-strong;
  * soundness booleans (every reported distance within the threshold —
    guaranteed by approxSimilarityJoin's exact post-filter);
  * recall booleans with fat margins (measured 0.9-1.0 across fixtures;
    asserted >= 0.5-0.8), constant-TRUE in the oracle.

The models still run — the booleans are computed FROM their outputs, so a
broken fit/join flips a hash mismatch.  Fine-grained quality pins live in
tests/test_mllib_ops.py (recall against exact operators, fixed seeds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binaryvectordb_spark.functions.vector import cosine
from binaryvectordb_spark.operators.mllib_ann import (
    brp_lsh_similarity_join,
    ivf_kmeans_search,
    minhash_lsh_dedup_pairs,
)
from binaryvectordb_spark.queries import register
from binaryvectordb_spark.sources.tables import load_table

# SQL fragments imported from queries/vector.py's oracles (64-dim fold,
# ascending dimension, operands widened to DOUBLE — bit-identical engines);
# ONE definition so a future fold change cannot drift between modules
from binaryvectordb_spark.queries.vector import (  # noqa: E402
    _DNORM,
    _DOT,
    _QNORM,
)


def ann_ivf_kmeans_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMeans-trained IVF probe (nprobe=4 of 10 centroids) vs the exact
    brute-force top-10.  Output: the exact top-10's id checksum (hash-pins
    the exact side) + recall@10 >= 0.5 (measured 0.9-1.0 per fixture)."""
    e = load_table(spark, sf_dir, "embeddings")
    qvec = (e.where(F.col("vec_id") == 0)
            .select("embedding").first()["embedding"])
    approx = ivf_kmeans_search(e, qvec, k=10, n_clusters=10, nprobe=4)
    d = e.select(F.col("vec_id").alias("doc_id"),
                 F.col("embedding").alias("dvec"))
    qdf = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec"))
    exact = (d.join(F.broadcast(qdf))
             .select("doc_id", cosine("qvec", "dvec").alias("s"))
             .orderBy(F.desc("s"), F.asc("doc_id")).limit(10))
    ap = approx.select(F.col("doc_id").alias("a_id"))
    g = (exact.join(F.broadcast(ap), exact.doc_id == ap.a_id, "left")
         .agg(F.count("*").alias("k_exact"),
              F.sum("doc_id").alias("exact_id_sum"),
              F.count("a_id").alias("n_hit")))
    return g.select("k_exact", "exact_id_sum",
                    (F.col("n_hit") >= 5).alias("recall_ge_05"))


register("ann_ivf_kmeans_search", ann_ivf_kmeans_search, oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
d AS (SELECT vec_id AS doc_id, embedding AS dv FROM embeddings),
ex AS (SELECT doc_id,
              CASE WHEN {_QNORM} > 0 AND {_DNORM} > 0
                   THEN {_DOT} / ({_QNORM} * {_DNORM})
                   ELSE CAST(0 AS DOUBLE) END AS s
       FROM d, q ORDER BY s DESC, doc_id ASC LIMIT 10)
SELECT CAST(count(*) AS BIGINT) AS k_exact,
       CAST(sum(doc_id) AS BIGINT) AS exact_id_sum,
       TRUE AS recall_ge_05
FROM ex
""")


def similarity_join_brp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BucketedRandomProjectionLSH self-join at euclidean threshold 1.2
    (~1% densest pairs) vs the exact pair count.  Output: exact pair count
    (hash-strong), soundness (every LSH pair's true distance <= threshold —
    approxSimilarityJoin post-filters exactly), recall >= 0.8 (measured
    ~0.94 per fixture)."""
    e = load_table(spark, sf_dir, "embeddings")
    pairs = brp_lsh_similarity_join(e, threshold=1.2)
    lsh = pairs.agg(F.count("*").alias("n_lsh"),
                    F.max("dist").alias("max_dist"))
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    # r16 measured non-change: unrolling this fold to the flat
    # (x-y)*(x-y) sum was 2.5x WORSE (each term re-evaluates both
    # element_at calls twice — 256 array probes/row vs the HOF's one
    # zip_with materialization — and the 2M-pair join condition blows the
    # janino method budget, so the bigger expression runs interpreted
    # anyway).  The HOF form stays; see OPTIMIZATION_r16.md.
    sq = F.expr(
        "aggregate(zip_with(va, vb, (x, y) -> "
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
    exact = (a.join(b, F.col("id_a") < F.col("id_b"))
             .where(F.sqrt(sq) <= 1.2)
             .agg(F.count("*").alias("n_exact_pairs")))
    return (exact.join(F.broadcast(lsh))
            .select("n_exact_pairs",
                    F.coalesce(F.col("max_dist") <= 1.2, F.lit(True))
                    .alias("all_pairs_sound"),
                    (F.col("n_lsh") >= 0.8 * F.col("n_exact_pairs"))
                    .alias("recall_ge_08")))


register("similarity_join_brp_lsh", similarity_join_brp_lsh, oracle="""
WITH a AS (SELECT vec_id AS id_a, embedding AS va FROM embeddings),
b AS (SELECT vec_id AS id_b, embedding AS vb FROM embeddings)
SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
       TRUE AS all_pairs_sound, TRUE AS recall_ge_08
FROM a JOIN b ON id_a < id_b
WHERE sqrt(list_sum(list_transform(range(1, 65), i ->
      (CAST(va[i] AS DOUBLE) - CAST(vb[i] AS DOUBLE)) *
      (CAST(va[i] AS DOUBLE) - CAST(vb[i] AS DOUBLE))))) <= 1.2
""")


def dedup_minhash_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHashLSH near-dup join (Jaccard distance <= 0.8) vs the exact
    token-set Jaccard.  Output: exact count of near pairs (similarity >=
    0.5; the 500-doc corpus makes the exact quadratic join cheap on both
    engines), soundness (reported distances within threshold), recall of
    near pairs >= 0.8 (measured ~0.99 per fixture)."""
    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_dedup_pairs(d, threshold=0.8)
    lsh = pairs.agg(
        F.max("jaccard_dist").alias("max_dist"),
        F.sum(F.when(F.col("jaccard_dist") <= 0.5, 1).otherwise(0))
        .alias("n_lsh_near"))
    t = d.select("doc_id", F.array_distinct(F.split("text", " ")).alias("toks"))
    ta = t.select(F.col("doc_id").alias("id_a"), F.col("toks").alias("tka"))
    tb = t.select(F.col("doc_id").alias("id_b"), F.col("toks").alias("tkb"))
    jac = (F.size(F.array_intersect("tka", "tkb")).cast("double")
           / F.size(F.array_union("tka", "tkb")))
    exact = (ta.join(tb, F.col("id_a") < F.col("id_b"))
             .where(jac >= 0.5)
             .agg(F.count("*").alias("n_exact_near_pairs")))
    return (exact.join(F.broadcast(lsh))
            .select("n_exact_near_pairs",
                    F.coalesce(F.col("max_dist") <= 0.8, F.lit(True))
                    .alias("all_pairs_sound"),
                    (F.col("n_lsh_near") >= 0.8 * F.col("n_exact_near_pairs"))
                    .alias("recall_ge_08")))


register("dedup_minhash_mllib", dedup_minhash_mllib, oracle="""
WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
           FROM documents)
SELECT CAST(count(*) AS BIGINT) AS n_exact_near_pairs,
       TRUE AS all_pairs_sound, TRUE AS recall_ge_08
FROM t a JOIN t b ON a.doc_id < b.doc_id
WHERE CAST(length(list_intersect(a.toks, b.toks)) AS DOUBLE)
      / length(list_distinct(a.toks || b.toks)) >= 0.5
""")
