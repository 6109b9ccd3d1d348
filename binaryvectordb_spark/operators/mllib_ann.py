"""MLlib-backed batch index build + approximate similarity (the
"MLlib + DataFrame" half of the engine's approach): KMeans-trained IVF
partitioning, BucketedRandomProjectionLSH over float embeddings, and
MinHashLSH over token sets.

These complement the hand-rolled, oracle-exact operators in
queries/similarity.py and queries/dedup.py: MLlib models are deterministic
only per (seed, partitioning), not SQL-reproducible, so the driver checks
them rows-only while tests/test_mllib_ops.py pins quality (recall against
the exact brute-force / exact-Jaccard results) with fixed seeds.

Scale notes (100 TB): this is exactly the batch-index-build shape that fits
Spark — KMeans training samples/aggregates map-side and broadcasts k
centroids; cluster assignment is one narrow pass; writing the corpus
partitioned by cluster id gives partition-pruned IVF probes at serve time.
LSH signature computation is a narrow projection; approxSimilarityJoin is
an explode-on-hash-band + equi-join + distance filter — no cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEED = 42


def _with_vector(df: DataFrame, arr_col: str, out_col: str = "features") -> DataFrame:
    from pyspark.ml.functions import array_to_vector
    return df.withColumn(out_col, array_to_vector(F.col(arr_col).cast("array<double>")))


def ivf_kmeans_build(emb_df: DataFrame, n_clusters: int = 10,
                     id_col: str = "vec_id", emb_col: str = "embedding",
                     seed: int = SEED, max_iter: int = 10):
    """Train KMeans centroids and assign every vector to its partition.

    Returns (assignments DataFrame with ``cluster`` column, centers list).
    At scale, persist the assignments partitioned BY ``cluster`` so probes
    prune partitions.
    """
    from pyspark.ml.clustering import KMeans

    vecs = _with_vector(emb_df, emb_col)
    model = (KMeans(k=n_clusters, seed=seed, maxIter=max_iter,
                    featuresCol="features", predictionCol="cluster")
             .fit(vecs))
    assigned = model.transform(vecs).drop("features")
    return assigned, [c.tolist() for c in model.clusterCenters()]


def ivf_kmeans_search(emb_df: DataFrame, query_vec, k: int = 10,
                      n_clusters: int = 10, nprobe: int = 2,
                      id_col: str = "vec_id", emb_col: str = "embedding",
                      seed: int = SEED, prebuilt=None) -> DataFrame:
    """IVF probe: rank trained centroids by cosine to the query, brute-force
    exact cosine inside the ``nprobe`` nearest clusters only.

    Pass ``prebuilt=(assigned, centers)`` from ``ivf_kmeans_build`` to
    serve many queries from one training pass (training per query is the
    convenience fallback, not the serving path)."""
    import numpy as np

    from binaryvectordb_spark.functions.vector import cosine

    assigned, centers = prebuilt if prebuilt is not None else ivf_kmeans_build(
        emb_df, n_clusters, id_col=id_col, emb_col=emb_col, seed=seed)
    q = np.asarray(query_vec, dtype=np.float64)
    c = np.asarray(centers, dtype=np.float64)
    sims = (c @ q) / (np.linalg.norm(c, axis=1) * np.linalg.norm(q) + 1e-30)
    probe = [int(i) for i in np.argsort(-sims)[:nprobe]]

    spark = emb_df.sparkSession
    qdf = spark.createDataFrame([(list(map(float, query_vec)),)],
                                "qvec: array<float>")
    return (assigned.where(F.col("cluster").isin(probe))
            .join(F.broadcast(qdf))
            .select(F.col(id_col).alias("doc_id"), "cluster",
                    cosine("qvec", emb_col).alias("score_cosine"))
            .orderBy(F.desc("score_cosine"), F.asc("doc_id"))
            .limit(k))


def brp_lsh_similarity_join(emb_df: DataFrame, threshold: float,
                            bucket_length: float = 2.0, num_tables: int = 3,
                            id_col: str = "vec_id", emb_col: str = "embedding",
                            seed: int = SEED) -> DataFrame:
    """BucketedRandomProjectionLSH self-join: pairs within euclidean
    ``threshold``, id_a < id_b.  The join is hash-bucket equi-join pruned,
    never a cross product."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH

    vecs = _with_vector(emb_df.select(id_col, emb_col), emb_col)
    lsh = BucketedRandomProjectionLSH(inputCol="features", outputCol="hashes",
                                      bucketLength=bucket_length,
                                      numHashTables=num_tables, seed=seed)
    model = lsh.fit(vecs)
    pairs = model.approxSimilarityJoin(vecs, vecs, threshold, distCol="dist")
    return (pairs.select(F.col(f"datasetA.{id_col}").alias("id_a"),
                         F.col(f"datasetB.{id_col}").alias("id_b"),
                         F.col("dist"))
            .where(F.col("id_a") < F.col("id_b")))


def minhash_lsh_dedup_pairs(docs_df: DataFrame, threshold: float = 0.6,
                            num_tables: int = 5, n_features: int = 1 << 18,
                            id_col: str = "doc_id", text_col: str = "text",
                            seed: int = SEED) -> DataFrame:
    """MinHashLSH near-dup candidate pairs over token sets: tokenize ->
    binary HashingTF -> MinHashLSH approxSimilarityJoin at Jaccard-distance
    ``threshold``; id_a < id_b."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    toks = docs_df.select(id_col, F.split(F.col(text_col), " ").alias("tokens"))
    tf = HashingTF(inputCol="tokens", outputCol="features",
                   numFeatures=n_features, binary=True)
    feats = tf.transform(toks)
    # MinHashLSH requires at least one non-zero feature
    feats = feats.where(F.size("tokens") > 0)
    mh = MinHashLSH(inputCol="features", outputCol="hashes",
                    numHashTables=num_tables, seed=seed)
    model = mh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, threshold,
                                       distCol="jaccard_dist")
    return (pairs.select(F.col(f"datasetA.{id_col}").alias("id_a"),
                         F.col(f"datasetB.{id_col}").alias("id_b"),
                         F.col("jaccard_dist"))
            .where(F.col("id_a") < F.col("id_b")))
