"""MLlib-backed query surface (rows-only driver checks — MLlib models are
seed-deterministic but not SQL-reproducible, so there is no DuckDB oracle;
quality is pinned by tests/test_mllib_ops.py recall assertions against the
exact operators)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binaryvectordb_spark.operators.mllib_ann import (
    brp_lsh_similarity_join,
    ivf_kmeans_search,
    minhash_lsh_dedup_pairs,
)
from binaryvectordb_spark.queries import register
from binaryvectordb_spark.sources.tables import load_table


def ann_ivf_kmeans_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMeans-trained IVF (no label column needed — the MLlib batch index
    build path); probes the 2 nearest of 10 trained centroids."""
    e = load_table(spark, sf_dir, "embeddings")
    qvec = (e.where(F.col("vec_id") == 0)
            .select("embedding").first()["embedding"])
    return ivf_kmeans_search(e, qvec, k=10, n_clusters=10, nprobe=2)


register("ann_ivf_kmeans_search", ann_ivf_kmeans_search)  # rows-only


def similarity_join_brp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BucketedRandomProjectionLSH self-join on the embedding column:
    count + closest-pair stats (the pair list itself is order-stable only
    per seed)."""
    e = load_table(spark, sf_dir, "embeddings")
    pairs = brp_lsh_similarity_join(e, threshold=3.0)
    return pairs.agg(F.count("*").alias("n_pairs"),
                     F.min("dist").alias("min_dist"))


register("similarity_join_brp_lsh", similarity_join_brp_lsh)  # rows-only


def dedup_minhash_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHashLSH near-dup candidates over token sets (MLlib path of
    dedup_minhash_pairs); summary stats per jaccard band."""
    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_dedup_pairs(d, threshold=0.8)
    band = (F.when(F.col("jaccard_dist") <= 0.2, "dup")
            .when(F.col("jaccard_dist") <= 0.5, "near")
            .otherwise("far"))
    return (pairs.select(band.alias("band"))
            .groupBy("band").agg(F.count("*").alias("n")))


register("dedup_minhash_mllib", dedup_minhash_mllib)  # rows-only
