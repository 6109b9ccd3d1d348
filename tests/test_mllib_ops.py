"""Quality gates for the MLlib-backed operators (rows-only in the driver
gate, so recall/behavior is pinned HERE against the exact operators)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from binaryvectordb_spark.operators.mllib_ann import (
    brp_lsh_similarity_join,
    ivf_kmeans_search,
    minhash_lsh_dedup_pairs,
)
from binaryvectordb_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = load_table(spark, SF, "embeddings").cache()
    yield df
    # unpersist: a cached fixture-table plan would otherwise substitute
    # InMemoryTableScan into every later suite's identical scan (Spark's
    # cache manager matches by logical plan), changing their plan shapes
    df.unpersist()


def _brute_force_topk(spark, emb, qvec, k=10):
    from binaryvectordb_spark.functions.vector import cosine
    q = spark.createDataFrame([(list(map(float, qvec)),)], "qvec: array<float>")
    return (emb.join(F.broadcast(q))
            .select(F.col("vec_id").alias("doc_id"),
                    cosine("qvec", "embedding").alias("s"))
            .orderBy(F.desc("s"), F.asc("doc_id")).limit(k))


def test_ivf_kmeans_recall(spark, emb):
    """Recall@10 vs exact brute force: the fixture embeddings are
    near-uniform (top-10 cosine ~0.3), so true neighbors scatter across
    cells — expect partial recall at nprobe=2 and near-total at nprobe=4,
    and recall must not decrease with more probes."""
    qvec = emb.where(F.col("vec_id") == 0).first()["embedding"]
    exact = {r.doc_id for r in _brute_force_topk(spark, emb, qvec).collect()}

    def recall(nprobe):
        approx = {r.doc_id
                  for r in ivf_kmeans_search(emb, qvec, k=10, n_clusters=10,
                                             nprobe=nprobe).collect()}
        assert len(approx) == 10
        return len(exact & approx) / 10

    r2, r4 = recall(2), recall(4)
    assert r2 >= 0.5, f"recall@10 nprobe=2 {r2}"
    assert r4 >= 0.9, f"recall@10 nprobe=4 {r4}"
    assert r4 >= r2


def test_ivf_kmeans_deterministic_per_seed(spark, emb):
    qvec = emb.where(F.col("vec_id") == 0).first()["embedding"]
    a = ivf_kmeans_search(emb, qvec, k=5, seed=7).collect()
    b = ivf_kmeans_search(emb, qvec, k=5, seed=7).collect()
    assert a == b


def test_brp_lsh_pairs_subset_of_threshold(spark, emb):
    """Every reported pair must genuinely be within the distance threshold
    (LSH may MISS pairs, never fabricate them), and ids are canonical."""
    pairs = brp_lsh_similarity_join(emb, threshold=3.0).collect()
    assert all(r.id_a < r.id_b for r in pairs)
    assert all(r.dist <= 3.0 for r in pairs)
    assert len(pairs) > 0


def test_minhash_lsh_finds_exact_duplicates(spark):
    """Planted exact duplicates must surface as ~zero-distance pairs."""
    d = load_table(spark, SF, "documents").limit(50)
    dup = d.where(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang",
        "source", "n_chars")
    corpus = d.unionByName(dup)
    pairs = minhash_lsh_dedup_pairs(corpus, threshold=0.5).collect()
    planted = [r for r in pairs if r.id_a == 0 and r.id_b == 100000]
    assert planted and planted[0].jaccard_dist == 0.0


def test_ivf_partitioned_layout_prunes(spark, emb, tmp_path):
    """The IVF scale path end-to-end: persist vectors partitioned BY the
    KMeans cluster id, then probe 2 clusters — the scan must show partition
    pruning (PartitionFilters) so 8 of 10 partitions are never read."""
    from binaryvectordb_spark.operators.mllib_ann import ivf_kmeans_build
    from binaryvectordb_spark.plans import formatted_plan

    assigned, _ = ivf_kmeans_build(emb, n_clusters=10)
    out = str(tmp_path / "ivf_store")
    assigned.write.partitionBy("cluster").mode("overwrite").parquet(out)

    store = spark.read.parquet(out)
    probe = store.where(F.col("cluster").isin(3, 7))
    plan = formatted_plan(probe)
    assert "PartitionFilters" in plan and "cluster" in plan
    got_clusters = {r.cluster for r in probe.select("cluster").distinct().collect()}
    assert got_clusters <= {3, 7}
