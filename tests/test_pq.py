"""Product quantization (operators/pq.py): training determinism, encode
batch-shape independence, ADC-expression exactness vs the numpy LUT, the
recall floor the registered invariant relies on, and the code-width switch."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from binaryvectordb_spark.functions.vector import cosine
from binaryvectordb_spark.operators.pq import (
    adc_score_expr,
    pq_encode,
    pq_search,
    train_pq,
)
from binaryvectordb_spark.sources.tables import load_table
from tests.conftest import SF_CORRECT

SF_BIG = "/root/testdata/sf0.1"
DIM = 64


def _emb(spark, sf=SF_CORRECT):
    return load_table(spark, sf, "embeddings")


def test_train_is_deterministic(spark):
    e = _emb(spark)
    b1 = train_pq(e, DIM)
    b2 = train_pq(e, DIM)
    assert b1.shape == (8, 64, 8)
    np.testing.assert_array_equal(b1, b2)


def test_encode_independent_of_partitioning(spark):
    """Codes must be identical whether the corpus is encoded in 1 partition
    or 16 — the kernel may see any batch slicing at scale."""
    e = _emb(spark)
    books = train_pq(e, DIM)
    one = {r["pq_id"]: list(r["pq_code"])
           for r in pq_encode(e.coalesce(1), books).collect()}
    many = {r["pq_id"]: list(r["pq_code"])
            for r in pq_encode(e.repartition(16), books).collect()}
    assert one == many and len(one) == e.count()


def test_adc_expression_matches_numpy_lut(spark):
    """The inlined element_at LUT sum must equal the numpy ADC score
    bit-for-bit (both are fixed left-to-right folds of the same doubles)."""
    e = _emb(spark)
    books = train_pq(e, DIM)
    qvec = e.where(F.col("vec_id") == 0).first()["embedding"]
    codes = pq_encode(e, books)
    got = {r["pq_id"]: r["s"] for r in
           codes.select("pq_id", adc_score_expr(qvec, books).alias("s"))
           .collect()}
    q = np.asarray(qvec, float)
    q = q / np.linalg.norm(q)
    luts = np.einsum("md,mkd->mk", q.reshape(8, 8), books)
    raw = {r["pq_id"]: list(r["pq_code"]) for r in codes.collect()}
    for pid, code in raw.items():
        expect = 0.0
        for s, c in enumerate(code):
            expect += luts[s][c]  # same left-to-right fold as the SQL expr
        assert got[pid] == expect, pid


def test_recall_floor_at_bench_scale(spark):
    """The registered invariant claims recall@10 >= 0.7; pin it at the
    LARGEST fixture (2000 vectors, the hardest case measured: 0.9)."""
    e = _emb(spark, SF_BIG)
    qvec = e.where(F.col("vec_id") == 0).first()["embedding"]
    books = train_pq(e, DIM)
    ap = pq_search(pq_encode(e, books), e, qvec, books, k=10)
    ids = {r["vec_id"] for r in ap.collect()}
    d = (e.select("vec_id", F.col("embedding").alias("dvec"))
         .withColumn("qvec", F.array(*[F.lit(float(v)) for v in qvec])))
    exact = {r["vec_id"] for r in
             d.select("vec_id", cosine("qvec", "dvec").alias("s"))
             .orderBy(F.desc("s"), F.asc("vec_id")).limit(10).collect()}
    assert len(ids & exact) >= 7


def test_wide_codebook_uses_two_byte_codes(spark):
    """ksub > 128 cannot fit a signed byte — codes switch to SMALLINT and
    round-trip values >= 128 unwrapped."""
    e = _emb(spark)
    books = train_pq(e, DIM, ksub=256)
    codes = pq_encode(e, books)
    assert dict(codes.dtypes)["pq_code"] == "array<smallint>"
    mx = codes.select(F.array_max("pq_code").alias("m")).agg(
        F.max("m")).first()[0]
    assert 128 <= mx <= 255


def test_pq_topk_plan_is_topk_plus_broadcast(spark):
    from binaryvectordb_spark.plans import formatted_plan
    e = _emb(spark)
    books = train_pq(e, DIM)
    plan = formatted_plan(
        pq_search(pq_encode(e, books), e,
                  e.where(F.col("vec_id") == 0).first()["embedding"], books))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
