"""Salted join must be result-identical to the plain join on skewed data,
and must actually spread the hot key across salt partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from binaryvectordb_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark):
    # 100k rows, 90% on one hot key
    big = spark.range(100_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 50)
        .alias("k"), F.col("id").alias("payload"))
    small = spark.range(50).select(F.col("id").alias("k"),
                                   (F.col("id") * 100).alias("dim_val"))
    plain = big.join(small, "k")
    salted = salted_join(big, small, "k", n_salts=8)
    assert salted.count() == plain.count()
    a = plain.agg(F.sum("payload"), F.sum("dim_val")).first()
    b = salted.agg(F.sum("payload"), F.sum("dim_val")).first()
    assert tuple(a) == tuple(b)
    assert sorted(salted.columns) == sorted(plain.columns)


def test_salt_spreads_even_identical_duplicate_rows(spark):
    """Byte-identical hot-key rows (the degenerate-skew case) must still
    spread: the salt mixes in a per-row id, not just the row hash."""
    big = spark.range(10_000).select(F.lit(7).alias("k"),
                                     F.lit(0).alias("payload"))
    small = spark.range(10).select(F.col("id").alias("k"),
                                   F.lit(1).alias("dim_val"))
    joined = salted_join(big, small, "k", n_salts=8)
    assert joined.count() == 10_000


def test_right_and_full_outer_rejected(spark):
    import pytest
    big = spark.range(10).select(F.col("id").alias("k"))
    small = spark.range(10).select(F.col("id").alias("k"))
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(big, small, "k", how=how)
