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


def test_right_and_full_outer_match_plain_join(spark):
    """right/full outer decompose into salted-inner + null-padded unmatched
    rows of each side; results must equal the plain join exactly, including
    the null padding and rows whose key exists on only one side."""
    big = spark.range(30_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 40)
        .alias("k"), F.col("id").alias("payload"))
    # keys 0..59: 40..59 exist only on the small side (unmatched small);
    # big's non-hot keys cover 0..39 so some match, and key 7 is hot
    small = spark.range(60).select(F.col("id").alias("k"),
                                   (F.col("id") * 100).alias("dim_val"))
    for how in ("right", "full", "full_outer", "outer"):
        plain = big.join(small, "k", how)
        salted = salted_join(big, small, "k", n_salts=8, how=how)
        assert sorted(salted.columns) == sorted(plain.columns), how
        key = lambda df: sorted(  # noqa: E731
            (tuple((None if v is None else v) for v in r))
            for r in df.select("k", "payload", "dim_val").collect())
        assert key(salted) == key(plain), how


def test_unsupported_how_rejected(spark):
    import pytest
    big = spark.range(10).select(F.col("id").alias("k"))
    small = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="does not support"):
        salted_join(big, small, "k", how="cross")
