"""Z-order layout (operators/zorder.py): the physical skipping effect.

Writes the events fixture twice — z-ordered on (user_id, value-bucket) and
linearly sorted on event_id (insertion order, the naive layout) — then
measures, from real parquet footer min/max stats, the fraction of row-group
bytes a stats-aware reader must touch for a 2-D range predicate.  Also pins
that both layouts return identical query results (layout never changes
answers) and that single-column skipping still works."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from binaryvectordb_spark.operators.zorder import (
    equidepth_scale,
    interleave_expr,
    rowgroup_scan_fraction,
    scale_expr,
    write_zordered,
)
from binaryvectordb_spark.sources.tables import load_table
from tests.conftest import SF_CORRECT

N_FILES = 16


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    e = load_table(spark, SF_CORRECT, "events").select(
        "event_id", "user_id", "event_type", "value",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("vb"))
    row = e.agg(F.min("user_id"), F.max("user_id"),
                F.min("vb"), F.max("vb")).first()
    ux, uy, vx, vy = row
    # equi-depth rank bins on both dims (vb is skewed: median ~3500 of a
    # ~49000 range — min-max scaling measurably kills its skipping)
    ex = e.withColumn("_xr", equidepth_scale(e, "user_id", bits=8)) \
          .withColumn("_yr", equidepth_scale(e, "vb", bits=8))
    zexpr = F.expr(interleave_expr("_xr", "_yr", bits=8, dialect="spark"))
    zpath, lpath = str(base / "z"), str(base / "linear")
    zdf = ex.withColumn("_z", zexpr).drop("_xr", "_yr")
    write_zordered(zdf, zpath, F.col("_z"), N_FILES)
    (e.repartitionByRange(N_FILES, "event_id")
     .sortWithinPartitions("event_id")
     .write.mode("overwrite").parquet(lpath))
    # selective ranges in DATA terms (vb is skewed, so a value-space slice
    # is not a data-space slice): ~12.5% of rows each
    vlo, vhi = e.approxQuantile("vb", [0.75, 0.875], 0.001)
    return zpath, lpath, (ux, uy, vx, vy), (int(vlo), int(vhi))


def test_zorder_skips_2d_predicate(layouts):
    """A narrow 2-D predicate must touch far fewer row-group bytes under
    z-order than under insertion order (which cannot skip on either
    attribute)."""
    zpath, lpath, (ux, uy, vx, vy), (vlo, vhi) = layouts
    pred = {"user_id": (ux, ux + (uy - ux) // 8),
            "vb": (vlo, vhi)}
    zf = rowgroup_scan_fraction(zpath, pred)
    lf = rowgroup_scan_fraction(lpath, pred)
    assert lf > 0.9, lf  # the naive layout reads ~everything
    assert zf < 0.5, zf  # z-order prunes most row groups
    assert zf < lf / 2


def test_zorder_skips_each_single_column(layouts):
    """Unlike a single-column sort, z-order skips on BOTH attributes."""
    zpath, _, (ux, uy, vx, vy), (vlo, vhi) = layouts
    f_user = rowgroup_scan_fraction(
        zpath, {"user_id": (ux, ux + (uy - ux) // 8)})
    f_vb = rowgroup_scan_fraction(zpath, {"vb": (vlo, vhi)})
    assert f_user < 0.8, f_user
    assert f_vb < 0.8, f_vb


def test_layout_never_changes_answers(spark, layouts):
    """The same aggregation over both layouts is bit-identical — layout is
    a physical property only."""
    zpath, lpath, _, _ = layouts
    def agg(path):
        return (spark.read.parquet(path)
                .where((F.col("user_id") < 40) & (F.col("vb") < 20000))
                .groupBy("event_type")
                .agg(F.count("*").alias("n"),
                     F.sum("user_id").alias("s"))
                .orderBy("event_type").collect())
    assert agg(zpath) == agg(lpath)


def test_pushdown_reaches_zordered_scan(spark, layouts):
    """Spark's parquet filter pushdown must see the range predicate on the
    z-ordered files — that is the mechanism that turns footer stats into
    skipped I/O at scan time."""
    from binaryvectordb_spark.plans import formatted_plan
    zpath, _, _, _ = layouts
    df = (spark.read.parquet(zpath)
          .where((F.col("user_id") >= 3) & (F.col("user_id") <= 9)
                 & (F.col("vb") <= 5000)))
    plan = formatted_plan(df)
    assert "PushedFilters:" in plan
    assert "GreaterThanOrEqual(user_id" in plan
    assert "LessThanOrEqual(vb" in plan
