"""IVF drift: upserts assign clusters against FROZEN centroids (db.py
_with_cluster), so churn degrades probe recall with no signal — unless
tracked.  Pins the churn counter math, the rebuild recommendation, the
auto-rebuild flag, and that build_ivf restores probe recall for a region
the original partitioner never saw (recall-floor pattern, as in
ann_ivf_kmeans_search — absolute floors, not exact values, because MLlib
KMeans results vary with partitioning).
"""

from __future__ import annotations

import pytest
import numpy as np

from binaryvectordb_spark.db import BinaryVectorDB

DIM = 8


def _blob(rng, center, n, spread=0.04):
    return np.clip(center + rng.normal(0, spread, (n, DIM)), -1, 1
                   ).astype("float32")


def _recall_at_k(db, queries, truth, k=10, nprobe=1):
    """Mean fraction of the brute-force top-k the probe recovers."""
    res = db.search_batch([q.tolist() for q in queries], k=k, nprobe=nprobe)
    got = [set(h["doc_id"] for h in hits) for hits in res]
    return float(np.mean([len(g & t) / len(t) for g, t in zip(got, truth)]))


def _brute_truth(all_ids, all_vecs, queries, k=10):
    """Exact cosine top-k over the full corpus, numpy."""
    v = all_vecs / np.maximum(np.linalg.norm(all_vecs, axis=1, keepdims=True),
                              1e-9)
    out = []
    for q in queries:
        qn = q / max(np.linalg.norm(q), 1e-9)
        s = v @ qn
        order = np.lexsort((all_ids, -s))
        out.append(set(int(all_ids[i]) for i in order[:k]))
    return out


@pytest.mark.slow
def test_drift_counter_recommendation_and_recall_restore(spark, tmp_path):
    rng = np.random.RandomState(11)
    # 4 tight, well-separated blobs -> 4 clean clusters
    centers = np.array([[0.8] * DIM, [-0.8] * DIM,
                        [0.8] * 4 + [-0.8] * 4, [-0.8] * 4 + [0.8] * 4])
    base = np.vstack([_blob(rng, c, 30) for c in centers])  # 120 docs
    db = BinaryVectorDB(spark, str(tmp_path / "db"), dim=DIM, buckets=4,
                        index_type="ivf",
                        index_args={"n_clusters": 4, "nprobe": 1,
                                    "drift_threshold": 0.25})
    db.add_batch(list(range(120)), [f"d{i}" for i in range(120)], base)
    d0 = db.ivf_drift()
    assert d0["mutated_rows"] == 0
    assert d0["n_rows"] == 120 and d0["n_clusters"] == 4
    assert not d0["rebuild_recommended"]

    # mutate 30%: 36 docs move to the MIDPOINT of two trained centroids
    # (equidistant, so the frozen assignment splits the new blob ~50/50
    # across the two old clusters on noise sign); after re-clustering the
    # region is its own clean blob — blob 0 moved wholesale, so the corpus
    # is again 4 well-separated blobs and k=4 re-fits them exactly
    new_center = np.array([0.8] * 4 + [0.0] * 4)
    moved = _blob(rng, new_center, 36, spread=0.08)
    moved_ids = list(range(36))
    db.add_batch(moved_ids, [f"m{i}" for i in moved_ids], moved)

    d1 = db.ivf_drift()
    assert d1["mutated_rows"] == 36
    assert d1["n_rows"] == 120
    assert d1["mutated_fraction"] == 36 / 120  # 0.3 >= threshold 0.25
    assert d1["rebuild_recommended"]

    # probe recall over the drifted region, before vs after re-clustering
    all_vecs = base.copy()
    all_vecs[:36] = moved
    all_ids = np.arange(120)
    queries = _blob(rng, new_center, 15, spread=0.08)
    truth = _brute_truth(all_ids, all_vecs, queries)
    before = _recall_at_k(db, queries, truth)
    db.build_ivf()
    after = _recall_at_k(db, queries, truth)
    assert after >= before - 1e-9, (before, after)
    assert after >= 0.9, (before, after)

    # rebuild reset the counter and stamped the build version
    d2 = db.ivf_drift()
    assert d2["mutated_rows"] == 0 and not d2["rebuild_recommended"]
    assert d2["built_at_version"] == db._manifest_version()


def test_auto_rebuild_flag(spark, tmp_path):
    rng = np.random.RandomState(5)
    base = np.vstack([_blob(rng, c, 20) for c in
                      (np.full(DIM, 0.7), np.full(DIM, -0.7))])  # 40 docs
    db = BinaryVectorDB(spark, str(tmp_path / "db"), dim=DIM, buckets=4,
                        index_type="ivf",
                        index_args={"n_clusters": 2, "nprobe": 1,
                                    "drift_threshold": 0.2,
                                    "auto_rebuild": True})
    db.add_batch(list(range(40)), [f"d{i}" for i in range(40)], base)
    # churn 25% >= threshold 20% -> the mutation itself triggers build_ivf,
    # which resets the counter
    db.add_batch(list(range(10)), [f"u{i}" for i in range(10)],
                 _blob(rng, np.zeros(DIM), 10))
    d = db.ivf_drift()
    assert d["mutated_rows"] == 0 and not d["rebuild_recommended"]

    # deletes count as churn too (flag off: recommendation only)
    db.index_args["auto_rebuild"] = False
    db.remove_docs(list(range(10)))
    assert db.ivf_drift()["mutated_rows"] == 10
