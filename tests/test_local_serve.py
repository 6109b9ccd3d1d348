"""LocalCascadeSearcher must be BIT-IDENTICAL to the distributed cascade —
same doc ids, same order, same float64 scores — across random corpora,
tie-heavy corpora, and typed payloads.  It is a serving tier, not a second
implementation of the semantics: any drift here is a bug."""

from __future__ import annotations

import numpy as np
import pytest

from binaryvectordb_spark.db import BinaryVectorDB, local_embedder

DIM = 32


@pytest.fixture()
def db(spark, tmp_path):
    return BinaryVectorDB(spark, str(tmp_path / "db"), dim=DIM)


def test_local_matches_distributed_exactly(db):
    rng = np.random.RandomState(7)
    n = 300
    emb = rng.uniform(-1, 1, (n, DIM)).astype(np.float32)
    db.add_batch(list(range(n)), [f"doc {i}" for i in range(n)], emb)
    local = db.to_local_searcher()
    queries = [emb[3], emb[150], rng.uniform(-1, 1, DIM).astype(np.float32),
               "doc 42"]
    for q in queries:
        assert local.search(q, k=10) == db.search(q, k=10)
    # non-default oversamples change every truncation point — still identical
    assert (local.search(emb[9], k=5, binary_oversample=3, int8_oversample=2)
            == db.search(emb[9], k=5, binary_oversample=3, int8_oversample=2))


def test_local_matches_on_ties(db):
    """Duplicate vectors force ties at every phase; tie-breaks (doc_id asc)
    must agree with the distributed plan."""
    base = local_embedder([f"t {i % 4}" for i in range(40)], DIM)
    db.add_batch(list(range(40)), [f"t {i % 4}" for i in range(40)], base)
    local = db.to_local_searcher()
    for qi in (0, 1, 2):
        assert local.search(base[qi], k=12) == db.search(base[qi], k=12)


def test_local_typed_payloads_and_errors(db):
    db.add_documents([1, 2], [{"k": 1}, "plain"],
                     docs2text=lambda d: "a" if isinstance(d, dict) else d)
    local = db.to_local_searcher()
    hits = {h["doc_id"]: h["doc"] for h in local.search("a", k=2)}
    assert hits[1] == {"k": 1} and hits[2] == "plain"
    with pytest.raises(ValueError, match="finite"):
        bad = np.zeros(DIM, dtype=np.float32)
        bad[0] = np.nan
        local.search(bad)
    with pytest.raises(ValueError, match="shape"):
        local.search(np.zeros(DIM + 1, dtype=np.float32))


def test_local_batch_matches(db):
    rng = np.random.RandomState(3)
    emb = rng.uniform(-1, 1, (60, DIM)).astype(np.float32)
    db.add_batch(list(range(60)), [f"d{i}" for i in range(60)], emb)
    local = db.to_local_searcher()
    qs = [emb[0], emb[5], "d7"]
    assert local.search_batch(qs, k=4) == db.search_batch(qs, k=4)
