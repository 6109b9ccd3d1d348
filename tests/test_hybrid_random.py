"""Randomized cross-engine robustness for the hybrid-retrieval oracles:
the BM25 floored-bigint score units and the RRF single-add fusion must
hash-match DuckDB on corpora the fixtures never saw — random doc lengths,
term frequencies, df skew, and embeddings, three seeds.  This is the
determinism claim (queries/hybrid.py) under adversarial inputs, not just
the shipped fixtures."""

from __future__ import annotations

import os

import numpy as np
import pytest

import duckdb

from binaryvectordb_spark.queries import ORACLES, QUERIES
from tests.oracle_harness import compare

VOCAB = ["vector", "window", "merge", "table", "scan", "row", "agg",
         "join", "sort", "batch"]


def _make_fixture_dir(tmp_path, seed: int, n_docs: int = 60,
                      dim: int = 64) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(seed)
    d = tmp_path / f"rand_{seed}"
    d.mkdir()
    texts = []
    for i in range(n_docs):
        n_tok = int(rng.randint(1, 40))
        # skew token draws so df varies wildly between seeds
        probs = rng.dirichlet(np.ones(len(VOCAB)) * 0.4)
        texts.append(" ".join(rng.choice(VOCAB, size=n_tok, p=probs)))
    docs = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n_docs),
        "source": pa.array([f"src{i % 3}" for i in range(n_docs)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(docs, d / "documents.parquet")
    emb = rng.uniform(-1, 1, (n_docs, dim)).astype(np.float32)
    embeddings = pa.table({
        "vec_id": pa.array(range(n_docs), pa.int64()),
        "embedding": pa.array([list(map(float, e)) for e in emb],
                              pa.list_(pa.float32())),
        "label": pa.array([i % 4 for i in range(n_docs)], pa.int64()),
    })
    pq.write_table(embeddings, d / "embeddings.parquet")
    return str(d)


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_hybrid_queries_cross_engine_on_random_corpora(spark, tmp_path, seed):
    sf_dir = _make_fixture_dir(tmp_path, seed)
    # register only the two tables this corpus ships (duck_con would try
    # to bind views for every fixture table)
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    try:
        for name in ("search_bm25_topk", "search_hybrid_rrf",
                     "search_rerank_overlap"):
            compare(QUERIES[name](spark, sf_dir), ORACLES[name], con,
                    f"{name}[seed={seed}]")
    finally:
        con.close()
