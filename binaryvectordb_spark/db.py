"""Parquet-backed BinaryVectorDB with the reference's API and error semantics.

Maps the reference's stores (BinaryVectorDB/BinaryVectorDB.py):
  faiss index.bin (:58-62)   -> <folder>/index/    parquet (doc_id, vec ARRAY<BIGINT>)
  RocksDB docs dir (:64)     -> <folder>/documents parquet (doc_id, doc, emb_int8)
  config.json (:42-53)       -> <folder>/_meta.json {version, model, dim}

Mutation is delete-then-insert upsert exactly as :93-101, implemented as an
anti-join + union + atomic directory swap (the reference's full-index rewrite
per delete, :165-166, is batched away — SURVEY §2.10).  No external embedding
API: a deterministic local embedder stands in for the Cohere call (:109), and
pre-embedded input takes the `_add_batch` path (:117-143).

Error semantics mirrored (SURVEY §2.13): non-empty folder without config
(:43-45), len mismatch (:78-79), non-int ids (:95-96), docs2text non-str
(:88-89), delete of missing id (:159-160), search on empty index (:190-191).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from collections.abc import Callable, Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binaryvectordb_spark.functions.vector import int8_quantize, pack_bits
from binaryvectordb_spark.operators.cascade import (
    DEFAULT_BINARY_OVERSAMPLE,
    DEFAULT_INT8_OVERSAMPLE,
    DEFAULT_K,
    cascade_search,
)

_META = "_meta.json"


def local_embedder(texts: Sequence[str], dim: int) -> np.ndarray:
    """Deterministic stand-in for the external embedding API
    (BinaryVectorDB/BinaryVectorDB.py:109).  Bag-of-words of seeded token
    vectors, L2-normalized — stable across processes, no network."""
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for r, t in enumerate(texts):
        acc = np.zeros(dim, dtype=np.float64)
        for tok in str(t).lower().split():
            seed = int.from_bytes(hashlib.md5(tok.encode()).digest()[:4], "big")
            rng = np.random.RandomState(seed)
            acc += rng.uniform(-1.0, 1.0, dim)
        n = np.linalg.norm(acc)
        out[r] = (acc / n if n > 0 else acc).astype(np.float32)
    return out


class BinaryVectorDB:
    def __init__(self, spark: SparkSession, folder: str,
                 model: str = "local-bow-v1", dim: int = 64,
                 embed_fn: Callable[[Sequence[str]], np.ndarray] | None = None):
        self.spark = spark
        self.folder = folder
        self.dim = dim
        # _custom_embed_fn must be picklable for the distributed ingest path;
        # the default (None) is rebuilt executor-side from local_embedder+dim
        self._custom_embed_fn = embed_fn
        self.embed_fn = embed_fn or (lambda texts: local_embedder(texts, self.dim))
        meta_path = os.path.join(folder, _META)
        os.makedirs(folder, exist_ok=True)
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            self.dim = int(meta["dim"])
            self.model = meta["model"]
        elif os.listdir(folder):
            # mirrors :43-45 — refuse a non-empty folder without config
            raise Exception(
                f"Folder {folder} has files but no {_META}; not a BinaryVectorDB")
        else:
            self.model = model
            with open(meta_path, "w") as f:
                json.dump({"version": "1.0", "model": model, "dim": dim}, f)

    # -- storage ------------------------------------------------------------
    def _path(self, name: str) -> str:
        return os.path.join(self.folder, name)

    def _exists(self, name: str) -> bool:
        return os.path.isdir(self._path(name))

    def index_df(self) -> DataFrame | None:
        return (self.spark.read.parquet(self._path("index"))
                if self._exists("index") else None)

    def docs_df(self) -> DataFrame | None:
        return (self.spark.read.parquet(self._path("documents"))
                if self._exists("documents") else None)

    def _swap_write(self, df: DataFrame, name: str) -> None:
        """Atomic-ish overwrite: write to tmp dir, then swap.  Needed because
        Parquet can't overwrite a path while a plan is reading it; on Delta
        this would be a MERGE/DELETE transaction instead (SURVEY §1.3)."""
        tmp, final = self._path(name + "__tmp"), self._path(name)
        df.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        # EAGER cache invalidation: Spark's cache manager matches by logical
        # plan, so even a fresh read of this path would silently serve stale
        # cached blocks after the swap.  refreshByPath drops every cache
        # entry touching this path — including ones held by OTHER
        # BinaryVectorDB instances on the same folder in this session (the
        # reference has no multi-process story at all, README.md:174).
        self.spark.catalog.refreshByPath(final)

    # -- mutation (reference "DML", §2.10) ----------------------------------
    def add_documents(self, doc_ids: Sequence[int], docs: Sequence,
                      docs2text: Callable | None = None) -> None:
        """Bulk upsert = delete-then-insert (:93-101) via anti-join + union."""
        if len(doc_ids) != len(docs):
            raise ValueError("doc_ids and docs must have the same length")  # :78-79
        for i in doc_ids:
            if not isinstance(i, (int, np.integer)) or isinstance(i, bool):
                raise ValueError(f"doc_id {i!r} is not an int")  # :95-96
        docs2text = docs2text or (lambda d: d if isinstance(d, str) else json.dumps(d))
        texts = []
        for d in docs:
            t = docs2text(d)
            if not isinstance(t, str):
                raise ValueError("docs2text must return str")  # :88-89
            texts.append(t)
        emb = self.embed_fn(texts)
        self._upsert(list(doc_ids),
                     [d if isinstance(d, str) else json.dumps(d) for d in docs],
                     emb)

    def add_batch(self, doc_ids: Sequence[int], docs: Sequence[str],
                  embeddings: np.ndarray) -> None:
        """Pre-embedded bulk upsert — the `_add_batch` path (:117-143)."""
        if not (len(doc_ids) == len(docs) == len(embeddings)):
            raise ValueError("length mismatch")  # :134-136
        if len(doc_ids) == 0:
            return  # empty micro-batches are legitimate no-ops
        ids = np.asarray(doc_ids)
        if not np.issubdtype(ids.dtype, np.integer):
            raise ValueError("doc_ids dtype must be integer")  # :131-132
        self._upsert([int(i) for i in doc_ids], list(docs),
                     np.asarray(embeddings, dtype=np.float32))

    def _merge_and_swap(self, new_index: DataFrame, new_docs: DataFrame,
                        keys: DataFrame) -> None:
        """Delete-then-insert merge (:93-101) + atomic swap of both tiers —
        the single upsert implementation shared by every ingest path."""
        old_index, old_docs = self.index_df(), self.docs_df()
        if old_index is not None:
            new_index = (old_index.join(F.broadcast(keys), "doc_id", "left_anti")
                         .unionByName(new_index))
            new_docs = (old_docs.join(F.broadcast(keys), "doc_id", "left_anti")
                        .unionByName(new_docs))
        self._swap_write(new_index, "index")
        self._swap_write(new_docs, "documents")

    def _upsert(self, doc_ids: list[int], docs: list[str], emb: np.ndarray) -> None:
        emb = np.asarray(emb)
        if emb.ndim != 2 or emb.shape[1] != self.dim:
            raise ValueError(
                f"embeddings shape {emb.shape} does not match dim={self.dim}")
        rows = [(int(i), str(d), [float(x) for x in e])
                for i, d, e in zip(doc_ids, docs, emb)]
        new = self.spark.createDataFrame(
            rows, "doc_id: long, doc: string, embedding: array<float>")
        new_index = new.select("doc_id", pack_bits("embedding", self.dim).alias("vec"))
        new_docs = new.select("doc_id", "doc",
                              int8_quantize("embedding").alias("emb_int8"))
        self._merge_and_swap(new_index, new_docs, new.select("doc_id"))

    def add_documents_df(self, docs_df, id_col: str = "doc_id",
                         text_col: str = "text") -> None:
        """Distributed bulk upsert: embedding runs executor-side via
        mapInPandas (operators/embed.py) — the ingest path for corpora that
        don't fit through the driver (the list-based add_documents embeds
        driver-side, faithful to the reference's single-process loop)."""
        from binaryvectordb_spark.operators.embed import embed_texts
        embedded = embed_texts(
            docs_df.select(F.col(id_col).alias("doc_id"),
                           F.col(text_col).alias("text")),
            self.dim, embed_fn=self._custom_embed_fn)
        new_index = embedded.select(
            "doc_id", pack_bits("embedding", self.dim).alias("vec"))
        new_docs = embedded.select(
            "doc_id", F.col("text").alias("doc"),
            int8_quantize("embedding").alias("emb_int8"))
        self._merge_and_swap(new_index, new_docs, embedded.select("doc_id"))

    def remove_docs(self, doc_ids: Sequence[int]) -> None:
        """Batched delete (reference deletes one id + full rewrite, :155-166;
        batching amortizes the rewrite)."""
        idx = self.index_df()
        if idx is None:
            raise ValueError("empty DB")
        keys = self.spark.createDataFrame([(int(i),) for i in doc_ids],
                                          "doc_id: long")
        missing = keys.join(idx, "doc_id", "left_anti").count()
        if missing:
            raise ValueError(f"{missing} doc_id(s) not in index")  # :159-160
        self._swap_write(idx.join(F.broadcast(keys), "doc_id", "left_anti"), "index")
        self._swap_write(
            self.docs_df().join(F.broadcast(keys), "doc_id", "left_anti"),
            "documents")

    def remove_doc(self, doc_id: int) -> None:
        self.remove_docs([doc_id])

    def save(self) -> None:
        """API parity with :168-172 — every mutation already persisted."""

    def compact(self, target_partitions: int | None = None) -> None:
        """Small-file compaction: every micro-batch upsert adds files; at
        scale the doc store degrades into millions of tiny parquet files
        (the classic streaming-sink pathology — the reference's full-index
        rewrite per save, :165-172, is the same cost paid EVERY time).
        Rewrites both tiers into ``target_partitions`` files (default:
        spark.sql.shuffle.partitions).  On Delta this would be OPTIMIZE."""
        n = target_partitions or int(
            self.spark.conf.get("spark.sql.shuffle.partitions"))
        idx, docs = self.index_df(), self.docs_df()
        if idx is not None:
            self._swap_write(idx.repartition(n, "doc_id"), "index")
        if docs is not None:
            self._swap_write(docs.repartition(n, "doc_id"), "documents")

    def __len__(self) -> int:
        idx = self.index_df()
        return 0 if idx is None else idx.count()

    # -- search (§2.5) ------------------------------------------------------
    def _cached_index(self) -> DataFrame | None:
        """RAM tier: the packed binary index is cached on first search
        (README.md:68 'binary embeddings are loaded in memory').

        No DataFrame handle is held across calls — a held plan snapshots the
        file listing and throws FileNotFound after another instance swaps the
        directory.  Re-reading per search costs only a plan lookup: Spark's
        cache manager dedupes equivalent parquet-scan plans, and
        _swap_write's refreshByPath is the single invalidation point."""
        idx = self.index_df()
        if idx is None:
            return None
        idx.cache()  # no-op when an equivalent plan is already cached
        return idx

    def search(self, query: str | Sequence[float], k: int = DEFAULT_K,
               binary_oversample: int = DEFAULT_BINARY_OVERSAMPLE,
               int8_oversample: int = DEFAULT_INT8_OVERSAMPLE) -> list[dict]:
        # emptiness probe, not a full count() job per query (:190-191)
        idx = self.index_df()
        if idx is None or not idx.take(1):
            raise Exception("Index is empty; add documents first")
        if isinstance(query, str):
            qvec = self.embed_fn([query])[0]
        else:
            qvec = np.asarray(query, dtype=np.float32)
        hits_df = cascade_search(self._cached_index(), self.docs_df(), self.dim,
                                 query_vec=qvec.tolist(), k=k,
                                 binary_oversample=binary_oversample,
                                 int8_oversample=int8_oversample)
        return [r.asDict() for r in hits_df.collect()]

    def search_batch(self, queries: Sequence[str | Sequence[float]],
                     k: int = DEFAULT_K,
                     binary_oversample: int = DEFAULT_BINARY_OVERSAMPLE,
                     int8_oversample: int = DEFAULT_INT8_OVERSAMPLE
                     ) -> list[list[dict]]:
        """Batched serving: N queries against the cascade in ONE job
        (operators/cascade.py cascade_search_batch — the index is scanned
        once for the whole batch; per-query latency amortizes ~10x vs
        looping single searches).  Returns hits per query, in input order."""
        from binaryvectordb_spark.operators.cascade import cascade_search_batch

        if len(queries) == 0:
            return []
        idx = self.index_df()
        if idx is None or not idx.take(1):
            raise Exception("Index is empty; add documents first")
        texts = [q for q in queries if isinstance(q, str)]
        embedded = iter(self.embed_fn(texts)) if texts else iter(())
        # normalize BEFORE the shape check: a custom embed_fn may return
        # plain lists, not ndarrays
        vecs = [np.asarray(next(embedded) if isinstance(q, str) else q,
                           dtype=np.float32) for q in queries]
        for v in vecs:
            if v.shape != (self.dim,):
                raise ValueError(
                    f"query vector shape {v.shape} does not match dim={self.dim}")
        qdf = self.spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "qid: long, qvec: array<float>")
        rows = cascade_search_batch(self._cached_index(), self.docs_df(),
                                    self.dim, qdf, k=k,
                                    binary_oversample=binary_oversample,
                                    int8_oversample=int8_oversample).collect()
        out: list[list[dict]] = [[] for _ in queries]
        for r in rows:
            d = r.asDict()
            out[d.pop("qid")].append(d)
        return out
