"""The three-phase quantized k-NN search cascade, Spark-first.

Reference semantics (BinaryVectorDB/BinaryVectorDB.py:200-252, README.md:125-162):

  Phase I   hamming k-NN over the binary index, ascending, top
            ``binary_k = min(k * binary_oversample, ntotal)``         (:204,:209-216)
  Phase II  rescore ALL Phase-I candidates with q_float · (2b-1),
            descending, truncate to ``k * int8_oversample``           (:218-232)
  Phase III fetch {doc, emb_int8} for survivors, score q·d/‖d‖
            (doc-side norm only), descending, truncate to k           (:234-250)

Spark mapping (SURVEY §3.1): the whole cascade is ONE logical plan —
  cached index scan -> hamming expr -> TakeOrderedAndProject(binary_k)
  -> rescore expr -> TakeOrderedAndProject(rescore_k)
  -> broadcast join against the documents table (candidates are tiny)
  -> cosine expr -> TakeOrderedAndProject(k).

Scale notes (100 TB): Phase I is an embarrassingly parallel scan + per-partition
partial top-k with a k-row-per-partition merge (TakeOrderedAndProject) — no full
shuffle.  Phases II/III touch <= k*oversample rows.  The documents join
broadcasts the candidate side, so the big documents table is never shuffled;
Parquet column pruning reads only (doc_id, doc, emb_int8).

Tie-breaking: the reference relies on Python's stable sort (:229,:247); we pin
ties explicitly with doc_id ascending so results are deterministic (SURVEY §7
risk 3).

Phase-I kernel choice (measured at 1M cached vectors, local[8]): the pure
expression scan runs 0.23s; an Arrow-batched numpy mapInPandas scan with a
popcount LUT runs 1.42s — Arrow serialization of JVM-cached data costs ~6x
more than the whole expression evaluation.  Expressions stay; pandas kernels
are reserved for logic expressions cannot express (multimodal decode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from binaryvectordb_spark.functions.vector import (
    NUM_LANES,
    binary_dot,
    hamming,
    int8_cosine,
    int8_quantize,
    pack_bits,
)

DEFAULT_K = 10
DEFAULT_BINARY_OVERSAMPLE = 10   # BinaryVectorDB/BinaryVectorDB.py:174
DEFAULT_INT8_OVERSAMPLE = 3      # BinaryVectorDB/BinaryVectorDB.py:174


def build_index(emb_df: DataFrame, dim: int,
                id_col: str = "vec_id", emb_col: str = "embedding") -> DataFrame:
    """embeddings -> index(doc_id, vec ARRAY<BIGINT>) — the RAM tier.

    1 bit/dim packed into int64 lanes = the reference's 32x compression
    (README.md:126-131).  Callers .cache() this (README.md:68 'binary
    embeddings are loaded in memory').
    """
    return emb_df.select(
        F.col(id_col).alias("doc_id"),
        pack_bits(emb_col, dim).alias("vec"),
    )


def build_doc_store(emb_df: DataFrame, docs_df: DataFrame | None = None,
                    id_col: str = "vec_id", emb_col: str = "embedding",
                    doc_id_col: str = "doc_id", doc_col: str = "text") -> DataFrame:
    """embeddings [+ documents] -> documents(doc_id, doc, emb_int8) — disk tier.

    Mirrors the RocksDB value shape {'doc':…, 'emb_int8':…}
    (BinaryVectorDB/BinaryVectorDB.py:153) as a columnar table.
    """
    store = emb_df.select(
        F.col(id_col).alias("doc_id"),
        int8_quantize(emb_col).alias("emb_int8"),
    )
    if docs_df is not None:
        payload = docs_df.select(F.col(doc_id_col).alias("doc_id"),
                                 F.col(doc_col).alias("doc"))
        store = store.join(payload, "doc_id", "left")
    else:
        store = store.withColumn("doc", F.lit(None).cast("string"))
    return store.select("doc_id", "doc", "emb_int8")


def _query_df(spark_source: DataFrame, query_vec, dim: int):
    """Build a 1-row broadcastable query DataFrame (qvec float, qbits packed).

    The vector is inlined as a literal array expression rather than shipped
    through createDataFrame: materializing a 1-row local relation costs
    ~0.2 s per call in Spark 4 (Arrow/py4j local-data conversion — measured
    as nearly HALF of db.search's per-query latency on a cached 1M index),
    while parsing a literal plan is sub-ms and yields the same plan shape.
    repr() round-trips every double exactly, so results are bit-identical."""
    import math
    spark = spark_source.sparkSession
    vals = []
    for x in query_vec:
        f = float(x)
        if not math.isfinite(f):
            raise ValueError("query vectors must be finite (got NaN/Inf)")
        vals.append(repr(f) + "D")
    q = spark.range(1).select(
        F.expr(f"array({','.join(vals)})").cast("array<float>").alias("qvec"))
    return q.select("qvec", pack_bits("qvec", dim).alias("qbits"))


def cascade_search(index_df: DataFrame, doc_df: DataFrame, dim: int,
                   query_vec=None, query_df: DataFrame | None = None,
                   k: int = DEFAULT_K,
                   binary_oversample: int = DEFAULT_BINARY_OVERSAMPLE,
                   int8_oversample: int = DEFAULT_INT8_OVERSAMPLE) -> DataFrame:
    """Single-query three-phase cascade; returns the final hits DataFrame
    ``(doc_id, score_hamming, score_binary, score_cossim, doc)`` ordered by
    score_cossim desc, doc_id asc (reference output shape :247-252).

    ``query_df`` must be a 1-row frame with a float-array column ``qvec``
    (and optionally precomputed ``qbits``); otherwise pass ``query_vec``.
    """
    if query_df is None:
        q = _query_df(index_df, query_vec, dim)
    else:
        q = query_df
        if "qbits" not in q.columns:
            q = q.select("qvec", pack_bits("qvec", dim).alias("qbits"))

    binary_k = k * binary_oversample       # LIMIT clamps to ntotal implicitly (:204)
    rescore_k = k * int8_oversample        # NOT ntotal-clamped, as in :230

    # Phase I — scored scan + top-k (TakeOrderedAndProject; no shuffle of the scan)
    p1 = (index_df.join(F.broadcast(q))
          .select("doc_id", "vec", "qvec",
                  hamming("qbits", "vec", NUM_LANES(dim)).alias("score_hamming"))
          .orderBy(F.asc("score_hamming"), F.asc("doc_id"))
          .limit(binary_k))

    # Phase II — rescore all Phase-I candidates (tiny), truncate
    p2 = (p1.select("doc_id", "qvec", "score_hamming",
                    binary_dot("qvec", "vec", dim).alias("score_binary"))
          .orderBy(F.desc("score_binary"), F.asc("doc_id"))
          .limit(rescore_k))

    # Phase III — broadcast candidates against the documents table (late
    # materialization: payload + int8 read only for survivors, :236-241).
    # doc_kind (typed-payload tag, db.py) rides along when the store has it.
    extra = [c for c in doc_df.columns if c == "doc_kind"]
    p3 = (F.broadcast(p2).join(doc_df, "doc_id")
          .select("doc_id", "score_hamming", "score_binary",
                  int8_cosine("qvec", "emb_int8").alias("score_cossim"),
                  "doc", *extra)
          .orderBy(F.desc("score_cossim"), F.asc("doc_id"))
          .limit(k))
    return p3


def cascade_search_filtered_adaptive(
        index_df: DataFrame, doc_df: DataFrame, dim: int,
        eligible: DataFrame, query_vec=None,
        query_df: DataFrame | None = None, k: int = DEFAULT_K,
        switch: float = 0.5, overfetch: int = 4,
        selectivity: float | None = None) -> DataFrame:
    """Filtered k-NN with a selectivity-adaptive strategy — the standard
    production-ANN planner choice the reference (filter-free, faiss-only)
    never needs but any metadata-filtered deployment does:

    - **prefilter** (selective predicate, sel <= ``switch``): semi-join the
      index against the eligible ids BEFORE Phase I, so every phase budget
      is spent on eligible docs only — exact filtered top-k, at the cost of
      touching the filter column for the whole corpus.
    - **postfilter** (broad predicate): run Phase I UNFILTERED with an
      ``overfetch``-inflated budget (binary_k * overfetch), drop ineligible
      survivors, then continue Phases II/III on the survivors.  Skips the
      corpus-wide semi-join; recall is bounded by the over-fetch (with a
      broad predicate the expected eligible count in the pool is
      overfetch * binary_k * sel >> binary_k).

    ``eligible`` is a (doc_id)-only DataFrame.  ``selectivity`` overrides
    the measured |eligible| / |index| ratio (two cheap count jobs) when the
    caller already knows it (e.g. from table stats at 100 TB).  The chosen
    strategy is returned as a literal ``strategy`` column so result
    consumers — and the cross-engine oracle — can assert the plan choice,
    not just the rows.
    """
    if selectivity is None:
        total = index_df.count()
        selectivity = (eligible.count() / total) if total else 0.0

    if selectivity <= switch:
        hits = cascade_search(
            index_df.join(eligible, "doc_id", "left_semi"), doc_df, dim,
            query_vec=query_vec, query_df=query_df, k=k)
        return hits.withColumn("strategy", F.lit("prefilter"))

    if query_df is None:
        q = _query_df(index_df, query_vec, dim)
    else:
        q = query_df
        if "qbits" not in q.columns:
            q = q.select("qvec", pack_bits("qvec", dim).alias("qbits"))
    binary_k = k * DEFAULT_BINARY_OVERSAMPLE * overfetch
    rescore_k = k * DEFAULT_INT8_OVERSAMPLE
    p1 = (index_df.join(F.broadcast(q))
          .select("doc_id", "vec", "qvec",
                  hamming("qbits", "vec", NUM_LANES(dim)).alias("score_hamming"))
          .orderBy(F.asc("score_hamming"), F.asc("doc_id"))
          .limit(binary_k))
    # Materialize the over-fetched pool's ids ONCE: Spark does not reuse
    # common subplans, so referencing p1 both to build the eligibility
    # probe and as the rescore input would execute the dominant corpus-wide
    # Phase-I scan twice per query.  The pool is <= binary_k rows, so the
    # id collect is a candidate-set collect (same class as the cascade's
    # other <= k-row collects).  The eligible filter is then a map-side
    # prune of the filter table (isin on the literal id list — no shuffle,
    # no broadcast exchange), and the surviving <= binary_k ids rebuild the
    # pool rows from a SECOND, id-pruned index read: the In-filter pushes
    # to the parquet scan (row-group stats + dictionary), so at scale this
    # re-read opens a handful of files, not the corpus.
    pool_ids = [r[0] for r in p1.select("doc_id").collect()]
    surv_ids = [r[0] for r in
                eligible.where(F.col("doc_id").isin(pool_ids))
                .select("doc_id").collect()] if pool_ids else []
    p1f = (index_df.where(F.col("doc_id").isin(surv_ids)
                          if surv_ids else F.lit(False))
           .join(F.broadcast(q))
           .select("doc_id", "vec", "qvec",
                   hamming("qbits", "vec", NUM_LANES(dim))
                   .alias("score_hamming")))
    p2 = (p1f.select("doc_id", "qvec", "score_hamming",
                     binary_dot("qvec", "vec", dim).alias("score_binary"))
          .orderBy(F.desc("score_binary"), F.asc("doc_id"))
          .limit(rescore_k))
    extra = [c for c in doc_df.columns if c == "doc_kind"]
    p3 = (F.broadcast(p2).join(doc_df, "doc_id")
          .select("doc_id", "score_hamming", "score_binary",
                  int8_cosine("qvec", "emb_int8").alias("score_cossim"),
                  "doc", *extra)
          .orderBy(F.desc("score_cossim"), F.asc("doc_id"))
          .limit(k))
    return p3.withColumn("strategy", F.lit("postfilter"))


def _phase1_arrow_topk(index_df: DataFrame, dim: int, queries_df: DataFrame,
                       binary_k: int) -> DataFrame:
    """One-pass batched Phase I+II scoring: an Arrow kernel computes, per
    index partition, the exact local top-``binary_k`` per query (SWAR
    popcount on the packed uint64 lanes) AND the Phase-II score
    ``q_float . (2b-1)`` for those survivors — so the big scan happens ONCE,
    only ~binary_k x n_queries slim rows per partition enter the global rank
    window, and no second index pass is needed to re-attach vectors.

    Selection inside a batch uses the composite key (score, doc_id-rank), so
    tie-breaking matches the global (score asc, doc_id asc) order exactly.
    score_binary is folded left-to-right over ascending dimension in float64
    — bit-identical to functions/vector.py binary_dot and to the DuckDB
    oracle (never a BLAS dot, whose pairwise fold would drift ULPs).

    Measured at 100 queries x 1M vectors, local[32]: the kernel scan runs
    3.3s vs 5.8s for the two-pass histogram-threshold expression plan this
    replaces (Arrow transfer of the cached index costs 0.66s of that).
    Queries are collected driver-side (a serving batch is small by
    construction) and broadcast to the kernel; for very large query batches
    shard and union (``cascade_search_batch_sharded``).
    """
    import numpy as np
    import pyarrow as pa

    qrows = (queries_df.select("qid", F.col("qvec").cast("array<float>"))
             .collect())
    out_schema = "qid bigint, doc_id bigint, score_hamming int, score_binary double"
    if not qrows:
        spark = index_df.sparkSession
        return spark.createDataFrame([], out_schema)
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float32)
    if qmat.ndim != 2 or qmat.shape[1] != dim:
        raise ValueError(
            f"query vectors shape {qmat.shape} does not match dim={dim}")
    if not np.isfinite(qmat).all():
        # NaN would quantize differently here (np sign test: NaN >= 0 is
        # False) vs the SQL packer (Spark orders NaN above all numerics, so
        # x >= 0 is true) — reject at the boundary instead of letting the
        # two Phase-I paths silently disagree
        raise ValueError("query vectors must be finite (got NaN/Inf)")
    bc = index_df.sparkSession.sparkContext.broadcast(
        (qids, qmat.astype(np.float64), binary_k, NUM_LANES(dim)))

    def _local_topk(d, ids, kk, nq, nbins):
        """Exact per-query top-kk row indices by (score asc, doc_id asc):
        a per-query score histogram (hamming has only dim+1 values) gives
        the cutoff score; ties AT the cutoff resolve by smallest doc_id.
        Row scans are single global nonzero passes — measured ~5x over
        argpartition on a (score, rank) composite key."""
        import numpy as np
        cum = (np.bincount(
            (d + (np.arange(nq, dtype=np.int32) * nbins)[:, None]).ravel(),
            minlength=nq * nbins).reshape(nq, nbins).cumsum(axis=1))
        cut = (cum >= kk).argmax(axis=1)
        below_mask = d < cut[:, None]
        n_below = below_mask.sum(axis=1)
        _, bcol = np.nonzero(below_mask)
        boffs = np.concatenate(([0], np.cumsum(n_below)))
        tr, tcol = np.nonzero(d == cut[:, None])
        n_tie = np.bincount(tr, minlength=nq)
        toffs = np.concatenate(([0], np.cumsum(n_tie)))
        sel_rows = []
        for i in range(nq):
            tie = tcol[toffs[i]:toffs[i + 1]]
            need = kk - n_below[i]
            if need < len(tie):
                tie = tie[np.argpartition(ids[tie], need - 1)[:need]]
            sel_rows.append(np.concatenate(
                (bcol[boffs[i]:boffs[i + 1]], tie)))
        return np.stack(sel_rows)                                  # (nq, kk)

    def kernel(batches):
        np_qids, np_qf, bk, lanes = bc.value
        nq = len(np_qids)
        dim_ = np_qf.shape[1]
        nbins = dim_ + 1
        # ±1 query matrix (float32): hamming(q, d) = (dim - qpm·dpm)/2, and
        # the GEMM sum of ±1 terms is integer-valued => EXACT in float32 up
        # to dim 2^24, independent of BLAS fold order.
        qpm = np.where(np_qf >= 0, np.float32(1), np.float32(-1))

        def merge(q1, d1, s1, v1, q2, d2, s2, v2):
            """Exact running top-bk merge of two candidate sets: order by
            (query, score, doc_id), keep the first min(bk, group) per query
            — bounds task memory at O(nq x bk) regardless of batch count."""
            qs = np.concatenate((q1, q2)); ds = np.concatenate((d1, d2))
            ss = np.concatenate((s1, s2)); vs = np.vstack((v1, v2))
            order = np.lexsort((ds, ss, qs))
            qs, ds, ss, vs = qs[order], ds[order], ss[order], vs[order]
            starts = np.searchsorted(qs, np.arange(nq))
            ends = np.searchsorted(qs, np.arange(nq), side="right")
            keep = np.concatenate([np.arange(s, min(s + bk, e))
                                   for s, e in zip(starts, ends)])
            return qs[keep], ds[keep], ss[keep], vs[keep]

        qs = np.empty(0, dtype=np.int32)
        ds = np.empty(0, dtype=np.int64)
        ss = np.empty(0, dtype=np.int32)
        vs = np.empty((0, lanes), dtype=np.uint64)

        for batch in batches:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            col = batch.column("vec")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            vec = (col.flatten().to_numpy(zero_copy_only=False)
                   .view(np.uint64).reshape(len(ids), lanes))
            b = len(ids)
            if b == 0:
                continue
            # unpack LSB-first lanes (little-endian platform => uint8 view
            # preserves dimension order) to a ±1 matrix, score via GEMM
            bits = np.unpackbits(vec.view(np.uint8), axis=1,
                                 bitorder="little")[:, :dim_]
            dpm = bits.astype(np.float32) * 2 - 1
            d = ((dim_ - qpm @ dpm.T) * 0.5).astype(np.int32)     # (nq, b)

            kk = min(bk, b)
            part = _local_topk(d, ids, kk, nq, nbins)
            flat = part.ravel()
            qs, ds, ss, vs = merge(
                qs, ds, ss, vs,
                np.repeat(np.arange(nq, dtype=np.int32), kk),
                ids[flat],
                np.take_along_axis(d, part, axis=1).ravel(),
                vec[flat])

        if len(qs) == 0:
            return

        # Phase-II score: signed contribution matrix (±q_d per set bit),
        # folded left-to-right over dimensions — the F-contiguous layout
        # makes each of the dim_ column adds a contiguous vector op while
        # preserving the EXACT sequential fold order of the SQL expression
        # and the DuckDB oracle
        sel_bits = np.unpackbits(vs.view(np.uint8), axis=1,
                                 bitorder="little")[:, :dim_]
        signed = np.asfortranarray(
            (sel_bits.astype(np.float64) * 2 - 1) * np_qf[qs])
        acc = np.zeros(len(qs), dtype=np.float64)
        for dd in range(dim_):
            acc += signed[:, dd]
        yield pa.record_batch(
            [pa.array(np_qids[qs]),
             pa.array(ds),
             pa.array(ss),
             pa.array(acc)],
            names=["qid", "doc_id", "score_hamming", "score_binary"])

    return index_df.select("doc_id", "vec").mapInArrow(kernel, out_schema)


def cascade_search_batch(index_df: DataFrame, doc_df: DataFrame, dim: int,
                         queries_df: DataFrame,
                         k: int = DEFAULT_K,
                         binary_oversample: int = DEFAULT_BINARY_OVERSAMPLE,
                         int8_oversample: int = DEFAULT_INT8_OVERSAMPLE,
                         phase1: str = "arrow") -> DataFrame:
    """Multi-query cascade: ``queries_df(qid, qvec array<float>)`` -> per-qid
    top-k hits.

    Phase-I strategy (``phase1``):
    - ``"arrow"`` (default): one-pass per-partition exact local top-k kernel
      (see ``_phase1_arrow_topk``) — the scan output is ~binary_k rows per
      (query, partition), so the only shuffle is the tiny rank window.
    - ``"histogram"``: pure-expression two-pass plan — a map-side-combined
      per-query score histogram (hamming has only dim+1 distinct values)
      yields the binary_k cutoff; a second pass filters to survivors.  Fully
      lazy/JVM-side, kept for environments where Python workers are
      undesirable.  (A direct window over the full scored scan shuffles
      #queries x index_size rows and both OOMed and ran 1000x slower at
      100 x 1M — measured.)

    Scale design: either way the exchange carries ONLY slim scored candidate
    rows, never vectors.  The arrow kernel also emits the Phase-II score, so
    the cached index is scanned exactly ONCE; the histogram path re-joins
    the <= binary_k survivors per query against the index for their vectors
    (broadcast).  For larger query batches, shard queries and union.
    """
    q = queries_df.select("qid", F.col("qvec").cast("array<float>").alias("qvec"))
    q = q.select("qid", "qvec", pack_bits("qvec", dim).alias("qbits"))

    binary_k = k * binary_oversample
    rescore_k = k * int8_oversample

    w1 = Window.partitionBy("qid").orderBy(F.asc("score_hamming"), F.asc("doc_id"))
    if phase1 == "arrow":
        local = _phase1_arrow_topk(index_df, dim, queries_df, binary_k)
        # score_binary came with the kernel output; Phase II is just the
        # rank window (it rescores ALL Phase-I candidates, :218-232)
        p2s = (local.withColumn("rn", F.row_number().over(w1))
               .where(F.col("rn") <= binary_k).drop("rn"))
    else:
        scored = (index_df.join(F.broadcast(q.select("qid", "qbits")))
                  .select("qid", "doc_id",
                          hamming("qbits", "vec", NUM_LANES(dim)).alias("score_hamming")))
        hist = scored.groupBy("qid", "score_hamming").agg(F.count("*").alias("c"))
        wq = (Window.partitionBy("qid").orderBy("score_hamming")
              .rowsBetween(Window.unboundedPreceding, 0))
        thr = (hist.withColumn("cum", F.sum("c").over(wq))
               .where(F.col("cum") - F.col("c") < binary_k)
               .groupBy("qid").agg(F.max("score_hamming").alias("thr")))
        survivors = (scored.join(F.broadcast(thr), "qid")
                     .where(F.col("score_hamming") <= F.col("thr")))
        p1 = (survivors.withColumn("rn", F.row_number().over(w1))
              .where(F.col("rn") <= binary_k).drop("rn", "thr"))
        # re-attach vectors only for the survivors (tiny side broadcast)
        p1v = (index_df.join(F.broadcast(p1), "doc_id")
               .join(F.broadcast(q.select("qid", "qvec")), "qid"))
        p2s = p1v.select("qid", "doc_id", "score_hamming",
                         binary_dot("qvec", "vec", dim).alias("score_binary"))

    w2 = Window.partitionBy("qid").orderBy(F.desc("score_binary"), F.asc("doc_id"))
    p2 = (p2s.withColumn("rn", F.row_number().over(w2))
          .where(F.col("rn") <= rescore_k).drop("rn")
          .join(F.broadcast(q.select("qid", "qvec")), "qid"))

    extra = [c for c in doc_df.columns if c == "doc_kind"]
    p3s = (F.broadcast(p2).join(doc_df, "doc_id")
           .select("qid", "doc_id", "score_hamming", "score_binary",
                   int8_cosine("qvec", "emb_int8").alias("score_cossim"), "doc",
                   *extra))
    w3 = Window.partitionBy("qid").orderBy(F.desc("score_cossim"), F.asc("doc_id"))
    return (p3s.withColumn("rn", F.row_number().over(w3))
            .where(F.col("rn") <= k).drop("rn")
            .orderBy("qid", F.desc("score_cossim"), F.asc("doc_id")))


def cascade_search_batch_sharded(index_df: DataFrame, doc_df: DataFrame,
                                 dim: int, queries_df: DataFrame,
                                 shard_size: int = 256,
                                 k: int = DEFAULT_K,
                                 binary_oversample: int = DEFAULT_BINARY_OVERSAMPLE,
                                 int8_oversample: int = DEFAULT_INT8_OVERSAMPLE
                                 ) -> DataFrame:
    """Serving batches beyond what one kernel broadcast should carry
    (kernel scoring memory is O(n_queries x arrow_batch_rows); the running
    candidate merge is O(n_queries x binary_k)): split the query set
    into shards of ``shard_size`` and union the per-shard cascades.  Each
    shard is one full index pass, so cost is linear in shard count — that
    is inherent to brute-force scoring; IVF/LSH pruning (operators/
    mllib_ann.py, queries/similarity.py) is the sub-linear path.

    Queries are collected once (they are collected per-shard by the kernel
    anyway); shard membership is by position, results are identical to the
    unsharded call for any shard_size.
    """
    qrows = queries_df.select("qid", "qvec").collect()
    spark = queries_df.sparkSession
    if not qrows:  # empty serving batch -> empty result, not a crash
        schema = ("qid bigint, doc_id bigint, score_hamming int, "
                  "score_binary double, score_cossim double, doc string")
        if "doc_kind" in doc_df.columns:
            schema += ", doc_kind string"
        return spark.createDataFrame([], schema)
    shards = [qrows[i:i + shard_size] for i in range(0, len(qrows), shard_size)]
    parts = []
    for shard in shards:
        qdf = spark.createDataFrame(
            [(r[0], [float(x) for x in r[1]]) for r in shard],
            "qid: long, qvec: array<float>")
        parts.append(cascade_search_batch(index_df, doc_df, dim, qdf, k=k,
                                          binary_oversample=binary_oversample,
                                          int8_oversample=int8_oversample))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # union row-order is undefined; re-impose the global serving order so
    # the result is identical (not just set-equal) to the unsharded call
    return out.orderBy("qid", F.desc("score_cossim"), F.asc("doc_id"))
