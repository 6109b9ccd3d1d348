"""Product quantization (PQ) over float embedding columns: train per-subspace
codebooks on a bounded driver sample, encode the corpus to m small codes in
one vectorized Arrow pass, and serve approximate top-k by asymmetric
distance computation (ADC) — a per-query lookup table folded as a pure JVM
expression — with an exact rescore of the shortlist (the standard
PQ-then-rerank cascade, same shape as the reference's binary->int8 cascade,
BinaryVectorDB/BinaryVectorDB.py:200-252, re-expressed at 4-bit resolution).

Compression: dim=64 float32 (256 B) -> m=8 codes of ksub<=256 (8 B, 32x;
4 bits packable at ksub=16 for 64x).  At 100 TB this is the difference
between an index that fits the cluster's RAM tier and one that doesn't.

Scale design:
- TRAINING touches only a bounded deterministic sample (ORDER BY id LIMIT n
  -> driver numpy Lloyd with fixed iterations and seeded init); codebooks
  are m*ksub*dsub floats — kilobytes — broadcast as plan literals.
- ENCODING is mapInArrow: one narrow vectorized pass, no shuffle, scales
  with executors.
- ADC SCORING is shuffle-free JVM expression work: the query's m x ksub
  lookup table is inlined as literal arrays, the score is a FIXED
  left-to-right sum of m element_at() terms (deterministic IEEE fold), and
  top-k plans as TakeOrderedAndProject.  The exact rescore touches only the
  <= shortlist_k candidates (broadcast semi-join by id).

Determinism: seeded rng init, fixed iteration count, argmin lowest-index
tie-break, and batch-shape-independent kernels (verified by tests) make
codebooks and codes reproducible across runs and partitionings.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_M = 8
DEFAULT_KSUB = 64
TRAIN_SAMPLE = 2048
TRAIN_ITERS = 15
SEED = 7


def _normalize(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return x / n


def train_pq(emb_df: DataFrame, dim: int, m: int = DEFAULT_M,
             ksub: int = DEFAULT_KSUB, id_col: str = "vec_id",
             emb_col: str = "embedding", sample: int = TRAIN_SAMPLE,
             iters: int = TRAIN_ITERS, seed: int = SEED) -> np.ndarray:
    """Lloyd k-means per subspace on a deterministic sample; returns
    codebooks of shape (m, ksub, dim // m) float64.  Vectors are
    L2-normalized first so ADC inner products approximate cosine ranking."""
    assert dim % m == 0, f"dim {dim} not divisible into {m} subspaces"
    dsub = dim // m
    rows = (emb_df.select(id_col, emb_col).orderBy(id_col).limit(sample)
            .collect())
    x = _normalize(np.array([r[1] for r in rows], dtype=np.float64))
    xs = x.reshape(len(rows), m, dsub)
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub))
    for s in range(m):
        pts = xs[:, s, :]
        init_idx = rng.choice(len(pts), size=min(ksub, len(pts)),
                              replace=False)
        cb = pts[np.sort(init_idx)].copy()
        if len(cb) < ksub:  # degenerate tiny sample: pad by repetition
            cb = np.resize(cb, (ksub, dsub))
        for _ in range(iters):
            d2 = ((pts[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)  # lowest index wins ties
            for c in range(ksub):
                mask = assign == c
                if mask.any():
                    cb[c] = pts[mask].mean(0)
        books[s] = cb
    return books


def pq_encode(emb_df: DataFrame, codebooks: np.ndarray,
              id_col: str = "vec_id", emb_col: str = "embedding") -> DataFrame:
    """Encode every vector to its m nearest-subcentroid codes.  One
    vectorized mapInArrow pass; output (id, pq_code ARRAY<TINYINT>).

    Input embeddings are assumed float32-sourced (the fixture/storage
    convention of this repo): the Arrow transfer casts to array<float>,
    which is LOSSLESS for such inputs.  A caller shipping true
    array<double> data (more than 24 significand bits used) gets a
    float32-narrowed view, which can flip argmin codes for vectors near
    Voronoi boundaries — cast/quantize upstream if that matters."""
    m, ksub, dsub = codebooks.shape
    cb = codebooks.copy()
    # per-subcentroid squared norms, folded over ascending d like the dot
    cn2 = np.zeros((m, ksub))
    for d in range(dsub):
        cn2 += cb[:, :, d] * cb[:, :, d]
    # signed code type must hold 0..ksub-1: 1 byte up to 128 centroids,
    # 2 bytes beyond (int8 would wrap codes >= 128 to negatives)
    np_t, pa_t, sql_t = ((np.int8, pa.int8(), "TINYINT") if ksub <= 128
                         else (np.int16, pa.int16(), "SMALLINT"))
    # ship float32 over Arrow (half the bytes of array<double> — the
    # transfer, not the kernel, bounds 1M-row encode) and widen executor-
    # side: float32 -> float64 is exact, so codes are unchanged for
    # float32-sourced embeddings (see docstring for the double caveat)
    src = emb_df.select(F.col(id_col).alias("pq_id"),
                        F.col(emb_col).cast("array<float>").alias("v"))

    def encode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column("pq_id")
            col = b.column("v")
            # zero-copy Arrow list -> (n, dim) numpy: the values buffer is
            # contiguous float32 (fixed-length rows, no nulls in this
            # pipeline); to_pylist() here measured 8x slower at 1M rows
            x = np.asarray(col.flatten(), dtype=np.float64).reshape(
                len(col), -1)
            if x.size == 0:
                codes = np.empty((0, m), dtype=np_t)
            else:
                xs = _normalize(x).reshape(len(x), m, dsub)
                codes = np.empty((len(x), m), dtype=np_t)
                for s in range(m):
                    # argmin ||x-c||^2 == argmin (||c||^2 - 2 x.c): skips
                    # the (n, ksub, dsub) difference cube (peak-memory and
                    # wall-clock bound of the old form at 1M rows).  The
                    # dot folds over ascending d with elementwise ops, so
                    # every row's scores — and the lowest-index-tie argmin
                    # — stay independent of the Arrow batch shape.
                    dot = np.zeros((len(x), ksub))
                    for d in range(dsub):
                        dot += xs[:, s, d, None] * cb[None, s, :, d]
                    codes[:, s] = (cn2[s][None, :] - 2.0 * dot).argmin(1) \
                        .astype(np_t)
            arr = pa.array(list(codes), type=pa.list_(pa_t))
            yield pa.RecordBatch.from_arrays([ids, arr], ["pq_id", "pq_code"])

    return src.mapInArrow(encode, f"pq_id BIGINT, pq_code ARRAY<{sql_t}>")


def adc_score_expr(query_vec: np.ndarray, codebooks: np.ndarray,
                   code_col: str = "pq_code") -> F.Column:
    """ADC score as a pure JVM expression: per-subspace lookup tables of the
    normalized query's inner products with each subcentroid, inlined as
    literal arrays; the score is a FIXED left-to-right sum of m element_at
    terms — identical IEEE fold on every row, every engine, every run."""
    m, ksub, dsub = codebooks.shape
    q = _normalize(np.asarray(query_vec, dtype=np.float64)[None, :])[0]
    qs = q.reshape(m, dsub)
    luts = np.einsum("md,mkd->mk", qs, codebooks)  # (m, ksub)
    terms = []
    for s in range(m):
        lut = "array(" + ", ".join(f"{v!r}D" for v in luts[s]) + ")"
        terms.append(
            f"element_at({lut}, CAST(element_at({code_col}, {s + 1}) AS INT)"
            " + 1)")
    return F.expr("(" + " + ".join(terms) + ")")


def pq_search(codes_df: DataFrame, emb_df: DataFrame,
              query_vec: np.ndarray, codebooks: np.ndarray, k: int = 10,
              shortlist_k: int = 100, id_col: str = "vec_id",
              emb_col: str = "embedding") -> DataFrame:
    """PQ-then-rerank: ADC shortlist (TakeOrderedAndProject over the code
    table — the only corpus-wide work, on 8-byte codes) then exact cosine
    rescore of the <= shortlist_k candidates via a broadcast join against
    the float tier.  Returns (id, score_adc, score_cossim) top-k."""
    from binaryvectordb_spark.functions.vector import cosine

    shortlist = (codes_df
                 .select(F.col("pq_id"),
                         adc_score_expr(query_vec, codebooks).alias(
                             "score_adc"))
                 .orderBy(F.desc("score_adc"), F.asc("pq_id"))
                 .limit(shortlist_k))
    q = [float(v) for v in query_vec]
    exact = (F.broadcast(shortlist)
             .join(emb_df.select(F.col(id_col).alias("pq_id"),
                                 F.col(emb_col).alias("dvec")), "pq_id")
             .withColumn("qvec", F.array(*[F.lit(v) for v in q]))
             .select(F.col("pq_id").alias(id_col), "score_adc",
                     cosine("qvec", "dvec").alias("score_cossim")))
    return (exact.orderBy(F.desc("score_cossim"), F.asc(id_col))
            .limit(k))
