"""Ingest-time near-duplicate gate — the MAINTENANCE form of MinHash/LSH
dedup, as a reusable operator over arbitrary (doc_id, text) frames.

The bootstrap dedup (queries/dedup.py `dedup_lsh_jaccard`) self-joins the
corpus band table once; a production pipeline then needs the incremental
question at every ingest: *is this incoming doc a near-dup of anything
already admitted?*  The reference's add_documents flow
(BinaryVectorDB/BinaryVectorDB.py:93-101) has no such gate; at 100 TB a
corpus without one silently re-accumulates the duplicates the bootstrap
removed.

100 TB shape: the BATCH side's band table (O(batch) rows) broadcasts
against the corpus band table — the corpus never shuffles and never
self-joins; exact shingle-Jaccard verification touches only the pruned
candidate pairs.  Cost per ingest is O(corpus scan + batch), with the
corpus scan being the token/band projection only (narrow columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from binaryvectordb_spark.functions.text import (
    minhash_min_exprs,
    shingles,
    token_hash31,
)

N_HASHES = 12
N_BANDS = 4
ROWS_PER_BAND = 3
SHINGLE_K = 3


def _shingle_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, shs): the distinct k-token shingle set per doc.  Docs with
    fewer than SHINGLE_K tokens have an empty set — they produce no MinHash
    signature, collide with nothing, and are always admitted (documented
    semantics, shared with the bootstrap dedup)."""
    return (docs
            .select("doc_id", F.split(F.col("text"), " ").alias("toks"))
            .select("doc_id",
                    F.array_distinct(shingles("toks", SHINGLE_K))
                    .alias("shs")))


def _band_table(docs: DataFrame) -> DataFrame:
    """(doc_id, band_idx, bh): one LSH band hash per (doc, band) — the
    inverted-index key.  12 affine MinHash mins in ONE hash-agg, banded
    3-row-per-band (same family/constants as the bootstrap dedup so gate
    decisions are consistent with it)."""
    ex = (_shingle_sets(docs)
          .select("doc_id", F.explode("shs").alias("s"))
          .select("doc_id", F.expr(token_hash31("s")).alias("h")))
    m = ex.groupBy("doc_id").agg(*minhash_min_exprs("h", N_HASHES))
    bands = m.select("doc_id", F.array(*[
        F.concat_ws("|", *[f"sig_{b * ROWS_PER_BAND + r}"
                           for r in range(ROWS_PER_BAND)])
        for b in range(N_BANDS)]).alias("bands"))
    return bands.select(
        "doc_id", F.posexplode("bands").alias("band_idx", "bh"))


def near_dup_gate(batch: DataFrame, corpus: DataFrame, *,
                  j_threshold: float = 0.5) -> DataFrame:
    """Per-batch-doc admit/reject record vs an existing corpus.

    Both inputs are (doc_id, text) frames (extra columns ignored).  Returns
    (doc_id, n_candidates, n_dups, best_jaccard, admit) — one row per
    DISTINCT batch doc_id, where n_candidates counts LSH band collisions
    against the corpus, n_dups counts candidates whose EXACT shingle
    Jaccard >= j_threshold, best_jaccard is the max such score (NULL when
    none), and admit = (n_dups == 0).

    SELF-pairs (a corpus row carrying the same doc_id as a batch row) are
    EXCLUDED from candidates: a doc is never a near-dup of its own prior
    version, so a replayed batch re-admits identically (exactly-once gate
    log under foreachBatch's at-least-once replay) and an UPDATE of an
    existing doc_id is gated only against the rest of the corpus, not
    silently rejected as a dup of itself (ADVICE r9).

    The batch band table broadcasts; the corpus is scanned once and never
    shuffled (plan-pinned via the registry query that delegates here)."""
    batch = batch.select("doc_id", "text").dropDuplicates(["doc_id"])
    corpus = corpus.select("doc_id", "text")
    b_bands = (_band_table(batch)
               .select(F.col("doc_id").alias("bid"), "band_idx", "bh"))
    c_bands = _band_table(corpus)
    cands = (c_bands.join(F.broadcast(b_bands), ["band_idx", "bh"])
             .where(F.col("doc_id") != F.col("bid"))
             .select("bid", F.col("doc_id").alias("cid"))
             .distinct())
    sa = (_shingle_sets(batch)
          .select(F.col("doc_id").alias("bid"), F.col("shs").alias("sa")))
    sb = (_shingle_sets(corpus)
          .select(F.col("doc_id").alias("cid"), F.col("shs").alias("sb")))
    ver = (cands.join(sa, "bid").join(sb, "cid")
           .withColumn("common", F.size(F.array_intersect("sa", "sb"))
                       .cast("double"))
           .withColumn("j", F.col("common")
                       / (F.size("sa") + F.size("sb") - F.col("common"))))
    per_doc = (ver.groupBy("bid")
               .agg(F.count("*").alias("n_candidates"),
                    F.sum(F.when(F.col("j") >= j_threshold, 1).otherwise(0))
                    .alias("n_dups"),
                    F.max(F.when(F.col("j") >= j_threshold, F.col("j")))
                    .alias("best_jaccard")))
    return (batch.select("doc_id")
            .join(per_doc, batch["doc_id"] == per_doc["bid"], "left")
            .select("doc_id",
                    F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
                    F.coalesce("n_dups", F.lit(0)).alias("n_dups"),
                    "best_jaccard")
            .withColumn("admit", F.col("n_dups") == 0))


def intra_batch_dups(batch: DataFrame, *,
                     j_threshold: float = 0.5) -> DataFrame:
    """(doc_id) rows for batch docs that are near-dups of a LOWER-doc_id
    doc in the SAME batch — the intra-batch half of the ingest gate
    (ADVICE r9: two near-identical docs arriving in one micro-batch must
    not both be admitted).

    Semantics are PAIRWISE, lowest-id-wins, and deliberately
    non-transitive: if 2 dups 1 and 3 dups 2 (but 3 does not dup 1), BOTH
    2 and 3 are rejected — 3 collides with 2 regardless of 2's own fate.
    Safe-side and deterministic; the transitive-closure alternative would
    need a connected-components pass per micro-batch.

    Same LSH family/constants as near_dup_gate; the band self-join keys
    on (band_idx, bh) with a < on doc_id so each unordered pair is
    verified once.  O(batch²) only within colliding LSH buckets."""
    batch = batch.select("doc_id", "text").dropDuplicates(["doc_id"])
    bands = _band_table(batch)
    pairs = (bands.alias("a")
             .join(bands.alias("b"),
                   (F.col("a.band_idx") == F.col("b.band_idx"))
                   & (F.col("a.bh") == F.col("b.bh"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("cid"),
                     F.col("b.doc_id").alias("bid"))
             .distinct())
    sh = _shingle_sets(batch)
    sa = sh.select(F.col("doc_id").alias("bid"), F.col("shs").alias("sa"))
    sb = sh.select(F.col("doc_id").alias("cid"), F.col("shs").alias("sb"))
    ver = (pairs.join(sa, "bid").join(sb, "cid")
           .withColumn("common", F.size(F.array_intersect("sa", "sb"))
                       .cast("double"))
           .withColumn("j", F.col("common")
                       / (F.size("sa") + F.size("sb") - F.col("common"))))
    return (ver.where(F.col("j") >= j_threshold)
            .select(F.col("bid").alias("doc_id")).distinct())


def gated_add_documents_df(db, docs_df: DataFrame, *,
                           j_threshold: float = 0.5,
                           id_col: str = "doc_id",
                           text_col: str = "text",
                           intra_batch: bool = True) -> DataFrame:
    """Near-dup-gated distributed upsert: run the gate against the DB's
    CURRENT str-payload documents AND (by default) within the batch
    itself, admit only docs with zero near-dups, upsert the admitted
    slice via add_documents_df, and return the gate record (one row per
    distinct incoming doc_id): (doc_id, n_candidates, n_dups,
    best_jaccard, intra_dup, admit) where admit = corpus-clean AND NOT
    intra_dup.

    Corpus rows with the SAME doc_id as a batch row are excluded by
    near_dup_gate, so updates to an existing doc are gated against the
    rest of the corpus (not self-rejected) and a foreachBatch replay
    re-admits identically.  intra_batch=False restores corpus-only
    gating (intra_dup all false).

    The record is localCheckpoint-materialized BEFORE the upsert commits —
    both it and the admitted slice derive from the pre-commit docs table,
    and the commit garbage-collects superseded files (the db.py
    _ti_after_upsert re-execution hazard, ADVICE r8)."""
    batch = docs_df.select(F.col(id_col).cast("long").alias("doc_id"),
                           F.col(text_col).alias("text"))
    corpus_df = db.docs_df()
    if corpus_df is None:
        rec = (batch.dropDuplicates(["doc_id"]).select("doc_id")
               .withColumn("n_candidates", F.lit(0).cast("long"))
               .withColumn("n_dups", F.lit(0).cast("long"))
               .withColumn("best_jaccard", F.lit(None).cast("double")))
    else:
        corpus = (corpus_df.where(F.col("doc_kind") == "str")
                  .select("doc_id", F.col("doc").alias("text")))
        rec = near_dup_gate(batch, corpus, j_threshold=j_threshold) \
            .drop("admit")
    if intra_batch:
        intra = intra_batch_dups(batch, j_threshold=j_threshold) \
            .withColumn("intra_dup", F.lit(True))
        rec = (rec.join(intra, "doc_id", "left")
               .withColumn("intra_dup",
                           F.coalesce("intra_dup", F.lit(False))))
    else:
        rec = rec.withColumn("intra_dup", F.lit(False))
    rec = rec.withColumn(
        "admit", (F.col("n_dups") == 0) & ~F.col("intra_dup"))
    rec = rec.localCheckpoint(eager=True)
    admitted = (batch.join(rec.where("admit").select("doc_id"), "doc_id")
                .localCheckpoint(eager=True))
    if admitted.take(1):
        db.add_documents_df(admitted)
    return rec


class LocalNearDupGate:
    """RAM-tier admission control — the serving-tier twin of
    near_dup_gate, zero Spark jobs per check (the same trade as
    LocalCascadeSearcher / TextIndex.to_local: one distributed build
    collects the corpus artifacts, then every decision is in-process).

    The build collects the SPARK-computed shingle sets and LSH band
    table (executor-side md5/minhash work, two slim collects); `check`
    recomputes the incoming doc's bands/shingles in pure python with the
    bit-identical recipe (md5-prefix base hash, affine min family, 4x3
    banding — the same stack tests/test_ingest_gate_property.py pins
    against the distributed gate), so a LocalNearDupGate decision equals
    the distributed gate's decision exactly.

    `admit` is INCREMENTAL: an admitted (or updating) doc is registered
    into the in-memory index immediately, so a stream of single-doc
    admissions gates each doc against everything admitted before it —
    the per-event ingest shape no micro-batch gate can serve.  Same
    self-pair semantics as the distributed gate: an existing doc_id is
    first DE-registered (delete-then-insert), so updates are never
    rejected against their own prior version.

    Memory: O(corpus distinct shingles) python strings + 4 band keys per
    doc — the honest RAM-tier cost (fixture corpus ~MBs; at very large
    corpora keep the distributed gate or shard this one)."""

    def __init__(self, j_threshold: float = 0.5):
        self.j_threshold = j_threshold
        self._bands: dict[tuple[int, str], set[int]] = {}
        self._shingles: dict[int, frozenset] = {}

    # -- bit-exact python twin of the Spark shingle/minhash pipeline ----

    @staticmethod
    def _py_shingle_set(text: str) -> frozenset:
        toks = text.split(" ")
        if len(toks) < SHINGLE_K:
            return frozenset()
        return frozenset(" ".join(toks[i:i + SHINGLE_K])
                         for i in range(len(toks) - SHINGLE_K + 1))

    @staticmethod
    def _py_bands(shs: frozenset) -> list[tuple[int, str]]:
        import hashlib

        from binaryvectordb_spark.functions.text import (
            MINHASH_P,
            minhash_a,
            minhash_b,
        )
        if not shs:
            return []
        hs = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MINHASH_P
              for s in shs]
        sigs = [min((minhash_a(j) * h + minhash_b(j)) % MINHASH_P
                    for h in hs) for j in range(N_HASHES)]
        return [(b, "|".join(str(sigs[b * ROWS_PER_BAND + r])
                             for r in range(ROWS_PER_BAND)))
                for b in range(N_BANDS)]

    # -- build ----------------------------------------------------------

    @classmethod
    def from_df(cls, docs: DataFrame,
                j_threshold: float = 0.5) -> "LocalNearDupGate":
        """One distributed build over a (doc_id, text) frame: shingle
        sets and band table computed executor-side, collected once."""
        g = cls(j_threshold)
        docs = docs.select("doc_id", "text").dropDuplicates(["doc_id"])
        for r in _shingle_sets(docs).collect():
            g._shingles[r["doc_id"]] = frozenset(r["shs"])
        for r in _band_table(docs).collect():
            g._bands.setdefault((r["band_idx"], r["bh"]),
                                set()).add(r["doc_id"])
        return g

    @classmethod
    def from_db(cls, db, j_threshold: float = 0.5) -> "LocalNearDupGate":
        """Build from the DB's current str-payload documents (the same
        corpus gated_add_documents_df gates against)."""
        from pyspark.sql import functions as F
        corpus = db.docs_df()
        if corpus is None:
            return cls(j_threshold)
        return cls.from_df(
            corpus.where(F.col("doc_kind") == "str")
            .select("doc_id", F.col("doc").alias("text")), j_threshold)

    # -- serve ----------------------------------------------------------

    def _deregister(self, doc_id: int) -> None:
        shs = self._shingles.pop(doc_id, None)
        if shs is None:
            return
        for key in self._py_bands(shs):
            s = self._bands.get(key)
            if s is not None:
                s.discard(doc_id)
                if not s:
                    del self._bands[key]

    def check(self, doc_id: int, text: str) -> dict:
        """Gate record for one incoming doc vs the current in-memory
        corpus — (n_candidates, n_dups, best_jaccard, admit), identical
        to the distributed near_dup_gate row (self-pair excluded)."""
        sa = self._py_shingle_set(text)
        cands: set[int] = set()
        for key in self._py_bands(sa):
            cands |= self._bands.get(key, set())
        cands.discard(doc_id)
        dups, best = 0, None
        for cid in cands:
            sb = self._shingles[cid]
            common = len(sa & sb)
            j = common / (len(sa) + len(sb) - common)
            if j >= self.j_threshold:
                dups += 1
                best = j if best is None else max(best, j)
        return {"doc_id": doc_id, "n_candidates": len(cands),
                "n_dups": dups, "best_jaccard": best,
                "admit": dups == 0}

    def admit(self, doc_id: int, text: str) -> dict:
        """check + incremental registration: an admitted doc immediately
        becomes part of the corpus the NEXT doc is gated against; an
        admitted update first de-registers the prior version
        (delete-then-insert)."""
        rec = self.check(doc_id, text)
        if rec["admit"]:
            self._deregister(doc_id)
            shs = self._py_shingle_set(text)
            self._shingles[doc_id] = shs
            for key in self._py_bands(shs):
                self._bands.setdefault(key, set()).add(doc_id)
        return rec

    def __len__(self) -> int:
        return len(self._shingles)
