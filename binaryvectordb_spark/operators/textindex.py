"""Persisted inverted text index: BM25 serving without scanning the corpus.

The engine's BM25 queries (queries/hybrid.py) tokenize and aggregate the
documents table per query batch — correct, and fine when the corpus scan is
the workload; untenable as a SERVING path at 100 TB, where every keyword
query would re-read and re-explode 100 TB of text.  This module is the
standard answer, re-expressed in lakehouse form: an INVERTED INDEX built
once (one corpus pass), maintained incrementally, and queried by reading a
few pruned row groups.

Architecture (Lucene's segment model on plain parquet):

    <folder>/seg_<n>/postings/   (token, doc_id, tf, positions, dl[, imp])
                                 token-RANGE-sorted; dl denormalized so
                                 BM25 is a postings-only read (fmt 2);
                                 build/compact also store the impact
                                 column and sort it DESC per token so
                                 footer stats drive block-max early
                                 termination (fmt 3)
    <folder>/seg_<n>/term_stats/ (token, df, max_imp) — fmt-3 threshold
                                 seeds, build/compact only
    <folder>/seg_<n>/doclen/     (doc_id, dl)  — stats + local serving
    <folder>/tomb_<n>/           (doc_id, upto_seg)    deletes/replacements
    <folder>/meta.json           {segments, tombstones} — atomic swap

- A batch of new/updated docs is ONE new segment plus tombstones marking
  the incoming ids dead in every EARLIER segment (``upto_seg`` scopes the
  tombstone, so an upsert kills the old postings without touching the new
  ones).  No existing segment file is ever rewritten — mutation cost is
  O(batch), not O(index).
- ``compact()`` folds live postings into a single fresh segment and drops
  the tombstones (Lucene's merge).
- Postings are written ``repartitionByRange(token)`` + sorted by token, so
  a query's ``token IN (...)`` predicate prunes FILES and ROW GROUPS from
  the parquet footer stats alone — a 3-term query against a 100 TB corpus
  reads the few MB of postings for those terms (pinned from real footers
  in tests/test_textindex.py).
- ``search`` reproduces queries/hybrid.py's BM25 EXPRESSION TREE exactly
  (same rarity idf, same floored-bigint 1e-10 units, same fold), so the
  indexed path is bit-identical to the corpus-scan path — pinned by hash
  equality in tests.

Scale notes: in the compacted steady state n_docs/avgdl come from exact
write-time per-segment stats in meta — ZERO jobs; with live tombstones
they aggregate the slim doclen tables (1 row per live doc — at 100 TB a
few GB, not the corpus).  The tombstone table is broadcast (deletes since
last compact).  The reference
engine has no lexical index (vector-only, BinaryVectorDB/README.md:1-40);
this is part of the hybrid-retrieval surface a production corpus needs.
"""

from __future__ import annotations

import json
import math
import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

_META = "meta.json"
# on-disk layout format: 2 = postings rows carry the denormalized doc
# length (dl) so BM25 reads ONLY pruned postings — no O(corpus) doclen
# join per query (the 1M-corpus bench measured that join dominating:
# indexed 1.8 s vs scan 3.8 s; postings-only drops the indexed side to
# O(matching postings) at any corpus size); 3 = IMPACT layout (r13):
# build/compact store each posting's exact score weight (`imp`, the
# _TERM_SCORE factor sans idf, computed with the segment's write-time
# avgdl) and sort each token's postings imp DESC, so the parquet
# row-group footers themselves become the Block-Max WAND structure
# (Ding & Suel, SIGIR'11) — an `imp >= I` pushdown skips every block
# that cannot reach the running top-k threshold — plus a per-term
# stats table (token, df, max_imp) the early-termination tier reads
# token-pruned to set thresholds and bounds.  Micro-batch segments
# keep a tf DESC / dl ASC order and no imp (the per-upsert job budget
# stays pinned); the tier is gated to the compacted state.
_FMT = 3


class TextIndex:
    """Open-or-create a persisted inverted index at ``folder``."""

    def __init__(self, spark: SparkSession, folder: str):
        self.spark = spark
        self.folder = folder
        os.makedirs(folder, exist_ok=True)
        self._meta_path = os.path.join(folder, _META)
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                self.meta = json.load(f)
        else:
            self.meta = {"segments": [], "tombstones": [], "seg_stats": {},
                         "fmt": _FMT}

    # -- layout ------------------------------------------------------------

    def _write_meta(self) -> None:
        # optimistic-concurrency guard: meta carries a version counter; a
        # handle whose view is stale (another writer committed since we
        # read) fails loudly instead of last-write-wins dropping that
        # writer's segments.  (DB-maintained indexes are already
        # serialized by the DB's own commit flow; this protects direct
        # multi-handle use.)
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                on_disk = json.load(f).get("v", 0)
            if on_disk != self.meta.get("v", 0):
                raise Exception(
                    "concurrent TextIndex writer detected: meta version "
                    f"moved {self.meta.get('v', 0)} -> {on_disk}; re-open "
                    "the index and retry")
        self.meta["v"] = self.meta.get("v", 0) + 1
        tmp = self._meta_path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(self.meta, f)
        os.replace(tmp, self._meta_path)

    @staticmethod
    def _tokens(docs_df: DataFrame, id_col: str, text_col: str) -> DataFrame:
        # the SAME tokenizer as queries/hybrid.py _doc_tokens: split on ' '
        return docs_df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), " ")).alias("token"))

    @staticmethod
    def _tokens_pos(docs_df: DataFrame, id_col: str,
                    text_col: str) -> DataFrame:
        """(doc_id, pos, token) with 1-based token positions."""
        return docs_df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.col(text_col), " "))
            .alias("pos0", "token")).select(
            "doc_id", (F.col("pos0") + 1).alias("pos"), "token")

    # BM25 Okapi constants (K1=1.2, B=0.75) shared by every score tree
    # in this module and by the driver-side bound arithmetic.  The SQL
    # literals in _IMP_EXPR/_TERM_SCORE are WRITTEN OUT as exact float64
    # text (the strings must stay byte-identical to queries/hybrid.py's
    # corpus-scan tree); the asserts beside them pin the literals to
    # these constants so a future parameter change cannot silently
    # diverge the _seen_ub supremum (ADVICE r14).
    _K1 = 1.2
    _TF_SUP = _K1 + 1.0  # sup over tf,dl of (tf*(K1+1))/(tf + K1*den):
    #                      the tf-part's universal supremum (_seen_ub)

    # the tf/dl weight factor of _TERM_SCORE (everything but the per-term
    # idf): stored per posting as the fmt-3 `imp` column.  score_e10 =
    # floor(idf * imp * 1e10) — identical IEEE ops to the classic tree,
    # so the impact tier's scores are bit-for-bit the classic scores.
    _IMP_EXPR = ("((tf * 2.2D) / (tf + (1.2D * (0.25D + "
                 "(0.75D * (dl / avgdl))))))")
    assert (("(tf * %rD)" % _TF_SUP) in _IMP_EXPR
            and ("(%rD * " % _K1) in _IMP_EXPR), \
        "_IMP_EXPR literals diverged from _K1/_TF_SUP"

    def _write_segment(self, docs_df: DataFrame, id_col: str,
                       text_col: str, name: str,
                       with_imp: bool = False) -> dict:
        # postings carry POSITIONAL lists (sorted, 1-based) — tf is their
        # size, and the positions power phrase queries (search_phrase);
        # the extra ints cost ~the text itself once, at build time
        postings = (self._tokens_pos(docs_df, id_col, text_col)
                    .groupBy("token", "doc_id")
                    .agg(F.array_sort(F.collect_list("pos"))
                         .alias("positions"))
                    .select("token", "doc_id",
                            F.size("positions").cast("double").alias("tf"),
                            "positions"))
        # DENORMALIZE the doc length into every posting row (fmt 2): dl is
        # a window sum of tf over the doc's postings — integer-valued
        # doubles, so the sum is exact and fold-order-free, bit-identical
        # to the doclen table.  BM25 then reads ONLY the pruned postings
        # row groups: no per-query join against an O(corpus) doclen table,
        # which the 1M-corpus bench measured as the indexed path's actual
        # bottleneck.  Write cost: one extra doc_id shuffle per segment,
        # amortized over every future query.
        # (no explicit repartition before the window: widths past the
        # session's shuffle.partitions make the downstream range
        # partitioner re-sample — a 5th Spark job on the pinned mutation
        # budget.  The window's own hash shuffle at shuffle.partitions is
        # the right width; the 1M-doc build's heap needs are handled by
        # the bench's 4g child process, not by over-partitioning.)
        postings = postings.withColumn(
            "dl", F.sum("tf").over(Window.partitionBy("doc_id")))
        seg = os.path.join(self.folder, name)
        order = ["token", F.desc("tf"), "dl", "doc_id"]
        if with_imp:
            # fmt-3 IMPACT layout (build/compact only — the extra stats
            # job stays off the pinned per-upsert budget; the block-max
            # tier is gated to the compacted state anyway): store the
            # exact score weight per posting, computed with THIS
            # segment's avgdl as a literal — in the single-segment
            # steady state that literal IS the query-time avgdl
            # (fold-order-free sum / int count, same IEEE division), so
            # floor(idf * imp * 1e10) replays the classic score
            # bit-for-bit.  Sorting tokens by imp DESC makes the parquet
            # row-group max(imp) stats a DESCENDING ladder through each
            # term's blocks: the footers ARE the Block-Max WAND table,
            # and an `imp >= I` pushdown physically skips every block
            # below the running top-k threshold.
            per_doc = (postings.groupBy("doc_id")
                       .agg(F.first("dl").alias("dl"))
                       .agg(F.count(F.lit(1)).alias("n"),
                            F.sum("dl").alias("s")).first())
            # empty corpus build: zero postings (sum is NULL) — any
            # literal works, the imp projection runs over zero rows
            avgdl = (float(per_doc["s"]) / float(per_doc["n"])
                     if per_doc["n"] else 1.0)
            postings = postings.withColumn(
                "imp", F.expr(self._IMP_EXPR.replace(
                    "avgdl", repr(avgdl) + "D")))
            order = ["token", F.desc("imp"), "doc_id"]
        (postings.repartitionByRange("token")
         .sortWithinPartitions(*order)
         .write.mode("overwrite")
         # 16 MB row groups (unless the env pins its own block size):
         # pruning granularity for the In(token) read (smaller groups =
         # tighter footer ranges), AND a hard cap on writer memory —
         # every concurrent task buffers up to one row group, and 32
         # tasks x the 128 MB default was most of a 2g heap at 1M docs
         .options(**self._postings_block_opt())
         .parquet(os.path.join(seg, "postings")))
        # doclen from the WRITTEN postings (dl = sum of tf, identical to a
        # token count: tf doubles are integer-valued, so the sum is exact
        # and fold-order-free) — reads the compact segment back instead of
        # re-tokenizing the raw text a second time.  The explicit schema
        # matters: schema inference over a multi-file parquet dir runs a
        # footer-reading Spark JOB, which would break the per-upsert job
        # budget this path is pinned to (tests/test_textindex.py).
        dl = (self.spark.read.schema("doc_id long, tf double")
              .parquet(os.path.join(seg, "postings"))
              .groupBy("doc_id").agg(F.sum("tf").alias("dl")))
        return self._write_doclen(dl, seg)

    def _write_doclen(self, dl: DataFrame, seg: str) -> dict:
        """Write a segment's doclen table, folding the exact per-segment
        corpus stats into the SAME write job via observed metrics — no
        separate .first() stats job (round-8 paid 1 extra Spark job per
        incremental segment here).  n_docs is an integer; sum_dl is a sum
        of integer-valued doubles (token counts), exact in float64 up to
        2^53 and FOLD-ORDER-INDEPENDENT — so the tombstone-free stats fast
        path is bit-identical to an aggregation over the tables."""
        obs = Observation()
        (dl.observe(obs, F.count(F.lit(1)).alias("n"),
                    F.sum("dl").alias("s"))
         # doc_id-sorted (r12) so upsert_batch's bounded existence probe
         # prunes row groups; coalesce+sortWithinPartitions adds no
         # exchange, so the observed stats stay exact
         .coalesce(1).sortWithinPartitions("doc_id")
         .write.mode("overwrite").parquet(os.path.join(seg, "doclen")))
        got = obs.get
        return {"n_docs": int(got["n"]),
                "sum_dl": float(got["s"] or 0.0)}

    def _write_term_stats(self, seg: str) -> None:
        """Per-term stats table for the block-max tier (fmt 3): one row
        per token — postings count (the exact BM25 df of the compacted
        state) and the max stored impact (the threshold ladder's start).
        Written only by the FULL rewrites (build / compact), never by a
        micro-batch upsert — the per-upsert job budget stays pinned, and
        the early-termination tier simply waits for the next maintenance
        fold (same philosophy as _corpus_stats' zero-job path).  Token-
        sorted single file: the per-query stats read is one pruned row
        group."""
        ts = (self.spark.read.schema("token string, imp double")
              .parquet(os.path.join(seg, "postings"))
              .groupBy("token")
              .agg(F.count("*").cast("double").alias("df"),
                   F.max("imp").alias("max_imp")))
        (ts.coalesce(1).sortWithinPartitions("token")
         .write.mode("overwrite")
         .parquet(os.path.join(seg, "term_stats")))

    def _postings_block_opt(self) -> dict:
        """{parquet.block.size: 16 MB} unless the session's hadoop conf
        pins one explicitly (tests shrink it to force many row groups —
        an explicit env setting must win over our default cap)."""
        hconf = self.spark.sparkContext._jsc.hadoopConfiguration()
        if hconf.get("parquet.block.size"):
            return {}
        return {"parquet.block.size": str(16 << 20)}

    def _next_name(self, prefix: str) -> str:
        existing = self.meta["segments"] + self.meta["tombstones"]
        n = 0
        while f"{prefix}_{n}" in existing:
            n += 1
        return f"{prefix}_{n}"

    # -- mutation ----------------------------------------------------------

    def build(self, docs_df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> "TextIndex":
        """(Re)build from scratch: one corpus pass, single segment."""
        for name in self.meta["segments"] + self.meta["tombstones"]:
            shutil.rmtree(os.path.join(self.folder, name),
                          ignore_errors=True)
        self.meta = {"segments": [], "tombstones": [], "seg_stats": {},
                     "v": self.meta.get("v", 0), "fmt": _FMT}
        st = self._write_segment(docs_df, id_col, text_col, "seg_0",
                                 with_imp=True)
        self._write_term_stats(os.path.join(self.folder, "seg_0"))
        st["ts"] = True
        self.meta["segments"] = ["seg_0"]
        self.meta["seg_stats"] = {"seg_0": st}
        self._write_meta()
        return self

    def add_documents(self, docs_df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> None:
        """Upsert a batch: one NEW segment + tombstones scoped to every
        earlier segment (the incoming ids' old postings die; their new
        postings live in the new segment).  O(batch) writes."""
        self.upsert_batch(docs_df, None, id_col=id_col, text_col=text_col)

    def upsert_batch(self, docs_df: DataFrame | None,
                     dead_ids_df: DataFrame | None,
                     id_col: str = "doc_id", text_col: str = "text") -> None:
        """One mutation round-trip for a mixed batch: ``docs_df`` rows get
        new postings (one fresh segment); ``dead_ids_df`` doc_ids (a
        `doc_id` column) are additionally killed in every earlier segment
        WITHOUT re-indexing — the DB's upsert hook passes ALL touched ids
        here (str rows re-index, non-str rows just die) so one scoped
        tombstone covers both, instead of a tombstone write plus a
        remove_df write.

        Spark-job budget (the streaming-sink cost): postings write + doclen
        write (stats folded in via observed metrics) + one bounded
        In(doc_id)-pruned existence probe + one tombstone write; an
        all-new batch skips the tombstone entirely.  The existence probe
        (r12, mirroring GateIndex): only ids that actually have a doclen
        row in an earlier segment die — so insert-only streams carry ZERO
        tombstones and the tombstone mass equals TRUE dead rows, which is
        what the DB hook's row-budget vacuum counts.  Zero per-batch
        STATS jobs — pinned by tests/test_textindex.py job counting."""
        if not self.meta["segments"]:
            # nothing earlier to tombstone: a fresh index is just a build
            # over the new postings (dead ids have nothing to kill)
            if docs_df is not None:
                self.build(docs_df, id_col, text_col)
            return
        upto = len(self.meta["segments"]) - 1
        seg_name = None
        if docs_df is not None:
            seg_name = self._next_name("seg")
            st = self._write_segment(docs_df, id_col, text_col, seg_name)
            if st["n_docs"] == 0:
                # empty batch: roll the staged segment back rather than
                # registering a useless dir (streaming sinks deliver empty
                # micro-batches routinely) — the write-time stats already
                # told us, no extra count job
                shutil.rmtree(os.path.join(self.folder, seg_name),
                              ignore_errors=True)
                seg_name = None
            else:
                self.meta.setdefault("seg_stats", {})[seg_name] = st
        dead = None
        if docs_df is not None and dead_ids_df is None:
            dead = docs_df.select(F.col(id_col).cast("long").alias("doc_id"))
        elif dead_ids_df is not None:
            dead = dead_ids_df.select(
                F.col("doc_id").cast("long").alias("doc_id"))
        tomb_name, n_tomb = None, 0
        if dead is not None:
            # existence-filtered (r12): tombstone only ids actually
            # stored in an earlier segment.  Three tiers by batch-id
            # cardinality (r13 ADVICE, the GateIndex discipline — the
            # collect is limit()-capped, never unbounded):
            #   ≤ _PROBE_LITERAL_IDS: In(doc_id)-pruned doclen reads
            #     (doc_id-sorted since r12 → footer row-group pruning);
            #   ≤ _BULK_IDS: broadcast LeftSemi probe — one doc_id-only
            #     doclen scan, O(1) plan size vs a giant literal list;
            #   > _BULK_IDS (bulk remove): skip the probe and write the
            #     dead set FULLY DISTRIBUTED (observe above the range
            #     exchange for the exact count) — the id set never
            #     round-trips through the driver.
            from binaryvectordb_spark.operators.segprobe import (
                write_existence_filtered_tombstone,
            )
            tomb_name = self._next_name("tomb")
            n_tomb = write_existence_filtered_tombstone(
                self.spark, self.folder, self.meta["segments"], upto,
                self._SCHEMAS["doclen"], "doclen", dead, tomb_name,
                literal_cap=self._PROBE_LITERAL_IDS,
                bulk_cap=self._BULK_IDS)
            if not n_tomb:
                tomb_name = None
        if seg_name is None and tomb_name is None:
            return  # fully empty batch: no state change, no meta bump
        if seg_name is not None:
            self.meta["segments"].append(seg_name)
        if tomb_name is not None:
            self.meta["tombstones"].append(tomb_name)
            # effective scope recorded in meta from birth, so compact_tail
            # can re-scope without rewriting the tombstone parquet
            self.meta.setdefault("tomb_upto", {})[tomb_name] = upto
            self.meta.setdefault("tomb_stats", {})[tomb_name] = n_tomb
        self._write_meta()

    # existence-probe tiers — one shared implementation for both derived
    # indexes (operators/segprobe.py, r13 review: the "unified policy"
    # must be unified in CODE); the caps are re-exported for tests
    from binaryvectordb_spark.operators.segprobe import (
        BULK_CAP as _BULK_IDS,
        LITERAL_CAP as _PROBE_LITERAL_IDS,
    )

    def remove(self, doc_ids: Sequence[int]) -> None:
        """Delete ids: a tombstone covering every current segment."""
        if not doc_ids or not self.meta["segments"]:
            return
        self.remove_df(self.spark.createDataFrame(
            [(int(i),) for i in doc_ids], "doc_id: long"))

    def remove_df(self, ids_df: DataFrame) -> None:
        """remove() from a DataFrame of doc_ids — the distributed form
        mutation hooks use.  Bulk sets (> _BULK_IDS) never round-trip
        through the driver (distributed tombstone write); smaller sets
        pay one bounded limit()-capped collect for the existence
        probe."""
        self.upsert_batch(None, ids_df)

    def compact(self) -> None:
        """Merge live postings into one fresh segment, drop tombstones
        (Lucene's merge).  Query cost returns to single-segment."""
        # carry EVERY postings column (tf AND positions) — dropping one
        # would leave the compacted segment schema-incompatible with the
        # next upsert's segment and break the query-side union
        post = self.live_postings().drop("seg")
        dl = self.live_doclen().select("doc_id", "dl")
        name = self._next_name("seg")
        seg = os.path.join(self.folder, name)
        # the fmt-3 impact column, with the POST-compaction corpus avgdl
        # (one small stats job — compact is the amortized rewrite, not
        # the pinned upsert path); fold-order-free sum / int count, so
        # the literal equals the query-time _corpus_stats value exactly
        srow = dl.agg(F.count(F.lit(1)).alias("n"),
                      F.sum("dl").alias("s")).first()
        # fully-deleted index: the live set is empty (sum is NULL) — any
        # literal works, the imp projection runs over zero rows
        avgdl = (float(srow["s"]) / float(srow["n"])
                 if srow["n"] else 1.0)
        post = post.withColumn(
            "imp", F.expr(self._IMP_EXPR.replace("avgdl",
                                                 repr(avgdl) + "D")))
        (post.repartitionByRange("token")
         .sortWithinPartitions("token", F.desc("imp"), "doc_id")
         .write.mode("overwrite")
         .options(**self._postings_block_opt())  # same cap as _write_segment
         .parquet(os.path.join(seg, "postings")))
        st = self._write_doclen(dl, seg)  # stats folded into the write job
        self._write_term_stats(seg)
        st["ts"] = True
        old = self.meta["segments"] + self.meta["tombstones"]
        # compaction rewrites every posting row (with dl), so the folded
        # index is fmt-current even when the input segments predated it
        self.meta = {"segments": [name], "tombstones": [],
                     "seg_stats": {name: st},
                     "v": self.meta.get("v", 0), "fmt": _FMT}
        self._write_meta()
        for stale in old:
            shutil.rmtree(os.path.join(self.folder, stale),
                          ignore_errors=True)
        # GC orphans: seg_*/tomb_* dirs a crashed writer staged but never
        # committed into meta (same role as the DB commit's stray sweep)
        for entry in os.listdir(self.folder):
            if ((entry.startswith("seg_") or entry.startswith("tomb_"))
                    and entry != name):
                shutil.rmtree(os.path.join(self.folder, entry),
                              ignore_errors=True)

    # geometric tier ratio: extend the trailing merge run while the next
    # (older) segment is no more than this multiple of the run's size
    _TIER_RATIO = 8

    def compact_tail(self) -> None:
        """Tiered (log-structured) merge — Lucene's real merge policy tier:
        fold the maximal TRAILING run of comparably-small segments into
        one, leaving large old segments untouched.  Under micro-batch
        ingest this makes maintenance amortized O(batch·log) instead of
        compact()'s O(index) full rewrite: at 100 TB the bootstrap segment
        is never rewritten just because 16 small batches arrived.

        Correctness with scoped tombstones: the merged segment is built
        from the LIVE rows of its sources (`live_postings` restricted to
        the run), so every tombstone's within-run effect is materialized;
        a tombstone whose scope reached into the run is then re-scoped to
        the last untouched segment via meta's tomb_upto override — its
        parquet is untouched, and its remaining job (killing the doc in
        segments OLDER than the run) is preserved exactly.  When the run
        reaches segment 0 this degenerates to compact(), which also drops
        the tombstones."""
        segs = self.meta["segments"]
        if len(segs) < 2:
            self._fold_tombstones()
            return
        stats = dict(self.meta.get("seg_stats") or {})
        backfilled = False
        for s in segs:
            have = stats.get(s) or {}
            if "n_docs" not in have or "sum_dl" not in have:
                # legacy pre-stats segment: one-time backfill, persisted —
                # a default size of 0 would absorb a huge legacy bootstrap
                # into the trailing run and degrade this tiered merge to a
                # full compact() (r13 ADVICE, mirrored from GateIndex).
                # BOTH stats come from the one doclen read: backfilling
                # only n_docs left _corpus_stats' zero-job fast path to
                # KeyError on sum_dl after the merge (r14 ADVICE).
                got = (self.spark.read.schema(self._SCHEMAS["doclen"])
                       .parquet(os.path.join(self.folder, s, "doclen"))
                       .agg(F.count(F.lit(1)).alias("n"),
                            F.sum("dl").alias("s")).first())
                stats[s] = dict(have, n_docs=int(got["n"]),
                                sum_dl=float(got["s"] or 0.0))
                backfilled = True
        if backfilled:
            self.meta["seg_stats"] = stats
            self._write_meta()
        sizes = [int(stats[s].get("n_docs", 0)) for s in segs]
        i = len(segs) - 1
        acc = sizes[i]
        while i - 1 >= 0 and sizes[i - 1] <= self._TIER_RATIO * max(acc, 1):
            i -= 1
            acc += sizes[i]
        if i == len(segs) - 1:
            # no mergeable segment run (the tail dwarfs its elder) —
            # still bound the tombstone read fan-in
            self._fold_tombstones()
            return
        if i == 0:
            self.compact()
            return
        merged = self.live_postings().where(F.col("seg") >= i).drop("seg")
        name = self._next_name("seg")
        seg = os.path.join(self.folder, name)
        # no imp / term_stats here: the tier is gated to the SINGLE-
        # segment state (per-segment write-time avgdl only equals the
        # live avgdl there), and this merge leaves older segments alive
        (merged.repartitionByRange("token")
         .sortWithinPartitions("token", F.desc("tf"), "dl", "doc_id")
         .write.mode("overwrite")
         .options(**self._postings_block_opt())
         .parquet(os.path.join(seg, "postings")))
        dl = (self.spark.read.schema("doc_id long, tf double")
              .parquet(os.path.join(seg, "postings"))
              .groupBy("doc_id").agg(F.sum("tf").alias("dl")))
        st = self._write_doclen(dl, seg)
        over = dict(self.meta.get("tomb_upto") or {})
        for t in self.meta["tombstones"]:
            u = over.get(t)
            if u is None:
                # tombstone born before scopes were recorded in meta:
                # read its written scope (one tiny job) — guessing a
                # default could WIDEN a narrow tombstone after re-scoping
                u = int(self.spark.read.schema(self._SCHEMAS["tomb"])
                        .parquet(os.path.join(self.folder, t))
                        .agg(F.max("upto_seg")).first()[0])
            if u >= i:
                u = i - 1  # in-run effect materialized in the merge
            over[t] = u
        old_sources = segs[i:]
        self.meta["segments"] = segs[:i] + [name]
        self.meta["seg_stats"] = {
            s: stats[s] for s in segs[:i] if s in stats}
        self.meta["seg_stats"][name] = st
        self.meta["tomb_upto"] = over
        self._write_meta()
        for stale in old_sources:
            shutil.rmtree(os.path.join(self.folder, stale),
                          ignore_errors=True)
        self._fold_tombstones()

    def _fold_tombstones(self) -> None:
        """Fold the tombstone PILE into ONE doc_id-sorted file — the
        other half of the tiered discipline (r12, ported with the
        GateIndex fix): per-row effective scopes materialized (``least``
        of written scope and meta override), repeated kills of one doc
        collapse to the widest scope, empty scopes (upto_seg < 0) drop.
        Bounds the tombstone FILE count (the anti-join read fan-in)
        without touching any segment; the ROW count — true dead docs,
        thanks to upsert_batch's existence filter — is bounded by the DB
        hook's row-budget vacuum."""
        tombs = self.meta["tombstones"]
        if len(tombs) < 2:
            return
        name = self._next_name("tomb")
        obs = Observation()
        (self._tomb()
         .where(F.col("upto_seg") >= 0)
         .groupBy("doc_id")
         .agg(F.max("upto_seg").alias("upto_seg"))
         .observe(obs, F.count(F.lit(1)).alias("n"))
         .coalesce(1).sortWithinPartitions("doc_id")
         .write.mode("overwrite")
         .parquet(os.path.join(self.folder, name)))
        n = int(obs.get["n"])
        if not n:
            shutil.rmtree(os.path.join(self.folder, name),
                          ignore_errors=True)
        old = list(tombs)
        self.meta["tombstones"] = [name] if n else []
        self.meta["tomb_upto"] = {}
        self.meta["tomb_stats"] = {name: n} if n else {}
        self._write_meta()
        for t in old:
            shutil.rmtree(os.path.join(self.folder, t),
                          ignore_errors=True)

    def tomb_rows(self) -> int | None:
        """Total tombstone rows from write-time stats (zero jobs); None
        when a pre-stats legacy tombstone lacks one (trivially bounded:
        any >=2-file pile is folded by compact_tail, which stats it)."""
        st = self.meta.get("tomb_stats") or {}
        if any(t not in st for t in self.meta["tombstones"]):
            return None
        return sum(int(st[t]) for t in self.meta["tombstones"])

    def doc_rows(self) -> int:
        """Total stored doc rows (live + not-yet-vacuumed dead) from
        write-time stats — the row-budget vacuum's denominator."""
        st = self.meta.get("seg_stats") or {}
        return sum(int(st.get(s, {}).get("n_docs", 0))
                   for s in self.meta["segments"])

    # -- read paths --------------------------------------------------------

    # fixed table schemas, supplied to every read: parquet schema
    # inference over a multi-file dir runs a footer-reading Spark job,
    # which would tax every query AND the maintenance job budget
    _SCHEMAS = {
        "postings": "token string, doc_id long, tf double, "
                    "positions array<int>, dl double",
        "doclen": "doc_id long, dl double",
        "tomb": "doc_id long, upto_seg int",
    }

    def _tomb(self) -> DataFrame | None:
        if not self.meta["tombstones"]:
            return None
        # a tiered merge (compact_tail) re-scopes tombstones whose range
        # reached into the merged run WITHOUT rewriting their parquet:
        # meta's tomb_upto override NARROWS the written column (least,
        # never replace — a folded tombstone file holds heterogeneous
        # per-row scopes, and a replace would WIDEN its narrow rows)
        over = self.meta.get("tomb_upto") or {}
        parts = []
        for t in self.meta["tombstones"]:
            df = (self.spark.read.schema(self._SCHEMAS["tomb"])
                  .parquet(os.path.join(self.folder, t)))
            if t in over:
                df = df.withColumn(
                    "upto_seg",
                    F.least("upto_seg", F.lit(int(over[t]))))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _live(self, sub: str) -> DataFrame:
        """Union the segment tables with their segment ordinal, minus
        tombstoned rows (non-equi anti-join: a tombstone kills rows of
        every segment up to its ``upto_seg`` — broadcast, the tombstone
        table is deletes-since-compact)."""
        if not self.meta["segments"]:
            raise Exception("empty TextIndex; build() first")
        parts = []
        for i, name in enumerate(self.meta["segments"]):
            parts.append(self.spark.read.schema(self._SCHEMAS[sub])
                         .parquet(os.path.join(self.folder, name, sub))
                         .withColumn("seg", F.lit(i)))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        tomb = self._tomb()
        if tomb is not None:
            df = df.join(
                F.broadcast(tomb),
                (df["doc_id"] == tomb["doc_id"])
                & (tomb["upto_seg"] >= df["seg"]),
                "left_anti")
        return df

    def live_postings(self) -> DataFrame:
        return self._live("postings")

    def live_doclen(self) -> DataFrame:
        return self._live("doclen")

    # -- search ------------------------------------------------------------

    # identical constants/tree to queries/hybrid.py (K1=1.2, B=0.75)
    _TERM_SCORE = (
        "CAST(floor(((n_docs - df) + 0.5D) / (df + 0.5D) * ((tf * 2.2D)"
        " / (tf + (1.2D * (0.25D + (0.75D * (dl / avgdl)))))) "
        "* 1e10) AS BIGINT)")
    assert (("(tf * %rD)" % _TF_SUP) in _TERM_SCORE
            and ("(%rD * " % _K1) in _TERM_SCORE), \
        "_TERM_SCORE literals diverged from _K1/_TF_SUP"

    def _corpus_stats(self) -> DataFrame:
        """1-row (n_docs, avgdl).  With NO tombstones (the compacted
        steady state) it comes from the per-segment write-time stats in
        meta — ZERO jobs and bit-identical (counts are ints; dl sums are
        sums of integer-valued doubles, exact and fold-order-free; the
        avgdl division is the same IEEE op either way).  Tombstones make
        the live set data-dependent, so that path aggregates the slim
        doclen tables."""
        seg_stats = self.meta.get("seg_stats") or {}
        segs = self.meta["segments"]
        if (not self.meta["tombstones"]
                # require BOTH stats per segment — a partial entry (e.g.
                # written by an old n_docs-only backfill) must fall through
                # to the aggregation path, not KeyError (r14 ADVICE)
                and all(s in seg_stats and "sum_dl" in seg_stats[s]
                        and "n_docs" in seg_stats[s] for s in segs)
                and sum(seg_stats[s]["n_docs"] for s in segs) > 0):
            n = sum(seg_stats[s]["n_docs"] for s in segs)
            sd = 0.0
            for s in segs:
                sd += seg_stats[s]["sum_dl"]
            return self.spark.range(1).select(
                F.lit(float(n)).alias("n_docs"),
                F.lit(sd / float(n)).alias("avgdl"))
        return self.live_doclen().agg(
            F.count("*").cast("double").alias("n_docs"),
            (F.sum("dl") / F.count("*").cast("double")).alias("avgdl"))

    # -- block-max early termination (fmt 3) --------------------------------

    # auto-engagement floors: below these the classic single-read path is
    # already cheap and the tier's threshold iterations would only add
    # driver round-trips.  block_max=True (tests, the driver row) skips
    # the floors but never the state requirements.
    _BLOCKMAX_MIN_DOCS = 200_000
    _BLOCKMAX_MIN_POSTINGS = 50_000
    def _blockmax_ready(self) -> bool:
        """State requirements for exactness of the impact tier: fmt 3
        with the bootstrap segment's term_stats table present.  Since
        r14 the tier survives MUTATION — micro-batch segments and
        tombstones no longer gate it off (see _blockmax_dirty): the
        dirty mode thresholds only the impact-ordered bootstrap
        segment, reads the (small) micro segments in full, anti-joins
        the bounded tombstone set, re-derives exact scores from tf/dl
        with LIVE corpus stats, and inflates the unseen-posting bound
        by the avgdl drift factor — so the exactness proof carries
        through every segmented/tombstoned state."""
        ss = self.meta.get("seg_stats") or {}
        return (bool(self.meta["segments"])
                and self.meta.get("fmt", 1) >= 3
                and bool((ss.get(self.meta["segments"][0]) or {})
                         .get("ts")))

    def _blockmax_dirty(self) -> bool:
        """True when the index state diverges from the compacted
        steady state (micro segments or tombstones): the tier must
        re-derive scores/stats from the live tables instead of
        replaying stored impacts."""
        return (len(self.meta["segments"]) > 1
                or bool(self.meta["tombstones"]))

    # auto-mode cost gate for the dirty tier: the micro segments are
    # re-read IN FULL each descent round, so auto engages only while
    # their total mass stays a small fraction of the thresholdable
    # bootstrap segment (forced mode ignores this — exactness never
    # depends on it, only round cost does)
    _BLOCKMAX_MICRO_FRAC = 0.25

    def _micro_frac(self) -> float:
        """Micro-segment doc mass / bootstrap doc mass (inf when a
        segment lacks write-time stats — auto then refuses)."""
        ss = self.meta.get("seg_stats") or {}
        segs = self.meta["segments"]
        n0 = int((ss.get(segs[0]) or {}).get("n_docs", 0))
        if n0 <= 0:
            return float("inf")
        tail = 0
        for s in segs[1:]:
            st = ss.get(s) or {}
            if "n_docs" not in st:
                return float("inf")
            tail += int(st["n_docs"])
        return tail / n0

    def _live_corpus_scalars(self) -> tuple:
        """(n_docs, avgdl) of the LIVE corpus as driver doubles,
        memoized per meta version.  Zero jobs in tombstone-free states
        (the seg_stats fast path inside _corpus_stats); one slim doclen
        aggregation otherwise.  Both values are deterministic: counts
        are ints, dl sums are sums of integer-valued doubles (exact and
        fold-order-free), the division is one IEEE op — so the literal
        replay matches the classic plan's broadcast stats frame
        bit-for-bit."""
        key = self.meta.get("v", 0)
        cache = getattr(self, "_cs_cache", None)
        if cache is None:
            cache = self._cs_cache = {}
        if key not in cache:
            if len(cache) > 64:
                cache.clear()
            r = self._corpus_stats().first()
            cache[key] = (float(r["n_docs"]), float(r["avgdl"]))
        return cache[key]

    def _live_df(self, terms: list) -> dict:
        """{token: live df} — the per-term live postings count the
        classic plan derives inside its own job tree, memoized per
        (meta version, term).  One aggregation job fills all of a
        query's missing terms at once; repeated serving queries then
        pay ZERO df jobs until the next mutation bumps the version."""
        v = self.meta.get("v", 0)
        cache = getattr(self, "_df_cache", None)
        if cache is None:
            cache = self._df_cache = {}
        missing = [t for t in terms if (v, t) not in cache]
        if missing:
            if len(cache) > 1024:
                cache.clear()
            rows = (self.live_postings()
                    .where(F.col("token").isin(*missing))
                    .groupBy("token")
                    .agg(F.count(F.lit(1)).alias("n")).collect())
            got = {r["token"]: float(r["n"]) for r in rows}
            for t in missing:
                cache[(v, t)] = got.get(t, 0.0)
        return {t: cache[(v, t)] for t in terms}

    def _meta_n_docs(self) -> int:
        ss = self.meta.get("seg_stats") or {}
        return sum(int((ss.get(s) or {}).get("n_docs", 0))
                   for s in self.meta["segments"])

    def _term_stats_lookup(self, terms: list) -> dict:
        """{token: (df, max_imp)} — one token-pruned read of the tiny
        term_stats table, memoized per (meta version, term set) so
        repeated serving queries pay it once.  Terms absent from the
        index are absent from the result."""
        key = (self.meta.get("v", 0), tuple(sorted(set(terms))))
        cache = getattr(self, "_ts_cache", None)
        if cache is None:
            cache = self._ts_cache = {}
        if key in cache:
            return cache[key]
        seg = self.meta["segments"][0]
        agg = (self.spark.read
               .schema("token string, df double, max_imp double")
               .parquet(os.path.join(self.folder, seg, "term_stats"))
               .where(F.col("token").isin(*terms)).collect())
        out = {r["token"]: (float(r["df"]), float(r["max_imp"]))
               for r in agg}
        if len(cache) > 256:
            cache.clear()  # bounded memo; stale versions purge naturally
        cache[key] = out
        return out

    # a term is ESSENTIAL (MaxScore vocabulary) when it matches at most
    # this corpus fraction — its postings are cheap to read in full
    _ESSENTIAL_FRAC = 0.05

    @staticmethod
    def _sql_str(t: str) -> str:
        """Escape a token for a SQL string literal — backslashes AND
        quotes (r13 review: quote-only escaping let a backslash token
        break the CASE literal or silently mis-match)."""
        return t.replace("\\", "\\\\").replace("'", "\\'")

    def _search_maxscore_split(self, present, stats, idf, base,
                               k: int) -> DataFrame | None:
        """MaxScore essential/non-essential partitioning (Turtle &
        Flood 1995), the other classic early-termination next to the
        block-max descent — and the one that wins on the REALISTIC
        query shape, selective terms mixed with stop words: score the
        SELECTIVE terms' postings in full (tiny by definition), bound
        every other doc by the dense terms' maximum impacts, and fetch
        dense postings only for the candidate docs.  Exactness proof:

        - theta_E = k-th best essential-only partial; slack = sum over
          dense terms of floor(idf * max_imp * 1e10);
        - a doc with NO essential posting totals <= slack < theta_E
          <= final k-th score — excluded, strictly;
        - a doc with essential partial < theta_E - slack totals
          < theta_E — excluded, strictly;
        - every remaining doc is a candidate and is scored EXACTLY
          (all its postings for all query terms are read in phase B).

        Three bounded jobs, no iteration.  Returns None when the query
        has no selective/dense mix, the bound does not separate, or
        the candidate set is not small — the threshold descent takes
        over."""
        ess = [t for t in present
               if stats[t][0] <= self._ESSENTIAL_FRAC
               * max(1.0, self._meta_n_docs())]
        dense = [t for t in present if t not in ess]
        if not ess or not dense:
            return None
        if sum(stats[t][0] for t in ess) > 1_000_000:
            return None  # "essential" side too heavy — descend instead
        slack = sum(self._ub_py(idf[t], stats[t][1]) for t in dense)
        s_case_e = ("CAST(floor((CASE token "
                    + " ".join(
                        f"WHEN '{self._sql_str(t)}'"
                        f" THEN {idf[t]!r}D" for t in ess)
                    + " ELSE 0.0D END) * imp * 1e10) AS BIGINT)")
        g_e = (base.where(F.col("token").isin(*ess))
               .select("doc_id", F.expr(s_case_e).alias("s"))
               .groupBy("doc_id").agg(F.sum("s").alias("pe")))
        top_e = (g_e.orderBy(F.desc("pe"), F.asc("doc_id"))
                 .limit(k).collect())
        if len(top_e) < k:
            return None  # fewer essential docs than k: can't separate
        theta_e = int(top_e[-1]["pe"])
        if theta_e <= slack + 1:
            return None  # dense mass could outrank: no separation
        cand = (g_e.where(F.col("pe") >= theta_e - slack)
                .select("doc_id").limit(100_001).collect())
        if len(cand) > 100_000:
            return None
        ids = [int(r["doc_id"]) for r in cand]
        s_case = ("CAST(floor((CASE token "
                  + " ".join(
                      f"WHEN '{self._sql_str(t)}'"
                      f" THEN {idf[t]!r}D" for t in present)
                  + " ELSE 0.0D END) * imp * 1e10) AS BIGINT)")
        hit = base.where(F.col("token").isin(*present))
        if len(ids) <= self._PROBE_LITERAL_IDS:
            hit = hit.where(F.col("doc_id").isin(ids))
        else:
            # past the literal-list cap, membership goes through a
            # broadcast semi-join (r13 review: same plan-size policy as
            # the tombstone probe tiers)
            hit = hit.join(F.broadcast(self.spark.createDataFrame(
                [(i,) for i in ids], "doc_id long")),
                "doc_id", "left_semi")
        top = (hit
               .select("doc_id", F.expr(s_case).alias("s"))
               .groupBy("doc_id").agg(F.sum("s").alias("bm25_e10"))
               .orderBy(F.desc("bm25_e10"), F.asc("doc_id"))
               .limit(k).collect())
        self.last_blockmax = {"mode": "maxscore",
                              "essential": list(ess),
                              "n_candidates": len(ids)}
        rows = [(int(r["doc_id"]), int(r["bm25_e10"]), i + 1)
                for i, r in enumerate(top)]
        return self.spark.createDataFrame(
            rows, "doc_id long, bm25_e10 long, kw_rank int")

    def _search_maxscore_split_dirty(self, present, stats, idf, k,
                                     c_drift, live_df, n_docs,
                                     avgdl) -> DataFrame | None:
        """The MaxScore essential/dense split in the MUTATED state
        (r15).  The r14 close rejected this on a measured "zero wall
        gap" — an artifact of the collect-only timing defect fixed this
        round: timed end-to-end, the dirty-mixed descent falls to the
        full read (~1.5 s at 1M) while the clean split serves the same
        shape at ~0.85 s.  Same three bounded jobs as the clean split
        (_search_maxscore_split), with the dirty machinery of the
        descent tier:

        - essential/dense classification and idf from LIVE df/n_docs;
        - both phases read the live frame (all segments, tombstones
          broadcast anti-joined) and re-derive exact scores from tf/dl
          with the live avgdl literal — bit-identical to the classic
          live-set plan;
        - the dense slack bounds a posting ANYWHERE in the index: the
          bootstrap's write-time max_imp drift-inflated by c_drift,
          capped below by the universal tf-part supremum _TF_SUP when
          micro segments exist (a micro posting is bounded by no footer
          stat), plus the relative float margin — the _seen_ub bound of
          the descent tier.  Inflated slack only shrinks the separation
          window and widens the candidate set; the proof inequalities
          are unchanged from the clean split's docstring.

        Returns None when the shape/separation refuses — the dirty
        descent takes over."""
        ess = [t for t in present
               if live_df[t] <= self._ESSENTIAL_FRAC * max(1.0, n_docs)]
        dense = [t for t in present if t not in ess]
        if not ess or not dense:
            return None
        if sum(live_df[t] for t in ess) > 1_000_000:
            return None  # "essential" side too heavy — descend instead
        multi = len(self.meta["segments"]) > 1
        slack = sum(self._dense_seen_ub(t, stats, idf[t], c_drift,
                                        multi, True) for t in dense)
        val = (f"((tf * 2.2D) / (tf + (1.2D * (0.25D + "
               f"(0.75D * (dl / {avgdl!r}D))))))")

        def live(terms_subset):
            # full live read of these terms' postings: every segment
            # token-pruned, tombstones anti-joined with scope semantics
            segs = self.meta["segments"]
            parts = []
            for i, nm in enumerate(segs):
                parts.append(
                    self.spark.read
                    .schema("token string, doc_id long, tf double, "
                            "dl double")
                    .parquet(os.path.join(self.folder, nm, "postings"))
                    .where(F.col("token").isin(*terms_subset))
                    .withColumn("seg", F.lit(i)))
            dfr = parts[0]
            for p in parts[1:]:
                dfr = dfr.unionByName(p)
            tomb = self._tomb()
            if tomb is not None:
                dfr = dfr.join(
                    F.broadcast(tomb),
                    (dfr["doc_id"] == tomb["doc_id"])
                    & (tomb["upto_seg"] >= dfr["seg"]),
                    "left_anti")
            return dfr

        s_case_e = ("CAST(floor((CASE token "
                    + " ".join(
                        f"WHEN '{self._sql_str(t)}'"
                        f" THEN {idf[t]!r}D" for t in ess)
                    + " ELSE 0.0D END) * " + val + " * 1e10) AS BIGINT)")
        g_e = (live(ess)
               .select("doc_id", F.expr(s_case_e).alias("s"))
               .groupBy("doc_id").agg(F.sum("s").alias("pe")))
        top_e = (g_e.orderBy(F.desc("pe"), F.asc("doc_id"))
                 .limit(k).collect())
        if len(top_e) < k:
            return None  # fewer essential docs than k: can't separate
        theta_e = int(top_e[-1]["pe"])
        if theta_e <= slack + 1:
            return None  # dense mass could outrank: no separation
        cand = (g_e.where(F.col("pe") >= theta_e - slack)
                .select("doc_id").limit(100_001).collect())
        if len(cand) > 100_000:
            return None
        ids = [int(r["doc_id"]) for r in cand]
        s_case = ("CAST(floor((CASE token "
                  + " ".join(
                      f"WHEN '{self._sql_str(t)}'"
                      f" THEN {idf[t]!r}D" for t in present)
                  + " ELSE 0.0D END) * " + val + " * 1e10) AS BIGINT)")
        hit = live(present)
        if len(ids) <= self._PROBE_LITERAL_IDS:
            hit = hit.where(F.col("doc_id").isin(ids))
        else:
            hit = hit.join(F.broadcast(self.spark.createDataFrame(
                [(i,) for i in ids], "doc_id long")),
                "doc_id", "left_semi")
        top = (hit
               .select("doc_id", F.expr(s_case).alias("s"))
               .groupBy("doc_id").agg(F.sum("s").alias("bm25_e10"))
               .orderBy(F.desc("bm25_e10"), F.asc("doc_id"))
               .limit(k).collect())
        self.last_blockmax = {"mode": "maxscore", "dirty": True,
                              "essential": list(ess),
                              "n_candidates": len(ids)}
        rows = [(int(r["doc_id"]), int(r["bm25_e10"]), i + 1)
                for i, r in enumerate(top)]
        return self.spark.createDataFrame(
            rows, "doc_id long, bm25_e10 long, kw_rank int")

    def _search_blockmax(self, terms: list, k: int,
                         forced: bool) -> DataFrame | None:
        """Exact top-k with block skipping over the IMPACT-ORDERED
        postings — Block-Max WAND (Ding & Suel, SIGIR'11) re-shaped for
        a batch engine.  Each round reads only the per-term HIGH-IMPACT
        PREFIX ``imp >= I_t``: the fmt-3 layout sorts each term's
        postings imp-descending, so the parquet footer max(imp) stats
        descend through the term's row groups and the pushdown
        physically skips every block below the threshold — the footers
        ARE the block-max table.  The prefix is scored exactly
        (score_e10 = floor(idf * imp * 1e10), bit-identical to the
        classic tree), and the answer is PROVEN:

        - a doc read in every query term it contains is EXACT
          (miss_ub == 0);
        - a doc read in only some terms is bounded by partial +
          Sum_missing U_t where U_t = floor(idf_t * I_t * 1e10) — any
          unseen posting of t scores <= U_t by monotonicity;
        - a doc read in no term is bounded by Sum U_t.

        If the k-th exact score strictly beats both bounds, the answer
        is provably identical to the full read.  Otherwise the next
        thresholds come from theta itself when one exists (the largest
        I_t whose outside-bound still clears the running k-th score)
        or halve, and I_t == 0 IS the full read — the descent
        terminates exact unconditionally.  Returns None when no query
        term has enough mass (caller falls through to the classic
        single-read plan)."""
        if k <= 0:
            return None  # classic path returns the empty frame (r13
            # review: rows_k[-1] would IndexError on k == 0)
        terms = list(dict.fromkeys(terms))
        dirty = self._blockmax_dirty()
        stats = self._term_stats_lookup(terms)
        if not dirty:
            present = [t for t in terms if t in stats]
            if not present:
                return None  # classic path returns the empty frame
            if not forced and sum(stats[t][0] for t in present) < \
                    self._BLOCKMAX_MIN_POSTINGS:
                return None  # sparse query: single pruned read is optimal
            n_docs = float(self._meta_n_docs())
            idf = {t: ((n_docs - stats[t][0]) + 0.5) / (stats[t][0] + 0.5)
                   for t in present}
            c_drift = 1.0
            avgdl = None
        else:
            # MUTATED state (r14): micro segments and/or tombstones.
            # Auto mode only pays the per-round full micro reads while
            # they are a small fraction of the thresholdable bootstrap
            # (forced ignores the gate — exactness never depends on it).
            if not forced and self._micro_frac() > \
                    self._BLOCKMAX_MICRO_FRAC:
                return None
            # LIVE semantics, same as the classic plan and the oracle:
            # df/n_docs/avgdl of the live corpus.  A term whose live df
            # is 0 contributes nothing in the classic plan (df comes
            # from the matched live postings) — drop it; a term present
            # ONLY in micro segments has no impact stratum to threshold
            # (thr pinned at 0.0, no unseen mass, U_t = 0) but scores
            # exactly through the full micro read.
            live_df = self._live_df(terms)
            present = [t for t in terms if live_df[t] > 0]
            if not present:
                return None
            if not forced and sum(live_df[t] for t in present) < \
                    self._BLOCKMAX_MIN_POSTINGS:
                return None
            n_docs, avgdl = self._live_corpus_scalars()
            if n_docs <= 0:
                return None  # fully-deleted index: classic path
            idf = {t: ((n_docs - live_df[t]) + 0.5) / (live_df[t] + 0.5)
                   for t in present}
            # avgdl DRIFT factor for the unseen-posting bound: stored
            # imp was computed with the bootstrap's write-time avgdl
            # a_w; the true tf-part with live avgdl a_l satisfies
            # g_live <= max(1, a_l/a_w) * imp  (the denominator
            # tf + 0.3 + 0.9*dl/a is decreasing in a, and
            # D(a_w)/D(a_l) <= a_l/a_w for a_l > a_w).
            ss0 = (self.meta.get("seg_stats") or {}).get(
                self.meta["segments"][0]) or {}
            n0, s0 = int(ss0.get("n_docs", 0)), float(ss0.get("sum_dl", 0))
            a_w = (s0 / n0) if n0 else 0.0
            if a_w <= 0:
                # bootstrap write-time stats unusable (missing/zero
                # sum_dl or n_docs): no sound drift bound can be
                # derived, and a 1.0 fallback defends in the WRONG
                # direction whenever live avgdl exceeds the true
                # write-time avgdl — serve classic (ADVICE r14).
                # Unreachable via build/compact (they always store full
                # {n_docs, sum_dl}); this guards hand-edited or
                # partially-migrated metas.
                return None
            c_drift = max(1.0, avgdl / a_w)
        seg = self.meta["segments"][0]
        base = (self.spark.read
                .schema("token string, doc_id long, imp double")
                .parquet(os.path.join(self.folder, seg, "postings")))
        # the MaxScore split: the clean form replays stored impacts,
        # the dirty form (r15) re-derives live scores with the descent
        # tier's drift-inflated dense bounds; both refuse (None) when
        # the shape/separation doesn't hold and the descent takes over
        if dirty:
            out = self._search_maxscore_split_dirty(
                present, stats, idf, k, c_drift, live_df, n_docs, avgdl)
        else:
            out = self._search_maxscore_split(present, stats, idf,
                                              base, k)
        if out is not None:
            return out
        # start HIGH in the impact order (the round cost is dominated by
        # how many postings enter the doc_id aggregation, so a cheap
        # high-prefix probe beats a safe low one), then descend through
        # the theta-capped ladder.  PROVEN thresholds are memoized per
        # (meta version, terms, k): a repeated serving query re-proves
        # from the known-good frontier in ONE round.
        m = len(present)
        tkey = (self.meta.get("v", 0), tuple(sorted(present)), int(k))
        tc = getattr(self, "_thr_cache", None)
        if tc is None:
            tc = self._thr_cache = {}
        thr = dict(tc.get(tkey) or
                   {t: (stats[t][1] * 0.8 if t in stats else 0.0)
                    for t in present})

        esc = self._sql_str

        _margin = self._rel_margin

        def _ub(t, imp_v):
            """Unseen-posting bound at threshold imp_v for term t.
            Clean: the exact driver-side replay floor(idf*I*1e10).
            Dirty: the true tf-part can exceed the stored imp by the
            avgdl drift factor (g_live <= c_drift * imp, see above),
            plus the relative float margin (_margin).  Conservative
            bounds only deepen the descent, never break the proof."""
            if imp_v <= 0.0:
                return 0  # threshold 0 == everything read: no unseen mass
            if not dirty:
                return self._ub_py(idf[t], imp_v)
            v = idf[t] * (c_drift * imp_v) * 1e10
            return int(math.floor(v)) + _margin(v)

        def _seen_ub(t):
            """Bound on any single posting's contribution for term t —
            the refinement's 'best possible partial' arm.  Clean: the
            term's stored max impact.  Dirty: drift-inflate it, and
            with micro segments present cap at the tf-part's universal
            supremum _TF_SUP = K1+1 (a micro posting is bounded by no footer
            stat)."""
            base_imp = stats[t][1] if t in stats else 0.0
            if not dirty:
                return self._ub_py(idf[t], base_imp)
            cap = c_drift * base_imp
            if len(self.meta["segments"]) > 1:
                cap = max(cap, self._TF_SUP)
            v = idf[t] * cap * 1e10
            return int(math.floor(v)) + _margin(v)

        def _live_frame(pred):
            """Dirty-state round frame: the imp-thresholded bootstrap
            stratum + the micro segments IN FULL, minus scope-correct
            tombstoned rows (the _live anti-join) — tf/dl carried so
            the score is re-derived exactly with the live stats."""
            segs = self.meta["segments"]
            s0 = (self.spark.read
                  .schema("token string, doc_id long, tf double, "
                          "dl double, imp double")
                  .parquet(os.path.join(self.folder, segs[0], "postings"))
                  .where(pred).select("token", "doc_id", "tf", "dl")
                  .withColumn("seg", F.lit(0)))
            parts = [s0]
            for i, nm in enumerate(segs[1:], 1):
                parts.append(
                    self.spark.read
                    .schema("token string, doc_id long, tf double, "
                            "dl double")
                    .parquet(os.path.join(self.folder, nm, "postings"))
                    .where(F.col("token").isin(*present))
                    .withColumn("seg", F.lit(i)))
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
            tomb = self._tomb()
            if tomb is not None:
                df = df.join(
                    F.broadcast(tomb),
                    (df["doc_id"] == tomb["doc_id"])
                    & (tomb["upto_seg"] >= df["seg"]),
                    "left_anti")
            return df

        self.last_blockmax = None
        top, rounds, theta = [], 0, None
        while True:
            rounds += 1
            full_read = all(thr[t] <= 0.0 for t in present)
            # per-term literals: idf (exact score factor) and U_t (the
            # unseen-posting bound at the current threshold) — injected
            # as CASE expressions, not a per-round broadcast join
            u = {t: _ub(t, thr[t]) for t in present}
            if not dirty:
                val = "imp"
            else:
                # exact score re-derivation from tf/dl with the LIVE
                # avgdl literal — the classic _TERM_SCORE tree with the
                # per-term idf folded in as a literal (same IEEE ops,
                # same association, bit-identical)
                val = (f"((tf * 2.2D) / (tf + (1.2D * (0.25D + "
                       f"(0.75D * (dl / {avgdl!r}D))))))")
            s_case = ("CAST(floor((CASE token "
                      + " ".join(f"WHEN '{esc(t)}' THEN {idf[t]!r}D"
                                 for t in present)
                      + " ELSE 0.0D END) * " + val
                      + " * 1e10) AS BIGINT)")
            u_case = ("(CASE token "
                      + " ".join(f"WHEN '{esc(t)}' THEN "
                                 f"CAST({int(u[t])} AS BIGINT)"
                                 for t in present)
                      + " ELSE CAST(0 AS BIGINT) END)")
            pred = None
            for t in present:
                c = (F.col("token") == t) & (F.col("imp") >= thr[t])
                pred = c if pred is None else (pred | c)
            # ONE job per round: rank candidates by key = partial +
            # miss_ub (== the exact score for fully-covered docs, an
            # upper bound otherwise) and TakeOrdered the top k.  The
            # key ordering makes a separate verification pass
            # unnecessary: every non-returned candidate d has
            # true(d) <= key(d) <= key_k, and if it TIES key_k its
            # doc_id is larger by the sort order — it loses the
            # tie-break exactly as in the classic plan.  So the answer
            # is proven by (a) all k returned rows exact, (b) the
            # never-read outside bound strictly below key_k.
            src = _live_frame(pred) if dirty else base.where(pred)
            g = (src
                 .select("doc_id", F.expr(s_case).alias("s"),
                         F.expr(u_case).alias("t_u"))
                 .groupBy("doc_id")
                 .agg(F.sum("s").alias("partial"),
                      F.sum("t_u").alias("cov_u"))
                 .select("doc_id", "partial", "cov_u",
                         (F.lit(int(sum(u.values())))
                          - F.col("cov_u")).alias("miss_ub"))
                 .withColumn("key", F.col("partial") + F.col("miss_ub")))
            # collect a deeper window than k: when the strict top keys
            # are credit-inflated partial docs, the exact rows further
            # down anchor the theta estimate for the next round's cap
            # (a few hundred extra collected rows, one job either way)
            rows_big = (g.orderBy(F.desc("key"), F.asc("doc_id"))
                        .limit(max(k, 256)).collect())
            rows_k = rows_big[:k]
            if full_read:
                top = rows_k  # u == 0 everywhere: keys ARE exact scores
                break
            if len(rows_k) == k and \
                    all(r["miss_ub"] == 0 for r in rows_k):
                theta = int(rows_k[-1]["key"])
                ub_out = sum(u.values())
                # +1 slack on the driver-side bound (the mirrored ops
                # agree bit-for-bit anyway); strict <: an unseen doc
                # tying theta could carry a smaller doc_id
                if ub_out + 1 < theta:
                    top = rows_k
                    break
            # descent heuristic only (correctness is re-proven every
            # round): the LARGEST exact key seen — the strongest score
            # the round verified — estimates the final k-th score; the
            # cap derived from it aims the next round at the provable
            # frontier instead of far below it
            # theta estimate for the next round's cap (heuristic only —
            # correctness is re-proven every round): the best EXACT key
            # seen, or the k-th best partial (partial <= true score, so
            # any k partials lower-bound the final k-th) when heavy
            # duplication floods the window with credit-inflated rows
            exact_keys = [int(r["key"]) for r in rows_big
                          if r["miss_ub"] == 0]
            partials = sorted((int(r["partial"]) for r in rows_big),
                              reverse=True)
            theta = max(
                max(exact_keys, default=0),
                partials[k - 1] if len(partials) >= k else 0) or None
            if rounds >= 6:
                thr = {t: 0.0 for t in present}  # full read, terminate
                continue
            # BLOCKER-GUIDED per-term descent: each non-exact row's
            # cov_u is a subset sum of the per-term U literals, so it
            # DECODES which terms that row is missing (ambiguous sums
            # decode to the union — conservative).  Only the terms that
            # actually blocked the proof (missing in a top-k row)
            # descend; the others hold their prefix — the batch
            # analogue of WAND advancing one cursor.  From round 3 on
            # every term descends (ping-pong guard across templates).
            decode: dict[int, set] = {}
            # 2^m enumeration is driver-side: cap it (r13 review —
            # a ~30-term query would hang here); past the cap every
            # term descends (the geometric ladder still terminates)
            for mask in range(1 << m if m <= 12 else 0):
                ssum = sum(u[present[i]] for i in range(m)
                           if not (mask >> i) & 1)
                decode.setdefault(ssum, set()).update(
                    present[i] for i in range(m) if not (mask >> i) & 1)
            blockers: set = set()
            for r in rows_k:
                if r["miss_ub"] != 0:
                    blockers |= decode.get(int(r["miss_ub"]),
                                           set(present))
            if not blockers or rounds >= 3:
                blockers = set(present)  # ub_out / short-fill / guard
            for t in present:
                if t not in blockers:
                    continue
                cand = thr[t] * 0.6
                if theta is not None and idf[t] > 0:
                    # theta-informed cap: the largest threshold whose
                    # outside-bound still clears theta (0.9 margin).
                    # Jump TO the cap when it sits between the
                    # geometric step and the current threshold — going
                    # below the provable frontier reads more than the
                    # proof needs; the geometric step only takes over
                    # when the cap itself already failed.
                    want = 0.9 * theta / (m * idf[t] * 1e10)
                    if cand < want < thr[t] * 0.98:
                        cand = want
                    elif want < cand:
                        cand = want
                thr[t] = cand if cand * 1e10 * idf[t] >= 1.0 else 0.0
        if len(tc) > 256:
            tc.clear()
        tc[tkey] = dict(thr)  # proven frontier for the next identical call
        if not full_read and \
                tkey not in getattr(self, "_thr_refined", set()):
            # one-time REFINEMENT of the memo: the winners are known, so
            # the tightest useful thresholds are their own per-term
            # impacts (epsilon below the smallest winner imp per term).
            # If the outside-bound still clears theta there, memoize
            # THAT frontier — the next identical query re-proves it in
            # one round reading only the winners' stratum.  Driver-side
            # arithmetic only; a wrong guess just fails that round's
            # proof and descends, so exactness is never at stake.
            refined = getattr(self, "_thr_refined", None)
            if refined is None:
                refined = self._thr_refined = set()
            if len(refined) > 256:
                # same bound as _thr_cache/_ts_cache: stale meta versions
                # never re-prove, so the marker set would otherwise grow
                # one tuple per distinct query forever in a long-lived
                # serving process (r14 ADVICE)
                refined.clear()
            refined.add(tkey)
            ids = [int(r["doc_id"]) for r in top]
            if ids:
                # winners' own impacts, from the bootstrap segment only
                # (a dirty winner's posting may live in a micro segment
                # and carry no imp — the current threshold stands in;
                # the guess is memo-only either way: a wrong frontier
                # just fails the next call's round-1 proof and descends)
                win = (base.where(F.col("token").isin(*present)
                                  & F.col("doc_id").isin(ids))
                       .select("token", "imp").collect())
                mins: dict = {}
                for r in win:
                    v = float(r["imp"])
                    t = r["token"]
                    mins[t] = min(mins.get(t, v), v)
                cand = {t: mins.get(t, thr[t]) * 0.999 for t in present}
                theta_f = int(top[k - 1]["partial"]) if len(top) >= k \
                    else None
                if theta_f is not None and m <= 12 and \
                        all(cand[t] >= thr[t] for t in present):
                    # the refinement must survive CREDIT INFLATION: a
                    # non-winner covered only in subset S carries at
                    # most Sum_S idf*max_imp (its best possible
                    # partial) + Sum_notS U(cand) — if any subset's
                    # bound reaches theta, a raised threshold would
                    # push partial-coverage keys above the winners and
                    # fail every re-proof round.  Check all 2^m
                    # subsets driver-side (m is query-sized).
                    ok = True
                    for mask in range(1 << m):
                        s_bound = sum(
                            _seen_ub(present[i])
                            if (mask >> i) & 1 else
                            _ub(present[i], cand[present[i]])
                            for i in range(m))
                        if mask != (1 << m) - 1 and \
                                s_bound + 1 >= theta_f:
                            ok = False
                            break
                    if ok:
                        tc[tkey] = cand
        self.last_blockmax = {"thr": dict(thr), "full_read": full_read,
                              "rounds": rounds, "dirty": dirty}
        rows = [(int(r["doc_id"]), int(r["partial"]), i + 1)
                for i, r in enumerate(top)]
        return self.spark.createDataFrame(
            rows, "doc_id long, bm25_e10 long, kw_rank int")

    _LIT_PLAN_CAP = 1024  # inline-literal table size bound: past it the
    # analyzer pays more for the expression tree than py4j costs

    def _lit_qid_tok(self, rows) -> DataFrame:
        """Small (qid, token) table as an INLINE literal plan — never
        createDataFrame for per-round driver tables (~0.2 s of
        Arrow/py4j per call, NOTES.md; the descent loop would pay it
        every round).  Falls back to createDataFrame past the cap."""
        rows = list(rows)
        if not rows:
            # empty `array()` carries no qid/token fields, so the s.qid
            # select below would raise AnalysisException — short-circuit
            # to an explicit-schema empty frame (latent-trap guard; all
            # current callers pass non-empty rows)
            return self.spark.createDataFrame(
                [], "qid long, token string")
        if len(rows) > self._LIT_PLAN_CAP:
            return self.spark.createDataFrame(
                [(int(q), t) for q, t in rows], "qid long, token string")
        structs = ", ".join(
            f"struct(bigint({int(q)}) AS qid, "
            f"'{self._sql_str(t)}' AS token)" for q, t in rows)
        return (self.spark.range(1)
                .select(F.explode(F.expr(f"array({structs})"))
                        .alias("s"))
                .select("s.qid", "s.token"))

    def _lit_qid_doc(self, rows) -> DataFrame:
        """Small (qid, doc_id) pair table as an INLINE literal plan —
        same rationale as _lit_qid_tok."""
        rows = list(rows)
        if not rows:
            return self.spark.createDataFrame(
                [], "qid long, doc_id long")
        if len(rows) > self._LIT_PLAN_CAP:
            return self.spark.createDataFrame(
                [(int(q), int(i)) for q, i in rows],
                "qid long, doc_id long")
        structs = ", ".join(
            f"struct(bigint({int(q)}) AS qid, bigint({int(i)}) "
            f"AS doc_id)" for q, i in rows)
        return (self.spark.range(1)
                .select(F.explode(F.expr(f"array({structs})"))
                        .alias("s"))
                .select("s.qid", "s.doc_id"))

    def _split_batch(self, split_q: dict, k: int, idf: dict,
                     stats: dict, dirty: bool, c_drift: float,
                     multi: bool, avgdl, base) -> dict:
        """Batched MaxScore essential/dense split (r15): phase A scores
        the UNION of the split members' essential terms in ONE read
        (per-(qid, doc) partials via the broadcast membership table,
        per-qid top-k under a WindowGroupLimit), phase B fetches the
        union of the kept members' FULL term sets for the bounded
        (qid, doc) candidate PAIRS — three jobs for all members
        together instead of three per member.  Per-member proof is the
        single split's verbatim (theta_E = k-th essential partial;
        slack = Sum dense per-posting bounds, drift-inflated +
        _TF_SUP-capped + margined in dirty states via _dense_seen_ub;
        a doc with no essential posting totals <= slack < theta_E, one
        below the candidate cut totals < theta_E — both strictly under
        the k-th final score).  Any refusal — short essential fill, no
        separation, global 100k candidate-cap overflow — drops the
        member (or all members, for the global cap) back to the
        descent, which is also exact.  Returns {qid: top rows}."""
        esc = self._sql_str
        val = ("imp" if not dirty else
               f"((tf * 2.2D) / (tf + (1.2D * (0.25D + "
               f"(0.75D * (dl / {avgdl!r}D))))))")

        def frame(terms_subset):
            # token-pruned FULL read with the score factor aliased `g`:
            # clean — the bootstrap imp replay; dirty — every segment
            # with tf/dl carried, tombstones anti-joined, the factor
            # re-derived at the live avgdl literal (same IEEE tree as
            # the classic plan — materializing g first leaves the
            # floor(idf * g * 1e10) association unchanged)
            if not dirty:
                return (base
                        .where(F.col("token").isin(*terms_subset))
                        .select("token", "doc_id",
                                F.col("imp").alias("g")))
            segs = self.meta["segments"]
            parts = []
            for i, nm in enumerate(segs):
                parts.append(
                    self.spark.read
                    .schema("token string, doc_id long, tf double, "
                            "dl double")
                    .parquet(os.path.join(self.folder, nm, "postings"))
                    .where(F.col("token").isin(*terms_subset))
                    .withColumn("seg", F.lit(i)))
            dfr = parts[0]
            for p in parts[1:]:
                dfr = dfr.unionByName(p)
            tomb = self._tomb()
            if tomb is not None:
                dfr = dfr.join(
                    F.broadcast(tomb),
                    (dfr["doc_id"] == tomb["doc_id"])
                    & (tomb["upto_seg"] >= dfr["seg"]),
                    "left_anti")
            return dfr.selectExpr("token", "doc_id", f"{val} AS g")

        def s_case(terms):
            return ("CAST(floor((CASE token "
                    + " ".join(f"WHEN '{esc(t)}' THEN {idf[t]!r}D"
                               for t in terms)
                    + " ELSE 0.0D END) * g * 1e10) AS BIGINT)")

        slack = {q: sum(self._dense_seen_ub(t, stats, idf[t], c_drift,
                                            multi, dirty)
                        for t in dns)
                 for q, (_, dns) in split_q.items()}
        ess_union = sorted({t for e, _ in split_q.values() for t in e})
        qt_e = self._lit_qid_tok(
            (q, t) for q, (e, _) in sorted(split_q.items()) for t in e)
        g_e = (frame(ess_union)
               .select("doc_id", "token",
                       F.expr(s_case(ess_union)).alias("s"))
               .join(F.broadcast(qt_e), "token")
               .groupBy("qid", "doc_id")
               .agg(F.sum("s").alias("pe")))
        w = Window.partitionBy("qid").orderBy(F.desc("pe"),
                                              F.asc("doc_id"))
        top_rows = (g_e.withColumn("rn", F.row_number().over(w))
                    .where(F.col("rn") <= k).collect())       # job 1
        top_by_q: dict = {}
        for r in sorted(top_rows, key=lambda r: (r["qid"], r["rn"])):
            top_by_q.setdefault(int(r["qid"]), []).append(r)
        theta: dict = {}
        keep: list = []
        for q in sorted(split_q):
            tq = top_by_q.get(q, [])
            if len(tq) < k:
                continue  # fewer essential docs than k: descent serves
            th = int(tq[-1]["pe"])
            if th <= slack[q] + 1:
                continue  # dense mass could outrank: no separation
            theta[q] = th
            keep.append(q)
        if not keep:
            return {}
        cut_case = ("(CASE qid " + " ".join(
            f"WHEN {int(q)} THEN CAST({int(theta[q] - slack[q])}"
            f" AS BIGINT)" for q in keep)
            + " ELSE CAST(9223372036854775807 AS BIGINT) END)")
        cand = (g_e.where(F.col("qid").isin([int(q) for q in keep])
                          & (F.col("pe") >= F.expr(cut_case)))
                .select("qid", "doc_id")
                .limit(100_001).collect())                    # job 2
        if len(cand) > 100_000:
            return {}  # conservative: every member to the descent
        pairs = [(int(r["qid"]), int(r["doc_id"])) for r in cand]
        all_union = sorted({t for q in keep
                            for t in split_q[q][0] + split_q[q][1]})
        qt_all = self._lit_qid_tok(
            (q, t) for q in keep
            for t in split_q[q][0] + split_q[q][1])
        # candidate DOC filter FIRST, before the qid membership join:
        # joining qt_all against the full dense postings would
        # duplicate every posting row per member sharing the term —
        # exactly the classic batch's cost (measured: the unfiltered
        # order ran the mixed batch at classic parity, 3.94 vs 3.91 s
        # at 1M).  The doc filter mirrors the single split's hit
        # construction (literal isin under the probe cap, broadcast
        # semi-join past it) and cuts the frame to |candidates| x terms
        # rows before any duplication.
        doc_ids = sorted({p[1] for p in pairs})
        hit_f = frame(all_union)
        if len(doc_ids) <= self._PROBE_LITERAL_IDS:
            hit_f = hit_f.where(F.col("doc_id").isin(doc_ids))
        else:
            hit_f = hit_f.join(
                F.broadcast(self.spark.createDataFrame(
                    [(i,) for i in doc_ids], "doc_id long")),
                "doc_id", "left_semi")  # > literal cap: Arrow path
        hit = (hit_f
               .select("doc_id", "token",
                       F.expr(s_case(all_union)).alias("s"))
               .join(F.broadcast(qt_all), "token")
               .join(F.broadcast(self._lit_qid_doc(pairs)),
                     ["qid", "doc_id"], "left_semi")
               .groupBy("qid", "doc_id")
               .agg(F.sum("s").alias("partial")))
        wf = Window.partitionBy("qid").orderBy(F.desc("partial"),
                                               F.asc("doc_id"))
        fin = (hit.withColumn("rn", F.row_number().over(wf))
               .where(F.col("rn") <= k).collect())            # job 3
        out: dict = {}
        for r in sorted(fin, key=lambda r: (r["qid"], r["rn"])):
            out.setdefault(int(r["qid"]), []).append(r)
        return out

    def _dense_seen_ub(self, t, stats, idf_t, c_drift, multi,
                       dirty) -> int:
        """Bound on a single posting's contribution for dense term t —
        the MaxScore splits' slack arm.  Clean: the exact replay of the
        write-time max impact.  Dirty: drift-inflate it and, when micro
        segments exist, cap below by the universal tf-part supremum
        _TF_SUP (a micro posting is bounded by no footer stat), plus
        the relative float margin.  Conservative values only shrink the
        separation window / widen the candidate set."""
        base_imp = stats[t][1] if t in stats else 0.0
        if not dirty:
            return self._ub_py(idf_t, base_imp)
        cap = c_drift * base_imp
        if multi:
            cap = max(cap, self._TF_SUP)
        v = idf_t * cap * 1e10
        return int(math.floor(v)) + self._rel_margin(v)

    @staticmethod
    def _memo_batch_frontier(tc: dict, tkey, terms, thr_eff) -> None:
        """Batch-side threshold-memo write: per-term MAX of the read
        thresholds the member's proof held at and any existing memo
        entry.  Writing thr_eff alone would let a full-read batch mate
        (thr_eff dragged to 0 on shared terms) CLOBBER a mate's hot
        single-query frontier for the rest of the index version — the
        memo is a guess re-proven at every use, so keeping the higher
        value is always sound (a too-high guess fails the next round-1
        proof and descends), while a lowered one silently costs every
        future call the full read."""
        if len(tc) > 256:
            tc.clear()
        prev = tc.get(tkey) or {}
        tc[tkey] = {t: max(thr_eff[t], prev.get(t, 0.0)) for t in terms}

    @staticmethod
    def _rel_margin(v: float) -> int:
        """Float-error margin for a DIRTY bound of magnitude v (in e10
        units).  The stored imp and the re-derived tf-part come from
        different ~6-op double chains, so the accumulated rounding is
        RELATIVE — proportional to score magnitude, not a fixed ulp
        count (ADVICE r14: a df-in-single-digits term at 1M docs has
        idf ~1e5 and score scale ~1e15 e10-units, where a fixed +2
        under-covers).  1e-14 relative ≈ 45× the ~2e-16 per-op epsilon
        over the chain length — generous, and a too-large margin only
        deepens the descent; the floor of 2 keeps the small-score
        regime at the proven r14 margin."""
        return max(2, int(math.ceil(v * 1e-14)))

    @staticmethod
    def _ub_py(idf: float, imp_thr: float) -> int:
        """floor(idf * I * 1e10) — the driver-side mirror of the
        per-posting score at the threshold impact (same IEEE ops as the
        Spark multiplication chain, Python floats are binary64): any
        posting with imp < I scores at most this by monotonicity of
        floor."""
        return int(math.floor(idf * imp_thr * 1e10))

    def _search_blockmax_batch(self, qmap: dict, k: int,
                               forced: bool) -> DataFrame | None:
        """Batched Block-Max early termination — the N-query twin of
        _search_blockmax (r15, VERDICT r14 item 4: `search_batch` was
        classic-only, so an N-query batch paid the pruned-but-full
        postings read even when every member would early-terminate).
        ONE thresholded postings read serves every still-unproven query
        per round:

        - the per-term READ threshold is the min over the active
          queries' ladder/memo thresholds (the union of their
          frontiers), so a shared term is read once at the deepest
          frontier any member needs;
        - idf and the unseen bound U_t at the read threshold are
          per-TERM facts (they do not depend on the query), so one CASE
          expression pair scores the whole batch; the tiny (qid, token)
          membership table broadcasts in, and a qid-partitioned rank
          window (Spark 4 WindowGroupLimit — per-partition top-window
          pruned before the exchange) bounds the collect at
          N * max(k, 256) rows;
        - each query's proof is the single-query proof verbatim (all k
          rows fully covered + the never-read outside bound strictly
          under the k-th key; excluded ties lose the doc_id tie-break
          by the sort order), carried at the READ thresholds — valid
          because any unseen posting of t has imp < thr_eff[t] <= the
          member's own threshold, and a LOWER read threshold only
          tightens U_t;
        - proven queries exit; the rest descend their own ladders
          exactly as the single-query path does (blocker-guided,
          theta-capped, full read by round 6 — unconditional exactness).

        The threshold memo is SHARED with the single-query path per
        (version, sorted terms, k) — single and batch serving warm each
        other, and the frontier memoized for a member is the per-term
        MAX of thr_eff at its proof and any existing memo entry
        (_memo_batch_frontier — a full-read mate must not clobber a hot
        frontier).  Steady
        state (warm memos — the serving shape) proves every member in
        round 1: ONE job per batch instead of one per query.  Dirty
        states ride the same live-stats score re-derivation and
        drift-inflated bounds as the single-query dirty mode; the
        MaxScore split and the winners-impact refinement stay
        single-query features.  Returns None when the state/cost gates
        refuse (the classic batch read serves)."""
        if k <= 0:
            return None
        window = max(k, 256)
        if len(qmap) * window > 150_000:
            return None  # bounded-collect discipline (classic serves)
        dirty = self._blockmax_dirty()
        union_terms = sorted({t for ts in qmap.values() for t in ts})
        stats = self._term_stats_lookup(union_terms)
        if not dirty:
            present_all = [t for t in union_terms if t in stats]
            if not present_all:
                return None
            if not forced and sum(stats[t][0] for t in present_all) < \
                    self._BLOCKMAX_MIN_POSTINGS:
                return None
            n_docs = float(self._meta_n_docs())
            idf = {t: ((n_docs - stats[t][0]) + 0.5) / (stats[t][0] + 0.5)
                   for t in present_all}
            c_drift, avgdl = 1.0, None
        else:
            if not forced and self._micro_frac() > \
                    self._BLOCKMAX_MICRO_FRAC:
                return None
            live_df = self._live_df(union_terms)
            present_all = [t for t in union_terms if live_df[t] > 0]
            if not present_all:
                return None
            if not forced and sum(live_df[t] for t in present_all) < \
                    self._BLOCKMAX_MIN_POSTINGS:
                return None
            n_docs, avgdl = self._live_corpus_scalars()
            if n_docs <= 0:
                return None
            idf = {t: ((n_docs - live_df[t]) + 0.5) / (live_df[t] + 0.5)
                   for t in present_all}
            ss0 = (self.meta.get("seg_stats") or {}).get(
                self.meta["segments"][0]) or {}
            n0, s0 = int(ss0.get("n_docs", 0)), float(ss0.get("sum_dl", 0))
            a_w = (s0 / n0) if n0 else 0.0
            if a_w <= 0:
                return None  # unusable bootstrap stats: same guard as
                # the single-query path (no sound drift bound)
            c_drift = max(1.0, avgdl / a_w)
        pres = set(present_all)
        # per-query present terms (an absent term contributes nothing in
        # the classic plan); a query with NO present terms yields no rows
        qterms = {q: [t for t in dict.fromkeys(ts) if t in pres]
                  for q, ts in qmap.items()}
        active = {q for q, ts in qterms.items() if ts}
        results: dict = {q: [] for q in qmap if q not in active}
        seg = self.meta["segments"][0]
        base = (self.spark.read
                .schema("token string, doc_id long, imp double")
                .parquet(os.path.join(self.folder, seg, "postings")))
        esc = self._sql_str
        tc = getattr(self, "_thr_cache", None)
        if tc is None:
            tc = self._thr_cache = {}
        v_meta = self.meta.get("v", 0)
        keys = {q: (v_meta, tuple(sorted(qterms[q])), int(k))
                for q in active}
        thr = {q: dict(tc.get(keys[q]) or
                       {t: (stats[t][1] * 0.8 if t in stats else 0.0)
                        for t in qterms[q]})
               for q in active}

        def _ub(t, imp_v):
            if imp_v <= 0.0:
                return 0
            if not dirty:
                return self._ub_py(idf[t], imp_v)
            v = idf[t] * (c_drift * imp_v) * 1e10
            return int(math.floor(v)) + self._rel_margin(v)

        def _live_frame(pred, act_terms):
            # the single-query dirty frame with the batch's active-term
            # union: thresholded bootstrap + micro segments in full,
            # minus scope-correct tombstoned rows
            segs = self.meta["segments"]
            s0f = (self.spark.read
                   .schema("token string, doc_id long, tf double, "
                           "dl double, imp double")
                   .parquet(os.path.join(self.folder, segs[0],
                                         "postings"))
                   .where(pred).select("token", "doc_id", "tf", "dl")
                   .withColumn("seg", F.lit(0)))
            parts = [s0f]
            for i, nm in enumerate(segs[1:], 1):
                parts.append(
                    self.spark.read
                    .schema("token string, doc_id long, tf double, "
                            "dl double")
                    .parquet(os.path.join(self.folder, nm, "postings"))
                    .where(F.col("token").isin(*act_terms))
                    .withColumn("seg", F.lit(i)))
            dfr = parts[0]
            for p in parts[1:]:
                dfr = dfr.unionByName(p)
            tomb = self._tomb()
            if tomb is not None:
                dfr = dfr.join(
                    F.broadcast(tomb),
                    (dfr["doc_id"] == tomb["doc_id"])
                    & (tomb["upto_seg"] >= dfr["seg"]),
                    "left_anti")
            return dfr

        self.last_blockmax_batch = None
        proved_round: dict = {}
        full_read_info: dict = {}
        rq_round = dict.fromkeys(active, 0)
        # ---- batched MaxScore split routing (r15) --------------------
        # a selective+dense member served by the split LEAVES the
        # descent set, so it stops dragging shared dense terms' read
        # thresholds toward the full read (the measured failure shape
        # of the first r15 batch probe: one mixed member ~= classic
        # parity for the whole batch).  Three bounded jobs serve all
        # split members together; every refusal falls back to the
        # descent — exactness never depends on the routing.
        df_of = ((lambda t: stats[t][0]) if not dirty
                 else (lambda t: live_df[t]))
        multi = len(self.meta["segments"]) > 1
        split_q: dict = {}
        for q in sorted(active):
            ess = [t for t in qterms[q]
                   if df_of(t) <= self._ESSENTIAL_FRAC
                   * max(1.0, n_docs)]
            dns = [t for t in qterms[q] if t not in ess]
            if ess and dns and sum(df_of(t) for t in ess) <= 1_000_000:
                split_q[q] = (ess, dns)
        split_served: list = []
        if split_q:
            served = self._split_batch(split_q, k, idf, stats, dirty,
                                       c_drift, multi, avgdl, base)
            for q, rows_q in served.items():
                results[q] = rows_q
                proved_round[q] = 0  # split phases, not descent rounds
                full_read_info[q] = False
            split_served = sorted(served)
            active = active - set(served)
        round_no = 0
        while active:
            round_no += 1
            act_terms = sorted({t for q in active for t in qterms[q]})
            thr_eff = {t: min(thr[q][t] for q in active if t in thr[q])
                       for t in act_terms}
            u = {t: _ub(t, thr_eff[t]) for t in act_terms}
            full_read = {q: all(thr_eff[t] <= 0.0 for t in qterms[q])
                         for q in active}
            if not dirty:
                val = "imp"
            else:
                val = (f"((tf * 2.2D) / (tf + (1.2D * (0.25D + "
                       f"(0.75D * (dl / {avgdl!r}D))))))")
            s_case = ("CAST(floor((CASE token "
                      + " ".join(f"WHEN '{esc(t)}' THEN {idf[t]!r}D"
                                 for t in act_terms)
                      + " ELSE 0.0D END) * " + val
                      + " * 1e10) AS BIGINT)")
            u_case = ("(CASE token "
                      + " ".join(f"WHEN '{esc(t)}' THEN "
                                 f"CAST({int(u[t])} AS BIGINT)"
                                 for t in act_terms)
                      + " ELSE CAST(0 AS BIGINT) END)")
            pred = None
            for t in act_terms:
                c = (F.col("token") == t) & (F.col("imp") >= thr_eff[t])
                pred = c if pred is None else (pred | c)
            src = (_live_frame(pred, act_terms) if dirty
                   else base.where(pred))
            qt = self._lit_qid_tok(
                (q, t) for q in sorted(active) for t in qterms[q])
            utot_q = {q: sum(u[t] for t in qterms[q]) for q in active}
            utot_case = ("(CASE qid " + " ".join(
                f"WHEN {int(q)} THEN CAST({int(utot_q[q])} AS BIGINT)"
                for q in sorted(active))
                + " ELSE CAST(0 AS BIGINT) END)")
            g = (src
                 .select("doc_id", "token", F.expr(s_case).alias("s"),
                         F.expr(u_case).alias("t_u"))
                 .join(F.broadcast(qt), "token")
                 .groupBy("qid", "doc_id")
                 .agg(F.sum("s").alias("partial"),
                      F.sum("t_u").alias("cov_u"))
                 .withColumn("miss_ub",
                             F.expr(utot_case) - F.col("cov_u"))
                 .withColumn("key", F.col("partial") + F.col("miss_ub")))
            w = Window.partitionBy("qid").orderBy(F.desc("key"),
                                                  F.asc("doc_id"))
            rows = (g.withColumn("rn", F.row_number().over(w))
                    .where(F.col("rn") <= window)
                    .collect())  # ONE job per round, <= N*window rows
            by_q: dict = {}
            for r in sorted(rows, key=lambda r: (r["qid"], r["rn"])):
                by_q.setdefault(int(r["qid"]), []).append(r)
            newly_done = set()
            for q in sorted(active):
                rq_round[q] += 1
                rq = by_q.get(q, [])
                rows_k = rq[:k]
                if full_read[q]:
                    # u == 0 on every term q reads: keys ARE exact
                    results[q] = rows_k
                    full_read_info[q] = True
                    proved_round[q] = round_no
                    newly_done.add(q)
                    self._memo_batch_frontier(tc, keys[q], qterms[q],
                                              thr_eff)
                    continue
                if len(rows_k) == k and \
                        all(r["miss_ub"] == 0 for r in rows_k):
                    theta = int(rows_k[-1]["key"])
                    if utot_q[q] + 1 < theta:
                        results[q] = rows_k
                        full_read_info[q] = False
                        proved_round[q] = round_no
                        newly_done.add(q)
                        self._memo_batch_frontier(tc, keys[q],
                                                  qterms[q], thr_eff)
                        continue
                # descend q's ladder — the single-query logic scoped to q
                exact_keys = [int(r["key"]) for r in rq
                              if r["miss_ub"] == 0]
                partials = sorted((int(r["partial"]) for r in rq),
                                  reverse=True)
                theta = max(
                    max(exact_keys, default=0),
                    partials[k - 1] if len(partials) >= k else 0) or None
                if rq_round[q] >= 6:
                    thr[q] = {t: 0.0 for t in qterms[q]}
                    continue
                m_q = len(qterms[q])
                decode: dict = {}
                for mask in range(1 << m_q if m_q <= 12 else 0):
                    ssum = sum(u[qterms[q][i]] for i in range(m_q)
                               if not (mask >> i) & 1)
                    decode.setdefault(ssum, set()).update(
                        qterms[q][i] for i in range(m_q)
                        if not (mask >> i) & 1)
                blockers: set = set()
                for r in rows_k:
                    if r["miss_ub"] != 0:
                        blockers |= decode.get(int(r["miss_ub"]),
                                               set(qterms[q]))
                if not blockers or rq_round[q] >= 3:
                    blockers = set(qterms[q])
                for t in qterms[q]:
                    if t not in blockers:
                        continue
                    cand = min(thr[q][t], thr_eff[t]) * 0.6
                    if theta is not None and idf[t] > 0:
                        want = 0.9 * theta / (m_q * idf[t] * 1e10)
                        if cand < want < thr_eff[t] * 0.98:
                            cand = want
                        elif want < cand:
                            cand = want
                    thr[q][t] = cand if cand * 1e10 * idf[t] >= 1.0 \
                        else 0.0
            active -= newly_done
        out_rows = []
        for q in sorted(qmap):
            for i, r in enumerate(results.get(q, [])):
                out_rows.append((int(q), int(r["doc_id"]),
                                 int(r["partial"]), i + 1))
        self.last_blockmax_batch = {
            "rounds": round_no, "dirty": dirty,
            "full_read": {q: bool(full_read_info.get(q, False))
                          for q in qmap},
            "proved_round": dict(proved_round),
            "split_served": split_served,
            "thr": {q: dict(tc.get(keys[q]) or {}) for q in keys}}
        return self.spark.createDataFrame(
            out_rows, "qid long, doc_id long, bm25_e10 long, kw_rank int")

    def search(self, terms: Sequence[str], k: int = 10,
               block_max: bool | None = None) -> DataFrame:
        """BM25 top-k over the index — bit-identical to the corpus-scan
        path (queries/hybrid.py search_bm25_topk): same rarity idf, same
        floored-bigint 1e-10 units, same expression tree.  Reads ONLY
        the pruned postings row groups for ``terms`` — dl rides in the
        posting rows (fmt 2), so query cost is O(matching postings) at
        ANY corpus size; the doclen tables are touched only for the
        tombstone-path corpus stats.

        ``block_max``: the fmt-3 EARLY-TERMINATION tier (Block-Max WAND
        re-expressed for a batch engine — _search_blockmax) for dense
        (stop-word) terms, where "matching postings" IS a large corpus
        fraction.  None (default) auto-engages on large maintained
        indexes; True forces it whenever the index state allows
        (compacted, term_stats present); False disables.  Every mode is
        bit-identical — the tier either PROVES its answer exact via
        upper bounds or descends to the full read."""
        terms = [str(t) for t in terms]
        if not terms:
            # would otherwise surface as an opaque py4j error from
            # isin(*[]) — and db.search_text forwards raw user input here
            raise ValueError("empty terms: pass at least one query term")
        if self.meta["segments"] and self.meta.get("fmt", 1) < 2:
            raise Exception(
                "TextIndex was written by an older layout (postings rows "
                "carry no dl column); rebuild() or compact() the index")
        if block_max is not False and self._blockmax_ready():
            want = (block_max is True
                    or self._meta_n_docs() >= self._BLOCKMAX_MIN_DOCS)
            if want:
                out = self._search_blockmax(terms, k,
                                            forced=block_max is True)
                if out is not None:
                    return out
        tf = (self.live_postings()
              .where(F.col("token").isin(*terms))
              .select("token", "doc_id", "tf", "dl"))
        stats = self._corpus_stats()
        df_ = tf.groupBy("token").agg(
            F.count("*").cast("double").alias("df"))
        scored = (tf.join(F.broadcast(df_), "token")
                  .crossJoin(F.broadcast(stats))
                  .withColumn("term_score_e10", F.expr(self._TERM_SCORE))
                  .groupBy("doc_id")
                  .agg(F.sum("term_score_e10").alias("bm25_e10")))
        # top-k FIRST (TakeOrderedAndProject — partial per-partition heaps,
        # never a single-partition sort), THEN ranks over the <= k
        # survivors.  The former global rank window got a WindowGroupLimit
        # prune on Spark 4.x, but its input bound was still "docs matching
        # any term" — for a stop-word term at 100 TB that bound is the
        # corpus funneled into ONE window partition.  Here the window's
        # input is <= k rows by construction (plan pinned in
        # tests/test_textindex.py).
        top = scored.orderBy(F.desc("bm25_e10"), F.asc("doc_id")).limit(k)
        w = Window.orderBy(F.desc("bm25_e10"), F.asc("doc_id"))
        return (top.withColumn("kw_rank", F.row_number().over(w))
                .select("doc_id", "bm25_e10", "kw_rank"))

    def search_batch(self, queries: dict[int, Sequence[str]],
                     k: int = 10,
                     block_max: bool | None = None) -> DataFrame:
        """Multi-query BM25 in ONE postings read — the throughput twin of
        ``search`` (mirrors queries/hybrid.py's corpus-scan batch, and is
        bit-identical to it): the pruned row groups for the UNION of all
        batch terms are read once, the tiny (qid, token) query table
        broadcasts in, scores group by (qid, doc_id), and a
        qid-partitioned rank window (Spark 4 WindowGroupLimit — per-
        partition top-k pruned before the shuffle) keeps each query's
        top-k.  Returns (qid, doc_id, bm25_e10, kw_rank).

        ``block_max``: the fmt-3 early-termination tier, batched
        (_search_blockmax_batch) — one imp-thresholded read per round at
        the union of the members' proven frontiers instead of the
        pruned-but-full union read.  None auto-engages on large
        maintained indexes, True forces (state permitting), False
        disables; every mode is bit-identical (per-query exactness
        proofs or descent to the full read)."""
        # a repeated term within one query contributes once (the single-
        # query path's isin() set semantics)
        qmap = {int(q): list(dict.fromkeys(str(t) for t in ts))
                for q, ts in queries.items()}
        if not qmap:
            raise ValueError("empty batch: pass at least one query")
        if any(not ts for ts in qmap.values()):
            raise ValueError("empty terms: every query needs >= 1 term")
        if self.meta["segments"] and self.meta.get("fmt", 1) < 2:
            raise Exception(
                "TextIndex was written by an older layout (postings rows "
                "carry no dl column); rebuild() or compact() the index")
        if block_max is not False and self._blockmax_ready():
            want = (block_max is True
                    or self._meta_n_docs() >= self._BLOCKMAX_MIN_DOCS)
            if want:
                out = self._search_blockmax_batch(
                    qmap, k, forced=block_max is True)
                if out is not None:
                    return out
        all_terms = sorted({t for ts in qmap.values() for t in ts})
        tf = (self.live_postings()
              .where(F.col("token").isin(*all_terms))
              .select("token", "doc_id", "tf", "dl"))
        df_ = tf.groupBy("token").agg(
            F.count("*").cast("double").alias("df"))
        qterms = self._lit_qid_tok(
            (q, t) for q, ts in sorted(qmap.items()) for t in ts)
        scored = (tf.join(F.broadcast(qterms), "token")
                  .join(F.broadcast(df_), "token")
                  .crossJoin(F.broadcast(self._corpus_stats()))
                  .withColumn("term_score_e10", F.expr(self._TERM_SCORE))
                  .groupBy("qid", "doc_id")
                  .agg(F.sum("term_score_e10").alias("bm25_e10")))
        w = Window.partitionBy("qid").orderBy(F.desc("bm25_e10"),
                                              F.asc("doc_id"))
        return (scored.withColumn("kw_rank", F.row_number().over(w))
                .where(F.col("kw_rank") <= k)
                .select("qid", "doc_id", "bm25_e10", "kw_rank"))

    def search_phrase(self, phrase: Sequence[str], k: int = 10) -> DataFrame:
        """Exact phrase query over the positional postings: doc matches at
        position p iff token i of the phrase sits at p + i for every i —
        computed as the intersection of the per-term position lists shifted
        by their phrase offset (the classic positional-index algorithm).
        Each term's postings are a pushed-down token = '...' read; the
        n-way doc_id join touches only docs containing EVERY term.
        Returns (doc_id, n_occurrences) by occurrences desc, doc_id asc."""
        terms = [str(t) for t in phrase]
        if not terms:
            raise ValueError("empty phrase")
        base = self.live_postings()
        if "positions" not in base.columns:
            raise Exception("postings carry no positions (index built "
                            "before round 8) — rebuild with build()")
        out = None
        for i, t in enumerate(terms):
            p = (base.where(F.col("token") == t)
                 .select("doc_id",
                         F.expr(f"transform(positions, x -> x - {i})")
                         .alias(f"_s{i}")))
            out = p if out is None else out.join(p, "doc_id")
        expr = "_s0"
        for i in range(1, len(terms)):
            expr = f"array_intersect({expr}, _s{i})"
        return (out.select("doc_id",
                           F.expr(f"CAST(size({expr}) AS BIGINT)")
                           .alias("n_occurrences"))
                .where(F.col("n_occurrences") > 0)
                .orderBy(F.desc("n_occurrences"), F.asc("doc_id"))
                .limit(k))

    # -- RAM-tier serving ----------------------------------------------------

    def to_local(self) -> "LocalBM25Searcher":
        """Materialize the live postings + doclen into an in-process BM25
        searcher — the lexical twin of operators/local_serve.py's
        LocalCascadeSearcher: one Spark pass at attach time, then
        single-query keyword serving with NO per-query Spark job (and
        therefore none of the ~0.2 s job floor).  Bit-identical to
        ``search`` (pinned in tests): same rarity idf, same left-assoc
        IEEE-double expression tree, same floored-bigint 1e-10 units —
        Python floats ARE float64, so replaying the exact operation order
        reproduces the scores bit-for-bit.

        Memory is O(total postings) — the RAM-tier trade, same as the
        vector searcher's O(n x dim); beyond one node's RAM you shard
        postings by token range behind a router, exactly like the vector
        shards."""
        rows = (self.live_postings()
                .select("token", "doc_id", "tf").toLocalIterator())
        postings: dict[str, list[tuple[int, float]]] = {}
        for r in rows:
            postings.setdefault(r["token"], []).append(
                (int(r["doc_id"]), float(r["tf"])))
        dl = {int(r["doc_id"]): float(r["dl"])
              for r in self.live_doclen().select("doc_id", "dl").collect()}
        return LocalBM25Searcher(postings, dl)

    def verify_integrity(self, docs_df: DataFrame | None = None
                         ) -> dict[str, int]:
        """Structural audit of the live index state (the lexical twin of
        db.verify_integrity): {check: n_violations}, zero everywhere on a
        healthy index.

        - unique (token, doc_id) in the LIVE postings (tombstone scoping
          must kill every superseded row),
        - tf == len(positions) and tf >= 1 per posting,
        - positions sorted ascending, non-negative,
        - denormalized dl consistent: every posting row of a doc carries
          the same dl, equal to the doc's sum(tf) (the fmt-2 invariant
          that makes BM25 postings-only),
        - doclen-table parity: same doc set, same dl values,
        - the META fast-path corpus stats equal a forced recomputation
          from the live doclen tables (the zero-job stats claim, audited),
        - with docs_df: indexed doc set == the corpus doc set.

        Cost: one pass over live postings + one over the slim doclen
        tables — the audit a pipeline runs after a compaction."""
        from binaryvectordb_spark.operators.expectations import (
            expr_check,
            run_expectations,
            unique,
        )
        lp = self.live_postings()
        base = run_expectations(lp, [
            unique("token", "doc_id"),
            expr_check("tf==len(positions)",
                       F.size("positions").cast("double") != F.col("tf")),
            expr_check("tf>=1", F.col("tf") < 1),
            expr_check("positions_sorted_nonneg",
                       (F.col("positions") != F.array_sort("positions"))
                       | (F.element_at(F.array_sort("positions"), 1) < 0)),
        ])
        out = {f"postings.{r['check']}": int(r["n_violations"])
               for r in base.collect()}
        per_doc = lp.groupBy("doc_id").agg(
            F.sum("tf").alias("s"), F.min("dl").alias("dmin"),
            F.max("dl").alias("dmax"))
        out["postings.dl_consistent"] = per_doc.filter(
            (F.col("dmin") != F.col("dmax"))
            | (F.col("dmin") != F.col("s"))).count()
        dlt = self.live_doclen().select("doc_id", "dl")
        out["doclen.parity"] = (per_doc.join(dlt, "doc_id", "full_outer")
                                .filter(F.col("s").isNull()
                                        | F.col("dl").isNull()
                                        | (F.col("dl") != F.col("s")))
                                .count())
        meta_row = self._corpus_stats().first()
        rec = dlt.agg(F.count("*").cast("double").alias("n"),
                      (F.sum("dl") / F.count("*").cast("double"))
                      .alias("a")).first()
        out["meta.corpus_stats"] = int(
            not (float(meta_row["n_docs"]) == float(rec["n"])
                 and float(meta_row["avgdl"]) == float(rec["a"])))
        if docs_df is not None:
            ids = docs_df.select("doc_id").distinct()
            pid = dlt.select("doc_id")
            out["corpus.extra_indexed"] = pid.join(ids, "doc_id",
                                                   "left_anti").count()
            out["corpus.missing_from_index"] = ids.join(
                pid, "doc_id", "left_anti").count()
        return out


class LocalBM25Searcher:
    """In-process BM25 over collected postings (TextIndex.to_local).

    ``search(terms, k)`` returns [{doc_id, bm25_e10, kw_rank}] identical to
    TextIndex.search().collect() — the scoring replays queries/hybrid.py's
    expression tree operation-for-operation in float64 (K1=1.2, B=0.75,
    rarity idf, floor to bigint 1e-10 units before the per-doc integer
    sum), so fusion layers built on either path agree exactly."""

    def __init__(self, postings: dict[str, list[tuple[int, float]]],
                 dl: dict[int, float]):
        self.postings = postings
        self.dl = dl
        self.n_docs = float(len(dl))
        # sum of integer-valued doubles: exact and fold-order-free, same
        # value as the Spark aggregation / write-time seg_stats
        self.avgdl = (sum(dl.values()) / self.n_docs) if dl else 0.0

    def _partial_scores(self, terms: Sequence[str]) -> dict[int, int]:
        """Per-doc integer (1e-10 units) score sums for ``terms`` over
        THIS searcher's postings — the shard-mergeable unit: each term's
        floored-bigint score is computed where its posting list lives, so
        summing partials across token shards is exact (bigint addition
        is associative)."""
        scores: dict[int, int] = {}
        if not self.dl:
            return scores
        n_docs, avgdl = self.n_docs, self.avgdl
        for t in set(terms):  # a repeated term contributes once, as in the
            plist = self.postings.get(t)     # DataFrame paths' isin() set
            if not plist:
                continue
            df_ = float(len(plist))
            for doc_id, tf in plist:
                # EXACT replay of the SQL tree: ((n-df)+0.5)/(df+0.5) *
                # (tf*2.2)/(tf + (1.2*(0.25 + (0.75*(dl/avgdl))))) * 1e10,
                # left-assoc, each op one correctly-rounded float64 op
                dl_v = self.dl[doc_id]
                s = (((n_docs - df_) + 0.5) / (df_ + 0.5)
                     * ((tf * 2.2) / (tf + (1.2 * (0.25 + (0.75 * (dl_v / avgdl))))))
                     * 1e10)
                scores[doc_id] = scores.get(doc_id, 0) + math.floor(s)
        return scores

    def search(self, terms: Sequence[str], k: int = 10) -> list[dict]:
        terms = [str(t) for t in terms]
        if not terms:
            raise ValueError("empty terms: pass at least one query term")
        scores = self._partial_scores(terms)
        top = sorted(scores.items(), key=lambda t: (-t[1], t[0]))[:k]
        return [{"doc_id": d, "bm25_e10": s, "kw_rank": i + 1}
                for i, (d, s) in enumerate(top)]

    # -- persistence (cross-process lexical serving) -------------------------
    # Mirrors LocalCascadeSearcher.save/load: a plain directory any process
    # (numpy + json, no Spark) loads back bit-identical — the lexical half
    # of a hybrid serving node.

    def save(self, path: str) -> None:
        import numpy as np

        os.makedirs(path, exist_ok=True)
        tokens = sorted(self.postings)
        tok_idx, doc_ids, tfs = [], [], []
        for i, t in enumerate(tokens):
            for d, tf in self.postings[t]:
                tok_idx.append(i)
                doc_ids.append(d)
                tfs.append(tf)
        dl_ids = np.fromiter(self.dl.keys(), dtype=np.int64,
                             count=len(self.dl))
        dl_vals = np.fromiter(self.dl.values(), dtype=np.float64,
                              count=len(self.dl))
        # tmp+replace per file: a racing reader never sees a torn file
        tmp = os.path.join(path, f".arrays.npz.tmp{os.getpid()}")
        with open(tmp, "wb") as f:
            np.savez_compressed(
                f, tok_idx=np.asarray(tok_idx, dtype=np.int32),
                doc_ids=np.asarray(doc_ids, dtype=np.int64),
                tfs=np.asarray(tfs, dtype=np.float64),
                dl_ids=dl_ids, dl_vals=dl_vals)
        os.replace(tmp, os.path.join(path, "arrays.npz"))
        tmp = os.path.join(path, f".tokens.json.tmp{os.getpid()}")
        with open(tmp, "w") as f:
            json.dump(tokens, f)
        os.replace(tmp, os.path.join(path, "tokens.json"))

    @classmethod
    def load(cls, path: str) -> "LocalBM25Searcher":
        import numpy as np

        with open(os.path.join(path, "tokens.json")) as f:
            tokens = json.load(f)
        arrs = np.load(os.path.join(path, "arrays.npz"))
        postings: dict[str, list[tuple[int, float]]] = {}
        for i, d, tf in zip(arrs["tok_idx"].tolist(),
                            arrs["doc_ids"].tolist(),
                            arrs["tfs"].tolist()):
            postings.setdefault(tokens[i], []).append((d, tf))
        dl = dict(zip(arrs["dl_ids"].tolist(), arrs["dl_vals"].tolist()))
        return cls(postings, dl)


class ShardedLocalBM25Searcher:
    """Token-sharded lexical router — the beyond-one-node architecture for
    the RAM BM25 tier, mirroring ShardedLocalCascadeSearcher for vectors.

    Sharding is BY TOKEN (hash), so one shard holds the COMPLETE posting
    list of every token it owns: per-term scores (floored to bigint 1e-10
    units inside the shard, exactly as the single searcher does) are
    computed entirely in one shard, and the router merge is an exact
    integer sum of per-doc partials — associativity of bigint addition
    makes N shards bit-identical to one (pinned in tests).  Corpus stats
    (n_docs, avgdl) are global and replicated to every shard.  Router
    traffic is O(matching docs per term) score pairs — the postings never
    leave their shard."""

    def __init__(self, shards: list[LocalBM25Searcher]):
        self.shards = shards

    @classmethod
    def from_searcher(cls, base: LocalBM25Searcher, n_shards: int = 2
                      ) -> "ShardedLocalBM25Searcher":
        import hashlib

        n_shards = max(1, int(n_shards))
        split: list[dict] = [{} for _ in range(n_shards)]
        for t, plist in base.postings.items():
            # stable process-independent hash: md5 of the token
            h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
            split[h % n_shards][t] = plist
        # every shard sees the GLOBAL dl map: scoring needs dl for any doc
        # its tokens touch, and the stats must be corpus-wide
        return cls([LocalBM25Searcher(p, base.dl) for p in split])

    def search(self, terms: Sequence[str], k: int = 10) -> list[dict]:
        terms = [str(t) for t in terms]
        if not terms:
            raise ValueError("empty terms: pass at least one query term")
        scores: dict[int, int] = {}
        for s in self.shards:
            # per-shard partials over the full term list: a shard simply
            # finds no postings for terms it does not own
            for doc_id, e10 in s._partial_scores(terms).items():
                scores[doc_id] = scores.get(doc_id, 0) + e10
        top = sorted(scores.items(), key=lambda t: (-t[1], t[0]))[:k]
        return [{"doc_id": d, "bm25_e10": sc, "kw_rank": i + 1}
                for i, (d, sc) in enumerate(top)]
