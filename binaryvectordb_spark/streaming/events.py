"""Structured Streaming over the events stream (SURVEY §2.9, all EXT — the
reference is explicitly single-process/batch, README.md:174).

Design: file-source streaming (each arriving parquet file is a micro-batch),
event-time watermarks for bounded state, windowed/sessionized aggregation,
in-watermark dedup, and a foreachBatch sink that applies the reference's
upsert semantics (delete-then-insert, BinaryVectorDB/BinaryVectorDB.py:93-101)
incrementally — i.e. streaming index maintenance.

At scale: state is keyed by (window x group); the watermark bounds it; sinks
are idempotent per micro-batch (foreachBatch MERGE), which is the standard
exactly-once pattern on object storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# streaming requires an explicit schema; ts's declared type depends on the
# fixture's physical encoding, probed from the parquet footer exactly as the
# batch loader does (sources/tables.py events_ts_encoding) — a nanos-assuming
# reader fed micros divides twice and lands every timestamp in January 1970.
_RAW_FIELDS = ("event_id long, {ts}, user_id long, event_type string, "
               "value double, props string")


ROCKSDB_STATE_PROVIDER = ("org.apache.spark.sql.execution.streaming.state."
                          "RocksDBStateStoreProvider")


def use_rocksdb_state(spark: SparkSession, enabled: bool = True) -> None:
    """Switch subsequently-started streaming queries to the RocksDB state
    store.  The default HDFS-backed provider keeps every state row on the
    JVM heap — fine for window×group keys, fatal for 100 TB-scale keyed
    state (billions of dedup or per-user keys): RocksDB spills state to
    local disk with bounded memory, changelog-checkpoints incrementally,
    and is the standard large-state choice.  Per-query semantics are
    identical (pinned by tests/test_streaming.py — same results as the
    default provider bit-for-bit); the provider only changes WHERE state
    lives.  Call before .start(); running queries keep their provider."""
    if enabled:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                       ROCKSDB_STATE_PROVIDER)
    else:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def read_events_stream(spark: SparkSession, events_dir: str,
                       max_files_per_trigger: int | None = None) -> DataFrame:
    from binaryvectordb_spark.sources.tables import events_ts_encoding

    enc = events_ts_encoding(events_dir)
    if enc == "nanos":
        # TIMESTAMP(NANOS) is only readable as int64 via the legacy conf;
        # it must stay set for the lifetime of the (lazy) streaming query.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = _RAW_FIELDS.format(ts="ts long")
    else:
        schema = _RAW_FIELDS.format(ts="ts timestamp")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    out = reader.parquet(events_dir)
    if enc == "nanos":
        out = out.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return out


def tumbling_counts(events: DataFrame, width: str = "1 hour",
                    watermark: str = "10 minutes") -> DataFrame:
    return (events.withWatermark("ts", watermark)
            .groupBy(F.window("ts", width).alias("win"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("value").cast("decimal(15,2)"))
                 .cast("double").alias("sum_value"))
            .select(F.col("win.start").alias("win_start"), "event_type",
                    "n", "sum_value"))


def sliding_counts(events: DataFrame, width: str = "1 hour",
                   slide: str = "30 minutes",
                   watermark: str = "10 minutes") -> DataFrame:
    return (events.withWatermark("ts", watermark)
            .groupBy(F.window("ts", width, slide).alias("win"))
            .agg(F.count("*").alias("n"))
            .select(F.col("win.start").alias("win_start"), "n"))


def session_stats(events: DataFrame, gap: str = "5 minutes",
                  watermark: str = "10 minutes") -> DataFrame:
    return (events.withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
            .agg(F.count("*").alias("n_events"))
            .select("user_id", F.col("win.start").alias("session_start"),
                    F.col("win.end").alias("session_end"), "n_events"))


def stream_dedup(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Keep the first occurrence per (user_id, event_type) within the
    watermark — streaming dropDuplicates with bounded state."""
    return (events.withWatermark("ts", watermark)
            .dropDuplicates(["user_id", "event_type"]))


def run_to_memory(stream_df: DataFrame, name: str) -> DataFrame:
    """Drain the stream with availableNow into an in-memory table (test/dev
    sink); returns the materialized result as a batch DataFrame."""
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode("complete")  # requires an aggregated stream; use
         # run_append_to_memory for non-aggregated ones
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def run_append_to_memory(stream_df: DataFrame, name: str) -> DataFrame:
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def foreach_batch_index_upsert(events: DataFrame, db,
                               checkpoint_dir: str):
    """Incremental index maintenance: every micro-batch of events is folded
    into the BinaryVectorDB with add_documents' delete-then-insert semantics
    (streaming upsert = §2.10 applied per micro-batch).  The batch stays
    DISTRIBUTED end-to-end: add_documents_df embeds executor-side via
    mapInPandas and merges into the bucketed store — no driver collect, so
    a micro-batch can be arbitrarily large."""
    from pyspark.sql import functions as F

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        db.add_documents_df(
            batch_df.select(F.col("event_id").cast("long").alias("doc_id"),
                            F.concat_ws(" ", "event_type", "props")
                            .alias("text")))

    return (events.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).start())


def stateful_user_totals(events: DataFrame,
                         watermark: str = "10 minutes") -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): running
    per-user event count + value total, carried across micro-batches in
    GroupState.  The arbitrary-state API is the escape hatch for operators
    windowed aggregation can't express (SURVEY §2.9) — each key's state is a
    compact tuple, bounded by the key cardinality, not the stream length."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        n, total_cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # integer cents: exact and order-independent across batches.
            # HALF_UP (away from zero) to match the engine-wide rounding
            # contract — pandas .round() is half-even and diverges at .5
            import numpy as np
            v = pdf["value"].to_numpy() * 100.0
            cents = np.sign(v) * np.floor(np.abs(v) + 0.5)
            total_cents += int(cents.sum())
        state.update((n, total_cents))
        yield pd.DataFrame({"user_id": [user_id], "n_events": [n],
                            "total_cents": [total_cents]})

    return (events.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                fn,
                outputStructType="user_id long, n_events long, total_cents long",
                stateStructType="n long, total_cents long",
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def run_update_to_memory(stream_df: DataFrame, name: str) -> DataFrame:
    """Update-mode memory sink (required for applyInPandasWithState's update
    output); availableNow drain."""
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def stream_stream_click_purchase_join(events: DataFrame,
                                      watermark: str = "30 minutes",
                                      max_gap: str = "30 minutes") -> DataFrame:
    """Stream-stream interval join: each purchase joins the clicks of the
    same user within the preceding ``max_gap``.  Both sides are watermarked
    so Spark can bound the join state (the canonical funnel/attribution
    pattern; state is purged past watermark + interval)."""
    clicks = (events.where(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("click_ts"))
              .withWatermark("click_ts", watermark))
    purchases = (events.where(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("p_user"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("purchase_ts"))
                 .withWatermark("purchase_ts", watermark))
    return purchases.join(
        clicks,
        F.expr(f"""
            p_user = c_user AND
            click_ts <= purchase_ts AND
            click_ts >= purchase_ts - INTERVAL {max_gap}
        """))


def stream_static_enrich(events: DataFrame, dim_df: DataFrame,
                         key: str = "user_id") -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins the (slowly
    changing) dimension snapshot — stateless, no watermark needed, and the
    static side broadcasts so the stream never shuffles.  At scale the
    dimension is re-read per micro-batch, picking up dimension updates
    without restarting the query."""
    from pyspark.sql import functions as F
    return events.join(F.broadcast(dim_df), key, "left")


def foreach_batch_rollup(events: DataFrame, out_dir: str,
                         checkpoint_dir: str):
    """Incrementally maintained daily (event_date, event_type) rollup —
    counts and value sums — with EXACTLY-ONCE semantics under micro-batch
    REPLAY.  Additive aggregation is the foreachBatch trap: the sink is
    called at-least-once, so a replayed batch would double-count unless
    the commit is idempotent.  The guard is the same manifest-pointer
    pattern as the DB's txn log: each batch writes its merged table to a
    fresh ``data_v<batch_id>`` dir, then atomically swaps ``meta.json``
    = {data: dir, last_batch: id}; a replayed batch_id <= last_batch is
    skipped, and a crash between data write and meta swap leaves only an
    orphan dir the replay overwrites.  Readers (``read_rollup``) always
    see exactly one committed version.

    Scale: the per-batch delta is a map-side-combined groupBy of the
    micro-batch; the merge touches the (days x types)-sized rollup, never
    the event history — the standard incremental materialized aggregate."""
    import json as _json
    import os as _os

    _os.makedirs(out_dir, exist_ok=True)
    meta_path = _os.path.join(out_dir, "meta.json")
    spark = events.sparkSession

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        meta = {}
        if _os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = _json.load(f)
        if batch_id <= meta.get("last_batch", -1):
            return  # replayed batch: already folded in, skip (exactly-once)
        # value is aggregated in integer CENTS: partial sums of doubles
        # merge in a different fold order than one global sum and drift
        # ULPs, so an incremental rollup must carry an EXACT additive
        # representation (same device as stateful_user_totals)
        delta = (batch_df
                 .groupBy(F.to_date("ts").alias("event_date"), "event_type")
                 .agg(F.count("*").alias("n_events"),
                      F.sum(F.round(F.col("value") * 100).cast("long"))
                      .alias("value_cents")))
        if meta.get("data"):
            cur = spark.read.parquet(_os.path.join(out_dir, meta["data"]))
            merged = (cur.unionByName(delta)
                      .groupBy("event_date", "event_type")
                      .agg(F.sum("n_events").alias("n_events"),
                           F.sum("value_cents").alias("value_cents")))
        else:
            merged = delta
        vdir = f"data_v{batch_id}"
        merged.coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(out_dir, vdir))
        tmp = meta_path + f".tmp{_os.getpid()}"
        with open(tmp, "w") as f:
            _json.dump({"data": vdir, "last_batch": batch_id}, f)
        _os.replace(tmp, meta_path)
        # GC superseded versions (best-effort; the pointer moved already)
        import shutil as _shutil
        for d in _os.listdir(out_dir):
            if d.startswith("data_v") and d != vdir:
                _shutil.rmtree(_os.path.join(out_dir, d),
                               ignore_errors=True)

    return (events.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).start())


def read_rollup(spark: SparkSession, out_dir: str) -> DataFrame:
    """The committed rollup snapshot (meta-pointer read)."""
    import json as _json
    import os as _os

    with open(_os.path.join(out_dir, "meta.json")) as f:
        meta = _json.load(f)
    return spark.read.parquet(_os.path.join(out_dir, meta["data"]))


def foreach_batch_gated_upsert(docs: DataFrame, db, checkpoint_dir: str,
                               gate_log_dir: str, *,
                               j_threshold: float = 0.5):
    """Near-dup-GATED streaming ingest: every micro-batch of (doc_id, text)
    rows is screened against the DB's current corpus AND within the batch
    itself by the MinHash/LSH gate (operators/ingest_gate.py; self-pairs
    excluded, so replays/updates are not rejected against their own prior
    version), only zero-near-dup docs are upserted
    (delete-then-insert semantics, text index maintained by the commit
    hooks), and the per-doc admit/reject record is APPENDED to
    ``gate_log_dir`` as parquet — the audit trail a curation pipeline
    keeps at ingest.

    Scale: the batch band table broadcasts, the corpus never shuffles,
    and the gate record write is O(batch); nothing here collects more
    than the take(1) emptiness probe.  The log is partitioned by
    batch_id with dynamic-partition overwrite, so a replayed micro-batch
    rewrites its own partition — exactly-once log contents under
    foreachBatch's at-least-once execution."""
    from binaryvectordb_spark.operators.ingest_gate import (
        gated_add_documents_df,
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        rec = gated_add_documents_df(db, batch_df, j_threshold=j_threshold)
        # exactly-once log under foreachBatch's at-least-once contract: a
        # replayed batch OVERWRITES its own batch_id partition instead of
        # appending duplicates (the DB upsert side is already idempotent
        # by delete-then-insert); dynamic mode touches only this partition
        (rec.withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(gate_log_dir))

    return (docs.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).start())


def stateful_funnel(events: DataFrame,
                    watermark: str = "10 minutes") -> DataFrame:
    """Incremental funnel progression (applyInPandasWithState): per user,
    carry (first signup ts, first click-after-signup ts, first
    purchase-after-click ts) across micro-batches as epoch-nano longs.
    Each batch's rows are processed in (ts, event_id) order, so for an
    event-time-ordered source the greedy update computes EXACTLY the batch
    funnel (first signup; first click strictly after it; first purchase
    strictly after that) — pinned against the batch definition in
    tests/test_streaming.py.  State is 3 longs/user: bounded by key
    cardinality, not stream length — the funnel over an unbounded stream
    without re-scanning history."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        s, c, p = state.get if state.exists else (None, None, None)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"], ignore_index=True)
        for ts, etype in zip(batch["ts"].astype("int64"),
                             batch["event_type"]):
            if etype == "signup" and s is None:
                s = int(ts)
            elif etype == "click" and s is not None and c is None \
                    and ts > s:
                c = int(ts)
            elif etype == "purchase" and c is not None and p is None \
                    and ts > c:
                p = int(ts)
        state.update((s, c, p))
        stage = 3 if p is not None else 2 if c is not None \
            else 1 if s is not None else 0
        yield pd.DataFrame({"user_id": [user_id], "stage": [stage],
                            "s_ns": [s], "c_ns": [c], "p_ns": [p]})

    return (events.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                fn,
                outputStructType=("user_id long, stage int, s_ns long, "
                                  "c_ns long, p_ns long"),
                stateStructType="s_ns long, c_ns long, p_ns long",
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


# ---------------------------------------------------------------------------
# streaming twins of the event-sequence analytics (VERDICT r9 item 4):
# incrementally maintained transition matrix + cohort retention, built on
# the same exactly-once meta-pointer commit as foreach_batch_rollup.
# ---------------------------------------------------------------------------

def _read_meta(out_dir: str) -> dict:
    import json as _json
    import os as _os

    p = _os.path.join(out_dir, "meta.json")
    if _os.path.exists(p):
        with open(p) as f:
            return _json.load(f)
    return {}


def _state_dir(meta: dict, key: str, out_dir: str) -> str:
    """Committed state-dir name for ``key``, with a descriptive error when
    the store has no committed batch yet (reading before the first
    foreachBatch commit used to raise a bare KeyError — ADVICE r10)."""
    if key not in meta:
        raise FileNotFoundError(
            f"no committed streaming state {key!r} under {out_dir}: the "
            "store has no meta.json entry for it yet (run the writer's "
            "first trigger before reading)")
    return meta[key]


def _commit_meta(out_dir: str, meta: dict, keep: set[str]) -> None:
    """Atomic meta swap + GC of superseded version dirs (the
    foreach_batch_rollup discipline, shared)."""
    import json as _json
    import os as _os
    import shutil as _shutil

    tmp = _os.path.join(out_dir, f"meta.json.tmp{_os.getpid()}")
    with open(tmp, "w") as f:
        _json.dump(meta, f)
    _os.replace(tmp, _os.path.join(out_dir, "meta.json"))
    for d in _os.listdir(out_dir):
        if "_v" in d and d not in keep and not d.startswith("meta.json"):
            _shutil.rmtree(_os.path.join(out_dir, d), ignore_errors=True)


def foreach_batch_transition_matrix(events: DataFrame, out_dir: str,
                                    checkpoint_dir: str):
    """Incrementally maintained first-order transition counts — the
    STREAMING twin of events_transition_matrix, exactly-once under
    micro-batch replay (meta-pointer versioned state, replayed
    batch_id <= last_batch skipped).

    State = two tables: (from_type, to_type, n) counts — bounded by
    |types|² — and the per-user LAST event (user_id, ts, event_id,
    event_type), which stitches the boundary pair between a user's final
    event of one batch and their first event of the next.  Counts are
    additive bigints (exact under any merge order); probabilities are
    derived at READ time (read_transition_matrix) with the same single
    float division as the batch twin.

    ORDERING CONTRACT: micro-batches must partition the stream in
    event-time order per user (a file source fed time-range-split files,
    or a per-key-ordered log) — a cross-batch late event would need
    retraction, which an additive counts table cannot express.  Within a
    batch, (ts, event_id) ordering is handled by the window."""
    import os as _os

    _os.makedirs(out_dir, exist_ok=True)
    spark = events.sparkSession

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        meta = _read_meta(out_dir)
        if batch_id <= meta.get("last_batch", -1):
            return  # replay: already folded in (exactly-once)
        b = batch_df.select("user_id", "ts", "event_id", "event_type")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        within = (b.withColumn("to_type", F.lead("event_type").over(w))
                  .filter(F.col("to_type").isNotNull())
                  .select(F.col("event_type").alias("from_type"),
                          "to_type"))
        firsts = (b.groupBy("user_id")
                  .agg(F.min(F.struct("ts", "event_id", "event_type"))
                       .alias("s"))
                  .select("user_id",
                          F.col("s.event_type").alias("first_type")))
        lasts = (b.groupBy("user_id")
                 .agg(F.max(F.struct("ts", "event_id", "event_type"))
                      .alias("s"))
                 .select("user_id", F.col("s.ts").alias("ts"),
                         F.col("s.event_id").alias("event_id"),
                         F.col("s.event_type").alias("event_type")))
        if meta.get("last"):
            prev = spark.read.parquet(_os.path.join(out_dir, meta["last"]))
            boundary = (prev.select("user_id",
                                    F.col("event_type").alias("from_type"))
                        .join(firsts, "user_id")
                        .select("from_type",
                                F.col("first_type").alias("to_type")))
            pairs = within.unionByName(boundary)
            new_last = (prev.unionByName(lasts)
                        .groupBy("user_id")
                        .agg(F.max(F.struct("ts", "event_id", "event_type"))
                             .alias("s"))
                        .select("user_id", "s.ts", "s.event_id",
                                "s.event_type"))
        else:
            pairs = within
            new_last = lasts
        delta = pairs.groupBy("from_type", "to_type").agg(
            F.count("*").alias("n"))
        if meta.get("counts"):
            cur = spark.read.parquet(_os.path.join(out_dir, meta["counts"]))
            counts = (cur.unionByName(delta)
                      .groupBy("from_type", "to_type")
                      .agg(F.sum("n").alias("n")))
        else:
            counts = delta
        cdir, ldir = f"counts_v{batch_id}", f"last_v{batch_id}"
        counts.coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(out_dir, cdir))
        new_last.coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(out_dir, ldir))
        _commit_meta(out_dir, {"counts": cdir, "last": ldir,
                               "last_batch": batch_id}, {cdir, ldir})

    return (events.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).start())


def read_transition_matrix(spark: SparkSession, out_dir: str) -> DataFrame:
    """Committed transition matrix with row-normalized probabilities —
    the same (from_type, to_type, n, p) schema as the batch twin."""
    import os as _os

    from pyspark.sql import Window

    meta = _read_meta(out_dir)
    counts = spark.read.parquet(
        _os.path.join(out_dir, _state_dir(meta, "counts", out_dir)))
    wf = Window.partitionBy("from_type")
    return counts.select(
        "from_type", "to_type", "n",
        (F.col("n").cast("double")
         / F.sum("n").over(wf).cast("double")).alias("p"))


def foreach_batch_cohort_retention(events: DataFrame, out_dir: str,
                                   checkpoint_dir: str,
                                   horizon_weeks: int | None = None):
    """Incrementally maintained retention matrix — the STREAMING twin of
    events_cohort_retention, exactly-once under replay.

    State = DISTINCT (user_id, cohort_day, week_offset) activity facts,
    held as APPEND-ONLY cohort_day-partitioned SEGMENTS (the textindex
    discipline — VERDICT r10 item 5: the state is O(active user-weeks),
    so a per-batch rewrite of the whole fact set was the one streaming
    twin whose write cost grew with history, and coalesce(1) defeated
    its own docstring's pruning claim).  Per batch:

    - the per-user cohort day is fixed the first time the user appears
      (ordering contract as in foreach_batch_transition_matrix) and
      NEVER moves — enforced structurally since r12: existing users
      take their stored day, bmin only seeds new users, and
      pre-cohort facts (week_offset < 0, possible only under a
      contract violation) are excluded, so a late earlier event
      degrades to stable identity instead of splitting the user
      across two cohorts; the cohort lookup is a column-pruned read
      of the existing segments;
    - candidate facts = the batch's (user, cohort_day, week_offset)
      distinct set; facts already known are removed by an anti-join
      against the prior segments PRUNED to the batch's cohort days
      (partition pruning — facts of other cohorts cannot collide);
    - only the NET-NEW facts are written, as one cohort_day-partitioned
      segment.  Old cohorts' partition files are never touched
      (pinned by tests/test_streaming.py), and segments are disjoint by
      construction, so the read-side distinct count is exact.
    - bounded read-side unions: past _COHORT_COMPACT_SEGMENTS live
      segments the batch folds them into one (amortized O(state·log)).

    Distinct-disjoint segments + the batch_id guard make the merge
    exactly-once under replay.  The aggregate (cohort_day, week_offset,
    n_active) is derived at READ time — countDistinct is NOT additive,
    so the maintained object must be the fact set, not the matrix (the
    standard exact-distinct streaming trade).

    ``horizon_weeks`` (VERDICT r11 item 5 — the production variant the
    r11 docstring only named): cohorts CLOSE once the event-time
    watermark (max day seen, kept in meta) has advanced more than
    ``horizon_weeks`` weeks past their cohort day.  Facts of closed
    cohorts stop being written (the TTL — they could never change the
    open-window matrix), compaction physically drops closed partitions,
    and the read side reports exactly the OPEN window.  The per-user
    cohort assignment moves to its own grow-only map segments (the
    irreducible O(users) identity state — without it a returning user
    of a closed cohort would be misassigned to a fresh open cohort), so
    fact state is O(open cohorts × active users × ≤horizon weeks)
    instead of O(history).  ``None`` keeps the exact unbounded twin.
    The horizon is pinned in meta: a restart with a different value is
    refused in either direction (the matrix served would silently mean
    a different window)."""
    import os as _os

    _os.makedirs(out_dir, exist_ok=True)
    spark = events.sparkSession

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Observation

        meta = _read_meta(out_dir)
        if meta.get("last_batch", -1) >= 0 and \
                meta.get("horizon") != horizon_weeks:
            raise ValueError(
                f"cohort retention state at {out_dir} was maintained "
                f"with horizon_weeks={meta.get('horizon')}; restarting "
                f"with horizon_weeks={horizon_weeks} would serve a "
                "matrix over a DIFFERENT window (wider: closed-cohort "
                "facts were already dropped; narrower: stored facts "
                "would leak past the new horizon) — use the original "
                "value or a fresh state dir")
        if batch_id <= meta.get("last_batch", -1):
            return
        segs = _cohort_segments(meta)
        b = batch_df.select("user_id", F.to_date("ts").alias("d"))
        bmin = b.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
        new_map_segs = list(meta.get("cohort_segs", []))
        wm = meta.get("wm")
        if horizon_weeks is not None:
            # advance the event-time watermark (max day seen; ISO strings
            # compare lexicographically so max() is date order)
            bmax = b.agg(F.max("d")).first()[0]
            if bmax is not None:
                bwm = bmax.isoformat()
                wm = bwm if wm is None or bwm > wm else wm
            prior_map = _cohort_map(spark, out_dir, new_map_segs)
            if prior_map is not None:
                # FIRST-SEEN WINS, enforced structurally (r12 review):
                # an existing user's cohort day never moves, so the
                # persisted map, the written facts, and the read-side
                # matrix can never disagree about a user's cohort.
                # Under the documented ordering contract bmin of an
                # existing user is never earlier than the map's day, so
                # this equals a min(); under a contract violation (a
                # late earlier event) it degrades to stable identity
                # instead of silently splitting the user across two
                # cohorts (the old min() wrote the new smaller day into
                # facts while the grow-only map kept the old one).
                new_users = bmin.join(prior_map.select("user_id"),
                                      "user_id", "left_anti")
                cohorts = prior_map.unionByName(new_users)
            else:
                cohorts, new_users = bmin, bmin
            mdir = f"cmap_v{batch_id}"
            obs_m = Observation()
            (new_users.observe(obs_m, F.count(F.lit(1)).alias("n"))
             .write.mode("overwrite")
             .parquet(_os.path.join(out_dir, mdir)))
            if int(obs_m.get["n"]) == 0:
                import shutil as _shutil
                _shutil.rmtree(_os.path.join(out_dir, mdir),
                               ignore_errors=True)
            else:
                new_map_segs.append(mdir)
            if len(new_map_segs) > _COHORT_COMPACT_SEGMENTS:
                cmdir = f"cmap_v{batch_id}c"
                (_cohort_map(spark, out_dir, new_map_segs)
                 .write.mode("overwrite")
                 .parquet(_os.path.join(out_dir, cmdir)))
                new_map_segs = [cmdir]
        else:
            prior_facts = _cohort_facts(spark, out_dir, segs)
            if prior_facts is not None:
                # first-seen wins here too: with stable identity a
                # user's prior facts all carry ONE cohort day by
                # construction (min() is defensive for legacy state
                # written before the r12 fix, which could split)
                prior_days = (prior_facts.groupBy("user_id")
                              .agg(F.min("cohort_day")
                                   .alias("cohort_day")))
                cohorts = prior_days.unionByName(
                    bmin.join(prior_days.select("user_id"),
                              "user_id", "left_anti"))
            else:
                cohorts = bmin
        cand = (b.join(cohorts, "user_id")
                .select("user_id", "cohort_day",
                        F.expr("CAST(datediff(d, cohort_day) div 7 "
                               "AS BIGINT)").alias("week_offset"))
                # pre-cohort activity (week_offset < 0) only exists
                # under an ordering-contract violation — an existing
                # user's late event from before their fixed cohort day;
                # a retention matrix's domain starts at cohort entry,
                # so such rows are excluded rather than written as
                # negative-offset cells the batch twin cannot produce
                .where(F.col("week_offset") >= 0)
                .distinct())
        if horizon_weeks is not None and wm is not None:
            # the TTL: facts of CLOSED cohorts are never written — they
            # cannot appear in the open-window matrix
            cand = cand.where(_cohort_open(wm, horizon_weeks))
        prior = _cohort_facts(spark, out_dir, segs)
        if prior is not None:
            days = [r[0] for r in
                    cand.select("cohort_day").distinct().collect()]
            pruned = prior.where(F.col("cohort_day").isin(days))
            cand = cand.join(pruned,
                             ["user_id", "cohort_day", "week_offset"],
                             "left_anti")
        fdir = f"facts_v{batch_id}"
        obs = Observation()
        (cand.observe(obs, F.count(F.lit(1)).alias("n"))
         .write.mode("overwrite").partitionBy("cohort_day")
         .parquet(_os.path.join(out_dir, fdir)))
        if int(obs.get["n"]) == 0:
            import shutil as _shutil
            _shutil.rmtree(_os.path.join(out_dir, fdir),
                           ignore_errors=True)
            new_segs = segs
        else:
            new_segs = segs + [fdir]
        if len(new_segs) > _COHORT_COMPACT_SEGMENTS:
            cdir = f"facts_v{batch_id}c"
            fold = _cohort_facts(spark, out_dir, new_segs)
            if horizon_weeks is not None and wm is not None:
                # compaction physically drops closed-cohort partitions:
                # the amortized point where fact state shrinks to the
                # open window
                fold = fold.where(_cohort_open(wm, horizon_weeks))
            (fold.write.mode("overwrite").partitionBy("cohort_day")
             .parquet(_os.path.join(out_dir, cdir)))
            new_segs = [cdir]
        new_meta = {"fact_segs": new_segs, "last_batch": batch_id}
        if horizon_weeks is not None:
            new_meta.update({"horizon": horizon_weeks, "wm": wm,
                             "cohort_segs": new_map_segs})
        _commit_meta(out_dir, new_meta, set(new_segs) | set(new_map_segs))

    return (events.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).start())


def _cohort_open(wm: str, horizon_weeks: int):
    """OPEN-cohort predicate: the watermark has advanced at most
    ``horizon_weeks`` whole weeks past the cohort day."""
    return (F.expr(f"datediff(DATE'{wm}', cohort_day) div 7")
            <= F.lit(int(horizon_weeks)))


def _cohort_map(spark: SparkSession, out_dir: str,
                segs: list[str]) -> DataFrame | None:
    """Grow-only (user_id, cohort_day) assignment map — union of the
    horizon variant's map segments."""
    import os as _os
    if not segs:
        return None
    parts = [spark.read.schema("user_id long, cohort_day date")
             .parquet(_os.path.join(out_dir, s)) for s in segs]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


# live segments past this count are folded into one on the next batch
_COHORT_COMPACT_SEGMENTS = 16


def _cohort_segments(meta: dict) -> list[str]:
    """Live fact-segment dirs; a legacy single-table state ('facts', the
    pre-r11 layout) reads as one segment."""
    if "fact_segs" in meta:
        return list(meta["fact_segs"])
    if "facts" in meta:
        return [meta["facts"]]
    return []


def _cohort_facts(spark: SparkSession, out_dir: str,
                  segs: list[str]) -> DataFrame | None:
    import os as _os
    if not segs:
        return None
    parts = [spark.read.schema(
        "user_id long, week_offset long, cohort_day date")
        .parquet(_os.path.join(out_dir, s)) for s in segs]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def read_cohort_retention(spark: SparkSession, out_dir: str) -> DataFrame:
    """Committed retention matrix — same (cohort_day, week_offset,
    n_active) schema as the batch twin.  Segments hold disjoint facts,
    so the distinct count unions them without re-deduplication cost
    beyond the aggregate itself.  A horizon-bounded state reports
    exactly the OPEN window w.r.t. the committed watermark (facts of
    cohorts that closed since their segment was written are filtered
    here; compaction eventually drops them physically)."""
    meta = _read_meta(out_dir)
    segs = _cohort_segments(meta)
    if not segs:
        raise FileNotFoundError(
            f"no committed streaming state 'fact_segs' under {out_dir}: "
            "run the writer's first trigger before reading")
    facts = _cohort_facts(spark, out_dir, segs)
    if meta.get("horizon") is not None and meta.get("wm") is not None:
        facts = facts.where(_cohort_open(meta["wm"], meta["horizon"]))
    return (facts.groupBy("cohort_day", "week_offset")
            .agg(F.countDistinct("user_id").alias("n_active")))


def foreach_batch_value_histogram(events: DataFrame, out_dir: str,
                                  checkpoint_dir: str):
    """Incrementally maintained EXACT value histogram per event type —
    the streaming twin of events_value_outliers, exactly-once under
    replay (meta-pointer commit, batch_id guard).

    The design point: 3-sigma outlier classification depends on the
    FINAL moments, so per-row verdicts cannot be streamed — a row
    admitted as normal early may be an outlier once later data moves the
    mean.  The maintainable object is the SUFFICIENT STATISTIC: the
    exact (event_type, v_c, cnt) integer-cents histogram, which is
    additive (any merge order), bounded by distinct cents values per
    type (not stream length), and from which read_value_outliers derives
    the batch twin's exact answer — counts, moments, and the
    division-free integer z-test — at any point in time.  Maintain
    statistics, not answers."""
    import os as _os

    _os.makedirs(out_dir, exist_ok=True)
    spark = events.sparkSession

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        meta = _read_meta(out_dir)
        if batch_id <= meta.get("last_batch", -1):
            return
        delta = (batch_df.select(
                    "event_type",
                    F.round(F.col("value") * 100).cast("long").alias("v_c"))
                 .groupBy("event_type", "v_c")
                 .agg(F.count("*").alias("cnt")))
        if meta.get("hist"):
            cur = spark.read.parquet(_os.path.join(out_dir, meta["hist"]))
            merged = (cur.unionByName(delta)
                      .groupBy("event_type", "v_c")
                      .agg(F.sum("cnt").alias("cnt")))
        else:
            merged = delta
        hdir = f"hist_v{batch_id}"
        merged.coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(out_dir, hdir))
        _commit_meta(out_dir, {"hist": hdir, "last_batch": batch_id},
                     {hdir})

    return (events.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).start())


def read_value_outliers(spark: SparkSession, out_dir: str) -> DataFrame:
    """The batch twin's exact output derived from the maintained
    histogram: same integer-cleared 3-sigma test
    ((n·v − S)² > 9·(n·Q − S²)), weights carried by the histogram
    counts."""
    import os as _os

    meta = _read_meta(out_dir)
    h = spark.read.parquet(
        _os.path.join(out_dir, _state_dir(meta, "hist", out_dir)))
    stats = (h.groupBy("event_type")
             .agg(F.sum("cnt").alias("n"),
                  F.sum(F.col("cnt") * F.col("v_c")).alias("s"),
                  F.sum(F.col("cnt").cast("decimal(38,0)")
                        * F.col("v_c").cast("decimal(38,0)")
                        * F.col("v_c").cast("decimal(38,0)")).alias("q")))
    j = h.join(stats, "event_type")
    dev = (F.col("n").cast("decimal(38,0)") * F.col("v_c")
           - F.col("s").cast("decimal(38,0)"))
    var_num = (F.col("n").cast("decimal(38,0)") * F.col("q")
               - F.col("s").cast("decimal(38,0)")
               * F.col("s").cast("decimal(38,0)"))
    out = j.withColumn("is_outlier", dev * dev > 9 * var_num)
    return (out.groupBy("event_type")
            .agg(F.sum("cnt").alias("n_events"),
                 F.sum(F.when(F.col("is_outlier"), F.col("cnt"))
                       .otherwise(0)).cast("bigint").alias("n_outliers"),
                 F.max(F.when(F.col("is_outlier"), F.col("v_c")))
                 .alias("max_outlier_cents")))


# -- KMV bottom-k NDV sketch, streamed ---------------------------------------

KMV_STREAM_K = 128


def _check_bottomk_widening(meta: dict, k: int, out_dir: str,
                            what: str) -> None:
    """Shared k-compatibility guard for bottom-K CRDT state (the KMV
    sketch and the quantile sample): WIDENING k against trimmed state
    would silently claim members already evicted — refuse BEFORE the
    replay guard (a config mismatch is an error even for a replayed
    batch).  SHRINKING is exact and allowed: bottom-k' of a bottom-k
    state is the true bottom-k' (subset property), so a restart with
    smaller k trims once on the next commit and maintains at k' from
    then on (ADVICE r11: the old guard refused both directions with a
    widening-only message)."""
    if k > meta.get("k", k):
        raise ValueError(
            f"{what} state at {out_dir} was maintained with "
            f"k={meta['k']}; widening to k={k} would make it claim "
            f"members it already evicted — use k <= {meta['k']} "
            "(served exactly by trimming) or a fresh state dir")


def _kmv_fold(sk: DataFrame, k: int) -> DataFrame:
    """Fold a distinct (grp, h) sketch table to the read-side schema
    (grp rows + the union-merged ALL row) with the shared estimator —
    used by both kmv_direct and read_kmv_ndv so the two derivations
    cannot drift."""
    from pyspark.sql import Window

    from binaryvectordb_spark.functions.sketch import kmv_estimate

    w_all = Window.partitionBy(F.lit(1)).orderBy("h")
    all_sk = (sk.select("h").distinct()
              .withColumn("grp", F.lit("ALL"))
              .withColumn("rn", F.row_number().over(w_all))
              .where(F.col("rn") <= k).select("grp", "h"))
    return (sk.unionByName(all_sk)
            .groupBy("grp")
            .agg(F.count("*").cast("bigint").alias("n_sketch"),
                 F.max("h").alias("kth_hash"))
            .withColumn("est_ndv", kmv_estimate("n_sketch", "kth_hash", k)))


def kmv_direct(events_df: DataFrame, k: int = KMV_STREAM_K) -> DataFrame:
    """The definitional batch spec the streaming sketch must equal: per
    event_type (plus the union-merged ALL row), the bottom-k user_id
    hash set folded to (grp, n_sketch, kth_hash, est_ndv) with the KMV
    integer estimator (hash + estimator from functions/sketch.py — the
    SAME definitions the batch registry query uses, so stream/batch
    hash-compatibility is by construction)."""
    from pyspark.sql import Window

    from binaryvectordb_spark.functions.sketch import kmv_hash48

    hashed = events_df.select(F.col("event_type").alias("grp"),
                              kmv_hash48("user_id").alias("h")).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    grp_sk = (hashed.withColumn("rn", F.row_number().over(w))
              .where(F.col("rn") <= k).select("grp", "h"))
    return _kmv_fold(grp_sk, k)


def foreach_batch_kmv_sketch(events: DataFrame, out_dir: str,
                             checkpoint_dir: str,
                             k: int = KMV_STREAM_K):
    """Streaming twin of the KMV bottom-k NDV sketch
    (queries/analytics3.py::sketch_kmv_mergeable) — incrementally
    maintained per-event_type distinct-user sketches, exactly-once under
    micro-batch replay (meta-pointer versioned state).

    State = the per-group bottom-k hash SET — a set-union CRDT:
    commutative, associative, AND idempotent, so unlike the sequence
    twins this fold needs NO ordering contract (any event_id/time split
    of the stream converges to the same state), and a replayed batch
    would be harmless even without the meta guard (kept for job
    hygiene).  The strongest member of the exactly-once taxonomy:
    additive counts tolerate reordering but not replay; distinct fact
    sets tolerate both but grow with the data; the KMV set tolerates
    both at CONSTANT state — |types|·k slim rows, so the per-batch
    rewrite is bounded and coalesce(1) is the right physical shape.

    Read-side NDV (read_kmv_ndv) derives per-group estimates AND the
    union-merged ALL row from the same state — the mergeability theorem
    the batch query pins cross-engine."""
    import os as _os

    _os.makedirs(out_dir, exist_ok=True)
    spark = events.sparkSession

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        from binaryvectordb_spark.functions.sketch import kmv_hash48

        meta = _read_meta(out_dir)
        _check_bottomk_widening(meta, k, out_dir, "kmv sketch")
        if batch_id <= meta.get("last_batch", -1):
            return
        delta = (batch_df.select(F.col("event_type").alias("grp"),
                                 kmv_hash48("user_id").alias("h"))
                 .distinct())
        if meta.get("sketch"):
            cur = spark.read.parquet(_os.path.join(out_dir, meta["sketch"]))
            merged = cur.unionByName(delta).distinct()
        else:
            merged = delta
        w = Window.partitionBy("grp").orderBy("h")
        sk = (merged.withColumn("rn", F.row_number().over(w))
              .where(F.col("rn") <= k).select("grp", "h"))
        sdir = f"sketch_v{batch_id}"
        sk.coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(out_dir, sdir))
        _commit_meta(out_dir, {"sketch": sdir, "last_batch": batch_id,
                               "k": k}, {sdir})

    return (events.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).start())


def read_kmv_ndv(spark: SparkSession, out_dir: str) -> DataFrame:
    """(grp, n_sketch, kth_hash, est_ndv) per event_type plus the
    union-merged ALL row, derived from the committed sketch state by
    the same shared fold as the batch spec."""
    import os as _os

    meta = _read_meta(out_dir)
    sk = spark.read.parquet(
        _os.path.join(out_dir, _state_dir(meta, "sketch", out_dir)))
    return _kmv_fold(sk, meta["k"])


# -- bottom-k hash-sample quantiles, streamed --------------------------------

BKQ_STREAM_K = 256
BKQ_STREAM_QS = (25, 50, 75, 90)


def _bkq_rows(events_df: DataFrame) -> DataFrame:
    """(h, event_id, cents) projection shared by the batch spec and the
    streaming delta: h = the shared 48-bit md5 recipe over the unique
    event_id, cents the exact integer value — the same hash family the
    batch registry row samples orders with (analytics3.py::_bkq_sample)."""
    from binaryvectordb_spark.functions.sketch import kmv_hash48

    return events_df.select(
        kmv_hash48("event_id").alias("h"),
        F.col("event_id").cast("long").alias("event_id"),
        F.round(F.col("value") * 100).cast("long").alias("cents"))


def _bkq_bottomk(rows: DataFrame, k: int) -> DataFrame:
    """bottom-K by (h, event_id) over a BOUNDED frame (state ∪ batch
    bottom-K, ≤ 2K rows) — the (h, key) tie-break is the r11 total-order
    boundary rule: a 48-bit collision straddling the K boundary must
    resolve identically on every engine and layout."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.lit(1)).orderBy("h", "event_id")
    return (rows.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k).select("h", "event_id", "cents"))


def bottomk_direct(events_df: DataFrame, k: int = BKQ_STREAM_K) -> DataFrame:
    """The definitional batch spec the streaming sample must equal: the
    K events with the smallest (hash48(event_id), event_id), carrying
    exact integer cents — orderBy + limit, which Spark plans as
    TakeOrderedAndProject (per-partition partial bottom-K, no global
    sort shuffle)."""
    return _bkq_rows(events_df).orderBy("h", "event_id").limit(k)


def bottomk_quantiles(sample: DataFrame,
                      qs=BKQ_STREAM_QS) -> DataFrame:
    """(q, k_sample, est_cents) nearest-rank picks over a committed or
    direct sample — the read-side derivation SHARED by stream and batch
    (rank 1 + (q·(k−1)) div 100, pure integer arithmetic, the exact
    recipe of the oracle row sketch_bottomk_quantiles)."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.lit(1)).orderBy("cents", "event_id")
    rk = sample.withColumn("rn", F.row_number().over(w))
    kc = rk.agg(F.count("*").cast("bigint").alias("k_sample"))
    qdf = sample.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(int(q)) for q in qs])).alias("q"))
    return (qdf.crossJoin(F.broadcast(kc))
            .withColumn("srank", F.expr("1 + (q * (k_sample - 1)) div 100"))
            .join(rk, F.col("srank") == F.col("rn"))
            .select("q", "k_sample", F.col("cents").alias("est_cents")))


def foreach_batch_bottomk_sample(events: DataFrame, out_dir: str,
                                 checkpoint_dir: str,
                                 k: int = BKQ_STREAM_K):
    """Streaming twin of the bottom-k hash-sample quantile sketch
    (queries/analytics3.py::sketch_bottomk_quantiles) — completing
    stream/batch parity for the whole sketch trio (CMS/HLL rollups,
    the KMV NDV twin r11, and now the quantile sample; VERDICT r11
    item 4).

    State = the K rows with the smallest (h, event_id) — merged by the
    SAME set-union bottom-K rule as the KMV sketch, so it inherits the
    full CRDT taxonomy position: commutative, associative, AND
    idempotent (no ordering contract to honor; a replayed batch is
    harmless even without the meta guard, kept for job hygiene), at
    CONSTANT state — k slim rows, so the per-batch rewrite is bounded
    and coalesce(1) is the right physical shape.  Per batch the delta
    is the batch's own bottom-K (TakeOrderedAndProject — no global
    sort), and the merge ranks a ≤2K-row frame.

    Read side (read_bottomk_quantiles) derives the nearest-rank
    quantile estimates through the same integer recipe as the oracle
    row, so at any point in time the stream state answers exactly what
    the batch sample over the same events would."""
    import os as _os

    _os.makedirs(out_dir, exist_ok=True)
    spark = events.sparkSession

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        meta = _read_meta(out_dir)
        _check_bottomk_widening(meta, k, out_dir, "bottom-k sample")
        if batch_id <= meta.get("last_batch", -1):
            return
        delta = bottomk_direct(batch_df, k)
        if meta.get("sample"):
            cur = (spark.read.schema("h long, event_id long, cents long")
                   .parquet(_os.path.join(out_dir, meta["sample"])))
            merged = (cur.unionByName(delta)
                      .dropDuplicates(["h", "event_id"]))
        else:
            merged = delta
        sk = _bkq_bottomk(merged, k)
        sdir = f"sample_v{batch_id}"
        sk.coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(out_dir, sdir))
        _commit_meta(out_dir, {"sample": sdir, "last_batch": batch_id,
                               "k": k}, {sdir})

    return (events.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).start())


def read_bottomk_sample(spark: SparkSession, out_dir: str) -> DataFrame:
    """The committed (h, event_id, cents) sample rows."""
    import os as _os

    meta = _read_meta(out_dir)
    return (spark.read.schema("h long, event_id long, cents long")
            .parquet(_os.path.join(out_dir,
                                   _state_dir(meta, "sample", out_dir))))


def read_bottomk_quantiles(spark: SparkSession, out_dir: str,
                           qs=BKQ_STREAM_QS) -> DataFrame:
    """(q, k_sample, est_cents) derived from the committed sample by the
    same shared derivation as the batch spec."""
    return bottomk_quantiles(read_bottomk_sample(spark, out_dir), qs)
