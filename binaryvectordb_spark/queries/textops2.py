"""Training-data curation operators, part 2 (SURVEY §2.12, all EXT):
Gopher-style repetition ratios, benchmark-contamination detection, and a
composite keep/drop filter with per-source stats — the rule families a
100 TB pretraining pipeline runs between ingest and dedup.

All three are pure column expressions or short-key equi-joins: per-row
compute is O(tokens) (docs are KB-sized), the contamination join is blocked
on the shingle string (never all-pairs), and the filter aggregates map-side.
The reference engine has no text pipeline at all (BinaryVectorDB/README.md
is vector-search only); these extend the mandated LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binaryvectordb_spark.functions.text import shingles
from binaryvectordb_spark.queries import register
from binaryvectordb_spark.queries.textops import _STOPWORDS
from binaryvectordb_spark.sources.tables import load_table

# deterministic pseudo-benchmark split for the contamination check: every
# 97th doc plays the role of an eval/benchmark document
_EVAL_MOD = 97


def text_repetition_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule repetition stats per document: fraction of bigram mass
    held by the most frequent bigram, and the duplicate-token fraction.
    The top-bigram scan is O(distinct x total) per row — documents are
    KB-sized, so this stays a narrow per-row expression; nothing shuffles."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks"))
    # r16 (second pass): the documents parquet is one row-group, so the
    # per-row kernel ran serially on one core — repartition the KERNEL
    # INPUT to defaultParallelism (same rationale as dedup._spread; 1.59
    # -> 0.73 s alone at sf0.1).
    d = d.repartition(spark.sparkContext.defaultParallelism)
    d = d.withColumn("bi", shingles("toks", 2))
    # r16: the O(distinct x total) top-bigram scan — an interpreted HOF —
    # was written out twice (the frac and the boolean), and HOFs get no
    # subexpression elimination (CodegenFallback), so every row paid it
    # twice.  Compute the frac ONCE and derive the boolean from the
    # column; `repetitive` is unchanged: the empty-bi CASE arm yielded
    # false and the frac is 0.0 there, and frac is never NULL.
    # (CollapseProject keeps the split: it only inlines single-reference
    # or cheap aliases, and top_bigram_frac is neither.)
    # r16 (second pass): the max bigram FREQUENCY is the max RUN LENGTH
    # of the sorted bigram array — O(n log n) instead of O(distinct x n),
    # exact integer counts either way (value-identity asserted over all
    # sf0.1 docs before landing; 0.65 s serial vs 1.59 s).
    top_frac = (
        "CASE WHEN size(bi) > 0 THEN CAST((aggregate(array_sort(bi), "
        "struct(CAST(NULL AS STRING) AS prev, 0 AS run, 0 AS best), "
        "(s, x) -> struct(x AS prev, "
        "IF(s.prev IS NOT NULL AND x = s.prev, s.run + 1, 1) AS run, "
        "greatest(s.best, IF(s.prev IS NOT NULL AND x = s.prev, "
        "s.run + 1, 1)) AS best))).best AS DOUBLE)"
        " / size(bi) ELSE CAST(0 AS DOUBLE) END")
    inner = d.select(
        "doc_id",
        F.expr("size(toks)").cast("int").alias("n_tokens"),
        F.expr(top_frac).alias("top_bigram_frac"),
        F.expr(
            "CASE WHEN size(toks) > 0 THEN CAST(1 AS DOUBLE) - "
            "CAST(size(array_distinct(toks)) AS DOUBLE) / size(toks) "
            "ELSE CAST(0 AS DOUBLE) END").alias("dup_token_frac"))
    return inner.select(
        "doc_id", "n_tokens", "top_bigram_frac", "dup_token_frac",
        (F.col("top_bigram_frac") > 0.1).alias("repetitive"))


register("text_repetition_ratios", text_repetition_ratios, oracle="""
WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
bg AS (SELECT doc_id, toks,
              list_transform(range(0, greatest(length(toks) - 1, 0)),
                             i -> toks[i+1] || ' ' || toks[i+2]) AS bi
       FROM tk)
SELECT doc_id,
       CAST(length(toks) AS INTEGER) AS n_tokens,
       CASE WHEN length(bi) > 0 THEN CAST(list_max(list_transform(
                list_distinct(bi),
                b -> length(list_filter(bi, x -> x = b)))) AS DOUBLE)
            / length(bi) ELSE CAST(0 AS DOUBLE) END AS top_bigram_frac,
       CASE WHEN length(toks) > 0 THEN CAST(1 AS DOUBLE)
            - CAST(length(list_distinct(toks)) AS DOUBLE) / length(toks)
            ELSE CAST(0 AS DOUBLE) END AS dup_token_frac,
       CASE WHEN length(bi) > 0 AND CAST(list_max(list_transform(
                list_distinct(bi),
                b -> length(list_filter(bi, x -> x = b)))) AS DOUBLE)
            / length(bi) > 0.1 THEN true ELSE false END AS repetitive
FROM bg
""")


def text_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: which training documents share 3-gram
    shingles with the (deterministic) eval split?  3-grams maximize recall at fixture scale (production suites use 8-13-gram windows — one constant).  The canonical pretraining
    hygiene op — at 100 TB this is a broadcast join against the benchmark
    shingle set (eval suites are MBs, corpora are TBs), so the corpus is
    scanned once and never shuffled."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks"))
    sh = d.select("doc_id",
                  F.explode(F.array_distinct(shingles("toks", 3))).alias("s"))
    ev = (sh.where(F.col("doc_id") % _EVAL_MOD == 0)
          .select("s").distinct().withColumn("hit", F.lit(1)))
    train = sh.where(F.col("doc_id") % _EVAL_MOD != 0)
    return (train.join(F.broadcast(ev), "s", "left")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_shingles"),
                 F.count("hit").alias("n_contaminated"))
            .where(F.col("n_contaminated") > 0)
            .select("doc_id", "n_shingles", "n_contaminated",
                    (F.col("n_contaminated").cast("double")
                     / F.col("n_shingles")).alias("contamination_frac")))


register("text_contamination_overlap", text_contamination_overlap, oracle=f"""
WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
shl AS (SELECT doc_id, list_distinct(list_transform(
            range(0, greatest(length(toks) - 2, 0)),
            i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS shs
        FROM tk),
ex AS (SELECT doc_id, unnest(shs) AS s FROM shl),
ev AS (SELECT DISTINCT s FROM ex WHERE doc_id % {_EVAL_MOD} = 0),
tr AS (SELECT doc_id, s FROM ex WHERE doc_id % {_EVAL_MOD} <> 0)
SELECT tr.doc_id,
       COUNT(*) AS n_shingles,
       COUNT(ev.s) AS n_contaminated,
       CAST(COUNT(ev.s) AS DOUBLE) / COUNT(*) AS contamination_frac
FROM tr LEFT JOIN ev ON tr.s = ev.s
GROUP BY tr.doc_id
HAVING COUNT(ev.s) > 0
""")


def text_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite keep/drop filter (Gopher/C4-style rule stack) with
    per-source acceptance stats: mean token length in band, >= 1 stopword,
    length band, low duplicate-token fraction.  One narrow scan + one
    map-side-combined hash-agg; the per-source report is the shape a
    curation dashboard reads."""
    d = load_table(spark, sf_dir, "documents").select(
        "source", "n_chars", F.split(F.col("text"), " ").alias("toks"))
    stop_list = "array(" + ", ".join(f"'{w}'" for w in _STOPWORDS) + ")"
    mean_len = ("(CAST(n_chars AS DOUBLE) - (size(toks) - 1)) / size(toks)")
    dup_frac = ("CAST(1 AS DOUBLE) - CAST(size(array_distinct(toks)) "
                "AS DOUBLE) / size(toks)")
    keep = (f"({mean_len}) BETWEEN 3.0D AND 8.0D "
            f"AND size(filter(toks, t -> array_contains({stop_list}, t))) >= 1 "
            f"AND n_chars BETWEEN 50 AND 500 "
            f"AND ({dup_frac}) < 0.8D")
    return (d.select("source", F.expr(keep).alias("keep"))
            .groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.count_if(F.col("keep")).alias("n_kept"))
            .select("source", "n_docs", "n_kept",
                    (F.col("n_kept").cast("double") / F.col("n_docs"))
                    .alias("keep_rate")))


_DUCK_STOP = "[" + ", ".join(f"'{w}'" for w in _STOPWORDS) + "]"
_DUCK_MEAN_LEN = ("(CAST(n_chars AS DOUBLE) - (length(toks) - 1)) "
                  "/ length(toks)")
_DUCK_DUP = ("CAST(1 AS DOUBLE) - CAST(length(list_distinct(toks)) "
             "AS DOUBLE) / length(toks)")

register("text_gopher_filter", text_gopher_filter, oracle=f"""
WITH tk AS (SELECT source, n_chars, string_split(text, ' ') AS toks
            FROM documents),
flags AS (SELECT source,
                 ({_DUCK_MEAN_LEN}) BETWEEN 3.0 AND 8.0
                 AND length(list_filter(toks,
                     t -> list_contains({_DUCK_STOP}, t))) >= 1
                 AND n_chars BETWEEN 50 AND 500
                 AND ({_DUCK_DUP}) < 0.8 AS keep
          FROM tk)
SELECT source, COUNT(*) AS n_docs,
       COUNT(*) FILTER (WHERE keep) AS n_kept,
       CAST(COUNT(*) FILTER (WHERE keep) AS DOUBLE) / COUNT(*) AS keep_rate
FROM flags
GROUP BY source
""")


def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation funnel — the composition a pretraining pipeline
    actually runs, with per-stage attrition as the output (the number a
    data-quality dashboard shows): ingest -> Gopher-style quality filter
    (the exact rule stack of text_gopher_filter) -> prefix dedup (keep-first
    by the 5-token leading-prefix hash AMONG quality survivors — the
    boilerplate/URL-dedup stand-in; the fixture's full texts are all
    unique, so full-text hashing would leave the stage untested) ->
    decontamination (drop the
    deterministic eval split and any training doc sharing a 3-gram shingle
    with it) -> 50% deterministic hash sample.  One row per stage:
    (stage_idx, stage, n_docs, id_sum) — counts plus an id checksum, so
    the whole pipeline is hash-pinned, not just the tallies.

    Scale: one corpus scan computes every per-row flag; the dedup step is
    one window shuffle on the 16-byte text hash; decontamination is a
    broadcast semi-join against the MB-sized eval shingle set (the corpus
    is never shuffled for it); the sample is a map-side comparison.  Each
    stage's predicate composes as a boolean column, so the funnel costs
    barely more than its most expensive single stage."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", "text",
        F.split(F.col("text"), " ").alias("toks"))
    stop_list = "array(" + ", ".join(f"'{w}'" for w in _STOPWORDS) + ")"
    mean_len = "(CAST(n_chars AS DOUBLE) - (size(toks) - 1)) / size(toks)"
    dup_frac = ("CAST(1 AS DOUBLE) - CAST(size(array_distinct(toks)) "
                "AS DOUBLE) / size(toks)")
    quality = F.expr(
        f"({mean_len}) BETWEEN 3.0D AND 8.0D "
        f"AND size(filter(toks, t -> array_contains({stop_list}, t))) >= 1 "
        f"AND n_chars BETWEEN 50 AND 500 "
        f"AND ({dup_frac}) < 0.8D")

    # contaminated training docs: any distinct 3-shingle shared with the
    # eval split (doc_id % _EVAL_MOD == 0) — broadcast semi, corpus unshuffled
    sh = d.select("doc_id",
                  F.explode(F.array_distinct(shingles("toks", 3))).alias("s"))
    ev = (sh.where(F.col("doc_id") % _EVAL_MOD == 0)
          .select("s").distinct())
    contam = (sh.where(F.col("doc_id") % _EVAL_MOD != 0)
              .join(F.broadcast(ev), "s", "left_semi")
              .select("doc_id").distinct().withColumn("is_contam", F.lit(1)))

    # forced broadcast: contam is the (small) contaminated-id set; without
    # the hint the no-shuffle claim rests on the auto-broadcast threshold
    # and could silently regress to a SortMergeJoin (plan-pinned in
    # tests/test_plans.py::test_curation_funnel_contam_join_broadcast)
    flagged = (d.withColumn("f1", quality)
               .join(F.broadcast(contam), "doc_id", "left"))
    # keep-first among f1 survivors: min f1-doc_id per 5-token-prefix hash
    w = Window.partitionBy(
        F.md5(F.array_join(F.slice(F.col("toks"), 1, 5), " ")))
    flagged = flagged.withColumn(
        "f2", F.col("f1") & (F.col("doc_id") == F.min(
            F.when(F.col("f1"), F.col("doc_id"))).over(w)))
    flagged = flagged.withColumn(
        "f3", F.col("f2") & (F.col("doc_id") % _EVAL_MOD != 0)
        & F.col("is_contam").isNull())
    flagged = flagged.withColumn(
        "f4", F.col("f3")
        & (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "80"))

    stages = F.array(*[
        F.struct(F.lit(i).alias("stage_idx"), F.lit(n).alias("stage"),
                 flag.alias("ok"))
        for i, (n, flag) in enumerate([
            ("ingest", F.lit(True)), ("quality_filter", F.col("f1")),
            ("prefix_dedup", F.col("f2")), ("decontaminate", F.col("f3")),
            ("sample_50pct", F.col("f4"))])])
    return (flagged.select("doc_id", F.explode(stages).alias("st"))
            .where(F.col("st.ok"))
            .groupBy(F.col("st.stage_idx").alias("stage_idx"),
                     F.col("st.stage").alias("stage"))
            .agg(F.count("*").alias("n_docs"),
                 F.sum("doc_id").alias("id_sum"))
            .orderBy("stage_idx"))


register("curation_funnel", curation_funnel, oracle=f"""
WITH tk AS (SELECT doc_id, source, n_chars, text,
                   string_split(text, ' ') AS toks FROM documents),
shl AS (SELECT doc_id, list_distinct(list_transform(
            range(0, greatest(length(toks) - 2, 0)),
            i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS shs
        FROM tk),
ex AS (SELECT doc_id, unnest(shs) AS s FROM shl),
ev AS (SELECT DISTINCT s FROM ex WHERE doc_id % {_EVAL_MOD} = 0),
contam AS (SELECT DISTINCT e.doc_id FROM ex e JOIN ev ON e.s = ev.s
           WHERE e.doc_id % {_EVAL_MOD} <> 0),
f1 AS (SELECT doc_id, toks,
              ({_DUCK_MEAN_LEN}) BETWEEN 3.0 AND 8.0
              AND length(list_filter(toks,
                  t -> list_contains({_DUCK_STOP}, t))) >= 1
              AND n_chars BETWEEN 50 AND 500
              AND ({_DUCK_DUP}) < 0.8 AS f1
       FROM tk),
f2 AS (SELECT doc_id, f1,
              f1 AND doc_id = min(CASE WHEN f1 THEN doc_id END)
                  OVER (PARTITION BY md5(array_to_string(toks[1:5], ' ')))
                AS f2
       FROM f1),
f4 AS (SELECT doc_id, f1, f2,
              f2 AND doc_id % {_EVAL_MOD} <> 0
                 AND doc_id NOT IN (SELECT doc_id FROM contam) AS f3,
              f2 AND doc_id % {_EVAL_MOD} <> 0
                 AND doc_id NOT IN (SELECT doc_id FROM contam)
                 AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80' AS f4
       FROM f2),
st AS (
  SELECT 0 AS stage_idx, 'ingest' AS stage, doc_id FROM f4
  UNION ALL SELECT 1, 'quality_filter', doc_id FROM f4 WHERE f1
  UNION ALL SELECT 2, 'prefix_dedup', doc_id FROM f4 WHERE f2
  UNION ALL SELECT 3, 'decontaminate', doc_id FROM f4 WHERE f3
  UNION ALL SELECT 4, 'sample_50pct', doc_id FROM f4 WHERE f4)
SELECT stage_idx, stage, count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM st GROUP BY stage_idx, stage ORDER BY stage_idx
""")


# modeled postings row-group size (rows) and probe terms for the pruning
# profile: three common tokens, one mid, one absent
_PG = 256
_PRUNE_TERMS = ["filter", "hash", "join", "vector", "zzzabsent"]


def textindex_prune_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level pruning profile of the text index's postings layout
    as DATA (the layout_zorder_clustering pattern applied to postings —
    NOTES r10 candidate): model the persisted index's physical order
    (``repartitionByRange(token).sortWithinPartitions(token, doc_id)``,
    operators/textindex.py _write_segment) as contiguous row groups of
    ``_PG`` postings in global (token, doc_id) order, and report, per
    probe term, how many groups — and how much posting mass — a footer
    min/max-pruned ``In(token)`` read must touch.  This is the indexed
    BM25 path's byte-skipping claim (bm25_indexed vs bm25_scan) engine-
    checked deterministically instead of wall-clocked.

    All counts are exact integers; the one fraction is a single division
    of exact integers (bit-stable across engines).  The global postings
    rank comes from operators/ranks.with_global_rank — no un-partitioned
    window funnels the corpus (the r10 scale-safe discipline); the
    touched-group probe is a broadcast theta-join of a 5-row literal
    against the group-stats frame (O(groups) rows, never the corpus)."""
    from binaryvectordb_spark.operators.ranks import with_global_rank

    d = load_table(spark, sf_dir, "documents")
    postings = (d.select("doc_id",
                         F.explode(F.split("text", " ")).alias("token"))
                .select("token", "doc_id").distinct())
    ranked, _ = with_global_rank(postings, ["token", "doc_id"], "rn")
    groups = (ranked
              .groupBy(F.expr(f"(rn - 1) DIV {_PG}").alias("grp"))
              .agg(F.min("token").alias("mn"), F.max("token").alias("mx"),
                   F.count("*").alias("n")))
    tot = groups.agg(F.count("*").alias("n_groups"),
                     F.sum("n").alias("total_rows"))
    terms = spark.createDataFrame([(t,) for t in _PRUNE_TERMS],
                                  "term string")
    touched = (terms.join(
        F.broadcast(groups),
        (F.col("mn") <= F.col("term")) & (F.col("term") <= F.col("mx")),
        "left")
        .groupBy("term")
        .agg(F.count("grp").alias("touched_groups"),
             F.coalesce(F.sum("n"), F.lit(0)).alias("touched_rows")))
    return (touched.crossJoin(F.broadcast(tot))
            .select("term", "n_groups", "touched_groups", "touched_rows",
                    "total_rows",
                    (F.col("touched_groups").cast("double")
                     / F.col("n_groups").cast("double"))
                    .alias("group_fraction"))
            .orderBy("term"))


register("textindex_prune_stats", textindex_prune_stats, oracle=f"""
WITH p AS (
  SELECT DISTINCT token, doc_id FROM (
    SELECT unnest(string_split(text, ' ')) AS token, doc_id FROM documents)
), r AS (
  SELECT token, doc_id, row_number() OVER (ORDER BY token, doc_id) AS rn
  FROM p
), g AS (
  SELECT (rn - 1) // {_PG} AS grp, min(token) AS mn, max(token) AS mx,
         count(*) AS n
  FROM r GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_groups,
         CAST(sum(n) AS BIGINT) AS total_rows FROM g
), t(term) AS (
  VALUES {", ".join(f"('{t}')" for t in _PRUNE_TERMS)}
), tc AS (
  SELECT term, CAST(count(g.grp) AS BIGINT) AS touched_groups,
         CAST(COALESCE(sum(g.n), 0) AS BIGINT) AS touched_rows
  FROM t LEFT JOIN g ON g.mn <= t.term AND t.term <= g.mx
  GROUP BY term
)
SELECT term, n_groups, touched_groups, touched_rows, total_rows,
       CAST(touched_groups AS DOUBLE) / CAST(n_groups AS DOUBLE)
         AS group_fraction
FROM tc CROSS JOIN tot ORDER BY term
""")
