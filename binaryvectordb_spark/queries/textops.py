"""Text-analysis operators (SURVEY §2.12, all EXT): token statistics,
quality scoring, heuristic language-ID, document fingerprinting — over the
``documents`` fixture.  Pure column expressions; per-row, shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binaryvectordb_spark.functions.text import fingerprint
from binaryvectordb_spark.queries import register
from binaryvectordb_spark.sources.tables import load_table

_STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")
# per-language marker words for the heuristic language-ID; deterministic CASE
# chain with fixed priority (content-based lang-id, SURVEY §2.12)
_LANG_MARKERS = {
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "los", "que", "es"),
    "fr": ("le", "les", "des", "est", "une"),
    "zh": ("de5", "shi4", "zai4"),
}


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        # whitespace token count vs wordish-regex count (BPE-ish pre-tokenizer)
        F.expr("size(regexp_extract_all(text, '[a-z0-9]+', 0))").alias("n_wordish"),
        (F.length(F.col("text")).cast("double") / F.size(toks)).alias("avg_token_len"))


register("text_token_stats", text_token_stats, oracle="""
SELECT doc_id,
       CAST(length(string_split(text, ' ')) AS INTEGER) AS n_tokens,
       CAST(length(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_unique,
       CAST(length(regexp_extract_all(text, '[a-z0-9]+', 0)) AS INTEGER) AS n_wordish,
       CAST(length(text) AS DOUBLE) / length(string_split(text, ' ')) AS avg_token_len
FROM documents
""")


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score: stopword ratio + length band + lexical
    diversity, combined with fixed weights (identical double arithmetic in
    both engines — same operands, same operation order)."""
    d = load_table(spark, sf_dir, "documents")
    toks = "split(text, ' ')"
    stop_list = "array(" + ", ".join(f"'{w}'" for w in _STOPWORDS) + ")"
    stop_ratio = (f"CAST(size(filter({toks}, t -> array_contains({stop_list}, t))) "
                  f"AS DOUBLE) / size({toks})")
    diversity = f"CAST(size(array_distinct({toks})) AS DOUBLE) / size({toks})"
    len_ok = "CASE WHEN n_chars BETWEEN 50 AND 500 THEN 1.0D ELSE 0.0D END"
    return d.select(
        "doc_id",
        F.expr(stop_ratio).alias("stopword_ratio"),
        F.expr(diversity).alias("lexical_diversity"),
        F.expr(f"0.25D * ({stop_ratio}) + 0.5D * ({diversity}) + 0.25D * ({len_ok})")
        .alias("quality_score"))


_DUCK_TOKS = "string_split(text, ' ')"
_DUCK_STOP = "[" + ", ".join(f"'{w}'" for w in _STOPWORDS) + "]"
_DUCK_STOP_RATIO = (f"CAST(length(list_filter({_DUCK_TOKS}, "
                    f"t -> list_contains({_DUCK_STOP}, t))) AS DOUBLE) "
                    f"/ length({_DUCK_TOKS})")
_DUCK_DIVERSITY = (f"CAST(length(list_distinct({_DUCK_TOKS})) AS DOUBLE) "
                   f"/ length({_DUCK_TOKS})")
_DUCK_LEN_OK = ("CASE WHEN n_chars BETWEEN 50 AND 500 THEN CAST(1 AS DOUBLE) "
                "ELSE CAST(0 AS DOUBLE) END")

register("text_quality_score", text_quality_score, oracle=f"""
SELECT doc_id,
       {_DUCK_STOP_RATIO} AS stopword_ratio,
       {_DUCK_DIVERSITY} AS lexical_diversity,
       CAST(0.25 AS DOUBLE) * ({_DUCK_STOP_RATIO})
       + CAST(0.5 AS DOUBLE) * ({_DUCK_DIVERSITY})
       + CAST(0.25 AS DOUBLE) * ({_DUCK_LEN_OK}) AS quality_score
FROM documents
""")


def _marker_count(lang: str, engine: str) -> str:
    words = _LANG_MARKERS[lang]
    lst = ("array(" if engine == "spark" else "[") + \
        ", ".join(f"'{w}'" for w in words) + (")" if engine == "spark" else "]")
    if engine == "spark":
        return f"size(filter(split(text, ' '), t -> array_contains({lst}, t)))"
    return f"length(list_filter(string_split(text, ' '), t -> list_contains({lst}, t)))"


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID with a fixed-priority argmax; evaluated against
    the labeled lang column (confusion counts)."""
    d = load_table(spark, sf_dir, "documents")
    counts = {lg: _marker_count(lg, "spark") for lg in _LANG_MARKERS}
    pred = ("CASE "
            + " ".join(
                f"WHEN {counts[lg]} >= 1 AND "
                + " AND ".join(f"{counts[lg]} >= {counts[other]}"
                               for other in _LANG_MARKERS if other != lg)
                + f" THEN '{lg}'" for lg in ("de", "es", "fr", "zh"))
            + " ELSE 'en' END")
    return (d.select("lang", F.expr(pred).alias("pred_lang"))
            .groupBy("lang", "pred_lang").agg(F.count("*").alias("n")))


_duck_counts = {lg: _marker_count(lg, "duck") for lg in _LANG_MARKERS}
_DUCK_PRED = ("CASE "
              + " ".join(
                  f"WHEN {_duck_counts[lg]} >= 1 AND "
                  + " AND ".join(f"{_duck_counts[lg]} >= {_duck_counts[other]}"
                                 for other in _LANG_MARKERS if other != lg)
                  + f" THEN '{lg}'" for lg in ("de", "es", "fr", "zh"))
              + " ELSE 'en' END")

register("text_lang_id", text_lang_id, oracle=f"""
SELECT lang, {_DUCK_PRED} AS pred_lang, count(*) AS n
FROM documents GROUP BY 1, 2
""")


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint("text").alias("fp"))


register("text_fingerprint", text_fingerprint, oracle="""
SELECT doc_id, md5(array_to_string(list_sort(list_distinct(
    string_split(lower(text), ' '))), ' ')) AS fp
FROM documents
""")


def text_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) corpus profile — the grouped text-statistics rollup
    a pipeline uses to spot skewed shards."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return (d.select("lang", "source", "n_chars", F.size(toks).alias("nt"))
            .groupBy("lang", "source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("sum_chars"),
                 F.sum("nt").alias("sum_tokens"),
                 F.min("n_chars").alias("min_chars"),
                 F.max("n_chars").alias("max_chars")))


register("text_source_profile", text_source_profile, oracle="""
SELECT lang, source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(length(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM documents GROUP BY lang, source
""")


def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pipeline chunking: overlapping token windows (size 32,
    stride 16) per document — the explode-based row generator every
    LLM-data pipeline needs before embedding.  Chunk count derives from the
    token count, so the generator is narrow (no shuffle) and output size is
    linear in corpus tokens.  First 200 docs keep the gate fast."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    toks = d.select("doc_id", F.split(F.col("text"), " ").alias("tokens"))
    n = F.size("tokens")
    idx = F.explode(F.sequence(F.lit(0),
                               F.ceil(n / 16.0).cast("int") - 1)).alias("chunk_idx")
    return (toks.select("doc_id", "tokens", n.alias("n_tokens"), idx)
            .where(F.col("chunk_idx") * 16 < F.col("n_tokens"))
            .select("doc_id", "chunk_idx",
                    F.array_join(F.slice("tokens", F.col("chunk_idx") * 16 + 1, 32), " ")
                    .alias("chunk_text"),
                    F.size(F.slice("tokens", F.col("chunk_idx") * 16 + 1, 32))
                    .alias("n_chunk_tokens")))


register("text_chunk_documents", text_chunk_documents, oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tokens,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents WHERE doc_id < 200
), ex AS (
  SELECT doc_id, tokens, n_tokens,
         unnest(range(0, CAST(ceil(n_tokens / 16.0) AS INTEGER))) AS chunk_idx
  FROM t
)
SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
       array_to_string(list_slice(tokens, chunk_idx * 16 + 1, chunk_idx * 16 + 32), ' ')
         AS chunk_text,
       CAST(len(list_slice(tokens, chunk_idx * 16 + 1, chunk_idx * 16 + 32))
            AS INTEGER) AS n_chunk_tokens
FROM ex WHERE chunk_idx * 16 < n_tokens
""")


# -- training-data pipeline ops (EXT): deterministic splits, sequence
#    packing, term masking — the corpus-preparation stages between dedup
#    and the trainer ---------------------------------------------------------

def text_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash split: bucket = first 2 hex chars of
    md5(doc_id) — 256 buckets, ~80/10/10 by hex-string range.  Hash-based
    (not random) so the assignment is stable across runs, engines, and
    cluster sizes — the property a 100 TB pipeline needs to keep train and
    test disjoint forever; adding data never moves an existing doc."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return (d.select(
        "doc_id", bucket.alias("bucket"),
        F.when(bucket < "cd", "train")
         .when(bucket < "e8", "val")
         .otherwise("test").alias("split"))
        .orderBy("doc_id"))


def text_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic STRATIFIED sampling by hash threshold: per-source
    sampling rates (25% for sources src0-src4, 50% for the rest) applied
    as a comparison on md5(doc_id)'s leading hex — stable across runs,
    engines, and cluster sizes, and each stratum's rate is independent
    (the downsample-overrepresented-sources step of corpus curation).
    Unlike rand()-based sample(), adding data never resamples an existing
    doc.  Output: the kept rows with their stratum and rate."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    rate = F.when(
        F.col("source").isin("src0", "src1", "src2", "src3", "src4"),
        F.lit(0.25)).otherwise(F.lit(0.5))
    thresh = F.when(rate == 0.25, F.lit("40")).otherwise(F.lit("80"))
    return (d.select("doc_id", "source", bucket.alias("bucket"),
                     rate.alias("rate"))
            .where(F.col("bucket") < thresh)
            .orderBy("doc_id"))


register("text_stratified_sample", text_stratified_sample, oracle="""
WITH b AS (
  SELECT doc_id, source,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
         CAST(CASE WHEN source IN ('src0', 'src1', 'src2', 'src3', 'src4')
                   THEN 0.25 ELSE 0.5 END AS DOUBLE) AS rate
  FROM documents)
SELECT doc_id, source, bucket, rate
FROM b
WHERE bucket < (CASE WHEN rate = 0.25 THEN '40' ELSE '80' END)
ORDER BY doc_id
""")


register("text_train_val_test_split", text_train_val_test_split, oracle="""
WITH b AS (SELECT doc_id,
                  substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
           FROM documents)
SELECT doc_id, bucket,
       CASE WHEN bucket < 'cd' THEN 'train'
            WHEN bucket < 'e8' THEN 'val'
            ELSE 'test' END AS split
FROM b ORDER BY doc_id
""")


PACK_BUDGET = 512


def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate consecutive docs (per source, ordered
    by doc_id) into packs of ~PACK_BUDGET tokens — the batch-shaping step
    before LLM training.  pack_id = floor(tokens_before_doc / budget) over
    a running sum, so packing is one window + one agg: no driver loop, no
    UDF, and each source packs independently (parallel at 100 TB)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    w = Window.partitionBy("source").orderBy("doc_id")
    packed = (d.select("source", "doc_id", n_tok.alias("n_tokens"))
              .withColumn("cum", F.sum("n_tokens").over(w))
              .withColumn("pack_id",
                          F.floor((F.col("cum") - F.col("n_tokens"))
                                  / PACK_BUDGET)))
    return (packed.groupBy("source", "pack_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("pack_tokens"),
                 F.min("doc_id").alias("first_doc"),
                 F.max("doc_id").alias("last_doc"))
            .orderBy("source", "pack_id"))


register("text_pack_sequences", text_pack_sequences, oracle=f"""
WITH t AS (SELECT source, doc_id,
                  len(string_split(text, ' ')) AS n_tokens
           FROM documents),
c AS (SELECT source, doc_id, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum
      FROM t),
p AS (SELECT source, doc_id, n_tokens,
             CAST(floor((cum - n_tokens) / {PACK_BUDGET}) AS BIGINT) AS pack_id
      FROM c)
SELECT source, pack_id, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM p GROUP BY source, pack_id ORDER BY source, pack_id
""")


_MASK_PATTERN = r"\b(customer|key|hash|value)\b"


def text_redact_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term masking / redaction: replace a term set with [MASK] and count
    the replacements — the shape of PII scrubbing or vocabulary filtering
    (per-row regexp, shuffle-free; the pattern would be a broadcast list
    at scale)."""
    d = load_table(spark, sf_dir, "documents")
    # pattern goes through the function API as a literal — never through a
    # SQL string literal, where \b would be parsed as a backspace escape
    return (d.where(F.col("doc_id") < 300)
            .select(
                "doc_id",
                F.regexp_replace(F.col("text"), _MASK_PATTERN, "[MASK]")
                .alias("redacted"),
                F.size(F.regexp_extract_all(
                    F.col("text"), F.lit(_MASK_PATTERN), F.lit(0)))
                .alias("n_masked"))
            .orderBy("doc_id"))


register("text_redact_terms", text_redact_terms, oracle=f"""
SELECT doc_id,
       regexp_replace(text, '{_MASK_PATTERN}', '[MASK]', 'g') AS redacted,
       CAST(len(regexp_extract_all(text, '{_MASK_PATTERN}', 0)) AS INTEGER)
         AS n_masked
FROM documents WHERE doc_id < 300 ORDER BY doc_id
""")
