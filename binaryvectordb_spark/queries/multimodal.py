"""Multimodal queries (SURVEY §2.12): binary payload columns + typed
metadata + pandas-UDF feature extraction, joined with embeddings.

The decode oracle recomputes the byte statistics arithmetically from the md5
hex string (the payload is unhex(md5(text))), so even the mapInPandas path is
value-hash-checked — the stub decode is deterministic by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binaryvectordb_spark.operators.multimodal import (
    decode_features,
    with_fake_payload,
)
from binaryvectordb_spark.queries import register
from binaryvectordb_spark.sources.tables import load_table


def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per asset: payload size + typed metadata + modality flags from
    the embeddings join (text+image+vector in one DataFrame)."""
    d = with_fake_payload(load_table(spark, sf_dir, "documents"))
    e = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), F.lit(True).alias("has_embedding"))
    return (d.join(e, "doc_id", "left")
            .select("doc_id",
                    F.length("image_bytes").alias("n_bytes"),
                    F.col("meta.width").alias("width"),
                    F.col("meta.height").alias("height"),
                    F.col("meta.format").alias("format"),
                    F.coalesce("has_embedding", F.lit(False))
                    .alias("has_embedding")))


register("multimodal_metadata", multimodal_metadata, oracle="""
SELECT d.doc_id,
       CAST(octet_length(unhex(md5(text))) AS INTEGER) AS n_bytes,
       CAST(64 + d.doc_id % 64 AS INTEGER) AS width,
       CAST(64 + n_chars % 128 AS INTEGER) AS height,
       ['png', 'jpeg', 'webp'][CAST(d.doc_id % 3 AS INTEGER) + 1] AS format,
       (e.vec_id IS NOT NULL) AS has_embedding
FROM documents d LEFT JOIN embeddings e ON e.vec_id = d.doc_id
""")


def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode path; oracle recomputes byte stats from the md5
    hex pairs (16 bytes)."""
    d = with_fake_payload(load_table(spark, sf_dir, "documents"))
    return decode_features(d)


_BYTE = "CAST('0x' || substring(md5(text), 2 * i - 1, 2) AS INTEGER)"

register("multimodal_decode_features", multimodal_decode_features, oracle=f"""
WITH b AS (SELECT doc_id, list_transform(range(1, 17), i -> {_BYTE}) AS bytes
           FROM documents)
SELECT doc_id,
       CAST(16 AS INTEGER) AS n_bytes,
       CAST(list_sum(list_transform(bytes, x -> CAST(x AS DOUBLE))) AS DOUBLE) / 16
         AS mean_byte,
       CAST(list_max(bytes) AS INTEGER) AS max_byte,
       CAST(list_sum(bytes) AS BIGINT) AS checksum
FROM b
""")


def multimodal_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL image decode, oracle-checked: deterministic striped P6 PPM
    payloads (header with comment line + raw RGB plane) go through the
    pure-numpy decode_ppm parser on mapInPandas; the oracle recomputes the
    closed-form stripe means with integer arithmetic.  This upgrades the
    multimodal row from byte-stats-on-a-stub to a real parse->reshape->
    reduce decode path — only COMPRESSED formats remain stubbed."""
    from binaryvectordb_spark.operators.multimodal import (
        decode_ppm_features,
        with_ppm_payload,
    )
    d = load_table(spark, sf_dir, "documents")
    return decode_ppm_features(with_ppm_payload(d))


# registered below, after _STRIPE_ORACLE: both payload generators derive
# from the same _stripe_pixels images, so the PPM and PNG decodes share one
# closed-form stripe-mean oracle


_STRIPE_ORACLE = """
WITH p AS (SELECT doc_id,
                  4 + doc_id % 5 AS w, 2 + doc_id % 7 AS h,
                  (doc_id * 3) % 256 AS ra, (doc_id * 5) % 256 AS ga,
                  (doc_id * 7) % 256 AS ba,
                  (doc_id * 11 + 1) % 256 AS rb, (doc_id * 13 + 2) % 256 AS gb,
                  (doc_id * 17 + 3) % 256 AS bb
           FROM documents)
SELECT doc_id,
       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       CAST(((h + 1) // 2) * w * ra + (h // 2) * w * rb AS DOUBLE) / (h * w)
         AS mean_r,
       CAST(((h + 1) // 2) * w * ga + (h // 2) * w * gb AS DOUBLE) / (h * w)
         AS mean_g,
       CAST(((h + 1) // 2) * w * ba + (h // 2) * w * bb AS DOUBLE) / (h * w)
         AS mean_b
FROM p
"""


def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL compressed-image decode, oracle-checked: the deterministic
    striped images are PNG-ENCODED (zlib deflate, per-row filter types
    cycling None/Sub/Up/Average/Paeth) and decoded back by the pure
    stdlib-zlib+numpy decode_png (chunk walk + CRC check + inflate +
    unfilter) on mapInPandas.  The oracle recomputes the closed-form stripe
    means with integer arithmetic — any unfilter or inflate mistake breaks
    the hash.  This removes the last decoder stub: PPM (uncompressed) and
    PNG (compressed) both decode for real; only jpeg/webp remain external."""
    from binaryvectordb_spark.operators.multimodal import (
        decode_png_features,
        with_png_payload,
    )
    d = load_table(spark, sf_dir, "documents")
    return decode_png_features(with_png_payload(d))


register("multimodal_ppm_decode", multimodal_ppm_decode,
         oracle=_STRIPE_ORACLE)
register("multimodal_png_decode", multimodal_png_decode,
         oracle=_STRIPE_ORACLE)


def multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL lossy-codec decode, oracle-checked: deterministic 8-row-band
    grayscale images are baseline-JPEG-ENCODED (operators/jpeg.py — DCT,
    flat-8 quantizer, canonical Huffman in DHT) and decoded back by the
    pure numpy+stdlib decode_jpeg on mapInPandas.  Constant 8x8 blocks
    with DC quant step 8 round-trip bit-exact (module docstring), so the
    oracle recomputes the closed-form band means/edges with integer
    arithmetic — a Huffman, dequant, or IDCT mistake breaks the hash.
    With PPM (raw), PNG (lossless compressed), and JPEG (lossy DCT), only
    webp still needs an external codec."""
    from binaryvectordb_spark.operators.multimodal import (
        decode_jpeg_features,
        with_jpeg_payload,
    )
    d = load_table(spark, sf_dir, "documents")
    return decode_jpeg_features(with_jpeg_payload(d))


register("multimodal_jpeg_decode", multimodal_jpeg_decode, oracle="""
WITH p AS (SELECT doc_id,
                  8 * (1 + doc_id % 3) AS w,
                  2 + doc_id % 4 AS bands,
                  (doc_id * 3) % 256 AS ga,
                  (doc_id * 11 + 1) % 256 AS gb
           FROM documents)
SELECT doc_id,
       CAST(w AS INTEGER) AS width,
       CAST(bands * 8 AS INTEGER) AS height,
       CAST((bands + 1) // 2 * ga + bands // 2 * gb AS DOUBLE)
           / bands AS mean_gray,
       CAST(ga AS INTEGER) AS gray_first,
       CAST(CASE WHEN bands % 2 = 1 THEN ga ELSE gb END AS INTEGER)
           AS gray_last
FROM p
""")


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL decode + nearest-neighbor RESIZE + reduce, oracle-checked:
    each striped PPM payload is decoded and resized to 4x4 with the
    standard floor mapping (output row j samples source row j*h//4), then
    summarized by resized channel means.  Because the floor mapping is
    integer, the oracle can recompute which stripe color each resized row
    samples — a wrong row index or interpolation mode breaks the hash.
    This completes the mandated decode/feature-extract/RESIZE/frame-sample
    multimodal verb set with a real pixel-plane operation."""
    from binaryvectordb_spark.operators.multimodal import (
        resize_ppm_features,
        with_ppm_payload,
    )
    d = load_table(spark, sf_dir, "documents")
    return resize_ppm_features(with_ppm_payload(d), out_w=4, out_h=4)


register("multimodal_resize", multimodal_resize, oracle="""
WITH p AS (SELECT doc_id,
                  2 + doc_id % 7 AS h,
                  (doc_id * 3) % 256 AS ra, (doc_id * 5) % 256 AS ga,
                  (doc_id * 7) % 256 AS ba,
                  (doc_id * 11 + 1) % 256 AS rb, (doc_id * 13 + 2) % 256 AS gb,
                  (doc_id * 17 + 3) % 256 AS bb
           FROM documents),
e AS (SELECT *,
             (CASE WHEN ((0 * h) // 4) % 2 = 0 THEN 1 ELSE 0 END
            + CASE WHEN ((1 * h) // 4) % 2 = 0 THEN 1 ELSE 0 END
            + CASE WHEN ((2 * h) // 4) % 2 = 0 THEN 1 ELSE 0 END
            + CASE WHEN ((3 * h) // 4) % 2 = 0 THEN 1 ELSE 0 END) AS n_even
      FROM p)
SELECT doc_id,
       CAST(4 AS INTEGER) AS width, CAST(4 AS INTEGER) AS height,
       CAST(n_even * ra + (4 - n_even) * rb AS DOUBLE) / 4 AS mean_r,
       CAST(n_even * ga + (4 - n_even) * gb AS DOUBLE) / 4 AS mean_g,
       CAST(n_even * ba + (4 - n_even) * bb AS DOUBLE) / 4 AS mean_b
FROM e
""")


def embed_documents_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Executor-side embedding of the documents corpus via mapInPandas
    (operators/embed.py, the scale ingest path), driver-checked via an
    INVARIANT: the embedder L2-normalizes every non-empty text (db.py
    local_embedder), so per-doc |‖e‖ − 1| < 1e-5 is SQL-predictable from
    the text alone (empty/whitespace text → zero vector → False).  The
    embedding UDF really runs — a broken batch flips booleans.  Exact
    vector determinism across ingest paths is pinned by
    tests/test_db_crud.py::test_distributed_ingest_matches_driver_side."""
    from binaryvectordb_spark.functions.vector import norm
    from binaryvectordb_spark.operators.embed import embed_texts

    d = load_table(spark, sf_dir, "documents")
    emb = embed_texts(d, dim=32)
    return emb.select(
        "doc_id",
        (F.abs(norm("embedding") - 1.0) < 1e-5).alias("unit_norm"))


register("embed_documents_distributed", embed_documents_distributed, oracle="""
SELECT doc_id, length(trim(text)) > 0 AS unit_norm FROM documents
""")


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-to-many frame sampling (every 2nd 4-byte window at stride 2 of
    the 16-byte payload -> frames 0,2,4,6); the oracle recomputes each
    frame's checksum from the md5 hex pairs.  First 100 docs keep the gate
    fast."""
    from binaryvectordb_spark.operators.multimodal import frame_sample
    d = with_fake_payload(
        load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100))
    return frame_sample(d).select("doc_id", "frame_idx", "frame_checksum")


_FBYTE = "CAST('0x' || substring(md5(text), 2 * (f * 2 + i) + 1, 2) AS INTEGER)"

register("multimodal_frame_sample", multimodal_frame_sample, oracle=f"""
WITH frames AS (
  SELECT doc_id, text, unnest([0, 2, 4, 6]) AS f
  FROM documents WHERE doc_id < 100
)
SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
       CAST(list_sum(list_transform(range(0, 4), i -> {_FBYTE})) AS BIGINT)
         AS frame_checksum
FROM frames
""")


def multimodal_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FOURTH real codec, oracle-checked: the shared striped images
    BMP-encoded (24-bit BI_RGB) and decoded back by the pure-numpy
    decode_bmp on mapInPandas.  Structurally distinct from the other
    three parses: BOTTOM-UP row order, BGR channel order, and 4-byte row
    padding — an unflip, swap, or stride mistake breaks the hash against
    the same closed-form stripe-mean oracle PPM and PNG share.  With
    PPM (raw), PNG (deflate+filters), JPEG (DCT lossy) and BMP (padded
    strided), only webp remains an honest external-codec stub."""
    from binaryvectordb_spark.operators.multimodal import (
        decode_bmp_features,
        with_bmp_payload,
    )
    d = load_table(spark, sf_dir, "documents")
    return decode_bmp_features(with_bmp_payload(d))


register("multimodal_bmp_decode", multimodal_bmp_decode,
         oracle=_STRIPE_ORACLE)
