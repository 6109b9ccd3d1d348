"""Source/sink coverage (SURVEY §2.1): JSONL(.gz) ingest (the reference's
example pipeline, examples/create_new_db.py:31-34), partitioned parquet
write + partition-pruned read-back."""

from __future__ import annotations

import gzip
import json

from pyspark.sql import functions as F

from binaryvectordb_spark.plans import formatted_plan
from binaryvectordb_spark.sources.tables import load_table, read_jsonl
from tests.conftest import SF_SMOKE


def test_jsonl_gz_ingest(spark, tmp_path):
    path = tmp_path / "docs.jsonl.gz"
    with gzip.open(path, "wt") as f:
        for i in range(25):
            f.write(json.dumps({"_id": i, "title": f"t{i}",
                                "text": f"body {i}"}) + "\n")
    df = read_jsonl(spark, str(path))
    assert df.count() == 25
    assert {"_id", "title", "text"} <= set(df.columns)
    assert df.where(F.col("_id") == 7).first().title == "t7"


def test_partitioned_write_and_pruned_read(spark, tmp_path):
    """Partition-by-column write; a filtered read must prune partitions
    (the physical layout strategy for the 100 TB documents table)."""
    out = str(tmp_path / "docs_by_lang")
    docs = load_table(spark, SF_SMOKE, "documents")
    docs.write.partitionBy("lang").mode("overwrite").parquet(out)

    back = spark.read.parquet(out)
    assert back.count() == docs.count()

    filtered = back.where(F.col("lang") == "de")
    plan = formatted_plan(filtered)
    # partition pruning shows up as a PartitionFilters entry on the scan
    assert "PartitionFilters: [isnotnull(lang" in plan
    want = docs.where(F.col("lang") == "de").count()
    assert filtered.count() == want


def test_orc_and_csv_roundtrip(spark, tmp_path):
    """Format width: the same table written/read as ORC and CSV (with
    explicit schema — CSV carries no types) must round-trip exactly."""
    src = load_table(spark, SF_SMOKE, "nation")
    want = sorted((r.n_nationkey, r.n_name, r.n_regionkey)
                  for r in src.collect())

    orc_path = str(tmp_path / "nation_orc")
    src.write.mode("overwrite").orc(orc_path)
    got_orc = sorted((r.n_nationkey, r.n_name, r.n_regionkey)
                     for r in spark.read.orc(orc_path).collect())
    assert got_orc == want

    csv_path = str(tmp_path / "nation_csv")
    src.write.mode("overwrite").option("header", True).csv(csv_path)
    got_csv = sorted(
        (r.n_nationkey, r.n_name, r.n_regionkey)
        for r in spark.read.options(header=True)
        .schema("n_nationkey int, n_name string, n_regionkey int")
        .csv(csv_path).collect())
    assert got_csv == want


def test_events_nanos_and_micros_encodings_agree(spark, tmp_path):
    """The events fixture has shipped as both TIMESTAMP(NANOS) and
    TIMESTAMP(MICROS); the footer probe must route each encoding through the
    right normalization in BOTH the batch loader and the streaming reader —
    a nanos-assuming reader fed micros divides twice and lands every event
    in January 1970 (the round-3/4 streaming bug)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from binaryvectordb_spark.sources.tables import events_ts_encoding
    from binaryvectordb_spark.streaming.events import (
        read_events_stream,
        run_append_to_memory,
    )

    micros = [1704067200_000_000 + i * 61_000_000 for i in range(20)]
    cols = {
        "event_id": pa.array(range(20), pa.int64()),
        "user_id": pa.array([i % 5 for i in range(20)], pa.int64()),
        "event_type": pa.array(["click"] * 20),
        "value": pa.array([float(i) for i in range(20)]),
        "props": pa.array(["{}"] * 20),
    }
    for enc, unit, vals in (("nanos", "ns", [m * 1000 for m in micros]),
                            ("micros", "us", micros)):
        d = tmp_path / enc
        d.mkdir()
        tbl = pa.table({**cols, "ts": pa.array(vals, pa.timestamp(unit))})
        pq.write_table(tbl, d / "events.parquet")
        assert events_ts_encoding(str(d / "events.parquet")) == enc
        assert events_ts_encoding(str(d)) == enc

    batch_n = load_table(spark, str(tmp_path / "nanos"), "events")
    batch_u = load_table(spark, str(tmp_path / "micros"), "events")
    key = lambda df: sorted((r.event_id, r.ts) for r in df.collect())  # noqa: E731
    assert dict(batch_n.dtypes)["ts"] == "timestamp"
    assert key(batch_n) == key(batch_u)

    stream_rows = {}
    for enc in ("nanos", "micros"):
        got = run_append_to_memory(
            read_events_stream(spark, str(tmp_path / enc))
            .select("event_id", "ts"), f"t_enc_{enc}")
        stream_rows[enc] = key(got)
    assert stream_rows["nanos"] == stream_rows["micros"] == key(batch_u)


def test_ppm_decoder_roundtrip():
    """decode_ppm is a real parser: round-trips arbitrary pixel arrays,
    skips header comments, rejects non-P6 and non-8-bit payloads."""
    import numpy as np
    import pytest

    from binaryvectordb_spark.operators.multimodal import decode_ppm

    rng = np.random.RandomState(3)
    for (h, w) in ((1, 1), (3, 5), (7, 2)):
        px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        data = b"P6\n# a comment\n# another\n %d\t%d\n255\n" % (w, h) + px.tobytes()
        out = decode_ppm(data)
        assert out.shape == (h, w, 3)
        assert (out == px).all()
    with pytest.raises(ValueError, match="P6"):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")


def test_ppm_decoder_truncated_inputs_raise():
    """Malformed/truncated payloads must RAISE, never loop: decode runs
    inside executor tasks over arbitrary binary columns, and a hang wedges
    the task (round-5 advice — the header scan looped forever when a slice
    ran past end-of-buffer, because b''.isspace() is False)."""
    import pytest

    from binaryvectordb_spark.operators.multimodal import decode_ppm

    cases = [
        b"P6",                         # nothing after the magic
        b"P6\n",                       # whitespace then EOF
        b"P6\n4",                      # token runs off the end
        b"P6\n4 4",                    # second token unterminated
        b"P6\n# comment with no newline",  # unterminated comment
        b"P6\n4 4\n255",               # maxval unterminated
        b"P6\n4 4\n255\n\x00\x01",     # header fine, pixel plane short
    ]
    for data in cases:
        with pytest.raises(ValueError, match="truncated"):
            decode_ppm(data)


def test_png_codec_roundtrip():
    """encode_png/decode_png are independent implementations (vectorized
    filter vs sequential unfilter): random pixel arrays round-trip through
    every PNG filter type (the encoder cycles 0..4 per row); malformed
    payloads raise instead of decoding garbage."""
    import numpy as np
    import pytest

    from binaryvectordb_spark.operators.multimodal import (
        decode_image,
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(11)
    for (h, w) in ((1, 1), (2, 3), (6, 5), (13, 9), (40, 23)):
        px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        out = decode_png(encode_png(px))
        assert out.shape == (h, w, 3) and (out == px).all()
    # gradient image: filters Sub/Average/Paeth all become non-trivial
    g = (np.arange(20 * 15 * 3, dtype=np.int64) % 256).astype(np.uint8)
    g = g.reshape(20, 15, 3)
    assert (decode_png(encode_png(g)) == g).all()
    # decode_image dispatches by magic bytes
    assert (decode_image(encode_png(g)) == g).all()
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"nope")
    data = encode_png(g)
    with pytest.raises(ValueError, match="truncated"):
        decode_png(data[:40])
    corrupt = bytearray(data)
    corrupt[33 + 10] ^= 0xFF  # flip a byte inside the IDAT payload
    with pytest.raises(ValueError):
        decode_png(bytes(corrupt))
    with pytest.raises(NotImplementedError):  # webp still needs a codec lib
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")


def test_jpeg_codec_exactness_and_error_paths():
    """Baseline JPEG codec (operators/jpeg.py): constant-8x8-block images
    with the flat-8 quantizer round-trip BIT-EXACT (the oracle contract);
    smooth content round-trips within a lossy bound; unsupported or
    truncated streams raise instead of decoding garbage."""
    import numpy as np
    import pytest

    from binaryvectordb_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_gray,
        encode_jpeg_rgb,
    )
    from binaryvectordb_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(3)
    for _ in range(10):
        bands, w = rng.randint(1, 5), 8 * rng.randint(1, 4)
        vals = rng.randint(0, 256, bands)
        px = np.repeat(vals, 8).astype(np.uint8)[:, None].repeat(w, 1)
        assert np.array_equal(decode_jpeg(encode_jpeg_gray(px)), px)
    # non-multiple-of-8 dims pad with edge replication and crop back
    px = np.full((10, 12), 77, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg_gray(px)), px)
    # lossy bound on smooth grayscale content (flat-8 quantizer)
    g = np.linspace(0, 255, 64)
    img = ((np.add.outer(g, g) / 2)
           + rng.normal(0, 4, (64, 64))).clip(0, 255).astype(np.uint8)
    err = np.abs(decode_jpeg(encode_jpeg_gray(img)).astype(int)
                 - img.astype(int)).max()
    assert err <= 16, err
    # 3-component YCbCr 4:4:4: constant blocks within color-transform
    # rounding of the exact round trip
    cpx = np.zeros((16, 16, 3), np.uint8)
    cpx[:8] = [200, 30, 90]
    cpx[8:] = [10, 220, 140]
    got = decode_image(encode_jpeg_rgb(cpx))  # dispatch by SOI magic
    assert got.shape == cpx.shape
    assert np.abs(got.astype(int) - cpx.astype(int)).max() <= 2
    # error paths
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"nope")
    data = encode_jpeg_gray(px)
    with pytest.raises(ValueError):
        decode_jpeg(data[:20])           # truncated mid-segment
    with pytest.raises(ValueError, match="baseline"):
        # progressive SOF2 must be rejected, not mis-decoded
        decode_jpeg(data.replace(b"\xff\xc0", b"\xff\xc2", 1))


def test_events_ts_encoding_mixed_dir_raises(tmp_path):
    """A directory mixing NANOS and MICROS files must fail AT SETUP with a
    clear error, not at runtime inside a micro-batch (round-5 advice: the
    probe used to inspect only files[0])."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from binaryvectordb_spark.sources.tables import events_ts_encoding

    d = tmp_path / "mixed"
    d.mkdir()
    ts = [1_700_000_000_000_000]
    pq.write_table(
        pa.table({"ts": pa.array(ts, pa.timestamp("us"))}),
        str(d / "a.parquet"))
    pq.write_table(
        pa.table({"ts": pa.array([t * 1000 for t in ts], pa.timestamp("ns"))}),
        str(d / "b.parquet"), store_schema=False,
        coerce_timestamps=None, use_deprecated_int96_timestamps=False)
    encs = {events_ts_encoding(str(d / "a.parquet")),
            events_ts_encoding(str(d / "b.parquet"))}
    if len(encs) == 2:  # pyarrow kept the ns physical type
        with pytest.raises(ValueError, match="mixed ts encodings"):
            events_ts_encoding(str(d))
    else:  # this pyarrow coerced ns->us on write; dir probe must still agree
        assert events_ts_encoding(str(d)) in encs


def test_ts_encoding_property_nanos_micros_agree(spark, tmp_path):
    """PROPERTY: for arbitrary nanosecond timestamps (including sub-micro
    residues, negatives-of-epoch-free range, and far-future values), the
    NANOS-encoded fixture read through the probed batch loader equals the
    MICROS-encoded fixture holding the truncated values — the same
    truncation DuckDB applies casting TIMESTAMP_NS -> TIMESTAMP."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from binaryvectordb_spark.sources.tables import events_ts_encoding

    case_n = [0]

    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.lists(
        st.integers(min_value=1_000_000_000_000_000_000,   # 2001-09-09
                    max_value=2_000_000_000_000_000_000),  # 2033-05-18
        min_size=1, max_size=12))
    def run(nanos_vals):
        case_n[0] += 1
        base = tmp_path / f"case{case_n[0]}"
        n = len(nanos_vals)
        cols = {
            "event_id": pa.array(range(n), pa.int64()),
            "user_id": pa.array([i % 3 for i in range(n)], pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array([0.0] * n),
            "props": pa.array(["{}"] * n),
        }
        for enc, unit, vals in (
                ("nanos", "ns", nanos_vals),
                ("micros", "us", [v // 1000 for v in nanos_vals])):
            d = base / enc
            d.mkdir(parents=True)
            pq.write_table(
                pa.table({**cols, "ts": pa.array(vals, pa.timestamp(unit))}),
                d / "events.parquet")
        assert events_ts_encoding(str(base / "nanos")) == "nanos"
        assert events_ts_encoding(str(base / "micros")) == "micros"
        key = lambda df: sorted(  # noqa: E731
            (r.event_id, r.ts) for r in df.select("event_id", "ts").collect())
        got_n = load_table(spark, str(base / "nanos"), "events")
        got_u = load_table(spark, str(base / "micros"), "events")
        assert dict(got_n.dtypes)["ts"] == "timestamp"
        assert key(got_n) == key(got_u)

    run()


def test_resize_nearest_semantics():
    """resize_nearest is the exact floor mapping on both axes — downscale,
    upscale, and identity all round-trip against a naive per-pixel loop;
    non-positive targets raise."""
    import numpy as np
    import pytest

    from binaryvectordb_spark.operators.multimodal import resize_nearest

    rng = np.random.RandomState(11)
    for (h, w, oh, ow) in ((5, 7, 3, 2), (2, 2, 6, 6), (4, 4, 4, 4),
                           (1, 9, 8, 1), (3, 3, 1, 1)):
        px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        got = resize_nearest(px, ow, oh)
        assert got.shape == (oh, ow, 3)
        for j in range(oh):
            for i in range(ow):
                assert (got[j, i] == px[(j * h) // oh, (i * w) // ow]).all()
    with pytest.raises(ValueError, match="invalid resize"):
        resize_nearest(np.zeros((2, 2, 3), np.uint8), 0, 4)


def test_adaptive_filtered_branches(spark):
    """The adaptive filtered cascade must (a) pick prefilter under the
    switch and return ONLY eligible docs, (b) pick postfilter above it,
    (c) behave on an empty eligible set (prefilter branch, zero rows)."""
    from pyspark.sql import functions as F

    from binaryvectordb_spark.operators.cascade import (
        build_doc_store,
        build_index,
        cascade_search_filtered_adaptive,
    )
    from binaryvectordb_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    docs = load_table(spark, SF_SMOKE, "documents")
    index_df, doc_df = build_index(emb, 64), build_doc_store(emb, docs)
    qv = [r[0] for r in emb.where(F.col("vec_id") == 0)
          .select("embedding").collect()][0]

    rare = docs.where(F.col("source") == "src0").select("doc_id")
    hits = cascade_search_filtered_adaptive(
        index_df, doc_df, 64, rare, query_vec=qv).collect()
    assert hits and all(r.strategy == "prefilter" for r in hits)
    eligible_ids = {r.doc_id for r in rare.collect()}
    assert all(r.doc_id in eligible_ids for r in hits)

    broad = docs.where(F.col("lang") != "zh").select("doc_id")
    hits_b = cascade_search_filtered_adaptive(
        index_df, doc_df, 64, broad, query_vec=qv).collect()
    assert hits_b and all(r.strategy == "postfilter" for r in hits_b)
    broad_ids = {r.doc_id for r in broad.collect()}
    assert all(r.doc_id in broad_ids for r in hits_b)

    empty = docs.where(F.lit(False)).select("doc_id")
    hits_e = cascade_search_filtered_adaptive(
        index_df, doc_df, 64, empty, query_vec=qv).collect()
    assert hits_e == []


def test_png_missing_iend_raises():
    """A PNG cut exactly at a chunk boundary (IEND stripped) must still
    raise — IEND is mandatory, and a boundary-aligned truncation is
    otherwise indistinguishable from a complete file."""
    import numpy as np
    import pytest

    from binaryvectordb_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    data = encode_png(np.zeros((2, 3, 3), np.uint8))
    stripped = data[:-12]  # IEND is the trailing 12-byte chunk
    with pytest.raises(ValueError, match="truncated PNG chunk stream"):
        decode_png(stripped)


def test_bmp_codec_roundtrip():
    """encode_bmp/decode_bmp are a real codec pair: round-trips arbitrary
    pixel arrays across the padded-stride cases (w*3 % 4 in all residues),
    honors top-down negative heights, and rejects malformed streams."""
    import numpy as np
    import pytest

    from binaryvectordb_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.RandomState(11)
    for w in (1, 2, 3, 4, 5, 7, 8):     # covers every row-padding residue
        for h in (1, 2, 5):
            px = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
            data = encode_bmp(px)
            assert data[:2] == b"BM" and len(data) == 54 + ((w * 3 + 3)
                                                            & ~3) * h
            out = decode_bmp(data)
            assert out.shape == (h, w, 3)
            assert np.array_equal(out, px)

    # top-down variant (negative height) decodes without the unflip:
    # encode_bmp(Q) stores file rows Q[h-1]..Q[0]; re-labelling the
    # stream top-down must yield exactly that reversed order
    px = rng.randint(0, 256, (3, 2, 3), dtype=np.uint8)
    data = bytearray(encode_bmp(px))
    data[22:26] = (-3).to_bytes(4, "little", signed=True)
    assert np.array_equal(decode_bmp(bytes(data)), px[::-1])

    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"PNG whatever")
    with pytest.raises(ValueError, match="only 24-bit"):
        bad = bytearray(encode_bmp(px))
        bad[28:30] = (8).to_bytes(2, "little")
        decode_bmp(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(encode_bmp(px)[:-4])
    # pixel-array offset pointing back into the headers must be rejected,
    # not silently decode header bytes as pixels (ADVICE r11)
    with pytest.raises(ValueError, match="overlaps headers"):
        bad = bytearray(encode_bmp(px))
        bad[10:14] = (20).to_bytes(4, "little")
        decode_bmp(bytes(bad))
