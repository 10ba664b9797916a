"""Multimodal binary-column pipeline: decode via mapInPandas, resize
planning, frame sampling. The fake-decoder contract is re-computed
locally (hashlib/byte math) to pin the Spark-side plumbing exactly."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from big_data_song_recommendation_spark.operators import multimodal
from big_data_song_recommendation_spark.sources.readers import load_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return multimodal.media_from_documents(docs).cache()


def test_media_schema_and_metadata(media):
    assert dict(media.dtypes)["payload"] == "binary"
    rows = media.limit(50).collect()
    for r in rows:
        m = r["meta"]
        assert m["modality"] in multimodal.MODALITIES
        if m["modality"] in ("image", "video"):
            assert 64 <= m["width"] <= 1024 and 64 <= m["height"] <= 1024
        if m["modality"] == "audio":
            assert m["sample_rate"] in (8000, 16000, 22050, 44100)
            assert m["width"] is None
        if m["modality"] == "video":
            assert 1 <= m["n_frames"] <= 300 and m["fps"] == 24.0


def test_decode_matches_local_recompute(spark, media):
    decoded = multimodal.decode_media(media).orderBy("doc_id").limit(20).collect()
    docs = dict(
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(20)
        .collect()
    )
    assert len(decoded) == 20
    for r in decoded:
        b = docs[r["doc_id"]].encode("utf-8")
        assert r["n_bytes"] == len(b)
        assert r["checksum"] == hashlib.md5(b).hexdigest()
        assert r["byte_sum"] == sum(b)
        assert r["mean_byte"] == math.floor(sum(b) / len(b) * 1e4) / 1e4


def test_decode_partitioning_is_preserved(media):
    # mapInPandas is a narrow transformation — no shuffle is introduced
    wide = media.repartition(8)
    assert multimodal.decode_media(wide).rdd.getNumPartitions() == 8


def test_resize_plan_bounds_and_aspect(media):
    plan = multimodal.resize_plan(media, max_w=256, max_h=256)
    rows = plan.collect()
    assert rows, "no visual rows"
    for r in rows:
        assert 1 <= r["target_w"] <= 256 and 1 <= r["target_h"] <= 256
        if r["width"] <= 256 and r["height"] <= 256:
            assert (r["target_w"], r["target_h"]) == (r["width"], r["height"])
        else:
            # aspect preserved within 1px of the exact scale
            scale = min(1.0, 256 / r["width"], 256 / r["height"])
            assert abs(r["target_w"] - r["width"] * scale) < 1
            assert abs(r["target_h"] - r["height"] * scale) < 1


def test_sample_frames_counts(media):
    sampled = multimodal.sample_frames(media, every=7)
    per_doc = sampled.groupBy("doc_id", "n_frames").agg(
        F.count("*").alias("n"), F.max("frame_index").alias("last")
    )
    for r in per_doc.collect():
        assert r["n"] == (r["n_frames"] + 6) // 7
        assert r["last"] <= r["n_frames"] - 1
    # only video rows are sampled
    mods = media.select(F.col("meta.modality").alias("m"), "doc_id")
    joined = sampled.select("doc_id").distinct().join(mods, "doc_id")
    assert joined.filter(F.col("m") != "video").count() == 0


def test_extract_features_contract(spark, media):
    """Byte-histogram embedding: fixed dim, L1-normalized histogram,
    entropy within [0, 4] bits (16 bins), recomputed locally for one
    row, and composable with the ANN stack."""
    feats = multimodal.extract_features(media).cache()
    rows = feats.limit(20).collect()
    assert rows and all(len(r["embedding"]) == multimodal.FEATURE_DIM for r in rows)
    for r in rows:
        hist, entropy = r["embedding"][:16], r["embedding"][16]
        assert math.isclose(sum(hist), 1.0, abs_tol=1e-9)
        assert 0.0 <= entropy <= 4.0 + 1e-9

    # local recompute pins the histogram math exactly
    one = media.select("doc_id", "payload").first()
    import numpy as np

    b = np.frombuffer(bytes(one["payload"]), dtype=np.uint8)
    want = (np.bincount(b >> 4, minlength=16) / b.size).tolist()
    got = {r["doc_id"]: r["embedding"] for r in rows}.get(one["doc_id"])
    if got is None:
        got = feats.filter(F.col("doc_id") == one["doc_id"]).first()["embedding"]
    assert got[:16] == pytest.approx(want, abs=1e-12)

    # composition: the embedding column feeds the similarity operators
    from big_data_song_recommendation_spark.operators import similarity

    knn = similarity.brute_force_knn(
        feats, feats.limit(3), id_col="doc_id", vec_col="embedding", k=3
    )
    out = knn.collect()
    assert len(out) == 9
    assert all(-1.0 - 1e-9 <= r["sim"] <= 1.0 + 1e-9 for r in out)


def _make_png(width: int, height: int, channels: int = 3) -> bytes:
    """Hand-assemble a real PNG (8-bit, non-interlaced) with stdlib
    only: deterministic pixel gradient, per-row filter types cycling
    through 0-4 so every unfilter branch executes."""
    import struct
    import zlib

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    stride = width * channels
    pixels = [
        bytes(((x * 7 + y * 13 + c * 29) % 256) for x in range(width) for c in range(channels))
        for y in range(height)
    ]
    raw = bytearray()
    prev = bytearray(stride)
    for y, line in enumerate(pixels):
        f = y % 5
        raw.append(f)
        enc = bytearray(line)
        if f == 1:
            for i in range(stride - 1, channels - 1, -1):
                enc[i] = (enc[i] - line[i - channels]) & 0xFF
        elif f == 2:
            for i in range(stride):
                enc[i] = (enc[i] - prev[i]) & 0xFF
        elif f == 3:
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                enc[i] = (enc[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                c = prev[i - channels] if i >= channels else 0
                b = prev[i]
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (enc[i] - pr) & 0xFF
        raw += enc
        prev = bytearray(line)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


class TestRealPNGDecode:
    def test_stdlib_decoder_roundtrip(self):
        for w, h, ch in [(9, 7, 3), (5, 11, 1), (6, 6, 4)]:
            assert multimodal._png_decode(_make_png(w, h, ch)) == (w, h)

    def test_decoder_rejects_garbage(self):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            multimodal._png_decode(b"not a png at all")

    def test_decode_media_corrects_dims_from_real_bytes(self, spark):
        # metadata LIES (width=1, height=1); the real decode must win
        png = _make_png(13, 9, 3)
        media = spark.createDataFrame(
            [(101, png, ("image", "png", 1, 1, None, None, None))],
            "doc_id long, payload binary, "
            "meta struct<modality:string,fmt:string,width:int,height:int,"
            "sample_rate:int,n_frames:int,fps:double>",
        )
        row = multimodal.decode_media(media).collect()[0]
        assert (row["width"], row["height"]) == (13, 9)
        import hashlib as _h

        assert row["checksum"] == _h.md5(png).hexdigest()

    def test_decode_media_passthrough_for_fake_payloads(self, spark):
        media = spark.createDataFrame(
            [(102, b"plain text bytes", ("image", "png", 640, 480, None, None, None))],
            "doc_id long, payload binary, "
            "meta struct<modality:string,fmt:string,width:int,height:int,"
            "sample_rate:int,n_frames:int,fps:double>",
        )
        row = multimodal.decode_media(media).collect()[0]
        assert (row["width"], row["height"]) == (640, 480)


def _make_jpeg(width: int, height: int, *, sof_marker: int = 0xC0) -> bytes:
    """Hand-assemble a structurally valid JPEG header: SOI, APP0(JFIF),
    DQT stub, SOFn with the dims, DHT stub, SOS, one entropy byte, EOI.
    Dims live in the SOF frame header, which is all the stdlib parser
    reads — the entropy data is filler."""
    import struct

    def seg(marker: int, data: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(data) + 2) + data

    app0 = seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(0xDB, b"\x00" + bytes(64))
    sof = seg(
        sof_marker,
        struct.pack(">BHH", 8, height, width) + b"\x01\x11\x00",
    )
    dht = seg(0xC4, b"\x00" + bytes(16) + b"\x00")
    sos = seg(0xDA, b"\x01\x11\x00\x00\x3f\x00")
    return b"\xff\xd8" + app0 + dqt + sof + dht + sos + b"\xab" + b"\xff\xd9"


class TestRealJPEGDecode:
    def test_sof0_dims(self):
        for w, h in [(13, 9), (1, 1), (1920, 1080)]:
            assert multimodal._jpeg_decode(_make_jpeg(w, h)) == (w, h)

    def test_progressive_sof2_dims(self):
        assert multimodal._jpeg_decode(_make_jpeg(40, 25, sof_marker=0xC2)) == (40, 25)

    def test_dht_not_mistaken_for_sof(self):
        # DHT shares the 0xC0 nibble (0xC4); a parser that treats it as
        # a frame header would read garbage dims from the table stub
        jpg = _make_jpeg(7, 5)
        assert multimodal._jpeg_decode(jpg) == (7, 5)

    def test_rejects_garbage_and_truncation(self):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            multimodal._jpeg_decode(b"not a jpeg")
        with _pytest.raises(ValueError):
            multimodal._jpeg_decode(_make_jpeg(7, 5)[:6])  # cut mid-segment
        with _pytest.raises(ValueError):
            # SOI + EOI only: structurally fine, but no SOF -> no dims
            multimodal._jpeg_decode(b"\xff\xd8\xff\xd9")
        with _pytest.raises(ValueError):
            multimodal._jpeg_decode(_make_jpeg(0, 5))  # zero width

    def test_dispatcher_routes_by_magic(self):
        import pytest as _pytest

        assert multimodal._stdlib_decode(_make_png(6, 4)) == (6, 4)
        assert multimodal._stdlib_decode(_make_jpeg(8, 3)) == (8, 3)
        with _pytest.raises(ValueError):
            multimodal._stdlib_decode(b"GIF89a......")

    def test_decode_media_reads_jpeg_dims(self, spark):
        jpg = _make_jpeg(31, 17)
        media = spark.createDataFrame(
            [(103, jpg, ("image", "jpeg", 2, 2, None, None, None))],
            "doc_id long, payload binary, "
            "meta struct<modality:string,fmt:string,width:int,height:int,"
            "sample_rate:int,n_frames:int,fps:double>",
        )
        row = multimodal.decode_media(media).collect()[0]
        assert (row["width"], row["height"]) == (31, 17)


def _make_wav(rate: int, channels: int, frames: int) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"\x01\x02" * channels * frames)
    return buf.getvalue()


class TestRealWAVDecode:
    def test_wav_params_roundtrip(self):
        for rate, ch, n in [(8000, 1, 100), (44100, 2, 7), (22050, 1, 1)]:
            assert multimodal._wav_decode(_make_wav(rate, ch, n)) == (rate, ch, n)

    def test_wav_rejects_garbage(self):
        import pytest as _pytest

        with _pytest.raises(Exception):
            multimodal._wav_decode(b"RIFFxxxxNOPE")
        with _pytest.raises(Exception):
            multimodal._wav_decode(b"plain text")

    def test_decode_media_real_wav_overrides_metadata(self, spark):
        # metadata LIES (sample_rate=8000); the real RIFF parse must win
        wav = _make_wav(44100, 2, 25)
        media = spark.createDataFrame(
            [(103, wav, ("audio", "wav", None, None, 8000, None, None))],
            "doc_id long, payload binary, "
            "meta struct<modality:string,fmt:string,width:int,height:int,"
            "sample_rate:int,n_frames:int,fps:double>",
        )
        row = multimodal.decode_media(media).collect()[0]
        assert row["sample_rate"] == 44100
        assert row["n_samples"] == 25

    def test_decode_media_fake_audio_passthrough(self, spark):
        media = spark.createDataFrame(
            [(104, b"not audio bytes", ("audio", "wav", None, None, 16000, None, None))],
            "doc_id long, payload binary, "
            "meta struct<modality:string,fmt:string,width:int,height:int,"
            "sample_rate:int,n_frames:int,fps:double>",
        )
        row = multimodal.decode_media(media).collect()[0]
        assert row["sample_rate"] == 16000 and row["n_samples"] is None
