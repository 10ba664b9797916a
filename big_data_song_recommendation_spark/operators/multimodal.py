"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, plus decode / feature-extract / resize /
frame-sample operators.

The reference has no media handling; this is part of the engine's
training-data-pipeline superset (SURVEY.md §7 item 5). Design rules:

- A media row = ``payload: binary`` + a ``meta`` struct
  (modality/format/width/height/sample_rate/n_frames/fps). The payload
  is never interpreted by Catalyst — it travels as opaque bytes, so
  column pruning drops it for metadata-only queries and parquet keeps
  it in its own column chunk.
- Decode and feature extraction run in Arrow-batched ``mapInPandas``
  (the only tier that can touch raw bytes); everything metadata-only
  (resize planning, frame sampling) stays in pure column expressions.
- Real codecs (PIL/librosa/av) are NOT in this container. The decode
  step is gated behind an import-try; without codecs it falls back to
  a DETERMINISTIC FAKE decoder (documented below) so the Spark-side
  plumbing — schema, batching, partitioning — is fully real and
  testable end-to-end.

Deterministic fake decoder contract (oracle-checkable by design):

- ``n_bytes``   = len(payload)
- ``checksum``  = md5(payload) hexdigest
- ``byte_sum``  = sum of payload bytes
- ``mean_byte`` = floor(byte_sum / n_bytes * 1e4) / 1e4
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.scalars import md5_bucket, pick_deterministic

MODALITIES = ("audio", "image", "video")

META_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),  # image/video only
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),  # audio only
        T.StructField("n_frames", T.IntegerType(), True),  # video only
        T.StructField("fps", T.DoubleType(), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("checksum", T.StringType(), False),
        T.StructField("byte_sum", T.LongType(), False),
        T.StructField("mean_byte", T.DoubleType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),  # audio
        T.StructField("n_samples", T.LongType(), True),  # audio, real decode only
    ]
)

_FMT_BY_MODALITY = {"audio": "wav", "image": "png", "video": "mp4"}


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from ``documents``:
    payload = utf-8 bytes of the text, metadata hash-derived from
    doc_id (engine-portable md5 buckets, the F5 pattern). Stands in
    for a real parquet media lake in tests and oracle queries."""
    sid = F.col("doc_id").cast("string")
    modality = pick_deterministic(sid, list(MODALITIES))
    fmt = (
        F.when(modality == "audio", F.lit("wav"))
        .when(modality == "image", F.lit("png"))
        .otherwise(F.lit("mp4"))
    )
    visual = modality.isin("image", "video")
    width = F.when(visual, (64 + md5_bucket(F.concat(F.lit("w:"), sid), 961)).cast("int"))
    height = F.when(visual, (64 + md5_bucket(F.concat(F.lit("h:"), sid), 961)).cast("int"))
    sample_rate = F.when(
        modality == "audio",
        F.element_at(
            F.array(F.lit(8000), F.lit(16000), F.lit(22050), F.lit(44100)),
            (md5_bucket(F.concat(F.lit("sr:"), sid), 4) + 1).cast("int"),
        ),
    )
    n_frames = F.when(
        modality == "video", (1 + md5_bucket(F.concat(F.lit("nf:"), sid), 300)).cast("int")
    )
    fps = F.when(modality == "video", F.lit(24.0))
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            modality.alias("modality"),
            fmt.alias("fmt"),
            width.alias("width"),
            height.alias("height"),
            sample_rate.alias("sample_rate"),
            n_frames.alias("n_frames"),
            fps.alias("fps"),
        ).alias("meta"),
    )


def _png_decode(payload: bytes) -> tuple[int, int]:
    """Minimal REAL PNG decode with only the stdlib: chunk walk, IHDR
    dims, zlib-inflate of IDAT, and full scanline unfiltering (filter
    types 0-4) so a corrupt stream raises instead of sneaking metadata
    through. 8-bit non-interlaced gray/RGB/+alpha only.

    Pure-Python per-byte unfiltering is NOT a throughput path — on a
    real deployment ship PIL/turbojpeg in the executor image and the
    PIL tier below takes over. What this tier buys is an end-to-end
    REAL decode (bytes → pixels → dims) testable in this codec-less
    container, exercising the same mapInPandas plumbing."""
    import struct
    import zlib

    if len(payload) < 8 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, w, h, idat = 8, None, None, b""
    depth = color = interlace = None
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack(">I4s", payload[pos : pos + 8])
        pos += 8
        data = payload[pos : pos + ln]
        pos += ln + 4  # chunk CRC skipped; zlib's adler32 still guards IDAT
        if typ == b"IHDR":
            w, h, depth, color, _c, _f, interlace = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color if color is not None else -1)
    if w is None or depth != 8 or interlace != 0 or channels is None:
        raise ValueError("unsupported PNG layout")
    raw = zlib.decompress(idat)
    stride = w * channels
    if len(raw) != (stride + 1) * h:
        raise ValueError("truncated PNG pixel data")
    prev = bytearray(stride)
    p = 0
    for _ in range(h):
        f = raw[p]
        line = bytearray(raw[p + 1 : p + 1 + stride])
        p += 1 + stride
        if f == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                c = prev[i - channels] if i >= channels else 0
                b = prev[i]
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter type {f}")
        prev = line
    return w, h


def _jpeg_decode(payload: bytes) -> tuple[int, int]:
    """Minimal REAL JPEG dims parse with only the stdlib: walk the
    marker stream to the first SOF frame header (SOF0 baseline, plus
    the other SOFn variants — excluding DHT/JPG/DAC which share the
    0xC0 nibble but are not frames) and read height/width from it.
    Marker-structure errors raise — a truncated or non-JPEG stream
    never sneaks dims through. Entropy-coded pixel data is NOT decoded
    (dims live entirely in the frame header); full pixel decode is the
    PIL tier's job on a real deployment."""
    import struct

    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        # fill bytes: any number of 0xFF may pad before a marker
        while pos < len(payload) and payload[pos] == 0xFF:
            pos += 1
        if pos >= len(payload):
            break
        marker = payload[pos]
        pos += 1
        # standalone markers carry no length segment
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            continue
        if marker == 0xD9:  # EOI before any SOF
            break
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG segment")
        (ln,) = struct.unpack(">H", payload[pos : pos + 2])
        if ln < 2 or pos + ln > len(payload):
            raise ValueError("bad JPEG segment length")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if ln < 7:
                raise ValueError("truncated SOF header")
            _prec, h, w = struct.unpack(">BHH", payload[pos + 2 : pos + 7])
            if h == 0 or w == 0:
                raise ValueError("bad SOF dims")
            return w, h
        if marker == 0xDA:  # SOS: entropy data follows, SOF should precede
            break
        pos += ln
    raise ValueError("no SOF marker found")


def _wav_decode(payload: bytes) -> tuple[int, int, int]:
    """Minimal REAL WAV decode with only the stdlib ``wave`` module:
    RIFF/WAVE container walk via wave.open → (sample_rate, n_channels,
    n_samples). Non-WAV or truncated streams raise (wave.Error /
    EOFError), which callers treat as not-decodable."""
    import io
    import wave

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    with wave.open(io.BytesIO(payload)) as w:
        return w.getframerate(), w.getnchannels(), w.getnframes()


def _stdlib_decode(payload: bytes) -> tuple[int, int]:
    """Magic-byte dispatch over the stdlib codec tiers: PNG (full
    scanline decode) and JPEG (SOF dims parse). Anything else raises —
    callers treat that as not-decodable and pass metadata through."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _png_decode(payload)
    if payload[:2] == b"\xff\xd8":
        return _jpeg_decode(payload)
    raise ValueError("unrecognized image format")


def _try_real_decoder():
    """Real codec tiers: PIL when the executor image ships it (any
    format), else the stdlib decoders above (real PNG decode + JPEG
    SOF dims parse — other payloads raise and fall back to metadata
    passthrough)."""
    try:  # pragma: no cover - PIL absent in the target container
        import io

        from PIL import Image

        def decode(payload: bytes):
            img = Image.open(io.BytesIO(payload))
            return img.width, img.height

        return decode
    except ImportError:
        return _stdlib_decode


def decode_media(media: DataFrame, *, batch_hint: str | None = None) -> DataFrame:
    """Decode + feature-extract over the binary payload via Arrow-batched
    ``mapInPandas`` — the engine's template for any byte-touching
    media op. Emits :data:`DECODED_SCHEMA` rows.

    With a real codec installed the width/height would come from the
    decoded image; here they pass through from metadata and the
    byte-level stats come from the actual payload bytes (real
    computation, deterministic, cross-engine checkable)."""
    real = _try_real_decoder()

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            n_bytes, checksums, byte_sums, means = [], [], [], []
            widths = pdf["width"].tolist()
            heights = pdf["height"].tolist()
            rates = pdf["sample_rate"].tolist()
            n_samples: list = [None] * len(rates)
            for i, p in enumerate(pdf["payload"]):
                b = bytes(p)
                n = len(b)
                s = int(np.frombuffer(b, dtype=np.uint8).sum()) if n else 0
                n_bytes.append(n)
                checksums.append(hashlib.md5(b).hexdigest())
                byte_sums.append(s)
                means.append(math.floor(s / n * 1e4) / 1e4 if n else 0.0)
                try:
                    rates[i], _ch, n_samples[i] = _wav_decode(b)
                    continue  # real audio payload — image tiers n/a
                except Exception:
                    pass  # not WAV → image tiers / metadata passthrough
                if real is not None:
                    try:
                        widths[i], heights[i] = real(b)
                    except Exception:
                        pass  # not decodable (fake payload) → metadata passthrough
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": n_bytes,
                    "checksum": checksums,
                    "byte_sum": byte_sums,
                    "mean_byte": means,
                    "width": widths,
                    "height": heights,
                    "sample_rate": pd.array(rates, dtype="Int32"),
                    "n_samples": pd.array(n_samples, dtype="Int64"),
                }
            )

    flat = media.select(
        "doc_id",
        "payload",
        F.col("meta.modality").alias("modality"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.sample_rate").alias("sample_rate"),
    )
    return flat.mapInPandas(batches, schema=DECODED_SCHEMA)


FEATURE_DIM = 17  # 16 histogram bins + 1 entropy

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("embedding", T.ArrayType(T.DoubleType(), False), False),
    ]
)


def extract_features(media: DataFrame) -> DataFrame:
    """Per-media fixed-dim feature vector — 16-bin byte histogram
    (L1-normalized) + Shannon entropy — via Arrow-batched
    ``mapInPandas``. Unlike the decode step this needs NO codec: byte
    distributions are real features of the payload (format detection,
    corruption screens, near-dup blocking), and the output ``embedding``
    column plugs straight into the similarity/dedup stack
    (operators/similarity.py) — the multimodal→ANN composition path.
    With codecs installed, a model-based embedder would swap in behind
    the same schema."""

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            vecs = []
            for p in pdf["payload"]:
                b = np.frombuffer(bytes(p), dtype=np.uint8)
                if b.size == 0:
                    vecs.append([0.0] * FEATURE_DIM)
                    continue
                hist = np.bincount(b >> 4, minlength=16).astype(np.float64)
                probs = hist / b.size
                nz = probs[probs > 0]
                entropy = float(-(nz * np.log2(nz)).sum())
                vecs.append([*probs.tolist(), entropy])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "embedding": vecs,
                }
            )

    flat = media.select(
        "doc_id", "payload", F.col("meta.modality").alias("modality")
    )
    return flat.mapInPandas(batches, schema=FEATURES_SCHEMA)


def resize_plan(
    media: DataFrame, *, max_w: int = 256, max_h: int = 256
) -> DataFrame:
    """Aspect-preserving resize planning for visual rows — pure column
    expressions (no bytes touched): target dims = floor(dim·scale),
    scale = min(1, max_w/w, max_h/h). The byte-level resample would
    plug into :func:`decode_media`'s mapInPandas with a codec."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(1.0), F.lit(max_w) / w, F.lit(max_h) / h)
    return media.filter(F.col("meta.modality").isin("image", "video")).select(
        "doc_id",
        F.col("meta.modality").alias("modality"),
        w.alias("width"),
        h.alias("height"),
        F.greatest(F.lit(1), F.floor(w * scale).cast("int")).alias("target_w"),
        F.greatest(F.lit(1), F.floor(h * scale).cast("int")).alias("target_h"),
    )


def sample_frames(media: DataFrame, *, every: int = 10) -> DataFrame:
    """Frame sampling for video rows: one output row per kept frame
    index (0, every, 2·every, …) with its presentation timestamp.
    Metadata-only → pure ``explode(sequence(...))``, fully
    distributed; the per-frame pixel fetch would be a byte-range read
    inside mapInPandas with a codec."""
    vids = media.filter(F.col("meta.modality") == "video")
    idx = F.explode(
        F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every))
    ).alias("frame_index")
    return vids.select("doc_id", F.col("meta.n_frames").alias("n_frames"), idx).withColumn(
        "frame_ts_sec", F.round(F.col("frame_index") / F.lit(24.0), 6)
    )
