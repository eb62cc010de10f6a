"""Multimodal column plumbing (SURVEY.md §2.10 / BASELINE.json north star).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata structs. The Spark-side plumbing — schema, batch iteration via
``mapInPandas`` (Arrow-batched), partition sizing — is real and tested.
Codecs: uncompressed 24-bit BMP and 16-bit PCM WAV are decoded for real
with the stdlib (``struct`` / ``wave``) — a genuine bytes→pixels/samples
→features path exercised end-to-end in tests via the ``make_bmp`` /
``make_wav`` fixture builders below. Compressed formats (PNG/JPEG, MP3,
any video codec) need external libraries absent from this container and
stay behind clearly-marked ``NotImplementedError`` stubs.

Scale notes: binary payloads dominate row size, so the loaders should set
``spark.sql.files.maxPartitionBytes`` low enough that an Arrow batch of
rows fits executor memory; mapInPandas streams batches (never a whole
partition) and the output schema drops the payload as early as possible
(feature-extract, then project the bytes away — column pruning can't help
once the UDF needs the bytes, so the projection happens in the iterator).
"""

from __future__ import annotations

import array
import io
import math
import struct
import wave
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary,"
    " meta struct<format string, width int, height int, duration_ms int>"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, checksum long, feature array<double>"


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a codec: 8 byte-histogram buckets,
    normalized. Real decoders plug in via DECODERS."""
    if not payload:
        return [0.0] * 8
    buckets = [0] * 8
    for b in payload:
        buckets[b >> 5] += 1
    n = float(len(payload))
    return [c / n for c in buckets]


def _unavailable(payload: bytes) -> list[float]:
    raise NotImplementedError(
        "codec libraries (PIL/ffmpeg/librosa) not available in this environment"
    )


# --- real stdlib codecs: uncompressed BMP + PCM WAV ------------------------


def make_bmp(width: int, height: int, pixel_fn) -> bytes:
    """Serialize a 24-bit uncompressed BMP. ``pixel_fn(x, y) -> (r, g, b)``
    with y=0 at the top. Deterministic fixture builder for decoder tests."""
    row_size = (width * 3 + 3) & ~3
    img_size = row_size * height
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = []
    for y in range(height - 1, -1, -1):  # BMP stores bottom-up
        row = bytearray()
        for x in range(width):
            r, g, b = pixel_fn(x, y)
            row += bytes((b, g, r))
        row += b"\x00" * (row_size - width * 3)
        rows.append(bytes(row))
    return header + info + b"".join(rows)


def make_wav(freq_hz: float, duration_ms: int, framerate: int = 8000, amplitude: float = 0.5) -> bytes:
    """Serialize a mono 16-bit PCM WAV sine tone via the stdlib ``wave``
    module. Deterministic fixture builder for decoder tests."""
    n = framerate * duration_ms // 1000
    samples = array.array(
        "h",
        (
            int(amplitude * 32767 * math.sin(2 * math.pi * freq_hz * i / framerate))
            for i in range(n)
        ),
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def _decode_image(payload: bytes) -> list[float]:
    """Real image decode for uncompressed 24-bit BMP: bytes → pixels →
    8-dim feature [width, height, mean_r, mean_g, mean_b, top-half lum,
    bottom-half lum, overall lum] (channel means in [0,1]). Compressed
    formats (PNG/JPEG) would go through PIL — not in this container."""
    if payload[:2] != b"BM":
        raise NotImplementedError("only uncompressed BMP is decodable without PIL")
    width, height, _planes, bpp, compression = struct.unpack_from("<iiHHI", payload, 18)
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only 24-bit uncompressed BMP supported")
    offset = struct.unpack_from("<I", payload, 10)[0]
    bottom_up = height > 0
    height = abs(height)
    row_size = (width * 3 + 3) & ~3
    sums = [0, 0, 0]
    lum_top = lum_bot = 0.0
    for row in range(height):
        y = (height - 1 - row) if bottom_up else row  # y=0 at the top
        base = offset + row * row_size
        row_lum = 0
        for x in range(width):
            b, g, r = payload[base + 3 * x : base + 3 * x + 3]
            sums[0] += r
            sums[1] += g
            sums[2] += b
            row_lum += r + g + b
        if y < height // 2:
            lum_top += row_lum
        else:
            lum_bot += row_lum
    n = float(width * height) * 255.0
    half = max(n / 2 * 3, 1.0)
    return [
        float(width),
        float(height),
        sums[0] / n,
        sums[1] / n,
        sums[2] / n,
        lum_top / half,
        lum_bot / half,
        (lum_top + lum_bot) / max(n * 3, 1.0),
    ]


def _decode_audio(payload: bytes) -> list[float]:
    """Real audio decode for 16-bit PCM WAV via stdlib ``wave``: bytes →
    samples → 8-dim feature [framerate, channels, duration_s, rms, peak,
    zero-crossing rate, mean_abs, dc_offset] (amplitudes normalized to
    [-1,1]). Compressed audio (MP3/AAC) needs ffmpeg/librosa — stubbed."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("only PCM WAV is decodable without audio libs")
    with wave.open(io.BytesIO(payload)) as w:
        nch, sw, fr, nf = w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes()
        if sw != 2:
            raise NotImplementedError("only 16-bit PCM WAV supported")
        data = w.readframes(nf)
    samples = array.array("h")
    samples.frombytes(data)
    mono = samples[::nch]  # first channel
    if not mono:
        return [float(fr), float(nch), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    norm = [s / 32768.0 for s in mono]
    n = len(norm)
    zc = sum(1 for a, b in zip(norm, norm[1:]) if (a < 0) != (b < 0))
    return [
        float(fr),
        float(nch),
        n / float(fr),
        math.sqrt(sum(s * s for s in norm) / n),
        max(abs(s) for s in norm),
        zc / max(n - 1, 1),
        sum(abs(s) for s in norm) / n,
        sum(norm) / n,
    ]


DECODERS = {
    "fake": _fake_decode,  # deterministic test decoder
    "image": _decode_image,  # real: uncompressed 24-bit BMP; PNG/JPEG → NotImplementedError (needs PIL)
    "audio": _decode_audio,  # real: 16-bit PCM WAV; MP3/AAC → NotImplementedError (needs ffmpeg/librosa)
    "video": _unavailable,  # STUB: ffmpeg frame sample → per-frame image path
}


def extract_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """mapInPandas feature extraction: payload → fixed-width feature vector
    + cheap integrity stats. Batches stream through Arrow; the payload
    column is dropped inside the iterator (first row of output never
    carries bytes). ``decoder="auto"`` dispatches per row on the ``kind``
    column and degrades gracefully on mixed corpora: a row whose kind has
    no available codec gets ``feature = NULL`` (integrity stats still
    emitted) instead of failing the whole job — the hard
    ``NotImplementedError`` is reserved for explicitly named decoders,
    where the caller asserted the corpus is decodable."""
    if decoder != "auto":
        DECODERS[decoder]  # fail fast on unknown names, on the driver

    def auto_decode(kind: str, payload: bytes) -> list[float] | None:
        try:
            return DECODERS.get(kind, _unavailable)(payload)
        except NotImplementedError:
            return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if decoder == "auto":
                feats = [
                    auto_decode(k, bytes(p or b""))
                    for k, p in zip(pdf["kind"], payloads)
                ]
            else:
                decode = DECODERS[decoder]
                feats = [decode(bytes(p or b"")) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda p: 0 if p is None else len(p)).astype("int64"),
                    "checksum": payloads.map(
                        lambda p: 0 if p is None else sum(p) % (1 << 31)
                    ).astype("int64"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame offset,
    computed from metadata only (no decode) — shows the explode shape a
    video pipeline uses before per-frame decode."""
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return media.select(
        "media_id",
        "kind",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("offset_ms", F.col("frame_idx") * every_ms)
