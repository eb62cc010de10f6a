"""Multimodal column plumbing (SURVEY.md §2.10 / BASELINE.json north star).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata structs. The Spark-side plumbing — schema, batch iteration via
``mapInPandas`` (Arrow-batched), partition sizing — is real and tested;
the codec step is stubbed (image/audio libraries are not in this
container) behind ``DECODERS``: a deterministic fake for tests, a
``NotImplementedError`` raiser for real formats.

Scale notes: binary payloads dominate row size, so the loaders should set
``spark.sql.files.maxPartitionBytes`` low enough that an Arrow batch of
rows fits executor memory; mapInPandas streams batches (never a whole
partition) and the output schema drops the payload as early as possible
(feature-extract, then project the bytes away — column pruning can't help
once the UDF needs the bytes, so the projection happens in the iterator).
"""

from __future__ import annotations

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


DECODERS = {
    "fake": _fake_decode,  # deterministic test decoder
    "image": _unavailable,  # STUB: PIL.Image.open(BytesIO(payload)) → resize → pixels
    "audio": _unavailable,  # STUB: librosa.load → mel spectrogram
    "video": _unavailable,  # STUB: ffmpeg frame sample → per-frame image path
}


def extract_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """mapInPandas feature extraction: payload → fixed-width feature vector
    + cheap integrity stats. Batches stream through Arrow; the payload
    column is dropped inside the iterator (first row of output never
    carries bytes)."""
    decode = DECODERS[decoder]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda p: 0 if p is None else len(p)).astype("int64"),
                    "checksum": payloads.map(
                        lambda p: 0 if p is None else sum(p) % (1 << 31)
                    ).astype("int64"),
                    "feature": payloads.map(lambda p: decode(bytes(p or b""))),
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
