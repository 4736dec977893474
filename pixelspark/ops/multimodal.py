"""Multimodal column handling: images/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched pandas
transforms over mapInPandas.

The container has no image/audio codecs, so the decode kernels are
STUBBED: `decode_media` raises NotImplementedError for real codecs and
provides a deterministic fake decoder for tests.  The Spark-side
plumbing — schemas, batch iteration, partition behavior, UDF
signatures — is real and tested; swapping the kernel body for
PIL/librosa/ffmpeg is a localized change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_mean", T.DoubleType(), True),
        T.StructField("byte_entropy_bins", T.IntegerType(), True),
        T.StructField("format", T.StringType(), True),
    ]
)

FAKE_FORMATS = ("png", "wav", "mp4")


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture: payload is the
    UTF-8 text bytes (a deterministic opaque blob), metadata derived
    from doc_id — exercises the binary+metadata schema end-to-end."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.element_at(F.array(*[F.lit(f) for f in FAKE_FORMATS]), (F.col("doc_id") % 3 + 1).cast("int")).alias("format"),
        ((F.col("doc_id") % 16 + 1) * 64).cast("int").alias("width"),
        ((F.col("doc_id") % 9 + 1) * 64).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
    )


def decode_kernel(payload: bytes, fmt: str, fake: bool = True) -> dict:
    """The per-item decode. Real codecs are unavailable in this
    container — a real deployment replaces the fake branch with
    PIL.Image.open / soundfile.read / av.open."""
    if not fake:
        raise NotImplementedError(
            f"real {fmt} decoding requires image/audio libs not present in this container"
        )
    if payload is None:
        return {"n_bytes": 0, "byte_mean": None, "byte_entropy_bins": 0}
    n = len(payload)
    mean = sum(payload) / n if n else None
    bins = len({b >> 4 for b in payload})
    return {"n_bytes": n, "byte_mean": mean, "byte_entropy_bins": bins}


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — Arrow
    batches in, Arrow batches out; partition-parallel, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                feats = decode_kernel(r.payload, r.format, fake=fake)
                rows.append(
                    (r.media_id, feats["n_bytes"], feats["byte_mean"], feats["byte_entropy_bins"], r.format)
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame timestamp to
    decode (the decode itself is the stubbed kernel).  Built with
    sequence() so the fan-out happens JVM-side, not in Python."""
    return media.where(F.col("format") == "mp4").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("duration_ms"), F.lit(every_ms).cast("long"))
        ).alias("frame_ts_ms"),
    )
