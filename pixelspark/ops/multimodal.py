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


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("orig_width", T.IntegerType(), True),
        T.StructField("orig_height", T.IntegerType(), True),
    ]
)


def resize_images(media: DataFrame, target_w: int, target_h: int, fake: bool = True) -> DataFrame:
    """Image resize over binary payloads via mapInPandas.  The real
    kernel would be PIL `Image.open(io.BytesIO(p)).resize(...)`; the
    container lacks codecs, so the fake kernel scales the payload
    length proportionally to the pixel-count ratio (deterministic) —
    batch shape, schema, and partition behavior are the real thing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if not fake:
                    raise NotImplementedError(
                        "real image decode requires PIL, not present in this container"
                    )
                if r.payload is None or not r.width or not r.height:
                    new_payload = None
                else:
                    ratio = (target_w * target_h) / float(r.width * r.height)
                    n = max(1, int(len(r.payload) * min(ratio, 1.0)))
                    new_payload = bytes(r.payload[:n])
                rows.append((r.media_id, new_payload, target_w, target_h, r.width, r.height))
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return media.where(F.col("format") == "png").mapInPandas(run, RESIZE_SCHEMA)


def resample_audio(media: DataFrame, target_rate_hz: int = 16_000, fake: bool = True) -> DataFrame:
    """Audio resampling plan: duration is invariant, byte rate scales
    with the target sample rate.  Real kernel = soundfile/librosa; the
    Spark side (schema, filter to audio formats, batch iteration) is
    real and the fake kernel is deterministic."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("sample_rate_hz", T.IntegerType(), False),
            T.StructField("duration_ms", T.LongType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if not fake:
                    raise NotImplementedError(
                        "real audio decode requires soundfile/librosa, not in this container"
                    )
                payload = None if r.payload is None else bytes(
                    r.payload[: max(1, int(len(r.payload) * min(target_rate_hz / 44_100.0, 1.0)))]
                )
                rows.append((r.media_id, payload, target_rate_hz, r.duration_ms))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return media.where(F.col("format") == "wav").mapInPandas(run, out_schema)


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


def extract_features_arrow(media: DataFrame) -> DataFrame:
    """mapInArrow feature extraction — the FAST Python path for binary
    columns.  mapInPandas materializes every payload as a Python bytes
    object inside a pandas row loop; here the Arrow RecordBatch is
    consumed zero-copy: one contiguous uint8 view over the batch's
    data buffer + the offsets vector, so n_bytes and byte_mean are
    single vectorized numpy reductions (`np.add.reduceat`) over ALL
    payloads in the batch at once.  Same FEATURE_SCHEMA, same values
    as extract_features (asserted in tests); use this variant when the
    kernel is expressible on raw bytes and mapInPandas only when you
    need per-item codec calls."""
    import numpy as np
    import pyarrow as pa

    def run(batches):
        for batch in batches:
            names = batch.schema.names
            ids = batch.column(names.index("media_id")).to_numpy(zero_copy_only=False)
            fmts = batch.column(names.index("format")).to_pylist()
            arr = batch.column(names.index("payload"))
            n = len(arr)
            valid = arr.is_valid().to_numpy(zero_copy_only=False)
            # zero-copy views: offsets buffer + data buffer
            off_buf, data_buf = arr.buffers()[1], arr.buffers()[2]
            offsets = np.frombuffer(off_buf, dtype=np.int32)[arr.offset : arr.offset + n + 1]
            data = (
                np.frombuffer(data_buf, dtype=np.uint8)
                if data_buf is not None
                else np.zeros(0, np.uint8)
            )
            lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
            # vectorized per-item byte sums over the whole batch
            sums = np.add.reduceat(data.astype(np.int64), offsets[:-1]) if len(data) else np.zeros(n, np.int64)
            sums = np.where(lengths > 0, sums, 0)
            means = np.where(lengths > 0, sums / np.maximum(lengths, 1), np.nan)
            bins = np.array(
                [
                    len(np.unique(data[offsets[i] : offsets[i + 1]] >> 4)) if lengths[i] else 0
                    for i in range(n)
                ],
                np.int32,
            )
            nb = np.where(valid, lengths, 0)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(nb, pa.int64()),
                    pa.array([None if not lengths[i] else float(means[i]) for i in range(n)], pa.float64()),
                    pa.array(np.where(valid, bins, 0), pa.int32()),
                    pa.array(fmts, pa.string()),
                ],
                names=[f.name for f in FEATURE_SCHEMA.fields],
            )

    return media.mapInArrow(run, FEATURE_SCHEMA)
