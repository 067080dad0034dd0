"""Multimodal (image/audio/video) column handling.

Contract: media travels as an opaque ``binary`` column plus a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched pandas functions over ``mapInPandas`` — the Spark
side (schemas, batch iteration, partitioning) is real and tested; the
codec itself is pluggable because media libraries (PIL/ffmpeg/…)
are not available in this container.

At scale: binary payloads dominate partition size — size
``spark.sql.files.maxPartitionBytes`` for row-group-sized media
batches, keep metadata in separate (pruned) columns so metadata-only
queries never touch bytes, and never shuffle the binary column except
behind an explicit repartition on a narrow projection.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: typed metadata carried next to every media payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image | audio | video
        T.StructField("format", T.StringType()),       # png | wav | mp4 | ...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("error", T.StringType()),
    ]
)


def default_decoder(payload: bytes, fmt: str) -> list[float]:
    """Placeholder codec: media libraries are not present in this
    container.  Deployments inject a real decoder (PIL / torchaudio /
    pyav) via ``extract_features(..., decoder=...)``."""
    raise NotImplementedError(
        "media decoding requires an image/audio library not present in "
        "this environment; inject a decoder via extract_features(decoder=…)"
    )


def deterministic_fake_decoder(payload: bytes, fmt: str) -> list[float]:
    """Deterministic stand-in used by tests: 8 byte-histogram features.

    Keeps the full mapInPandas pipeline executable (and its outputs
    stable) without any media library.
    """
    if not payload:
        return [0.0] * 8
    counts = [0] * 8
    for b in payload:
        counts[b >> 5] += 1
    n = float(len(payload))
    return [c / n for c in counts]


def byte_histogram_counts(payload: bytes, fmt: str) -> list[float]:
    """Oracle-checkable decoder: 8 raw byte-histogram bin counts
    (bin = byte >> 5).  Counts are exact integers (lossless in
    float32), so the declared correctness query hash-compares cleanly
    against a DuckDB recomputation — unlike normalized ratios, which
    hit binary-midpoint rounding hazards."""
    counts = [0] * 8
    for b in payload or b"":
        counts[b >> 5] += 1
    return [float(c) for c in counts]


def attach_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Fill size_bytes from the payload; callers supply the rest."""
    return df.withColumn(
        "meta",
        F.col("meta").withField("size_bytes", F.length(F.col(payload_col)).cast("long")),
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], list[float]] = default_decoder,
    id_col: str = "media_id",
    payload_col: str = "payload",
    batch_size_hint: int = 64,
) -> DataFrame:
    """Decode + featurize via ``mapInPandas`` (Arrow batches).

    Errors never fail the job: each row carries ``decode_ok``/``error``
    so the DLQ split downstream can route failures (S5 pattern).
    """
    import pandas as pd

    fmt_col = "meta" in media.columns

    narrow = media.select(
        F.col(id_col).alias("media_id"),
        F.col(payload_col).alias("payload"),
        (F.col("meta.format") if fmt_col else F.lit("bin")).alias("fmt"),
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for mid, payload, fmt in zip(pdf["media_id"], pdf["payload"], pdf["fmt"]):
                try:
                    feat = decoder(bytes(payload) if payload is not None else b"", fmt)
                    out.append((mid, feat, True, None))
                except Exception as e:  # noqa: BLE001 — route, don't fail
                    out.append((mid, None, False, str(e)[:200]))
            yield pd.DataFrame(
                out, columns=["media_id", "feature", "decode_ok", "error"]
            )

    return narrow.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resize_ok", T.BooleanType()),
        T.StructField("error", T.StringType()),
    ]
)


def default_resizer(
    payload: bytes, fmt: str, width: int, height: int
) -> bytes:
    """Placeholder codec, same seam as ``default_decoder``: inject a
    real resizer (PIL ``Image.resize`` / ffmpeg scale) in deployment."""
    raise NotImplementedError(
        "image resizing requires a media library not present in this "
        "environment; inject a resizer via resize_media(resizer=…)"
    )


def deterministic_fake_resizer(
    payload: bytes, fmt: str, width: int, height: int
) -> bytes:
    """Deterministic stand-in: stride-subsample the payload bytes to
    exactly width×height bytes (repeating when the source is smaller)
    — wrong as pixels, right as plumbing: output size tracks the
    requested dimensions, empty input yields empty output."""
    n = width * height
    if not payload or n <= 0:
        return b""
    reps = (n * len(payload) + len(payload) - 1) // len(payload)
    step = max(len(payload) * reps // n, 1)
    buf = (payload * reps)[::step][:n]
    return bytes(buf)


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, str, int, int], bytes] = default_resizer,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize via ``mapInPandas`` (Arrow batches) — the write-side
    normalization pass of an image pipeline (thumbnail / train-res
    standardization).  Same contract as ``extract_features``: errors
    route per-row (``resize_ok``/``error``), never fail the job; the
    projection is narrowed to (id, payload, fmt) BEFORE the Python
    hop so no other column pays the Arrow transfer; output metadata
    carries the new dimensions so downstream metadata-only queries
    stay byte-free."""
    import pandas as pd

    fmt_col = "meta" in media.columns
    narrow = media.select(
        F.col(id_col).alias("media_id"),
        F.col(payload_col).alias("payload"),
        (F.col("meta.format") if fmt_col else F.lit("bin")).alias("fmt"),
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for mid, payload, fmt in zip(pdf["media_id"], pdf["payload"], pdf["fmt"]):
                try:
                    resized = resizer(
                        bytes(payload) if payload is not None else b"",
                        fmt, width, height,
                    )
                    out.append((mid, resized, width, height, True, None))
                except Exception as e:  # noqa: BLE001 — route, don't fail
                    out.append((mid, None, None, None, False, str(e)[:200]))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "payload", "width", "height",
                    "resize_ok", "error",
                ],
            )

    return narrow.mapInPandas(run, RESIZED_SCHEMA)


def frame_sample_plan(video: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling *plan*: one output row per requested frame
    timestamp (the decode of each frame goes through
    ``extract_features`` with a video decoder).  Pure column algebra:
    sequence over the duration — no UDF."""
    return video.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
