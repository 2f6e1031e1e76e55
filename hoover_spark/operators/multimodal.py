"""Multimodal column plumbing: image/audio/video as opaque binary.

A 100 TB training-data pipeline carries media as ``binary`` payload
columns plus typed metadata, and runs decode / feature-extraction /
resize / frame-sampling as **Arrow-batched pandas UDFs** over
``mapInPandas``. This module makes all of that plumbing real — schema,
partition sizing, UDF signatures, batch shapes, deterministic fakes
for tests — while the actual codec calls are STUBBED (the sandbox has
no image/audio libraries): ``decode_media`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic hash-derived "decode" stands in so every downstream
stage is fully testable.

Scale notes:
- media rows are *large*; ``media_repartition_by_size`` packs rows into
  partitions by cumulative payload bytes (not row count) so one task
  never holds 100 × 200 MB videos.
- feature extraction emits small fixed-width vectors; the expensive
  binary column is dropped *before* any shuffle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def synthetic_media(spark: SparkSession, n: int, payload_bytes: int = 256) -> DataFrame:
    """Deterministic fake media table (payload = repeated sha256 bytes
    of the asset id — binary, opaque, reproducible at any parallelism)."""
    reps = payload_bytes // 32 + 1
    payload = F.unbase64(
        F.base64(
            F.substring(
                F.repeat(F.sha2(F.col("id").cast("string"), 256), reps), 1, payload_bytes
            ).cast("binary")
        )
    )
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
    )
    meta = F.struct(
        (F.pmod(F.col("id") * 7, F.lit(1920)) + 1).cast("int").alias("width"),
        (F.pmod(F.col("id") * 13, F.lit(1080)) + 1).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.pmod(F.col("id"), F.lit(300)) + 1).cast("int").alias("n_frames"),
        F.lit("fake").alias("codec"),
    )
    return spark.range(n).select(
        F.col("id").alias("asset_id"), kind.alias("kind"), payload.alias("payload"), meta.alias("meta")
    )


def media_repartition_by_size(df: DataFrame, target_bytes: int = 128 << 20) -> DataFrame:
    """Repartition media rows so each partition holds ~``target_bytes``
    of payload: bucket = cumulative-bytes // target via a deterministic
    hash-spread (exact bin packing needs a sort; hash-by-size-class is
    the shuffle-cheap approximation used in practice)."""
    size_class = F.floor(F.log2(F.length("payload") + 1)).cast("int")
    n_parts = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    return df.repartition(n_parts, size_class, F.col("asset_id"))


try:  # real codecs are optional — the engine plumbing never needs them
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # pragma: no cover - sandbox has no PIL
    _PILImage = None

try:
    import soundfile as _soundfile  # type: ignore
except ImportError:  # pragma: no cover - sandbox has no soundfile
    _soundfile = None


def decode_media(payload: bytes, kind: str, meta: dict, fake: bool = False) -> np.ndarray:
    """Decode a media payload to an ndarray.

    Import-guarded real path: when PIL (images) / soundfile (audio) is
    importable the actual codec runs — drop the module onto a real
    cluster's executors and this is a working decode stage. When the
    library is absent (this sandbox ships neither) the real path raises
    ``NotImplementedError`` and ``fake=True`` yields a deterministic
    hash-derived ndarray, shape-correct per modality, so every
    downstream stage (featurize, frame-sample, partition sizing) stays
    fully testable."""
    if not fake:
        import io as _io

        if kind == "image" and _PILImage is not None:
            img = _PILImage.open(_io.BytesIO(payload)).convert("RGB")
            return np.asarray(img, dtype=np.float64)
        if kind == "audio" and _soundfile is not None:
            data, _rate = _soundfile.read(_io.BytesIO(payload), dtype="float64")
            return np.asarray(data)
        raise NotImplementedError(
            f"real {kind} decode needs "
            f"{'PIL' if kind == 'image' else 'soundfile/ffmpeg'} on the "
            "executors — not available here; pass fake=True for the "
            "deterministic test decode"
        )
    # Raw byte codes as exactly-representable float64 integers: sums and
    # means over them are bit-for-bit reproducible by any engine (the
    # DuckDB oracle recomputes the pooled features from the same bytes).
    seed = np.frombuffer(payload[:32], dtype=np.uint8).astype(np.float64)
    if kind == "image":
        h, w = min(meta["height"], 8), min(meta["width"], 8)
        return np.resize(seed, (h, w, 3))
    if kind == "audio":
        return np.resize(seed, (min(meta["sample_rate"], 1024),))
    return np.resize(seed, (min(meta["n_frames"], 4), 8, 8, 3))


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """(asset_id, kind, payload_bytes, feature[FEATURE_DIM]) via
    mapInPandas — the Arrow batch path a real encoder (CLIP/wav2vec)
    would use; the featurizer here is the deterministic fake."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, sizes = [], []
            for payload, kind, meta in zip(pdf["payload"], pdf["kind"], pdf["meta"]):
                arr = decode_media(bytes(payload), kind, meta, fake=fake)
                flat = arr.ravel()
                # deterministic pooled "embedding": strided means
                pooled = np.array(
                    [flat[i::FEATURE_DIM].mean() if flat[i::FEATURE_DIM].size else 0.0
                     for i in range(FEATURE_DIM)],
                    dtype=np.float64,
                )
                feats.append(pooled)
                sizes.append(len(payload))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "payload_bytes": sizes,
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media_repartition_by_size(df).mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 30, fake: bool = True) -> DataFrame:
    """(asset_id, frame_idx, frame) — frame sampling for video rows:
    1 row in → n_frames/every_n rows out (mapInPandas is the correct
    shape for 1→N row expansion with binary payloads)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "frame_idx": [], "frame": []}
            vids = pdf[pdf["kind"] == "video"]
            for payload, asset_id, meta in zip(vids["payload"], vids["asset_id"], vids["meta"]):
                arr = decode_media(bytes(payload), "video", meta, fake=fake)
                for idx in range(0, meta["n_frames"], every_n):
                    frame = arr[idx % arr.shape[0]]
                    out["asset_id"].append(asset_id)
                    out["frame_idx"].append(idx)
                    out["frame"].append(frame.astype(np.float32).tobytes())
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FRAME_SCHEMA)
