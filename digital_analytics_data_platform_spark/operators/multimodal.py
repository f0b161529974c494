"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The reference already stores page images as BYTES next to extracted
text (``01_Notebook_v8.ipynb`` BRONZE DDL: ``page_image_png BYTES``);
this module generalizes that to the decode / feature-extract /
resize / frame-sample stages a training-data pipeline needs.

The decode step itself is STUBBED (no image/audio libs in this
container): ``decode_image`` raises ``NotImplementedError`` unless a
deterministic fake decoder is requested. Everything Spark-side —
schema, batch iteration, partitioning, UDF signatures — is real and
tested; swapping the stub for Pillow/torchaudio is a one-function
change inside the pandas batch loop.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synthetic_media(spark, n: int, *, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from
    xxhash64 streams (column expressions — distributed generation)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.encode(
            F.concat_ws(
                "",
                F.transform(
                    F.sequence(F.lit(0), F.pmod(F.xxhash64("id", F.lit(seed), F.lit("len")), F.lit(64)) + 16),
                    lambda i: F.chr(F.pmod(F.xxhash64(F.col("id"), i, F.lit(seed)), F.lit(64)) + 32),
                ),
            ),
            "utf-8",
        ).alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.pmod(F.xxhash64("id", F.lit(seed), F.lit("w")), F.lit(1920)) + 1).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(seed), F.lit("h")), F.lit(1080)) + 1).cast("int").alias("height"),
        (F.pmod(F.xxhash64("id", F.lit(seed), F.lit("d")), F.lit(60000)) + 1).cast("int").alias("duration_ms"),
    )


def decode_image(payload: bytes, *, fake: bool = False):
    """The decode stub. Real deployments: ``PIL.Image.open(BytesIO(…))``.
    ``fake=True`` returns a deterministic pseudo-decode (byte histogram)
    so the pipeline plumbing is testable in this container."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires Pillow/libvips, not present in this container; "
            "pass fake=True for the deterministic test decoder"
        )
    hist = [0] * 16
    for b in payload:
        hist[b % 16] += 1
    return hist


def extract_features(df: DataFrame, *, fake_decode: bool = True, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each pandas batch is vectorized NumPy work — the slow
    path done right (no per-row Python UDF; Arrow transfer both ways).
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len).astype("int32")
            ent, feats = [], []
            for p in payloads:
                arr = np.frombuffer(p, dtype=np.uint8)
                counts = np.bincount(arr, minlength=256).astype(np.float64)
                probs = counts[counts > 0] / max(len(arr), 1)
                ent.append(float(-(probs * np.log2(probs)).sum()))
                feats.append([float(x) for x in decode_image(bytes(p), fake=fake_decode)])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "byte_entropy": ent,
                    "feature": feats,
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per
    sampled timestamp (the decode of the actual frame is the same stub
    boundary). Pure column expressions — explode over a sequence."""
    vids = df.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ms"),
        F.xxhash64("media_id", F.col("media_id")).alias("frame_fingerprint"),
    )
