"""Multimodal (image/audio/video) column plumbing (north-star).

Design: media are opaque ``binary`` columns + a typed metadata struct.
All Spark-side plumbing — schema, partition sizing, Arrow batch shape,
mapInPandas signatures — is real and tested; the codec step itself is
stubbed (this container has no image/audio libs) behind
``decode_fn=None`` -> deterministic fake, or raises NotImplementedError
when a real decode is demanded.

At 100 TB: binary payloads dominate row size, so ``bytes_per_batch``
bounds Arrow batch memory, and media tables should be stored with
``spark.sql.files.maxPartitionBytes`` sized to a handful of rows.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_KINDS = ("image", "video", "audio", "text")

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("content", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType(), True),
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("n_frames", IntegerType(), True),
                    StructField("sample_rate", IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def attach_media_meta(df: DataFrame, content_col: str = "content", kind: str = "image") -> DataFrame:
    """Derive cheap metadata (byte length, md5 digest) JVM-side —
    no decode needed, no Python."""
    c = F.col(content_col)
    return df.withColumn("n_bytes", F.octet_length(c)).withColumn("digest", F.md5(c)).withColumn(
        "kind", F.lit(kind)
    )


def _fake_decode(content: bytes | None, kind: str) -> dict:
    """Deterministic stand-in for a real codec: features derived from
    the bytes themselves so tests are stable."""
    if content is None:
        return {"feat_mean": None, "feat_dim": 0}
    s = sum(content[:256]) if content else 0
    return {"feat_mean": float(s % 997) / 997.0, "feat_dim": min(len(content), 2048)}


def decode_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    kind: str = "image",
    decode_fn: Callable[[bytes | None, str], dict] | None = None,
    require_real_codec: bool = False,
    batch_rows: int = 64,
) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow-batched).

    ``decode_fn`` is the pluggable codec (bytes -> feature dict). The
    default is the deterministic fake; ``require_real_codec=True``
    raises NotImplementedError — the real image/audio libraries are not
    available in this environment (STUB, clearly marked).
    ``batch_rows`` caps Arrow batch height so big payloads don't blow
    executor memory.
    """
    if require_real_codec:
        raise NotImplementedError(
            "real media codecs (PIL/av/librosa) are not installed in this "
            "environment; pass decode_fn= or use the deterministic fake"
        )
    fn = decode_fn or _fake_decode

    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("feat_mean", DoubleType(), True),
            StructField("feat_dim", IntegerType(), True),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                feats = [fn(c, kind) for c in chunk[content_col]]
                yield pd.DataFrame(
                    {
                        id_col: chunk[id_col].values,
                        "feat_mean": [f["feat_mean"] for f in feats],
                        "feat_dim": [f["feat_dim"] for f in feats],
                    }
                )

    return df.select(id_col, content_col).mapInPandas(_decode, schema=out_schema)


def sample_frames(
    df: DataFrame,
    n_frames_col: str = "meta.n_frames",
    every: int = 10,
    id_col: str = "media_id",
) -> DataFrame:
    """Frame sampling plan for video: one row per sampled frame index.

    Pure ``sequence``+``explode`` — the decode of each frame is then a
    :func:`decode_features` pass over (media_id, frame_idx).
    """
    n = F.coalesce(F.col(n_frames_col), F.lit(0))
    return df.select(
        id_col,
        F.explode(
            F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every))
        ).alias("frame_idx"),
    ).filter(n > 0)


def resize_plan(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize request plan: records target dims + scale factors JVM-side;
    the pixel work itself is the (stubbed) codec step."""
    return df.withColumn("target_w", F.lit(target_w)).withColumn(
        "target_h", F.lit(target_h)
    ).withColumn(
        "scale_x", F.col("target_w") / F.col("meta.width")
    ).withColumn("scale_y", F.col("target_h") / F.col("meta.height"))
