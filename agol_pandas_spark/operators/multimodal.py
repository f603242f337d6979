"""Multimodal columns: opaque binary payloads + typed metadata
(north-star ops, SURVEY §2b ★).

Design (the part that matters at 100 TB):

- payload is a single ``BinaryType`` column; metadata (mime, width, …) is
  a sibling ``StructType`` column. Parquet stores both natively; column
  pruning means metadata-only queries never touch payload bytes.
- decode / feature-extract / resize / frame-sample run as **Arrow-batched
  ``mapInPandas``** stages: each executor task receives pandas batches,
  applies the (C-library) transform, yields batches. Schema in/out is
  declared up front so Catalyst can plan around the stage.
- the actual image/audio codecs are NOT in this container, so the codec
  body is stubbed: :func:`decode_payload_stub` raises
  ``NotImplementedError`` unless given the deterministic fake codec used
  by tests. Everything around it — schema, batching, partitioning,
  UDF signature — is real and tested.

The reference has no multimodal surface at all (it is a tabular CSV
bridge, ``src/agol_pandas.py``); this module is pure north-star scope.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried beside every payload column
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)


def attach_payload_metadata(
    df: DataFrame, payload_col: str, mime: str = "application/octet-stream"
) -> DataFrame:
    """Derive the typed metadata struct from a binary column — JVM-side
    (length/sha256 are built-ins), no Python in the loop."""
    p = F.col(payload_col)
    return df.withColumn(
        f"{payload_col}_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(p).cast("long").alias("n_bytes"),
            F.lower(F.sha2(p, 256)).alias("sha256"),
        ),
    )


def text_as_payload(df: DataFrame, text_col: str, payload_col: str = "payload") -> DataFrame:
    """Test fixture path: encode a text column as a UTF-8 binary payload
    (stands in for image/audio bytes in this container)."""
    return df.withColumn(payload_col, F.encode(F.col(text_col), "UTF-8"))


def fake_codec(payload: bytes) -> dict:
    """Deterministic stand-in for a media decoder: pretends the payload is
    a row-major uint8 'image' and reports shape + simple features."""
    n = len(payload)
    width = max(1, int(n**0.5))
    height = max(1, n // width)
    mean = sum(payload) / n if n else 0.0
    return {"width": width, "height": height, "mean_intensity": float(mean)}


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def decode_payload_stub(payload: bytes) -> dict:
    """Real-codec slot. The container has no image/audio libraries, so this
    is a clearly-marked stub; swap in PIL/libav here in a real deployment."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use codec=fake_codec for the deterministic test path"
    )


def decode_features(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    codec: Callable[[bytes], dict] = decode_payload_stub,
    batch_features: int = 3,
) -> DataFrame:
    """Arrow-batched decode stage: (id, payload) → (id, width, height,
    mean_intensity) via ``mapInPandas``.

    This is the scale shape for any media transform: payload bytes stay on
    executors, move once over Arrow into the Python worker, and the output
    schema is fixed so downstream planning is unaffected. Batch size is
    governed by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — for
    multi-MB payloads set it low (e.g. 64) to bound worker memory.
    """
    out_schema = T.StructType(
        [df.schema[id_col], *DECODED_SCHEMA.fields]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [codec(p) for p in pdf[payload_col]]
            out = pd.DataFrame(feats)
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, payload_col).mapInPandas(process, schema=out_schema)


def sample_frames(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    frame_size: int = 256,
    stride: int = 1024,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling plumbing: slice each payload into fixed-size frames
    at a stride (stand-in for video frame extraction). Pure JVM byte ops
    (``substring`` on binary), exploded to one row per frame — no Python.
    """
    last = F.least(
        F.lit(max_frames - 1),
        F.floor((F.length(payload_col) - 1) / stride).cast("int"),
    )
    idx = F.when(last < 0, F.array().cast("array<int>")).otherwise(
        # guard: sequence(0, -1) auto-steps DOWN to [0, -1] in Spark, so an
        # empty payload would otherwise emit two bogus frames
        F.sequence(F.lit(0), last)
    )
    frames = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("frame_idx"),
            F.substring(F.col(payload_col), i * stride + 1, frame_size).alias(
                "frame_bytes"
            ),
        ),
    )
    return (
        df.select(id_col, F.explode(frames).alias("f"))
        .select(
            id_col,
            F.col("f.frame_idx").alias("frame_idx"),
            F.col("f.frame_bytes").alias("frame_bytes"),
        )
    )


def resize_payload(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    factor: int = 4,
) -> DataFrame:
    """Resize stage plumbing: downsample each payload by keeping every
    ``factor``-th byte (the deterministic stand-in for an image resize —
    swap the kernel body for PIL/opencv in a real deployment).

    Arrow-batched ``mapInPandas``, same scale shape as :func:`decode_features`:
    payloads stay on executors, output schema declared up front. Emits the
    resized payload plus before/after sizes so downstream planning and
    accounting never re-touch the bytes.
    """
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("resized_payload", T.BinaryType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("resized_n_bytes", T.LongType()),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            resized = [bytes(p[::factor]) for p in payloads]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "resized_payload": resized,
                    "n_bytes": [len(p) for p in payloads],
                    "resized_n_bytes": [len(r) for r in resized],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(process, schema=out_schema)
