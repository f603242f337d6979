"""Event-time streaming: watermarks, tumbling/sliding windows, state.

Scale notes: a streaming agg shuffles on (window, keys) exactly like the
batch agg; the watermark bounds state size — without it an event-time agg
retains every window forever. ``availableNow`` triggers give
batch-at-a-time reprocessing with streaming semantics (the standard
backfill pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stream_from_directory(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream: each new file under ``path`` becomes a
    micro-batch (the standard landing-zone ingestion shape)."""
    return (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_len: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked event-time windowed aggregation (tumbling by default,
    sliding when ``slide`` is given). Late rows beyond the watermark are
    dropped; state for closed windows is evicted."""
    win = (
        F.window(ts_col, window_len)
        if slide is None
        else F.window(ts_col, window_len, slide)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 10000).cast("long")).alias(
                "value_scaled"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
            (F.col("value_scaled").cast("double") / 10000.0).alias("total_value"),
        )
    )


def write_stream_to_memory(
    df: DataFrame, query_name: str, output_mode: str = "append"
):
    """Memory-sink runner with availableNow trigger: drains everything
    currently available, then stops — deterministic for tests/backfills."""
    return (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming deduplication: drop repeats of ``keys`` arriving within
    the watermark window (``dropDuplicatesWithinWatermark``). State holds
    one entry per key seen inside the watermark horizon and is evicted as
    event time advances — the bounded-state streaming twin of
    ``operators.dedup.exact_dedup`` for at-least-once sources that can
    replay recent records."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
