"""Structured Streaming surface (SURVEY §2b streaming row).

The reference is batch-only; the engine provides the streaming shapes a
training-data pipeline needs, built so the *same expressions* serve batch
and streaming (``F.window`` works in both — ``workload/window_queries.py``
runs it in batch; here it runs under ``readStream`` with a watermark).
"""

from agol_pandas_spark.streaming.windows import (
    stream_from_directory,
    windowed_counts,
    write_stream_to_memory,
)

__all__ = ["stream_from_directory", "windowed_counts", "write_stream_to_memory"]
