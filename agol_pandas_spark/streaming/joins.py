"""Stream-stream joins (Structured Streaming).

A stream-stream inner join buffers BOTH sides in state; unbounded
buffering is the failure mode at scale, so the contract here requires
(a) watermarks on both inputs and (b) an event-time range bound in the
join condition — together they let Spark evict state as the watermark
advances (state held ≈ watermark + interval, independent of stream
length). Without the range bound, state grows with the stream and a
1000-executor job dies slowly; this helper refuses to build that plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    equi_keys: Column,
    left_ts: str,
    right_ts: str,
    interval: str,
    watermark: str,
) -> DataFrame:
    """Inner interval join: right events within ``[left_ts, left_ts +
    interval]`` for matching keys. Both sides get ``watermark``; the
    range predicate is part of the join condition, so streaming state is
    bounded (Spark derives per-side eviction thresholds from it)."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    import pyspark.sql.functions as F

    cond = (
        equi_keys
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {interval}"))
    )
    return lw.join(rw, cond, "inner")
