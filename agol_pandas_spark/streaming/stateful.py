"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (SURVEY §2b streaming-state row; the reference
has nothing stateful — batch CSV bridge only).

Semantics match ``F.session_window(ts, gap)``: a session extends while the
next event starts strictly before ``last_ts + gap``; an event at exactly
``last_ts + gap`` opens a new session (session windows are ``[start,
last+gap)``).

Scale shape: one shuffle on the key; state per key is a single open
session (4 scalars), so state size is O(active keys) regardless of event
volume. Sessions closed by an incoming batch are emitted with
``closed=true``; the still-open session is emitted with ``closed=false``
each batch (update mode) so an ``availableNow`` drain of a finite corpus
yields exactly the batch sessionization.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start_us long, session_last_us long, "
    "n_events long, closed boolean"
)
STATE_SCHEMA = "session_start_us long, session_last_us long, n_events long"


def sessionize_stateful(
    grouped, gap_minutes: int = 30
) -> DataFrame:
    """Apply gap sessionization over a streaming ``GroupedData`` (grouped
    by the user/key column). Timestamps flow as epoch-µs longs — exact,
    TZ-proof, and cheap in Arrow."""
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = None, None, 0
        out: list[tuple[int, int, int, int, bool]] = []
        for pdf in pdfs:
            for ts_us in pdf["ts_us"].sort_values().to_numpy():
                ts_us = int(ts_us)
                if start_us is None:
                    start_us, last_us, n = ts_us, ts_us, 1
                elif ts_us < last_us + gap_us:
                    last_us, n = ts_us, n + 1
                else:
                    out.append((user_id, start_us, last_us, n, True))
                    start_us, last_us, n = ts_us, ts_us, 1
        if start_us is not None:
            state.update((start_us, last_us, n))
            out.append((user_id, start_us, last_us, n, False))
        yield pd.DataFrame(
            out,
            columns=[
                "user_id",
                "session_start_us",
                "session_last_us",
                "n_events",
                "closed",
            ],
        )

    return grouped.applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
