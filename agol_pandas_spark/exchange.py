"""Arrow exchange & Python-UDF surface (SURVEY §7 step 5).

The reference's whole execution model is "pull everything to the driver,
process with pandas in a loop" (``df_to_pandas_chunks``,
``src/agol_pandas.py:159-216``, with a full re-collect per chunk at
``:204``). This module is the engine's sanctioned pandas interop, in
order of preference:

1. stay in JVM expressions (everything in ``functions/`` — no pandas);
2. :func:`grouped_apply` / :func:`map_batches` — Arrow-batched pandas on
   the **executors** (``applyInPandas`` / ``mapInPandas``);
3. :func:`to_pandas_chunks` — ordered pandas chunks on the **driver**,
   only for feeding non-distributed sinks (the reference's actual use
   case), collected once.

Row-at-a-time Python UDFs are deliberately not wrapped: at 100 TB the
~10-100× penalty vs Arrow batching makes them a bug, not an option.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from agol_pandas_spark.operators.chunking import iter_pandas_chunks as to_pandas_chunks  # noqa: F401


def grouped_apply(
    df: DataFrame,
    keys: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: T.StructType | str,
) -> DataFrame:
    """Per-group pandas transform (``applyInPandas``).

    One shuffle on ``keys``; each group must fit in one worker's memory —
    that is the operator's contract, so key cardinality/skew is the thing
    to check before reaching for this (salt or pre-aggregate when one
    group could be huge).
    """
    return df.groupBy(*[df[k] for k in keys]).applyInPandas(fn, schema=schema)


def map_batches(
    df: DataFrame,
    fn: Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]],
    schema: T.StructType | str,
) -> DataFrame:
    """Streaming Arrow-batch transform (``mapInPandas``): no shuffle, no
    per-group memory requirement; the go-to for per-row Python logic
    (tokenizers, codecs — see ``operators/multimodal.py``)."""
    return df.mapInPandas(fn, schema=schema)


def map_arrow_batches(
    df: DataFrame,
    fn,
    schema: T.StructType | str,
) -> DataFrame:
    """Arrow-RecordBatch transform (``mapInArrow``): like
    :func:`map_batches` but hands the Python worker raw
    ``pyarrow.RecordBatch`` objects — no pandas conversion, so columnar
    kernels (pyarrow.compute, numpy-on-buffers) run zero-copy. Prefer this
    over pandas batches when the kernel is itself Arrow-native."""
    return df.mapInArrow(fn, schema=schema)


def grouped_apply_arrow(
    df: DataFrame,
    keys: Sequence[str],
    fn,
    schema: T.StructType | str,
) -> DataFrame:
    """Per-group Arrow-table transform (``applyInArrow``): the zero-copy
    sibling of :func:`grouped_apply` — each group arrives as one
    ``pyarrow.Table`` and the kernel returns one. Same contract (one
    shuffle on ``keys``, a group must fit in one worker), minus the
    pandas conversion overhead — prefer it when the per-group kernel is
    Arrow/numpy-native."""
    return df.groupBy(*[df[k] for k in keys]).applyInArrow(fn, schema=schema)
