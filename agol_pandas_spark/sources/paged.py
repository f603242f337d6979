"""Paged-source connector: the reference's remote read path, Spark-native.

The reference reads a hosted table with ONE unbounded request on the
driver (``table.query(return_all_records=True)``, ``src/agol_pandas.py:246``)
and uploads with a sequential chunk loop (``:426, :614``) — no read or
write parallelism at all. This module is the DataSource-V2-style skeleton
a real REST backend slots into:

- :class:`PagedClient` — the transport contract (schema, total count,
  fetch one page). A real ArcGIS-style backend implements exactly this
  with ``resultOffset``/``resultRecordCount`` HTTP parameters; tests use
  in-memory and parquet-backed mocks. Clients must be picklable: they are
  shipped to executors.
- :class:`PagedDataSource` — a PySpark Python DataSource
  (``pyspark.sql.datasource``): one :class:`InputPartition` per page, so
  a 10M-row remote table with 100k-row pages becomes 100 concurrent
  fetch tasks instead of the reference's single blocking call. When the
  backend can't report a total count, a single partition pages until an
  empty response (the sequential fallback, explicitly the degraded mode).
- :class:`RetryPolicy` — per-task retry with the reference's ratcheting
  backoff semantics (``LoggingObject.set_backoff``, ``src/agol_pandas.py:
  15-32``): the lower bound of the uniform backoff window rises by
  ``backoff_interval`` per failure, capped at ``max_backoff``. Runs
  executor-side around each page fetch, where the reference slept on the
  driver between chunks.

Scale posture: page fetches are embarrassingly parallel and the schema is
declared up front, so Catalyst sees a bounded scan with a known schema;
column pruning/pushdown stop at the connector boundary (remote service
semantics), which is the correct contract for an opaque REST source.
"""

from __future__ import annotations

import abc
import base64
import pickle
import random
import time
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

DEFAULT_PAGE_SIZE = 100_000  # reference chunk default, src/agol_pandas.py:159


@dataclass
class RetryPolicy:
    """Reference backoff semantics (``LoggingObject``), bounded attempts.

    The reference declared ``max_reattempts = 5`` but never consumed it
    (``src/agol_pandas.py:11``); here the bound is real.
    """

    max_attempts: int = 5
    max_backoff: float = 30.0
    min_backoff: float = 0.0
    backoff_interval: float = 0.1

    def run(self, fn, *args):
        min_backoff = self.min_backoff
        failures = 0
        while True:
            try:
                return fn(*args)
            except Exception:
                failures += 1
                if failures >= self.max_attempts:
                    raise
                # ratchet: lower bound rises per failure (reference :20-32)
                min_backoff = min(
                    self.max_backoff, min_backoff + self.backoff_interval * failures
                )
                time.sleep(random.uniform(min_backoff, self.max_backoff))


class PagedClient(abc.ABC):
    """Transport contract for an offset-paged tabular service."""

    @abc.abstractmethod
    def schema(self) -> StructType:
        """Declared result schema (the service's field types)."""

    @abc.abstractmethod
    def total_count(self) -> int | None:
        """Total row count if the service can report it cheaply (ArcGIS:
        ``returnCountOnly=true``); ``None`` degrades to sequential paging."""

    @abc.abstractmethod
    def fetch_page(self, offset: int, limit: int) -> Sequence[tuple]:
        """Rows ``[offset, offset+limit)`` as tuples in schema order.
        Short/empty reads signal the end of the table."""


class _PagePartition(InputPartition):
    def __init__(self, offset: int, limit: int):
        self.offset = offset
        self.limit = limit


class _PagedReader(DataSourceReader):
    def __init__(self, client: PagedClient, page_size: int, policy: RetryPolicy):
        self._client = client
        self._page_size = page_size
        self._policy = policy

    def partitions(self) -> Sequence[InputPartition]:
        total = self._client.total_count()
        if total is None:
            # degraded mode: one task pages until an empty response
            return [_PagePartition(0, -1)]
        return [
            _PagePartition(off, self._page_size)
            for off in range(0, max(total, 1), self._page_size)
        ]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        if partition.limit >= 0:
            yield from self._policy.run(
                self._client.fetch_page, partition.offset, partition.limit
            )
            return
        offset = 0
        while True:
            rows = self._policy.run(self._client.fetch_page, offset, self._page_size)
            yield from rows
            if len(rows) < self._page_size:
                return
            offset += len(rows)


class PagedDataSource(DataSource):
    """``spark.read.format("agol_paged")`` — options:

    - ``client_pkl``: base64-pickled :class:`PagedClient` (options are
      strings by API contract; :func:`read_paged` handles the encoding)
    - ``page_size``, ``max_attempts``, ``max_backoff``, ``min_backoff``,
      ``backoff_interval``
    """

    @classmethod
    def name(cls) -> str:
        return "agol_paged"

    def _client(self) -> PagedClient:
        return pickle.loads(base64.b64decode(self.options["client_pkl"]))

    def schema(self) -> StructType:
        return self._client().schema()

    def _policy(self) -> RetryPolicy:
        o = self.options
        return RetryPolicy(
            max_attempts=int(o.get("max_attempts", 5)),
            max_backoff=float(o.get("max_backoff", 30.0)),
            min_backoff=float(o.get("min_backoff", 0.0)),
            backoff_interval=float(o.get("backoff_interval", 0.1)),
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        return _PagedReader(
            self._client(),
            int(self.options.get("page_size", DEFAULT_PAGE_SIZE)),
            self._policy(),
        )

    def simpleStreamReader(self, schema: StructType) -> "_PagedStreamReader":
        return _PagedStreamReader(
            self._client(),
            int(self.options.get("page_size", DEFAULT_PAGE_SIZE)),
            self._policy(),
        )

    def writer(self, schema: StructType, overwrite: bool) -> "_PagedWriter":
        return _PagedWriter(
            pickle.loads(base64.b64decode(self.options["sink_pkl"])),
            int(self.options.get("page_size", DEFAULT_PAGE_SIZE)),
            self._policy(),
        )


class _PagedStreamReader(SimpleDataSourceStreamReader):
    """Tail an append-only paged service as a Structured Streaming source.

    The stream offset IS the service row offset (append-only contract:
    rows at offsets below the high-water mark never change — the shape of
    object-id-ordered feature services). Each micro-batch reads at most
    one ``page_size`` page of new rows; ``readBetweenOffsets`` replays an
    exact committed range after recovery, which the offset/limit page
    contract makes deterministic — checkpoint-restart lands on the same
    rows the failed run saw. An empty page leaves the offset unchanged
    (stream is caught up; ``availableNow`` drains terminate there).
    """

    def __init__(self, client: PagedClient, page_size: int, policy: RetryPolicy):
        self._client = client
        self._page_size = page_size
        self._policy = policy

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        off = int(start["offset"])
        rows = self._policy.run(self._client.fetch_page, off, self._page_size)
        return iter(rows), {"offset": off + len(rows)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        lo, hi = int(start["offset"]), int(end["offset"])
        if hi <= lo:
            return iter(())
        return iter(self._policy.run(self._client.fetch_page, lo, hi - lo))


def read_paged_stream(
    spark: SparkSession,
    client: PagedClient,
    page_size: int = DEFAULT_PAGE_SIZE,
    policy: RetryPolicy | None = None,
) -> DataFrame:
    """Streaming tail of a paged service:
    ``spark.readStream.format("agol_paged")``. One page per micro-batch;
    pair with ``trigger(availableNow=True)`` for a deterministic drain of
    the current table state."""
    spark.dataSource.register(PagedDataSource)
    policy = policy or RetryPolicy()
    return (
        spark.readStream.format("agol_paged")
        .option("client_pkl", base64.b64encode(pickle.dumps(client)).decode())
        .option("page_size", str(page_size))
        .option("max_attempts", str(policy.max_attempts))
        .option("max_backoff", str(policy.max_backoff))
        .option("min_backoff", str(policy.min_backoff))
        .option("backoff_interval", str(policy.backoff_interval))
        .load()
    )


def read_paged(
    spark: SparkSession,
    client: PagedClient,
    page_size: int = DEFAULT_PAGE_SIZE,
    policy: RetryPolicy | None = None,
) -> DataFrame:
    """Register the datasource (idempotent) and build the paged scan."""
    spark.dataSource.register(PagedDataSource)
    policy = policy or RetryPolicy()
    return (
        spark.read.format("agol_paged")
        .option("client_pkl", base64.b64encode(pickle.dumps(client)).decode())
        .option("page_size", str(page_size))
        .option("max_attempts", str(policy.max_attempts))
        .option("max_backoff", str(policy.max_backoff))
        .option("min_backoff", str(policy.min_backoff))
        .option("backoff_interval", str(policy.backoff_interval))
        .load()
    )


class ParquetPagedClient(PagedClient):
    """A :class:`PagedClient` over a local parquet file — the test/demo
    backend standing in for a remote service: same offset/limit contract,
    deterministic pages, no network. The file is opened lazily per
    process (the client pickles as just the path + projection)."""

    def __init__(self, path: str, columns: Sequence[str] | None = None):
        self.path = path
        self.columns = list(columns) if columns else None


    def schema(self) -> StructType:
        from pyspark.sql.pandas.types import from_arrow_schema

        import pyarrow.parquet as pq

        schema = pq.read_schema(self.path)
        if self.columns:
            import pyarrow as pa

            schema = pa.schema([schema.field(c) for c in self.columns])
        return from_arrow_schema(schema)

    def total_count(self) -> int | None:
        import pyarrow.parquet as pq

        return pq.ParquetFile(self.path).metadata.num_rows

    def fetch_page(self, offset: int, limit: int) -> Sequence[tuple]:
        """Row-group-aware page read: only the row groups overlapping
        ``[offset, offset+limit)`` are decoded (footer metadata locates
        them), so per-page I/O is O(page), not O(file) — the same
        contract a real service honors server-side with resultOffset."""
        import pyarrow.parquet as pq

        f = pq.ParquetFile(self.path)
        md = f.metadata
        end = offset + limit
        acc = 0
        groups: list[int] = []
        first_group_start = 0
        for i in range(md.num_row_groups):
            n = md.row_group(i).num_rows
            if acc + n > offset and acc < end:
                if not groups:
                    first_group_start = acc
                groups.append(i)
            acc += n
            if acc >= end:
                break
        if not groups:
            return []
        tbl = f.read_row_groups(groups, columns=self.columns)
        page = tbl.slice(offset - first_group_start, limit)
        cols = [c.to_pylist() for c in page.columns]
        return list(zip(*cols)) if cols else []


class PagedSink(abc.ABC):
    """Write-side transport contract: the reference's chunked upload loop
    (``src/agol_pandas.py:426, :614`` — sequential, driver-side, one temp
    CSV per chunk) becomes per-executor batched uploads with retry.
    Implementations must be picklable and idempotent per (task, batch):
    Spark retries failed write tasks, so a real service sink needs an
    upsert key or a staging+commit protocol (the reference used
    ``rollback=True`` on append for the same reason)."""

    @abc.abstractmethod
    def upload_batch(self, rows: Sequence[tuple]) -> None:
        """Persist one batch of rows (tuples in schema order)."""


@dataclass
class _PagedCommit(WriterCommitMessage):
    n_rows: int = 0
    n_batches: int = 0


class _PagedWriter(DataSourceWriter):
    """One concurrent upload stream per partition, ``page_size`` rows per
    batch, each batch retried under the reference's backoff policy —
    the distributed replacement for the reference's sequential chunk
    loop. ``commit``/``abort`` receive per-task row counts; a real
    service backend finalizes or rolls back its staging there."""

    def __init__(self, sink: PagedSink, page_size: int, policy: RetryPolicy):
        self._sink = sink
        self._page_size = page_size
        self._policy = policy

    def write(self, iterator) -> _PagedCommit:
        buf: list[tuple] = []
        n_rows = 0
        n_batches = 0
        for row in iterator:
            buf.append(tuple(row))
            if len(buf) == self._page_size:
                self._policy.run(self._sink.upload_batch, buf)
                n_rows += len(buf)
                n_batches += 1
                buf = []
        if buf:
            self._policy.run(self._sink.upload_batch, buf)
            n_rows += len(buf)
            n_batches += 1
        return _PagedCommit(n_rows=n_rows, n_batches=n_batches)

    def commit(self, messages) -> None:  # pragma: no cover - trivial
        pass

    def abort(self, messages) -> None:  # pragma: no cover - trivial
        pass


def write_paged(
    df: DataFrame,
    sink: PagedSink,
    page_size: int = DEFAULT_PAGE_SIZE,
    policy: RetryPolicy | None = None,
) -> None:
    """Upload ``df`` through a :class:`PagedSink`: partitions stream in
    parallel, batches of ``page_size`` rows, executor-side retry."""
    df.sparkSession.dataSource.register(PagedDataSource)
    policy = policy or RetryPolicy()
    (
        df.write.format("agol_paged")
        .option("sink_pkl", base64.b64encode(pickle.dumps(sink)).decode())
        .option("page_size", str(page_size))
        .option("max_attempts", str(policy.max_attempts))
        .option("max_backoff", str(policy.max_backoff))
        .option("min_backoff", str(policy.min_backoff))
        .option("backoff_interval", str(policy.backoff_interval))
        .mode("append")
        .save()
    )
