"""Local mock service for the paged connector — deterministic pages, no
network, optional transient-failure injection. Lives in the package (not
tests/) because clients are pickled to the datasource's Python worker,
which imports by module path; it doubles as the reference implementation
of the :class:`~agol_pandas_spark.sources.paged.PagedClient` contract.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql.types import StructType

from agol_pandas_spark.sources.paged import PagedClient, PagedSink


class MemoryClient(PagedClient):
    """In-memory mock: rows held as tuples; optionally fails the first
    ``flaky_failures`` fetch attempts of every page (transient-error
    injection for retry-policy tests)."""

    def __init__(
        self,
        rows: Sequence[tuple],
        schema: StructType,
        known_total: bool = True,
        flaky_failures: int = 0,
    ):
        self.rows = list(rows)
        self._schema = schema
        self.known_total = known_total
        self.flaky_failures = flaky_failures
        self._attempts: dict[int, int] = {}

    def schema(self) -> StructType:
        return self._schema

    def total_count(self) -> int | None:
        return len(self.rows) if self.known_total else None

    def fetch_page(self, offset: int, limit: int) -> Sequence[tuple]:
        seen = self._attempts.get(offset, 0)
        self._attempts[offset] = seen + 1
        if seen < self.flaky_failures:
            raise ConnectionError(f"injected transient failure at offset {offset}")
        return self.rows[offset : offset + limit]


class DirectoryJsonSink(PagedSink):
    """Mock :class:`~agol_pandas_spark.sources.paged.PagedSink`: each batch
    lands as one JSON-lines file in ``root`` (uuid-named — concurrent
    executor tasks never collide). ``flaky_failures`` makes the first
    attempts of every batch raise BEFORE writing, so retries stay
    idempotent."""

    def __init__(self, root: str, flaky_failures: int = 0):
        self.root = root
        self.flaky_failures = flaky_failures
        self._attempts = 0

    def upload_batch(self, rows):
        import json
        import os
        import uuid

        if self._attempts < self.flaky_failures:
            self._attempts += 1
            raise ConnectionError("injected transient upload failure")
        self._attempts = 0  # next batch fails again (per-batch injection)
        path = os.path.join(self.root, f"batch_{uuid.uuid4().hex}.jsonl")
        with open(path, "w") as f:
            for r in rows:
                f.write(json.dumps(list(r)) + "\n")
