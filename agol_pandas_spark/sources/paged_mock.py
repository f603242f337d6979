"""Local mock service for the paged connector — deterministic pages, no
network, optional transient-failure injection. Lives in the package (not
tests/) because clients are pickled to the datasource's Python worker,
which imports by module path; it doubles as the reference implementation
of the :class:`~agol_pandas_spark.sources.paged.PagedClient` contract.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql.types import StructType

from agol_pandas_spark.sources.paged import PagedClient, PagedSink, PushedFilter


def _spec_predicate(spec: PushedFilter, idx: int):
    """Row predicate for one PushedFilter against tuple position idx —
    SQL three-valued semantics: a NULL operand fails every comparison."""
    v = spec.value

    def pred(row):
        x = row[idx]
        if spec.op == "isnull":
            return x is None
        if spec.op == "notnull":
            return x is not None
        if x is None:
            return False
        if spec.op == "=":
            return x == v
        if spec.op == "<>":
            return x != v
        if spec.op == ">":
            return x > v
        if spec.op == ">=":
            return x >= v
        if spec.op == "<":
            return x < v
        if spec.op == "<=":
            return x <= v
        if spec.op == "in":
            return x in v
        if spec.op == "startswith":
            return isinstance(x, str) and x.startswith(v)
        if spec.op == "endswith":
            return isinstance(x, str) and x.endswith(v)
        if spec.op == "contains":
            return isinstance(x, str) and v in x
        raise ValueError(f"unknown op {spec.op!r}")

    return pred


class MemoryClient(PagedClient):
    """In-memory mock: rows held as tuples; optionally fails the first
    ``flaky_failures`` fetch attempts of every page (transient-error
    injection for retry-policy tests). ``supported_ops`` bounds which
    predicate shapes it accepts server-side (``None`` → all of them;
    ``frozenset()`` → declines pushdown entirely) — lets tests pin the
    partial-acceptance contract: declined filters must stay in the Spark
    plan."""

    def __init__(
        self,
        rows: Sequence[tuple],
        schema: StructType,
        known_total: bool = True,
        flaky_failures: int = 0,
        supported_ops: frozenset[str] | None = None,
    ):
        self.rows = list(rows)
        self._schema = schema
        self.known_total = known_total
        self.flaky_failures = flaky_failures
        self.supported_ops = supported_ops
        self._attempts: dict[int, int] = {}

    def schema(self) -> StructType:
        return self._schema

    def total_count(self) -> int | None:
        return len(self.rows) if self.known_total else None

    def pushdown(self, filters):
        names = self._schema.fieldNames()
        applied = [
            s
            for s in filters
            if s.column in names
            and (self.supported_ops is None or s.op in self.supported_ops)
        ]
        if not applied:
            return None
        kept = self.rows
        for s in applied:
            kept = list(filter(_spec_predicate(s, names.index(s.column)), kept))
        filtered = MemoryClient(
            kept,
            self._schema,
            known_total=self.known_total,
            flaky_failures=self.flaky_failures,
            supported_ops=self.supported_ops,
        )
        return filtered, applied

    def project(self, columns):
        names = self._schema.fieldNames()
        idxs = [names.index(c) for c in columns]
        sub = StructType([self._schema.fields[i] for i in idxs])
        return MemoryClient(
            [tuple(r[i] for i in idxs) for r in self.rows],
            sub,
            known_total=self.known_total,
            flaky_failures=self.flaky_failures,
            supported_ops=self.supported_ops,
        )

    def fetch_page(self, offset: int, limit: int) -> Sequence[tuple]:
        seen = self._attempts.get(offset, 0)
        self._attempts[offset] = seen + 1
        if seen < self.flaky_failures:
            raise ConnectionError(f"injected transient failure at offset {offset}")
        return self.rows[offset : offset + limit]


class NoProjectMemoryClient(MemoryClient):
    """A backend without server-side projection — pins read_paged's
    Spark-side select fallback (full width over the wire, pruned after)."""

    def project(self, columns):
        return None


class DirectoryJsonSink(PagedSink):
    """Mock :class:`~agol_pandas_spark.sources.paged.PagedSink`: each batch
    lands as one JSON-lines file in ``root``, named by its ``batch_id`` —
    the sink-contract dedup key — so any replay of the same batch
    overwrites rather than duplicates (idempotent under at-least-once
    delivery). ``flaky_failures`` raises BEFORE writing (transient
    network error); ``fail_after_write`` raises AFTER the file is durably
    written (the mid-batch ack-lost case — the retry must not produce a
    second copy)."""

    def __init__(self, root: str, flaky_failures: int = 0, fail_after_write: int = 0):
        self.root = root
        self.flaky_failures = flaky_failures
        self.fail_after_write = fail_after_write
        self._attempts = 0
        self._post_failures: dict[str, int] = {}

    def upload_batch(self, rows, batch_id=None):
        import json
        import os
        import uuid

        if self._attempts < self.flaky_failures:
            self._attempts += 1
            raise ConnectionError("injected transient upload failure")
        self._attempts = 0  # next batch fails again (per-batch injection)
        name = f"batch_{batch_id}.jsonl" if batch_id else f"batch_{uuid.uuid4().hex}.jsonl"
        tmp = os.path.join(self.root, f".{name}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            for r in rows:
                f.write(json.dumps(list(r)) + "\n")
        os.replace(tmp, os.path.join(self.root, name))  # atomic per batch_id
        if batch_id is not None and self._post_failures.get(batch_id, 0) < self.fail_after_write:
            self._post_failures[batch_id] = self._post_failures.get(batch_id, 0) + 1
            raise ConnectionError(f"injected post-write ack loss for batch {batch_id}")


class NoCountParquetClient:
    """ParquetPagedClient whose service cannot report a count
    (``total_count() -> None``) — exercises the degraded sequential
    paging path with the same wire-log instrumentation. Composition
    (not subclassing) keeps pickling trivial."""

    def __init__(self, path: str, log_dir: str | None = None):
        from agol_pandas_spark.sources.paged import ParquetPagedClient

        self._inner = ParquetPagedClient(path, log_dir=log_dir)

    def schema(self):
        return self._inner.schema()

    def total_count(self):
        return None

    def fetch_page(self, offset: int, limit: int):
        return self._inner.fetch_page(offset, limit)

    def pushdown(self, filters):
        return None

    def project(self, columns):
        return None


class NoCountHttpClient:
    """HTTP client wrapper that hides the service total — forces the
    reader's degraded sequential mode over a real (loopback) wire.
    Package-level so the pickled client resolves on the datasource's
    Python worker."""

    def __init__(self, layer_url: str):
        from agol_pandas_spark.sources.http_client import HttpPagedClient

        self._inner = HttpPagedClient(layer_url)

    def schema(self):
        return self._inner.schema()

    def total_count(self):
        return None

    def fetch_page(self, offset: int, limit: int):
        return self._inner.fetch_page(offset, limit)

    def pushdown(self, filters):
        return None

    def project(self, columns):
        return None
