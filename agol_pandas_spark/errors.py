"""Engine exceptions.

The reference swallows every exception into a ``(str(e), False)`` tuple
(``src/agol_pandas.py:82-84`` and 7 sibling sites), which makes failure
payloads indistinguishable from data. This engine raises typed exceptions
instead; callers that want per-partition status get it from the lineage
DataFrame returned by the write path (see ``operators/chunking.py``).
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class for all engine errors."""


class EmptyInputError(EngineError):
    """Raised where the reference raises on empty input
    (``src/agol_pandas.py:182-184, 366-373, 497-505, 571-579``)."""


class UnknownModeError(EngineError):
    """Write mode not one of append/overwrite/upsert/update/insert
    (reference validation at ``src/agol_pandas.py:360-363``)."""


class DuplicateKeyError(EngineError):
    """Merge source (or target) violates the unique-key contract the
    reference enforces via a server-side unique index
    (``src/agol_pandas.py:253-312``)."""


class MissingKeyError(EngineError):
    """A merge mode that requires a key was invoked without one
    (``src/agol_pandas.py:398-401``)."""


class TableNotFoundError(EngineError):
    """Catalog lookup failed (reference: ``gis.content.get`` returning
    nothing, ``src/agol_pandas.py:237-243``)."""


class TableExistsError(EngineError):
    """Create-mode write against an existing table."""


class LshIndexParamError(EngineError):
    """A probe against a persisted LSH index used banding parameters
    (num_hashes/band_size/shingle_size) incompatible with the ones the
    index was built with. A mismatched probe joins on incompatible
    band_key layouts and silently misses near-duplicates — fail fast
    instead."""


class VectorIndexParamError(EngineError):
    """A probe/append against a persisted vector index (IVF-PQ) used
    layout parameters (m_subspaces/k_codes) incompatible with the ones
    the index was built with. A mismatched probe mis-indexes the
    flattened ADC lookup table and silently returns garbage ranks —
    fail fast instead."""


class ConvergenceError(EngineError):
    """An iterative fixpoint algorithm (e.g. star-contraction connected
    components) exhausted its round budget before converging; the partial
    result could map a node to multiple components, so it is an error,
    not a best-effort answer."""


class SchemaMismatchError(EngineError):
    """A merge source carries a column whose type conflicts with the
    target's column of the same name (e.g. string vs bigint). By-name
    alignment widens MISSING columns with NULLs (the reference's
    append_fields contract), but a same-name type conflict would
    otherwise surface as an opaque Catalyst union error — or worse, an
    implicit lossy coercion. Fail fast, naming the conflicting columns;
    cast explicitly upstream if the evolution is intended."""


class ConstraintViolationError(EngineError):
    """A declarative CHECK constraint rejected a write: at least one
    source row evaluates a check predicate to FALSE (NULL/unknown passes,
    per SQL CHECK semantics). Carries ``counts`` — rule name → number of
    violating rows — so the caller sees every failing rule from the ONE
    validation scan, not just the first. The write never reaches the
    two-phase commit; the target is untouched."""

    def __init__(self, counts: dict[str, int]):
        self.counts = dict(counts)
        rules = ", ".join(f"{k}: {v} rows" for k, v in sorted(self.counts.items()))
        super().__init__(f"CHECK constraint(s) violated — {rules}")


class AuditFailedError(EngineError):
    """A Write-Audit-Publish audit rejected the STAGED post-merge state:
    the staged snapshot was discarded and the live table is untouched.
    Carries ``violations`` (rule name → offending-row count)."""

    def __init__(self, violations: dict):
        self.violations = violations
        super().__init__(
            "WAP audit failed; staged snapshot discarded: "
            + ", ".join(f"{k}={v}" for k, v in sorted(violations.items()))
        )


class ConcurrentWriteError(EngineError):
    """Optimistic-concurrency conflict: the table's commit id moved
    between the caller's read and its write. The staged snapshot was
    discarded; re-read the table and retry the transformation."""


class UnsupportedMeasureError(EngineError):
    """An incrementally-maintained aggregate cannot be updated from the
    change feed alone: min/max are not self-maintainable under
    retractions (a delete or update may remove the current extreme, and
    the feed does not say what the runner-up was). Pass the new snapshot
    as ``rescan=`` for a targeted per-group recompute of the retracted
    groups, or drop the min/max measures."""


class CdfGapError(EngineError):
    """A change-feed tail cannot make progress without losing data: the
    snapshot at its watermark was vacuumed before the transition out of
    it was spooled, so the missing delta is unrecoverable from surviving
    archives. Re-seed the consumer from a full snapshot (and retain
    archives at least as long as the tail's advance cadence)."""


class TailLockError(EngineError):
    """Another live :class:`~agol_pandas_spark.streaming.cdf_source.
    CdfTail` holds this spool directory. Two concurrent tails over one
    spool can each miss the other's atomically-renamed transition
    directory and double-spool the same transition (ADVICE r9) — the
    spool therefore admits ONE live tail at a time, enforced by a
    pid-stamped lock file taken at attach. Stop (``close()``) the other
    tail, or point this one at its own ``spool_dir``. A lock whose
    recorded process is no longer alive is stale and is reclaimed
    automatically."""


class CorruptMarkerError(EngineError):
    """A per-snapshot properties marker (``_snapshot_props.json``) exists
    but cannot be parsed. Never treated as "no marker": the marker is an
    exactly-once guard (e.g. the streaming IVM sink's last-applied batch
    id), and reading corruption as absence would silently re-apply a
    committed batch. Restore the snapshot (or re-seed the consumer)
    instead."""
