"""Change-data-feed streaming source: tail a catalog table's versions.

``Catalog.table_changes`` answers "what changed between two snapshots" as
one lazy batch plan. :class:`CdfTail` turns that into a STREAM: every
landed version transition (v → v+1, finishing with last-archive →
current) is spooled once — as the CDF rows plus a ``_commit_version``
column — into a landing directory that a standard file-source stream
consumes. Downstream, each micro-batch is a change feed, so
``operators.views.apply_cdf_to_summary`` maintains a grouped summary
continuously: the streaming IVM loop.

Design properties:

- **Spool cost is O(changed files) per transition**, not O(snapshot):
  the spooled plan is ``table_changes(v, v+1)``, which prunes files
  shared between the two snapshots through the manifest identities the
  catalog commits carry (``catalog.py``).
- **Exactly-once per transition, across PROCESS restarts**: each
  transition writes to a staging directory and lands in the spool as
  ONE atomically-renamed subdirectory (``v<version>_<id>/``); the file
  stream source (``recursiveFileLookup``) processes each file exactly
  once. The tail's watermark persists in ``_state.json`` inside the
  spool, and ``advance()`` treats an already-present transition
  directory as spooled — so a tail re-created over the same spool after
  a crash (even one that died between the spool rename and the state
  write) never re-emits a transition under new file names, which a
  file-source checkpoint could not dedup.
- **Batch boundaries are safe for additive maintenance**: the CDF rows
  are SIGNED deltas, so summing them is associative and commutative —
  a micro-batch may split or coalesce transitions and a count/sum
  summary still converges to the recompute. (Min/max maintenance needs
  the retraction contract of ``apply_cdf_to_summary``; feed it
  ``rescan=`` per batch or keep extremes out of streaming summaries.)

No counterpart in the reference (consumers re-diffed exports by hand,
SURVEY §2a); Delta's ``readChangeFeed`` is the public analogue.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import threading
import uuid
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# process-local registry of live spool paths (ADVICE r10): the pid-stamped
# lock file only excludes OTHER processes — a second tail object attaching
# to the same spool in THIS process would read its own pid as "stale" and
# steal the lock, after which the first tail's close() deletes the spool
# out from under the second. Registering realpaths here turns that silent
# race into the TailLockError the class docstring always promised.
_LIVE_SPOOLS: set[str] = set()
_LIVE_SPOOLS_LOCK = threading.Lock()


def _discard_live_spool(real: str) -> None:
    with _LIVE_SPOOLS_LOCK:
        _LIVE_SPOOLS.discard(real)


class CdfTail:
    """Tails table ``name``'s version history as spooled CDF batches.

    Usage::

        tail = CdfTail(catalog, "orders", key="o_orderkey")
        stream = tail.stream(spark)            # readStream over the spool
        ... commits land on the table ...
        tail.advance()                          # spool new transitions
        tail.advance(include_current=True)      # final catch-up to HEAD

    ``advance`` is idempotent and cheap to call on a schedule (the
    per-commit hook in a live deployment); ``include_current=True``
    spools the last-archive → current-table transition (the drain /
    backfill catch-up). When a LATER commit archives that same state
    under the next version number, the tail recognizes it by commit id
    and advances its watermark without re-emitting — the stream stays
    exactly-once per transition even across head spools.

    **One live tail per spool** (enforced): attach takes a pid-stamped
    lock file in the spool — a second live *process* attaching raises
    :class:`~agol_pandas_spark.errors.TailLockError` (two concurrent
    tails could each miss the other's just-renamed transition directory
    and double-spool it; the durable state protects restarts, not
    races). A dead holder's lock is reclaimed automatically; release
    with ``close()`` (deletes the spool) or ``detach()`` (keeps it for
    a successor). Two live tail OBJECTS in one process are likewise
    unsupported — don't share a spool between them.
    """

    STATE_NAME = "_state.json"
    LOCK_NAME = "_tail_lock"

    def __init__(
        self,
        catalog,
        name: str,
        key=None,
        spool_dir: str | None = None,
    ):
        self.catalog = catalog
        self.name = name
        self.key = key
        self.spool_dir = spool_dir or tempfile.mkdtemp(prefix="cdf_tail_")
        os.makedirs(self.spool_dir, exist_ok=True)
        self._state_path = os.path.join(self.spool_dir, self.STATE_NAME)
        self._lock_path = os.path.join(self.spool_dir, self.LOCK_NAME)
        # single-live-tail-per-spool (ADVICE r9): two concurrent tails
        # can each snapshot _spooled_dirs() before the other's rename
        # lands and double-spool one transition. The lock is taken
        # BEFORE any state read or sweep, so everything below runs
        # exclusively.
        self._acquire_lock()
        try:
            self._attach(name)
        except Exception:
            # a refused attach (legacy spool, corrupt state) must not
            # leave the lock behind: the caller never got a live tail,
            # so there is nothing close() would ever release
            self._release_lock()
            raise

    def _attach(self, name: str) -> None:
        self._sweep_orphans()
        state = self._load_state()
        if state is None and self._flat_legacy_entries():
            # a pre-r9 spool: flat v-prefixed FILES, no durable state.
            # Resuming here would re-spool every transition as new
            # directories while the stream still reads the flat files —
            # guaranteed double emission. Refuse; the consumer drains or
            # discards the old spool and re-seeds (review r9 pass 3).
            from agol_pandas_spark.errors import CdfGapError

            raise CdfGapError(
                f"spool {self.spool_dir!r} uses the legacy flat layout "
                "and carries no durable tail state; reattaching would "
                "double-emit its transitions. Drain and discard the old "
                "spool (or start a fresh spool_dir) and re-seed the "
                "consumer."
            )
        if state is not None:
            # a tail RE-CREATED over an existing spool (process restart)
            # resumes its persisted watermark — never the fresh-attach
            # default, which would re-spool already-applied transitions
            self._spooled_through = state["spooled_through"]
            self._spooled_head = state["spooled_head"]
            self._head_commit_id = state["head_commit_id"]
            # pre-r11 spools carry no pin id: mint one and persist it so
            # the protected watermark survives restarts under ONE name
            self._pin_id = state.get("pin_id") or f"tail_{uuid.uuid4().hex}"
            if "pin_id" not in state:
                self._save_state()
            self._pin_watermark()
            return
        # transitions INTO versions <= this are spooled; start just below
        # the earliest archive so the first advance emits (v1 -> v2)
        versions = self.catalog.versions(name)
        self._spooled_through = versions[0] if versions else 0
        self._spooled_head = False
        # commit id of the table state spooled as head (if any): when a
        # later commit archives that exact state under the next version
        # number, the pairs loop must NOT re-emit its delta — additive
        # consumers would double-count
        self._head_commit_id: str | None = None
        self._pin_id = f"tail_{uuid.uuid4().hex}"
        # persist the fresh attach: the pin id must survive a restart
        # under ONE name (a successor re-asserting a different pin would
        # leak the old one), and a durable attach watermark is strictly
        # more deterministic than recomputing it from whatever archives
        # exist at re-attach time
        self._save_state()
        self._pin_watermark()

    def _pin_watermark(self) -> None:
        """Register the tail's watermark as a PROTECTED version with the
        catalog (``Catalog.pin_version``): ``vacuum(keep_last)`` then
        refuses to drop the watermark archive or anything after it, so
        the loud-but-lossy ``CdfGapError`` a racing retention run used
        to cause becomes prevention (VERDICT r10 item 5). Re-asserted
        on attach and after every advance; released by
        ``close()``/``detach()``. Best-effort: a catalog without pin
        support (an external stub) degrades to the old behavior."""
        try:
            self.catalog.pin_version(
                self.name, self._pin_id, self._spooled_through
            )
        except AttributeError:
            pass

    # -- spool exclusivity + hygiene ------------------------------------

    def _acquire_lock(self) -> None:
        """Take the spool's single-live-tail lock (pid-stamped O_EXCL
        file). A lock held by a DEAD process is stale — a crashed tail
        cannot release it — and is reclaimed; a lock held by THIS
        process is re-taken ONLY when no live tail object in this
        process holds the spool (a tail re-created over the same spool
        after the previous object's close()/detach() is the
        crash-restart pattern the recovery guards exist for); a SECOND
        live in-process tail raises :class:`TailLockError` via the
        process-local registry (ADVICE r10 — before, it silently stole
        the pid lock). A lock held by a live other process raises
        :class:`TailLockError`."""
        from agol_pandas_spark.errors import TailLockError

        real = os.path.realpath(self.spool_dir)
        with _LIVE_SPOOLS_LOCK:
            if real in _LIVE_SPOOLS:
                raise TailLockError(
                    f"spool {self.spool_dir!r} is held by a live tail "
                    "object in this process; one live tail per spool — "
                    "close()/detach() it or use a separate spool_dir"
                )
            _LIVE_SPOOLS.add(real)
        # liveness, not existence: a tail object dropped WITHOUT
        # close()/detach() (the crash-simulation / leaked-reference
        # pattern) releases its registry slot at GC — the durable spool
        # state plus the recovery guards already make a successor exact,
        # and holding the slot past the object's life would wedge every
        # restart in long-lived processes
        self._registry_finalizer = weakref.finalize(
            self, _discard_live_spool, real
        )
        try:
            self._acquire_lock_file()
        except Exception:
            self._registry_finalizer()
            raise

    def _acquire_lock_file(self) -> None:
        from agol_pandas_spark.errors import TailLockError

        for attempt in (0, 1):
            try:
                fd = os.open(
                    self._lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY
                )
                with os.fdopen(fd, "w") as f:
                    f.write(str(os.getpid()))
                return
            except FileExistsError:
                try:
                    with open(self._lock_path) as f:
                        holder = int(f.read().strip() or "0")
                except (OSError, ValueError):
                    holder = 0  # torn lock: treat as stale
                alive = False
                if holder > 0 and holder != os.getpid():
                    try:
                        os.kill(holder, 0)  # signal 0: existence probe
                        alive = True
                    except ProcessLookupError:
                        alive = False
                    except PermissionError:
                        alive = True  # exists, owned by another user
                if alive:
                    raise TailLockError(
                        f"spool {self.spool_dir!r} is locked by live "
                        f"tail process {holder}; one live tail per "
                        "spool — close() it or use a separate spool_dir"
                    ) from None
                # stale (dead holder / torn file) or our own pid: reclaim
                try:
                    os.remove(self._lock_path)
                except FileNotFoundError:
                    pass
                if attempt == 1:  # pragma: no cover - pathological race
                    raise TailLockError(
                        f"could not acquire spool lock {self._lock_path!r}"
                    ) from None

    def _release_lock(self) -> None:
        fin = getattr(self, "_registry_finalizer", None)
        if fin is not None:
            fin()  # idempotent: detaches after first call
        try:
            os.remove(self._lock_path)
        except OSError:
            pass

    def _sweep_orphans(self) -> None:
        """Reclaim staging debris a crashed tail left behind (ADVICE
        r9): ``.__stage_*`` directories (a crash between the parquet
        staging write and the rename in ``_spool_one``) and
        ``_state.json.__tmp_*`` files (a crash inside ``_save_state``).
        Both are invisible to the stream — a transition only becomes
        visible through the atomic rename that never happened — so
        deletion is safe; without it they accumulate unboundedly across
        crash loops. Runs under the attach lock, so a LIVE tail's
        in-flight stage is never touched."""
        for e in os.listdir(self.spool_dir):
            p = os.path.join(self.spool_dir, e)
            if e.startswith(".__stage_"):
                shutil.rmtree(p, ignore_errors=True)
            elif e.startswith(f"{self.STATE_NAME}.__tmp_") or (
                e.startswith("_consumer_") and ".__w_" in e
            ):
                try:
                    os.remove(p)
                except OSError:
                    pass

    # -- durable watermark (crash/restart safety) -----------------------

    def _load_state(self) -> dict | None:
        try:
            with open(self._state_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return None
        except (OSError, ValueError) as ex:
            # a torn state file guards exactly-once: reading it as
            # absent would re-spool and double-apply — fail loudly
            from agol_pandas_spark.errors import CorruptMarkerError

            raise CorruptMarkerError(
                f"unreadable CdfTail state {self._state_path}: {ex}"
            ) from ex

    def _save_state(self) -> None:
        tmp = f"{self._state_path}.__tmp_{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "spooled_through": self._spooled_through,
                    "spooled_head": self._spooled_head,
                    "head_commit_id": self._head_commit_id,
                    "pin_id": self._pin_id,
                },
                f,
            )
        os.replace(tmp, self._state_path)

    def _flat_legacy_entries(self) -> list[str]:
        """Flat v-prefixed FILES in the spool — the pre-r9 layout."""
        out = []
        for e in os.listdir(self.spool_dir):
            if e.startswith("v") and "_" in e and e[1 : e.index("_")].isdigit():
                if os.path.isfile(os.path.join(self.spool_dir, e)):
                    out.append(e)
        return out

    def _spooled_dirs(self) -> dict[int, str]:
        """version -> existing transition directory in the spool. The
        spool itself is the crash-safe record of what was EMITTED: a
        directory present here must never be emitted again (its content
        is deterministic from immutable archives, so skipping is exact)."""
        out: dict[int, str] = {}
        for e in os.listdir(self.spool_dir):
            if e.startswith("v") and "_" in e:
                head = e[1 : e.index("_")]
                p = os.path.join(self.spool_dir, e)
                # directories only: legacy (r8) spools landed FLAT files
                # under the same naming, but those lack the atomicity and
                # head-commit record recovery relies on — a flat layout
                # never drives recovery decisions (review r9 pass 2)
                if head.isdigit() and os.path.isdir(p):
                    out[int(head)] = p
        return out

    def schema(self) -> T.StructType:
        """CDF row schema: the table's columns + _change_type +
        _commit_version (file-source streams need an explicit schema)."""
        base = self.catalog.table(self.name).schema
        return T.StructType(
            list(base.fields)
            + [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_commit_version", T.LongType()),
            ]
        )

    def stream(
        self, spark: SparkSession, max_files_per_trigger: int = 1
    ) -> DataFrame:
        """The file-source stream over the spool directory. Each spooled
        transition lands as one new subdirectory (atomic rename);
        ``maxFilesPerTrigger`` paces how many files feed each
        micro-batch."""
        return (
            spark.readStream.format("parquet")
            .schema(self.schema())
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .option("recursiveFileLookup", "true")
            .load(self.spool_dir)
        )

    def read_spool(self, spark: SparkSession) -> DataFrame:
        """Batch read of everything spooled so far (backfills, tests)."""
        return (
            spark.read.schema(self.schema())
            .option("recursiveFileLookup", "true")
            .parquet(self.spool_dir)
        )

    def _spool_one(
        self, changes: DataFrame, version: int,
        head_commit: str | None = None,
    ) -> None:
        """Stage one transition's CDF rows, then land them in the spool
        as ONE atomically-renamed directory — the stream source never
        lists a half-written file AND a crash can never leave a partial
        transition (the recovery guard in ``advance`` keys on the
        directory's existence, which must therefore be all-or-nothing).
        Head spools record the commit id they captured inside the
        directory, so recovery can restore the head bookkeeping."""
        staged = os.path.join(
            self.spool_dir, f".__stage_{uuid.uuid4().hex}"
        )
        changes.withColumn(
            "_commit_version", F.lit(version).cast("long")
        ).write.mode("overwrite").parquet(staged)
        # drop ZERO-ROW part files before the rename: a rowless file is
        # invisible to row-level consumer tracking (input_file_name —
        # it never produces a row), so it would pin the consumer
        # watermark below this version forever; footer reads on a
        # delta-sized staging dir are cheap
        import pyarrow.parquet as _pq

        for e in os.listdir(staged):
            if e.startswith(("_", ".")):
                continue
            p = os.path.join(staged, e)
            if _pq.ParquetFile(p).metadata.num_rows == 0:
                os.remove(p)
        if head_commit is not None:
            with open(os.path.join(staged, "_head_commit"), "w") as f:
                f.write(head_commit)
        os.rename(
            staged,
            os.path.join(
                self.spool_dir, f"v{version:06d}_{uuid.uuid4().hex}"
            ),
        )

    def advance(self, include_current: bool = False) -> int:
        """Spool every landed-but-unspooled version transition; returns
        how many were spooled. ``include_current=True`` additionally
        spools the newest-archive → current-table delta (once)."""
        from agol_pandas_spark.errors import CdfGapError

        spooled = 0
        versions = self.catalog.versions(self.name)
        if self._spooled_through == 0 and not self._spooled_head and versions:
            # fresh tail attached before the table's first archive
            # existed (the 0 sentinel — real versions start at 1): adopt
            # the earliest surviving archive as the starting base.
            # Nothing has been spooled yet, so there is no hole to
            # protect — the consumer seeds from whatever snapshot it
            # chooses (code-review r8: the sentinel must never read as a
            # vacuumed version).
            self._spooled_through = versions[0]
        if self._head_commit_id is not None:
            # the state spooled as head may since have been ARCHIVED (the
            # next commit displaces it): recognize it by commit id at ANY
            # surviving version — advancing the watermark there without
            # re-emitting keeps the stream exactly-once for additive
            # consumers, and works even when keep_versions=1 leaves a
            # single-element archive list (no pair iteration).
            for v in versions:
                if (
                    v > self._spooled_through
                    and self._archived_commit_id(v) == self._head_commit_id
                ):
                    self._spooled_through = v
                    self._spooled_head = False
                    self._head_commit_id = None
                    break
        if self._head_commit_id is not None:
            current = self.catalog.commit_id(self.name)
            if current != self._head_commit_id:
                # the table moved past the spooled head state and no
                # surviving archive carries it (the recognition loop
                # above would have cleared the flag): the state was
                # displaced UNARCHIVED (keep_versions=0), so the
                # head->current delta is unrecoverable — fail loudly,
                # a silently-stale consumer would diverge forever
                raise CdfGapError(
                    f"tail of {self.name!r} is wedged: the state spooled "
                    f"as head (commit {self._head_commit_id!r}) was "
                    "displaced and no surviving archive carries it (an "
                    "unarchived keep_versions=0 commit, or its archive "
                    "was vacuumed); re-seed the consumer from a full "
                    "snapshot"
                )
        if versions and versions[0] > self._spooled_through:
            # the watermark's snapshot was vacuumed before its outgoing
            # transition spooled: the delta is unrecoverable — fail
            # loudly, a silently-holed stream would diverge forever
            raise CdfGapError(
                f"tail of {self.name!r} is wedged: watermark version "
                f"{self._spooled_through} was vacuumed (earliest "
                f"surviving archive: {versions[0]}); re-seed the "
                "consumer from a full snapshot"
            )
        # consecutive archive pairs: emit every transition whose TARGET
        # version is archived and newer than the watermark. A numeric gap
        # BETWEEN surviving archives (an intermediate version vacuumed
        # away) emits the SQUASHED diff table_changes(prev, nxt) — the
        # composition of the missing deltas, still an exact change feed,
        # never a silent hole.
        existing = self._spooled_dirs()
        for prev, nxt in zip(versions, versions[1:]):
            if nxt <= self._spooled_through:
                continue
            if nxt in existing:
                # crash recovery: the transition directory landed but the
                # state write didn't — the emit already happened (archive
                # content is immutable, so the spooled rows are exact);
                # advance the watermark WITHOUT re-emitting. A dir that
                # was spooled as a HEAD (it records the commit it
                # captured) only covers this transition if the archived
                # state at nxt IS that commit — otherwise the spooled
                # rows diff to a state that was displaced unarchived,
                # and the delta to the archived state is unrecoverable
                rec = self._recorded_head_commit(existing[nxt])
                if rec is not None and (
                    (rec or None) != self._archived_commit_id(nxt)
                ):
                    raise CdfGapError(
                        f"tail of {self.name!r} is wedged: the spool "
                        f"holds a head capture of commit {rec!r} at "
                        f"version {nxt}, but the archive at {nxt} is a "
                        "different state — the delta between them was "
                        "displaced unarchived; re-seed the consumer "
                        "from a full snapshot"
                    )
                self._spooled_through = nxt
                continue
            if self._declared_noop(
                self.catalog._version_path(self.name, nxt),
                self._archived_commit_id(prev),
            ):
                # row-preserving housekeeping commit (compaction,
                # z-order): provably empty transition — advance the
                # watermark with ZERO data reads and ZERO spool bytes.
                # Idempotent across crashes: a restart re-evaluates the
                # same two tiny marker files and re-skips.
                self._spooled_through = nxt
                continue
            ch = self.catalog.table_changes(
                self.name, prev, to_version=nxt, key=self.key
            )
            self._spool_one(ch, nxt)
            self._spooled_through = nxt
            spooled += 1
        if include_current and not self._spooled_head and not versions:
            # explicit catch-up requested but the table has never been
            # overwritten: there is no archived base to diff from, so
            # nothing can spool — make the no-op visible (ADVICE r8), a
            # consumer attaching to a single-commit table must seed from
            # the current snapshot itself and tail from the NEXT commit
            import warnings

            warnings.warn(
                f"CdfTail.advance(include_current=True) on {self.name!r}: "
                "no archived versions exist, so there is no base to diff "
                "from and nothing was spooled; seed the consumer from "
                "catalog.table(name) and advance after the next commit",
                stacklevel=2,
            )
        if include_current and not self._spooled_head and versions:
            last = max(versions)
            if last >= self._spooled_through:
                if last + 1 in existing:
                    # crash recovery for a head spool: the directory
                    # recorded the commit id it captured — restore the
                    # head bookkeeping from it so displacement detection
                    # (archive recognition vs CdfGapError) still works.
                    # NEVER fall back to the current commit id: commits
                    # may have landed since the capture, and adopting
                    # the new head would silently swallow their deltas
                    rec = self._recorded_head_commit(existing[last + 1])
                    if rec is None:
                        raise CdfGapError(
                            f"tail of {self.name!r} cannot recover: the "
                            f"spooled head at version {last + 1} carries "
                            "no commit record, so what it captured is "
                            "unverifiable; re-seed the consumer from a "
                            "full snapshot"
                        )
                    self._spooled_through = last
                    self._spooled_head = True
                    # "" records a capture of a table WITHOUT a commit
                    # id: same bookkeeping as the non-crash path (None)
                    self._head_commit_id = rec or None
                elif self._declared_noop(
                    self.catalog.path(self.name),
                    self._archived_commit_id(last),
                ):
                    # the CURRENT table is a declared row-preserving
                    # rewrite of the newest archive: the catch-up delta
                    # is provably empty — spool nothing, leave the head
                    # bookkeeping unset (there is nothing to recognize
                    # later; when a data commit archives this state, the
                    # pairs loop skips the same transition by the same
                    # declaration)
                    pass
                else:
                    head_commit = self.catalog.commit_id(self.name)
                    ch = self.catalog.table_changes(
                        self.name, last, to_version=None, key=self.key
                    )
                    # record "" when the table has no commit id (pre-OCC
                    # / external) so crash recovery can distinguish "the
                    # captured state legitimately had no id" from "the
                    # record is missing" (which is unverifiable)
                    self._spool_one(
                        ch, last + 1, head_commit=head_commit or ""
                    )
                    self._spooled_through = last
                    self._spooled_head = True
                    self._head_commit_id = head_commit
                    spooled += 1
        self._save_state()
        # the watermark may have advanced: re-register the protected
        # version so vacuum releases everything the tail no longer needs
        self._pin_watermark()
        return spooled

    def spooled_snapshot(self, spark: SparkSession) -> DataFrame:
        """The table state the spool has REACHED — the snapshot every
        spooled transition composes to. A consumer re-deriving rows
        against 'the current table' races later commits (the feed
        wouldn't cover them yet, leaving a mixed view until the next
        drain); joining against THIS snapshot is aligned with the feed
        by construction. Head captured → the current table (the head
        spool recorded exactly it); otherwise the archived snapshot at
        the watermark. A vacuumed watermark archive raises
        ``CdfGapError`` — the same re-seed signal ``advance`` gives."""
        return self._spooled_snapshot_with_path(spark)[0]

    def _spooled_snapshot_with_path(
        self, spark: SparkSession
    ) -> tuple[DataFrame, str | None]:
        """:meth:`spooled_snapshot` plus the snapshot DIRECTORY it reads
        — the handle the join-view maintainer needs to span-prune its
        TD-rescan by parquet footers (``views._td_pruned_scan``). The
        path is None only for single-file external tables (nothing to
        prune per-file there anyway)."""
        from agol_pandas_spark.errors import CdfGapError

        def _with_dir(df: DataFrame, p: str) -> tuple[DataFrame, str | None]:
            return df, (p if os.path.isdir(p) else None)

        if self._spooled_head:
            current = self.catalog.commit_id(self.name)
            if self._head_commit_id is None or current == self._head_commit_id:
                return _with_dir(
                    self.catalog.table(self.name),
                    self.catalog.path(self.name),
                )
            # a commit raced in after the head capture: the captured
            # state was displaced — serve it from the archive that
            # carries its commit id (the racer's keep_versions archived
            # it), never the moved-on current table
            for v in reversed(self.catalog.versions(self.name)):
                if self._archived_commit_id(v) == self._head_commit_id:
                    return _with_dir(
                        self.catalog.table_at(self.name, v),
                        self.catalog._version_path(self.name, v),
                    )
            raise CdfGapError(
                f"tail of {self.name!r}: the state captured as head "
                f"(commit {self._head_commit_id!r}) was displaced and "
                "no surviving archive carries it; advance() will "
                "confirm the wedge — re-seed the consumer from a full "
                "snapshot"
            )
        version = self._spooled_through
        if version == 0:
            # fresh attach before the table's first archive existed: the
            # attach-time state is the CURRENT table until a commit
            # displaces it — after which the earliest archive IS that
            # state (watermark 0 ⟺ no archives existed at attach, so
            # versions[0] can only be the displaced attach state). A
            # racing commit between advance() and this read must not
            # leak its rows into a feed-aligned consumer.
            versions = self.catalog.versions(self.name)
            if not versions:
                return _with_dir(
                    self.catalog.table(self.name),
                    self.catalog.path(self.name),
                )
            version = versions[0]
        try:
            return _with_dir(
                self.catalog.table_at(self.name, version),
                self.catalog._version_path(self.name, version),
            )
        except Exception as ex:
            raise CdfGapError(
                f"tail of {self.name!r}: the watermark snapshot "
                f"v{version} is no longer readable "
                f"({ex}); re-seed the consumer from a full snapshot"
            ) from ex

    def _declared_noop(self, snap_path: str, prev_commit: str | None) -> bool:
        """True when the snapshot at ``snap_path`` provably carries
        EXACTLY the rows of the state committed as ``prev_commit``: it
        declares ``data_change=False`` (a row-preserving housekeeping
        rewrite — compact / compact_selective / optimize_zorder stamp
        it) AND its parent pointer names ``prev_commit`` as the state it
        displaced (so the declaration covers precisely this transition —
        never a squashed multi-commit gap). Two tiny marker reads, no
        manifest parse, no data. An unreadable props marker means
        "declaration unknown": fall back to diffing, which is always
        row-correct."""
        from agol_pandas_spark.catalog import DATA_CHANGE_PROP
        from agol_pandas_spark.errors import CorruptMarkerError

        if prev_commit is None:
            return False
        if self.catalog.parent_commit_id_at(snap_path) != prev_commit:
            return False
        try:
            props = self.catalog._props_at(snap_path)
        except CorruptMarkerError:
            return False
        return props.get(DATA_CHANGE_PROP) is False

    @staticmethod
    def _recorded_head_commit(spool_dir: str) -> str | None:
        try:
            with open(os.path.join(spool_dir, "_head_commit")) as f:
                return f.read().strip()
        except OSError:
            return None

    def _archived_commit_id(self, version: int) -> str | None:
        marker = os.path.join(
            self.catalog._version_path(self.name, version), "_commit_id"
        )
        try:
            with open(marker) as f:
                return f.read().strip()
        except OSError:
            return None

    # -- spool consumer watermarks (drained-file tracking) --------------

    def _consumer_path(self, consumer_id: str) -> str:
        safe = "".join(
            c if (c.isalnum() or c in "-_") else "_" for c in consumer_id
        )
        return os.path.join(self.spool_dir, f"_consumer_{safe}.json")

    def register_consumer(self, consumer_id: str) -> None:
        """Register a spool CONSUMER (a file-source stream, a refresh
        loop) so :meth:`vacuum_spool` never reclaims a transition it
        has not drained (VERDICT r10 item 4: ``vacuum_spools=True`` was
        only safe when the tailed refresh was the spool's sole
        consumer — a second file-stream reader had no drained-file
        story, so its spool grew forever or lost data). Registration
        starts at watermark 0 — everything is protected until the
        consumer reports progress via :meth:`set_consumer_watermark`.
        Idempotent; the marker is a ``_``-prefixed spool file, invisible
        to the stream source like the state file."""
        p = self._consumer_path(consumer_id)
        if not os.path.exists(p):
            self._write_consumer_state(p, {"through": 0, "partial": {}})

    def set_consumer_watermark(self, consumer_id: str, through: int) -> None:
        """Record that ``consumer_id`` has fully processed every spooled
        transition with version ≤ ``through``. Monotonic (a stale
        report never regresses the watermark); transitions at or below
        the MINIMUM across all registered consumers become eligible for
        :meth:`vacuum_spool`. For consumers that read the spool in
        whole transitions (a refresh loop) — a FILE-AT-A-TIME consumer
        (a ``maxFilesPerTrigger`` stream) must use
        :meth:`record_consumer_files` instead, because its micro-batch
        may cover only part of a transition directory and a
        version-level claim would let vacuum destroy the undrained
        remainder."""
        p = self._consumer_path(consumer_id)
        state = self._read_consumer(p)
        if int(through) > state["through"]:
            state["through"] = int(through)
            # version-level claim subsumes any partial file bookkeeping
            state["partial"] = {
                v: fs
                for v, fs in state.get("partial", {}).items()
                if int(v) > int(through)
            }
            self._write_consumer_state(p, state)

    def _read_consumer(self, path: str) -> dict:
        try:
            with open(path) as f:
                state = json.load(f)
        except (OSError, ValueError):
            return {"through": 0, "partial": {}}
        state.setdefault("through", 0)
        state.setdefault("partial", {})
        return state

    def _write_consumer_state(self, path: str, state: dict) -> None:
        tmp = f"{path}.__w_{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, path)

    def record_consumer_files(self, consumer_id: str, files) -> int:
        """Drained-FILE tracking for a file-at-a-time spool consumer
        (the ``maxFilesPerTrigger`` stream shape): record the data
        files a micro-batch fully processed (the distinct
        ``input_file_name()`` values of the batch — ``inputFiles()`` is
        empty inside ``foreachBatch``; sound because the spool writer
        never lands zero-row part files, so every spool data file
        surfaces rows) and advance the consumer's drained-through
        watermark to the
        highest version whose transition directory's ENTIRE data-file
        set has been recorded — with every earlier spooled version
        complete too, in order. A half-drained transition never
        advances the watermark, so :meth:`vacuum_spool` can never
        reclaim a directory whose remaining files the stream still
        needs. Returns the (possibly advanced) watermark."""
        p = self._consumer_path(consumer_id)
        state = self._read_consumer(p)
        through = int(state["through"])
        partial: dict[str, list] = state["partial"]
        changed = False
        for f in files:
            path = f[len("file:"):] if str(f).startswith("file:") else str(f)
            path = os.path.abspath(path)
            try:
                rel = os.path.relpath(path, self.spool_dir)
            except ValueError:
                continue
            top = rel.split(os.sep)[0]
            if not (top.startswith("v") and "_" in top):
                continue
            head = top[1 : top.index("_")]
            if not head.isdigit():
                continue
            v = int(head)
            if v <= through:
                continue
            seen = partial.setdefault(str(v), [])
            name = os.path.basename(path)
            if name not in seen:
                seen.append(name)
                changed = True
        dirs = self._spooled_dirs()
        for v in sorted(x for x in dirs if x > through):
            expected = {
                e
                for e in os.listdir(dirs[v])
                if not e.startswith(("_", "."))
            }
            if expected <= set(partial.get(str(v), [])):
                through = v
                partial.pop(str(v), None)
                changed = True
            else:
                break
        if changed:
            state["through"] = through
            self._write_consumer_state(p, state)
        return through

    def consumer_watermarks(self) -> dict[str, int]:
        """consumer_id -> drained-through version for every registered
        spool consumer. An unreadable marker reads as 0 (protect
        everything) — a torn watermark must never cause data loss."""
        out: dict[str, int] = {}
        for e in os.listdir(self.spool_dir):
            if not (e.startswith("_consumer_") and e.endswith(".json")):
                continue
            cid = e[len("_consumer_"):-len(".json")]
            try:
                with open(os.path.join(self.spool_dir, e)) as f:
                    out[cid] = int(json.load(f).get("through", 0))
            except (OSError, ValueError):
                out[cid] = 0
        return out

    def drop_consumer(self, consumer_id: str) -> None:
        """Unregister a consumer (idempotent) — its watermark stops
        holding spool directories. Call when the stream is permanently
        stopped; an abandoned registration blocks vacuum forever, which
        is the conservative failure mode."""
        try:
            os.remove(self._consumer_path(consumer_id))
        except OSError:
            pass

    def vacuum_spool(self, through: int | None = None) -> list[str]:
        """Reclaim spooled transition directories every consumer has
        PROCESSED: versions ≤ ``through`` — which must be the
        consumer's applied position (a file-stream's completed drain, a
        refresh loop's props watermark), because the spool itself
        cannot know what downstream has read; vacuuming past a lagging
        consumer loses its unread deltas exactly like vacuuming table
        archives past the tail does. ``through=None`` means "as far as
        the registered consumer watermarks allow" — the safe default
        for a housekeeping loop that registered its consumers.

        Bounded additionally by (a) the MINIMUM registered consumer
        watermark (:meth:`register_consumer` — an explicit ``through``
        past a lagging registered consumer is clamped, not honored) and
        (b) the tail's own durable watermark: the crash-recovery guards
        key on directories ABOVE it (an unspooled transition's
        dir-existence, the head capture's commit record), so those are
        never eligible regardless of ``through`` — a head spool at
        ``watermark+1`` stays until its state is archived and the
        watermark moves past it. Without this housekeeping a continuous
        tail accumulates one directory per commit forever. Returns the
        removed paths."""
        limit = (
            self._spooled_through
            if through is None
            else min(int(through), self._spooled_through)
        )
        consumers = self.consumer_watermarks()
        if consumers:
            limit = min(limit, min(consumers.values()))
        removed: list[str] = []
        for version, path in sorted(self._spooled_dirs().items()):
            if version <= limit:
                shutil.rmtree(path, ignore_errors=True)
                removed.append(path)
        return removed

    def close(self) -> None:
        self._unpin()
        self._release_lock()
        shutil.rmtree(self.spool_dir, ignore_errors=True)

    def detach(self) -> None:
        """Release the spool WITHOUT deleting it — the clean handoff for
        a tail that another process (or a later run) will resume via the
        durable ``_state.json`` (which carries the pin id: the successor
        re-registers the same protected watermark on attach). The pin is
        released here so a tail that never comes back cannot block
        retention forever; ``close()`` deletes the spool outright."""
        self._unpin()
        self._release_lock()

    def _unpin(self) -> None:
        try:
            self.catalog.unpin_version(self.name, self._pin_id)
        except AttributeError:
            pass


def refresh_join_view_from_tails(
    spark: SparkSession,
    view_catalog,
    view_name: str,
    fact_tail: CdfTail,
    dim_tail: CdfTail,
    join_key,
    fact_key,
    how: str = "inner",
    include_current: bool = True,
    vacuum_spools: bool = False,
    keep_versions: int = 0,
) -> dict:
    """MULTI-TABLE incremental refresh: drive a materialized fact ⋈ dim
    view from TWO change-feed tails — the dashboards-join-dimensions
    loop (VERDICT r9 "what's missing" item 4's second half; the no-op
    skip was the first). Each call:

    1. advances both tails (spooling any landed transitions — each
       O(changed files) through the manifest pruning, and zero-cost for
       declared housekeeping commits);
    2. reads ONLY the spool batches newer than the view's per-table
       applied watermark (recorded in the view's own snapshot props —
       committed in the same atomic rename as the view rows, so the
       bookkeeping can never drift from the data);
    3. folds them in via :func:`~agol_pandas_spark.operators.views.
       apply_cdf_to_join_view_bilateral`, re-deriving affected rows
       against each tail's :meth:`CdfTail.spooled_snapshot` — the state
       ALIGNED with its feed, so a commit racing this refresh cannot
       produce a mixed view (it is simply picked up whole next call);
    4. commits through the catalog's atomic swap with the advanced
       watermarks in the props.

    Crash safety: the view maintenance is IDEMPOTENT (the bilateral
    algebra is a fixpoint under replay), so a crash between the spool
    advance and the view commit just re-applies the same batches next
    call — the props watermark exists to skip re-WORK, not to guard
    correctness; a re-executed refresh after a committed view is a
    no-op by the watermark check. Returns ``{"applied_fact",
    "applied_dim", "fact_through", "dim_through", "committed"}`` where
    the ``applied_*`` counts are spooled-transition versions consumed
    this call.

    ``vacuum_spools=True`` reclaims the spool directories this refresh
    just applied (``CdfTail.vacuum_spool`` at the committed
    watermarks) AFTER the view commit — the continuous-deployment
    housekeeping; registered spool consumers (``register_consumer``)
    are honored, so a second reader over the same spools is safe.

    The view commit is COPY-ON-WRITE since r11 (VERDICT r10 item 1):
    the delta algebra is delta-sized, and the physical commit now is
    too — only the view files whose footer key spans intersect the
    touched fact/dim keys rewrite; everything else hard-links into the
    new snapshot (``views.commit_join_view_delta``). The returned dict
    gains ``commit_stats`` (pruned / files_rewritten / files_carried /
    bytes_rewritten) so a deployment can record rewritten-bytes-per-
    refresh. ``keep_versions`` archives the displaced view snapshot on
    each refresh — set it when the VIEW itself has change-feed
    consumers (a ``CdfTail`` over the view needs archives to diff, and
    the carried-forward hard links make archiving O(metadata))."""
    out = _refresh_from_tails(
        spark, view_catalog, view_name, fact_tail,
        [(dim_tail, join_key, "jv_dim_through")],
        fact_key, how, include_current, vacuum_spools,
        fact_prop="jv_fact_through", keep_versions=keep_versions,
    )
    if not out["committed"]:
        return {
            "applied_fact": 0, "applied_dim": 0,
            "fact_through": out["fact_through"],
            "dim_through": out["dim_throughs"][0],
            "committed": False,
        }
    return {
        "applied_fact": out["applied_fact"],
        "applied_dim": out["applied_dims"][0],
        "fact_through": out["fact_through"],
        "dim_through": out["dim_throughs"][0],
        "committed": True,
        "commit_stats": out["commit_stats"],
    }


def refresh_join_view_from_tails_star(
    spark: SparkSession,
    view_catalog,
    view_name: str,
    fact_tail: CdfTail,
    dim_tails,
    fact_key,
    how: str = "inner",
    include_current: bool = True,
    vacuum_spools: bool = False,
    keep_versions: int = 0,
) -> dict:
    """STAR-SCHEMA tailed refresh (VERDICT r10 item 3): one fact tail
    plus N dimension tails drive a materialized
    fact ⋈ dim₁ ⋈ … ⋈ dimₙ view — the real-dashboard shape
    :func:`refresh_join_view_from_tails` covered only at N=1.
    ``dim_tails`` is a sequence of ``(tail, join_key)`` in join order.
    Per-table applied watermarks ride the view's snapshot props as
    ``jv_fact_through`` / ``jv_dim_<table>_through`` (so each dim tail
    needs a distinct table name); the bilateral guarantees carry over
    unchanged — feed-aligned snapshots per tail, idempotent replay,
    declared-noop skips, copy-on-write O(Δ) commits, registered-
    consumer-safe spool vacuuming. Returns ``{"applied_fact",
    "applied_dims": [...], "fact_through", "dim_throughs": [...],
    "committed", "commit_stats"}`` with the dim lists parallel to
    ``dim_tails``."""
    names = [t.name for t, _ in dim_tails]
    if len(set(names)) != len(names):
        raise ValueError(
            "star refresh needs distinct dim table names (watermark "
            f"props are keyed by table), got {names}"
        )
    return _refresh_from_tails(
        spark, view_catalog, view_name, fact_tail,
        [
            (tail, jk, f"jv_dim_{tail.name}_through")
            for tail, jk in dim_tails
        ],
        fact_key, how, include_current, vacuum_spools,
        fact_prop="jv_fact_through", keep_versions=keep_versions,
    )


def _refresh_from_tails(
    spark: SparkSession,
    view_catalog,
    view_name: str,
    fact_tail: CdfTail,
    dims,  # list of (tail, join_key, prop_name)
    fact_key,
    how: str,
    include_current: bool,
    vacuum_spools: bool,
    fact_prop: str,
    keep_versions: int = 0,
) -> dict:
    from agol_pandas_spark.catalog import DATA_CHANGE_PROP
    from agol_pandas_spark.operators.views import (
        commit_join_view_delta,
        star_view_delta,
    )

    import warnings

    with warnings.catch_warnings():
        # the "no archived versions" advisory tells a RAW consumer to
        # seed from the current table — which is precisely this
        # coordinator's contract (the view is derived from the
        # attach-time states), so the advisory is satisfied, not news
        warnings.filterwarnings(
            "ignore", message=".*no archived versions exist.*"
        )
        fact_tail.advance(include_current=include_current)
        for tail, _, _ in dims:
            tail.advance(include_current=include_current)
    marker = view_catalog.snapshot_props(view_name)
    f_through = int(marker.get(fact_prop, 0))
    d_throughs = [int(marker.get(pn, 0)) for _, _, pn in dims]

    def _new_batches(tail: CdfTail, through: int):
        # head spools land as v{watermark+1} directories too, so the
        # spool listing covers them; declared-noop transitions never
        # spool (nothing to apply) and simply don't appear
        spooled = sorted(tail._spooled_dirs())
        fresh = [v for v in spooled if v > through]
        if not fresh:
            return None, through, 0
        feed = tail.read_spool(spark).where(
            F.col("_commit_version") > through
        )
        return feed, max(fresh), len(fresh)

    f_feed, f_new, f_n = _new_batches(fact_tail, f_through)
    d_batches = [
        _new_batches(tail, th)
        for (tail, _, _), th in zip(dims, d_throughs)
    ]
    if f_feed is None and all(b[0] is None for b in d_batches):
        return {
            "applied_fact": 0,
            "applied_dims": [0] * len(dims),
            "fact_through": f_through,
            "dim_throughs": d_throughs,
            "committed": False,
        }
    fact_df, fact_path = fact_tail._spooled_snapshot_with_path(spark)
    dim_specs = [
        (d_feed, tail.spooled_snapshot(spark), jk)
        for (tail, jk, _), (d_feed, _, _) in zip(dims, d_batches)
    ]
    tf, tds, added = star_view_delta(
        f_feed, dim_specs, fact_df, fact_key, how,
        fact_path=fact_path, catalog=view_catalog,
    )
    # carried props: strip the watermarks (re-stamped below) AND any
    # data_change declaration (ADVICE r10 — a compacted view's
    # data_change:False must not ride a row-CHANGING refresh commit, or
    # a CdfTail over the VIEW would treat the real transition as a
    # declared no-op and silently skip its delta; same reason
    # Catalog.restore strips it)
    prop_names = {fact_prop, *[pn for _, _, pn in dims], DATA_CHANGE_PROP}
    props = {k: v for k, v in marker.items() if k not in prop_names}
    props[fact_prop] = f_new
    for (_, _, pn), (_, d_new, _) in zip(dims, d_batches):
        props[pn] = d_new
    stats = commit_join_view_delta(
        view_catalog, view_name, tf, tds, added, fact_key,
        keep_versions=keep_versions, snapshot_props=props,
    )
    if vacuum_spools:
        # AFTER the commit: the props watermark now covers these
        # batches, so a crash right here costs nothing but disk —
        # registered consumer watermarks still clamp the reclaim
        fact_tail.vacuum_spool(f_new)
        for (tail, _, _), (_, d_new, _) in zip(dims, d_batches):
            tail.vacuum_spool(d_new)
    return {
        "applied_fact": f_n,
        "applied_dims": [b[2] for b in d_batches],
        "fact_through": f_new,
        "dim_throughs": [b[1] for b in d_batches],
        "committed": True,
        "commit_stats": stats,
    }


def _persistent_stream_id(checkpoint_dir: str, stream_id: str | None) -> str:
    """The checkpoint lineage's stream id, persisted WITH the checkpoint
    (``<checkpoint_dir>/_cdf_stream_id``): batch ids are only meaningful
    within one checkpoint lineage, so the exactly-once marker's scope
    must restart exactly when the checkpoint does — never sooner (a
    fresh id on restart would let a re-executed post-commit micro-batch
    double-apply, ADVICE r9) and never later (a reused id over a WIPED
    checkpoint would suppress legitimate batch 0). First call writes the
    id atomically; later calls read it back; an explicit contradictory
    ``stream_id`` raises instead of silently forking the lineage."""
    marker = os.path.join(checkpoint_dir, "_cdf_stream_id")
    stored: str | None = None
    try:
        with open(marker) as f:
            stored = f.read().strip() or None
    except FileNotFoundError:
        pass
    if stored is not None:
        if stream_id is not None and stream_id != stored:
            raise ValueError(
                f"checkpoint {checkpoint_dir!r} belongs to stream lineage "
                f"{stored!r} but stream_id={stream_id!r} was passed — a "
                "mixed lineage mis-scopes every exactly-once marker; omit "
                "stream_id (it persists with the checkpoint) or use a "
                "fresh checkpoint_dir"
            )
        return stored
    stream_id = stream_id or uuid.uuid4().hex
    os.makedirs(checkpoint_dir, exist_ok=True)
    tmp = f"{marker}.__tmp_{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(stream_id)
    os.replace(tmp, marker)
    return stream_id


def stream_cdf_into_summary(
    tail: CdfTail,
    spark: SparkSession,
    summary_catalog,
    summary_name: str,
    keys: list[str],
    sums: dict[str, str],
    count_col: str = "n_rows",
    query_name: str | None = None,
    stream_id: str | None = None,
    checkpoint_dir: str | None = None,
    processing_time: str | None = None,
    consumer_id: str | None = None,
):
    """The streaming IVM loop: consume a :class:`CdfTail` stream and
    maintain a grouped count/sum summary table per micro-batch through
    ``apply_cdf_to_summary`` — each trigger costs the batch's deltas
    plus a group-cardinality join, never a snapshot rescan. Additive
    measures only (the batch-boundary-safe set; see module docstring).

    **Exactly-once, including foreachBatch re-execution** (ADVICE r8):
    Spark documents that a micro-batch may re-run after a failure that
    landed AFTER the sink's write committed but BEFORE the epoch
    commit. Each summary commit therefore records ``(stream_id,
    batch_id)`` in the snapshot's own properties — written inside the
    staged directory, so the marker and the summary land in ONE atomic
    rename — and ``maintain`` skips any batch at or below the marker.
    ``stream_id`` names the checkpoint lineage (batch ids restart at 0
    for a fresh checkpoint): with ``checkpoint_dir`` set it PERSISTS in
    the checkpoint directory itself (``_cdf_stream_id``, written once,
    reused on every restart) — so a restart that omits ``stream_id``
    keeps the original lineage instead of silently minting a fresh id,
    which would disable the re-execution guard for the first resumed
    batch (ADVICE r9). An explicit ``stream_id`` that CONTRADICTS the
    persisted one raises — mixing lineages under one checkpoint would
    mis-scope every marker. Without a checkpoint, None means a one-shot
    run (fresh random id, so stale markers from other lineages never
    suppress).

    ``processing_time`` (e.g. ``"1 second"``) runs a CONTINUOUS tail —
    the query keeps draining as ``tail.advance()`` spools new
    transitions — instead of the one-shot availableNow drain. Returns
    the started ``StreamingQuery``.

    ``consumer_id`` registers this stream as a SPOOL CONSUMER
    (``CdfTail.register_consumer``, VERDICT r10 item 4): after each
    applied (or marker-suppressed) micro-batch the stream records the
    highest ``_commit_version`` it has fully drained, and
    ``vacuum_spool`` never reclaims past the minimum registered
    watermark — so a housekeeping loop can vacuum the spool while this
    stream (and a tailed view refresh, and any other registered
    reader) lags arbitrarily, with bounded spool growth and zero data
    loss. Without it, vacuuming a spool a file stream reads is only
    safe when that stream is the sole consumer and is known drained."""
    from agol_pandas_spark.operators.views import apply_cdf_to_summary

    if checkpoint_dir is not None:
        stream_id = _persistent_stream_id(checkpoint_dir, stream_id)
    stream_id = stream_id or uuid.uuid4().hex
    # captured as a pair (or None) so the foreachBatch closure holds NO
    # reference to the tail in the default case: a stopped query object
    # outlives the loop, and a captured tail would keep the spool's
    # in-process liveness slot held past `del tail` (the crash-restart
    # pattern the liveness registry must allow)
    tracker = None
    if consumer_id is not None:
        tail.register_consumer(consumer_id)
        tracker = (consumer_id, tail)

    def maintain(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        marker = summary_catalog.snapshot_props(summary_name)
        suppressed = (
            marker.get("cdf_stream_id") == stream_id
            and marker.get("cdf_last_batch_id") is not None
            and batch_id <= marker["cdf_last_batch_id"]
        )
        if not suppressed:
            current = summary_catalog.table(summary_name)
            updated = apply_cdf_to_summary(
                current, batch_df, keys, sums, count_col=count_col
            )
            summary_catalog.write(
                updated,
                summary_name,
                mode="overwrite",
                snapshot_props={
                    "cdf_stream_id": stream_id,
                    "cdf_last_batch_id": batch_id,
                },
            )
        if tracker is not None:
            # AFTER the summary commit (a crash in between leaves the
            # watermark behind — spool kept, conservative, never ahead).
            # File-level tracking: this batch may hold only PART of a
            # transition directory (maxFilesPerTrigger), so the
            # watermark advances only once a version's whole file set
            # has been drained. Runs for marker-suppressed re-executions
            # too — their transitions are applied either way, and a
            # suppressed batch that never reported would pin the spool.
            # (inputFiles() is empty on a foreachBatch frame; the
            # per-row input_file_name over the batch-sized frame is the
            # reliable source.)
            cid, t = tracker
            drained_files = [
                r["f"]
                for r in batch_df.select(
                    F.input_file_name().alias("f")
                ).distinct().collect()
            ]
            t.record_consumer_files(cid, drained_files)

    writer = tail.stream(spark).writeStream.foreachBatch(maintain)
    if query_name:
        writer = writer.queryName(query_name)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if processing_time:
        return writer.trigger(processingTime=processing_time).start()
    return writer.trigger(availableNow=True).start()
