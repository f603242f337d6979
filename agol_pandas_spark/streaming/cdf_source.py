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
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


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

    # -- spool exclusivity + hygiene ------------------------------------

    def _acquire_lock(self) -> None:
        """Take the spool's single-live-tail lock (pid-stamped O_EXCL
        file). A lock held by a DEAD process is stale — a crashed tail
        cannot release it — and is reclaimed; a lock held by THIS
        process is re-taken (a tail re-created over the same spool in
        one process is the crash-restart pattern the recovery guards
        exist for, and the lock protects against concurrent *processes*
        — two live tail objects in one process remain the caller's
        responsibility, as documented on the class). A lock held by a
        live other process raises :class:`TailLockError`."""
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
            elif e.startswith(f"{self.STATE_NAME}.__tmp_"):
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
        from agol_pandas_spark.errors import CdfGapError

        if self._spooled_head:
            current = self.catalog.commit_id(self.name)
            if self._head_commit_id is None or current == self._head_commit_id:
                return self.catalog.table(self.name)
            # a commit raced in after the head capture: the captured
            # state was displaced — serve it from the archive that
            # carries its commit id (the racer's keep_versions archived
            # it), never the moved-on current table
            for v in reversed(self.catalog.versions(self.name)):
                if self._archived_commit_id(v) == self._head_commit_id:
                    return self.catalog.table_at(self.name, v)
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
                return self.catalog.table(self.name)
            version = versions[0]
        try:
            return self.catalog.table_at(self.name, version)
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

    def vacuum_spool(self, through: int) -> list[str]:
        """Reclaim spooled transition directories every consumer has
        PROCESSED: versions ≤ ``through`` — which must be the
        consumer's applied position (a file-stream's completed drain, a
        refresh loop's props watermark), because the spool itself
        cannot know what downstream has read; vacuuming past a lagging
        consumer loses its unread deltas exactly like vacuuming table
        archives past the tail does.

        Bounded additionally by the tail's own durable watermark: the
        crash-recovery guards key on directories ABOVE it (an unspooled
        transition's dir-existence, the head capture's commit record),
        so those are never eligible regardless of ``through`` — a head
        spool at ``watermark+1`` stays until its state is archived and
        the watermark moves past it. Without this housekeeping a
        continuous tail accumulates one directory per commit forever.
        Returns the removed paths."""
        limit = min(int(through), self._spooled_through)
        removed: list[str] = []
        for version, path in sorted(self._spooled_dirs().items()):
            if version <= limit:
                shutil.rmtree(path, ignore_errors=True)
                removed.append(path)
        return removed

    def close(self) -> None:
        self._release_lock()
        shutil.rmtree(self.spool_dir, ignore_errors=True)

    def detach(self) -> None:
        """Release the spool WITHOUT deleting it — the clean handoff for
        a tail that another process (or a later run) will resume via the
        durable ``_state.json``. ``close()`` deletes the spool outright."""
        self._release_lock()


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
    housekeeping; leave False when another consumer (a file stream)
    also reads these spools."""
    from agol_pandas_spark.operators.views import (
        apply_cdf_to_join_view_bilateral,
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
        dim_tail.advance(include_current=include_current)
    marker = view_catalog.snapshot_props(view_name)
    f_through = int(marker.get("jv_fact_through", 0))
    d_through = int(marker.get("jv_dim_through", 0))

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
    d_feed, d_new, d_n = _new_batches(dim_tail, d_through)
    if f_feed is None and d_feed is None:
        return {
            "applied_fact": 0, "applied_dim": 0,
            "fact_through": f_through, "dim_through": d_through,
            "committed": False,
        }
    view = view_catalog.table(view_name)
    maintained = apply_cdf_to_join_view_bilateral(
        view,
        f_feed,
        d_feed,
        fact=fact_tail.spooled_snapshot(spark),
        dim=dim_tail.spooled_snapshot(spark),
        join_key=join_key,
        fact_key=fact_key,
        how=how,
    )
    view_catalog.write(
        maintained, view_name, mode="overwrite",
        snapshot_props={
            **{k: v for k, v in marker.items()
               if k not in ("jv_fact_through", "jv_dim_through")},
            "jv_fact_through": f_new,
            "jv_dim_through": d_new,
        },
    )
    if vacuum_spools:
        # AFTER the commit: the props watermark now covers these
        # batches, so a crash right here costs nothing but disk
        fact_tail.vacuum_spool(f_new)
        dim_tail.vacuum_spool(d_new)
    return {
        "applied_fact": f_n, "applied_dim": d_n,
        "fact_through": f_new, "dim_through": d_new,
        "committed": True,
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
    the started ``StreamingQuery``."""
    from agol_pandas_spark.operators.views import apply_cdf_to_summary

    if checkpoint_dir is not None:
        stream_id = _persistent_stream_id(checkpoint_dir, stream_id)
    stream_id = stream_id or uuid.uuid4().hex

    def maintain(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        marker = summary_catalog.snapshot_props(summary_name)
        if (
            marker.get("cdf_stream_id") == stream_id
            and marker.get("cdf_last_batch_id") is not None
            and batch_id <= marker["cdf_last_batch_id"]
        ):
            return  # re-executed micro-batch: its commit already landed
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

    writer = tail.stream(spark).writeStream.foreachBatch(maintain)
    if query_name:
        writer = writer.queryName(query_name)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if processing_time:
        return writer.trigger(processingTime=processing_time).start()
    return writer.trigger(availableNow=True).start()
