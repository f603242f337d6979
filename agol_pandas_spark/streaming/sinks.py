"""Streaming sinks: merge-into-catalog via ``foreachBatch``.

The production shape for "stream upserts into a table": each micro-batch
runs the same join-rewrite merge the batch engine uses
(``operators/merge.py``), committed atomically through the catalog's
two-phase write. This is the streaming continuation of the reference's
create-or-load loop (``src/agol_pandas.py:546-680``) — chunks become
micro-batches, the sequential driver loop becomes a trigger schedule.

Semantics per batch: ``upsert`` (default) keys must be unique *within a
batch* (validated — duplicate keys in one batch are a data error the
reference silently let the server resolve); across batches, later batches
win. ``append`` needs no key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from agol_pandas_spark.operators.merge import WriteMode, write_table


def stream_merge_into_catalog(
    stream: DataFrame,
    catalog,
    name: str,
    key: str | None = None,
    mode: str | WriteMode = WriteMode.UPSERT,
    query_name: str | None = None,
    trigger_available_now: bool = True,
    prepare=None,
    prune: bool = False,
):
    """Continuously merge a stream into catalog table ``name``.

    Returns the started ``StreamingQuery``. With ``trigger_available_now``
    the query drains what exists and stops — the backfill/test shape; flip
    it off for a long-running ingestion. Checkpointing is the memory-less
    default here (local engine); point ``checkpointLocation`` at durable
    storage in a real deployment for exactly-once batches.

    ``prepare`` (optional ``DataFrame -> DataFrame``) runs on each
    micro-batch before the merge — the hook for per-batch compaction
    (keyed modes require the key unique within a batch; a latest-wins
    dedup there is the standard shape for CDC-style streams).

    ``prune=True`` routes each micro-batch through the key-pruned
    copy-on-write merge (``operators/merge.merge_pruned``): only target
    files whose footer key span can contain a batch key are rewritten,
    the rest carry into the new snapshot by hard link. THE shape for
    continuous CDC into a big table — a micro-batch touching 0.1% of
    keys stops paying a full-table rewrite every trigger.
    """

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if prepare is not None:
            batch_df = prepare(batch_df)
        write_table(catalog, batch_df, name, mode=mode, key=key, prune=prune)

    writer = stream.writeStream.foreachBatch(merge_batch)
    if query_name:
        writer = writer.queryName(query_name)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_to_paged_sink(
    stream: DataFrame,
    sink,
    checkpoint_dir: str,
    page_size: int = 100_000,
    policy=None,
    trigger: dict | None = None,
):
    """Stream → remote paged service: each micro-batch uploads through
    :func:`agol_pandas_spark.sources.paged.write_paged` — per-partition
    parallel batched uploads with executor-side retry — inside
    ``foreachBatch``. The streaming replacement for the reference's
    driver-side sequential chunk loop (``src/agol_pandas.py:426, :614``).

    Delivery contract: at-least-once per page, made effectively-once by
    the sink's ``batch_id`` dedup key. Every upload carries
    ``"<micro-batch>-<partition>-<index>"`` — stable across task retries
    AND across query restarts from ``checkpoint_dir`` — so a replayed
    micro-batch overwrites its own pages instead of duplicating them
    (the :class:`~agol_pandas_spark.sources.paged.PagedSink` contract;
    the reference used ``rollback=True`` per chunk for the same reason).

    ``checkpoint_dir`` is REQUIRED and must be durable + stable per
    logical pipeline: restart recovery only exists when the restarted
    query finds the previous run's commits. ``trigger`` is passed to
    ``writeStream.trigger(**trigger)``; the default ``availableNow=True``
    drains what exists and stops (the backfill/test shape) — pass e.g.
    ``{"processingTime": "30 seconds"}`` for continuous ingestion.
    """
    from agol_pandas_spark.sources.paged import write_paged

    def upload(batch_df: DataFrame, batch_id: int) -> None:
        write_paged(
            batch_df,
            sink,
            page_size=page_size,
            policy=policy,
            batch_id_prefix=f"{batch_id}-",
        )

    return (
        stream.writeStream.foreachBatch(upload)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def stream_wap_into_catalog(
    stream: DataFrame,
    catalog,
    name: str,
    audits: dict[str, str],
    quarantine: str | None = None,
    key: str | None = None,
    mode: str | WriteMode = WriteMode.APPEND,
    prepare=None,
    trigger_available_now: bool = True,
):
    """Write-Audit-Publish per micro-batch: each batch's post-merge
    state stages, audits, and publishes atomically
    (``operators/merge.write_audit_publish``); a batch that fails its
    audit is appended to the ``quarantine`` table (with an
    ``audit_rule`` column naming the violated rules) INSTEAD of
    aborting the stream — continuous ingestion with a governance gate,
    the streaming fix for the reference's upload-then-truncate repair
    (src/agol_pandas.py:396,453). The live table only ever advances by
    audited snapshots; a poisoned batch costs one staged-and-discarded
    write, never a rollback.
    """
    from agol_pandas_spark.errors import AuditFailedError
    from agol_pandas_spark.operators.merge import write_audit_publish

    def wap_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if prepare is not None:
            batch_df = prepare(batch_df)
        try:
            write_audit_publish(
                catalog, batch_df, name, mode=mode, key=key, audits=audits
            )
        except AuditFailedError as ex:
            if quarantine is None:
                raise
            from pyspark.sql import functions as F

            tagged = batch_df.withColumn(
                "audit_rule", F.lit(",".join(sorted(ex.violations)))
            )
            write_table(catalog, tagged, quarantine, mode=WriteMode.APPEND)

    writer = stream.writeStream.foreachBatch(wap_batch)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def append_once(catalog, batch: DataFrame, name: str, key_cols: list[str]):
    """Idempotent append: the batch is fingerprinted by order- and
    partition-independent aggregates of PER-ROW hashes over
    ``key_cols`` — ``xxhash64(struct(key_cols))`` combined via count,
    bit-XOR, and exact DECIMAL(38,0) sum. Hashing each full key tuple
    first makes distinct key sets collide only at hash-collision odds
    (raw column sums confuse {0,5} with {1,4}); the sum term keeps
    duplicated rows from cancelling pairwise in the XOR; DECIMAL(38,0)
    keeps the sum exact and overflow-free under ANSI arithmetic. The
    fingerprint rides every row as a ``commit_key`` column, and the
    append is SKIPPED when the target already contains that key. Turns
    at-least-once delivery into exactly-once TABLE STATE without a
    separate transaction log: the commit marker is in the data itself,
    so the dedup check and the data share one atomic snapshot — there
    is no window where the log says committed but the data is missing
    (or vice versa). Returns True if the batch was appended, False if
    it was a duplicate.

    Fingerprint format note (v2, r7): tables whose ``commit_key``
    values were written by the pre-r7 raw-column formula will NOT
    dedup a redelivery of a pre-r7 batch (one-time re-append risk at
    upgrade). This is deliberate: also matching the legacy format
    would reintroduce its false-POSITIVE collisions ({0,5} vs {1,4}),
    which silently DROP new batches — the worse failure. Re-key
    long-lived tables once (rewrite commit_key from the stored rows)
    if redelivery of pre-upgrade batches is possible."""
    from pyspark.sql import functions as F

    from agol_pandas_spark.operators.merge import write_table

    h = F.xxhash64(F.struct(*[F.col(c) for c in key_cols]))
    fp = (
        batch.select(h.alias("__h"))
        .agg(
            F.concat_ws(
                "_",
                F.count("__h").cast("string"),
                F.expr("bit_xor(__h)").cast("string"),
                F.sum(F.col("__h").cast("decimal(38,0)")).cast("string"),
            ).alias("fp")
        )
        .first()
        .fp
    )
    if catalog.exists(name):
        dup = (
            catalog.table(name)
            .filter(F.col("commit_key") == fp)
            .limit(1)
            .count()
        )
        if dup:
            return False
    write_table(
        catalog,
        batch.withColumn("commit_key", F.lit(fp)),
        name,
        mode="append",
    )
    return True
