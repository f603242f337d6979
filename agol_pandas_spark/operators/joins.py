"""Time-series joins Spark lacks as built-ins: as-of join and range join.

The reference has no join surface at all beyond key-equi merge modes
(``src/agol_pandas.py:388-413``); these operators are north-star additions
for event/feature pipelines (nearest-prior-observation lookup, band/bin
classification).

Scale design:

- *As-of join* is implemented as **union + ordered window**, not a
  join-then-filter: both inputs shuffle ONCE on the key, sort within
  partitions on (ts, side), and a cumulative ``max`` over the right-side
  payload struct finds the nearest match. This is a single sort-merge
  pass — no candidate explosion, no per-key skew amplification beyond the
  window itself (salt hot keys upstream if one key owns a partition's
  worth of rows).
- *Range join* against a small band dimension broadcasts the dimension and
  lets Spark pick BroadcastNestedLoopJoin — the right physical plan when
  the dim is tiny. For a large dimension, pre-bin both sides to an
  equi-join key (bin = value div width) instead; this operator
  intentionally targets the broadcast case.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    direction: str = "backward",
    matched_ts_alias: str | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row at-or-before
    (``backward``) / at-or-after (``forward``) / on either side with the
    smallest ``|Δt|`` (``nearest``, tie → the earlier row, pandas
    ``merge_asof`` parity) its timestamp, per key.

    ``right_cols`` are carried into the output under their own names
    (pre-alias them on ``right`` to avoid collisions with left columns).
    Ties on ``right_ts`` within a key resolve to the row with the largest
    (backward) / smallest (forward) ``(ts, *right_cols)`` tuple — include a
    unique column first in ``right_cols`` for full determinism.

    ``tolerance_seconds`` (pandas ``merge_asof`` parity) voids matches
    farther than the tolerance from the left timestamp — the match columns
    come back NULL, the left row stays. For ``nearest`` the tolerance is
    applied to each CANDIDATE before choosing, so a too-far backward row
    never shadows an in-range forward one.

    Left rows with no match keep NULLs (left-join semantics).

    Scale shape (all directions): one shuffle on the key; ``nearest``
    runs the backward cumulative-max and forward cumulative-min as two
    window passes over that single partitioning (the second pass re-sorts
    within partitions — no extra exchange).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    keys = list(on)
    lcols = list(left.columns)
    matched_ts = matched_ts_alias or f"asof_{right_ts}"

    payload = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols]
    )
    rpay_type = right.select(payload.alias("p")).schema["p"].dataType
    lrow = F.struct(*[F.col(c) for c in lcols])
    lrow_type = left.select(lrow.alias("l")).schema["l"].dataType

    l2 = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        lrow.alias("__lrow"),
        F.lit(None).cast(rpay_type).alias("__rpay"),
    )
    r2 = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(lrow_type).alias("__lrow"),
        payload.alias("__rpay"),
    )
    ts_type = left.schema[left_ts].dataType

    def _gap(match_col: Column) -> Column:
        lts, rts = F.col("__ts"), match_col["__rts"]
        if isinstance(ts_type, T.TimestampType):
            return F.abs(F.unix_micros(lts) - F.unix_micros(rts))
        return F.abs(lts - rts)

    if tolerance_seconds is not None and isinstance(ts_type, T.TimestampType):
        tol = F.lit(int(tolerance_seconds * 1_000_000))
    else:
        tol = F.lit(tolerance_seconds)

    if direction == "nearest":
        # both scans over ONE key shuffle: backward cumulative max with
        # right-before-left at equal ts (inclusive "at"), forward
        # cumulative min over the following frame with left-before-right
        # at equal ts (inclusive "at"); NULL __rpay on left rows is
        # ignored by max/min
        w_b = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_f = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts").asc(), F.col("__side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        out = (
            l2.unionByName(r2)
            .withColumn("__mb", F.max("__rpay").over(w_b))
            .withColumn("__mf", F.min("__rpay").over(w_f))
            .filter(F.col("__side") == 1)
        )
        if tolerance_seconds is not None:
            out = out.withColumn(
                "__mb", F.when(_gap(F.col("__mb")) <= tol, F.col("__mb"))
            ).withColumn(
                "__mf", F.when(_gap(F.col("__mf")) <= tol, F.col("__mf"))
            )
        out = out.withColumn(
            "__match",
            F.when(F.col("__mb").isNull(), F.col("__mf"))
            .when(F.col("__mf").isNull(), F.col("__mb"))
            # tie on |Δt| → the earlier (backward) row, merge_asof parity
            .when(_gap(F.col("__mb")) <= _gap(F.col("__mf")), F.col("__mb"))
            .otherwise(F.col("__mf")),
        )
        return out.select(
            *[F.col(f"__lrow.{c}").alias(c) for c in lcols],
            F.col("__match.__rts").alias(matched_ts),
            *[F.col(f"__match.{c}").alias(c) for c in right_cols],
        )

    # right rows sort before left at equal ts (__side 0 < 1), so "at" is
    # inclusive in both directions
    if direction == "backward":
        order = [F.col("__ts").asc(), F.col("__side").asc()]
        pick = F.max
    else:
        order = [F.col("__ts").desc(), F.col("__side").asc()]
        pick = F.min
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = pick("__rpay").over(w)
    out = (
        l2.unionByName(r2)
        .withColumn("__match", matched)
        .filter(F.col("__side") == 1)
    )
    if tolerance_seconds is not None:
        out = out.withColumn(
            "__match",
            F.when(_gap(F.col("__match")) <= tol, F.col("__match")),
        )
    return out.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in lcols],
        F.col("__match.__rts").alias(matched_ts),
        *[F.col(f"__match.{c}").alias(c) for c in right_cols],
    )


def range_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    how: str = "inner",
    broadcast_bands: bool = True,
) -> DataFrame:
    """Join fact rows to the band whose ``[lo, hi)`` interval contains
    ``value_col``. Broadcasts the band table (non-equi conditions otherwise
    force a cartesian shuffle)."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    b = F.broadcast(bands) if broadcast_bands else bands
    return fact.join(b, cond, how)


def point_in_time_join(
    probe: DataFrame,
    dim: DataFrame,
    key: str | Sequence[str],
    probe_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Point-in-time (temporal) dimension lookup: join each probe row to
    the SCD Type-2 dimension version valid at its timestamp —
    ``key match AND valid_from <= ts AND (ts < valid_to OR valid_to IS
    NULL)``. The standard pattern for joining facts to versioned
    dimensions (the history :func:`~agol_pandas_spark.operators.merge.
    scd2_history` builds; the reference's last-write-wins upsert,
    src/agol_pandas.py:398-407, destroys exactly this).

    Scale shape: the key equality makes this a plain equi-join (hash
    shuffle on the key; broadcast if the dimension is small) with the
    interval predicate evaluated as a post-join filter on the matched
    key group — never a cartesian: a fact meets only its own key's
    versions, and a key's version count is small by construction (one
    row per change). Non-overlapping ``[valid_from, valid_to)``
    intervals guarantee at most one match per probe row.
    """
    keys = [key] if isinstance(key, str) else list(key)
    cond = [probe[k] == dim[k] for k in keys]
    interval = (probe[probe_ts] >= dim[valid_from]) & (
        dim[valid_to].isNull() | (probe[probe_ts] < dim[valid_to])
    )
    joined = probe.join(dim, cond + [interval], how)
    # drop the dimension's duplicate key columns: output carries probe keys
    return joined.drop(*[dim[k] for k in keys])


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    start_col: str,
    end_col: str,
    grid: int,
    keys: Sequence[str] = (),
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """Interval × interval overlap join — both sides carry ``[start,
    end)`` ranges (non-negative longs, e.g. unix micros) and the output
    is every pair that truly overlaps, joined per ``keys``.

    A naive overlap join is a non-equi condition → cartesian per key
    group. This uses GRID BINNING, the standard scale rewrite: each
    interval explodes into the grid cells it covers (``sequence(s div
    g, (e-1) div g)``), the join becomes an EQUI-join on (keys, cell),
    and the true-overlap filter runs on the collided candidates. Each
    overlapping pair collides in every shared cell, so it is emitted
    exactly once from the single cell containing ``greatest(s_a, s_b)``
    — no distinct, nothing re-shuffled for dedup.

    Pick ``grid`` ≈ the typical interval length: the explode factor is
    ``len/grid + 1`` per row while cell population stays bounded. A
    degenerate long interval fans out over many cells — cap or split
    outliers upstream. EMPTY intervals (``end <= start``, zero duration)
    are dropped up front on both sides: a ``[s, s)`` range overlaps
    nothing under half-open semantics, but it would pass both strict
    inequalities against an interval containing ``s`` and come back with
    ``overlap = 0`` (and its descending ``sequence`` spans the wrong
    cells when it straddles a grid boundary) — contradicting the
    "every pair truly overlaps" contract. Non-key columns are suffixed
    ``_a``/``_b``; ``overlap`` is the exact positive integer overlap
    length.
    """
    g = int(grid)
    if g <= 0:
        raise ValueError(f"grid must be a positive integer, got {grid}")

    def side(df: DataFrame, sfx: str) -> DataFrame:
        renamed = df.select(
            *[F.col(k) for k in keys],
            *[
                F.col(c).alias(c + sfx)
                for c in df.columns
                if c not in keys
            ],
        )
        s, e = start_col + sfx, end_col + sfx
        return renamed.filter(F.col(e) > F.col(s)).withColumn(
            "__cell", F.explode(F.expr(f"sequence({s} div {g}, ({e} - 1) div {g})"))
        )
    a, b = suffixes
    sa, ea = start_col + a, end_col + a
    sb, eb = start_col + b, end_col + b
    return (
        side(left, a)
        .join(side(right, b), [*keys, "__cell"])
        .filter(
            (F.col(sa) < F.col(eb))
            & (F.col(sb) < F.col(ea))
            # emit-once: only the cell holding the later start reports
            & (F.col("__cell") == F.expr(f"greatest({sa}, {sb}) div {g}"))
        )
        .drop("__cell")
        .withColumn(
            "overlap",
            F.least(F.col(ea), F.col(eb)) - F.greatest(F.col(sa), F.col(sb)),
        )
    )
