"""Mergeable frequency sketches in pure DataFrame ops.

A Count-Min Sketch is the scale answer to "how often does each of these
items occur in 100 TB": a ``depth × width`` grid of counters where every
occurrence increments one counter per row (bucket = hash_i(item) % width)
and a point estimate reads the MINIMUM of its ``depth`` counters. The
sketch is:

- **one hash aggregation** to build (explode items → groupBy (row,
  bucket) with map-side partial aggregation — the shuffle carries at most
  ``depth × width`` rows per partition, regardless of corpus size);
- **mergeable by addition** (union two sketch tables, sum counters) — the
  property that lets per-batch sketches roll up across ingest days
  without touching raw data;
- **never an underestimate** (collisions only add), with overestimate
  bounded by collision mass ``~N/width`` per row, and the min over
  ``depth`` independent rows concentrates near the true count.

Hashes are the engine-portable md5 family (``functions/text.py``), so
build and lookup are reproducible in the DuckDB oracle value-for-value —
an exactly-checkable approximate structure.

No counterpart in the reference (its service delegates all analytics);
north-star scope per SURVEY §2b.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from agol_pandas_spark.functions.text import portable_hash60

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _bucket(item: Column, row: int, width: int) -> Column:
    """Row-``i`` bucket id: md5-derived, non-negative, engine-portable."""
    h = portable_hash60(F.concat(F.lit(f"cms{row}_"), item))
    return F.pmod(h, F.lit(width))


def cms_build(
    items: DataFrame,
    item_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build a Count-Min Sketch over one item per input row.

    Returns the sketch as a DataFrame ``(row, bucket, cnt)`` — at most
    ``depth × width`` rows. Each input row contributes to ``depth``
    counters via a literal-array explode (no join, single aggregation).
    """
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    _bucket(F.col(item_col), i, width).alias("bucket"),
                )
                for i in range(depth)
            ]
        )
    ).alias("rb")
    return (
        items.select(rows)
        .select(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, width): counters add."""
    if not sketches:
        raise ValueError("nothing to merge")
    unioned = sketches[0]
    for s in sketches[1:]:
        unioned = unioned.unionByName(s)
    return unioned.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate each probe item: min of its ``depth`` counters.

    The sketch (≤ depth×width rows) broadcasts; probes explode to their
    ``depth`` (row, bucket) coordinates and take the group min — missing
    counters read 0 (the item was never seen).
    """
    coords = probes.select(
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _bucket(F.col(item_col), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(item_col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    joined = coords.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return joined.groupBy(item_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est")
    )


BLOOM_BITS = 8192  # m: 128 longs
BLOOM_HASHES = 4  # k


def _bit_pos(item: Column, row: int, m: int) -> Column:
    h = portable_hash60(F.concat(F.lit(f"bloom{row}_"), item))
    return F.pmod(h, F.lit(m))


def bloom_build(
    items: DataFrame,
    item_col: str,
    m: int = BLOOM_BITS,
    k: int = BLOOM_HASHES,
) -> DataFrame:
    """Build a Bloom filter as a DataFrame of 32-bit words
    ``(word, bits)`` — at most ``m/32`` rows (32-bit words: a shift into
    a 64-bit sign bit overflows engines with checked shifts, and the
    word count is a wash), built with ONE ``bit_or``
    hash aggregation (map-side combine keeps the shuffle at filter size,
    not corpus size). This is the compact membership pre-filter the
    incremental-dedup anti-join reaches for when even the corpus hash
    index is too large to shuffle: broadcast the words, drop every probe
    the filter rejects (guaranteed true negatives), and anti-join only
    the survivors.

    Mergeable by ``bit_or`` of word rows, like every OR-of-bits sketch.
    """
    pos = F.explode(
        F.array(*[_bit_pos(F.col(item_col), i, m) for i in range(k)])
    ).alias("pos")
    return (
        items.select(pos)
        .select(
            F.floor(F.col("pos") / 32).cast("long").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_might_contain(
    bloom: DataFrame,
    probes: DataFrame,
    item_col: str,
    m: int = BLOOM_BITS,
    k: int = BLOOM_HASHES,
) -> DataFrame:
    """Per-probe membership verdict: true iff ALL ``k`` bits are set.

    The word table broadcasts; probes explode to their k (word, bit)
    coordinates, check each against the OR-ed words, and a group-all
    reduces to the verdict. No false negatives by construction; false
    positives are the (deterministic, hash-driven) collision cost.
    """
    coords = probes.select(
        F.col(item_col),
        F.explode(
            F.array(*[_bit_pos(F.col(item_col), i, m) for i in range(k)])
        ).alias("pos"),
    ).select(
        item_col,
        F.floor(F.col("pos") / 32).cast("long").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("bit"),
    )
    checked = coords.join(F.broadcast(bloom), "word", "left").select(
        item_col,
        (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("bit")) != 0).alias("hit"),
    )
    return checked.groupBy(item_col).agg(
        F.min(F.col("hit").cast("int")).cast("boolean").alias("might_contain")
    )

def bloom_as_map(bloom: DataFrame) -> DataFrame:
    """Collapse a ``bloom_build`` word table to ONE row holding a
    ``map<word, bits>`` — the shape a shuffle-free semi-join reduction
    wants: the single row broadcasts via ``crossJoin(broadcast(...))``
    and every fact row checks its bits with pure JVM expressions.

    At the default ``m`` the map is 256 entries / ~4 KiB — negligible
    against a broadcast variable, and independent of both corpus and
    filter-build cardinality.
    """
    return bloom.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("word", "bits")))
        ).alias("__bloom")
    )


def bloom_reduce(
    fact: DataFrame,
    bloom_map: DataFrame,
    item_col: str,
    m: int = BLOOM_BITS,
    k: int = BLOOM_HASHES,
) -> DataFrame:
    """Shuffle-free Bloom semi-join reduction of a fact table.

    The 100 TB join problem this solves: a selective predicate on the
    dimension side leaves a key set too large to broadcast as an exact
    IN-list but tiny as a bit set. Building the Bloom over the dim keys
    and applying it to the fact side BELOW the shuffle means the
    Exchange carries only rows that can possibly match — the same idea
    as Spark's runtime row-level bloom filtering
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``), but explicit,
    engine-portable (md5 hash family → reproducible in the DuckDB
    oracle), and usable across connector boundaries where the optimizer
    cannot inject it.

    No false negatives by construction, so a subsequent EXACT join
    yields results identical to the unreduced join — false positives
    only cost shuffle bytes. The predicate is ``k`` static conjuncts of
    map lookups + bit tests: no explode, no groupBy, no per-row Python —
    the fact scan stays one WholeStageCodegen span.
    """
    out = fact.crossJoin(F.broadcast(bloom_map))
    cond = F.lit(True)
    for i in range(k):
        pos = _bit_pos(F.col(item_col), i, m)
        word = F.floor(pos / 32).cast("long")
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.pmod(pos, F.lit(32)).cast("int")
        )
        hit = (
            F.coalesce(F.element_at(F.col("__bloom"), word), F.lit(0))
            .bitwiseAND(bit)
            != 0
        )
        cond = cond & hit
    return out.filter(cond).drop("__bloom")


def misra_gries_candidates(items: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra–Gries summaries → global heavy-hitter
    CANDIDATE set (one column, ``col``), guaranteed to contain every
    item with global frequency > N/k.

    Why the union of per-partition summaries is a valid superset: if
    an item's global count f exceeds N/k = Σₚ Nₚ/k, then by pigeonhole
    some partition p has local count fₚ > Nₚ/k — and Misra–Gries with
    k counters never evicts an item whose local frequency exceeds the
    local stream length over k (each of the ≤ Nₚ/k decrement rounds
    removes at most one occurrence credit). So a second EXACT counting
    pass restricted to the candidates (a broadcast semi-join — the
    full-cardinality groupBy never happens) recovers the exact heavy
    hitters with bounded memory: ≤ k counters per partition, ≤ k·P
    candidate rows total, independent of data size. This is the
    deterministic two-pass pattern (MG + recount), not the lossy
    one-pass estimate — output is exactly reproducible.

    The per-partition pass is genuinely imperative (conditional
    eviction state) — the sanctioned ``mapInPandas`` case; everything
    else stays JVM-side.
    """
    import pandas as pd

    schema = items.select(col).schema

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            for item in pdf[col]:
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({col: list(counters.keys())})

    return items.select(col).mapInPandas(summarize, schema=schema).distinct()
