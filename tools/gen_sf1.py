"""Generate an sf1 testdata directory (~10x sf0.1) for the scale soak.

VERDICT r6 item 3: every O() claim was argued from plans at sf0.1; this
produces the data to measure sf0.1 -> sf1 scaling exponents empirically
(BENCH_r07_sf1.json + the scaling table in BASELINE.md).

The driver's testdata is read-only and its generator is not available,
so sf1 is synthesized deterministically in two ways:

- relational tables + events: sf0.1 replicated 10x with CONSISTENT key
  shifts (copy i adds i * (max_key + 1) to every PK/FK of that entity),
  so join fan-outs, value distributions, and per-group densities match
  sf0.1 exactly while key cardinalities and row counts scale 10x — the
  same shape a real TPC-H sf1 has relative to sf0.1. region/nation are
  fixed dimensions and copy through unchanged.
- documents / embeddings: replication would be WRONG for the near-dup
  families (10 identical copies of each doc = 45 artificial near-dup
  pairs per doc — quadratic pair inflation no real corpus has), so both
  regenerate FRESH from the same observed process: documents are
  uniform word salads over the corpus's 31-word vocabulary (10..100
  words, the sf0.1 length distribution), langs drawn with sf0.1's
  frequencies, source = src{id % 20}; embeddings are unit-normalized
  64-dim gaussians with uniform labels 0..9 (the sf0.1 corpus has no
  measurable label signal: per-label centroid norms match the 1/sqrt(n)
  of pure noise). Near-dup pair density at sf1 therefore comes from
  honest n-gram collisions, and its growth rate is part of what the
  soak measures.

Usage: python tools/gen_sf1.py [out_dir]   (default /root/repo/testdata_sf1)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as papq

SRC = "/root/testdata/sf0.1"
COPIES = 10

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.412, 0.150, 0.149, 0.148, 0.141]


def _spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[16]")
        .appName("gen_sf1")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # mirror Catalog's timestamp invariants: read tz-less µs parquet
        # as LTZ TimestampType (not NTZ) and write µs. Spark embeds its
        # own schema in written files, so an NTZ round-trip here would
        # OVERRIDE the engine's inferTimestampNTZ=false on read and break
        # every instant function over sf1 events.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .getOrCreate()
    )


def replicate(spark, out_dir: str) -> None:
    """sf0.1 x10 with consistent key shifts across PK/FK columns."""
    from pyspark.sql import functions as F

    shifts = {}  # entity -> max_key + 1
    key_of = {
        "custkey": ("customer", "c_custkey"),
        "orderkey": ("orders", "o_orderkey"),
        "suppkey": ("supplier", "s_suppkey"),
        "partkey": ("part", "p_partkey"),
    }
    for ent, (tbl, col) in key_of.items():
        mx = (
            spark.read.parquet(f"{SRC}/{tbl}.parquet")
            .agg(F.max(col)).first()[0]
        )
        shifts[ent] = int(mx) + 1

    plans = {
        "customer": {"c_custkey": "custkey"},
        "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
        "supplier": {"s_suppkey": "suppkey"},
        "part": {"p_partkey": "partkey"},
        "lineitem": {
            "l_orderkey": "orderkey",
            "l_partkey": "partkey",
            "l_suppkey": "suppkey",
        },
    }
    copies = spark.range(COPIES).withColumnRenamed("id", "__copy")
    for tbl, keymap in plans.items():
        df = spark.read.parquet(f"{SRC}/{tbl}.parquet")
        wide = df.crossJoin(F.broadcast(copies))
        for col, ent in keymap.items():
            wide = wide.withColumn(
                col, (F.col(col) + F.col("__copy") * F.lit(shifts[ent]))
                .cast(dict(df.dtypes)[col])
            )
        (
            wide.drop("__copy")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/{tbl}.parquet.dir")
        )
        _flatten(out_dir, tbl)
        print(f"  {tbl}: x{COPIES}")

    # events: shift ids, offset ts by one second per copy
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    emax = ev.agg(
        F.max("event_id").alias("e"), F.max("user_id").alias("u")
    ).first()
    wide = ev.crossJoin(F.broadcast(copies))
    wide = (
        wide.withColumn(
            "event_id", F.col("event_id") + F.col("__copy") * F.lit(int(emax.e) + 1)
        )
        .withColumn(
            "user_id", F.col("user_id") + F.col("__copy") * F.lit(int(emax.u) + 1)
        )
        .withColumn(
            # NTZ-safe one-second-per-copy offset (keeps the column type)
            "ts", F.expr("ts + make_interval(0, 0, 0, 0, 0, 0, __copy)")
        )
    )
    wide.drop("__copy").coalesce(1).write.mode("overwrite").parquet(
        f"{out_dir}/events.parquet.dir"
    )
    _flatten(out_dir, "events")
    print("  events: x10")

    for tbl in ("region", "nation"):
        import shutil

        shutil.copyfile(f"{SRC}/{tbl}.parquet", f"{out_dir}/{tbl}.parquet")
        print(f"  {tbl}: copied (fixed dim)")


def _flatten(out_dir: str, tbl: str) -> None:
    """Promote the single part file to <tbl>.parquet — the driver corpus
    is one parquet FILE per table and several mock-service/streaming
    queries rely on that (ParquetPagedClient opens the path as a file;
    stream landings symlink it). Spark still parallelizes the scan by
    byte ranges/row groups."""
    import shutil

    src_dir = f"{out_dir}/{tbl}.parquet.dir"
    part = next(
        f for f in os.listdir(src_dir)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    dst = f"{out_dir}/{tbl}.parquet"
    if os.path.exists(dst):
        shutil.rmtree(dst) if os.path.isdir(dst) else os.remove(dst)
    os.rename(os.path.join(src_dir, part), dst)
    shutil.rmtree(src_dir, ignore_errors=True)


def gen_documents(out_dir: str, n: int = 50_000) -> None:
    rng = np.random.default_rng(420)
    wc = rng.integers(10, 101, size=n)
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    texts = []
    vocab = np.array(VOCAB)
    for i in range(n):
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), size=wc[i])]))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs.tolist(), pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    papq.write_table(tbl, f"{out_dir}/documents.parquet")
    print(f"  documents: {n} fresh")


def gen_embeddings(out_dir: str, n: int = 20_000, dim: int = 64) -> None:
    rng = np.random.default_rng(421)
    V = rng.standard_normal((n, dim)).astype(np.float64)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    V = V.astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([v.tolist() for v in V],
                                  pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, size=n).tolist(), pa.int32()),
        }
    )
    papq.write_table(tbl, f"{out_dir}/embeddings.parquet")
    print(f"  embeddings: {n} fresh")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    os.makedirs(out_dir, exist_ok=True)
    print(f"generating sf1 into {out_dir}")
    gen_documents(out_dir)
    gen_embeddings(out_dir)
    spark = _spark()
    replicate(spark, out_dir)
    spark.stop()
    print("done")


if __name__ == "__main__":
    main()
