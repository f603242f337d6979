"""Full-registry sweep under ADVERSE Spark configs: AQE off, broadcast
joins disabled (forces SMJ), tiny shuffle parallelism. Hashes must still
match the DuckDB oracle - proving no query's VALUES depend on join
strategy, adaptive re-planning, or parallelism."""
import hashlib, json, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .appName("config-invariance")
         .config("spark.ui.enabled","false")
         .config("spark.sql.adaptive.enabled","false")
         .config("spark.sql.autoBroadcastJoinThreshold","-1")
         .config("spark.sql.shuffle.partitions","5")
         # full-registry single-session sweep: heap headroom + per-query
         # block release (same OOM mode as local_correctness.py, fixed r6)
         .config("spark.driver.memory","6g")
         .getOrCreate())
import __spark_entry__ as entry
qs, os_ = entry.queries(), entry.oracle_sql()
con = duckdb.connect()
sf = "/root/testdata/sf0.01"
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
def h(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cell = lambda v: "<NULL>" if v is None else (repr(v) if isinstance(v,float) else str(v))
    canon = sorted(tuple(cell(r[i]) for i in order) for r in rows)
    m = hashlib.sha256()
    for row in canon: m.update("\x1f".join(row).encode()); m.update(b"\x1e")
    return m.hexdigest()
bad = []
for name in sorted(qs):
    try:
        sdf = qs[name](spark, sf); srows = sdf.collect()
        r = con.execute(os_[name]); orows = r.fetchall(); ocols=[d[0] for d in r.description]
        if not (len(srows)==len(orows) and sorted(sdf.columns)==sorted(ocols)
                and h(srows,sdf.columns)==h(orows,ocols)):
            bad.append(name)
    except Exception as ex:
        bad.append(f"{name}:{type(ex).__name__}:{str(ex)[:120]}")
    from agol_pandas_spark.session import release_session_blocks
    release_session_blocks(spark)
print("ADVERSE-CONFIG SWEEP:", len(qs), "queries,", len(bad), "failing:", bad)
