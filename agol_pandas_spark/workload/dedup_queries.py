"""Oracle-checked queries for dedup operators (``operators/dedup.py``).

The MinHash/SimHash oracles reproduce the engine's md5-portable hashing
and fixed seed parameters in DuckDB SQL, so signatures, LSH candidate
pairs, and fingerprints are verified value-for-value — not just row
counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from agol_pandas_spark.catalog import Catalog
from agol_pandas_spark.operators import dedup
from agol_pandas_spark.operators.dedup import MINHASH_P, MINHASH_PARAMS
from agol_pandas_spark.workload import REGISTRY, register
from agol_pandas_spark.workload.text_queries import SQL_HASH60, SQL_TOKS

# word-3-gram shingles of a token list, DuckDB dialect (mirrors
# functions.text.word_shingles)
SQL_SHINGLES = (
    "CASE WHEN len({toks}) < 3 THEN [] "
    "ELSE list_transform(range(1, len({toks}) - 1), "
    "i -> {toks}[i] || ' ' || {toks}[i+1] || ' ' || {toks}[i+2]) END"
)


def _sql_minhash(i: int) -> str:
    a, b = MINHASH_PARAMS[i]
    h = SQL_HASH60.format(expr="s")
    return (
        f"coalesce(list_min(list_transform(sh, s -> "
        f"({a} * ({h} % {MINHASH_P}) + {b}) % {MINHASH_P})), {MINHASH_P}) AS mh_{i}"
    )


_SQL_SIGNATURES = f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKS.format(src='text')} AS t FROM documents),
    sh AS (
      SELECT doc_id, {SQL_SHINGLES.format(toks='t')} AS sh FROM toks),
    sig AS (
      SELECT doc_id, {', '.join(_sql_minhash(i) for i in range(len(MINHASH_PARAMS)))}
      FROM sh)
"""


@register(
    "dedup_exact_normalized",
    tags=("dedup",),
    oracle="""
    WITH keyed AS (
      SELECT doc_id, lang, source, n_chars,
             substring(lower(text), 1, 30) AS k,
             ROW_NUMBER() OVER (PARTITION BY substring(lower(text), 1, 30)
                                ORDER BY doc_id) AS rn
      FROM documents)
    SELECT doc_id, lang, source, n_chars FROM keyed WHERE rn = 1
    """,
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a normalized content key (prefix-30 of lowered text),
    deterministic survivor = smallest doc_id."""
    docs = (
        Catalog(spark, sf_dir)
        .table("documents")
        .withColumn("k", F.substring(F.lower("text"), 1, 30))
    )
    out = dedup.exact_dedup(docs, keys=["k"], tie_breakers=[F.col("doc_id")])
    return out.select("doc_id", "lang", "source", "n_chars")


@register(
    "dedup_latest_event_per_user",
    tags=("dedup",),
    oracle="""
    SELECT event_id, user_id, event_type, value FROM (
      SELECT event_id, user_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
    """,
)
def dedup_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins compaction (CDC shape): newest event per user."""
    ev = Catalog(spark, sf_dir).table("events")
    out = dedup.latest_wins_dedup(
        ev, keys=["user_id"], ts_col="ts", tie_breakers=[F.col("event_id").desc()]
    )
    return out.select("event_id", "user_id", "event_type", "value")


@register(
    "dedup_minhash_signatures",
    tags=("dedup", "minhash"),
    oracle=_SQL_SIGNATURES + "SELECT * FROM sig",
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    return dedup.minhash_signatures(docs, "doc_id", "text")


@register(
    "dedup_minhash_lsh_pairs",
    headline=True,
    tags=("dedup", "minhash", "lsh"),
    oracle=_SQL_SIGNATURES
    + """
    , bands AS (
      SELECT doc_id, b AS band_id,
             CASE b
               WHEN 0 THEN mh_0 || '_' || mh_1
               WHEN 1 THEN mh_2 || '_' || mh_3
               WHEN 2 THEN mh_4 || '_' || mh_5
               ELSE mh_6 || '_' || mh_7 END AS band_key,
             mh_0, mh_1, mh_2, mh_3, mh_4, mh_5, mh_6, mh_7
      FROM sig, unnest([0,1,2,3]) AS u(b))
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           (CASE WHEN a.mh_0=b.mh_0 THEN 1 ELSE 0 END +
            CASE WHEN a.mh_1=b.mh_1 THEN 1 ELSE 0 END +
            CASE WHEN a.mh_2=b.mh_2 THEN 1 ELSE 0 END +
            CASE WHEN a.mh_3=b.mh_3 THEN 1 ELSE 0 END +
            CASE WHEN a.mh_4=b.mh_4 THEN 1 ELSE 0 END +
            CASE WHEN a.mh_5=b.mh_5 THEN 1 ELSE 0 END +
            CASE WHEN a.mh_6=b.mh_6 THEN 1 ELSE 0 END +
            CASE WHEN a.mh_7=b.mh_7 THEN 1 ELSE 0 END) AS n_matching_hashes
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    # min_agreement=0 keeps every candidate (the oracle has no bar) while
    # going through the persisted-signature path: the LSH self-join scans
    # the signature table twice, hashing the corpus once instead of twice
    return dedup.minhash_dedup_pairs(docs, "doc_id", "text", min_agreement=0)


@register(
    "dedup_lsh_index_probe",
    headline=True,
    tags=("dedup", "minhash", "lsh", "index", "incremental"),
    oracle=_SQL_SIGNATURES
    + """
    , bands AS (
      SELECT doc_id, b AS band_id,
             CASE b
               WHEN 0 THEN mh_0 || '_' || mh_1
               WHEN 1 THEN mh_2 || '_' || mh_3
               WHEN 2 THEN mh_4 || '_' || mh_5
               ELSE mh_6 || '_' || mh_7 END AS band_key,
             mh_0, mh_1, mh_2, mh_3, mh_4, mh_5, mh_6, mh_7
      FROM sig, unnest([0,1,2,3]) AS u(b))
    SELECT DISTINCT a.doc_id AS batch_id, b.doc_id AS corpus_id,
           (CASE WHEN a.mh_0=b.mh_0 THEN 1 ELSE 0 END +
            CASE WHEN a.mh_1=b.mh_1 THEN 1 ELSE 0 END +
            CASE WHEN a.mh_2=b.mh_2 THEN 1 ELSE 0 END +
            CASE WHEN a.mh_3=b.mh_3 THEN 1 ELSE 0 END +
            CASE WHEN a.mh_4=b.mh_4 THEN 1 ELSE 0 END +
            CASE WHEN a.mh_5=b.mh_5 THEN 1 ELSE 0 END +
            CASE WHEN a.mh_6=b.mh_6 THEN 1 ELSE 0 END +
            CASE WHEN a.mh_7=b.mh_7 THEN 1 ELSE 0 END) AS n_matching_hashes
    FROM bands a
    JOIN documents da ON a.doc_id = da.doc_id AND da.source = 'src0'
    JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
    JOIN documents db ON b.doc_id = db.doc_id AND db.source <> 'src0'
    """,
)
def dedup_lsh_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash dedup against a PERSISTED LSH index
    (``operators/dedup.py:write_lsh_index`` / ``probe_lsh_index``): the
    already-ingested corpus (``source <> 'src0'``) is indexed once as a
    banded-signature catalog table; the arriving batch (``src0``) is then
    probed against the index without touching corpus text — the 100 TB
    ingest shape, where re-hashing the corpus per batch is the cost being
    avoided. Values checked: every (batch, corpus) candidate pair with
    its exact signature agreement.
    """
    import shutil
    import tempfile

    docs = Catalog(spark, sf_dir).table("documents")
    corpus = docs.filter(F.col("source") != "src0")
    batch = docs.filter(F.col("source") == "src0")
    idx_root = tempfile.mkdtemp(prefix="lsh_index_")
    idx_cat = Catalog(spark, idx_root)
    dedup.write_lsh_index(idx_cat, "corpus_lsh", corpus, "doc_id", "text")
    out = dedup.probe_lsh_index(idx_cat, "corpus_lsh", batch, "doc_id", "text")
    # materialize before the temp index directory disappears
    out = out.localCheckpoint(eager=True)
    shutil.rmtree(idx_root, ignore_errors=True)
    return out


@register(
    "dedup_simhash",
    tags=("dedup", "simhash"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_distinct({SQL_TOKS.format(src='text')}) AS t
      FROM documents),
    hashed AS (
      SELECT doc_id,
             list_transform(t, s -> {SQL_HASH60.format(expr='s')}) AS hs
      FROM toks)
    SELECT doc_id,
           CAST({' + '.join(
               f"(CASE WHEN list_sum(list_transform(hs, h -> ((h >> {b}) & 1) * 2 - 1)) > 0 "
               f"THEN {2**b} ELSE 0 END)"
               for b in range(dedup.SIMHASH_BITS)
           )} AS BIGINT) AS simhash
    FROM hashed
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    return dedup.simhash(docs, "doc_id", "text")


# the engine finds candidates via 4x15-bit band buckets (no all-pairs
# join); the oracle may brute-force all pairs because banding recall at
# Hamming <= SIMHASH_BANDS-1 is exactly 1.0 (pigeonhole) — the two
# computations provably produce the same row set.
@register(
    "dedup_simhash_band_pairs",
    headline=True,
    tags=("dedup", "simhash", "banding"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_distinct({SQL_TOKS.format(src='text')}) AS t
      FROM documents),
    hashed AS (
      SELECT doc_id,
             list_transform(t, s -> {SQL_HASH60.format(expr='s')}) AS hs
      FROM toks),
    s AS (
      SELECT doc_id,
             CAST({' + '.join(
                 f"(CASE WHEN list_sum(list_transform(hs, h -> ((h >> {b}) & 1) * 2 - 1)) > 0 "
                 f"THEN {2**b} ELSE 0 END)"
                 for b in range(dedup.SIMHASH_BITS)
             )} AS BIGINT) AS simhash
      FROM hashed)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def dedup_simhash_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    return dedup.simhash_band_pairs(docs, "doc_id", "text", max_hamming=3)


@register(
    "dedup_ngram_jaccard_pairs",
    tags=("dedup", "jaccard"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, lang, {SQL_TOKS.format(src='text')} AS t FROM documents),
    sh AS (
      SELECT doc_id, source, lang,
             list_distinct({SQL_SHINGLES.format(toks='t')}) AS sh
      FROM toks),
    sizes AS (SELECT doc_id, len(sh) AS n FROM sh),
    expl AS (SELECT doc_id, source, lang, unnest(sh) AS s FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM expl a JOIN expl b
        ON a.source = b.source AND a.lang = b.lang AND a.s = b.s
       AND a.doc_id < b.doc_id
      GROUP BY id_a, id_b)
    SELECT id_a, id_b, n_inter,
           CAST(sa.n AS INTEGER) AS n_a,
           CAST(sb.n AS INTEGER) AS n_b,
           CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    """,
)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    return dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", block_cols=("source", "lang"), shingle_size=3
    )


@register(
    "dedup_connected_components",
    tags=("dedup", "clustering", "iterative"),
    oracle=f"""
    WITH lsh AS ({REGISTRY["dedup_minhash_lsh_pairs"].oracle}),
    pairs AS (SELECT id_a, id_b FROM lsh WHERE n_matching_hashes >= 4),
    edges2 AS (SELECT id_a AS a, id_b AS b FROM pairs
               UNION SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT a AS node FROM edges2)
    , reach AS (
      WITH RECURSIVE r(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.b, r.label FROM r JOIN edges2 e ON e.a = r.node
      ) SELECT * FROM r)
    SELECT node, MIN(label) AS component FROM reach GROUP BY node
    """,
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → dedup clusters: connected components with the min
    doc_id as canonical representative. Iterative min-label propagation in
    Spark; the oracle reaches the same fixpoint with a recursive CTE (the
    component minimum is algorithm-independent)."""
    docs = Catalog(spark, sf_dir).table("documents")
    pairs = dedup.minhash_dedup_pairs(docs, "doc_id", "text", min_agreement=4)
    return dedup.connected_components(pairs, "id_a", "id_b")


@register(
    "dedup_line_level",
    tags=("dedup", "text"),
    oracle="""
    WITH t AS (
      SELECT doc_id,
             regexp_replace(text, ' (table|value) ', chr(10), 'g') AS text2
      FROM documents),
    l AS (
      SELECT doc_id, u.line AS line, u.pos AS pos
      FROM t, UNNEST(list_transform(string_split(text2, chr(10)),
                                    (x, i) -> {'line': x, 'pos': i})) AS s(u)),
    h AS (
      SELECT doc_id, pos, line,
             CAST(('0x' || substring(md5(lower(trim(line))), 1, 15)) AS BIGINT) AS hh
      FROM l),
    kept AS (
      SELECT doc_id, pos, line FROM h
      QUALIFY ROW_NUMBER() OVER (PARTITION BY hh ORDER BY doc_id, pos) = 1),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_lines_kept,
             string_agg(line, chr(10) ORDER BY pos) AS text_kept
      FROM kept GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(len(string_split(t.text2, chr(10))) AS INTEGER) AS n_lines,
           CAST(COALESCE(a.n_lines_kept, 0) AS BIGINT) AS n_lines_kept,
           COALESCE(a.text_kept, '') AS text_kept
    FROM t LEFT JOIN agg a USING (doc_id)
    """,
)
def dedup_line_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level exact dedup (``operators/dedup.py:line_dedup``).

    The synthetic corpus has no newlines, so the query deterministically
    manufactures multi-line documents first (every ``' table '``/
    ``' value '`` becomes a line break — identical regex in both engines),
    then keeps each normalized line's globally-first occurrence and
    reassembles the documents.
    """
    docs = Catalog(spark, sf_dir).table("documents")
    multi = docs.select(
        "doc_id",
        F.regexp_replace("text", " (table|value) ", "\n").alias("text2"),
    )
    return dedup.line_dedup(multi, "doc_id", "text2")


@register(
    "dedup_incremental_batch",
    tags=("dedup",),
    oracle="""
    WITH b AS (
      SELECT doc_id, lang, source, n_chars,
             CAST(('0x' || substring(md5(lower(trim(substring(lower(text), 1, 30)))), 1, 15))
                  AS BIGINT) AS hh
      FROM documents WHERE source = 'src0'),
    c AS (
      SELECT DISTINCT
             CAST(('0x' || substring(md5(lower(trim(substring(lower(text), 1, 30)))), 1, 15))
                  AS BIGINT) AS hh
      FROM documents WHERE source <> 'src0')
    SELECT doc_id, lang, source, n_chars
    FROM b WHERE hh NOT IN (SELECT hh FROM c)
    QUALIFY ROW_NUMBER() OVER (PARTITION BY hh ORDER BY doc_id) = 1
    """,
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup (``operators/dedup.py:incremental_dedup``):
    treat ``source='src0'`` as the newly-arriving batch and every other
    source as the already-ingested corpus; admit only batch docs whose
    normalized content key (prefix-30 of lowered text, the same key as
    ``dedup_exact_normalized``) is unseen, deduping within the batch too.
    """
    docs = Catalog(spark, sf_dir).table("documents").withColumn(
        "k", F.substring(F.lower("text"), 1, 30)
    )
    batch = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0")
    out = dedup.incremental_dedup(corpus, batch, "doc_id", "k")
    return out.select("doc_id", "lang", "source", "n_chars")


@register(
    "dedup_components_star_chain",
    tags=("dedup", "clustering", "iterative", "large-star-small-star"),
    oracle="""
    SELECT doc_id AS node,
           MIN(doc_id) OVER (PARTITION BY lang) AS component
    FROM documents
    """,
)
def dedup_components_star_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase connected components (large-star/small-star,
    ``operators/dedup.py:connected_components_star``) on a LONG-CHAIN
    graph: consecutive doc ids within each language form one path per
    language — diameter ≈ docs/langs (≈1000 at sf0.1), where min-label
    propagation would need diameter rounds and this converges in
    O(log n). Each language's chain is one component with the language's
    min doc_id as representative, which the oracle states directly (the
    component of a path is algorithm-independent).

    The chain edges come from the distributed rank operator (global row
    number over (lang, doc_id)) + a self-equi-join on (lang, rn−1) —
    a lag() window per lang would push each language's whole corpus
    through one task (operators/ranks.py module doc).
    """
    from agol_pandas_spark.operators.ranks import add_global_ranks

    docs = Catalog(spark, sf_dir).table("documents").select("doc_id", "lang")
    ranked = add_global_ranks(
        docs, ["lang", "doc_id"], unique=True, row_number_col="rn"
    )
    nxt = ranked.select(
        F.col("lang").alias("__l"),
        (F.col("rn") - 1).alias("__rn"),
        F.col("doc_id").alias("cur_id"),
    )
    edges = ranked.join(
        nxt, (F.col("lang") == F.col("__l")) & (F.col("rn") == F.col("__rn"))
    ).select(F.col("cur_id").alias("doc_id"), F.col("doc_id").alias("prev_id"))
    return dedup.connected_components_star(edges, "doc_id", "prev_id")


@register(
    "dedup_triangle_cohesion",
    tags=("dedup", "graph", "triangles"),
    oracle="""
    WITH nbr AS (
      SELECT doc_id, lang,
             LEAD(doc_id, 1) OVER w AS n1,
             LEAD(doc_id, 2) OVER w AS n2
      FROM documents
      WINDOW w AS (PARTITION BY lang ORDER BY doc_id)),
    edges AS (
      SELECT doc_id AS a, n1 AS b FROM nbr WHERE n1 IS NOT NULL
      UNION
      SELECT doc_id AS a, n2 AS b FROM nbr WHERE n2 IS NOT NULL),
    ab AS (SELECT a, b FROM edges),
    tri AS (
      SELECT x.a, x.b, y.b AS c
      FROM ab x JOIN ab y ON x.a = y.a AND x.b < y.b
      JOIN ab z ON z.a = x.b AND z.b = y.b),
    verts AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri)
    SELECT node, COUNT(*) AS n_triangles FROM verts GROUP BY node
    """,
)
def dedup_triangle_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counts (``operators/dedup.py:triangle_count``) over a
    deterministic 2-neighbor graph (each doc linked to the next two doc
    ids in its language): interior vertices close exactly 3 triangles —
    the cohesion signal that separates dense dup clusters from
    transitive chains. Per-vertex counts are value-checked against a
    three-way self-join oracle.

    The 2-neighbor edges come from the distributed rank operator +
    self-equi-joins on (lang, rn+1) and (lang, rn+2) — per-lang lead()
    windows would single-task each language (operators/ranks.py).
    """
    from agol_pandas_spark.operators.ranks import add_global_ranks

    docs = Catalog(spark, sf_dir).table("documents").select("doc_id", "lang")
    ranked = add_global_ranks(
        docs, ["lang", "doc_id"], unique=True, row_number_col="rn"
    )

    def lead_join(k: int):
        succ = ranked.select(
            F.col("lang").alias("__l"),
            (F.col("rn") - k).alias("__rn"),
            F.col("doc_id").alias(f"n{k}"),
        )
        return succ

    nbr = (
        ranked.join(
            lead_join(1),
            (F.col("lang") == F.col("__l")) & (F.col("rn") == F.col("__rn")),
            "left",
        )
        .drop("__l", "__rn")
        .join(
            lead_join(2),
            (F.col("lang") == F.col("__l")) & (F.col("rn") == F.col("__rn")),
            "left",
        )
        .select("doc_id", "n1", "n2")
    )
    edges = (
        nbr.filter(F.col("n1").isNotNull()).select(
            F.col("doc_id").alias("a"), F.col("n1").alias("b")
        )
        .unionByName(
            nbr.filter(F.col("n2").isNotNull()).select(
                F.col("doc_id").alias("a"), F.col("n2").alias("b")
            )
        )
        .distinct()
    )
    return dedup.triangle_count(edges, "a", "b")


# exact scaled-cosine CTE over (qid, qv, cid, cv) pairs — the embeddings
# twin of similarity_queries._sql_pair_cosine, inlined here because the
# semantic-prune oracle composes it twice (assignment, then in-cell pairs)
_SQL_EMB_NORMS = """
    norms AS (
      SELECT vec_id, sqrt(CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                                       * 1000000000) AS BIGINT)) AS DOUBLE)
                   / 1000000000.0) AS nrm
      FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)
      GROUP BY vec_id)
"""


@register(
    "dedup_semantic_prune",
    # off-headline since r8 (VERDICT r7 item 7): the IVF BUILD here is the
    # textbook N^1.5 one-time cost (sqrt-N pivots) that the persisted-index
    # path amortizes — the headline slot now grades the probe-side number
    # users pay at scale (sim_ivfpq_index_probe); this build variant stays
    # registry-tracked and sf1-soaked off-headline.
    tags=("dedup", "semantic", "similarity", "ann"),
    oracle=f"""
    WITH apairs AS (
      SELECT c.vec_id AS qid, c.embedding AS qv, p.vec_id AS cid, p.embedding AS cv
      FROM embeddings c JOIN embeddings p ON p.vec_id % 50 = 0),
    {_SQL_EMB_NORMS},
    adots AS (
      SELECT p.qid, p.cid,
             SUM(CAST(round(CAST(qx AS DOUBLE) * CAST(cx AS DOUBLE)
                            * 1000000000) AS BIGINT)) AS ds
      FROM (SELECT qid, cid, unnest(qv) AS qx, unnest(cv) AS cx FROM apairs) p
      GROUP BY p.qid, p.cid),
    acos AS (
      SELECT d.qid, d.cid,
             (CAST(d.ds AS DOUBLE) / 1000000000.0) / (nq.nrm * nc.nrm) AS cosine
      FROM adots d JOIN norms nq ON nq.vec_id = d.qid
                   JOIN norms nc ON nc.vec_id = d.cid),
    cellmap AS (
      SELECT qid AS vec_id, cid AS cell FROM (
        SELECT qid, cid,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rn
        FROM acos) WHERE rn = 1),
    cpairs AS (
      SELECT a.vec_id AS qid, ea.embedding AS qv, b.vec_id AS cid, eb.embedding AS cv
      FROM cellmap a JOIN cellmap b ON a.cell = b.cell AND a.vec_id < b.vec_id
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id),
    cdots AS (
      SELECT p.qid, p.cid,
             SUM(CAST(round(CAST(qx AS DOUBLE) * CAST(cx AS DOUBLE)
                            * 1000000000) AS BIGINT)) AS ds
      FROM (SELECT qid, cid, unnest(qv) AS qx, unnest(cv) AS cx FROM cpairs) p
      GROUP BY p.qid, p.cid),
    dropped AS (
      SELECT DISTINCT d.cid AS vec_id
      FROM cdots d JOIN norms nq ON nq.vec_id = d.qid
                   JOIN norms nc ON nc.vec_id = d.cid
      WHERE (CAST(d.ds AS DOUBLE) / 1000000000.0) / (nq.nrm * nc.nrm) >= 0.25)
    SELECT m.vec_id, m.cell, (dr.vec_id IS NULL) AS keep
    FROM cellmap m LEFT JOIN dropped dr ON dr.vec_id = m.vec_id
    """,
)
def dedup_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic pruning over the embeddings corpus:
    nearest-pivot cells (pivots = every 50th vector), then within each
    cell drop any vector with a lower-id neighbor at cosine >= 0.25
    (greedy first-wins). Cell assignment is the Arrow map stage, the
    candidate join is a cell equi-join — never all-pairs across cells —
    and every keep/drop decision is exact-cosine value-checked."""
    from agol_pandas_spark.operators import similarity

    emb = Catalog(spark, sf_dir).table("embeddings")
    pivots = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("pivot_id"), "embedding"
    )
    out = similarity.semantic_dedup_prune(
        emb, pivots, "vec_id", "pivot_id", threshold=0.25
    )
    return out.select("vec_id", "cell", "keep")


# Winnowing CTE chain shared by the fingerprint + pair queries; mirrors
# dedup.winnow_fingerprints (shingle=3, window=4, packed hash<<20 | ~pos).
_SQL_WINNOW_FP = f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKS.format(src='text')} AS t FROM documents),
    sh AS (
      SELECT doc_id, {SQL_SHINGLES.format(toks='t')} AS sh FROM toks),
    keys AS (
      SELECT doc_id,
             list_transform(sh, (s, i) ->
               ({SQL_HASH60.format(expr='s')} % 1099511627776) * 1048576
               + (1048575 - (i - 1))) AS ks
      FROM sh),
    wins AS (
      SELECT doc_id,
             CASE WHEN len(ks) = 0 THEN []
                  WHEN len(ks) < 4 THEN [list_min(ks)]
                  ELSE list_transform(range(1, len(ks) - 2),
                                      i -> list_min(ks[i:i+3]))
             END AS ws
      FROM keys),
    fp AS (SELECT doc_id, unnest(list_distinct(ws)) AS p FROM wins)
"""


@register(
    "dedup_winnow_fingerprints",
    tags=("dedup", "winnow"),
    oracle=_SQL_WINNOW_FP
    + """
    SELECT doc_id, p // 1048576 AS fp_hash,
           CAST(1048575 - (p % 1048576) AS INTEGER) AS fp_pos
    FROM fp
    """,
)
def dedup_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprint selection: window-min over the shingle
    hash sequence with rightmost tie-break, ~2/(w+1) of shingles kept.
    Pure map stage (no shuffle); every selected (hash, pos) value-checked."""
    docs = Catalog(spark, sf_dir).table("documents")
    return dedup.winnow_fingerprints(docs, "doc_id", "text")


@register(
    "dedup_winnow_shared_pairs",
    headline=True,
    tags=("dedup", "winnow"),
    oracle=_SQL_WINNOW_FP
    + """
    , hs AS (SELECT DISTINCT doc_id, p // 1048576 AS fp_hash FROM fp)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
    FROM hs a JOIN hs b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= 2
    """,
)
def dedup_winnow_shared_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidates from shared winnowing fingerprints (>= 2
    shared hashes): fingerprint-hash equi-join, never all-pairs."""
    from agol_pandas_spark.operators.chunking import spread_small_scan

    docs = Catalog(spark, sf_dir).table("documents")
    # spread the one-file corpus scan so the Arrow winnowing kernel
    # parallelizes (no-op decision at real scale — r11, guide §2.5)
    fps = dedup.winnow_fingerprints(spread_small_scan(docs), "doc_id", "text")
    return dedup.winnow_shared_pairs(fps, "doc_id", min_shared=2)


@register(
    "dedup_jaccard_prefix_pairs",
    tags=("dedup", "jaccard", "prefix-filter"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKS.format(src='text')} AS t FROM documents),
    sh AS (
      SELECT doc_id, {SQL_SHINGLES.format(toks='t')} AS sh FROM toks),
    sets AS (
      SELECT doc_id,
             list_distinct(list_transform(sh, s -> {SQL_HASH60.format(expr='s')}))
                 AS hs
      FROM sh),
    ex AS (SELECT doc_id, unnest(hs) AS h FROM sets),
    sizes AS (SELECT doc_id, len(hs) AS n FROM sets),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT id_a, id_b, n_inter,
           CAST(sa.n AS INTEGER) AS n_a, CAST(sb.n AS INTEGER) AS n_b,
           CAST(n_inter * 1000000 // (sa.n + sb.n - n_inter) AS BIGINT)
               AS jaccard_ppm
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE 2 * n_inter >= sa.n + sb.n - n_inter
    """,
)
def dedup_jaccard_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unblocked exact Jaccard >= 1/2 similarity join via prefix filtering
    (PPJoin family): the engine runs the frequency-ordered prefix join;
    the oracle brute-forces every token-sharing pair. Equal outputs prove
    the prefix filter is lossless, and every count is integer-exact."""
    docs = Catalog(spark, sf_dir).table("documents")
    return dedup.jaccard_prefix_pairs(docs, "doc_id", "text")


@register(
    "pipeline_dedup_survivorship",
    tags=("pipeline", "dedup", "clustering", "survivorship"),
    oracle=f"""
    WITH lsh AS ({REGISTRY["dedup_minhash_lsh_pairs"].oracle}),
    pairs AS (SELECT id_a, id_b FROM lsh WHERE n_matching_hashes >= 4),
    edges2 AS (SELECT id_a AS a, id_b AS b FROM pairs
               UNION SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT a AS node FROM edges2)
    , reach AS (
      WITH RECURSIVE r(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.b, r.label FROM r JOIN edges2 e ON e.a = r.node
      ) SELECT * FROM r),
    comps AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node),
    members AS (
      SELECT c.component, d.doc_id, d.n_chars
      FROM comps c JOIN documents d ON d.doc_id = c.node),
    ranked AS (
      SELECT component, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY component
                                ORDER BY n_chars DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY component) AS n_members
      FROM members)
    SELECT component, doc_id AS survivor_doc_id,
           CAST(n_members AS BIGINT) AS n_members,
           n_chars AS survivor_chars
    FROM ranked WHERE rn = 1
    """,
)
def pipeline_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity-resolution survivorship over the dedup stack:
    MinHash-LSH near-dup pairs → connected components → one golden record
    per cluster (longest document wins, ties to the smallest id). The
    full pipeline — signature map, banded join, iterative CC, survivor
    window — value-checked as one composed plan against a recursive-CTE
    + window oracle."""
    from pyspark.sql import Window

    docs = Catalog(spark, sf_dir).table("documents")
    pairs = dedup.minhash_dedup_pairs(docs, "doc_id", "text", min_agreement=4)
    comps = dedup.connected_components(pairs, "id_a", "id_b")
    members = comps.join(
        docs.select("doc_id", "n_chars"),
        comps["node"] == F.col("doc_id"),
    ).select("component", "doc_id", "n_chars")
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    wc = Window.partitionBy("component")
    return (
        members.withColumn("rn", F.row_number().over(w))
        .withColumn("n_members", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("survivor_doc_id"),
            "n_members",
            F.col("n_chars").alias("survivor_chars"),
        )
    )


@register(
    "pipeline_incremental_ingest",
    tags=("pipeline", "dedup", "quality", "merge", "incremental"),
    oracle=f"""
    WITH probe AS ({REGISTRY["dedup_lsh_index_probe"].oracle}),
    dups AS (SELECT DISTINCT batch_id AS doc_id FROM probe
             WHERE n_matching_hashes >= 4),
    gate AS (SELECT doc_id FROM ({REGISTRY["text_gopher_rules_filter"].oracle}) g WHERE g.pass_gopher),
    admitted AS (
      SELECT d.doc_id, d.source, d.n_chars FROM documents d
      WHERE d.source = 'src0'
        AND d.doc_id NOT IN (SELECT doc_id FROM dups)
        AND d.doc_id IN (SELECT doc_id FROM gate)),
    final AS (
      SELECT doc_id, source, n_chars FROM documents WHERE source <> 'src0'
      UNION ALL SELECT doc_id, source, n_chars FROM admitted)
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM final GROUP BY source
    """,
)
def pipeline_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The operational 100 TB ingest loop in one composed run: the
    standing corpus is indexed once (banded LSH signatures in a catalog
    table); an arriving batch is probed against the INDEX (no corpus
    re-hash), near-duplicates at >= 4 matching MinHash values are
    dropped, survivors pass the Gopher quality gate, and the admitted
    rows merge into the corpus table through the keyed insert mode. The
    final per-source corpus accounting is value-checked against an
    oracle that recomputes probe, gate, and merge from first principles.
    """
    import tempfile

    from agol_pandas_spark.operators import textops
    from agol_pandas_spark.operators.merge import merge

    docs = Catalog(spark, sf_dir).table("documents")
    cols = ["doc_id", "text", "source", "n_chars"]
    corpus = docs.filter(F.col("source") != "src0").select(*cols)
    batch = docs.filter(F.col("source") == "src0").select(*cols)

    state = Catalog(spark, tempfile.mkdtemp(prefix="ingest_state_"))
    state.write(corpus, "corpus")
    dedup.write_lsh_index(state, "corpus_lsh", corpus, "doc_id", "text")

    fresh = dedup.dedup_against_lsh_index(
        state, "corpus_lsh", batch, "doc_id", "text", min_agreement=4
    )
    passed = (
        textops.gopher_quality_flags(fresh, "doc_id", "text")
        .filter(F.col("pass_gopher"))
        .select("doc_id")
    )
    admitted = fresh.join(passed, "doc_id", "left_semi")
    merged = merge(
        state.table("corpus"), admitted, mode="insert", key="doc_id"
    )
    return merged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "graph_pagerank_neardup",
    tags=("graph", "pagerank", "dedup"),
    oracle=f"""
    WITH lsh AS ({REGISTRY["dedup_minhash_lsh_pairs"].oracle}),
    pairs AS (SELECT id_a, id_b FROM lsh WHERE n_matching_hashes >= 4),
    edges2 AS (SELECT id_a AS a, id_b AS b FROM pairs
               UNION SELECT id_b, id_a FROM pairs),
    deg AS (SELECT a, COUNT(*) AS d FROM edges2 GROUP BY a),
    r1 AS (
      SELECT e.b AS node,
             CAST(150000000000 + (17 * SUM(1000000000000 // dg.d)) // 20
                  AS BIGINT) AS r
      FROM edges2 e JOIN deg dg ON dg.a = e.a GROUP BY e.b),
    r2 AS (
      SELECT e.b AS node,
             CAST(150000000000 + (17 * SUM(r1.r // dg.d)) // 20
                  AS BIGINT) AS r
      FROM edges2 e JOIN deg dg ON dg.a = e.a
                    JOIN r1 ON r1.node = e.a
      GROUP BY e.b)
    SELECT node, r AS rank_scaled FROM r2
    """,
)
def graph_pagerank_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact PageRank (2 unrolled iterations, damping 17/20) on
    the MinHash near-dup graph: high-rank nodes are boilerplate template
    hubs. Every rank is a scaled long — bit-reproducible, value-checked
    against the SQL unroll."""
    docs = Catalog(spark, sf_dir).table("documents")
    pairs = dedup.minhash_dedup_pairs(docs, "doc_id", "text", min_agreement=4)
    return dedup.pagerank_scaled(pairs, "id_a", "id_b", iterations=2)


@register(
    "graph_common_neighbor_jaccard",
    tags=("graph", "similarity", "dedup"),
    oracle=f"""
    WITH shp AS ({REGISTRY["dedup_simhash_band_pairs"].oracle}),
    pairs AS (SELECT id_a, id_b FROM shp),
    e2 AS (SELECT id_a AS a, id_b AS b FROM pairs
           UNION SELECT id_b, id_a FROM pairs),
    deg AS (SELECT a, COUNT(*) AS d FROM e2 GROUP BY a),
    common AS (
      SELECT l.a AS id_a, r.a AS id_b, COUNT(*) AS n_common
      FROM e2 l JOIN e2 r ON l.b = r.b AND l.a < r.a
      GROUP BY l.a, r.a
      HAVING COUNT(*) >= 2)
    SELECT c.id_a, c.id_b, c.n_common, du.d AS deg_a, dv.d AS deg_b,
           c.n_common * 1000000 // (du.d + dv.d - c.n_common) AS jaccard_ppm
    FROM common c
    JOIN deg du ON du.a = c.id_a
    JOIN deg dv ON dv.a = c.id_b
    """,
)
def graph_common_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the SimHash near-dup graph: exact integer-ppm
    Jaccard of adjacency sets for every vertex pair sharing ≥2 near-dup
    neighbors — template siblings the Hamming-≤3 banding itself never
    paired directly. Wedge-join on the shared neighbor (never
    all-pairs); value-checked against the SQL wedge unroll."""
    docs = Catalog(spark, sf_dir).table("documents")
    pairs = dedup.simhash_band_pairs(docs, "doc_id", "text", max_hamming=3)
    return dedup.common_neighbor_jaccard(pairs, "id_a", "id_b", min_common=2)


@register(
    "dedup_cross_source_matrix",
    tags=("dedup", "audit", "sources"),
    oracle="""
    WITH k AS (
      SELECT source, substring(lower(text), 1, 30) AS k FROM documents),
    cnt AS (
      SELECT source, k, COUNT(*) AS n_docs FROM k GROUP BY source, k)
    SELECT a.source, b.source AS other_source,
           CAST(SUM(a.n_docs) AS BIGINT) AS n_dup_docs,
           COUNT(*) AS n_shared_keys
    FROM cnt a JOIN cnt b ON a.k = b.k AND a.source <> b.source
    GROUP BY a.source, b.source
    """,
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-precedence diagnostic: pairwise duplication matrix over the
    same normalized prefix key the exact-dedup query uses — which crawls
    recycle which. Self equi-join on the collapsed dedup index, never on
    the corpus."""
    docs = Catalog(spark, sf_dir).table("documents")
    return dedup.cross_source_dup_matrix(
        docs, "source", F.substring(F.lower(F.col("text")), 1, 30)
    )


@register(
    "dedup_ngram_containment_pairs",
    tags=("dedup", "containment"),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, {SQL_TOKS.format(src='text')} AS t FROM documents),
    sh AS (
      SELECT doc_id, lang,
             list_distinct({SQL_SHINGLES.format(toks='t')}) AS sh
      FROM toks),
    sizes AS (SELECT doc_id, len(sh) AS n FROM sh),
    expl AS (SELECT doc_id, lang, unnest(sh) AS s FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM expl a JOIN expl b
        ON a.lang = b.lang AND a.s = b.s
       AND a.doc_id <> b.doc_id
      GROUP BY id_a, id_b)
    SELECT id_a, id_b, n_inter,
           CAST(sa.n AS INTEGER) AS n_a,
           CAST(sb.n AS INTEGER) AS n_b,
           n_inter * 1000000 // sa.n AS containment_ppm
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE n_inter * 1000000 // sa.n >= 500000
    """,
)
def dedup_ngram_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional shingle containment within language blocks:
    pairs where ≥ half of a's shingles occur in b — cross-source quote-expansion
    / boilerplate-wrapping signal symmetric Jaccard misses. Exact
    integer ppm, same blocked shuffle profile as the Jaccard query."""
    docs = Catalog(spark, sf_dir).table("documents")
    return dedup.ngram_containment_pairs(
        docs,
        "doc_id",
        "text",
        block_cols=("lang",),
        min_containment_ppm=500_000,
    )


# word-5-gram shingles (the ExactSubstr span query uses k=5)
_SQL_GRAMS5 = (
    "CASE WHEN len({toks}) < 5 THEN CAST([] AS VARCHAR[]) "
    "ELSE list_transform(range(1, len({toks}) - 3), "
    "i -> {toks}[i] || ' ' || {toks}[i+1] || ' ' || {toks}[i+2] || ' ' "
    "|| {toks}[i+3] || ' ' || {toks}[i+4]) END"
)


@register(
    "text_substring_dup_spans",
    headline=True,
    tags=("dedup", "text", "substring"),
    oracle=f"""
    WITH t AS (SELECT doc_id, {SQL_TOKS.format(src='text')} AS t FROM documents),
    g AS (SELECT doc_id, CAST(len(t) AS INTEGER) AS n_tokens,
                 {_SQL_GRAMS5.format(toks='t')} AS gs
          FROM t),
    occ AS (SELECT doc_id, unnest(list_transform(gs, (s, i) ->
              struct_pack(pos := i, h := {SQL_HASH60.format(expr='s')}))) AS u
            FROM g),
    o AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM occ),
    dup AS (SELECT h FROM o GROUP BY h HAVING COUNT(*) >= 2),
    d AS (SELECT o.doc_id, o.pos FROM o JOIN dup ON o.h = dup.h),
    isl AS (SELECT doc_id, pos,
              CASE WHEN max(pos) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 5 >= pos
                   THEN 0 ELSE 1 END AS new_isl
            FROM d),
    isl2 AS (SELECT doc_id, pos,
               SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY pos) AS island
             FROM isl),
    spans AS (SELECT doc_id, island, COUNT(*) AS grams,
                MAX(pos) + 4 - MIN(pos) + 1 AS span
              FROM isl2 GROUP BY doc_id, island),
    per AS (SELECT doc_id, CAST(SUM(grams) AS INTEGER) AS n_dup_grams,
              CAST(COUNT(*) AS INTEGER) AS dup_spans,
              CAST(SUM(span) AS INTEGER) AS dup_tokens
            FROM spans GROUP BY doc_id)
    SELECT g.doc_id, g.n_tokens,
           COALESCE(per.n_dup_grams, 0) AS n_dup_grams,
           COALESCE(per.dup_spans, 0) AS dup_spans,
           COALESCE(per.dup_tokens, 0) AS dup_tokens,
           CAST(CASE WHEN g.n_tokens > 0
                THEN CAST(COALESCE(per.dup_tokens, 0) AS BIGINT) * 1000000
                     // g.n_tokens
                ELSE 0 END AS BIGINT) AS dup_ppm
    FROM g LEFT JOIN per ON g.doc_id = per.doc_id
    """,
)
def text_substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup census (Lee et al. 2022) at word granularity:
    corpus-wide duplicated 5-gram spans merged per document into maximal
    runs — the suffix array replaced by one gram-hash shuffle + a
    per-document gaps-and-islands window; never all-pairs, never global."""
    docs = Catalog(spark, sf_dir).table("documents")
    return dedup.substring_dup_spans(docs, "doc_id", "text", k=5, min_count=2)


@register(
    "text_substring_dup_removal",
    tags=("dedup", "text", "substring", "transform"),
    oracle=f"""
    WITH t AS (SELECT doc_id, {SQL_TOKS.format(src='text')} AS t FROM documents),
    g AS (SELECT doc_id, t AS toks, {_SQL_GRAMS5.format(toks='t')} AS gs
          FROM t),
    occ AS (SELECT doc_id, unnest(list_transform(gs, (s, i) ->
              struct_pack(pos := i, h := {SQL_HASH60.format(expr='s')}))) AS u
            FROM g),
    o AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM occ),
    dup AS (
      SELECT h, MIN(struct_pack(doc_id := doc_id, pos := pos)) AS owner
      FROM o GROUP BY h HAVING COUNT(*) >= 2),
    rem AS (
      SELECT o.doc_id, o.pos
      FROM o JOIN dup USING (h)
      WHERE NOT (o.doc_id = dup.owner.doc_id AND o.pos = dup.owner.pos)),
    isl AS (SELECT doc_id, pos,
              CASE WHEN max(pos) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 5 >= pos
                   THEN 0 ELSE 1 END AS new_isl
            FROM rem),
    isl2 AS (SELECT doc_id, pos,
               SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY pos) AS island
             FROM isl),
    spans AS (SELECT doc_id,
                list(struct_pack(s := s, e := e)) AS sp
              FROM (SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + 4 AS e
                    FROM isl2 GROUP BY doc_id, island)
              GROUP BY doc_id),
    cleaned AS (
      SELECT g.doc_id, g.toks,
             list_filter(g.toks, (x, i) ->
               len(list_filter(COALESCE(spans.sp, []),
                               spn -> i >= spn.s AND i <= spn.e)) = 0)
                 AS kept
      FROM g LEFT JOIN spans ON spans.doc_id = g.doc_id)
    SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens,
           CAST(len(toks) - len(kept) AS INTEGER) AS n_removed,
           {SQL_HASH60.format(expr="COALESCE(array_to_string(kept, ' '), '')")}
               AS cleaned_hash
    FROM cleaned
    """,
)
def text_substring_dup_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr removal: duplicated 5-gram runs deleted everywhere
    except the globally-first occurrence (owner = min (doc, pos) per
    gram) — one surviving copy of every duplicated passage. Cleaned text
    is value-checked via its portable hash; corpus text never shuffles."""
    docs = Catalog(spark, sf_dir).table("documents")
    return dedup.substring_dup_removal(docs, "doc_id", "text", k=5, min_count=2)


def _sql_kcore_unroll(k: int, rounds: int) -> str:
    """Unrolled peeling rounds over CTE ``e0`` (symmetric edges)."""
    parts = []
    for i in range(rounds):
        # every e{i}/k{i} is referenced more than once downstream; without
        # MATERIALIZED DuckDB may inline them, re-evaluating the expensive
        # SimHash base once per reference — exponential in the unroll depth
        parts.append(
            f"k{i} AS MATERIALIZED "
            f"(SELECT a FROM e{i} GROUP BY a HAVING COUNT(*) >= {k})"
        )
        parts.append(
            f"e{i + 1} AS MATERIALIZED (SELECT e.a, e.b FROM e{i} e "
            f"JOIN k{i} ka ON ka.a = e.a JOIN k{i} kb ON kb.a = e.b)"
        )
    return ", ".join(parts)


@register(
    "graph_kcore_boilerplate",
    tags=("graph", "kcore", "dedup"),
    oracle=f"""
    WITH shp AS ({REGISTRY["dedup_simhash_band_pairs"].oracle}),
    pairs AS MATERIALIZED (SELECT id_a, id_b FROM shp),
    e0 AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs
           UNION SELECT id_b, id_a FROM pairs),
    {_sql_kcore_unroll(k=2, rounds=6)}
    SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM e6 GROUP BY a
    """,
)
def graph_kcore_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the SimHash near-dup graph (``operators/dedup.kcore``):
    the boilerplate families cohesive enough that every member stays
    tied to ≥2 others even after peeling stragglers. The engine peels
    until stable (edge-count scalar per round, ConvergenceError rather
    than a silent truncation); the oracle unrolls six peeling rounds in
    SQL — both SFs converge in ≤5, so fixpoint == round-6 state."""
    docs = Catalog(spark, sf_dir).table("documents")
    pairs = dedup.simhash_band_pairs(docs, "doc_id", "text", max_hamming=3)
    return dedup.kcore(pairs, "id_a", "id_b", k=2, max_rounds=6)


@register(
    "graph_resource_allocation_links",
    tags=("graph", "link-prediction", "dedup"),
    oracle=f"""
    WITH shp AS ({REGISTRY["dedup_simhash_band_pairs"].oracle}),
    pairs AS (SELECT id_a, id_b FROM shp),
    e2 AS (SELECT id_a AS a, id_b AS b FROM pairs
           UNION SELECT id_b, id_a FROM pairs),
    deg AS (SELECT a AS w, COUNT(*) AS d FROM e2 GROUP BY a),
    weighted AS (
      SELECT e2.b AS w, e2.a AS a, 1000000000000 // deg.d AS wt
      FROM e2 JOIN deg ON deg.w = e2.b)
    SELECT l.a AS id_a, r.a AS id_b,
           CAST(COUNT(*) AS BIGINT) AS n_common,
           CAST(SUM(l.wt) AS BIGINT) AS ra_pico
    FROM weighted l JOIN weighted r ON l.w = r.w AND l.a < r.a
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    """,
)
def graph_resource_allocation_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource-Allocation link prediction on the SimHash near-dup
    graph (``operators/dedup.resource_allocation_links``): common
    neighbors weighted by 1/degree, so a shared neighbor adjacent to
    half the corpus stops outvoting one adjacent to three documents —
    the template-sibling signal Jaccard's flat counting misses. Every
    wedge contributes the exact integer ``10¹² div deg(center)``;
    wedge-join on the shared neighbor, never all-pairs."""
    docs = Catalog(spark, sf_dir).table("documents")
    pairs = dedup.simhash_band_pairs(docs, "doc_id", "text", max_hamming=3)
    return dedup.resource_allocation_links(pairs, "id_a", "id_b", min_common=2)


def _sql_hits_unroll(iterations: int, scale: int) -> str:
    """Unrolled HITS half-steps over CTE ``e`` (a → b directed edges).
    Emits ``h{n}`` / ``a{n}``."""
    parts = ["h0 AS (SELECT DISTINCT a AS node, " f"{scale} AS s FROM e)"]
    for i in range(1, iterations + 1):
        parts.append(
            f"ar{i} AS MATERIALIZED (SELECT b, SUM(s) AS raw "
            f"FROM e JOIN h{i - 1} ON h{i - 1}.node = e.a GROUP BY b)"
        )
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT b AS node, "
            f"(raw * {scale}) // (SELECT MAX(raw) FROM ar{i}) AS s FROM ar{i})"
        )
        parts.append(
            f"hr{i} AS MATERIALIZED (SELECT a, SUM(s) AS raw "
            f"FROM e JOIN a{i} ON a{i}.node = e.b GROUP BY a)"
        )
        parts.append(
            f"h{i} AS MATERIALIZED (SELECT a AS node, "
            f"(raw * {scale}) // (SELECT MAX(raw) FROM hr{i}) AS s FROM hr{i})"
        )
    return ",\n    ".join(parts)


@register(
    "graph_hits_hubs_authorities",
    tags=("graph", "hits", "ranking"),
    oracle=f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey AS a, l.l_suppkey AS b
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
    {_sql_hits_unroll(iterations=2, scale=10**6)}
    SELECT node, 'hub' AS role, CAST(s AS BIGINT) AS score_scaled FROM h2
    UNION ALL
    SELECT node, 'auth' AS role, CAST(s AS BIGINT) AS score_scaled FROM a2
    """,
)
def graph_hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (``operators/dedup.hits_scaled``) on the
    directed customer→supplier purchase graph: hub customers buy from
    many strong suppliers, authority suppliers serve many strong
    customers — mutually recursive, resolved by two exact
    integer-scaled iterations with MAX renormalization (one broadcast
    scalar per half-step), bit-reproducible where float HITS is not.
    The oracle unrolls both iterations in SQL."""
    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem").select("l_orderkey", "l_suppkey")
    orders = cat.table("orders").select("o_orderkey", "o_custkey")
    e = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp")
    )
    return dedup.hits_scaled(e, "cust", "supp", iterations=2, scale=10**6)


@register(
    "pipeline_lsh_index_append",
    tags=("dedup", "lsh", "index", "incremental", "maintenance"),
    oracle=_SQL_SIGNATURES
    + """
    , bands AS (
      SELECT doc_id, b AS band_id,
             CASE b
               WHEN 0 THEN mh_0 || '_' || mh_1
               WHEN 1 THEN mh_2 || '_' || mh_3
               WHEN 2 THEN mh_4 || '_' || mh_5
               ELSE mh_6 || '_' || mh_7 END AS band_key,
             mh_0, mh_1, mh_2, mh_3, mh_4, mh_5, mh_6, mh_7
      FROM sig, unnest([0,1,2,3]) AS u(b))
    SELECT DISTINCT a.doc_id AS batch_id, b.doc_id AS corpus_id,
           (CASE WHEN a.mh_0=b.mh_0 THEN 1 ELSE 0 END +
            CASE WHEN a.mh_1=b.mh_1 THEN 1 ELSE 0 END +
            CASE WHEN a.mh_2=b.mh_2 THEN 1 ELSE 0 END +
            CASE WHEN a.mh_3=b.mh_3 THEN 1 ELSE 0 END +
            CASE WHEN a.mh_4=b.mh_4 THEN 1 ELSE 0 END +
            CASE WHEN a.mh_5=b.mh_5 THEN 1 ELSE 0 END +
            CASE WHEN a.mh_6=b.mh_6 THEN 1 ELSE 0 END +
            CASE WHEN a.mh_7=b.mh_7 THEN 1 ELSE 0 END) AS n_matching_hashes
    FROM bands a
    JOIN documents da ON a.doc_id = da.doc_id
                     AND da.source = 'src0' AND da.doc_id % 8 = 0
    JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
    JOIN documents db ON b.doc_id = db.doc_id
                     AND NOT (db.source = 'src0' AND db.doc_id % 8 = 0)
    """,
)
def pipeline_lsh_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental LSH index MAINTENANCE
    (``operators/dedup.append_lsh_index``): the corpus is indexed once,
    an admitted batch's bands are APPENDED through the ordinary merge
    path — hashed with the index's own stored parameters, so layout
    drift is impossible by construction — and the NEXT batch's probe
    sees corpus and earlier batches alike without any rebuild. Probe
    results are value-checked: every (batch2, corpus ∪ batch1) pair
    with exact signature agreement. Index maintenance costs O(batch),
    never O(corpus)."""
    import shutil
    import tempfile

    docs = Catalog(spark, sf_dir).table("documents")
    corpus = docs.filter(F.col("source") != "src0")
    src0 = docs.filter(F.col("source") == "src0")
    # src0 holds only even doc_ids in this corpus; carve the probe
    # batch as the %8==0 slice (it provably has near-dups at both SFs)
    batch1 = src0.filter(F.col("doc_id") % 8 != 0)
    batch2 = src0.filter(F.col("doc_id") % 8 == 0)

    idx_root = tempfile.mkdtemp(prefix="lsh_append_")
    idx_cat = Catalog(spark, idx_root)
    dedup.write_lsh_index(idx_cat, "corpus_lsh", corpus, "doc_id", "text")
    dedup.append_lsh_index(idx_cat, "corpus_lsh", batch1, "doc_id", "text")
    out = dedup.probe_lsh_index(idx_cat, "corpus_lsh", batch2, "doc_id", "text")
    out = out.localCheckpoint(eager=True)
    shutil.rmtree(idx_root, ignore_errors=True)
    return out
