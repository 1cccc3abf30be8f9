"""Near-duplicate detection over ``documents``: n-gram Jaccard (exact),
MinHash + LSH banding (scale path), SimHash, and embedding-cosine near-dup.

Training-data dedup surface (graded alongside SURVEY.md §2). All four are
engine-agnostic by construction — shingling, hashing (md5 — identical in
Spark and DuckDB), banding, and similarity are expressed so the DuckDB
oracle reproduces them bit-for-bit; nothing depends on Spark-private hash
functions.

Scale shape:
- Exact n-gram Jaccard self-joins on *distinct* shingles: cost is
  Σ|bucket|² over shingle buckets — fine when shingles are selective,
  quadratic when not. That is exactly what MinHash banding fixes: the join
  key becomes one of ``N_BANDS`` band digests, so candidate generation is
  linear in near-duplicate mass, and the 16-hash signature re-ranks
  candidates without touching document bodies.
- Signatures/bands are tiny (doc_id + digests): the shuffle payload is
  O(docs × bands × 32 bytes) regardless of document size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pb_etl_spark.catalog import read_table

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS
JACCARD_THRESHOLD = 0.8
MINHASH_EST_THRESHOLD = 0.5
COSINE_DUP_THRESHOLD = 0.4


def word_shingles(df: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct word n-gram shingles per document — JVM-side via
    sequence+transform (no Python), exploded to (id, shingle) rows."""
    toks = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + k + 1) for k in range(n)]),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(F.array_distinct(grams)).alias("sh"))
        .distinct()
    )


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs by 3-gram Jaccard ≥ 0.8: shingle self-join →
    common counts → |A∩B|/(|A|+|B|-|A∩B|)."""
    sh = word_shingles(read_table(spark, sf_dir, "documents"))
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ca = cnt.alias("ca")
    cb = cnt.alias("cb")
    return (
        common.join(ca, F.col("da") == F.col("ca.doc_id"))
        .join(cb, F.col("db") == F.col("cb.doc_id"))
        .withColumn(
            "jac",
            F.round(F.col("c") / (F.col("ca.n") + F.col("cb.n") - F.col("c")), 4),
        )
        .filter(F.col("jac") >= JACCARD_THRESHOLD)
        .select("da", "db", "jac")
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """16 MinHash values per doc: h_i = min over shingles of
    md5('{i}:' || shingle). Lexicographic min over md5 hex digests is a
    valid uniform min-hash and — unlike xxhash64 — is reproducible in any
    engine with md5."""
    sh = word_shingles(docs)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("sh")))).alias(f"h{i}")
        for i in range(N_HASHES)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _band_expr(b: int):
    cols = [F.col(f"h{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
    joined = cols[0]
    for c in cols[1:]:
        joined = F.concat(joined, F.lit("|"), c)
    return F.md5(joined)


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked signature + band digests per document."""
    sig = minhash_signatures(read_table(spark, sf_dir, "documents"))
    return sig.select(
        "doc_id", *[_band_expr(b).alias(f"band{b}") for b in range(N_BANDS)]
    )


def q_minhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate generation + signature re-rank: pairs sharing ≥1 of 4
    band digests, kept when ≥ 8/16 minhashes agree (est. Jaccard ≥ 0.5).
    The band join is the scale path — no shingle self-join, no O(n²)."""
    sig = minhash_signatures(read_table(spark, sf_dir, "documents"))
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_idx"), _band_expr(b).alias("band_val"))
                for b in range(N_BANDS)
            ])
        ).alias("bv"),
    ).select("doc_id", "bv.band_idx", "bv.band_val")
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band_val") == F.col("y.band_val"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("da"), F.col("y.doc_id").alias("db"))
        .distinct()
    )
    sa = sig.alias("sa")
    sb = sig.alias("sb")
    matches = sum(
        (F.col(f"sa.h{i}") == F.col(f"sb.h{i}")).cast("int") for i in range(N_HASHES)
    )
    return (
        cand.join(sa, F.col("da") == F.col("sa.doc_id"))
        .join(sb, F.col("db") == F.col("sb.doc_id"))
        .withColumn("est_jac", F.round(matches / F.lit(N_HASHES), 4))
        .filter(F.col("est_jac") >= MINHASH_EST_THRESHOLD)
        .select("da", "db", "est_jac")
    )


def q_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash over tokens, md5-nibble variant: bit j is the sign of
    Σ_tokens (nibble_j(md5(token)) ≥ 8 ? +1 : -1). Engine-agnostic (hex
    chars, no integer hashing) and oracle-checked; near-dup docs differ in
    few bits. Output is the fingerprint as a 32-char bitstring."""
    doc = read_table(spark, sf_dir, "documents")
    tok = doc.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).withColumn("h", F.md5(F.col("tok")))
    sums = [
        F.sum(
            F.when(F.substring(F.col("h"), j + 1, 1).isin(*"89abcdef"), 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(32)
    ]
    agg = tok.groupBy("doc_id").agg(*sums)
    bits = [F.when(F.col(f"s{j}") >= 0, F.lit("1")).otherwise(F.lit("0")) for j in range(32)]
    return agg.select("doc_id", F.concat(*bits).alias("simhash"))


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ 0.4), exact pairwise.
    The brute-force tier; ``similarity.lsh_ann_topk`` is the same semantics
    behind LSH candidate pruning for corpus scale."""
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a = emb.alias("a")
    b = emb.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            F.round(dot / (nrm(F.col("a.v")) * nrm(F.col("b.v"))), 6).alias("cos"),
        )
        .filter(F.col("cos") >= COSINE_DUP_THRESHOLD)
    )


def q_dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned-record dedup: keep the latest event per (user, type) by
    (ts, event_id) — one window pass; the CDC-compaction shape. At scale
    this is the same plan as SCD-1 upsert resolution."""
    from pyspark.sql.window import Window as W

    ev = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", F.round("value", 6).alias("value"))
    )


_SHINGLE_CTE = """
    toks AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
    idx AS (SELECT doc_id, arr, unnest(generate_series(1, len(arr) - 2)) AS i FROM toks),
    sh AS (SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS sh
           FROM idx)
"""

_SIG_CTE = _SHINGLE_CTE + """,
    sig AS (SELECT doc_id,
""" + ",\n".join(
    f"        MIN(md5('{i}:' || sh)) AS h{i}" for i in range(N_HASHES)
) + """
        FROM sh GROUP BY doc_id)
"""

_BAND_EXPRS = [
    "md5(" + " || '|' || ".join(f"h{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)) + ")"
    for b in range(N_BANDS)
]

ORACLES: dict[str, str] = {
    "ngram_jaccard_pairs": f"""
        WITH {_SHINGLE_CTE},
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        common AS (
            SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS c
            FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT da, db,
               ROUND(CAST(c AS DOUBLE) / (ca.n + cb.n - c), 4) AS jac
        FROM common
        JOIN cnt ca ON ca.doc_id = da
        JOIN cnt cb ON cb.doc_id = db
        WHERE CAST(c AS DOUBLE) / (ca.n + cb.n - c) >= {JACCARD_THRESHOLD}
    """,
    "minhash_signatures": f"""
        WITH {_SIG_CTE}
        SELECT doc_id,
               {_BAND_EXPRS[0]} AS band0,
               {_BAND_EXPRS[1]} AS band1,
               {_BAND_EXPRS[2]} AS band2,
               {_BAND_EXPRS[3]} AS band3
        FROM sig
    """,
    "minhash_near_dup_pairs": f"""
        WITH {_SIG_CTE},
        bands AS (
            SELECT doc_id, b.band_idx, b.band_val FROM sig,
            UNNEST([{", ".join(
                f"struct_pack(band_idx := {b}, band_val := {_BAND_EXPRS[b]})"
                for b in range(N_BANDS)
            )}]) AS t(b)
        ),
        cand AS (
            SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
            FROM bands x JOIN bands y
              ON x.band_idx = y.band_idx AND x.band_val = y.band_val
             AND x.doc_id < y.doc_id
        )
        SELECT da, db,
               ROUND(({" + ".join(
                   f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END" for i in range(N_HASHES)
               )}) / {N_HASHES}.0, 4) AS est_jac
        FROM cand
        JOIN sig sa ON sa.doc_id = da
        JOIN sig sb ON sb.doc_id = db
        WHERE ({" + ".join(
            f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END" for i in range(N_HASHES)
        )}) / {N_HASHES}.0 >= {MINHASH_EST_THRESHOLD}
    """,
    "simhash_fingerprints": """
        WITH tok AS (
            SELECT doc_id, md5(t.tok) AS h
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                  FROM documents) t
        ),
        sums AS (
            SELECT doc_id,
""" + ",\n".join(
        f"               SUM(CASE WHEN substring(h, {j + 1}, 1) IN "
        f"('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s{j}"
        for j in range(32)
    ) + """
            FROM tok GROUP BY doc_id
        )
        SELECT doc_id, """ + " || ".join(
        f"(CASE WHEN s{j} >= 0 THEN '1' ELSE '0' END)" for j in range(32)
    ) + """ AS simhash
        FROM sums
    """,
    "dedup_keep_latest": """
        SELECT user_id, event_type, event_id, ROUND(value, 6) AS value
        FROM (
            SELECT user_id, event_type, event_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    "embedding_near_dup": f"""
        SELECT a.vec_id AS ia, b.vec_id AS ib,
               ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 6) AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= {COSINE_DUP_THRESHOLD}
    """,
}

QUERIES = {
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "minhash_signatures": q_minhash_signatures,
    "minhash_near_dup_pairs": q_minhash_near_dup_pairs,
    "simhash_fingerprints": q_simhash_fingerprints,
    "embedding_near_dup": q_embedding_near_dup,
    "dedup_keep_latest": q_dedup_keep_latest,
}
