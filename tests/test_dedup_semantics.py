"""Dedup semantics on synthetic planted near-duplicates: MinHash-LSH must
recover what exact Jaccard finds; SimHash fingerprints of near-dups must be
close in Hamming distance; LSH ANN must recall brute-force neighbors."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _corpus(spark, n_base=60, seed=3):
    """Word-salad docs + planted near-duplicates (1-2 word edits)."""
    rng = random.Random(seed)
    vocab = ("spark data table query join filter group sort merge window "
             "stream batch row column key value hash scan agg fast slow").split()
    rows = []
    for i in range(n_base):
        words = [rng.choice(vocab) for _ in range(50)]
        rows.append((i, " ".join(words)))
        if i % 4 == 0:  # plant a near-dup with 2 substitutions
            dup = list(words)
            for _ in range(2):
                dup[rng.randrange(len(dup))] = rng.choice(vocab)
            rows.append((1000 + i, " ".join(dup)))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def docs(spark):
    return _corpus(spark)


def _exact_pairs(spark, docs, threshold=0.5):
    from pb_etl_spark.operators.dedup import word_shingles

    sh = word_shingles(docs)
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    out = (
        common.join(cnt.alias("ca"), F.col("da") == F.col("ca.doc_id"))
        .join(cnt.alias("cb"), F.col("db") == F.col("cb.doc_id"))
        .withColumn("jac", F.col("c") / (F.col("ca.n") + F.col("cb.n") - F.col("c")))
        .filter(F.col("jac") >= threshold)
    )
    return {(r["da"], r["db"]) for r in out.collect()}


def test_planted_dups_found_exact(spark, docs):
    pairs = _exact_pairs(spark, docs)
    planted = {(i, 1000 + i) for i in range(0, 60, 4)}
    assert planted <= pairs


def test_minhash_lsh_recall(spark, docs):
    """LSH banding (4 bands × 4 rows) must recover ≥90% of exact
    high-Jaccard pairs — the standard recall/efficiency trade."""
    from pb_etl_spark.operators import dedup

    sig = dedup.minhash_signatures(docs)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_idx"), dedup._band_expr(b).alias("band_val"))
                for b in range(dedup.N_BANDS)
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
    cand_pairs = {(r["da"], r["db"]) for r in cand.collect()}
    exact = _exact_pairs(spark, docs, threshold=0.8)
    assert exact, "fixture should contain high-jaccard pairs"
    recall = len(exact & cand_pairs) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall:.2f} on {len(exact)} exact pairs"


def test_simhash_near_dups_close(spark, docs):
    # q_simhash_fingerprints reads the documents table; compute the same
    # fingerprint expression directly on the synthetic corpus instead
    tok = docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")) \
        .withColumn("h", F.md5(F.col("tok")))
    sums = [
        F.sum(F.when(F.substring(F.col("h"), j + 1, 1).isin(*"89abcdef"), 1).otherwise(-1)).alias(f"s{j}")
        for j in range(32)
    ]
    agg = tok.groupBy("doc_id").agg(*sums)
    bits = [F.when(F.col(f"s{j}") >= 0, F.lit("1")).otherwise(F.lit("0")) for j in range(32)]
    fp = {r["doc_id"]: r["simhash"] for r in agg.select("doc_id", F.concat(*bits).alias("simhash")).collect()}

    def hamming(a, b):
        return sum(x != y for x, y in zip(a, b))

    rng = random.Random(5)
    planted = [(i, 1000 + i) for i in range(0, 60, 4)]
    dup_dists = [hamming(fp[a], fp[b]) for a, b in planted]
    rand_dists = [
        hamming(fp[rng.randrange(60)], fp[rng.randrange(60)]) for _ in range(50)
    ]
    assert sum(dup_dists) / len(dup_dists) < sum(rand_dists) / max(len(rand_dists), 1)


def test_lsh_ann_recall_vs_brute_force(spark):
    """LSH ANN candidates must recall most brute-force top-5 neighbors on
    clustered vectors (random vectors have no structure to find)."""
    rng = random.Random(9)
    rows = []
    vid = 0
    for cluster in range(10):
        center = [rng.gauss(0, 1) for _ in range(64)]
        for _ in range(20):
            rows.append((vid, [c + rng.gauss(0, 0.15) for c in center]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    from pb_etl_spark.operators.similarity import cosine_topk, lsh_ann_topk

    queries = emb.filter(F.col("vec_id") % 40 == 0)
    exact = cosine_topk(emb, queries, k=5)
    approx = lsh_ann_topk(emb, queries, k=5, n_planes=8, n_tables=6)
    e = {(r["q_id"], r["n_id"]) for r in exact.collect()}
    a = {(r["q_id"], r["n_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, f"ANN recall {recall:.2f}"


def test_ivf_ann_recall_vs_brute_force(spark):
    """IVF ANN (probe 4 of 10 cells on 10-cluster data) must recall most
    brute-force top-5 neighbors: same-cluster neighbors share a cell."""
    rng = random.Random(17)
    rows = []
    vid = 0
    for cluster in range(10):
        center = [rng.gauss(0, 1) for _ in range(64)]
        for _ in range(20):
            rows.append((vid, [c + rng.gauss(0, 0.15) for c in center]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    from pb_etl_spark.operators.similarity import cosine_topk, ivf_ann_topk

    queries = emb.filter(F.col("vec_id") % 40 == 0)
    exact = cosine_topk(emb, queries, k=5)
    approx = ivf_ann_topk(emb, queries, k=5, n_centroids=10, n_probe=4)
    e = {(r["q_id"], r["n_id"]) for r in exact.collect()}
    a = {(r["q_id"], r["n_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, f"IVF recall {recall:.2f}"


def test_embedding_near_dup_lsh_lowt_equals_brute_on_fixture(spark):
    """The low-threshold LSH face (sweep cross-check tier) must be
    value-equal to the brute-force tier at fixture scale (recall 1.0 —
    the property its shared DuckDB oracle relies on), and its plan must
    contain no nested-loop pair join."""
    from tests.conftest import SF_DIR

    from pb_etl_spark.operators.dedup import (
        q_embedding_near_dup,
        q_embedding_near_dup_lsh_lowt,
    )

    lsh = q_embedding_near_dup_lsh_lowt(spark, SF_DIR)
    plan = lsh._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan[:2000]

    brute = {(r["ia"], r["ib"], r["cos"]) for r in q_embedding_near_dup(spark, SF_DIR).collect()}
    got = {(r["ia"], r["ib"], r["cos"]) for r in lsh.collect()}
    assert brute, "fixture should contain near-dup pairs"
    assert got == brute


def test_embedding_near_dup_lsh_production_face(spark):
    """The headline production-regime LSH (16 planes × 8 tables,
    cos ≥ 0.9 over the twin-planted corpus) must find EXACTLY the
    planted near-identical pairs — 100% recall at fixture scale, zero
    false positives (no organic fixture pair exceeds cos 0.61) — with
    every pair at twin-level cosine and no nested-loop join in the
    plan."""
    from tests.conftest import SF_DIR

    from pb_etl_spark.operators.dedup import (
        TWIN_ID_OFFSET,
        TWIN_STRIDE,
        q_embedding_near_dup_lsh,
    )

    lsh = q_embedding_near_dup_lsh(spark, SF_DIR)
    plan = lsh._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan[:2000]

    rows = lsh.collect()
    from pb_etl_spark.catalog import read_table

    planted = {
        (vid, vid + TWIN_ID_OFFSET)
        for (vid,) in read_table(spark, SF_DIR, "embeddings")
        .filter(F.col("vec_id") % TWIN_STRIDE == 0)
        .select("vec_id")
        .collect()
    }
    got = {(r["ia"], r["ib"]) for r in rows}
    assert got == planted, (
        f"missed={sorted(planted - got)[:5]} extra={sorted(got - planted)[:5]}"
    )
    assert all(r["cos"] >= 0.9999 for r in rows)


def test_connected_components_known_graph(spark):
    """Hand-built graph: {1,2,3} chained, {4,5} paired, {6} isolated —
    labels must converge to the component minimum."""
    from pb_etl_spark.operators.clustering import connected_components

    verts = spark.createDataFrame([(i,) for i in range(1, 7)], "id long")
    edges = spark.createDataFrame(
        [(2, 3), (1, 2), (4, 5)], "src long, dst long"
    )
    got = {
        r["id"]: r["cluster_id"] for r in connected_components(verts, edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}


def test_word_shingles_short_docs_yield_nothing(spark):
    """Documents with fewer than n tokens must produce zero shingles (the
    descending-sequence crash/bogus-shingle regression)."""
    from pb_etl_spark.operators.dedup import word_shingles

    docs = spark.createDataFrame(
        [(1, "one two"), (2, "solo"), (3, ""), (4, "a b c d")],
        "doc_id long, text string",
    )
    got = {(r["doc_id"], r["sh"]) for r in word_shingles(docs, n=3).collect()}
    assert got == {(4, "a b c"), (4, "b c d")}


def test_connected_components_raises_on_non_convergence(spark):
    from pb_etl_spark.operators.clustering import connected_components

    verts = spark.createDataFrame([(i,) for i in range(6)], "id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "src long, dst long"
    )
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(verts, chain, max_rounds=2)


def test_lsh_verify_handles_bucket_straddling_arrow_batches(spark):
    """The partition-wise verify concatenates a partition's Arrow
    batches before group-slicing; force tiny batches so buckets
    straddle batch boundaries and prove no pair is lost."""
    from tests.conftest import SF_DIR

    from pb_etl_spark.operators.dedup import (
        TWIN_ID_OFFSET,
        TWIN_STRIDE,
        q_embedding_near_dup_lsh,
    )
    from pb_etl_spark.catalog import read_table

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key, "10000")
    try:
        spark.conf.set(key, "7")
        got = {
            (r["ia"], r["ib"])
            for r in q_embedding_near_dup_lsh(spark, SF_DIR).collect()
        }
    finally:
        spark.conf.set(key, prev)
    planted = {
        (vid, vid + TWIN_ID_OFFSET)
        for (vid,) in read_table(spark, SF_DIR, "embeddings")
        .filter(F.col("vec_id") % TWIN_STRIDE == 0)
        .select("vec_id")
        .collect()
    }
    assert got == planted


def test_lsh_verify_width_independent(spark):
    """r11 verdict item 2: the verify fan-out width now follows the
    session's shuffle-partition setting (data-proportional knob), not a
    hardcoded core count — so the SAME query must produce identical
    (ia, ib, cos) rows at widths well below, at, and well above core
    count (8 / 64 / 200). cos is asserted too: the per-table duplicate
    is resolved with the deterministic F.max, so even the last-ulp BLAS
    wiggle across bucket gram sizes cannot vary the emitted value."""
    from tests.conftest import SF_DIR

    from pb_etl_spark.operators.dedup import q_embedding_near_dup_lsh

    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    results = {}
    try:
        for width in ("8", "64", "200"):
            spark.conf.set(key, width)
            results[width] = {
                (r["ia"], r["ib"], r["cos"])
                for r in q_embedding_near_dup_lsh(spark, SF_DIR).collect()
            }
    finally:
        spark.conf.set(key, prev)
    assert results["8"] == results["64"] == results["200"]
    assert results["8"], "fixture must contain planted pairs"


def test_fanout_width_defensive_parse():
    """ADVICE r12: a non-numeric ``spark.sql.shuffle.partitions`` (e.g.
    a managed platform's ``"auto"``) must degrade fanout_width to the
    core-count floor, not crash every dedup query with ValueError — and
    the degrade must WARN (r13 review finding: a silent fallback would
    reinstate the core-count-proportional width with no trace)."""
    import pytest as _pytest

    from pb_etl_spark.operators._width import fanout_width

    class _Conf:
        def get(self, key):
            return "auto"

    class _SC:
        defaultParallelism = 7

    class _Spark:
        conf = _Conf()
        sparkContext = _SC()

    with _pytest.warns(UserWarning, match="not numeric"):
        assert fanout_width(_Spark()) == 7


# The source-level no-hardcoded-fanout guard (formerly the dedup-only
# test here, positional-string-split based and inert-prone — ADVICE r12
# item 4) now lives in tests/test_plan_lint.py as a package-wide
# tokenize-based rule: test_no_bare_default_parallelism_in_package.
