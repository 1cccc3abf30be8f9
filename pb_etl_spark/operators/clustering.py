"""Dedup clustering: connected components over the near-duplicate pair
graph → one cluster id per document (min doc_id of its component).

This is the step after candidate generation in a real dedup pipeline:
near-dup *pairs* (operators.dedup) must become *groups* so that exactly one
representative per group survives. Components are computed by iterative
min-label propagation — the standard large-graph method (hash-join +
groupBy per round, state truncated with localCheckpoint), NOT a driver-side
union-find: at 100 TB the edge list is a DataFrame like any other and each
round is one shuffle. Converges in O(diameter) rounds; near-dup components
are shallow (dup clusters are cliques-ish), so 3-5 rounds in practice.

The DuckDB oracle expresses the same fixpoint as a recursive CTE, so this
iterative operator is *exactly* oracle-checked, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pb_etl_spark.catalog import read_table
from pb_etl_spark.operators.dedup import q_minhash_near_dup_pairs

MAX_ROUNDS = 20


def connected_components(
    vertices: DataFrame, edges: DataFrame, max_rounds: int = MAX_ROUNDS
) -> DataFrame:
    """Min-label propagation.

    ``vertices``: one column ``id``; ``edges``: columns ``src``/``dst``
    (undirected; symmetrized here). Returns (id, cluster_id) where
    cluster_id is the component's minimum id. One shuffle round per
    iteration; lineage truncated per round so the plan stays O(1) deep.
    """
    # materialize the edge list once: each round re-evaluates its plan, and
    # edges often come from an expensive upstream (LSH candidate generation)
    # that must not re-run per iteration
    sym = (
        edges.select("src", "dst")
        .unionAll(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .localCheckpoint(eager=True)
    )
    labels = vertices.select(F.col("id"), F.col("id").alias("cluster_id"))
    for _ in range(max_rounds):
        nbr = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr, labels.id == nbr.src, "left")
            .select(
                "id",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        # release the previous round's checkpoint blocks — otherwise
        # executor storage accumulates O(rounds) copies of the vertex set
        if labels is not vertices:
            labels.unpersist()
        labels = new_labels
        if changed == 0:
            return labels
    # fail loud: returning unconverged labels would silently split
    # components whose diameter exceeds max_rounds
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds; "
        "raise max_rounds (diameter of the largest component exceeds it)"
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster id per document from the MinHash near-dup pair graph;
    singletons keep their own id. Downstream keeps doc_id == cluster_id
    rows as the deduplicated corpus."""
    docs = read_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id")
    )
    pairs = q_minhash_near_dup_pairs(spark, sf_dir).select(
        F.col("da").alias("src"), F.col("db").alias("dst")
    )
    return connected_components(docs, pairs).select(
        F.col("id").alias("doc_id"), "cluster_id"
    )


def q_dedup_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduplicated corpus summary: one row per cluster with its size
    and representative (min doc_id) — what a 100 TB dedup job emits."""
    clusters = q_dedup_clusters(spark, sf_dir)
    return (
        clusters.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .withColumnRenamed("cluster_id", "rep_doc_id")
    )


def _pairs_cte() -> str:
    """The minhash near-dup pair SQL as a CTE body (reuses the oracle
    pipeline from operators.dedup so both engines see identical edges)."""
    from pb_etl_spark.operators.dedup import ORACLES

    inner = ORACLES["minhash_near_dup_pairs"].strip()
    return f"pair_q AS ({inner})"


ORACLES: dict[str, str] = {
    "dedup_clusters": f"""
        WITH RECURSIVE {_pairs_cte()},
        edges AS (
            SELECT da AS src, db AS dst FROM pair_q
            UNION
            SELECT db, da FROM pair_q
        ),
        reach(id, r) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.src, reach.r
            FROM edges e JOIN reach ON reach.id = e.dst
        )
        SELECT id AS doc_id, MIN(r) AS cluster_id
        FROM reach GROUP BY id
    """,
    "dedup_representatives": f"""
        WITH RECURSIVE {_pairs_cte()},
        edges AS (
            SELECT da AS src, db AS dst FROM pair_q
            UNION
            SELECT db, da FROM pair_q
        ),
        reach(id, r) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.src, reach.r
            FROM edges e JOIN reach ON reach.id = e.dst
        ),
        clusters AS (
            SELECT id AS doc_id, MIN(r) AS cluster_id
            FROM reach GROUP BY id
        )
        SELECT cluster_id AS rep_doc_id, COUNT(*) AS cluster_size
        FROM clusters GROUP BY cluster_id
    """,
}

QUERIES = {
    "dedup_clusters": q_dedup_clusters,
    "dedup_representatives": q_dedup_representatives,
}
