"""End-to-end corpus-curation DAG: quality filter → exact dedup →
mixture resample → sequence packing → epoch shuffle → report, composed
from the corpus operators and the salted stage graph
(``plans/stages.py``).

This is the LLM-data twin of the reference's 7-stage feature pipeline
(``pb_etl_spark/pipeline.py``): the same content-addressed incremental
execution — each stage writes to ``{name}-{salt}``, reruns skip anything
already materialized, and bumping a stage's version cascades
re-execution downstream — applied to the pretraining-corpus workload.

Scale notes: every stage is a pure DataFrame job (filter = shuffle-free
codegen; dedup = digest groupBy + semi-join, bodies shuffle once; pack =
per-source window cumsum), and intermediate datasets are parquet with
``_SUCCESS`` flags — a failed run leaves either a complete stage output
or nothing, so resuming is exactly "skip what exists".
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pb_etl_spark.catalog import read_table
from pb_etl_spark.operators.corpus import PACK_BUDGET, quality_flags
from pb_etl_spark.plans.stages import Stage, StageRunner


def _curate(sf_dir: str):
    def fn(spark: SparkSession, out: str, deps: dict[str, str]) -> None:
        doc = read_table(spark, sf_dir, "documents")
        len_ok, div_ok, stop_ok = quality_flags()
        doc.filter(len_ok & div_ok & stop_ok).write.parquet(out)

    return fn


def _dedup(spark: SparkSession, out: str, deps: dict[str, str]) -> None:
    doc = spark.read.parquet(deps["curated"])
    keep = (
        doc.select("doc_id", F.md5(F.col("text")).alias("__fp"))
        .groupBy("__fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    # digests + ids decide the winners; bodies shuffle once in this join
    doc.join(keep, "doc_id", "left_semi").write.parquet(out)


def _mixture(spark: SparkSession, out: str, deps: dict[str, str]) -> None:
    """Deterministic downsample to a uniform source mixture — shares the
    rate/uniform builders with the oracle-checked q_mixture_resample, so
    the DAG stage cannot drift from the verified rule. md5-keyed: a
    stage retry re-selects the same rows (the salted DAG's resume
    contract)."""
    from pb_etl_spark.operators.corpus import doc_uniform, uniform_mixture_rates

    doc = spark.read.parquet(deps["deduped"])
    rates = uniform_mixture_rates(doc)
    (
        doc.join(F.broadcast(rates), "source")
        .filter(doc_uniform(F.col("doc_id")) < F.col("keep_rate"))
        .drop("keep_rate")
        .write.parquet(out)
    )


def _shuffle(epoch: int):
    """Epoch shuffle: globally sort the packed corpus by the shared
    per-epoch permutation key (operators.corpus.shuffle_key — same
    function the oracle-checked q_deterministic_shuffle uses). Sorted
    parquet out; the epoch number is the stage's param, so bumping it
    re-addresses (and re-runs) ONLY the shuffle + report — the
    curate/dedup/mixture/pack prefix is reused from its salt."""

    def fn(spark: SparkSession, out: str, deps: dict[str, str]) -> None:
        from pb_etl_spark.operators.corpus import shuffle_key

        packed = spark.read.parquet(deps["packed"])
        packed.withColumn(
            "__shuffle_key", shuffle_key(F.col("doc_id"), epoch=epoch)
        ).sort("__shuffle_key").drop("__shuffle_key").write.parquet(out)

    return fn


def _pack(spark: SparkSession, out: str, deps: dict[str, str]) -> None:
    doc = spark.read.parquet(deps["mixed"])
    n_tok = F.size(F.split(F.col("text"), " ")).cast("long")
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = F.sum(n_tok).over(w)
    doc.select(
        "doc_id",
        "source",
        "text",
        n_tok.alias("n_tokens"),
        F.floor((cum - n_tok) / PACK_BUDGET).cast("long").alias("pack_id"),
    ).write.parquet(out)


def _report(spark: SparkSession, out: str, deps: dict[str, str]) -> dict:
    packed = spark.read.parquet(deps["shuffled"])
    row = packed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.countDistinct("source", "pack_id").alias("n_packs"),
    ).first()
    return {
        "n_docs": row["n_docs"],
        "n_tokens": row["n_tokens"],
        "n_packs": row["n_packs"],
    }


def build_corpus_pipeline(sf_dir: str, epoch: int = 0) -> Stage:
    curated = Stage(
        name="corpus_curate",
        fn=_curate(sf_dir),
        params={"sf_dir": sf_dir},
    )
    deduped = Stage(name="corpus_dedup", fn=_dedup, deps={"curated": curated})
    mixed = Stage(name="corpus_mixture", fn=_mixture, deps={"deduped": deduped})
    packed = Stage(
        name="corpus_pack",
        fn=_pack,
        deps={"mixed": mixed},
        params={"budget": PACK_BUDGET},
    )
    shuffled = Stage(
        name="corpus_shuffle",
        fn=_shuffle(epoch),
        deps={"packed": packed},
        params={"epoch": epoch},
    )
    return Stage(
        name="corpus_report",
        fn=_report,
        deps={"shuffled": shuffled},
        ephemeral=True,
    )


def run_corpus_pipeline(
    spark: SparkSession, sf_dir: str, base: str, epoch: int = 0
) -> dict:
    """Run (or resume) the DAG; returns the report plus run/skip lists."""
    runner = StageRunner(spark, base)
    report = runner.run(build_corpus_pipeline(sf_dir, epoch=epoch))
    return {**report, "ran": runner.ran, "skipped": runner.skipped}
