"""End-to-end parity-pipeline tests on deterministic fixtures — the
reference's test shape (test_pset.py:131-234) upgraded to value assertions
(SURVEY.md §5: assert values, not just existence)."""

from __future__ import annotations

import math
import os

import pytest

from pb_etl_spark.pipeline import build_graph, run_pipeline
from pb_etl_spark.schemas import NORM_COLS
from pb_etl_spark.sources.parquet import dataset_exists, read_parquet
from tests.fixtures import write_fixtures


@pytest.fixture(scope="module")
def pipeline_run(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("external"))
    workdir = str(tmp_path_factory.mktemp("workdir"))
    stats = write_fixtures(root)
    report, runner = run_pipeline(spark, workdir, root=root, seed=42)
    return {"root": root, "workdir": workdir, "stats": stats, "report": report, "runner": runner}


def _stage_path(pipeline_run, name: str) -> str:
    g = build_graph(root=pipeline_run["root"], seed=42)
    stages = {}

    def walk(s):
        stages[s.name] = s
        for d in s.deps.values():
            walk(d)

    walk(g)
    return stages[name].out_path(pipeline_run["workdir"])


def test_all_stages_materialized(pipeline_run):
    runner = pipeline_run["runner"]
    assert set(runner.ran) == {
        "load_data", "load_test", "norm_denominators", "fit_model",
        "predict", "backtest", "final_results",
    }
    for name in ["load_data", "load_test", "norm_denominators", "predict", "backtest"]:
        assert dataset_exists(_stage_path(pipeline_run, name)), name


def test_load_data_join(spark, pipeline_run):
    df = read_parquet(spark, _stage_path(pipeline_run, "load_data"))
    stats = pipeline_run["stats"]
    assert df.count() == stats["n_train"]
    assert "TRAFFIC_SCORE" in df.columns and "TARGET" in df.columns
    # left join is 1:1 — no null traffic scores
    assert df.filter(df.TRAFFIC_SCORE.isNull()).count() == 0


def test_norm_denominators_values(spark, pipeline_run):
    df = read_parquet(spark, _stage_path(pipeline_run, "norm_denominators"))
    row = df.collect()[0]
    stats = pipeline_run["stats"]
    assert row["REN__max"] == stats["train_max_ren"]
    assert row["DOMAIN_LENGTH__max"] == stats["train_max_domain_length"]
    assert set(df.columns) == {c + "__max" for c in NORM_COLS}


def test_predict_output(spark, pipeline_run):
    df = read_parquet(spark, _stage_path(pipeline_run, "predict"))
    stats = pipeline_run["stats"]
    assert df.count() == stats["n_test"]
    assert set(df.columns) == {"TRANSACTION_ID", "Y_hat"}
    rows = df.collect()
    assert all(0.0 <= r["Y_hat"] <= 1.0 for r in rows)
    # model learned something: predictions are not all identical
    assert len({round(r["Y_hat"], 6) for r in rows}) > 1


def test_backtest_and_report(spark, pipeline_run):
    df = read_parquet(spark, _stage_path(pipeline_run, "backtest"))
    stats, report = pipeline_run["stats"], pipeline_run["report"]
    assert df.count() == stats["n_test"]
    assert set(df.columns) == {"TRANSACTION_ID", "TARGET", "Y_hat"}
    assert math.isclose(report["actual"], stats["actual_rate"], abs_tol=1e-9)
    assert 0.0 < report["expected"] < 1.0


def test_rerun_skips_all_materialized(spark, pipeline_run):
    """Salted memoization: a second run skips every materialized stage
    (reference §4.2 semantics)."""
    report2, runner2 = run_pipeline(
        spark, pipeline_run["workdir"], root=pipeline_run["root"], seed=42
    )
    assert set(runner2.skipped) == {
        "load_data", "load_test", "norm_denominators", "fit_model", "predict", "backtest",
    }
    assert runner2.ran == ["final_results"]  # ephemeral, always runs
    assert math.isclose(report2["actual"], pipeline_run["report"]["actual"], rel_tol=1e-12)
    assert math.isclose(report2["expected"], pipeline_run["report"]["expected"], rel_tol=1e-9)


def test_version_bump_cascades(spark, pipeline_run):
    """Bumping an upstream version re-salts it and everything downstream
    (task.py:83-134 cascade semantics), while unchanged prefixes reuse."""
    g1 = build_graph(root=pipeline_run["root"], seed=42, version="1.0")
    g2 = build_graph(root=pipeline_run["root"], seed=42, version="2.0")
    assert g1.salt() != g2.salt()
    # param change on seed re-salts fit_model and downstream only
    g3 = build_graph(root=pipeline_run["root"], seed=43, version="1.0")

    def find(s, name):
        if s.name == name:
            return s
        for d in s.deps.values():
            r = find(d, name)
            if r:
                return r
        return None

    assert find(g1, "load_data").salt() == find(g3, "load_data").salt()
    assert find(g1, "fit_model").salt() != find(g3, "fit_model").salt()
    assert find(g1, "backtest").salt() != find(g3, "backtest").salt()


def test_salt_determinism(pipeline_run):
    g = build_graph(root=pipeline_run["root"], seed=42)
    assert g.salt() == build_graph(root=pipeline_run["root"], seed=42).salt()
    assert len(g.salt()) == 6


def test_score_with_external_model_matches_closed_form(spark):
    """predict_batch_udf path must equal the closed-form sigmoid computed
    JVM-side (same weights), proving the Arrow batching is value-exact."""
    from pyspark.sql import functions as F

    from pb_etl_spark.ml.pipeline import score_with_external_model

    df = spark.createDataFrame(
        [(i, float(i % 7) - 3.0, float(i % 5) / 2.0) for i in range(1000)],
        "TRANSACTION_ID long, f1 double, f2 double",
    )
    w = [0.8, -1.3]
    b = 0.25
    got = score_with_external_model(df, w, b, ["f1", "f2"])
    want = df.select(
        "TRANSACTION_ID",
        (
            F.lit(1.0)
            / (
                F.lit(1.0)
                + F.exp(-(F.col("f1") * w[0] + F.col("f2") * w[1] + F.lit(b)))
            )
        ).alias("Y_hat"),
    )
    g = {r["TRANSACTION_ID"]: r["Y_hat"] for r in got.collect()}
    e = {r["TRANSACTION_ID"]: r["Y_hat"] for r in want.collect()}
    assert g.keys() == e.keys()
    assert all(abs(g[k] - e[k]) < 1e-12 for k in g)
