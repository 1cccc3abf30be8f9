"""The adversarial-fixture gate: oracle parity on handcrafted edge
inputs the driver's synthetic generator never produces (empty text,
consecutive-space tokens, unicode multibyte text, exact/near dup pairs,
zero-norm Matryoshka prefixes, same-microsecond event ties, exact
band-boundary gaps — see tools/adversarial_fixture.py).

The full-registry adversarial sweep runs out-of-band
(``python tools/check_oracle.py --vanilla .adversarial``); this file
pins the names that FAILED it when it was first run in round 14, plus
a spread of tie/boundary-sensitive families, so the specific divergence
classes it caught can never regress silently:

- matryoshka_knn: zero-norm PREFIX cosine was an ANSI DIVIDE_BY_ZERO
  crash on Spark and a silent -1.0 on DuckDB (list_cosine_similarity's
  zero-vector convention); both legs now guard cos = 0.0.
- media_frame_sample: md5 over raw frame bytes only matched while text
  was pure ASCII (byte strides split multibyte chars; DuckDB cannot
  slice or md5 BLOBs) — the digest is now md5∘hex on both legs.
- binaryfile_ingest / media_decode / media_feature_summary: DuckDB's
  VARCHAR->BLOB cast REJECTS non-ASCII (oracles now use encode()),
  and Spark's binaryFile source emits NO row for a 0-byte file.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "tools")

# the r14 sweep's five failures + boundary-sensitive families the
# fixture aims at (ties, empties, unicode, zero-duration intervals)
ADV_NAMES = [
    "matryoshka_knn",
    "media_frame_sample",
    "media_decode",
    "media_feature_summary",
    "binaryfile_ingest",
    "asof_join",
    "twap_user_value",
    "range_join",
    "dup_span_ratio",
    "text_stats",
    "text_quality",
    "incremental_dedup",
    "knn_cosine",
    "dedup_exact",
    "sessionize_lag",
    "event_transition_matrix",
    # relational edges (r14 TPC-H extension): max-revenue TIE (both
    # suppliers must come back), customers with no orders / idle
    # balances, BETWEEN-boundary discounts, half-cent money products,
    # and the stale-derived-cache gate (orc copy rebuilt on fixture
    # regeneration — the one failure the extension's first sweep caught)
    "tpch_q15_top_supplier",
    "tpch_q13_custdist",
    "tpch_q22_idle_balances",
    "tpch_q6_revenue",
    "tpch_q1_pricing",
    "orc_roundtrip_agg",
]


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    from adversarial_fixture import build

    out = str(tmp_path_factory.mktemp("adv"))
    build(out)
    return out


@pytest.fixture(scope="module")
def adv_duck(adv_dir):
    from check_oracle import duck_con

    return duck_con(adv_dir)


@pytest.mark.parametrize("name", ADV_NAMES)
def test_adversarial_parity(spark, adv_dir, adv_duck, name):
    from check_oracle import compare

    from pb_etl_spark.registry import all_oracles, all_queries

    sdf = all_queries()[name](spark, adv_dir).toPandas()
    odf = adv_duck.execute(all_oracles()[name]).fetchdf()
    problems = compare(name, sdf, odf)
    assert not problems, problems


def test_binaryfile_source_drops_empty_files(spark, tmp_path):
    """Spark's binaryFile source emits no row for a 0-byte file
    (FilePartition splits are size-based). The binaryfile_ingest oracle
    filters empties to match — if a Spark upgrade starts surfacing
    them, this trips and the oracle filter must be revisited."""
    (tmp_path / "a.bin").write_bytes(b"x")
    (tmp_path / "b.bin").write_bytes(b"")
    got = spark.read.format("binaryFile").load(str(tmp_path) + "/*.bin")
    assert [r.length for r in got.collect()] == [1]


def test_zero_norm_prefix_cosine_is_zero(spark):
    """The matryoshka guard: a valid vector whose MAT_DIM prefix is all
    zeros must score cos 0.0 (not crash under ANSI, not DuckDB's -1)."""
    from pyspark.sql import functions as F

    from pb_etl_spark.operators.similarity import MAT_DIM, _cos_or_zero, _dot, _norm

    df = spark.createDataFrame(
        [([0.0] * MAT_DIM, [1.0] * MAT_DIM)], "a array<double>, b array<double>"
    )
    got = df.select(
        _cos_or_zero(_dot(F.col("a"), F.col("b")), _norm("a") * _norm("b")).alias("c")
    ).collect()[0]["c"]
    assert got == 0.0
