"""Round-10 operator tests: exact-K priority sampling (weighted WOR via
Duffield-Lund-Thorup), the two-sample KS + Mann-Whitney drift tests, and
the r09-ADVICE hardening of grouped_running_sum / gini_by_group."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _md5_first8_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_priority_sample_matches_python_model(spark):
    """The kept set, the priorities, and the Horvitz-Thompson adjusted
    weights must equal a from-scratch Python md5 model of the whole
    chain (u derivation, priority division, top-K cut, tau threshold)."""
    from pb_etl_spark.catalog import read_table
    from pb_etl_spark.operators.corpus import PRIORITY_K, q_priority_sample_topk

    docs = (
        read_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    )
    model = []
    for r in docs:
        w = len(r["text"].split(" "))
        m1 = _md5_first8_int(str(r["doc_id"])) + 1
        model.append((r["doc_id"], w, w * 4294967296.0 / m1))
    model.sort(key=lambda t: (-t[2], t[0]))
    assert len(model) > PRIORITY_K, "fixture must exceed the sample size"
    tau = model[PRIORITY_K][2]
    want = {
        d: (w, round(p, 6), round(max(float(w), tau), 6))
        for d, w, p in model[:PRIORITY_K]
    }
    got = {
        r["doc_id"]: (r["n_tok"], r["priority"], r["est_w"])
        for r in q_priority_sample_topk(spark, SF_DIR).collect()
    }
    assert got == want


def test_priority_sample_estimator_tracks_total_mass(spark):
    """Priority sampling's point: Σ est_w over the sample is an unbiased
    estimator of the corpus's total token mass. One deterministic
    realization won't be exact, but it must land in the right
    neighborhood — a sign error or a dropped tau would blow this up."""
    from pb_etl_spark.catalog import read_table
    from pb_etl_spark.operators.corpus import q_priority_sample_topk

    est = (
        q_priority_sample_topk(spark, SF_DIR)
        .agg(F.sum("est_w").alias("s"))
        .collect()[0]["s"]
    )
    true = (
        read_table(spark, SF_DIR, "documents")
        .agg(F.sum(F.size(F.split("text", " "))).alias("s"))
        .collect()[0]["s"]
    )
    assert abs(est - true) / true < 0.2, (est, true)


def test_priority_sample_small_corpus_keeps_everything(spark, monkeypatch):
    """A corpus smaller than K+1 is the whole sample: every doc kept,
    tau = 0, est_w = w (the estimator degrades to the exact total)."""
    import pb_etl_spark.operators.corpus as corpus
    from pb_etl_spark.catalog import read_table

    n_docs = read_table(spark, SF_DIR, "documents").count()
    monkeypatch.setattr(corpus, "PRIORITY_K", n_docs + 1)
    rows = corpus.q_priority_sample_topk(spark, SF_DIR).collect()
    assert len(rows) == n_docs
    assert all(r["est_w"] == float(r["n_tok"]) for r in rows)


def test_ks_mann_whitney_matches_python_model(spark):
    """Both statistics re-derived from scratch in Python over the same
    collected values — including a brute-force O(n_a*n_b) Mann-Whitney U
    (pair counting with half-credit ties), which independently verifies
    the doubled-midrank algebra the query uses."""
    from pb_etl_spark.catalog import read_table
    from pb_etl_spark.operators.selection import q_ks_mann_whitney

    rows = (
        read_table(spark, SF_DIR, "documents")
        .select(F.size(F.split("text", " ")).alias("v"), "lang")
        .collect()
    )
    a = [r["v"] for r in rows if r["lang"] == "en"]
    b = [r["v"] for r in rows if r["lang"] != "en"]
    n_a, n_b = len(a), len(b)
    ca, cb = Counter(a), Counter(b)
    cum_a = cum_b = d_num = s2 = ties = 0
    for v in sorted(set(a) | set(b)):
        ta, tb = ca.get(v, 0), cb.get(v, 0)
        before = cum_a + cum_b
        cum_a, cum_b = cum_a + ta, cum_b + tb
        d_num = max(d_num, abs(cum_a * n_b - cum_b * n_a))
        t = ta + tb
        s2 += ta * (2 * before + t + 1)
        ties += t * t * t - t
    u1 = (s2 - n_a * (n_a + 1)) / 2.0
    u_brute = sum((x > y) + 0.5 * (x == y) for x in a for y in b)
    assert u1 == u_brute, "doubled-midrank algebra disagrees with pair counting"
    n = n_a + n_b
    mu = n_a * n_b / 2.0
    sig2 = n_a * n_b / 12.0 * ((n + 1.0) - ties / (n * (n - 1.0)))
    z = (u1 - mu) / math.sqrt(sig2)
    [r] = q_ks_mann_whitney(spark, SF_DIR).collect()
    assert (r["n_a"], r["n_b"], r["ks_d_num"]) == (n_a, n_b, d_num)
    assert r["mw_u1"] == u1
    assert abs(r["ks_d"] - d_num / (n_a * n_b)) < 1e-9
    assert abs(r["mw_z"] - z) < 1e-6


def test_grouped_running_sum_rejects_null_values(spark):
    """NULL values would silently NULL the windowed prefix sum for
    leading all-NULL frames (and desync the counts-leg subtotal). The
    r15 one-action form enforces the non-null contract IN-PLAN: any row
    of a violating (pid, group) slice raises at action time (ANY
    violation anywhere poisons every row, like the old global driver
    check)."""
    import pytest

    from pb_etl_spark.operators.corpus import grouped_running_sum

    all_null = spark.createDataFrame(
        [("a", 1, None), ("a", 2, None), ("b", 1, 5)],
        "g string, o long, v long",
    )
    partial_null = spark.createDataFrame(
        [("a", 1, None), ("a", 2, 3), ("b", 1, 5)],
        "g string, o long, v long",
    )
    for df in (all_null, partial_null):
        with pytest.raises(Exception, match="NULL value"):
            grouped_running_sum(spark, df, ["g"], ["o"], "v").collect()


def test_global_running_sum_rejects_null_values(spark):
    """The ungrouped sibling has the same hazard: partial NULLs would
    silently NULL the cumsum (and the Add short-circuit would swallow a
    guard that lives under it — the raise must wrap the sum). The
    in-plan contract check must raise at action time."""
    import pytest

    from pb_etl_spark.operators.corpus import global_running_sum

    df = spark.createDataFrame(
        [(1, None), (2, 3), (3, None)], "o long, v long"
    )
    with pytest.raises(Exception, match="NULL value"):
        global_running_sum(spark, df, ["o"], "v").collect()


def test_grouped_running_sum_guards_span_misses_loudly(spark):
    """A broadcast-back offset/total whose row falls outside its
    partition's counts-leg span (boundary drift — only possible if
    exchange reuse failed) must raise_error, not silently NULL cum/gtot
    (ADVICE r09's loud-miss contract, carried through the r15
    reformulation); the guard must be wired into the plan yet never
    fire on the healthy path."""
    from pb_etl_spark.operators.corpus import grouped_running_sum

    df = spark.createDataFrame(
        [("a", 1, 2), ("a", 2, 3), ("b", 1, 5)], "g string, o long, v long"
    )
    out = grouped_running_sum(spark, df, ["g"], ["o"], "v")
    plan = out._jdf.queryExecution().analyzed().toString()
    assert plan.count("raise_error") >= 2, "offset AND total lookups guarded"
    got = {(r["g"], r["o"]): (r["cum"], r["gtot"]) for r in out.collect()}
    assert got == {("a", 1): (2, 5), ("a", 2): (5, 5), ("b", 1): (5, 5)}
    alls = {r["_gr_all"] for r in out.collect()}
    assert alls == {10}


def test_global_primitives_guard_span_misses_loudly(spark):
    """global_positions and global_running_sum share grouped_running_sum's
    failure mode — a broadcast-back offset attached to a drifted row
    would silently corrupt pos/cum — so they carry the same raise_error
    span guard, wired into the plan yet never firing on the healthy
    path; the totals ride the output as plan columns."""
    from pb_etl_spark.operators.corpus import (
        global_positions,
        global_running_sum,
    )

    df = spark.createDataFrame(
        [(3, 10), (1, 20), (2, 30)], "o long, v long"
    )
    pos = global_positions(spark, df, ["o"])
    assert "raise_error" in pos._jdf.queryExecution().analyzed().toString()
    rows = pos.collect()
    assert {r["_gp_tot"] for r in rows} == {3}
    assert {(r["o"], r["pos"]) for r in rows} == {
        (1, 1),
        (2, 2),
        (3, 3),
    }
    cum = global_running_sum(spark, df, ["o"], "v")
    assert "raise_error" in cum._jdf.queryExecution().analyzed().toString()
    crows = cum.collect()
    assert {r["_gr_tot"] for r in crows} == {60}
    assert {(r["o"], r["cum"]) for r in crows} == {
        (1, 20),
        (2, 50),
        (3, 60),
    }


def test_gini_by_group_sums_in_decimal_behind_a_loud_guard(spark):
    """Σ pos·cents must accumulate in decimal(38,0) (the long product
    could overflow int64 at scale) and convert to double only behind a
    2^53 raise_error guard (ADVICE r09) — while the healthy-path values
    keep matching the r09 pandas-model test."""
    from pb_etl_spark.operators.affinity import q_gini_by_group

    df = q_gini_by_group(spark, SF_DIR)
    plan = df._jdf.queryExecution().analyzed().toString().lower()
    assert "raise_error" in plan
    assert "decimal(38,0)" in plan
    assert df.count() > 0  # the guard never fires at fixture scale


def test_two_sample_rank_tests_raise_on_degenerate_inputs(spark):
    """One-sided or all-tied inputs make the statistics 0/0; the helper
    must raise its curated error instead of emitting silent NaN."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from pb_etl_spark.operators.selection import two_sample_rank_tests

    one_sided = spark.createDataFrame(
        [(1, 3, 0), (2, 4, 0)], "v long, cnt_a long, cnt_b long"
    )
    with pytest.raises((Py4JJavaError, SparkRuntimeException)) as e1:
        two_sample_rank_tests(one_sided).collect()
    assert "undefined" in str(e1.value)
    all_tied = spark.createDataFrame(
        [(7, 3, 4)], "v long, cnt_a long, cnt_b long"
    )
    with pytest.raises((Py4JJavaError, SparkRuntimeException)) as e2:
        two_sample_rank_tests(all_tied).collect()
    assert "undefined" in str(e2.value)


def test_priority_sample_per_source_matches_python_model(spark):
    """Per-stratum kept sets, priorities, and per-stratum HT weights
    must equal a from-scratch Python model (per-source sort, per-source
    tau = the (K+1)-th priority of THAT source)."""
    from pb_etl_spark.catalog import read_table
    from pb_etl_spark.operators.corpus import (
        PRIORITY_GROUP_K,
        q_priority_sample_per_source,
    )

    docs = (
        read_table(spark, SF_DIR, "documents")
        .select("source", "doc_id", "text")
        .collect()
    )
    by_src: dict[str, list] = {}
    for r in docs:
        w = len(r["text"].split(" "))
        m1 = _md5_first8_int(str(r["doc_id"])) + 1
        by_src.setdefault(r["source"], []).append(
            (r["doc_id"], w, w * 4294967296.0 / m1)
        )
    want = {}
    for src, items in by_src.items():
        items.sort(key=lambda t: (-t[2], t[0]))
        tau = (
            items[PRIORITY_GROUP_K][2]
            if len(items) > PRIORITY_GROUP_K
            else 0.0
        )
        for d, w, p in items[:PRIORITY_GROUP_K]:
            want[d] = (src, w, round(p, 6), round(max(float(w), tau), 6))
    got = {
        r["doc_id"]: (r["source"], r["n_tok"], r["priority"], r["est_w"])
        for r in q_priority_sample_per_source(spark, SF_DIR).collect()
    }
    assert got == want


def test_source_drift_matrix_matches_python_model(spark):
    """Every pair's exact KS numerator must equal the direct two-sample
    ECDF comparison computed in Python over the same token counts, and
    the matrix must cover exactly the |sources| -choose- 2 ordered
    pairs."""
    from itertools import combinations

    from pb_etl_spark.catalog import read_table
    from pb_etl_spark.operators.selection import q_source_drift_matrix

    docs = (
        read_table(spark, SF_DIR, "documents")
        .select("source", F.size(F.split("text", " ")).alias("v"))
        .collect()
    )
    vals: dict[str, list] = {}
    for r in docs:
        vals.setdefault(r["source"], []).append(r["v"])
    grid = sorted({v for vs in vals.values() for v in vs})
    want = {}
    for sa, sb in combinations(sorted(vals), 2):
        a, b = vals[sa], vals[sb]
        n_a, n_b = len(a), len(b)
        d = max(
            abs(
                sum(x <= v for x in a) * n_b
                - sum(x <= v for x in b) * n_a
            )
            for v in grid
        )
        want[(sa, sb)] = (n_a, n_b, d, round(d / (n_a * n_b), 9))
    got = {
        (r["source_a"], r["source_b"]): (
            r["n_a"],
            r["n_b"],
            r["ks_d_num"],
            r["ks_d"],
        )
        for r in q_source_drift_matrix(spark, SF_DIR).collect()
    }
    assert got == want
