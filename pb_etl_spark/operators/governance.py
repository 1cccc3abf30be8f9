"""Data-governance operators: k-anonymity auditing and differentially
private release counts.

Reference parity note: the reference pipeline (``/root/reference/pb_etl/
tasks.py``) has no governance surface; these extend the catalog with the
privacy checks a 100 TB data platform runs before sharing derived
tables (the `pii_redaction` lineage in ``operators/corpus.py``).

Scale design:

- ``k_anonymity_report``: one grouped count over the quasi-identifier
  tuple (the only fact-sized shuffle), then a 1-row rollup of the
  bounded group table. The group table is |QI-value-combinations|-sized
  — a dimension product, not a fact.
- ``dp_noisy_counts``: per-category counts + Laplace(1/ε) noise whose
  uniform draw is a SEEDED md5 hash of the category (the kmv/minhash
  cross-engine determinism trick: both engines derive the identical
  52-bit uniform, so the DuckDB oracle value-checks a *differentially
  private* release — the noise is real Laplace inverse-CDF, just with
  a deterministic seed per category, which is exactly how a production
  DP release with an auditable seed log works).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pb_etl_spark.catalog import read_table

K_ANON = 5  # minimum acceptable quasi-identifier group size
DP_EPSILON = 1.0  # Laplace scale b = 1/ε
DP_SEED = "dp-r04"  # seed tag mixed into the per-category hash
_U_SCALE = float(1 << 52)  # 13 hex chars = 52 bits — exact in a double


def q_k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of customer against the quasi-identifier
    (nation, market segment): the achieved k (minimum group size),
    violating-group count under K_ANON, and the suppression rate —
    the fraction of rows that would have to be withheld to publish the
    table k-anonymously. One integer-only summary row."""
    cust = read_table(spark, sf_dir, "customer")
    groups = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("size")
    )
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("size").alias("k_achieved"),
        F.lit(K_ANON).cast("long").alias("k_required"),
        F.sum((F.col("size") < K_ANON).cast("long")).alias("n_violating_groups"),
        F.sum(F.when(F.col("size") < K_ANON, F.col("size")).otherwise(0)).alias(
            "n_suppressed_rows"
        ),
        F.round(
            F.sum(
                F.when(F.col("size") < K_ANON, F.col("size")).otherwise(0)
            ).cast("double")
            / F.sum("size"),
            6,
        ).alias("suppression_rate"),
    )


def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-differentially-private per-event-type counts: true count +
    Laplace(1/ε) noise via the inverse CDF
    noise = −(1/ε)·sign(u−½)·ln(1 − 2|u−½|), with the uniform u drawn
    from a seeded md5 hash of the category (auditable-seed DP release).
    The true counts are NOT emitted — the noisy value and ε are the
    release. Counts are a single grouped aggregate; the noise is a
    per-row projection over the |categories| output."""
    ev = read_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit(DP_SEED + ":"), F.col("event_type"))), 1, 13),
        16,
        10,
    ).cast("double") / F.lit(_U_SCALE)
    centered = u - 0.5
    noise = (
        F.lit(-1.0 / DP_EPSILON)
        * F.signum(centered)
        * F.log(F.lit(1.0) - 2.0 * F.abs(centered))
    )
    return counts.select(
        "event_type",
        F.lit(DP_EPSILON).alias("epsilon"),
        F.round(F.col("n") + noise, 6).alias("noisy_count"),
    )


# Benford expected first-digit shares log10(1 + 1/d), Python-computed
# literals embedded identically in both engines
BENFORD = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829992,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}


def q_benford_digit_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    fraud/synthetic-data screen: naturally occurring amounts follow
    log10(1+1/d); fabricated ones usually don't. Emits, per leading
    digit, the observed count/share, the Benford expectation, and the
    χ² contribution (obs−exp)²/exp.

    The leading digit comes from the CENTS INTEGER's decimal string
    (no log10 of data values — pure integer/string, engine-exact);
    expectations are embedded literals, so every float is one local
    chain per digit row. One grouped count, a 9-row report."""
    o = read_table(spark, sf_dir, "orders").select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
            1,
            1,
        )
        .cast("long")
        .alias("digit")
    )
    counts = o.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    # drive the report from the FULL 1..9 digit frame: a digit that
    # never occurs is the strongest Benford violation and must
    # contribute its whole (0 − n·p)²/(n·p) term, not vanish; this also
    # keeps element_at's index in 1..9 by construction (digit-0 rows
    # from zero/negative amounts can't reach it)
    digits = spark.createDataFrame([(d,) for d in range(1, 10)], "digit long")
    counts = digits.join(counts, "digit", "left").select(
        "digit", F.coalesce("n_obs", F.lit(0)).alias("n_obs")
    )
    # total over the REINDEXED 1..9 frame, same as the oracle's tot CTE:
    # digit-0 / NULL-digit rows from zero-or-negative amounts must not
    # inflate the share/χ² denominator on either engine
    total = counts.agg(F.sum("n_obs").alias("n"))
    exp_share = F.element_at(
        F.array(*[F.lit(BENFORD[d]) for d in range(1, 10)]),
        F.col("digit").cast("int"),
    )
    expected = F.col("n") * exp_share
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n_obs",
            F.round(F.col("n_obs").cast("double") / F.col("n"), 6).alias(
                "obs_share"
            ),
            F.round(exp_share, 6).alias("benford_share"),
            F.round(
                (F.col("n_obs") - expected) * (F.col("n_obs") - expected)
                / expected,
                6,
            ).alias("chi2_contrib"),
        )
    )


QUERIES = {
    "k_anonymity_report": q_k_anonymity_report,
    "dp_noisy_counts": q_dp_noisy_counts,
    "benford_digit_test": q_benford_digit_test,
}

ORACLES: dict[str, str] = {
    "benford_digit_test": """
        WITH src AS (
            SELECT CAST(substring(CAST(CAST(ROUND(o_totalprice * 100)
                                        AS BIGINT) AS VARCHAR), 1, 1)
                        AS BIGINT) AS digit
            FROM orders
        ), observed AS (
            SELECT digit, COUNT(*) AS n_obs FROM src GROUP BY digit
        ), counts AS (
            SELECT d.digit, COALESCE(o.n_obs, 0) AS n_obs
            FROM (SELECT UNNEST(RANGE(1, 10)) AS digit) d
            LEFT JOIN observed o ON d.digit = o.digit
        ), tot AS (
            -- DuckDB SUM(BIGINT) is DECIMAL(38); cast once to BIGINT so
            -- the double chains below match Spark's long->double casts
            SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM counts
        )
        SELECT digit, n_obs,
               ROUND(CAST(n_obs AS DOUBLE) / t.n, 6) AS obs_share,
               ROUND((CAST([0.3010299956639812, 0.17609125905568124, 0.12493873660829992, 0.09691001300805642, 0.07918124604762482, 0.06694678963061322, 0.05799194697768673, 0.05115252244738129, 0.04575749056067514] AS DOUBLE[]))[CAST(digit AS INT)], 6) AS benford_share,
               ROUND((n_obs - t.n * (CAST([0.3010299956639812, 0.17609125905568124, 0.12493873660829992, 0.09691001300805642, 0.07918124604762482, 0.06694678963061322, 0.05799194697768673, 0.05115252244738129, 0.04575749056067514] AS DOUBLE[]))[CAST(digit AS INT)])
                     * (n_obs - t.n * (CAST([0.3010299956639812, 0.17609125905568124, 0.12493873660829992, 0.09691001300805642, 0.07918124604762482, 0.06694678963061322, 0.05799194697768673, 0.05115252244738129, 0.04575749056067514] AS DOUBLE[]))[CAST(digit AS INT)])
                     / (t.n * (CAST([0.3010299956639812, 0.17609125905568124, 0.12493873660829992, 0.09691001300805642, 0.07918124604762482, 0.06694678963061322, 0.05799194697768673, 0.05115252244738129, 0.04575749056067514] AS DOUBLE[]))[CAST(digit AS INT)]), 6)
                   AS chi2_contrib
        FROM counts CROSS JOIN tot t
    """,
    "k_anonymity_report": f"""
        WITH groups AS (
            SELECT c_nationkey, c_mktsegment, COUNT(*) AS size
            FROM customer GROUP BY 1, 2
        )
        SELECT COUNT(*) AS n_groups,
               MIN(size) AS k_achieved,
               CAST({K_ANON} AS BIGINT) AS k_required,
               CAST(SUM(CASE WHEN size < {K_ANON} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_violating_groups,
               CAST(SUM(CASE WHEN size < {K_ANON} THEN size ELSE 0 END)
                    AS BIGINT) AS n_suppressed_rows,
               ROUND(CAST(SUM(CASE WHEN size < {K_ANON} THEN size ELSE 0 END)
                          AS DOUBLE) / SUM(size), 6) AS suppression_rate
        FROM groups
    """,
    "dp_noisy_counts": f"""
        WITH counts AS (
            SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
        ), drawn AS (
            SELECT event_type, n,
                   CAST(CAST('0x' || substring(
                            md5('{DP_SEED}:' || event_type), 1, 13)
                        AS BIGINT) AS DOUBLE) / {_U_SCALE!r} - 0.5 AS centered
            FROM counts
        )
        SELECT event_type,
               {DP_EPSILON} AS epsilon,
               ROUND(n + (-1.0 / {DP_EPSILON})
                         * SIGN(centered)
                         * LN(1.0 - 2.0 * ABS(centered)), 6) AS noisy_count
        FROM drawn
    """,
}
