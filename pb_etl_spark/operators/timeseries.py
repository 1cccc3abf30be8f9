"""Event time-series analytics: rolling actives, transition matrices,
OHLC resampling, attribution, time-weighted averages, CUSUM changepoints.

These are the product-analytics / monitoring queries a training-data
platform runs over its own telemetry (and the classic "hypertable" read
patterns of a timeseries store), expressed as pure DataFrame
compositions — custom-operator rule (a): no UDFs anywhere in this module.

Reference scope note: the reference pipeline (pb_etl/tasks.py) has no
temporal operators at all (SURVEY.md §2.7 — "none implemented"); this
module is part of the beyond-reference surface the north star requires.

Cross-engine float discipline: ``events.value`` is 2-dp money, so every
SUM in this module runs on the integer-cents grid (``ROUND(value*100)``
cast to int64) — order-independent, hence hash-identical across engines
regardless of partitioning (the trailing_rows_avg / dsir_weights rule).
Final divisions produce one deterministic double per row.

Scale shape per query is documented on the function; none of them
window over an unpartitioned fact-sized frame, and the only row
multiplication (rolling_active_users' ×7 day-explode) happens on the
already-deduplicated (user, day) pair set, not raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pb_etl_spark.catalog import read_table


def _cents(col) -> F.Column:
    """events.value on the exact integer-cents grid."""
    return F.round(col * 100).cast("long")


ROLLING_DAYS = 7


HOLT_ALPHA = 0.5  # level smoothing (binary-exact fraction)
HOLT_BETA = 0.25  # trend smoothing (binary-exact fraction)
HOLT_H = 7  # forecast horizon (days)


def q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend exponential smoothing over daily revenue —
    the workhorse short-horizon forecaster (level + trend recursions),
    with a 7-day out-of-sample forecast appended. The recursion is NOT
    associative (each state depends on the previous), so it runs as an
    Arrow ``applyInPandas`` scan over the BOUNDED daily series (≤ |days|
    rows — the facts were already aggregated away; a single task over
    30 rows, not a fact-sized stage). The DuckDB oracle replays the
    identical recursion as a RECURSIVE CTE: both engines execute the
    same double ops in the same order, so the smoothed states are
    bit-identical (α, β are binary-exact fractions).

    Output rows: one per observed day (actual, level, trend, the
    one-step-ahead fit l+b from the PREVIOUS state) and one per
    forecast step h = 1..7 (actual NULL, forecast = l_T + h·b_T)."""
    import pandas as pd

    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.sum(_cents(F.col("value"))).alias("cents"))
    )

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        if len(pdf) < 2:
            # the trend seed needs two points; fail loud rather than
            # emit a degenerate forecast (the oracle would NULL-poison
            # silently on the same input)
            raise ValueError(
                "holt_forecast needs >= 2 daily observations, got "
                f"{len(pdf)}"
            )
        y = (pdf["cents"] / 100.0).to_list()
        days = pdf["day"].to_list()
        lev, tr = y[0], y[1] - y[0]
        out = [
            {
                "day": days[0].strftime("%Y-%m-%d"),
                "h": 0,
                "actual": round(y[0], 6),
                "level": round(lev, 6),
                "trend": round(tr, 6),
                "fitted": None,
            }
        ]
        for t in range(1, len(y)):
            fit = lev + tr
            new_lev = HOLT_ALPHA * y[t] + (1 - HOLT_ALPHA) * (lev + tr)
            tr = HOLT_BETA * (new_lev - lev) + (1 - HOLT_BETA) * tr
            lev = new_lev
            out.append(
                {
                    "day": days[t].strftime("%Y-%m-%d"),
                    "h": 0,
                    "actual": round(y[t], 6),
                    "level": round(lev, 6),
                    "trend": round(tr, 6),
                    "fitted": round(fit, 6),
                }
            )
        import datetime

        for h in range(1, HOLT_H + 1):
            out.append(
                {
                    "day": (days[-1] + datetime.timedelta(days=h)).strftime(
                        "%Y-%m-%d"
                    ),
                    "h": h,
                    "actual": None,
                    "level": None,
                    "trend": None,
                    "fitted": round(lev + h * tr, 6),
                }
            )
        return pd.DataFrame(out)

    return (
        daily.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            holt,
            schema="day string, h long, actual double, level double, "
            "trend double, fitted double",
        )
    )


# SPRT design: H0 p=0.4 vs H1 p=0.5, alpha = beta = 0.05. The per-
# observation log-likelihood-ratio increments and the Wald boundaries
# are PYTHON-computed literals embedded identically in both engines, so
# the running LLR is integer-count arithmetic x two constants — exact.
SPRT_L1 = 0.22314355131420976  # ln(p1/p0), added per conversion
SPRT_L0 = -0.1823215567939546  # ln((1-p1)/(1-p0)), added per miss
SPRT_UPPER = 2.9444389791664403  # ln((1-beta)/alpha) → accept H1
SPRT_LOWER = -2.9444389791664403  # ln(beta/(1-alpha)) → accept H0


def q_sprt_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's Sequential Probability Ratio Test per experiment variant:
    users arrive ordered by their first event, each contributes a
    conversion outcome, and the running log-likelihood ratio
    LLR_n = converts·L1 + misses·L0 stops the experiment the moment it
    crosses a Wald boundary — the sequential test that ends experiments
    in a fraction of the fixed-horizon sample size.

    Exactness: LLR is two integer running counts times two embedded
    literals — no cross-engine float accumulation at all. Shape: one
    per-user aggregate, then the running counts come from ONE total
    order over (variant, first_ts, user_id) via the distributed
    ``global_positions`` / ``global_running_sum`` primitives — a
    window partitioned on the |variants|-valued key would cap the
    stage at |variants| tasks (the entity-resolution ceiling class);
    the range-partitioned form parallelizes regardless of how few
    variants there are. Per-variant counts subtract a bounded
    |variants|-row prefix offset."""
    from pb_etl_spark.operators.corpus import (
        global_positions,
        global_running_sum,
    )

    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= KM_CONV_VALUE),
                1,
            ).otherwise(0)
        ).alias("x"),
    )
    base = per_user.withColumn(
        "variant", F.when(F.col("user_id") % 2 == 0, "A").otherwise("B")
    )
    order = ["variant", "first_ts", "user_id"]
    pos_df = global_positions(spark, base, order)
    cum_base = global_running_sum(spark, base, order, "x")
    cum_df = cum_base.select(
        F.col("variant").alias("v3"),
        F.col("first_ts").alias("ft3"),
        F.col("user_id").alias("u3"),
        F.col("cum").alias("cum_x"),
    )
    # bounded per-variant prefix offsets (|variants| rows on the driver)
    vt = sorted(
        base.groupBy("variant")
        .agg(F.sum("x").alias("tx"), F.count(F.lit(1)).alias("tn"))
        .collect(),
        key=lambda r: r["variant"],
    )
    x_off, n_off, ax, an = {}, {}, 0, 0
    for r in vt:
        x_off[r["variant"]], n_off[r["variant"]] = ax, an
        ax += r["tx"]
        an += r["tn"]
    x_off_c = F.create_map(*[F.lit(v) for kv in x_off.items() for v in kv])
    n_off_c = F.create_map(*[F.lit(v) for kv in n_off.items() for v in kv])
    obs = (
        pos_df.join(
            cum_df,
            (F.col("variant") == F.col("v3"))
            & (F.col("first_ts") == F.col("ft3"))
            & (F.col("user_id") == F.col("u3")),
        )
        .withColumn("c1", F.col("cum_x") - x_off_c[F.col("variant")])
        .withColumn("rn", F.col("pos") - n_off_c[F.col("variant")])
        .withColumn("c0", F.col("rn") - F.col("c1"))
        .withColumn(
            "llr",
            F.col("c1") * F.lit(SPRT_L1) + F.col("c0") * F.lit(SPRT_L0),
        )
        .withColumn(
            "crossed",
            (F.col("llr") >= SPRT_UPPER) | (F.col("llr") <= SPRT_LOWER),
        )
    )
    firsts = obs.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_obs_total"),
        F.min(F.when(F.col("crossed"), F.col("rn"))).alias("stop_rn"),
    )
    at_stop = obs.select(
        F.col("variant").alias("v2"), F.col("rn").alias("rn2"), "llr"
    )
    return (
        firsts.withColumn(
            "n_at_decision", F.coalesce("stop_rn", "n_obs_total")
        )
        .join(
            at_stop,
            (F.col("variant") == F.col("v2"))
            & (F.col("n_at_decision") == F.col("rn2")),
        )
        .select(
            "variant",
            "n_obs_total",
            "n_at_decision",
            F.when(F.col("stop_rn").isNull(), F.lit("continue"))
            .when(F.col("llr") >= SPRT_UPPER, F.lit("accept_h1"))
            .otherwise(F.lit("accept_h0"))
            .alias("decision"),
            F.round("llr", 6).alias("llr_at_decision"),
        )
    )


ATTR_CREDIT_SCALE = 60  # lcm(1..5): |event types| ≤ 5 ⇒ exact splits


def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-weight) multi-touch attribution: each user's
    purchase revenue is split equally across the DISTINCT channels
    (event types) they touched. The split stays INTEGER-EXACT by
    crediting in 1/60-cent units — 60 = lcm(1..5) is divisible by any
    possible channel count, so cents·60/n_channels is an exact integer
    and per-channel sums are order-independent (a naive cents/n double
    split would accumulate cross-engine drift). Complements
    q_attribution_first_touch (the single-touch model).

    Shape: one per-user channel-set aggregate, one per-user revenue
    aggregate, a channel explode bounded by |event types|, one grouped
    integer sum."""
    ev = read_table(spark, sf_dir, "events")
    touches = ev.select("user_id", F.col("event_type").alias("channel")).distinct()
    n_ch = touches.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_channels"))
    revenue = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(_cents(F.col("value"))).alias("rev_cents"))
    )
    credits = (
        touches.join(n_ch, "user_id")
        .join(revenue, "user_id")
        .select(
            "channel",
            # integer `div`: exact because n_channels divides the lcm
            # scale — double division + cast would truncate on Spark
            # but ROUND on DuckDB once the numerator passes 2^53
            F.expr(
                f"(rev_cents * {ATTR_CREDIT_SCALE}) div n_channels"
            ).alias("units"),
        )
    )
    return (
        credits.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("units").alias("credit_units"),
        )
        .select(
            "channel",
            "n_users",
            F.round(
                F.col("credit_units").cast("double") / ATTR_CREDIT_SCALE / 100.0,
                6,
            ).alias("credited_revenue"),
        )
    )


def q_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity heatmap — the load-profile
    matrix behind capacity planning and campaign timing. One grouped
    count to the bounded 7×24 frame; shares divide by a 1-row total.
    All integers except the final share."""
    ev = read_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.dayofweek("ts").cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hod"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    total = cells.agg(F.sum("n_events").alias("n"))
    return cells.crossJoin(F.broadcast(total)).select(
        "dow",
        "hod",
        "n_events",
        F.round(F.col("n_events").cast("double") / F.col("n"), 6).alias("share"),
    )


def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU) + same-day actives (DAU) per
    calendar day — the sliding-window COUNT DISTINCT that naive SQL
    writes as a per-day self-join over the fact table.

    Scale shape: dedup events to (user, day) pairs FIRST (a hash
    aggregate that shrinks the input by the per-user daily event rate),
    then explode each pair onto the ≤7 report days it can serve, and
    hash-aggregate COUNT(DISTINCT user) per report day. Shuffle volume
    is 7×|distinct pairs| — linear, no self-join, no per-day rescan.
    The trailing window is exact (not HLL); swap count_distinct for
    approx_count_distinct when a 100 TB fleet can tolerate ±2%.
    """
    ev = read_table(spark, sf_dir, "events")
    pairs = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    days = pairs.select("day").distinct()
    ex = pairs.select(
        "user_id",
        "day",
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr(f"interval {ROLLING_DAYS - 1} days"),
                F.expr("interval 1 day"),
            )
        ).alias("rday"),
    )
    return (
        ex.join(days.select(F.col("day").alias("rday")), "rday")
        .groupBy("rday")
        .agg(
            F.count_distinct("user_id").alias("active_7d"),
            F.count_distinct(
                F.when(F.col("day") == F.col("rday"), F.col("user_id"))
            ).alias("active_1d"),
        )
        .select(
            F.date_format("rday", "yyyy-MM-dd").alias("day"),
            "active_7d",
            "active_1d",
        )
    )


def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next = dst | current = src), with transition counts.
    The behavioral-model fit that powers next-action prediction and
    anomalous-session scoring.

    Scale shape: ONE window pass per user (shuffle on user_id) emits the
    (src, dst) stream; counts hash-aggregate to a |types|² frame, and
    the probability normalization windows over THAT bounded frame (≤25
    rows here), never the fact table."""
    ev = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    w_src = W.partitionBy("src")  # bounded: rows = |event types|²
    return pairs.select(
        "src",
        "dst",
        "n_transitions",
        F.round(
            F.col("n_transitions")
            / F.sum("n_transitions").over(w_src),
            6,
        ).alias("prob"),
    )


def q_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC candlesticks over event values: open/close = first/
    last value in the hour (ordered by ts, event_id), high/low = max/min,
    volume = exact cents-grid sum — the canonical timeseries downsample.

    Scale shape: two row_number windows partitioned BY THE HOUR (naturally
    bounded partitions), then one hash aggregate per hour. open/close
    are single picked values and high/low are order-free extremes, so
    every output is cross-engine exact."""
    ev = read_table(spark, sf_dir, "events").withColumn(
        "hour", F.date_trunc("hour", F.col("ts"))
    )
    w_asc = W.partitionBy("hour").orderBy("ts", "event_id")
    w_desc = W.partitionBy("hour").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.select(
            "hour",
            "value",
            F.row_number().over(w_asc).alias("rn_a"),
            F.row_number().over(w_desc).alias("rn_d"),
        )
        .groupBy("hour")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            (F.sum(_cents(F.col("value"))).cast("double") / F.lit(100.0)).alias(
                "volume"
            ),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "open",
            "high",
            "low",
            "close",
            "volume",
            "n_events",
        )
    )


def q_attribution_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: each user's total purchase revenue is
    credited to the event type of their FIRST-ever event (their
    acquisition channel). Per channel: users acquired and exact
    cents-grid revenue.

    Scale shape: one window pass per user picks the first touch, one
    hash aggregate per user sums purchase cents, one broadcastable join
    stitches them, and the final aggregate is |channels|-sized. No
    self-joins, no fact-sized windows without a partition key."""
    ev = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    firsts = (
        ev.select(
            "user_id",
            F.col("event_type").alias("channel"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    revenue = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(_cents(F.col("value"))).alias("rev_cents"))
    )
    return (
        firsts.join(revenue, "user_id", "left")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            (
                F.sum(F.coalesce(F.col("rev_cents"), F.lit(0))).cast("double")
                / F.lit(100.0)
            ).alias("attributed_revenue"),
        )
    )


def q_twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average value (TWAP): each event's value
    holds until the user's next event; the average weighs each value by
    its holding time. The standard fix for irregularly-sampled series
    where a plain AVG over-counts burst periods.

    Exactness: weights are integer milliseconds, values integer cents —
    Σ cents·ms is pure int64 (max ~8.6e15 at 30-day spans, far inside
    int64), so the only float op is one final division. A user whose
    intervals all have ZERO duration (events batch-ingested with
    colliding timestamps) gets an explicit NULL twap on BOTH engines —
    unguarded, Spark's double 0/0 is NaN while DuckDB's is NULL, the
    engine divergence this module guards everywhere (r13 review
    finding; same class as time_bounded_funnel's guard). Scale shape:
    one lead() window pass and one hash aggregate, keyed on user_id."""
    ev = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    spans = (
        ev.select(
            "user_id",
            _cents(F.col("value")).alias("cents"),
            F.unix_micros("ts").alias("us"),
            F.unix_micros(F.lead("ts").over(w)).alias("next_us"),
        )
        .filter(F.col("next_us").isNotNull())
        .withColumn("dt_ms", ((F.col("next_us") - F.col("us")) / 1000).cast("long"))
    )
    return spans.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.when(
            F.sum("dt_ms") > 0,
            F.sum(F.col("cents") * F.col("dt_ms")).cast("double")
            / F.sum("dt_ms").cast("double")
            / F.lit(100.0),
        ).alias("twap_value"),
    )


def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user CUSUM drift statistic: the maximum absolute deviation of
    the running value sum from its expected trajectory (k/N of the user
    total) — the classic changepoint / level-shift detector, reported as
    max |CUSUM| per user. High values flag users whose value stream
    shifted regime mid-window.

    Exactness: with prefix_k and S on the cents grid, the deviation
    prefix_k − (k/N)·S is scaled by N to N·prefix_k − k·S — pure int64
    (≤ ~2e8 per user here; ≤ N·S in general), max'd exactly, and divided
    once at the end. Scale shape: one cumulative window pass (UNBOUNDED
    PRECEDING — exact integer prefix sums) plus one hash aggregate, both
    keyed on user_id."""
    ev = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_all = W.partitionBy("user_id")
    rows = ev.select(
        "user_id",
        _cents(F.col("value")).alias("cents"),
        F.row_number().over(w).alias("k"),
        F.sum(_cents(F.col("value")))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("prefix"),
    ).select(
        "user_id",
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("cents").over(w_all).alias("total"),
        "k",
        "prefix",
    )
    return (
        rows.withColumn(
            "scaled",
            F.abs(F.col("n") * F.col("prefix") - F.col("k") * F.col("total")),
        )
        .groupBy("user_id")
        .agg(
            F.max("n").cast("long").alias("n_events"),
            (
                F.max("scaled").cast("double")
                / (F.max("n") * F.lit(100.0))
            ).alias("max_cusum"),
        )
    )


def q_sequence_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral anomaly score: the average negative
    log-likelihood of the user's event-type sequence under the GLOBAL
    first-order transition model (the scoring side of
    q_event_transition_matrix) — users whose click-streams don't look
    like the population's surface as high-NLL outliers; the classic
    Markov sequence-anomaly detector.

    Every per-user transition exists in the global matrix by
    construction (it contributed to the counts), so no smoothing is
    needed and the model join never drops rows. Exactness: each
    transition's cost −ln P(dst|src) is quantized once to int64 nanos
    (one deterministic op per MATRIX CELL, ≤ |types|²), per-user totals
    are integer sums, and the final division is one double op. Scale
    shape: one lead() window pass per user, one hash aggregate to the
    bounded pair counts, a broadcast model join, one per-user aggregate."""
    ev = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        "user_id",
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    # bounded |types|² model: per-(src,dst) count and per-src total
    model = (
        trans.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_sd"))
        .withColumn(
            "n_s", F.sum("n_sd").over(W.partitionBy("src"))
        )
        .select(
            "src",
            "dst",
            F.round(
                -F.log(F.col("n_sd") / F.col("n_s")) * F.lit(1e9), 0
            )
            .cast("long")
            .alias("cost_nano"),
        )
    )
    return (
        trans.join(F.broadcast(model), ["src", "dst"])
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            (
                F.sum("cost_nano").cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(1e9)
            ).alias("avg_nll"),
        )
    )


def q_ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B experiment: users split into
    variants by user_id parity (the deterministic stand-in for an
    assignment table), conversion = the user ever purchased. Reports per
    variant (users, converters, rate) and a ('__test__', …) row with the
    pooled-variance z-score — the decision statistic of every
    experimentation platform.

    Exactness: per-variant rows derive from four integers; the z-score
    is one deterministic chain of double ops on those integers (no
    cross-engine sums), rounded at 6 dp off-grid. Scale shape: one
    per-user aggregate, one |variants|-row aggregate, a bounded pivot —
    nothing fact-sized past the first groupBy."""
    ev = read_table(spark, sf_dir, "events")
    # conversion = a HIGH-VALUE purchase (>= 150): every fixture user
    # purchases eventually, so plain "ever purchased" is degenerate
    # (pool = 1, no variance); the premium event converts ~45%
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 150),
                1,
            ).otherwise(0)
        ).alias("converted")
    )
    per_variant = (
        per_user.withColumn(
            "variant",
            F.when(F.col("user_id") % 2 == 0, "A").otherwise("B"),
        )
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("converted").cast("long").alias("n_converted"),
        )
    )
    wide = per_variant.groupBy().pivot("variant", ["A", "B"]).agg(
        F.first("n_users").alias("n"), F.first("n_converted").alias("c")
    )
    # pooled two-proportion z: (pA - pB) / sqrt(p(1-p)(1/nA + 1/nB)).
    # Explicit double casts: long/long is INTEGER division under ANSI
    p_a = F.col("A_c").cast("double") / F.col("A_n")
    p_b = F.col("B_c").cast("double") / F.col("B_n")
    pool = (F.col("A_c") + F.col("B_c")).cast("double") / (
        F.col("A_n") + F.col("B_n")
    )
    z = (p_a - p_b) / F.sqrt(
        pool
        * (1 - pool)
        * (F.lit(1.0) / F.col("A_n") + F.lit(1.0) / F.col("B_n"))
    )
    test_row = wide.select(
        F.lit("__test__").alias("variant"),
        (F.col("A_n") + F.col("B_n")).cast("long").alias("n_users"),
        (F.col("A_c") + F.col("B_c")).cast("long").alias("n_converted"),
        # degenerate pools (all or none converted — tiny fixtures) have
        # zero pooled variance: no test statistic, NULL on both engines
        F.when((pool > 0) & (pool < 1), F.round(z, 6)).alias("metric"),
    )
    rates = per_variant.select(
        "variant",
        "n_users",
        "n_converted",
        F.round(
            F.col("n_converted").cast("double") / F.col("n_users"), 6
        ).alias("metric"),
    )
    return rates.unionByName(test_row)


def q_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution per acquisition channel: for users
    whose first-ever event (first touch) precedes a later purchase, the
    mean and median seconds from first touch to FIRST purchase, grouped
    by the first-touch event type. The latency readout every funnel
    dashboard pairs with conversion rates.

    Exactness: latencies are exact integer seconds (micros div 1e6 —
    integer division, not float), means are integer-sum ratios, and the
    median is Spark percentile ≡ DuckDB quantile_cont over identical
    integer inputs. One window cascade per user (single shuffle), then a
    bounded per-channel aggregate."""
    ev = read_table(spark, sf_dir, "events")
    w_u = W.partitionBy("user_id")
    per_event = ev.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.col("event_id"),
    ).withColumn(
        "first_us",
        F.min(F.struct("us", "event_id")).over(w_u)["us"],
    )
    firsts = (
        per_event.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id").orderBy("us", "event_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("channel"))
    )
    first_purch = (
        per_event.filter(
            (F.col("event_type") == "purchase") & (F.col("us") > F.col("first_us"))
        )
        .groupBy("user_id")
        .agg(
            F.min("us").alias("p_us"),
            F.min("first_us").alias("f_us"),
        )
        .select(
            "user_id",
            F.expr("(p_us - f_us) div 1000000").alias("latency_secs"),
        )
    )
    return (
        firsts.join(first_purch, "user_id")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_converters"),
            (
                F.sum("latency_secs").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_latency_secs"),
            F.percentile("latency_secs", F.lit(0.5)).alias(
                "median_latency_secs"
            ),
        )
    )


SEASONAL_TOPK = 10


def q_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal decomposition lite: the hour-of-day revenue profile
    (mean cents per hour-of-day across the month) and the TOP-K hours
    whose actual revenue deviates most from their seasonal expectation —
    the "unusual for 3 AM" detector that absolute thresholds can't
    express.

    Exactness: hourly actuals and the seasonal numerator/denominator are
    integer cents/counts; the expectation and residual are one double
    chain per row; ranking ties break on the hour string. Scale shape:
    facts shrink to ≤ |hours| rows, the 24-row profile broadcasts back,
    and the top-k is TakeOrderedAndProject — no global sort."""
    ev = read_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.sum(_cents(F.col("value"))).alias("cents")
    )
    profile = (
        hourly.withColumn("hod", F.hour("h").cast("long"))
        .groupBy("hod")
        .agg(
            F.sum("cents").alias("tot_cents"),
            F.count(F.lit(1)).alias("n_hours"),
        )
    )
    expected = F.col("tot_cents").cast("double") / F.col("n_hours")
    # rank on the RAW residual (the oracle's ORDER BY expression), round
    # only in the final projection — ordering by the 6-dp rounded column
    # could tie rows the oracle distinguishes at the LIMIT boundary
    raw_residual = (F.col("cents").cast("double") - expected) / 100.0
    return (
        hourly.withColumn("hod", F.hour("h").cast("long"))
        .join(F.broadcast(profile), "hod")
        .select(
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("h"),
            "hod",
            (F.col("cents").cast("double") / 100.0).alias("revenue"),
            F.round(expected / 100.0, 6).alias("expected_revenue"),
            F.round(raw_residual, 6).alias("residual"),
            raw_residual.alias("_raw_residual"),
        )
        .orderBy(F.abs(F.col("_raw_residual")).desc(), F.col("h"))
        .limit(SEASONAL_TOPK)
        .drop("_raw_residual")
    )


UCB_ARMS = 4  # variants assigned by user_id % UCB_ARMS
KM_CONV_VALUE = 150  # the high-value-purchase event (same bar as ab_test)


def q_ucb_bandit_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-armed-bandit arm scores over a 4-variant assignment
    (user_id % 4): per arm, trials, conversions (the ab_test high-value
    purchase), empirical rate, the UCB1 exploration bonus
    rate + sqrt(2·ln(N)/n), and the Beta(1,1)-posterior mean
    (s+1)/(n+2) — the nightly batch that feeds an online bandit's
    priors.

    Every score is one double chain over five integers (per-arm n, s and
    the global N), so the |arms|-row output is grid-exact. Shape: one
    per-user aggregate (the only fact-sized shuffle), one |arms|-row
    aggregate, a 1-row total crossJoin."""
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= KM_CONV_VALUE),
                1,
            ).otherwise(0)
        ).alias("converted")
    )
    arms = (
        per_user.withColumn(
            "arm", F.concat(F.lit("arm"), (F.col("user_id") % UCB_ARMS))
        )
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_trials"),
            F.sum("converted").alias("n_conversions"),
        )
    )
    total = arms.agg(F.sum("n_trials").alias("n_total"))
    rate = F.col("n_conversions").cast("double") / F.col("n_trials")
    return arms.crossJoin(F.broadcast(total)).select(
        "arm",
        "n_trials",
        "n_conversions",
        F.round(rate, 6).alias("mean_rate"),
        F.round(
            rate
            + F.sqrt(
                F.lit(2.0) * F.log(F.col("n_total").cast("double"))
                / F.col("n_trials")
            ),
            6,
        ).alias("ucb1"),
        F.round(
            (F.col("n_conversions") + 1.0) / (F.col("n_trials") + 2.0), 6
        ).alias("posterior_mean"),
    )


def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for time-to-first-high-value-purchase
    (days since the user's first event), right-censoring users who never
    convert at the last day of the observation window — the
    survival-analysis estimator product teams use for time-to-convert
    and churn, with censoring handled correctly (naive averages over
    converters only are biased).

    Per user: one grouped pass → (duration t, observed flag). Per
    distinct day t: d (events) and c (censorings); at_risk = N − rows
    seen before t (cumulative window over ≤ |days| rows — bounded by
    the 30-day fixture window); S(t) = Π(1 − d/n) via
    exp(cumsum(ln·)) — the cumulative (UNBOUNDED PRECEDING) frame both
    engines fold sequentially. Emitted only at event days (the standard
    KM step points)."""
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= KM_CONV_VALUE),
                F.to_date("ts"),
            )
        ).alias("conv_day"),
    )
    end = ev.agg(F.max(F.to_date("ts")).alias("end_day"))
    durations = per_user.crossJoin(F.broadcast(end)).select(
        F.when(
            F.col("conv_day").isNotNull(),
            F.datediff("conv_day", "first_day"),
        )
        .otherwise(F.datediff("end_day", "first_day"))
        .cast("long")
        .alias("t"),
        F.col("conv_day").isNotNull().cast("long").alias("observed"),
    )
    n_total = durations.agg(F.count(F.lit(1)).alias("n"))
    per_t = durations.groupBy("t").agg(
        F.sum("observed").alias("d"),
        F.sum(F.lit(1) - F.col("observed")).alias("c"),
    )
    w_prior = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    w_cum = W.orderBy("t").rowsBetween(W.unboundedPreceding, W.currentRow)
    at_risk = F.col("n") - F.coalesce(
        F.sum(F.col("d") + F.col("c")).over(w_prior), F.lit(0)
    )
    # ln(1 - d/n) is -inf when d == at_risk (risk set exhausted) — Spark
    # F.log(0) yields NULL (silently skipped by SUM) while DuckDB LN(0)
    # hard-errors, so the zero factor is handled EXPLICITLY: the row
    # sets a sticky flag and survival is 0 from there on; the log-sum
    # only ever sees strictly positive factors on both engines
    curve = (
        per_t.crossJoin(F.broadcast(n_total))
        .withColumn("at_risk", at_risk)
        .withColumn(
            "ln_factor",
            F.when(
                F.col("d") < F.col("at_risk"),
                F.log(
                    F.lit(1.0)
                    - F.col("d").cast("double") / F.col("at_risk")
                ),
            ),
        )
        .withColumn(
            "hit_zero",
            F.sum((F.col("d") == F.col("at_risk")).cast("long")).over(w_cum),
        )
        .withColumn(
            "surv",
            F.when(F.col("hit_zero") >= 1, F.lit(0.0)).otherwise(
                F.exp(F.sum("ln_factor").over(w_cum))
            ),
        )
    )
    return (
        curve.filter(F.col("d") > 0)
        .select(
            "t",
            "at_risk",
            "d",
            F.col("c").alias("censored"),
            F.round("surv", 6).alias("survival"),
        )
    )


QUERIES = {
    "ucb_bandit_scores": q_ucb_bandit_scores,
    "kaplan_meier": q_kaplan_meier,
    "holt_forecast": q_holt_forecast,
    "sprt_decision": q_sprt_decision,
    "attribution_linear": q_attribution_linear,
    "activity_heatmap": q_activity_heatmap,
    "rolling_active_users": q_rolling_active_users,
    "sequence_anomaly": q_sequence_anomaly,
    "ab_test_zscore": q_ab_test_zscore,
    "conversion_latency": q_conversion_latency,
    "seasonal_anomalies": q_seasonal_anomalies,
    "event_transition_matrix": q_event_transition_matrix,
    "ohlc_hourly": q_ohlc_hourly,
    "attribution_first_touch": q_attribution_first_touch,
    "twap_user_value": q_twap_user_value,
    "cusum_changepoint": q_cusum_changepoint,
}

ORACLES: dict[str, str] = {
    "holt_forecast": f"""
        WITH RECURSIVE daily AS (
            SELECT date_trunc('day', ts) AS day,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
            FROM events GROUP BY 1
        ), ser AS (
            SELECT day, CAST(cents AS DOUBLE) / 100.0 AS y,
                   ROW_NUMBER() OVER (ORDER BY day) AS rn
            FROM daily
        ), nmax AS (SELECT MAX(rn) AS n FROM ser),
        rec AS (
            SELECT s.rn, s.day, s.y AS actual,
                   s.y AS l,
                   (SELECT y FROM ser WHERE rn = 2) - s.y AS b,
                   CAST(NULL AS DOUBLE) AS fitted
            FROM ser s WHERE s.rn = 1
            UNION ALL
            SELECT s.rn, s.day, s.y,
                   {HOLT_ALPHA} * s.y + {1 - HOLT_ALPHA} * (r.l + r.b),
                   {HOLT_BETA} * (({HOLT_ALPHA} * s.y
                                   + {1 - HOLT_ALPHA} * (r.l + r.b)) - r.l)
                       + {1 - HOLT_BETA} * r.b,
                   r.l + r.b
            FROM rec r JOIN ser s ON s.rn = r.rn + 1
        ),
        observed AS (
            SELECT strftime(day, '%Y-%m-%d') AS day,
                   CAST(0 AS BIGINT) AS h,
                   ROUND(actual, 6) AS actual,
                   ROUND(l, 6) AS level,
                   ROUND(b, 6) AS trend,
                   ROUND(fitted, 6) AS fitted
            FROM rec
        ),
        last AS (
            SELECT r.day, r.l, r.b FROM rec r, nmax WHERE r.rn = nmax.n
        ),
        fc AS (
            SELECT strftime(last.day + h * INTERVAL '1 day',
                            '%Y-%m-%d') AS day,
                   CAST(h AS BIGINT) AS h,
                   CAST(NULL AS DOUBLE) AS actual,
                   CAST(NULL AS DOUBLE) AS level,
                   CAST(NULL AS DOUBLE) AS trend,
                   ROUND(last.l + h * last.b, 6) AS fitted
            FROM last, (SELECT UNNEST(RANGE(1, {HOLT_H + 1})) AS h)
        )
        SELECT * FROM observed UNION ALL SELECT * FROM fc
    """,
    "attribution_linear": f"""
        WITH touches AS (
            SELECT DISTINCT user_id, event_type AS channel FROM events
        ), n_ch AS (
            SELECT user_id, COUNT(*) AS n_channels FROM touches
            GROUP BY user_id
        ), revenue AS (
            SELECT user_id,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS rev_cents
            FROM events WHERE event_type = 'purchase' GROUP BY user_id
        ), credits AS (
            SELECT t.channel,
                   (r.rev_cents * {ATTR_CREDIT_SCALE}) // n.n_channels
                       AS units
            FROM touches t
            JOIN n_ch n ON t.user_id = n.user_id
            JOIN revenue r ON t.user_id = r.user_id
        )
        SELECT channel, COUNT(*) AS n_users,
               ROUND(CAST(SUM(units) AS DOUBLE) / {ATTR_CREDIT_SCALE} / 100.0,
                     6) AS credited_revenue
        FROM credits GROUP BY channel
    """,
    "activity_heatmap": """
        WITH cells AS (
            SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
                   CAST(hour(ts) AS BIGINT) AS hod,
                   COUNT(*) AS n_events
            FROM events GROUP BY 1, 2
        ), tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS n FROM cells)
        SELECT dow, hod, n_events,
               ROUND(CAST(n_events AS DOUBLE) / t.n, 6) AS share
        FROM cells CROSS JOIN tot t
    """,
    "sprt_decision": f"""
        WITH per_user AS (
            SELECT user_id, MIN(ts) AS first_ts,
                   MAX(CASE WHEN event_type = 'purchase'
                             AND value >= {KM_CONV_VALUE}
                            THEN 1 ELSE 0 END) AS x
            FROM events GROUP BY user_id
        ), obs AS (
            SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
                   user_id, first_ts, x
            FROM per_user
        ), cum AS (
            SELECT variant,
                   SUM(x) OVER wv AS c1,
                   SUM(1 - x) OVER wv AS c0,
                   ROW_NUMBER() OVER (PARTITION BY variant
                                      ORDER BY first_ts, user_id) AS rn
            FROM obs
            WINDOW wv AS (PARTITION BY variant ORDER BY first_ts, user_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ), scored AS (
            SELECT variant, rn,
                   -- CAST: a bare decimal literal makes bigint*literal
                   -- an exact-DECIMAL chain in DuckDB, which can round
                   -- differently from Spark's double chain at a 6-dp
                   -- boundary
                   c1 * CAST({SPRT_L1!r} AS DOUBLE)
                       + c0 * CAST({SPRT_L0!r} AS DOUBLE) AS llr
            FROM cum
        ), firsts AS (
            SELECT variant, COUNT(*) AS n_obs_total,
                   MIN(CASE WHEN llr >= CAST({SPRT_UPPER!r} AS DOUBLE)
                              OR llr <= CAST({SPRT_LOWER!r} AS DOUBLE)
                            THEN rn END) AS stop_rn
            FROM scored GROUP BY variant
        )
        SELECT f.variant, f.n_obs_total,
               COALESCE(f.stop_rn, f.n_obs_total) AS n_at_decision,
               CASE WHEN f.stop_rn IS NULL THEN 'continue'
                    WHEN s.llr >= CAST({SPRT_UPPER!r} AS DOUBLE)
                        THEN 'accept_h1'
                    ELSE 'accept_h0' END AS decision,
               ROUND(s.llr, 6) AS llr_at_decision
        FROM firsts f
        JOIN scored s ON s.variant = f.variant
                     AND s.rn = COALESCE(f.stop_rn, f.n_obs_total)
    """,
    "ucb_bandit_scores": f"""
        WITH per_user AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'purchase'
                             AND value >= {KM_CONV_VALUE}
                            THEN 1 ELSE 0 END) AS converted
            FROM events GROUP BY user_id
        ), arms AS (
            SELECT 'arm' || CAST(user_id % {UCB_ARMS} AS VARCHAR) AS arm,
                   COUNT(*) AS n_trials,
                   CAST(SUM(converted) AS BIGINT) AS n_conversions
            FROM per_user GROUP BY 1
        ), tot AS (SELECT SUM(n_trials) AS n_total FROM arms)
        SELECT arm, n_trials, n_conversions,
               ROUND(CAST(n_conversions AS DOUBLE) / n_trials, 6)
                   AS mean_rate,
               ROUND(CAST(n_conversions AS DOUBLE) / n_trials
                     + SQRT(2.0 * LN(CAST(n_total AS DOUBLE)) / n_trials),
                     6) AS ucb1,
               ROUND((n_conversions + 1.0) / (n_trials + 2.0), 6)
                   AS posterior_mean
        FROM arms CROSS JOIN tot
    """,
    "kaplan_meier": f"""
        WITH per_user AS (
            SELECT user_id,
                   MIN(CAST(ts AS DATE)) AS first_day,
                   MIN(CASE WHEN event_type = 'purchase'
                             AND value >= {KM_CONV_VALUE}
                            THEN CAST(ts AS DATE) END) AS conv_day
            FROM events GROUP BY user_id
        ), e AS (SELECT MAX(CAST(ts AS DATE)) AS end_day FROM events),
        durations AS (
            SELECT CAST(CASE WHEN conv_day IS NOT NULL
                             THEN date_diff('day', first_day, conv_day)
                             ELSE date_diff('day', first_day, e.end_day)
                        END AS BIGINT) AS t,
                   CAST(CASE WHEN conv_day IS NOT NULL THEN 1 ELSE 0 END
                        AS BIGINT) AS observed
            FROM per_user CROSS JOIN e
        ), nt AS (SELECT COUNT(*) AS n FROM durations),
        per_t AS (
            SELECT t, SUM(observed) AS d, SUM(1 - observed) AS c
            FROM durations GROUP BY t
        ), cum AS (
            SELECT t, d, c,
                   nt.n - COALESCE(SUM(d + c) OVER (
                              ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS at_risk
            FROM per_t CROSS JOIN nt
        ), curve AS (
            SELECT t, d, c, at_risk,
                   CASE WHEN SUM(CASE WHEN d = at_risk THEN 1 ELSE 0 END)
                             OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                                   PRECEDING AND CURRENT ROW) >= 1
                        THEN 0.0
                        ELSE EXP(SUM(CASE WHEN d < at_risk
                                          THEN LN(1.0 - CAST(d AS DOUBLE)
                                                  / at_risk) END) OVER (
                                 ORDER BY t ROWS BETWEEN UNBOUNDED
                                      PRECEDING AND CURRENT ROW))
                   END AS surv
            FROM cum
        )
        SELECT t, CAST(at_risk AS BIGINT) AS at_risk,
               CAST(d AS BIGINT) AS d,
               CAST(c AS BIGINT) AS censored,
               ROUND(surv, 6) AS survival
        FROM curve WHERE d > 0
    """,
    "seasonal_anomalies": f"""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS h,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
            FROM events GROUP BY 1
        ), profile AS (
            SELECT CAST(hour(h) AS BIGINT) AS hod,
                   SUM(cents) AS tot_cents,
                   COUNT(*) AS n_hours
            FROM hourly GROUP BY 1
        )
        SELECT strftime(h.h, '%Y-%m-%d %H:%M:%S') AS h,
               p.hod,
               CAST(CAST(h.cents AS BIGINT) AS DOUBLE) / 100.0 AS revenue,
               ROUND(CAST(CAST(p.tot_cents AS BIGINT) AS DOUBLE)
                     / p.n_hours / 100.0, 6) AS expected_revenue,
               ROUND((CAST(h.cents AS BIGINT)
                      - CAST(CAST(p.tot_cents AS BIGINT) AS DOUBLE)
                        / p.n_hours) / 100.0, 6) AS residual
        FROM hourly h JOIN profile p ON CAST(hour(h.h) AS BIGINT) = p.hod
        ORDER BY ABS(CAST(h.cents AS BIGINT)
                     - CAST(CAST(p.tot_cents AS BIGINT) AS DOUBLE)
                       / p.n_hours) DESC, h.h
        LIMIT {SEASONAL_TOPK}
    """,
    "ab_test_zscore": """
        WITH per_user AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'purchase' AND value >= 150
                            THEN 1 ELSE 0 END) AS converted
            FROM events GROUP BY user_id
        ), pv AS (
            SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
                   COUNT(*) AS n_users,
                   CAST(SUM(converted) AS BIGINT) AS n_converted
            FROM per_user GROUP BY 1
        ), wide AS (
            SELECT
                MAX(CASE WHEN variant = 'A' THEN n_users END) AS a_n,
                MAX(CASE WHEN variant = 'A' THEN n_converted END) AS a_c,
                MAX(CASE WHEN variant = 'B' THEN n_users END) AS b_n,
                MAX(CASE WHEN variant = 'B' THEN n_converted END) AS b_c
            FROM pv
        )
        SELECT variant, n_users, n_converted,
               ROUND(CAST(n_converted AS DOUBLE) / n_users, 6) AS metric
        FROM pv
        UNION ALL
        SELECT '__test__',
               CAST(a_n + b_n AS BIGINT),
               CAST(a_c + b_c AS BIGINT),
               CASE WHEN a_c + b_c > 0 AND a_c + b_c < a_n + b_n THEN
                   ROUND((CAST(a_c AS DOUBLE) / a_n - CAST(b_c AS DOUBLE) / b_n)
                         / SQRT((CAST(a_c + b_c AS DOUBLE) / (a_n + b_n))
                                * (1 - CAST(a_c + b_c AS DOUBLE) / (a_n + b_n))
                                * (1.0 / a_n + 1.0 / b_n)), 6)
               END
        FROM wide
    """,
    "conversion_latency": """
        WITH pe AS (
            SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
                   MIN(ROW(epoch_us(ts), event_id)) OVER (
                       PARTITION BY user_id) AS first_pair
            FROM events
        ), pe2 AS (
            SELECT user_id, event_type, us, event_id,
                   first_pair[1] AS first_us
            FROM pe
        ), firsts AS (
            SELECT user_id, event_type AS channel FROM (
                SELECT user_id, event_type,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY us, event_id) AS rn
                FROM pe2
            ) WHERE rn = 1
        ), fp AS (
            SELECT user_id,
                   (MIN(us) - MIN(first_us)) // 1000000 AS latency_secs
            FROM pe2
            WHERE event_type = 'purchase' AND us > first_us
            GROUP BY user_id
        )
        SELECT f.channel,
               COUNT(*) AS n_converters,
               CAST(CAST(SUM(fp.latency_secs) AS BIGINT) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS mean_latency_secs,
               quantile_cont(fp.latency_secs, 0.5) AS median_latency_secs
        FROM firsts f JOIN fp ON f.user_id = fp.user_id
        GROUP BY f.channel
    """,
    "sequence_anomaly": """
        WITH trans AS (
            SELECT user_id, event_type AS src,
                   LEAD(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS dst
            FROM events
        ), t AS (
            SELECT user_id, src, dst FROM trans WHERE dst IS NOT NULL
        ), model AS (
            SELECT src, dst,
                   CAST(ROUND(-LN(CAST(n_sd AS DOUBLE)
                                  / SUM(n_sd) OVER (PARTITION BY src))
                              * 1000000000.0) AS BIGINT) AS cost_nano
            FROM (SELECT src, dst, COUNT(*) AS n_sd FROM t GROUP BY 1, 2)
        )
        SELECT t.user_id,
               COUNT(*) AS n_transitions,
               CAST(CAST(SUM(model.cost_nano) AS BIGINT) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) / 1000000000.0 AS avg_nll
        FROM t JOIN model ON t.src = model.src AND t.dst = model.dst
        GROUP BY t.user_id
    """,
    "rolling_active_users": f"""
        WITH pairs AS (
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
        ), days AS (
            SELECT DISTINCT day FROM pairs
        ), ex AS (
            SELECT user_id, day,
                   unnest(generate_series(
                       day, day + INTERVAL {ROLLING_DAYS - 1} DAY,
                       INTERVAL 1 DAY)) AS rday
            FROM pairs
        )
        SELECT strftime(ex.rday, '%Y-%m-%d') AS day,
               CAST(COUNT(DISTINCT ex.user_id) AS BIGINT) AS active_7d,
               CAST(COUNT(DISTINCT CASE WHEN ex.day = ex.rday
                                        THEN ex.user_id END) AS BIGINT)
                   AS active_1d
        FROM ex JOIN days d ON ex.rday = d.day
        GROUP BY ex.rday
    """,
    "event_transition_matrix": """
        WITH pairs AS (
            SELECT event_type AS src,
                   LEAD(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS dst
            FROM events
        ), counts AS (
            SELECT src, dst, COUNT(*) AS n_transitions
            FROM pairs WHERE dst IS NOT NULL GROUP BY src, dst
        )
        SELECT src, dst, n_transitions,
               ROUND(CAST(n_transitions AS DOUBLE)
                     / SUM(n_transitions) OVER (PARTITION BY src), 6) AS prob
        FROM counts
    """,
    "ohlc_hourly": """
        WITH ranked AS (
            SELECT date_trunc('hour', ts) AS hour, value,
                   ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                                      ORDER BY ts, event_id) AS rn_a,
                   ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                                      ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM events
        )
        SELECT strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
               MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
                   AS volume,
               COUNT(*) AS n_events
        FROM ranked GROUP BY hour
    """,
    "attribution_first_touch": """
        WITH firsts AS (
            SELECT user_id, event_type AS channel
            FROM (
                SELECT user_id, event_type,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn
                FROM events
            ) WHERE rn = 1
        ), revenue AS (
            SELECT user_id,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS rev_cents
            FROM events WHERE event_type = 'purchase' GROUP BY user_id
        )
        SELECT f.channel,
               COUNT(*) AS n_users,
               CAST(CAST(SUM(COALESCE(r.rev_cents, 0)) AS BIGINT) AS DOUBLE)
                   / 100.0 AS attributed_revenue
        FROM firsts f LEFT JOIN revenue r ON f.user_id = r.user_id
        GROUP BY f.channel
    """,
    "twap_user_value": """
        WITH spans AS (
            SELECT user_id,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents,
                   (epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id))
                    - epoch_us(ts)) // 1000 AS dt_ms
            FROM events
        )
        SELECT user_id,
               COUNT(*) AS n_intervals,
               CASE WHEN SUM(dt_ms) > 0 THEN
                   CAST(CAST(SUM(cents * dt_ms) AS BIGINT) AS DOUBLE)
                       / CAST(CAST(SUM(dt_ms) AS BIGINT) AS DOUBLE)
                       / 100.0
               END AS twap_value
        FROM spans WHERE dt_ms IS NOT NULL
        GROUP BY user_id
    """,
    "cusum_changepoint": """
        WITH rows_g AS (
            SELECT user_id,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents,
                   ROW_NUMBER() OVER w AS k,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS prefix,
                   COUNT(*) OVER (PARTITION BY user_id) AS n,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                       PARTITION BY user_id) AS total
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id,
               CAST(MAX(n) AS BIGINT) AS n_events,
               CAST(CAST(MAX(ABS(n * prefix - k * total)) AS BIGINT) AS DOUBLE)
                   / (MAX(n) * 100.0) AS max_cusum
        FROM rows_g GROUP BY user_id
    """,
}
