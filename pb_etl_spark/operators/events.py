"""Event-table operators: JSON property extraction and time-window
aggregations (tumbling / sliding / session).

These are the batch twins of the Structured Streaming operators in
``pb_etl_spark.streaming`` — ``F.window`` / ``F.session_window`` produce
identical results over a bounded DataFrame, which is what makes them
oracle-checkable; the streaming module wires the same expressions to
``readStream`` + watermarks.

Window starts are emitted as formatted strings (session tz is UTC, see
session.py) so the Spark↔DuckDB comparison is timezone-representation-proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

from pb_etl_spark.catalog import read_table
from pb_etl_spark.operators.selection import (
    _KS_MWU_ORACLE,
    _PSI_ORACLE,
    _VOCAB_DRIFT_ORACLE,
)

FUNNEL_GAP_HOURS = 24  # per-step max gap for the time-bounded funnel
PM_JOURNEY_CAP = 10_000  # max events per user journey (state bound)
WALLET_SIGNUP_BONUS_CENTS = 10_000  # signup credit for the wallet scan

_TS_FMT = "yyyy-MM-dd HH:mm:ss"

PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType(), True)])


def q_event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern mining (the MATCH_RECOGNIZE use case, engine-
    portable): each user's journey becomes an ordered initial-letter
    string (v/c/p/s/e) via listagg WITHIN GROUP, and regexes classify
    the journeys — eventual funnel v.*c.*p, an IMMEDIATE vcp run, and
    error-recovery e[^e]*p (an error later followed by a purchase).
    Counts per pattern over all users.

    Scale shape: one per-user ordered string aggregation (shuffle on
    user_id), then regex classification + a 3-row rollup. Journeys are
    CAPPED at the user's first ``PM_JOURNEY_CAP`` events (mirrored in
    the oracle): an uncapped per-user lifetime string is unbounded
    aggregation state — a bot/integration user with 50M events would
    build a ~50MB single aggregation buffer in one task (r13 review
    finding; the earlier "same boundedness as a sessionizer" claim was
    wrong — sessionizer state is gap-bounded, a lifetime journey is
    not). The cap is a WindowGroupLimit-style rank filter, far above
    any real fixture journey, so fixture values are unchanged."""
    ev = read_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__pm_events")
    return spark.sql(
        f"""
        WITH ranked AS (
            SELECT user_id, event_type,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM __pm_events
        ),
        journeys AS (
            SELECT user_id,
                   listagg(substr(event_type, 1, 1), '')
                       WITHIN GROUP (ORDER BY rn) AS j
            FROM ranked WHERE rn <= {PM_JOURNEY_CAP} GROUP BY user_id
        )
        SELECT pattern, n_matching, n_users,
               ROUND(CAST(n_matching AS DOUBLE) / n_users, 6) AS share
        FROM (
            SELECT 'eventual_funnel' AS pattern,
                   CAST(SUM(CASE WHEN j RLIKE '^.*v.*c.*p.*$'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_matching,
                   COUNT(*) AS n_users
            FROM journeys
            UNION ALL
            SELECT 'immediate_vcp',
                   CAST(SUM(CASE WHEN j RLIKE '^.*vcp.*$'
                                 THEN 1 ELSE 0 END) AS BIGINT),
                   COUNT(*)
            FROM journeys
            UNION ALL
            SELECT 'error_then_purchase',
                   CAST(SUM(CASE WHEN j RLIKE '^.*e[^e]*p[^e]*$'
                                 THEN 1 ELSE 0 END) AS BIGINT),
                   COUNT(*)
            FROM journeys
        )
        """
    )


def q_json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSON ``props`` column with an explicit schema (from_json is
    JVM-side, codegen-friendly — no Python in the loop) and aggregate the
    extracted key per event type."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.withColumn("props_s", F.from_json("props", PROPS_SCHEMA))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg(F.col("props_s.k").cast("double")), 6).alias("avg_k"),
            F.sum(F.col("props_s.k")).alias("sum_k"),
        )
    )


def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (epoch-aligned, so equivalent to
    date_trunc('hour') in the oracle)."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), _TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1-hour width, 30-minute slide — every event lands in
    exactly two windows. Oracle reproduces it as a UNION ALL of the two
    half-hour-floored starts."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), _TS_FMT).alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user with a 5-minute inactivity gap
    (F.session_window). The oracle derives identical sessions with the
    classic lag/gap-flag/cumulative-sum idiom."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "5 minutes").alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), _TS_FMT).alias("session_start"),
            "n_events",
        )
    )


def q_sessionize_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization without session_window: per user, a session break is
    a >30-minute gap (lag), session ids are a running sum of breaks, then
    per-session rollup. Two window passes over one user-partitioned
    shuffle — the general pattern when session logic is richer than a
    fixed gap (e.g. campaign-aware breaks)."""
    from pyspark.sql.window import Window as W

    ev = read_table(spark, sf_dir, "events").withColumn(
        # exact integer micros on both engines (fractional epoch seconds
        # truncate differently); NTZ→LTZ cast is identity under UTC session tz
        "ts_us",
        F.unix_micros(F.col("ts").cast("timestamp")),
    )
    w_user = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap_us = F.col("ts_us") - F.lag("ts_us").over(w_user)
    with_breaks = ev.withColumn(
        "is_break", F.when(gap_us.isNull() | (gap_us > 1800 * 1_000_000), 1).otherwise(0)
    )
    with_sessions = with_breaks.withColumn(
        "session_no",
        F.sum("is_break").over(
            w_user.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return (
        with_sessions.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
            F.round(F.sum("value"), 6).alias("session_value"),
        )
    )


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel: users whose first 'view' precedes a later 'click' — per-user
    min timestamps compared, one grouped pass + conditional aggregation."""
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("first_view").alias("n_viewers"),
        F.sum(
            (
                F.col("first_view").isNotNull()
                & F.col("first_click").isNotNull()
                & (F.col("first_view") < F.col("first_click"))
            ).cast("long")
        ).alias("n_converted"),
    )


def q_strict_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict ordered funnel view → click → purchase: each step must
    happen strictly AFTER the previous step's earliest valid occurrence
    (the standard product-analytics funnel, vs q_funnel_conversion's
    loose two-step comparison). Greedy earliest-match semantics:
    t1 = first view, t2 = first click after t1, t3 = first purchase
    after t2 — greedy matching maximizes completion and is the
    industry-default funnel definition.

    Scale shape: the step cascade is THREE window expressions over the
    SAME user partition — one shuffle, one sort, reused by all three
    frames — then one per-user aggregate and one global count row. No
    joins, no self-matching of the event stream. Extending to k steps
    is k chained expressions in the same pass."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w_u = W.partitionBy("user_id")
    s = ev.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "view", F.col("us"))).over(w_u)
    )
    s = s.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("us") > F.col("t1")),
                F.col("us"),
            )
        ).over(w_u),
    )
    s = s.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("us") > F.col("t2")),
                F.col("us"),
            )
        ).over(w_u),
    )
    per_user = s.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t1").alias("n_viewed"),
        F.count("t2").alias("n_clicked_after_view"),
        F.count("t3").alias("n_purchased_after_click"),
    )


def q_event_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per (user, event_type), the longest run of
    CONSECUTIVE same-type events in the user's stream and how many such
    runs exist — the classic islands pattern (rn − rn_per_type is
    constant within a run), used for streak features and bot detection
    (abnormally long single-type runs).

    Scale shape: two row_numbers over the same user-keyed sort (one
    shuffle; the per-(user,type) window reuses the user partitioning's
    sort), then two hash aggregates with bounded output
    (|users|·|types|). No joins."""
    ev = read_table(spark, sf_dir, "events")
    w_u = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_ut = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    islands = (
        ev.select(
            "user_id",
            "event_type",
            (F.row_number().over(w_u) - F.row_number().over(w_ut)).alias(
                "grp"
            ),
        )
        .groupBy("user_id", "event_type", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return islands.groupBy("user_id", "event_type").agg(
        F.max("run_len").cast("long").alias("max_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-active day, distinct
    active users per (cohort, day-offset) for the first week. Two grouped
    passes + one join on user_id — the standard retention-curve shape."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("active_day")
    )
    first = ev.groupBy("user_id").agg(F.min("active_day").alias("cohort_day"))
    activity = ev.distinct()
    return (
        activity.join(first, "user_id")
        .withColumn("day_offset", F.datediff("active_day", "cohort_day").cast("long"))
        .filter(F.col("day_offset") <= 7)
        .groupBy(F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"), "day_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


def q_stream_ddsketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING DDSketch: the γ-bucket histogram maintained as
    Structured Streaming state — each micro-batch's bucket counts merge
    into the running cells by the aggregate itself (the sketch's
    additivity IS the streaming-state merge), state is bounded at
    ≤ |γ-buckets| (~630 rows) regardless of stream length, and quantile
    extraction runs as a bounded batch job over the drained histogram.
    Same cells, same extraction, same oracle family as the batch
    ``ddsketch_quantiles`` — over the events value stream."""
    from pb_etl_spark.operators.retrieval import (
        dd_bucket_expr,
        dd_quantiles_from_hist,
    )
    from pb_etl_spark.streaming.windows import (
        SKETCH_STATE_PARTITIONS,
        read_event_stream,
        run_to_memory,
    )

    sdf = read_event_stream(spark, sf_dir, glob="events.parquet")
    cents = F.round(F.col("value") * 100).cast("long")
    hist_stream = (
        sdf.select(cents.alias("cents"))
        .groupBy(dd_bucket_expr(F.col("cents")).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    hist = run_to_memory(
        hist_stream,
        "q_stream_ddsketch_hist",
        output_mode="complete",
        state_partitions=SKETCH_STATE_PARTITIONS,
    )
    return dd_quantiles_from_hist(spark, hist)


def q_stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GENUINELY STREAMING tumbling aggregation: Structured Streaming
    file source → watermark → windowed agg → availableNow drain into a
    memory sink. On bounded input the result equals the batch twin, so it
    shares q_tumbling_window's oracle — the streaming execution path
    itself is value-checked against DuckDB, not just its batch shadow."""
    from pb_etl_spark.streaming.windows import (
        read_event_stream,
        run_to_memory,
        tumbling_counts,
    )

    sdf = read_event_stream(spark, sf_dir, glob="events.parquet")
    return run_to_memory(
        tumbling_counts(sdf), "q_stream_tumbling_window", output_mode="complete"
    )


def q_stream_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming OHLC downsample: min_by/max_by open/close picks (the
    order-free formulation that streams — the batch twin's row_number
    windows cannot) through the same file-source → watermark →
    availableNow drain. Shares timeseries.q_ohlc_hourly's oracle: the
    streaming execution path is value-checked end to end."""
    from pb_etl_spark.streaming.windows import (
        ohlc_hourly_stream,
        read_event_stream,
        run_to_memory,
    )

    sdf = read_event_stream(spark, sf_dir, glob="events.parquet")
    return run_to_memory(
        ohlc_hourly_stream(sdf), "q_stream_ohlc_hourly", output_mode="complete"
    )


def q_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (gap-based, per user) drained with
    availableNow — shares the batch twin's oracle; the streaming
    session-merge state machinery itself is value-checked."""
    from pb_etl_spark.streaming.windows import (
        read_event_stream,
        run_to_memory,
        session_counts,
    )

    sdf = read_event_stream(spark, sf_dir, glob="events.parquet")
    return run_to_memory(
        session_counts(sdf), "q_stream_session_window", output_mode="complete"
    )


def q_stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sliding windows (1h/30m) drained with availableNow —
    shares the batch twin's oracle."""
    from pb_etl_spark.streaming.windows import (
        read_event_stream,
        run_to_memory,
        sliding_counts,
    )

    sdf = read_event_stream(spark, sf_dir, glob="events.parquet")
    return run_to_memory(
        sliding_counts(sdf), "q_stream_sliding_window", output_mode="complete"
    )


def q_stream_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    cumulative per-user totals. After a full availableNow drain the state
    holds exactly one (count, total) per user, so the result is the plain
    batch GROUP BY — oracle-checked (ROUND 6 absorbs accumulation-order
    float noise; tests additionally assert equality with the batch
    aggregate)."""
    from pb_etl_spark.streaming.windows import (
        read_event_stream,
        run_to_memory,
        user_totals_stateful,
    )

    sdf = read_event_stream(spark, sf_dir, glob="events.parquet")
    return run_to_memory(
        user_totals_stateful(sdf), "q_stream_user_totals", output_mode="update"
    )


def q_stream_user_stats_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator on Spark 4's transformWithState
    API (typed ValueState, init/close lifecycle) — the modern successor
    to q_stream_user_totals's applyInPandasWithState. After a full
    availableNow drain the state holds one (count, total, max) per user,
    so the result equals the plain batch GROUP BY — oracle-checked."""
    from pb_etl_spark.streaming.windows import (
        read_event_stream,
        run_to_memory,
        user_stats_tws,
    )

    sdf = read_event_stream(spark, sf_dir, glob="events.parquet")
    return run_to_memory(
        user_stats_tws(sdf), "q_stream_user_stats_tws", output_mode="update"
    )


def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genuinely-streaming stream-stream join: click and view streams of
    the same events source, inner-joined per user within a 1-hour
    event-time horizon (both sides watermarked so join state is evicted).
    On bounded input a full drain equals the batch range join — which is
    the oracle, so the streaming join + state-eviction path itself is
    value-checked."""
    from pb_etl_spark.streaming.windows import (
        read_event_stream,
        run_to_memory,
        stream_stream_join,
    )

    clicks = read_event_stream(spark, sf_dir, glob="events.parquet").filter(
        F.col("event_type") == "click"
    )
    views = read_event_stream(spark, sf_dir, glob="events.parquet").filter(
        F.col("event_type") == "view"
    )
    joined = stream_stream_join(clicks, views).select(
        F.col("click_id"), F.col("view_id"), F.col("c_user").alias("user_id")
    )
    return run_to_memory(joined, "q_stream_stream_join", output_mode="append")


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genuinely-streaming exact dedup: the events source unioned with
    ITSELF (every row arrives twice) then dropDuplicatesWithinWatermark on
    event_id — the drained output must contain each event exactly once,
    which the plain SELECT-per-event oracle checks. Exercises the
    streaming dedup state store with real duplicates, not a no-op pass."""
    from pb_etl_spark.streaming.windows import (
        dedup_within_watermark,
        read_event_stream,
        run_to_memory,
    )

    s1 = read_event_stream(spark, sf_dir, glob="events.parquet")
    s2 = read_event_stream(spark, sf_dir, glob="events.parquet")
    deduped = dedup_within_watermark(s1.unionByName(s2)).select(
        "event_id", "user_id", "event_type", F.round("value", 6).alias("value")
    )
    return run_to_memory(deduped, "q_stream_dedup", output_mode="append")


def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream left-joined per
    micro-batch to a STATIC per-user profile (computed batch-side from the
    same table). No stream-side state — the static side broadcasts into
    each batch. Oracle is the equivalent batch join."""
    from pb_etl_spark.streaming.windows import (
        read_event_stream,
        run_to_memory,
        stream_static_enrich,
    )

    user_dim = (
        read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("user_events"))
    )
    stream = read_event_stream(spark, sf_dir, glob="events.parquet").filter(
        F.col("event_id") < 2000
    )
    enriched = stream_static_enrich(stream, user_dim).select(
        "event_id", "user_id", "user_events"
    )
    return run_to_memory(enriched, "q_stream_enrich", output_mode="append")


def q_stream_foreach_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC ingestion end-to-end: the events stream drains
    through ``stream_upsert_parquet`` — each micro-batch is compacted to
    its latest row per user and MERGEd (foreachBatch + upsert_parquet)
    into a parquet 'silver table' — and the query returns the final
    table state: one row per user, the (ts, event_id)-latest event.
    Idempotent across batch replays (re-merging the same compacted batch
    is a no-op), so the drained state is deterministic and the plain
    batch keep-latest SQL is a true oracle of the whole
    stream→merge→table path."""
    import shutil
    import uuid
    from pathlib import Path

    from pb_etl_spark.streaming.windows import (
        read_event_stream,
        stream_upsert_parquet,
    )

    import time as _time

    root = Path(__file__).resolve().parents[2] / "spark-warehouse" / "stream_upsert"
    # sweep STALE run dirs (previous invocations) instead of this run's:
    # the returned DataFrame reads the persisted silver table directly —
    # the production shape, no driver round-trip — so this run's dir must
    # outlive the return. The age gate is deliberately LONG (6 h, vs
    # seconds-long drains and immediately-collected results here): a
    # run dir's mtime is its creation time, so the gate must exceed both
    # the longest plausible drain AND how long any consumer might hold
    # the returned (lazy, file-backed) DataFrame before evaluating it.
    # Garbage is bounded to one session's dirs either way.
    if root.is_dir():
        cutoff = _time.time() - 6 * 3600
        for old in root.iterdir():
            try:
                if old.is_dir() and old.stat().st_mtime < cutoff:
                    shutil.rmtree(old, ignore_errors=True)
            except OSError:
                pass
    base = root / uuid.uuid4().hex[:12]
    target, ckpt = str(base / "target"), str(base / "ckpt")
    sdf = read_event_stream(spark, sf_dir, glob="events.parquet")
    q = stream_upsert_parquet(sdf, target, key="user_id", ts_col="ts", checkpoint_dir=ckpt)
    q.awaitTermination()
    return spark.read.parquet(target).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_type"),
        F.round("value", 6).alias("last_value"),
    )


DOCS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _read_doc_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents parquet (explicit schema —
    streaming sources cannot infer)."""
    return (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def q_stream_doc_source_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus monitoring in COMPLETE output mode (the third
    mode — the window queries use append, the stateful ops update): the
    running per-source doc/char totals table is fully re-emitted each
    micro-batch; after a bounded drain it equals the batch GROUP BY,
    which is the oracle. This is the live ingest dashboard behind
    source_mix_report."""
    from pb_etl_spark.streaming.windows import (
        SKETCH_STATE_PARTITIONS,
        run_to_memory,
    )

    sdf = _read_doc_stream(spark, sf_dir)
    agg = sdf.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
    )
    return run_to_memory(
        agg,
        "q_stream_doc_source_counts",
        output_mode="complete",
        state_partitions=SKETCH_STATE_PARTITIONS,
    )


def q_stream_doc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming document pipeline: quality-gate then exact-dedup the
    incoming corpus ON THE STREAM — text fingerprints deduplicate via
    dropDuplicates (unbounded state; the watermarked variant is
    stream_dedup — documents carry no event time, so the state bound
    would come from a processing-time TTL in production). Streaming
    dropDuplicates keeps the FIRST arrival, which is nondeterministic
    under parallel file reads — so the registered result is the
    (fingerprint, text_len) survivor set, which is arrival-order
    independent and value-checked against batch DISTINCT SQL."""
    from pb_etl_spark.streaming.windows import run_to_memory

    sdf = _read_doc_stream(spark, sf_dir).filter(
        (F.length("text") > 50) & (F.col("lang") != "")
    )
    fp = sdf.select(
        F.md5("text").alias("fp"), F.length("text").alias("text_len")
    ).dropDuplicates(["fp"])
    out = run_to_memory(fp, "q_stream_doc_dedup", output_mode="append")
    return out.select("fp", F.col("text_len").cast("long").alias("text_len"))


def q_stream_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the ``ks_mann_whitney`` retrain gate — the
    drift monitor as it would ACTUALLY run in production: the compacted
    per-distinct-value cells frame ``(v, cnt_a, cnt_b)`` (token-count
    distribution of English vs non-English documents) is maintained ON
    THE STREAM as a complete-mode grouped aggregate — bounded state,
    ≤|distinct lengths| rows (~90), map-side combinable, regardless of
    how many micro-batches the corpus arrives in — and the exact KS +
    Mann-Whitney statistics are computed on the drained state with
    ``selection.two_sample_rank_tests`` UNCHANGED (all of its
    exactness/2^53-guard properties carry over because the statistics
    are functions of the cell counts alone). After the availableNow
    drain the state equals the batch compaction, so the batch oracle
    (`_KS_MWU_ORACLE`) is the oracle here too. At 100 TB the streaming
    leg shuffles only cell deltas per micro-batch; the test itself
    always runs on the sketch-sized frame."""
    from pb_etl_spark.operators.selection import two_sample_rank_tests
    from pb_etl_spark.streaming.windows import (
        SKETCH_STATE_PARTITIONS,
        run_to_memory,
    )

    sdf = _read_doc_stream(spark, sf_dir)
    is_a = (
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).cast("long")
    )
    cells = (
        sdf.select(
            F.size(F.split(F.col("text"), " ")).cast("long").alias("v"),
            is_a.alias("is_a"),
        )
        .groupBy("v")
        .agg(
            F.sum("is_a").alias("cnt_a"),
            F.sum(F.lit(1) - F.col("is_a")).alias("cnt_b"),
        )
    )
    state = run_to_memory(
        cells,
        "q_stream_drift_monitor_cells",
        output_mode="complete",
        state_partitions=SKETCH_STATE_PARTITIONS,
    )
    return two_sample_rank_tests(state)


def q_stream_psi_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the ``psi_drift`` retrain gate — the second
    face of the streaming drift family (r11 verdict item 5), built on
    the identical compacted-cells pattern as ``q_stream_drift_monitor``:
    the per-value-bucket cells frame ``(bucket, n_a, n_b)`` (first-half
    vs second-half-of-month counts of ``events.value``) is maintained ON
    THE STREAM as a complete-mode grouped aggregate — bounded state,
    ≤|buckets| rows (~21), map-side combinable, whatever the corpus
    size — and the exact PSI statistics run on the drained state with
    ``selection.psi_from_cells`` UNCHANGED (int64-nano terms, integer
    total — the cross-engine exactness carries over because PSI is a
    pure function of the cell counts). After the availableNow drain the
    state equals the batch compaction, so the batch oracle
    (``_PSI_ORACLE``) is the oracle here too. At 100 TB only cell
    deltas shuffle per micro-batch; the statistics always run on the
    sketch-sized frame."""
    from pb_etl_spark.operators.selection import (
        PSI_BUCKET_WIDTH,
        psi_from_cells,
    )
    from pb_etl_spark.streaming.windows import (
        SKETCH_STATE_PARTITIONS,
        read_event_stream,
        run_to_memory,
    )

    sdf = read_event_stream(spark, sf_dir, glob="events.parquet")
    cells = (
        sdf.select(
            F.floor(F.col("value") / PSI_BUCKET_WIDTH).alias("bucket"),
            F.when(F.dayofmonth("ts") <= 15, 1).otherwise(0).alias("in_a"),
        )
        .groupBy("bucket")
        .agg(
            F.sum("in_a").alias("n_a"),
            F.sum(1 - F.col("in_a")).alias("n_b"),
        )
    )
    state = run_to_memory(
        cells,
        "q_stream_psi_monitor_cells",
        output_mode="complete",
        state_partitions=SKETCH_STATE_PARTITIONS,
    )
    return psi_from_cells(state)


def q_stream_vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the ``vocab_drift`` retrain gate — the THIRD
    face of the streaming monitor family (r12 verdict item 6), on the
    identical compacted-cells pattern as ``stream_drift_monitor`` (KS/
    MWU) and ``stream_psi_monitor`` (PSI): the per-token cells frame
    ``(w, k11, k12)`` (occurrences in the "new" = odd-doc_id vs "old" =
    even-doc_id snapshot) is maintained ON THE STREAM as a complete-mode
    grouped aggregate — map-side combinable, state = |vocab| rows, which
    grows SUBLINEARLY with the corpus (Heaps' law), not with event
    count — and the exact Dunning-G² report runs on the drained state
    with ``selection.vocab_drift_from_cells`` UNCHANGED (all-integer
    cells, so the cross-engine exactness carries over: G² is a pure
    function of the cell counts). After the availableNow drain the state
    equals the batch compaction, so the batch oracle
    (``_VOCAB_DRIFT_ORACLE``) is the oracle here too. At 100 TB only
    per-token count deltas shuffle per micro-batch; the report always
    runs on the vocab-sized frame."""
    from pb_etl_spark.operators.corpus import _tokens
    from pb_etl_spark.operators.selection import vocab_drift_from_cells
    from pb_etl_spark.streaming.windows import (
        SKETCH_STATE_PARTITIONS,
        run_to_memory,
    )

    sdf = _read_doc_stream(spark, sf_dir)
    tok = sdf.select(
        (F.col("doc_id") % 2 == 1).alias("is_new"),
        F.explode(_tokens()).alias("w"),
    )
    cells = tok.groupBy("w").agg(
        F.sum(F.when(F.col("is_new"), 1).otherwise(0)).alias("k11"),
        F.sum(F.when(~F.col("is_new"), 1).otherwise(0)).alias("k12"),
    )
    state = run_to_memory(
        cells,
        "q_stream_vocab_drift_cells",
        output_mode="complete",
        state_partitions=SKETCH_STATE_PARTITIONS,
    )
    return vocab_drift_from_cells(state)


PATH_K = 3  # prefix length for path mining


def q_event_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path mining: each user's first-3-event-type sequence, counted
    across users and ranked — the "how do sessions start" product
    question. One user-partitioned window pass to rank events, a grouped
    string-agg to form paths (collect in explicit (ts, event_id) order —
    collect_list alone is partition-order-nondeterministic), and a
    count. Shuffles: one on user, one on path."""
    from pyspark.sql.window import Window as W

    ev = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    firstk = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PATH_K)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", F.col("event_type").alias("et")))
                    ),
                    lambda s: s["et"],
                ),
                ">",
            ).alias("path"),
            F.count(F.lit(1)).alias("path_len"),
        )
        .filter(F.col("path_len") == PATH_K)  # drop users with < K events
    )
    return (
        firstk.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), F.col("path").asc())
        .limit(20)
    )


def q_variant_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured aggregation through Spark 4's VARIANT type:
    ``parse_json`` → binary variant → typed ``variant_get`` path
    extraction — the schema-on-read path for props whose shape is NOT
    declared up front (the ``from_json`` twin above is the
    declared-schema hot path). Variant keeps parsing JVM-side with a
    binary-encoded value, so repeated path extraction skips re-parsing
    the JSON text per field — the right default when a 100 TB event
    stream carries heterogeneous payloads."""
    ev = read_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")
    return (
        ev.select((k % 10).alias("k_bucket"), k.alias("k"))
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg(F.col("k").cast("double")), 6).alias("avg_k"),
        )
    )


ORACLES: dict[str, str] = {
    "event_pattern_match": f"""
        WITH ranked AS (
            SELECT user_id, event_type,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ),
        journeys AS (
            SELECT user_id,
                   string_agg(substr(event_type, 1, 1), '' ORDER BY rn) AS j
            FROM ranked WHERE rn <= {PM_JOURNEY_CAP} GROUP BY user_id
        )
        SELECT pattern, n_matching, n_users,
               ROUND(CAST(n_matching AS DOUBLE) / n_users, 6) AS share
        FROM (
            SELECT 'eventual_funnel' AS pattern,
                   CAST(SUM(CASE WHEN regexp_matches(j, '^.*v.*c.*p.*$')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_matching,
                   COUNT(*) AS n_users
            FROM journeys
            UNION ALL
            SELECT 'immediate_vcp',
                   CAST(SUM(CASE WHEN regexp_matches(j, '^.*vcp.*$')
                                 THEN 1 ELSE 0 END) AS BIGINT),
                   COUNT(*)
            FROM journeys
            UNION ALL
            SELECT 'error_then_purchase',
                   CAST(SUM(CASE WHEN regexp_matches(j, '^.*e[^e]*p[^e]*$')
                                 THEN 1 ELSE 0 END) AS BIGINT),
                   COUNT(*)
            FROM journeys
        )
    """,
    "time_bounded_funnel": f"""
        WITH s1 AS (
            SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ), s2 AS (
            SELECT e.user_id, MIN(e.ts) AS t2
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click'
              AND e.ts > s1.t1
              AND e.ts <= s1.t1 + INTERVAL {FUNNEL_GAP_HOURS} HOUR
            GROUP BY e.user_id
        ), s3 AS (
            SELECT e.user_id, MIN(e.ts) AS t3
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase'
              AND e.ts > s2.t2
              AND e.ts <= s2.t2 + INTERVAL {FUNNEL_GAP_HOURS} HOUR
            GROUP BY e.user_id
        ), counts AS (
            SELECT COUNT(*) AS c1,
                   COUNT(s2.t2) AS c2,
                   COUNT(s3.t3) AS c3
            FROM s1
            LEFT JOIN s2 ON s1.user_id = s2.user_id
            LEFT JOIN s3 ON s1.user_id = s3.user_id
        )
        SELECT '1_view' AS step, c1 AS users,
               1.0 AS conv_from_prev,
               CASE WHEN c1 = 0 THEN 0.0
                    ELSE ROUND(CAST(c1 AS DOUBLE) / c1, 6) END AS conv_overall
        FROM counts
        UNION ALL
        SELECT '2_click', c2,
               CASE WHEN c1 = 0 THEN 0.0
                    ELSE ROUND(CAST(c2 AS DOUBLE) / c1, 6) END,
               CASE WHEN c1 = 0 THEN 0.0
                    ELSE ROUND(CAST(c2 AS DOUBLE) / c1, 6) END FROM counts
        UNION ALL
        SELECT '3_purchase', c3,
               CASE WHEN c2 = 0 THEN 0.0
                    ELSE ROUND(CAST(c3 AS DOUBLE) / c2, 6) END,
               CASE WHEN c1 = 0 THEN 0.0
                    ELSE ROUND(CAST(c3 AS DOUBLE) / c1, 6) END FROM counts
    """,
    "capped_running_balance": f"""
        WITH RECURSIVE ev AS (
            SELECT user_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn,
                   CASE
                     WHEN event_type = 'signup'
                       THEN CAST({WALLET_SIGNUP_BONUS_CENTS} AS BIGINT)
                     WHEN event_type IN ('view', 'click')
                       THEN CAST(ROUND(value * 100) AS BIGINT)
                     WHEN event_type = 'purchase'
                       THEN -CAST(ROUND(value * 100) AS BIGINT)
                     ELSE CAST(0 AS BIGINT)
                   END AS delta
            FROM events
        ), nmax AS (
            SELECT user_id, MAX(rn) AS n FROM ev GROUP BY user_id
        ), rec AS (
            SELECT user_id, rn,
                   GREATEST(CAST(0 AS BIGINT), delta) AS bal,
                   CAST(CASE WHEN delta < 0 THEN 1 ELSE 0 END AS BIGINT)
                       AS hits
            FROM ev WHERE rn = 1
            UNION ALL
            SELECT e.user_id, e.rn,
                   GREATEST(CAST(0 AS BIGINT), r.bal + e.delta),
                   r.hits + CASE WHEN r.bal + e.delta < 0 THEN 1 ELSE 0 END
            FROM rec r JOIN ev e
              ON e.user_id = r.user_id AND e.rn = r.rn + 1
        )
        SELECT r.user_id,
               r.bal AS final_balance_cents,
               r.hits AS n_floor_hits,
               n.n AS n_events
        FROM rec r JOIN nmax n ON r.user_id = n.user_id AND r.rn = n.n
    """,
    "event_path_topk": """
        WITH ranked AS (
            SELECT user_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ), paths AS (
            SELECT user_id,
                   string_agg(event_type, '>' ORDER BY rn) AS path,
                   COUNT(*) AS path_len
            FROM ranked WHERE rn <= 3
            GROUP BY user_id
        )
        SELECT path, COUNT(*) AS n_users
        FROM paths WHERE path_len = 3
        GROUP BY path
        ORDER BY n_users DESC, path ASC
        LIMIT 20
    """,
    "variant_extract_agg": """
        SELECT CAST(props->>'k' AS BIGINT) % 10 AS k_bucket,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
               ROUND(AVG(CAST(props->>'k' AS BIGINT)), 6) AS avg_k
        FROM events
        GROUP BY k_bucket
    """,
    "stream_stream_join": """
        SELECT c.event_id AS click_id, v.event_id AS view_id,
               c.user_id AS user_id
        FROM events c JOIN events v ON c.user_id = v.user_id
        WHERE c.event_type = 'click' AND v.event_type = 'view'
          AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL 1 HOUR
    """,
    "stream_dedup": """
        SELECT event_id, user_id, event_type, ROUND(value, 6) AS value
        FROM events
    """,
    "stream_enrich": """
        SELECT event_id, user_id,
               (SELECT COUNT(*) FROM events e2
                WHERE e2.user_id = e1.user_id) AS user_events
        FROM events e1 WHERE event_id < 2000
    """,
    "cohort_retention": """
        WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS active_day FROM events),
        first AS (SELECT user_id, MIN(active_day) AS cohort_day
                  FROM ev GROUP BY user_id),
        activity AS (SELECT DISTINCT user_id, active_day FROM ev)
        SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
               date_diff('day', cohort_day, active_day) AS day_offset,
               COUNT(DISTINCT user_id) AS n_active
        FROM activity JOIN first USING (user_id)
        WHERE date_diff('day', cohort_day, active_day) <= 7
        GROUP BY 1, 2
    """,
    "sessionize_lag": """
        WITH breaks AS (
            SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
                   CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                             OR LAG(epoch_us(ts)) OVER w IS NULL
                        THEN 1 ELSE 0 END AS is_break
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ),
        sess AS (
            SELECT user_id, ts_us, value,
                   CAST(SUM(is_break) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS session_no
            FROM breaks
        )
        SELECT user_id, session_no,
               COUNT(*) AS n_events,
               CAST(MAX(ts_us) - MIN(ts_us) AS BIGINT) AS duration_us,
               ROUND(SUM(value), 6) AS session_value
        FROM sess GROUP BY user_id, session_no
    """,
    "funnel_conversion": """
        WITH per_user AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
                   MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click
            FROM events GROUP BY user_id
        )
        SELECT COUNT(*) AS n_users,
               COUNT(first_view) AS n_viewers,
               CAST(SUM(CASE WHEN first_view IS NOT NULL AND first_click IS NOT NULL
                             AND first_view < first_click
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
        FROM per_user
    """,
    "event_streaks": """
        WITH marked AS (
            SELECT user_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                        ORDER BY ts, event_id) AS grp
            FROM events
        ), islands AS (
            SELECT user_id, event_type, grp, COUNT(*) AS run_len
            FROM marked GROUP BY 1, 2, 3
        )
        SELECT user_id, event_type,
               CAST(MAX(run_len) AS BIGINT) AS max_streak,
               COUNT(*) AS n_streaks
        FROM islands GROUP BY user_id, event_type
    """,
    "strict_funnel": """
        WITH s AS (
            SELECT user_id, event_type, epoch_us(ts) AS us,
                   MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
                       OVER (PARTITION BY user_id) AS t1
            FROM events
        ), s2 AS (
            SELECT *,
                   MIN(CASE WHEN event_type = 'click' AND us > t1
                            THEN us END) OVER (PARTITION BY user_id) AS t2
            FROM s
        ), s3 AS (
            SELECT *,
                   MIN(CASE WHEN event_type = 'purchase' AND us > t2
                            THEN us END) OVER (PARTITION BY user_id) AS t3
            FROM s2
        ), per_user AS (
            SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
            FROM s3 GROUP BY user_id
        )
        SELECT COUNT(*) AS n_users,
               COUNT(t1) AS n_viewed,
               COUNT(t2) AS n_clicked_after_view,
               COUNT(t3) AS n_purchased_after_click
        FROM per_user
    """,
    "json_extract_agg": """
        SELECT event_type,
               COUNT(*) AS n_events,
               ROUND(AVG(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 6) AS avg_k,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        FROM events GROUP BY event_type
    """,
    "tumbling_window": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 6) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "stream_tumbling_window": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 6) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "sliding_window": """
        WITH starts AS (
            SELECT make_timestamp(CAST(FLOOR(epoch(ts) / 1800) * 1800 AS BIGINT) * 1000000)
                       AS window_start, value
            FROM events
            UNION ALL
            SELECT make_timestamp((CAST(FLOOR(epoch(ts) / 1800) * 1800 AS BIGINT) - 1800)
                       * 1000000) AS window_start, value
            FROM events
        )
        SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 6) AS sum_value
        FROM starts GROUP BY 1
    """,
    "stream_sliding_window": """
        WITH starts AS (
            SELECT make_timestamp(CAST(FLOOR(epoch(ts) / 1800) * 1800 AS BIGINT) * 1000000)
                       AS window_start, value
            FROM events
            UNION ALL
            SELECT make_timestamp((CAST(FLOOR(epoch(ts) / 1800) * 1800 AS BIGINT) - 1800)
                       * 1000000) AS window_start, value
            FROM events
        )
        SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 6) AS sum_value
        FROM starts GROUP BY 1
    """,
    "stream_user_totals": """
        SELECT user_id, COUNT(*) AS n_events,
               ROUND(SUM(value), 6) AS total_value
        FROM events GROUP BY user_id
    """,
    "stream_user_stats_tws": """
        SELECT user_id, COUNT(*) AS n_events,
               ROUND(SUM(value), 6) AS total_value,
               ROUND(MAX(value), 6) AS max_value
        FROM events GROUP BY user_id
    """,
    "stream_doc_source_counts": """
        SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM documents GROUP BY source
    """,
    # the streaming drift monitors' drained state equals the batch
    # compaction, so the batch KS/MWU and PSI oracles apply verbatim
    "stream_drift_monitor": _KS_MWU_ORACLE,
    "stream_psi_monitor": _PSI_ORACLE,
    "stream_vocab_drift": _VOCAB_DRIFT_ORACLE,
    "stream_doc_dedup": """
        SELECT DISTINCT md5(text) AS fp, LENGTH(text) AS text_len
        FROM documents
        WHERE LENGTH(text) > 50 AND lang <> ''
    """,
    "stream_foreach_upsert": """
        SELECT user_id, event_id AS last_event_id,
               event_type AS last_type,
               ROUND(value, 6) AS last_value
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY ts DESC, event_id DESC) AS rn
              FROM events)
        WHERE rn = 1
    """,
    "session_window": """
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             < INTERVAL 5 MINUTE THEN 0 ELSE 1 END AS new_session
            FROM events
        ), sessions AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM flagged
        )
        SELECT user_id,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               COUNT(*) AS n_events
        FROM sessions GROUP BY user_id, session_id
    """,
    "stream_session_window": """
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             < INTERVAL 5 MINUTE THEN 0 ELSE 1 END AS new_session
            FROM events
        ), sessions AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM flagged
        )
        SELECT user_id,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               COUNT(*) AS n_events
        FROM sessions GROUP BY user_id, session_id
    """,
}

def q_time_bounded_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded ordered funnel view → click → purchase where each
    step must land within FUNNEL_GAP_HOURS of the previous step's
    earliest match — the product-analytics funnel with conversion
    windows (q_strict_funnel without a bound counts a click 3 weeks
    later as converted; real funnels don't).

    Greedy earliest-match per step: t1 = first view; t2 = first click in
    (t1, t1+gap]; t3 = first purchase in (t2, t2+gap]. Each step is one
    filtered fact join on user_id + a grouped min — no windows, no
    per-user state. Output: one row per step with reach and conversion
    rates (integer-count-derived doubles, round 6)."""
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    gap = F.expr(f"INTERVAL {FUNNEL_GAP_HOURS} HOURS")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + gap))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + gap))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .agg(
            F.count(F.lit(1)).alias("c1"),
            F.count("t2").alias("c2"),
            F.count("t3").alias("c3"),
        )
    )
    steps = F.array(
        F.struct(
            F.lit("1_view").alias("step"),
            F.col("c1").alias("users"),
            F.lit(1.0).alias("conv_from_prev"),
        ),
        F.struct(
            F.lit("2_click").alias("step"),
            F.col("c2").alias("users"),
            # empty previous step -> conversion 0.0 (Spark double /0 is
            # NaN/Inf while DuckDB yields NULL; guard on both engines)
            F.when(F.col("c1") == 0, F.lit(0.0))
            .otherwise(F.round(F.col("c2") / F.col("c1"), 6))
            .alias("conv_from_prev"),
        ),
        F.struct(
            F.lit("3_purchase").alias("step"),
            F.col("c3").alias("users"),
            F.when(F.col("c2") == 0, F.lit(0.0))
            .otherwise(F.round(F.col("c3") / F.col("c2"), 6))
            .alias("conv_from_prev"),
        ),
    )
    return (
        counts.select(F.explode(steps).alias("s"), "c1")
        .select(
            F.col("s.step").alias("step"),
            F.col("s.users").alias("users"),
            F.col("s.conv_from_prev").alias("conv_from_prev"),
            F.when(F.col("c1") == 0, F.lit(0.0))
            .otherwise(F.round(F.col("s.users") / F.col("c1"), 6))
            .alias("conv_overall"),
        )
    )


def q_capped_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floor-clamped per-user wallet scan: balance_t = max(0, balance_
    {t-1} + delta_t) with signup = +100.00 credit, view/click = earn
    value, purchase = spend value (all integer cents — exact).

    The clamp destroys the prefix-sum monoid, but the FLOOR-AT-ZERO
    clamp has a closed form over plain prefix sums (round 11 — this
    replaced a per-user Python loop in ``applyInPandas``, 3.3 s → sub-
    second at sf0.1, and the operator is now 100% JVM codegen):
    with S_t the unclamped prefix sum and m_t = min(0, min_{i≤t} S_i),

    - balance_t = S_t − m_t  (the clamp only ever 'absorbs' the deepest
      below-zero excursion so far; inductively bal_{t-1} + d_t =
      S_t − m_{t-1}, which the clamp lifts to 0 exactly when S_t sets a
      new below-zero running minimum);
    - the clamp FIRES at t  ⇔  S_t < m_{t-1}  (a STRICT new running
      minimum below zero), so the floor-hit count is a window count of
      those events.

    One user-keyed shuffle; two window passes on the same partitioning
    (cumsum, then prior-row running min); the final per-user rollup
    reuses the exchange. Every term is int64 cents — exact, and the
    per-user window key (user_id) scales with the data (never a
    low-cardinality fixture column). The DuckDB oracle replays the
    clamp literally as a RECURSIVE CTE over per-user row numbers — an
    INDEPENDENT method, so the hash match proves the closed form.
    Output per user: final balance, floor-hit count, event count."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "signup", F.lit(WALLET_SIGNUP_BONUS_CENTS))
        .when(
            F.col("event_type").isin("view", "click"),
            F.round(F.col("value") * 100).cast("long"),
        )
        .when(
            F.col("event_type") == "purchase",
            -F.round(F.col("value") * 100).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("delta"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = F.sum("delta").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    scanned = ev.withColumn("s", s).withColumn(
        "m_prev",
        F.min("s").over(w.rowsBetween(W.unboundedPreceding, -1)),
    )
    clamp_fired = F.col("s") < F.least(
        F.lit(0).cast("long"), F.coalesce(F.col("m_prev"), F.lit(0).cast("long"))
    )
    return scanned.groupBy("user_id").agg(
        (
            F.sum("delta")
            - F.least(F.lit(0).cast("long"), F.min("s"))
        ).alias("final_balance_cents"),
        F.sum(clamp_fired.cast("long")).alias("n_floor_hits"),
        F.count(F.lit(1)).alias("n_events"),
    )


QUERIES = {
    "time_bounded_funnel": q_time_bounded_funnel,
    "event_pattern_match": q_event_pattern_match,
    "capped_running_balance": q_capped_running_balance,
    "json_extract_agg": q_json_extract_agg,
    "variant_extract_agg": q_variant_extract_agg,
    "event_path_topk": q_event_path_topk,
    "tumbling_window": q_tumbling_window,
    "sliding_window": q_sliding_window,
    "session_window": q_session_window,
    "sessionize_lag": q_sessionize_lag,
    "funnel_conversion": q_funnel_conversion,
    "strict_funnel": q_strict_funnel,
    "event_streaks": q_event_streaks,
    "cohort_retention": q_cohort_retention,
    "stream_tumbling_window": q_stream_tumbling_window,
    "stream_ohlc_hourly": q_stream_ohlc_hourly,
    "stream_session_window": q_stream_session_window,
    "stream_sliding_window": q_stream_sliding_window,
    "stream_user_totals": q_stream_user_totals,
    "stream_user_stats_tws": q_stream_user_stats_tws,
    "stream_foreach_upsert": q_stream_foreach_upsert,
    "stream_doc_source_counts": q_stream_doc_source_counts,
    "stream_drift_monitor": q_stream_drift_monitor,
    "stream_psi_monitor": q_stream_psi_monitor,
    "stream_vocab_drift": q_stream_vocab_drift,
    "stream_doc_dedup": q_stream_doc_dedup,
    "stream_ddsketch_quantiles": q_stream_ddsketch_quantiles,
    "stream_stream_join": q_stream_stream_join,
    "stream_dedup": q_stream_dedup,
    "stream_enrich": q_stream_enrich,
}

# the streaming OHLC shares its batch twin's oracle (identical output
# contract; only the execution path differs)
from pb_etl_spark.operators import timeseries as _timeseries  # noqa: E402

ORACLES["stream_ohlc_hourly"] = _timeseries.ORACLES["ohlc_hourly"]


# the streaming DDSketch shares the batch sketch's oracle family, over
# the events value stream (identical bucket decision + extraction)
from pb_etl_spark.operators.retrieval import (  # noqa: E402
    DD_QS as _DD_QS,
    _dd_bounds as _ddb,
    _dd_ests as _dde,
    dd_bucket_sql as _dd_bucket_sql,
)


def _stream_dd_oracle() -> str:
    ests = _dde(_ddb())
    qs_sql = ", ".join(f"({q})" for q in _DD_QS)
    bucket = _dd_bucket_sql("cents")
    return f"""
        WITH src AS (
            SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events
        ),
        hist AS (
            SELECT {bucket} AS bucket, COUNT(*) AS cnt
            FROM src GROUP BY 1
        ),
        n AS (SELECT SUM(cnt) AS n FROM hist),
        cum AS (
            SELECT bucket,
                   SUM(cnt) OVER (ORDER BY bucket
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS cum
            FROM hist
        ),
        probes AS (SELECT * FROM (VALUES {qs_sql}) AS p(q)),
        hit AS (
            SELECT q, n.n, MIN(bucket) AS bucket
            FROM probes CROSS JOIN n
            JOIN cum ON cum >= CAST(CEIL(q * n.n) AS BIGINT)
            GROUP BY q, n.n
        )
        SELECT q, bucket,
               ROUND(CAST(([{", ".join(map(str, ests))}])[CAST(bucket + 1 AS INT)]
                          AS DOUBLE) / 100.0, 2) AS est_price,
               CAST(n AS BIGINT) AS n_rows
        FROM hit
    """


ORACLES["stream_ddsketch_quantiles"] = _stream_dd_oracle()
