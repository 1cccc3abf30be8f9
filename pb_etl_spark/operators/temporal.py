"""Temporal join operators Spark lacks as built-ins, composed from existing
DataFrame ops (SURVEY.md custom-operator rule (a): composition before UDFs):

- **As-of join** — for each purchase event, the most recent signup of the
  same user at-or-before it. Implemented as union + last-over-window: tag
  both sides, sort per user by (ts, side), carry the last left-side
  timestamp forward. One shuffle on the user key, O(n log n) per key, no
  join blow-up — the scale-correct pattern (a join on user + inequality
  would be quadratic in per-user event counts). Oracle: DuckDB's native
  ASOF JOIN.

- **Range join** — same-user event pairs within a 60-second band.
  Implemented with time bucketing: each right row is probed against its
  bucket and both neighbors, so the join is an equi-join on
  (user, bucket) and the exact |Δt| predicate filters residuals. Shuffle
  is linear in events ×3, never the per-user cross product. Oracle: plain
  inequality join (fine at oracle scale).

All time math uses exact integer microseconds (unix_micros/epoch_us) —
float epoch seconds cannot represent microsecond timestamps exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pb_etl_spark.catalog import read_table

RANGE_BAND_US = 60_000_000  # 60 seconds


def asof_join(left: DataFrame, right: DataFrame, on: str, ts_col: str = "ts") -> DataFrame:
    """Generic as-of: for every row of ``right``, attach ``asof_ts`` — the
    latest ``ts_col`` from ``left`` with left.ts <= right.ts, matched on
    ``on`` (null when no earlier left row exists). Left side sorts before
    right at equal timestamps, so exact-tie matches are included.

    ``__rid`` is materialized (localCheckpoint) before the plan branches:
    monotonically_increasing_id is nondeterministic, and the two branches
    (window input, final join) would otherwise re-evaluate it
    independently — a shuffle retry could then stitch asof_ts onto the
    wrong rows."""
    rt_keyed = right.withColumn(
        "__rid", F.monotonically_increasing_id()
    ).localCheckpoint(eager=True)
    lt = left.select(
        F.col(on).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast("long").alias("__rid"),
    )
    rt = rt_keyed.select(
        F.col(on).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        "__rid",
    )
    w = (
        W.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = lt.unionByName(rt).withColumn(
        "asof_ts",
        F.last(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True).over(w),
    )
    matched = carried.filter(F.col("__side") == 1).select("__rid", "asof_ts")
    return rt_keyed.join(matched, "__rid", "left").drop("__rid")


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of: per purchase event, the latest same-user signup at-or-before
    it (null when none)."""
    ev = read_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    signups = ev.filter(F.col("event_type") == "signup")
    out = asof_join(signups, purchases, on="user_id")
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss").alias("signup_ts"),
    )


def q_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join — the feature-store join that prevents label
    leakage: each click event is matched to the dimension VERSION that
    was valid at the event's timestamp, never a later one. The versioned
    dimension is derived from the data itself (each purchase opens a new
    per-user version; ``version_no`` counts them), so the query is
    self-contained and oracle-checkable.

    Implementation is the as-of union+window carry (not an interval
    join): versions and facts are unioned, sorted per user by
    (ts, side, version_no), and the last version STRUCT is carried
    forward onto each fact row — one shuffle on the user key, linear,
    no interval cross-product. At 100 TB this is the difference between
    a window pass and a quadratic per-user range probe; an SCD2
    dimension (cdc.scd2_merge output) plugs into the same shape with
    valid_from as the sort key."""
    ev = read_table(spark, sf_dir, "events")
    w_v = W.partitionBy("user_id").orderBy("ts", "event_id")
    versions = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("version_no", F.row_number().over(w_v))
        .select(
            "user_id",
            F.col("ts").alias("__ts"),
            F.lit(0).alias("__side"),
            F.struct(
                F.col("version_no"), F.col("ts").alias("version_since")
            ).alias("__ver"),
            F.lit(None).cast("long").alias("event_id"),
        )
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None)
        .cast("struct<version_no:int,version_since:timestamp>")
        .alias("__ver"),
        "event_id",
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("__ts", "__side", F.col("__ver.version_no").asc_nulls_first())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = versions.unionByName(clicks).withColumn(
        "__cur", F.last("__ver", ignorenulls=True).over(w)
    )
    return (
        carried.filter(F.col("__side") == 1)
        .select(
            "event_id",
            "user_id",
            F.date_format("__ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
            F.col("__cur.version_no").cast("long").alias("version_no"),
            F.date_format("__cur.version_since", "yyyy-MM-dd HH:mm:ss").alias(
                "version_since"
            ),
        )
    )


def q_cogroup_time_since(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-click seconds since the user's most recent purchase at-or-
    before it (NULL when none) — the as-of semantic implemented on the
    COGROUP API: ``clicks.groupBy(user).cogroup(purchases.groupBy(user))
    .applyInPandas``, one Arrow batch per user holding both sides, the
    match via ``np.searchsorted`` on the sorted purchase timestamps.

    This is custom-operator rule (b) (Arrow-batched pandas where the
    imperative form is clearer than a window composition): cogroup
    shuffles each side ONCE on the key and streams aligned group pairs —
    the right API whenever per-key logic needs BOTH tables in memory
    (merge-asof, per-entity backtests, interleaved sequence alignment).
    All time math on integer microseconds; the division to seconds is
    the same float op in the oracle, so values hash-match."""
    import pandas as pd

    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("us")
    )

    def align(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if left.empty:
            return pd.DataFrame(
                {"user_id": [], "event_id": [], "secs_since_purchase": []}
            )
        c_us = left["us"].to_numpy(dtype="int64")
        p_us = np.sort(right["us"].to_numpy(dtype="int64")) if len(right) else None
        if p_us is None or len(p_us) == 0:
            secs = np.full(len(c_us), np.nan)
        else:
            idx = np.searchsorted(p_us, c_us, side="right") - 1
            secs = np.where(idx >= 0, (c_us - p_us[np.clip(idx, 0, None)]) / 1e6, np.nan)
        return pd.DataFrame(
            {
                "user_id": key[0],
                "event_id": left["event_id"].to_numpy(),
                "secs_since_purchase": np.round(secs, 6),
            }
        )

    return (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(
            align, schema="user_id long, event_id long, secs_since_purchase double"
        )
    )


def range_join_pairs(
    events: DataFrame, band_us: int = RANGE_BAND_US, key: str = "user_id"
) -> DataFrame:
    """Same-key event pairs with |Δt| ≤ band: bucket to band-width epochs,
    probe neighbor buckets, filter exact. Pair identity (a.event_id <
    b.event_id) guarantees each pair appears exactly once — the bucket
    offset between two events is unique."""
    base = events.select(
        key,
        "event_id",
        F.unix_micros("ts").alias("us"),
    ).withColumn("bucket", F.floor(F.col("us") / band_us))
    probe = base.withColumn(
        "bucket", F.explode(F.array(F.col("bucket") - 1, F.col("bucket"), F.col("bucket") + 1))
    )
    a = base.alias("a")
    b = probe.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{key}") == F.col(f"b.{key}"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.event_id") < F.col("b.event_id")),
        )
        .filter(F.abs(F.col("a.us") - F.col("b.us")) <= band_us)
        .select(
            F.col(f"a.{key}").alias(key),
            F.col("a.event_id").alias("id_a"),
            F.col("b.event_id").alias("id_b"),
            F.abs(F.col("a.us") - F.col("b.us")).alias("delta_us"),
        )
    )


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-user event pairs within 60 seconds."""
    return range_join_pairs(read_table(spark, sf_dir, "events"))


GAP_FILL_USERS = 30  # bounded output slice for the checkable query


def q_gap_fill_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style resample + gap fill: per user, an hourly grid
    spanning that user's own activity window, hourly value sums, and
    forward-fill across empty hours (``was_filled`` marks carried rows).

    Scale shape: the hourly pre-aggregation shrinks events to one row
    per (user, hour) BEFORE any window work; the grid explode generates
    rows from two timestamps per user (``sequence``), never from raw
    events; the forward-fill is one ordered window pass per user — all
    per-user work, one shuffle on the user key. This is the
    continuous-aggregate read path of a timeseries store, expressed as
    DataFrame ops (custom-operator rule (a): composition, no UDF)."""
    ev = read_table(spark, sf_dir, "events").filter(F.col("user_id") < GAP_FILL_USERS)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("mn"), F.col("mx"), F.expr("interval 1 hour"))
            ).alias("h"),
        )
    )
    w = W.partitionBy("user_id").orderBy("h").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        grid.join(hourly, ["user_id", "h"], "left")
        .select(
            "user_id",
            # stringified: raw timestamps fetch as datetime64[ns] on Spark
            # vs [us] on DuckDB and trip the driver's dtype-sensitive hash
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("h"),
            F.last("v", ignorenulls=True).over(w).alias("value"),
            F.col("v").isNull().cast("int").alias("was_filled"),
        )
    )


def q_multi_resolution_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution time rollup (hourly + daily + total in ONE scan
    via ROLLUP grouping sets) — the materialization pass of a
    continuous aggregate: coarser resolutions come from the same
    partial-aggregation tree, not separate scans."""
    ev = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < GAP_FILL_USERS)
        # materialized columns, not inline aliases: grouping() can only
        # resolve plain attributes of the rollup
        .withColumn("day", F.date_trunc("day", F.col("ts")))
        .withColumn("hour", F.date_trunc("hour", F.col("ts")))
    )
    return (
        ev.rollup("day", "hour")
        .agg(
            F.grouping("day").cast("int").alias("g_day"),
            F.grouping("hour").cast("int").alias("g_hour"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd HH:mm:ss").alias("day"),
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "g_day",
            "g_hour",
            "n_events",
            "total_value",
        )
    )


EWMA_ALPHA = 0.3  # decay: weight (1-α)^j on the j-th most recent event
EWMA_LAGS = 20  # truncation depth — the trailing-feature window
EWMA_USERS = 200  # scored-user slice for the checkable query
_EWMA_W = [(1.0 - EWMA_ALPHA) ** j for j in range(EWMA_LAGS)]


def q_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed trailing average of each user's event
    values — the classic decayed-recency feature (recent behavior
    weighted (1-α)^age). Truncated at EWMA_LAGS terms and normalized by
    the weights actually present, so early rows (short histories) are
    proper weighted means, not zero-padded.

    DELIBERATELY 20 explicit LAG terms summed in fixed expression
    order, NOT a windowed SUM over a bounded frame: bounded-frame
    double sums hash-diverge cross-engine (DuckDB's segment tree
    associates pairwise, Spark sums sequentially — see
    trailing_rows_avg), while LAG chains evaluate the identical
    left-associated expression tree in both engines, bit-for-bit.
    Scale shape: ONE shuffle on user_id, one sort per partition; the
    20-lag window state is constant per row. The same trick is how a
    feature store backfills decayed counters without a Python UDF."""
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("user_id") < EWMA_USERS
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    num = None
    den = None
    for j, wt in enumerate(_EWMA_W):
        lagv = F.lag("value", j).over(w)
        t_num = F.coalesce(lagv * F.lit(wt), F.lit(0.0))
        t_den = F.when(lagv.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
        num = t_num if num is None else num + t_num
        den = t_den if den is None else den + t_den
    return ev.select(
        "user_id",
        "event_id",
        F.least(F.row_number().over(w), F.lit(EWMA_LAGS))
        .cast("long")
        .alias("n_terms"),
        F.round(num / den, 6).alias("ewma_value"),
    )


def q_time_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of each user's value series onto an hourly
    grid — the continuous-view read path a hypertable exposes as
    ``interpolate()`` (vs ``gap_fill_resample``'s LOCF). For every grid
    point t: v0 + (v1−v0)·(t−t0)/(t1−t0) between the surrounding events
    (NULL outside the observed range).

    Implementation is the union+window carry (same skeleton as
    asof_join): events and grid points interleave in ONE per-user
    ordered pass; the previous event (value, ts) is carried forward and
    the next event carried backward — two window frames over one
    shuffle, no interval join, no per-grid-point probe. Exactness:
    values in integer cents, timestamps integer micros; the interpolation
    is computed per row from those integers with identical double ops in
    both engines — no cross-engine sums anywhere."""
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("user_id") < GAP_FILL_USERS
    )
    pts = ev.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.lit(0).alias("side"),
    )
    grid = (
        ev.groupBy("user_id")
        .agg(
            F.date_trunc("hour", F.min("ts")).alias("mn"),
            F.date_trunc("hour", F.max("ts")).alias("mx"),
        )
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("mn"), F.col("mx"), F.expr("interval 1 hour"))
            ).alias("h"),
        )
        .select(
            "user_id",
            F.unix_micros("h").alias("us"),
            F.lit(None).cast("long").alias("cents"),
            F.lit(1).alias("side"),
        )
    )
    # events sort BEFORE grid points at equal timestamps (side 0 < 1), so
    # an event exactly on a grid point is its own "previous" (t == t0 ⇒
    # interp == v0 exactly)
    w_fwd = (
        W.partitionBy("user_id")
        .orderBy("us", "side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_bwd = (
        W.partitionBy("user_id")
        .orderBy("us", "side")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    ev_us = F.when(F.col("side") == 0, F.col("us"))
    ev_cents = F.when(F.col("side") == 0, F.col("cents"))
    carried = pts.unionByName(grid).select(
        "user_id",
        "us",
        "side",
        F.last(ev_us, ignorenulls=True).over(w_fwd).alias("t0"),
        F.last(ev_cents, ignorenulls=True).over(w_fwd).alias("v0"),
        F.first(ev_us, ignorenulls=True).over(w_bwd).alias("t1"),
        F.first(ev_cents, ignorenulls=True).over(w_bwd).alias("v1"),
    )
    interp = F.when(
        F.col("t1") == F.col("t0"), F.col("v0").cast("double") / 100.0
    ).otherwise(
        (
            F.col("v0").cast("double")
            + (
                (F.col("v1") - F.col("v0")) * (F.col("us") - F.col("t0"))
            ).cast("double")
            / (F.col("t1") - F.col("t0")).cast("double")
        )
        / 100.0
    )
    return (
        carried.filter(F.col("side") == 1)
        .select(
            "user_id",
            F.date_format(F.timestamp_micros(F.col("us")), "yyyy-MM-dd HH:mm:ss").alias("h"),
            F.when(
                F.col("t0").isNotNull() & F.col("t1").isNotNull(), interp
            ).alias("value_interp"),
        )
    )


SESSION_GAP_US = 4 * 3600 * 1_000_000  # 4 h inactivity closes a session
OVERLAP_BUCKET_US = 4 * 3600 * 1_000_000  # bucket width ≈ min session span
OVERLAP_USERS = 100  # bounded user slice for the checkable query


def q_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (the general two-sided interval join of
    Flink SQL / temporal databases): which pairs of USERS were co-active,
    i.e. had overlapping activity sessions, and for how long in total.

    Sessions are gap-based (a session closes after SESSION_GAP_US of
    inactivity, and its interval extends that gap past the last event —
    the same semantics as F.session_window). Overlap is the classic
    symmetric predicate a.start <= b.end AND b.start <= a.end.

    Scale shape — uniform time bucketing, NOT an inequality join: each
    session explodes onto the W-wide buckets it covers (bounded by
    span/W + 1), pairs meet through a bucket EQUI-join, and each pair is
    emitted exactly once — in the bucket containing the overlap start
    (= max of the two starts, which both intervals cover). Shuffle is
    linear in exploded sessions; there is no quadratic time-range probe.
    The same skeleton serves trajectory co-location and ad-impression
    overlap joins; pick W ≈ median interval length so the explode factor
    stays ~2-3. All interval math in exact integer microseconds.
    """
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("user_id") < OVERLAP_USERS
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_flag = (
        F.when(
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
            > SESSION_GAP_US,
            1,
        )
        .otherwise(0)
    )
    sessions = (
        ev.withColumn("new_sess", gap_flag)
        .withColumn(
            "sid",
            F.sum("new_sess").over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .groupBy("user_id", "sid")
        .agg(
            F.min(F.unix_micros("ts")).alias("s_us"),
            (F.max(F.unix_micros("ts")) + F.lit(SESSION_GAP_US)).alias("e_us"),
        )
    )
    pairs = interval_overlap_pairs(sessions, OVERLAP_BUCKET_US)
    return pairs.groupBy("user_a", "user_b").agg(
        F.count(F.lit(1)).alias("n_overlaps"),
        (F.sum("ov_us").cast("double") / F.lit(1e6)).alias("overlap_secs"),
    )


def interval_overlap_pairs(intervals: DataFrame, bucket_us: int) -> DataFrame:
    """Cross-key overlapping interval pairs via uniform time bucketing.

    ``intervals``: columns (user_id, s_us, e_us) with s_us ≤ e_us in
    integer microseconds. Returns (user_a < user_b, ov_us) with one row
    per overlapping interval pair — each pair emitted EXACTLY once, in
    the bucket containing the overlap start (max of the two starts,
    covered by both intervals by definition). Property-tested against
    the brute-force quadratic join in tests/test_properties.py."""
    exploded = intervals.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("s_us") / bucket_us),
                F.floor(F.col("e_us") / bucket_us),
            )
        ),
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    return a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.user_id") < F.col("b.user_id"))
        & (F.col("a.s_us") <= F.col("b.e_us"))
        & (F.col("b.s_us") <= F.col("a.e_us"))
        # emit exactly once: only in the bucket holding the overlap start
        & (
            F.floor(
                F.greatest(F.col("a.s_us"), F.col("b.s_us")) / bucket_us
            )
            == F.col("a.bucket")
        ),
    ).select(
        F.col("a.user_id").alias("user_a"),
        F.col("b.user_id").alias("user_b"),
        (
            F.least(F.col("a.e_us"), F.col("b.e_us"))
            - F.greatest(F.col("a.s_us"), F.col("b.s_us"))
        ).alias("ov_us"),
    )


def _ewma_sql_terms() -> tuple[str, str]:
    nums, dens = [], []
    for j, wt in enumerate(_EWMA_W):
        nums.append(f"COALESCE(LAG(value, {j}) OVER w * {wt!r}, 0.0)")
        dens.append(
            f"(CASE WHEN LAG(value, {j}) OVER w IS NOT NULL"
            f" THEN {wt!r} ELSE 0.0 END)"
        )
    return " + ".join(nums), " + ".join(dens)


_EWMA_NUM_SQL, _EWMA_DEN_SQL = _ewma_sql_terms()


TSA_CUTOFFS = ("2024-01-10", "2024-01-17", "2024-01-24")
TSA_LABEL_DAYS = 7  # label window after the cutoff
TSA_CONV_VALUE = 150  # high-value purchase (same bar as ab_test)


def q_training_set_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct training-set assembly — the feature-store
    read path: for each (user, cutoff) pair, features computed ONLY
    from events strictly before the cutoff (activity counts, purchase
    cents, recency, distinct active days) and a label from the
    [cutoff, cutoff+7d) window (high-value purchase). No feature can
    leak label-window information by construction: the two joins use
    disjoint time predicates on opposite sides of the cutoff.

    Scale shape: the cutoff table is a bounded broadcast (|cutoffs|
    rows → a ×|cutoffs| fact explode, the standard multi-snapshot
    training build); features and labels are each one grouped
    aggregate; the stitch is an equi-join on (user, cutoff). All
    outputs integer."""
    ev = read_table(spark, sf_dir, "events")
    cutoffs = spark.createDataFrame(
        [(c,) for c in TSA_CUTOFFS], "cutoff string"
    ).select(F.col("cutoff").cast("timestamp").alias("cut"))
    feat = (
        ev.join(F.broadcast(cutoffs), ev.ts < F.col("cut"))
        .groupBy("user_id", "cut")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(0)
            ).alias("purchase_cents"),
            F.datediff(
                F.max("cut"), F.max(F.date_trunc("day", F.col("ts")))
            )
            .cast("long")
            .alias("days_since_last"),
            F.count_distinct(F.date_trunc("day", F.col("ts"))).alias(
                "n_active_days"
            ),
        )
    )
    lab = (
        ev.join(
            F.broadcast(cutoffs),
            (ev.ts >= F.col("cut"))
            & (
                ev.ts
                < F.col("cut") + F.expr(f"INTERVAL {TSA_LABEL_DAYS} DAYS")
            )
            & (F.col("event_type") == "purchase")
            & (F.col("value") >= TSA_CONV_VALUE),
        )
        .groupBy("user_id", "cut")
        .agg(F.lit(1).cast("long").alias("label"))
    )
    return (
        feat.join(lab, ["user_id", "cut"], "left")
        .select(
            "user_id",
            F.date_format("cut", "yyyy-MM-dd").alias("cutoff"),
            "n_events",
            "purchase_cents",
            "days_since_last",
            "n_active_days",
            F.coalesce("label", F.lit(0)).alias("label"),
        )
    )


ORACLES: dict[str, str] = {
    "training_set_assembly": f"""
        WITH cut AS (
            SELECT CAST(c AS TIMESTAMP) AS cut
            FROM (VALUES {", ".join(f"('{c}')" for c in TSA_CUTOFFS)}) t(c)
        ), feat AS (
            SELECT e.user_id, c.cut,
                   COUNT(*) AS n_events,
                   CAST(SUM(CASE WHEN e.event_type = 'purchase'
                                 THEN CAST(ROUND(e.value * 100) AS BIGINT)
                                 ELSE 0 END) AS BIGINT) AS purchase_cents,
                   CAST(date_diff('day', MAX(date_trunc('day', e.ts)),
                                  MAX(c.cut)) AS BIGINT) AS days_since_last,
                   COUNT(DISTINCT date_trunc('day', e.ts)) AS n_active_days
            FROM events e JOIN cut c ON e.ts < c.cut
            GROUP BY e.user_id, c.cut
        ), lab AS (
            SELECT DISTINCT e.user_id, c.cut, CAST(1 AS BIGINT) AS label
            FROM events e JOIN cut c
              ON e.ts >= c.cut
             AND e.ts < c.cut + INTERVAL {TSA_LABEL_DAYS} DAY
             AND e.event_type = 'purchase'
             AND e.value >= {TSA_CONV_VALUE}
        )
        SELECT f.user_id,
               strftime(f.cut, '%Y-%m-%d') AS cutoff,
               f.n_events, f.purchase_cents, f.days_since_last,
               f.n_active_days,
               COALESCE(l.label, 0) AS label
        FROM feat f
        LEFT JOIN lab l ON f.user_id = l.user_id AND f.cut = l.cut
    """,

    "time_interpolate": f"""
        WITH pts AS (
            SELECT user_id, epoch_us(ts) AS us,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents, 0 AS side
            FROM events WHERE user_id < {GAP_FILL_USERS}
        ), spans AS (
            SELECT user_id, date_trunc('hour', MIN(ts)) AS mn,
                   date_trunc('hour', MAX(ts)) AS mx
            FROM events WHERE user_id < {GAP_FILL_USERS} GROUP BY user_id
        ), grid AS (
            SELECT user_id,
                   epoch_us(unnest(generate_series(mn, mx, INTERVAL 1 HOUR)))
                       AS us,
                   CAST(NULL AS BIGINT) AS cents, 1 AS side
            FROM spans
        ), u AS (
            SELECT * FROM pts UNION ALL SELECT * FROM grid
        ), c AS (
            SELECT user_id, us, side,
                   LAST_VALUE(CASE WHEN side = 0 THEN us END IGNORE NULLS)
                       OVER w_f AS t0,
                   LAST_VALUE(CASE WHEN side = 0 THEN cents END IGNORE NULLS)
                       OVER w_f AS v0,
                   FIRST_VALUE(CASE WHEN side = 0 THEN us END IGNORE NULLS)
                       OVER w_b AS t1,
                   FIRST_VALUE(CASE WHEN side = 0 THEN cents END IGNORE NULLS)
                       OVER w_b AS v1
            FROM u
            WINDOW w_f AS (PARTITION BY user_id ORDER BY us, side
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   w_b AS (PARTITION BY user_id ORDER BY us, side
                           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT user_id,
               strftime(make_timestamp(us), '%Y-%m-%d %H:%M:%S') AS h,
               CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL THEN
                   (CAST(v0 AS DOUBLE)
                    + CAST((v1 - v0) * (us - t0) AS DOUBLE)
                      / CAST(t1 - t0 AS DOUBLE)) / 100.0
               END AS value_interp
        FROM c WHERE side = 1
    """,
    "interval_overlap_join": f"""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN epoch_us(ts)
                             - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                                      ORDER BY ts, event_id))
                             > {SESSION_GAP_US}
                        THEN 1 ELSE 0 END AS new_sess
            FROM events WHERE user_id < {OVERLAP_USERS}
        ), numbered AS (
            SELECT user_id,
                   SUM(new_sess) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND CURRENT ROW) AS sid,
                   ts
            FROM flagged
        ), sessions AS (
            SELECT user_id,
                   MIN(epoch_us(ts)) AS s_us,
                   MAX(epoch_us(ts)) + {SESSION_GAP_US} AS e_us
            FROM numbered GROUP BY user_id, sid
        )
        SELECT a.user_id AS user_a, b.user_id AS user_b,
               COUNT(*) AS n_overlaps,
               CAST(CAST(SUM(LEAST(a.e_us, b.e_us)
                             - GREATEST(a.s_us, b.s_us)) AS BIGINT) AS DOUBLE)
                   / 1000000.0 AS overlap_secs
        FROM sessions a JOIN sessions b
          ON a.user_id < b.user_id
         AND a.s_us <= b.e_us AND b.s_us <= a.e_us
        GROUP BY a.user_id, b.user_id
    """,
    "ewma_user_value": f"""
        SELECT user_id, event_id,
               LEAST(ROW_NUMBER() OVER w, {EWMA_LAGS}) AS n_terms,
               ROUND(({_EWMA_NUM_SQL}) / ({_EWMA_DEN_SQL}), 6) AS ewma_value
        FROM events
        WHERE user_id < {EWMA_USERS}
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "gap_fill_resample": f"""
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS h,
                   ROUND(SUM(value), 6) AS v
            FROM events WHERE user_id < {GAP_FILL_USERS}
            GROUP BY user_id, date_trunc('hour', ts)
        ), grid AS (
            SELECT user_id,
                   unnest(generate_series(MIN(h), MAX(h), INTERVAL 1 HOUR)) AS h
            FROM hourly GROUP BY user_id
        )
        SELECT g.user_id, strftime(g.h, '%Y-%m-%d %H:%M:%S') AS h,
               LAST_VALUE(hv.v IGNORE NULLS)
                   OVER (PARTITION BY g.user_id ORDER BY g.h
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS value,
               CAST(hv.v IS NULL AS INT) AS was_filled
        FROM grid g
        LEFT JOIN hourly hv ON g.user_id = hv.user_id AND g.h = hv.h
    """,
    "multi_resolution_rollup": f"""
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS day,
               strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
               CAST(GROUPING(date_trunc('day', ts)) AS INT) AS g_day,
               CAST(GROUPING(date_trunc('hour', ts)) AS INT) AS g_hour,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 6) AS total_value
        FROM events WHERE user_id < {GAP_FILL_USERS}
        GROUP BY ROLLUP (date_trunc('day', ts), date_trunc('hour', ts))
    """,
    "asof_join": """
        SELECT p.event_id, p.user_id,
               strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
               strftime(s.ts, '%Y-%m-%d %H:%M:%S') AS signup_ts
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
          ON p.user_id = s.user_id AND s.ts <= p.ts
    """,
    "range_join": """
        SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
               ABS(epoch_us(a.ts) - epoch_us(b.ts)) AS delta_us
        FROM events a JOIN events b
          ON a.user_id = b.user_id AND a.event_id < b.event_id
         AND ABS(epoch_us(a.ts) - epoch_us(b.ts)) <= 60000000
    """,
    "cogroup_time_since": """
        WITH clicks AS (
            SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
        ), purchases AS (
            SELECT user_id, ts FROM events WHERE event_type = 'purchase'
        ), matched AS (
            SELECT c.user_id, c.event_id, c.ts AS c_ts,
                   MAX(p.ts) AS p_ts
            FROM clicks c
            LEFT JOIN purchases p
              ON c.user_id = p.user_id AND p.ts <= c.ts
            GROUP BY c.user_id, c.event_id, c.ts
        )
        SELECT user_id, event_id,
               ROUND((epoch_us(c_ts) - epoch_us(p_ts)) / 1000000.0, 6)
                   AS secs_since_purchase
        FROM matched
    """,
    "pit_join": """
        WITH versions AS (
            SELECT user_id, ts AS version_since,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS version_no
            FROM events WHERE event_type = 'purchase'
        ), clicks AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        ), matched AS (
            SELECT c.event_id, c.user_id, c.ts,
                   v.version_no, v.version_since,
                   ROW_NUMBER() OVER (PARTITION BY c.event_id
                                      ORDER BY v.version_since DESC,
                                               v.version_no DESC) AS rn
            FROM clicks c
            LEFT JOIN versions v
              ON c.user_id = v.user_id AND v.version_since <= c.ts
        )
        SELECT event_id, user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
               CAST(version_no AS BIGINT) AS version_no,
               strftime(version_since, '%Y-%m-%d %H:%M:%S') AS version_since
        FROM matched WHERE rn = 1
    """,
}

QUERIES = {
    "training_set_assembly": q_training_set_assembly,
    "time_interpolate": q_time_interpolate,
    "interval_overlap_join": q_interval_overlap_join,
    "ewma_user_value": q_ewma_user_value,
    "asof_join": q_asof_join,
    "pit_join": q_pit_join,
    "cogroup_time_since": q_cogroup_time_since,
    "range_join": q_range_join,
    "gap_fill_resample": q_gap_fill_resample,
    "multi_resolution_rollup": q_multi_resolution_rollup,
}
