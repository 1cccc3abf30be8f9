"""Relational operator surface: scans, projections, filters, joins,
aggregations, sorts/limits, set ops, window functions.

Each query here is a named (spark, sf_dir) -> DataFrame callable with a
matching DuckDB oracle SQL string in ``ORACLES`` — the correctness contract.
Reference-parity queries cite the reference operator they re-express
(SURVEY.md §2 numbering; reference = /root/reference/pb_etl).

Scale notes applied throughout:
- Filters/projections are written directly on the scan so Catalyst pushes
  them into the Parquet reader (PushedFilters / ReadSchema).
- Small dimensions (region, nation, customer at low SF, 1-row aggregate
  frames) are explicitly ``F.broadcast``-hinted; big-big joins are left to
  Catalyst/AQE (sort-merge with skew handling).
- Every float output is rounded (ROUND6/ROUND2) *identically* in Spark and
  in the oracle so partial-aggregation order cannot flip a hash compare.
- No collect() anywhere — 1-row "fit" frames travel via broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pb_etl_spark.catalog import read_table
from pb_etl_spark.operators import money


# --------------------------------------------------------------------------
# Scans / projections / filters
# --------------------------------------------------------------------------

def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection on a Parquet scan (S4 + P1; reference target.py:200-203,
    tasks.py:200). Column pruning reaches the reader: ReadSchema carries
    only the 3 selected columns."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 2).alias("price"),
    )


def q_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection pushdown (extension surface, SURVEY.md §2.2).
    Shaped like TPC-H Q6: all three predicates land in PushedFilters."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money.money_sum(
                money.cents(F.col("l_extendedprice"))
                * money.pct100(F.col("l_discount")),
                money.E4,
                "filter_pushdown",
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# Joins (J1-J3: left equi-join on a bigint key, tasks.py:181,230,423)
# --------------------------------------------------------------------------

def q_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left equi-join (J1/J2 parity). The reference's attr⋈tscore is 1:1
    left on TRANSACTION_ID; here orders⋈customer is the same shape. No
    forced broadcast: customer grows with SF, so the strategy is left to
    Catalyst/AQE (broadcast-hash while it fits, sort-merge beyond)."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left")
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "c_name",
            "c_mktsegment",
        )
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded stratified sample: 20% of 'O', 10% of 'F', 5% of 'P' orders,
    summarized per status. ``sampleBy`` is one scan with per-row Bernoulli
    draws — no shuffle, no count-first pass; the summary downstream is the
    class-balance report a training-data split emits. No oracle: sampling
    is engine-specific; tests bound the fractions."""
    o = read_table(spark, sf_dir, "orders")
    sample = o.sampleBy("o_orderstatus", {"O": 0.2, "F": 0.1, "P": 0.05}, seed=42)
    return sample.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
    )


def q_stratified_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-stratified sample — the checkable twin of
    ``stratified_sample``: a row is kept when the first 4 hex chars of
    md5(key) fall below the stratum's threshold (lexicographic order on
    fixed-width lowercase hex == numeric order), so ANY engine reproduces
    the exact row set — no RNG, no engine-specific sampler. Rates are
    k/65536 quantizations of 20%/10%/5%. Same one-scan no-shuffle plan as
    Bernoulli sampleBy, and re-runnable: membership is a pure function of
    the key, the property that makes a 100 TB sample reproducible across
    reruns and engines."""
    o = read_table(spark, sf_dir, "orders")
    threshold = (
        F.when(F.col("o_orderstatus") == "O", "3333")  # 13107/65536 ≈ 20%
        .when(F.col("o_orderstatus") == "F", "1999")   # 6553/65536 ≈ 10%
        .otherwise("0ccc")                             # 3276/65536 ≈ 5%
    )
    bucket = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4)
    return (
        o.filter(bucket < threshold)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(
                money.exact_double(
                    money.exact_long_sum(
                        money.cents(F.col("o_totalprice")),
                        "stratified_hash_sample",
                    ),
                    "stratified_hash_sample",
                )
                / F.count(F.lit(1))
                / 100.0,
                2,
            ).alias("avg_price"),
        )
    )


def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer equi-join between two grouped summaries: per-nation
    customer counts vs per-nation supplier counts — unmatched sides
    surface as NULL-padded rows (the reconciliation-report shape)."""
    cust = (
        read_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    supp = (
        read_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        cust.join(supp, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers that have at least one order.
    Semi avoids materializing the join — one bit per probe row."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
    )


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


def q_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: star-schema join lineitem⋈orders⋈customer⋈nation⋈region →
    revenue by region. Broadcast hints only on provably-bounded dims
    (region=5, nation=25 rows); customer grows with SF, so Catalyst/AQE
    picks broadcast-vs-SMJ from observed size.

    The distinct-order count is computed at its OWN grain and joined
    back (5 rows ⋈ 5 rows): a count_distinct inside the revenue groupBy
    makes Spark Expand-duplicate every joined lineitem row (one copy per
    aggregate path) before the shuffle — measured 1.68 s vs 1.05 s at
    sf0.1. Distinct-ing the single orderkey column FIRST shrinks that
    path to |orders| narrow rows before any join; revenue keeps its
    single clean pass. Same values, same oracle."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = read_table(spark, sf_dir, "region")

    def to_region(df, key):
        return (
            df.join(orders, F.col(key) == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        )

    revenue = (
        to_region(li, "l_orderkey")
        .groupBy("r_name")
        .agg(
            # one-parse Spark-SQL twin (see q_tpch_q1_pricing)
            F.expr(
                money.spark_sql_money_sum(
                    money.SQL_DISC_PRICE_E4, money.E4, "star_join_revenue"
                )
            ).alias("revenue")
        )
    )
    n_orders = (
        to_region(li.select("l_orderkey").distinct(), "l_orderkey")
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return revenue.join(n_orders, "r_name")


# --------------------------------------------------------------------------
# Aggregations (A1-A4: whole-table max/count/sum/avg, tasks.py:198-203,436-444)
# --------------------------------------------------------------------------

def q_global_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table scalar aggregates (A1 max, A2 count, A3 sum, A4 avg —
    tasks.py:198-203,438,443). Partial+final hash agg; no groupBy keys."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.max("l_quantity"), 6).alias("max_qty"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
        F.round(
            money.exact_double(
                money.exact_long_sum(
                    money.pct100(F.col("l_discount")), "global_aggregates"
                ),
                "global_aggregates",
            )
            / F.count(F.lit(1))
            / 100.0,
            6,
        ).alias("avg_discount"),
    )


def q_backtest_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE reference final query re-expressed (A4 + E2: expected vs actual
    rate, tasks.py:436-444, etl.py:23-29): average of a binary actual vs
    average of a bounded forecast score, one output row."""
    orders = read_table(spark, sf_dir, "orders")
    # both means accumulate exact integers (a 0/1 flag; capped cents) so
    # the sums are order-independent at any SF; the two final divisions
    # are correctly-rounded IEEE ops — cross-engine identical
    n = F.count(F.lit(1))
    capped = F.least(money.cents(F.col("o_totalprice")), F.lit(50_000_000))
    return orders.agg(
        F.round(
            F.sum((F.col("o_orderstatus") == "F").cast("long")).cast("double")
            / n,
            6,
        ).alias("actual"),
        F.round(
            money.exact_double(
                money.exact_long_sum(capped, "backtest_rates"),
                "backtest_rates",
            )
            / n
            / 50_000_000.0,
            6,
        ).alias("expected"),
    )


def q_maxabs_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-abs normalization, fit-then-transform (E1 + A1; reference
    ``the_norm`` tasks.py:235-244 applied at :267,:372). The 1-row max frame
    is broadcast-joined — the reference's driver-side pandas division
    becomes a shuffle-free map stage; identical plan at 100 TB."""
    li = read_table(spark, sf_dir, "lineitem")
    maxes = li.agg(
        F.max("l_quantity").alias("qty_max"),
        F.max("l_extendedprice").alias("price_max"),
    )
    return (
        li.crossJoin(F.broadcast(maxes))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_quantity") / F.col("qty_max"), 6).alias("qty_norm"),
            F.round(F.col("l_extendedprice") / F.col("price_max"), 6).alias("price_norm"),
        )
    )


def q_zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score standardization, fit-then-transform — the companion scaler
    to ``q_maxabs_normalize`` (reference applies max-abs only,
    tasks.py:235-244; z-score is the other scaler an ML feature stage
    needs). Identical scale shape: the fitted state is ONE row
    (mean, stddev per column) broadcast back over the table, so the
    transform is a shuffle-free map stage at any SF."""
    li = read_table(spark, sf_dir, "lineitem")
    stats = li.agg(
        F.avg("l_quantity").alias("qty_mu"),
        F.stddev_samp("l_quantity").alias("qty_sd"),
        F.avg("l_extendedprice").alias("price_mu"),
        F.stddev_samp("l_extendedprice").alias("price_sd"),
    )
    return li.crossJoin(F.broadcast(stats)).select(
        "l_orderkey",
        "l_linenumber",
        F.round((F.col("l_quantity") - F.col("qty_mu")) / F.col("qty_sd"), 6).alias(
            "qty_z"
        ),
        F.round(
            (F.col("l_extendedprice") - F.col("price_mu")) / F.col("price_sd"), 6
        ).alias("price_z"),
    )


def q_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped grouped aggregation (extension; subsumes A1-A4 with
    keys). Map-side partial agg keeps the shuffle at |groups|·|partitions|."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            # one-parse Spark-SQL twins (see q_tpch_q1_pricing)
            F.expr(
                money.spark_sql_money_sum(
                    money.SQL_EXT_CENTS, money.CENTS, "groupby_agg"
                )
            ).alias("sum_base_price"),
            F.expr(
                money.spark_sql_money_sum(
                    money.SQL_DISC_PRICE_E4, money.E4, "groupby_agg"
                )
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(
                F.expr(
                    money.spark_sql_exact_double(
                        money.spark_sql_exact_sum(
                            money.sql_pct100("l_discount"), "groupby_agg"
                        ),
                        "groupby_agg",
                    )
                )
                / F.count(F.lit(1))
                / 100.0,
                6,
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (P3 generalization: per-column distinct,
    tasks.py:281): exact count-distinct per group."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_parts"),
        F.count_distinct("l_suppkey").alias("n_supps"),
    )


def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional (CASE WHEN) aggregation — promo-revenue shape."""
    li = read_table(spark, sf_dir, "lineitem")
    ext_cents = money.cents(F.col("l_extendedprice"))
    deep = F.when(F.col("l_discount") > 0.05, ext_cents).otherwise(
        F.lit(0).cast("long")
    )
    return li.groupBy("l_returnflag").agg(
        money.money_sum(deep, money.CENTS, "conditional_agg").alias(
            "deep_discount_revenue"
        ),
        money.money_sum(ext_cents, money.CENTS, "conditional_agg").alias(
            "total_revenue"
        ),
    )


def q_having_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money.money_sum(
                money.cents(F.col("o_totalprice")), money.CENTS, "having_groups"
            ).alias("spend"),
        )
        .filter(F.col("n_orders") >= 3)
    )


def q_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (extension surface; free via Catalyst expand)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------------
# Sorts / limits / top-k
# --------------------------------------------------------------------------

def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (orderBy+limit → TakeOrderedAndProject: per-partition
    heap + driver merge of k rows, no full sort at scale). Unique tiebreak
    key keeps the result set deterministic."""
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
    )


def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number window — one shuffle on the partition
    key; Spark pushes the rn<=3 limit into the window sort (WindowGroupLimit)."""
    orders = read_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.col("rn").cast("long").alias("rn"))
    )


def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer (window frame UNBOUNDED PRECEDING..CURRENT)."""
    orders = read_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # exact integer-cents window sum (a double running sum accumulates
    # order-dependent error down the partition); the per-customer cent
    # total stays far inside int64, and cents/100.0 is one
    # correctly-rounded division — cross-engine identical
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(money.cents(F.col("o_totalprice"))).over(w).cast("double")
            / 100.0
        ).alias("running_spend"),
    )


def q_window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG offset window: per-customer order-over-order price delta."""
    orders = read_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2).alias("delta"),
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------

def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: building-segment customer keys ∩ keys with orders."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
        .intersect(orders.select(F.col("o_custkey").alias("custkey")))
    )


def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customer keys with no orders (set-op twin of q_anti_join).
    ``subtract`` is EXCEPT DISTINCT — drops a key if it appears on the
    right at all (exceptAll().distinct() would instead keep keys whose
    left multiplicity merely exceeds the right's)."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return cust.select(F.col("c_custkey").alias("custkey")).subtract(
        orders.select(F.col("o_custkey").alias("custkey"))
    )


def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two filtered projections."""
    part = read_table(spark, sf_dir, "part")
    big = part.filter(F.col("p_size") > 25).select("p_brand")
    rich = part.filter(F.col("p_retailprice") > 1500).select("p_brand")
    return big.union(rich).distinct()


def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): order-priority multiset of open
    orders ∩ multiset of high-value orders — duplicates preserved up to
    the min multiplicity, summarized per priority for a stable result."""
    orders = read_table(spark, sf_dir, "orders")
    open_p = orders.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    rich_p = orders.filter(F.col("o_totalprice") > 400000).select("o_orderpriority")
    return (
        open_p.intersectAll(rich_p)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics): multiplicity-aware difference of the
    same two priority multisets, summarized per priority."""
    orders = read_table(spark, sf_dir, "orders")
    open_p = orders.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    rich_p = orders.filter(F.col("o_totalprice") > 400000).select("o_orderpriority")
    return (
        open_p.exceptAll(rich_p)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


ORACLES: dict[str, str] = {
    "scan_project": """
        SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 2) AS price
        FROM lineitem
    """,
    "filter_pushdown": f"""
        SELECT {money.sql_money_sum(
            money.SQL_EXT_CENTS + " * " + money.sql_pct100("l_discount"),
            money.E4,
        )} AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "left_join": """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice, c_name, c_mktsegment
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    """,
    "full_outer_join": """
        SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
               COALESCE(n_customers, 0) AS n_customers,
               COALESCE(n_suppliers, 0) AS n_suppliers
        FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
              FROM customer GROUP BY c_nationkey) c
        FULL OUTER JOIN
             (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
              FROM supplier GROUP BY s_nationkey) s
          USING (nationkey)
    """,
    "semi_join": """
        SELECT c_custkey, c_mktsegment FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "anti_join": """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "star_join_revenue": f"""
        SELECT r_name,
               {money.sql_money_sum(money.SQL_DISC_PRICE_E4, money.E4)} AS revenue,
               COUNT(DISTINCT l_orderkey) AS n_orders
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "global_aggregates": f"""
        SELECT ROUND(MAX(l_quantity), 6) AS max_qty,
               ROUND(MAX(l_extendedprice), 2) AS max_price,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               COUNT(*) AS n_rows,
               ROUND(CAST(SUM({money.sql_pct100('l_discount')}) AS DOUBLE)
                     / COUNT(*) / 100.0, 6) AS avg_discount
        FROM lineitem
    """,
    "backtest_rates": f"""
        SELECT ROUND(CAST(SUM(CASE WHEN o_orderstatus = 'F'
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     / COUNT(*), 6) AS actual,
               ROUND(CAST(SUM(LEAST({money.sql_cents('o_totalprice')},
                                    50000000)) AS DOUBLE)
                     / COUNT(*) / 50000000.0, 6) AS expected
        FROM orders
    """,
    "maxabs_normalize": """
        SELECT l_orderkey, l_linenumber,
               ROUND(l_quantity / (SELECT MAX(l_quantity) FROM lineitem), 6) AS qty_norm,
               ROUND(l_extendedprice / (SELECT MAX(l_extendedprice) FROM lineitem), 6) AS price_norm
        FROM lineitem
    """,
    "zscore_normalize": """
        SELECT l_orderkey, l_linenumber,
               ROUND((l_quantity - (SELECT AVG(l_quantity) FROM lineitem))
                     / (SELECT STDDEV_SAMP(l_quantity) FROM lineitem), 6) AS qty_z,
               ROUND((l_extendedprice - (SELECT AVG(l_extendedprice) FROM lineitem))
                     / (SELECT STDDEV_SAMP(l_extendedprice) FROM lineitem), 6) AS price_z
        FROM lineitem
    """,
    "groupby_agg": f"""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               {money.sql_money_sum(money.SQL_EXT_CENTS, money.CENTS)} AS sum_base_price,
               {money.sql_money_sum(money.SQL_DISC_PRICE_E4, money.E4)} AS sum_disc_price,
               ROUND(AVG(l_quantity), 6) AS avg_qty,
               ROUND(CAST(SUM({money.sql_pct100('l_discount')}) AS DOUBLE)
                     / COUNT(*) / 100.0, 6) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "distinct_agg": """
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_supps
        FROM lineitem GROUP BY l_returnflag
    """,
    "conditional_agg": f"""
        SELECT l_returnflag,
               {money.sql_money_sum(
                   "CASE WHEN l_discount > 0.05 THEN "
                   + money.SQL_EXT_CENTS
                   + " ELSE 0 END",
                   money.CENTS,
               )} AS deep_discount_revenue,
               {money.sql_money_sum(money.SQL_EXT_CENTS, money.CENTS)} AS total_revenue
        FROM lineitem GROUP BY l_returnflag
    """,
    "having_groups": f"""
        SELECT o_custkey, COUNT(*) AS n_orders,
               {money.sql_money_sum(
                   money.sql_cents("o_totalprice"), money.CENTS
               )} AS spend
        FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3
    """,
    "rollup_agg": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n_rows
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "sort_limit": """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    "window_topk_per_group": """
        SELECT o_custkey, o_orderkey, rn FROM (
            SELECT o_custkey, o_orderkey,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
            FROM orders
        ) WHERE rn <= 3
    """,
    "window_running_sum": f"""
        SELECT o_custkey, o_orderkey,
               CAST(SUM({money.sql_cents('o_totalprice')}) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) / 100.0 AS running_spend
        FROM orders
    """,
    "window_lag_delta": """
        SELECT o_custkey, o_orderkey,
               ROUND(o_totalprice - LAG(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS delta
        FROM orders
    """,
    "set_intersect": """
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT o_custkey AS custkey FROM orders
    """,
    "set_except": """
        SELECT c_custkey AS custkey FROM customer
        EXCEPT
        SELECT o_custkey AS custkey FROM orders
    """,
    "union_distinct": """
        SELECT p_brand FROM part WHERE p_size > 25
        UNION
        SELECT p_brand FROM part WHERE p_retailprice > 1500
    """,
    "set_intersect_all": """
        SELECT o_orderpriority, COUNT(*) AS n FROM (
            SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
            INTERSECT ALL
            SELECT o_orderpriority FROM orders WHERE o_totalprice > 400000
        ) GROUP BY o_orderpriority
    """,
    "set_except_all": """
        SELECT o_orderpriority, COUNT(*) AS n FROM (
            SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
            EXCEPT ALL
            SELECT o_orderpriority FROM orders WHERE o_totalprice > 400000
        ) GROUP BY o_orderpriority
    """,
    "stratified_hash_sample": f"""
        SELECT o_orderstatus, COUNT(*) AS n_sampled,
               ROUND(CAST(SUM({money.sql_cents('o_totalprice')}) AS DOUBLE)
                     / COUNT(*) / 100.0, 2) AS avg_price
        FROM orders
        WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) <
              CASE o_orderstatus WHEN 'O' THEN '3333'
                                 WHEN 'F' THEN '1999'
                                 ELSE '0ccc' END
        GROUP BY o_orderstatus
    """,
}

QUERIES = {
    "scan_project": q_scan_project,
    "filter_pushdown": q_filter_pushdown,
    "left_join": q_left_join,
    "full_outer_join": q_full_outer_join,
    "stratified_sample": q_stratified_sample,
    "stratified_hash_sample": q_stratified_hash_sample,
    "semi_join": q_semi_join,
    "anti_join": q_anti_join,
    "star_join_revenue": q_star_join_revenue,
    "global_aggregates": q_global_aggregates,
    "backtest_rates": q_backtest_rates,
    "maxabs_normalize": q_maxabs_normalize,
    "zscore_normalize": q_zscore_normalize,
    "groupby_agg": q_groupby_agg,
    "distinct_agg": q_distinct_agg,
    "conditional_agg": q_conditional_agg,
    "having_groups": q_having_groups,
    "rollup_agg": q_rollup_agg,
    "sort_limit": q_sort_limit,
    "window_topk_per_group": q_window_topk_per_group,
    "window_running_sum": q_window_running_sum,
    "window_lag_delta": q_window_lag_delta,
    "set_intersect": q_set_intersect,
    "set_except": q_set_except,
    "union_distinct": q_union_distinct,
    "set_intersect_all": q_set_intersect_all,
    "set_except_all": q_set_except_all,
}
