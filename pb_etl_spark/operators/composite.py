"""Composite analytical queries (TPC-H-shaped) and remaining window/array
surface: multi-join + agg + top-k pipelines, ranking/distribution window
functions, explode/lateral, and approximate sketches.

The approx sketches (HLL count-distinct, t-digest percentiles) are the
100 TB substitutes for their exact counterparts — no full shuffle of
distinct values, no full sort. Their outputs are engine-specific, so they
carry no DuckDB oracle; tests assert tolerance against the exact values
(tests/test_approx.py), and the driver records the rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pb_etl_spark.catalog import read_table
from pb_etl_spark.operators import money


def q_tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: filtered 3-way join → grouped revenue → top 10.
    Filters reach all three scans; the topk is TakeOrderedAndProject.
    Revenue is an exact integer-grid sum (operators/money.py) — the r10
    ×10 sweep showed double-product sums drifting a cent cross-engine."""
    cust = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1999-01-01"
    )
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1996-03-15")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"))
        .agg(
            # one-parse Spark-SQL twin (see q_tpch_q1_pricing)
            F.expr(
                money.spark_sql_money_sum(money.SQL_DISC_PRICE_E4, money.E4, "tpch_q3")
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q_tpch_q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way star join with a date band → per-nation
    revenue. Only bounded dims (nation) carry a broadcast hint; supplier
    scales with SF, so its strategy is left to AQE (broadcast while it
    fits the threshold, shuffle beyond — no hard-coded OOM at 100 TB)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = read_table(spark, sf_dir, "nation")
    return (
        li.join(orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            money.money_sum(money.disc_price_e4(), money.E4, "tpch_q5").alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking/distribution window battery: rank, dense_rank, ntile,
    percent_rank, cume_dist, first_value, nth_value over a deterministic
    (unique-key) ordering.

    Scale shape (re-shaped r09): the former
    ``Window.partitionBy(o_orderstatus)`` sorted the whole orders fact
    inside 3 single-task windows. The ordering tuple (price desc, key)
    is UNIQUE, so every battery member is a closed-form function of the
    per-group position ``pos`` and group size ``n`` from
    ``grouped_running_sum`` (constant-1 cumsum, |partitions|-parallel):
    rank = dense_rank = pos (no peers), percent_rank = (pos−1)/(n−1),
    cume_dist = pos/n, and ntile(k) is the standard
    ceil-first-remainder split — first ``n mod k`` buckets hold
    ``n div k + 1`` rows. first_value/nth_value(2) over the cumulative
    frame are the group's top-2 prices — already encoded in the SAME
    keyed positions (the pos ≤ 2 rows), so they are pivoted straight
    off the cumsum output into a 3-row frame and broadcast back, no
    second fact scan and no window at all; nth_value(2) is NULL on the
    pos=1 row because its cumulative frame holds one row."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    from pb_etl_spark.operators.corpus import grouped_running_sum

    base = o.withColumn("neg_p", -F.col("o_totalprice")).withColumn(
        "one", F.lit(1).cast("long")
    )
    rs = grouped_running_sum(
        spark, base, ["o_orderstatus"], ["neg_p", "o_orderkey"], "one"
    )
    pos, n = F.col("cum"), F.col("gtot")
    # ntile(k) closed form over pos/n: the first n%k buckets hold
    # n DIV k + 1 rows, the rest n DIV k — one SQL expression so the
    # quota arithmetic reads in a single piece (k = 4)
    quartile = F.expr(
        "CASE WHEN cum <= (gtot % 4) * (gtot DIV 4 + 1)"
        "     THEN (cum - 1) DIV (gtot DIV 4 + 1) + 1"
        "     ELSE gtot % 4"
        "          + (cum - (gtot % 4) * (gtot DIV 4 + 1) - 1) DIV (gtot DIV 4)"
        "          + 1 END"
    ).cast("long")
    top2 = (
        rs.filter(F.col("cum") <= 2)
        .groupBy("o_orderstatus")
        .agg(
            F.max(F.when(F.col("cum") == 1, F.col("o_totalprice"))).alias("p1"),
            F.max(F.when(F.col("cum") == 2, F.col("o_totalprice"))).alias("p2"),
        )
    )
    return rs.join(F.broadcast(top2), "o_orderstatus").select(
        "o_orderkey",
        "o_orderstatus",
        pos.alias("rnk"),
        pos.alias("drnk"),
        quartile.alias("quartile"),
        F.round(
            F.when(n > 1, (pos - 1) / (n - 1)).otherwise(F.lit(0.0)), 6
        ).alias("pct_rank"),
        F.round(pos / n, 6).alias("cdist"),
        F.round(F.col("p1"), 2).alias("max_in_status"),
        F.round(F.when(pos >= 2, F.col("p2")), 2).alias("second_price"),
    )


def q_explode_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode / lateral: one row per token per document (bounded slice),
    with the token's position — the unnest shape used by shingling and
    inverted-index builds."""
    doc = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    toks = F.split(F.col("text"), " ")
    return doc.select(
        "doc_id", F.posexplode(toks).alias("pos", "tok")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "tok")


def q_tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: one lineitem pass → 8 aggregates per
    (returnflag, linestatus). Partial aggregation (map-side combine) means
    the shuffle carries ≤ |groups|×|partitions| rows regardless of SF.

    Money sums run on the exact integer grid (operators/money.py): the
    r10 ×10 sweep caught sum_charge off by one cent vs DuckDB — the old
    double-product SUM is order-dependent and its accumulated error
    crossed a half-cent boundary at 6M rows (sum_charge ≈ 2.8e16 e-6
    units is already past 2^53). Quantity sums/avgs stay double: they
    accumulate exact integers far below 2^53, so they were never at
    risk; the money avgs divide the exact cent sums instead."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "1998-09-02"
    )
    # Aggregates built from the Spark-SQL string twins (ONE F.expr parse
    # each) rather than the Column builders: the nested Column form cost
    # ~2200 py4j roundtrips / ~0.35 s PER FRAME BUILD (r14 profile), and
    # the bench pays the build on every timed run. The twins are the
    # exact-semantics mirrors the SQL-leg queries already execute
    # (spark_sql_money_sum / spark_sql_exact_sum — split-radix TRY_SUM
    # halves, integer half-away-from-zero cent rounding, 2^53 guards);
    # value identity with the Column form is pinned by the oracle hash.
    d100 = money.sql_pct100("l_discount")
    n = F.count(F.lit(1))

    def _avg_cents(expr_sql: str) -> F.Column:
        return F.expr(
            money.spark_sql_exact_double(
                money.spark_sql_exact_sum(expr_sql, "tpch_q1"), "tpch_q1"
            )
        )

    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.expr(
                money.spark_sql_money_sum(money.SQL_EXT_CENTS, money.CENTS, "tpch_q1")
            ).alias("sum_base_price"),
            F.expr(
                money.spark_sql_money_sum(money.SQL_DISC_PRICE_E4, money.E4, "tpch_q1")
            ).alias("sum_disc_price"),
            F.expr(
                money.spark_sql_money_sum(money.SQL_CHARGE_E6, money.E6, "tpch_q1")
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(_avg_cents(money.SQL_EXT_CENTS) / n / 100.0, 6).alias(
                "avg_price"
            ),
            F.round(_avg_cents(d100) / n / 100.0, 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_tpch_q6_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: selective filter → single-row agg. All three
    predicates must reach the parquet scan (PushedFilters); the agg is a
    two-level partial/final with a 1-row shuffle."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money.money_sum(
                money.cents(F.col("l_extendedprice"))
                * money.pct100(F.col("l_discount")),
                money.E4,
                "tpch_q6",
            ).alias("revenue")
        )
    )


def q_tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20.
    nation broadcast (bounded); customer join left to AQE (SF-scaling);
    lineitem filter (returnflag='R') pushed to the scan so the fact join
    only sees returned rows."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            money.money_sum(money.disc_price_e4(), money.E4, "tpch_q10").alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def q_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-subquery over the fact table (orders whose
    total quantity exceeds a threshold), re-joined to detail. The qualifying
    key set is computed by one grouped pass and semi-joined back — no
    correlated per-row subquery execution."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


def q_tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue share (promo vs total) in one
    aggregate pass over the part⋈lineitem join — CASE inside SUM, no
    second scan for the denominator."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-06-01") & (F.col("l_shipdate") < "1996-09-01")
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    # exact integer numerator/denominator; the two decimal→double casts
    # are correctly rounded in both engines, so the quotient matches
    # bit-for-bit at any scale (no half-cent boundary to drift across)
    e4 = money.disc_price_e4()
    promo = money.exact_long_sum(
        F.when(F.col("p_type") == "PROMO", e4).otherwise(F.lit(0)),
        "tpch_q14",
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * money.exact_double(promo, "tpch_q14")
                / money.exact_double(
                    money.exact_long_sum(e4, "tpch_q14"), "tpch_q14"
                ),
                6,
            ).alias("promo_revenue_pct")
        )
    )


def q_tpch_q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order counts per priority for orders with ≥1
    returned line — EXISTS becomes a left-semi join (one bit per order,
    no lineitem payload through the shuffle)."""
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    returned = (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q_tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of orders-per-customer including
    zero-order customers — left join preserves them, two grouped passes
    (per-customer count, then histogram of counts)."""
    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    orders = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q_tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate spanning the
    join. Catalyst pushes the common per-side conjuncts below the join and
    evaluates the residual disjunction after it — expressed once,
    declaratively."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 20) & (F.col("l_quantity") >= 5))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 30))
    )
    return j.filter(cond).agg(
        money.money_sum(money.disc_price_e4(), money.E4, "tpch_q19").alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q_tpch_q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per-nation count/sum of above-average-balance
    customers with no urgent orders — scalar subquery (broadcast 1-row
    agg) + anti join + grouped agg. (The synthetic data gives every
    customer at least one order, so the idle predicate is 'no 1-URGENT
    order' to keep the result non-degenerate at every SF.)"""
    cust = read_table(spark, sf_dir, "customer")
    orders = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    # the threshold must be exact too: a double AVG is order-dependent,
    # and a boundary customer admitted by one engine but not the other
    # changes numcust/totacctbal outright
    bal_cents = money.cents(F.col("c_acctbal"))
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            money.exact_double(
                money.exact_long_sum(bal_cents, "tpch_q22"), "tpch_q22"
            )
            / F.count(F.lit(1))
            / 100.0
        ).alias("avg_bal")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    return (
        rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money.money_sum(
                money.cents(F.col("c_acctbal")), money.CENTS, "tpch_q22"
            ).alias("totacctbal"),
        )
    )


def q_tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nation pairs per year —
    the fact table joins two *independently keyed* dimension paths
    (customer-nation and supplier-nation), then filters the pair set.
    Both nation paths broadcast (bounded); customer/supplier strategies are
    AQE's call — they scale with SF, so no hard-coded broadcast hints."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    pairs = (
        (F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2")
    ) | ((F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn_key"))
        .filter(pairs)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
        )
        .agg(
            money.money_sum(money.disc_price_e4(), money.E4, "tpch_q7").alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: suppliers achieving the maximum quarterly revenue —
    the revenue 'view' is one grouped pass, the max is a 1-row broadcast
    scalar, qualifying rows filter against it (no self-join of the view)."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = (
        li.groupBy("l_suppkey")
        .agg(
            money.money_sum(money.disc_price_e4(), money.E4, "tpch_q15").alias(
                "total_revenue"
            )
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's yearly revenue —
    conditional-sum / total-sum per group computed in a single aggregate
    pass over the joined fact (no second scan for the denominator)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = money.disc_price_e4()
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                money.exact_double(
                    money.exact_long_sum(
                        F.when(
                            F.col("supp_nation") == "NATION_1", vol
                        ).otherwise(F.lit(0)),
                        "tpch_q8",
                    ),
                    "tpch_q8",
                )
                / money.exact_double(
                    money.exact_long_sum(vol, "tpch_q8"), "tpch_q8"
                ),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q_tpch_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from orders below 40% of their part's
    average quantity — the correlated AVG subquery becomes one grouped
    pass re-joined to the fact (never a per-row subquery)."""
    li = read_table(spark, sf_dir, "lineitem")
    brand_parts = read_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#1"
    ).select("p_partkey")
    li_b = li.join(brand_parts, li.l_partkey == F.col("p_partkey"))
    avg_qty = li_b.groupBy("l_partkey").agg(
        (0.4 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li_b.join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                money.exact_double(
                    money.exact_long_sum(
                        money.cents(F.col("l_extendedprice")), "tpch_q17"
                    ),
                    "tpch_q17",
                )
                / 700.0,
                2,
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ count-distinct per group — the 100 TB path (constant
    memory, no distinct shuffle). No oracle: sketch values are
    engine-specific; tests bound the error vs exact."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
    )


def q_hll_mergeable_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE HLL sketches (DataSketches ``hll_sketch_agg`` /
    ``hll_union_agg``): per-nation customer sketches plus a global row
    produced by UNIONING the partial sketches — never re-scanning. This
    is the rollup-table architecture for distincts at 100 TB: store
    binary sketches per partition/day, answer any coarser cube cell by
    sketch union. (``approx_count_distinct`` above is the one-shot
    estimator; it cannot be re-aggregated.) No oracle: sketch estimates
    are library-specific; tests assert sparse-mode exactness at fixture
    scale and union==whole-set consistency."""
    cust = read_table(spark, sf_dir, "customer")
    per_nation = cust.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey").alias("sk")
    )
    nation_rows = per_nation.select(
        F.col("c_nationkey").cast("long").alias("nationkey"),
        F.hll_sketch_estimate("sk").cast("long").alias("n_customers_est"),
    )
    global_row = per_nation.agg(
        F.lit(-1).cast("long").alias("nationkey"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias(
            "n_customers_est"
        ),
    )
    return nation_rows.unionByName(global_row)


def q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (bounded-error summaries, mergeable — no
    full sort at scale). No oracle; tolerance-tested vs exact."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("price_p50_approx"),
        F.approx_percentile("l_extendedprice", F.lit(0.95), F.lit(10000)).alias("price_p95_approx"),
    )


ORACLES: dict[str, str] = {
    "tpch_q1_pricing": f"""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               {money.sql_money_sum(money.SQL_EXT_CENTS, money.CENTS)} AS sum_base_price,
               {money.sql_money_sum(money.SQL_DISC_PRICE_E4, money.E4)} AS sum_disc_price,
               {money.sql_money_sum(money.SQL_CHARGE_E6, money.E6)} AS sum_charge,
               ROUND(AVG(l_quantity), 6) AS avg_qty,
               ROUND(CAST(SUM({money.SQL_EXT_CENTS}) AS DOUBLE)
                     / COUNT(*) / 100.0, 6) AS avg_price,
               ROUND(CAST(SUM({money.sql_pct100('l_discount')}) AS DOUBLE)
                     / COUNT(*) / 100.0, 6) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "tpch_q6_revenue": f"""
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
    "tpch_q10_returns": f"""
        SELECT c_custkey, c_name, n_name,
               {money.sql_money_sum(money.SQL_DISC_PRICE_E4, money.E4)} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "tpch_q14_promo": f"""
        SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                                           THEN {money.SQL_DISC_PRICE_E4}
                                           ELSE 0 END) AS DOUBLE)
                     / CAST(SUM({money.SQL_DISC_PRICE_E4}) AS DOUBLE), 6)
                   AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-06-01'
          AND l_shipdate < TIMESTAMP '1996-09-01'
    """,
    "tpch_q4_priority": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o.o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "tpch_q13_custdist": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey)
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "tpch_q19_disjunctive": f"""
        SELECT {money.sql_money_sum(money.SQL_DISC_PRICE_E4, money.E4)} AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity >= 10)
           OR (p_brand = 'Brand#2' AND p_size <= 20 AND l_quantity >= 5)
           OR (p_brand = 'Brand#3' AND p_size <= 30)
    """,
    "tpch_q22_idle_balances": f"""
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
               COUNT(*) AS numcust,
               {money.sql_money_sum(
                   money.sql_cents("c_acctbal"), money.CENTS
               )} AS totacctbal
        FROM customer c
        WHERE c_acctbal > (SELECT CAST(SUM({money.sql_cents('c_acctbal')})
                                       AS DOUBLE) / COUNT(*) / 100.0
                           FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c.c_custkey
                            AND o_orderpriority = '1-URGENT')
        GROUP BY c_nationkey
    """,
    "tpch_q7_nation_volume": f"""
        SELECT supp_nation, cust_nation, l_year,
               {money.sql_dollars(
                   money.sql_cents_of_sum("SUM(volume)", money.E4)
               )} AS revenue
        FROM (
            SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
                   YEAR(l_shipdate) AS l_year,
                   {money.SQL_DISC_PRICE_E4} AS volume
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            WHERE (cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_2')
               OR (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_1')
        )
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "tpch_q8_market_share": f"""
        SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
               ROUND(CAST(SUM(CASE WHEN sn.n_name = 'NATION_1'
                                   THEN {money.SQL_DISC_PRICE_E4}
                                   ELSE 0 END) AS DOUBLE)
                     / CAST(SUM({money.SQL_DISC_PRICE_E4}) AS DOUBLE), 6)
                   AS mkt_share
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY o_year
        ORDER BY o_year
    """,
    "tpch_q17_small_qty": f"""
        WITH li_b AS (
            SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#1'
        ),
        thresholds AS (
            SELECT l_partkey, 0.4 * AVG(l_quantity) AS qty_threshold
            FROM li_b GROUP BY l_partkey
        )
        SELECT ROUND(CAST(SUM({money.SQL_EXT_CENTS}) AS DOUBLE) / 700.0, 2)
                   AS avg_yearly,
               COUNT(*) AS n_lines
        FROM li_b JOIN thresholds USING (l_partkey)
        WHERE l_quantity < qty_threshold
    """,
    "tpch_q15_top_supplier": f"""
        WITH revenue AS (
            SELECT l_suppkey,
                   {money.sql_money_sum(
                       money.SQL_DISC_PRICE_E4, money.E4
                   )} AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    "tpch_q18_large_orders": """
        SELECT c_custkey, c_name, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               ROUND(o_totalprice, 2) AS totalprice,
               ROUND(big.total_qty, 2) AS total_qty
        FROM orders
        JOIN (SELECT l_orderkey, SUM(l_quantity) AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING SUM(l_quantity) > 150) big
          ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY totalprice DESC, o_orderkey ASC
        LIMIT 100
    """,
    "tpch_q3_shipping": f"""
        SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               {money.sql_money_sum(money.SQL_DISC_PRICE_E4, money.E4)} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1999-01-01'
          AND l_shipdate > TIMESTAMP '1996-03-15'
        GROUP BY l_orderkey, orderdate
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "tpch_q5_region_volume": f"""
        SELECT n_name,
               {money.sql_money_sum(money.SQL_DISC_PRICE_E4, money.E4)} AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN (SELECT o_orderkey FROM orders
              WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate < TIMESTAMP '1998-01-01') o
          ON l_orderkey = o.o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "window_ranking": """
        SELECT o_orderkey, o_orderstatus,
               RANK() OVER w AS rnk,
               DENSE_RANK() OVER w AS drnk,
               NTILE(4) OVER w AS quartile,
               ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
               ROUND(CUME_DIST() OVER w, 6) AS cdist,
               ROUND(FIRST_VALUE(o_totalprice) OVER wf, 2) AS max_in_status,
               ROUND(NTH_VALUE(o_totalprice, 2) OVER wf, 2) AS second_price
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice DESC, o_orderkey),
               wf AS (PARTITION BY o_orderstatus
                      ORDER BY o_totalprice DESC, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "explode_history": """
        SELECT doc_id, CAST(t.pos - 1 AS BIGINT) AS pos, t.tok
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                     generate_subscripts(string_split(text, ' '), 1) AS pos
              FROM documents WHERE doc_id < 20) t
    """,
}

QUERIES = {
    "tpch_q1_pricing": q_tpch_q1_pricing,
    "tpch_q6_revenue": q_tpch_q6_revenue,
    "tpch_q10_returns": q_tpch_q10_returns,
    "tpch_q18_large_orders": q_tpch_q18_large_orders,
    "tpch_q7_nation_volume": q_tpch_q7_nation_volume,
    "tpch_q15_top_supplier": q_tpch_q15_top_supplier,
    "tpch_q8_market_share": q_tpch_q8_market_share,
    "tpch_q17_small_qty": q_tpch_q17_small_qty,
    "tpch_q14_promo": q_tpch_q14_promo,
    "tpch_q4_priority": q_tpch_q4_priority,
    "tpch_q13_custdist": q_tpch_q13_custdist,
    "tpch_q19_disjunctive": q_tpch_q19_disjunctive,
    "tpch_q22_idle_balances": q_tpch_q22_idle_balances,
    "tpch_q3_shipping": q_tpch_q3_shipping,
    "tpch_q5_region_volume": q_tpch_q5_region_volume,
    "window_ranking": q_window_ranking,
    "explode_history": q_explode_history,
    "approx_distinct": q_approx_distinct,
    "hll_mergeable_counts": q_hll_mergeable_counts,
    "approx_percentiles": q_approx_percentiles,
}
