"""Scalar expression surface: string / date / math / null-handling
batteries, BPE-ish regex tokenization, and array functions.

The reference uses no scalar functions at all (SURVEY.md §2.5: strings pass
through as categorical codes), but the extension surface requires them; all
are Spark built-ins inside whole-stage codegen. Every expression here is
chosen to have bit-identical DuckDB semantics (1-based substring, literal
replace, same regex class syntax, exact integer micros for time math).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pb_etl_spark.catalog import read_table

# The BPE-ish tokenizer regex: letter runs, digit runs, or single
# non-alphanumeric marks — the pre-tokenization split GPT-style BPE vocabs
# assume (public pattern shape, simplified to ASCII).
BPE_SPLIT_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String battery over customer: case, substring, pad, concat,
    replace, split_part, regexp_extract, reverse."""
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("upper_name"),
        F.lower("c_mktsegment").alias("lower_seg"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.concat(F.col("c_mktsegment"), F.lit("-"), F.col("c_name")).alias("seg_name"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("short_name"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.reverse(F.col("c_mktsegment")).alias("rev_seg"),
    )


def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time battery over orders: extract parts, truncate, date
    arithmetic, day difference, epoch seconds."""
    o = read_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus_30d"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("long").alias("days_since_epoch_start"),
        # parquet micros arrive as TIMESTAMP_NTZ; cast to LTZ (identity
        # under the UTC session tz) for unix_micros
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("epoch_us"),
    )


def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery over a bounded lineitem slice: abs/ceil/floor/sqrt/
    ln/log10/exp/pow/sign/mod/greatest/least."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 400)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("abs_disc_delta"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log(F.col("l_quantity") + 1.0), 6).alias("qty_ln1p"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.round(F.exp(-F.col("l_discount")), 6).alias("exp_neg_disc"),
        F.round(F.pow("l_quantity", 2), 6).alias("qty_sq"),
        F.signum(F.col("l_quantity") - 25.0).cast("long").alias("qty_sign"),
        (F.col("l_linenumber") % 3).cast("long").alias("line_mod3"),
        F.round(F.greatest("l_discount", "l_tax"), 6).alias("max_rate"),
        F.round(F.least("l_discount", "l_tax"), 6).alias("min_rate"),
    )


def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL battery: nullif/coalesce/isnull over orders."""
    o = read_table(spark, sf_dir, "orders")
    open_status = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        F.coalesce(open_status, F.lit("open")).alias("status_or_open"),
        open_status.isNull().alias("is_open"),
        F.coalesce(F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")), F.lit("prioritized")).alias(
            "priority_class"
        ),
    )


def q_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic battery: ``try_divide`` / ``Column.try_cast`` return NULL where strict ANSI mode would raise
    (÷0, malformed cast) — the functions that make a pipeline ANSI-mode
    clean without wrapping every expression in CASE. Division by zero
    is manufactured deterministically from the data; the oracle builds
    the same NULLs with NULLIF/TRY_CAST."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 5000)
    denom = F.col("o_orderkey") % 3  # 0 for every third key
    bad_str = F.when(
        F.col("o_orderkey") % 2 == 0, F.lit("not-a-number")
    ).otherwise(F.col("o_orderkey").cast("string"))
    return o.select(
        "o_orderkey",
        # emit integer cents (floor) — ROUND(x/2, 2) lands on half-cent
        # boundaries where engines' double rounding differs
        F.floor(
            F.try_divide(F.expr("cast(round(o_totalprice * 100) as bigint)"), denom)
        ).cast("long").alias("price_per_cents"),
        F.try_divide(F.col("o_totalprice"), denom).isNull().alias("div_failed"),
        bad_str.try_cast("long").alias("parsed_key"),
        bad_str.try_cast("long").isNull().alias("cast_failed"),
    )


def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, whitespace + BPE-ish regex (training-data surface):
    whitespace tokens vs regex sub-tokens per document."""
    doc = read_table(spark, sf_dir, "documents")
    return doc.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_SPLIT_RE), F.lit(0)))
        .cast("long")
        .alias("bpe_tokens"),
    )


def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array battery over embeddings: size, indexing, min/max, slicing."""
    e = read_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size(v).cast("long").alias("dim"),
        F.round(F.element_at(v, 1), 6).alias("first_val"),
        F.round(F.array_max(v), 6).alias("max_val"),
        F.round(F.array_min(v), 6).alias("min_val"),
        F.round(
            F.aggregate(F.slice(v, 1, 8), F.lit(0.0), lambda a, x: a + x), 6
        ).alias("head8_sum"),
    )


def q_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise battery over a bounded lineitem slice: and/or/xor/shifts —
    the partition-bucketing and bitmap primitives."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 400)
    k = F.col("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        k.bitwiseAND(F.lit(255)).alias("and_255"),
        k.bitwiseOR(F.lit(4096)).alias("or_4096"),
        k.bitwiseXOR(F.lit(1023)).alias("xor_1023"),
        F.shiftleft(k, 2).alias("shl_2"),
        F.shiftright(k, 3).alias("shr_3"),
    )


def q_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex battery over documents: replace, count, match-test — the
    cleaning primitives of a text pipeline, all codegen'd JVM-side."""
    doc = read_table(spark, sf_dir, "documents")
    return doc.select(
        "doc_id",
        F.regexp_replace(F.col("text"), "[0-9]+", "#").alias("digits_masked"),
        F.regexp_count(F.col("text"), F.lit("[aeiou]")).cast("long").alias("vowels"),
        F.col("text").rlike("ipsum").alias("has_ipsum"),
        F.regexp_replace(F.col("text"), "\\s+", " ").alias("ws_normalized"),
    )


def q_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content hashes (md5/sha256 hex) — the fingerprint
    primitives behind exact dedup and content-addressed caching."""
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5(F.col("c_name").cast("binary")).alias("name_md5"),
        F.sha2(F.col("c_name").cast("binary"), 256).alias("name_sha256"),
        F.md5(F.concat_ws("|", "c_name", "c_mktsegment").cast("binary")).alias(
            "row_fingerprint"
        ),
    )


def q_case_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN battery: band a continuous measure, nested conditions,
    boolean composition — the categorical-feature shape of an ETL stage."""
    o = read_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(price < 50000, "small")
        .when(price < 150000, "medium")
        .when(price < 300000, "large")
        .otherwise("jumbo")
        .alias("price_band"),
        F.when(
            (F.col("o_orderstatus") == "F") & (price >= 200000), "big_closed"
        )
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_class"),
        ((F.col("o_orderstatus") != "P") | (price > 100000)).alias("flag"),
    )


def q_listagg_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 ``listagg`` (SQL:2023 ordered string aggregation): per
    order priority, the DISTINCT order statuses concatenated in order —
    deterministic because WITHIN GROUP fixes the concat order (an
    unordered collect_list would not be hash-checkable). DuckDB's
    string_agg(DISTINCT … ORDER BY) is the exact counterpart."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("__la_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               listagg(DISTINCT o_orderstatus, ',')
                   WITHIN GROUP (ORDER BY o_orderstatus) AS statuses,
               COUNT(*) AS n_orders
        FROM __la_orders
        GROUP BY o_orderpriority
        """
    )


ORACLES: dict[str, str] = {
    "listagg_per_group": """
        SELECT o_orderpriority,
               string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
                   AS statuses,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY o_orderpriority
    """,
    "bitwise_funcs": """
        SELECT l_orderkey, l_linenumber,
               l_orderkey & 255 AS and_255,
               l_orderkey | 4096 AS or_4096,
               xor(l_orderkey, 1023) AS xor_1023,
               l_orderkey << 2 AS shl_2,
               l_orderkey >> 3 AS shr_3
        FROM lineitem WHERE l_orderkey <= 400
    """,
    "regex_funcs": """
        SELECT doc_id,
               regexp_replace(text, '[0-9]+', '#', 'g') AS digits_masked,
               LEN(regexp_extract_all(text, '[aeiou]')) AS vowels,
               regexp_matches(text, 'ipsum') AS has_ipsum,
               regexp_replace(text, '\\s+', ' ', 'g') AS ws_normalized
        FROM documents
    """,
    "hash_funcs": """
        SELECT c_custkey,
               md5(c_name) AS name_md5,
               sha256(c_name) AS name_sha256,
               md5(c_name || '|' || c_mktsegment) AS row_fingerprint
        FROM customer
    """,
    "case_bucketing": """
        SELECT o_orderkey,
               CASE WHEN o_totalprice < 50000 THEN 'small'
                    WHEN o_totalprice < 150000 THEN 'medium'
                    WHEN o_totalprice < 300000 THEN 'large'
                    ELSE 'jumbo' END AS price_band,
               CASE WHEN o_orderstatus = 'F' AND o_totalprice >= 200000
                        THEN 'big_closed'
                    WHEN o_orderstatus = 'O' THEN 'open'
                    ELSE 'other' END AS status_class,
               (o_orderstatus != 'P' OR o_totalprice > 100000) AS flag
        FROM orders
    """,
    "string_funcs": """
        SELECT c_custkey,
               UPPER(c_name) AS upper_name,
               LOWER(c_mktsegment) AS lower_seg,
               SUBSTRING(c_name, 1, 8) AS name_prefix,
               LENGTH(c_name) AS name_len,
               c_mktsegment || '-' || c_name AS seg_name,
               REPLACE(c_name, 'Customer', 'Cust') AS short_name,
               SPLIT_PART(c_name, '#', 2) AS name_num,
               REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS digits,
               LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
               REVERSE(c_mktsegment) AS rev_seg
        FROM customer
    """,
    "date_funcs": """
        SELECT o_orderkey,
               YEAR(o_orderdate) AS yr,
               QUARTER(o_orderdate) AS qtr,
               MONTH(o_orderdate) AS mo,
               DAY(o_orderdate) AS dom,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
               strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus_30d,
               strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
               date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                   AS days_since_epoch_start,
               epoch_us(o_orderdate) AS epoch_us
        FROM orders
    """,
    "math_funcs": """
        SELECT l_orderkey, l_linenumber,
               ROUND(ABS(l_discount - 0.05), 6) AS abs_disc_delta,
               CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
               CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
               ROUND(SQRT(l_quantity), 6) AS qty_sqrt,
               ROUND(LN(l_quantity + 1.0), 6) AS qty_ln1p,
               ROUND(LOG10(l_extendedprice), 6) AS price_log10,
               ROUND(EXP(-l_discount), 6) AS exp_neg_disc,
               ROUND(POW(l_quantity, 2), 6) AS qty_sq,
               CAST(SIGN(l_quantity - 25.0) AS BIGINT) AS qty_sign,
               CAST(l_linenumber % 3 AS BIGINT) AS line_mod3,
               ROUND(GREATEST(l_discount, l_tax), 6) AS max_rate,
               ROUND(LEAST(l_discount, l_tax), 6) AS min_rate
        FROM lineitem WHERE l_orderkey <= 400
    """,
    "try_funcs": """
        WITH b AS (
            SELECT o_orderkey, o_totalprice,
                   o_orderkey % 3 AS denom,
                   CASE WHEN o_orderkey % 2 = 0 THEN 'not-a-number'
                        ELSE CAST(o_orderkey AS VARCHAR) END AS bad_str
            FROM orders WHERE o_orderkey <= 5000
        )
        SELECT o_orderkey,
               CAST(FLOOR(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                          / NULLIF(denom, 0)) AS BIGINT) AS price_per_cents,
               (o_totalprice / NULLIF(denom, 0)) IS NULL AS div_failed,
               TRY_CAST(bad_str AS BIGINT) AS parsed_key,
               TRY_CAST(bad_str AS BIGINT) IS NULL AS cast_failed
        FROM b
    """,
    "null_handling": """
        SELECT o_orderkey,
               COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
               NULLIF(o_orderstatus, 'O') IS NULL AS is_open,
               COALESCE(NULLIF(o_orderpriority, '5-LOW'), 'prioritized') AS priority_class
        FROM orders
    """,
    "bpe_token_count": """
        SELECT doc_id,
               LEN(string_split(text, ' ')) AS ws_tokens,
               LEN(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_tokens
        FROM documents
    """,
    "array_funcs": """
        SELECT vec_id,
               LEN(embedding) AS dim,
               ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
               ROUND(list_aggregate(CAST(embedding AS DOUBLE[]), 'max'), 6) AS max_val,
               ROUND(list_aggregate(CAST(embedding AS DOUBLE[]), 'min'), 6) AS min_val,
               ROUND(list_aggregate(CAST(embedding[1:8] AS DOUBLE[]), 'sum'), 6) AS head8_sum
        FROM embeddings
    """,
}

QUERIES = {
    "listagg_per_group": q_listagg_per_group,
    "bitwise_funcs": q_bitwise_funcs,
    "regex_funcs": q_regex_funcs,
    "hash_funcs": q_hash_funcs,
    "case_bucketing": q_case_bucketing,
    "string_funcs": q_string_funcs,
    "date_funcs": q_date_funcs,
    "math_funcs": q_math_funcs,
    "null_handling": q_null_handling,
    "try_funcs": q_try_funcs,
    "bpe_token_count": q_bpe_token_count,
    "array_funcs": q_array_funcs,
}
