"""Corpus-curation operators: the batch shapes a training-data pipeline
runs between raw crawl and tokenizer — sequence packing, quality filter
chains, mixture-weighted selection, incremental (new-batch-vs-corpus)
dedup, pattern redaction, and source-mixture reporting.

Reference parity note: the reference ETL (``/root/reference/pb_etl/tasks.py``)
stops at feature engineering for one model; these extend the same
DataFrame surface to the LLM-corpus workload the brief names as
first-class. Everything is built-in ``pyspark.sql.functions`` — no Python
UDF in any path, so throughput is scan + shuffle rate.

Scale design, per operator:

- ``seq_packing``: packing is *partition-local by source* — a global
  greedy packer is inherently sequential, but per-source contiguous
  packing needs only a window cumsum within each source partition (the
  standard trick: shuffle once on the group key, one sort per partition,
  no driver loop). Pack assignment = ``floor(cum_before / budget)`` is a
  pure projection over the cumsum.
- ``quality_filter_chain`` / ``pii_redaction``: embarrassingly parallel
  row-wise expressions inside whole-stage codegen; zero shuffles.
- ``top_p_quality_sample``: per-language totals come from a grouped agg
  joined back (broadcast-sized: one row per language), NOT a
  whole-partition window — the cumulative scan is the only per-language
  ordered pass, which is inherent to nucleus-style selection. At 100 TB
  with few languages that partition is skewed; the production variant
  replaces the exact scan with a quality-quantile threshold (one
  ``percentile_approx`` pass) — same selection in expectation, fully
  parallel. The exact form is kept here because it is oracle-checkable.
- ``incremental_dedup``: fingerprint anti-join — shuffles 16-byte digests
  + ids, never document bodies; the standard "dedup the new crawl against
  the corpus" shape.
- ``source_mix_report``: grouped agg first (one row per source), so the
  ordered-window share computation runs on bounded data.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

from pb_etl_spark.cache import swap_persist
from pb_etl_spark.catalog import read_table
from pb_etl_spark.operators.text import STOPWORDS

PACK_BUDGET = 512  # tokens per packed training sequence

# Filter-chain thresholds (corpus median n_tokens=56, diversity=0.46)
LEN_MIN, LEN_MAX = 25, 90
DIVERSITY_MIN = 0.35
STOPWORD_MIN = 0.02

TOP_P = 0.5  # nucleus share of per-language chars kept

# Redaction patterns, applied in this exact order on both engines
# (Java regex and RE2 agree on this subset: char classes, {n,}, \b).
PAT_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PAT_NUM = "[0-9]{3,}"
PAT_TERM = "\\bcustomer\\b"


def _tokens(col: str = "text"):
    return F.split(F.col(col), " ")


def q_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous sequence packing: assign docs (in doc_id order, per
    source) to fixed token-budget packs. ``pack_id`` = which training
    sequence this doc lands in when the per-source stream is concatenated
    and split every PACK_BUDGET tokens (greedy, no doc splitting).

    Scale shape (re-shaped r09): the per-source token cumsum rides
    ``grouped_running_sum`` — range partition on (source, doc_id) +
    per-(pid, source) broadcast-back offsets — NOT a
    ``Window.partitionBy(source)``, which would funnel each source's
    entire corpus into a single sort task (|sources| is small by
    construction; at 100 TB that is a handful of ~10 TB single-task
    sorts). Parallelism stays |partitions|."""
    doc = read_table(spark, sf_dir, "documents")
    base = doc.select(
        "doc_id", "source", F.size(_tokens()).cast("long").alias("n_tokens")
    )
    rs = grouped_running_sum(spark, base, ["source"], ["doc_id"], "n_tokens")
    return rs.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor((F.col("cum") - F.col("n_tokens")) / PACK_BUDGET)
        .cast("long")
        .alias("pack_id"),
    )


def quality_flags() -> tuple:
    """(len_ok, div_ok, stop_ok) boolean Columns over a ``text`` column —
    shared by the registered query and the corpus pipeline stages."""
    toks = _tokens()
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))) / n
    div_ratio = F.size(F.array_distinct(toks)) / n
    len_ok = (n >= LEN_MIN) & (n <= LEN_MAX)
    div_ok = div_ratio >= DIVERSITY_MIN
    stop_ok = stop_ratio >= STOPWORD_MIN
    return len_ok, div_ok, stop_ok


def q_quality_filter_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style multi-predicate quality filter with per-rule flags (kept
    as columns so the pipeline can report per-rule rejection rates, not
    just the surviving set)."""
    doc = read_table(spark, sf_dir, "documents")
    len_ok, div_ok, stop_ok = quality_flags()
    return doc.select(
        "doc_id",
        len_ok.cast("int").alias("len_ok"),
        div_ok.cast("int").alias("diversity_ok"),
        stop_ok.cast("int").alias("stopword_ok"),
        (len_ok & div_ok & stop_ok).cast("int").alias("keep"),
    )


def q_top_p_quality_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nucleus-style data selection: per language, keep the
    highest-diversity docs until they account for TOP_P of that
    language's total characters.

    Scale shape (re-shaped r09): the per-language char cumsum in
    quality-descending order rides ``grouped_running_sum`` (descending
    order expressed as a negated sort key — the helper's order columns
    are ascending by contract), so the handful of language groups never
    collapse into single-task window sorts; the per-language total
    arrives as the helper's ``gtot`` plan literal, replacing the former
    grouped-agg + broadcast-join leg (one fewer fact aggregation)."""
    doc = read_table(spark, sf_dir, "documents")
    toks = _tokens()
    scored = doc.select(
        "doc_id",
        "lang",
        "n_chars",
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias("quality"),
    ).withColumn(
        # NULL quality must sort LAST, as it did under the original
        # `quality DESC` (Spark DESC = NULLS LAST, matching DuckDB's
        # default) — a plain negation would flip it to NULLS FIRST
        # under the helper's ascending order and shift every later
        # doc's cum_chars; +inf keeps the tail position and satisfies
        # the helper's non-null order-column contract.
        "neg_q",
        F.coalesce(-F.col("quality"), F.lit(float("inf"))),
    )
    rs = grouped_running_sum(
        spark, scored, ["lang"], ["neg_q", "doc_id"], "n_chars"
    )
    return rs.filter(F.col("cum") <= TOP_P * F.col("gtot")).select(
        "lang", "doc_id", "quality", F.col("cum").alias("cum_chars")
    )


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: treat ``doc_id % 5 == 0`` as the newly-crawled
    batch and the rest as the existing corpus; drop new docs whose content
    fingerprint already exists in the corpus, then collapse duplicates
    within the batch keeping the smallest doc_id. Anti-join on md5
    digests — the shuffle carries 16 bytes + id per doc, not bodies.

    NULL text is excluded up front ON BOTH ENGINES (r13 review finding:
    md5(NULL) = NULL, and a NULL key means KEEP under Spark's anti-join
    but poisons DuckDB's ``NOT IN`` into dropping every row — the one
    input class where the two formulations disagree; a null-body doc
    has no content fingerprint to dedup on)."""
    doc = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.md5(F.col("text")).alias("fp"))
    )
    new = doc.filter(F.col("doc_id") % 5 == 0)
    corpus = doc.filter(F.col("doc_id") % 5 != 0)
    return (
        new.join(corpus.select("fp"), "fp", "left_anti")
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_batch_copies"),
        )
        .select("keep_doc_id", "fp", "n_batch_copies")
    )


def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern redaction: emails → <EMAIL>, long digit runs → <NUM>, a
    sensitive-term list (stand-in: 'customer') → <PII>, applied in a
    fixed order. Emits the redaction count and the md5 of the redacted
    text (so the check verifies the rewrite without shipping bodies).

    ``n_redacted`` counts each pattern's matches on the ORIGINAL text
    (a detection count), while the rewrite is sequential — a match
    nested inside an earlier pattern (digits within an email) is
    counted once but produces no separate placeholder, so n_redacted ≥
    the number of placeholders inserted. Deliberate and mirrored in the
    oracle (r13 review): the audit question the column answers is "how
    many PII hits were found", not "how many tokens were rewritten"."""
    doc = read_table(spark, sf_dir, "documents")
    n_red = (
        F.regexp_count(F.col("text"), F.lit(PAT_EMAIL))
        + F.regexp_count(F.col("text"), F.lit(PAT_NUM))
        + F.regexp_count(F.col("text"), F.lit(PAT_TERM))
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), PAT_EMAIL, "<EMAIL>"),
            PAT_NUM,
            "<NUM>",
        ),
        PAT_TERM,
        "<PII>",
    )
    return doc.select(
        "doc_id",
        n_red.cast("long").alias("n_redacted"),
        F.md5(redacted).alias("redacted_md5"),
    )


def q_source_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture report: per-source doc/token counts, share of corpus
    tokens, and cumulative share in descending-token order — the table a
    pretraining run reads to set sampling weights. Window runs AFTER the
    grouped agg, on one row per source."""
    doc = read_table(spark, sf_dir, "documents")
    per_src = doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(_tokens()).cast("long")).alias("n_tokens"),
    )
    # corpus total via a broadcast 1-row agg crossJoin (BNLJ-whitelisted,
    # like maxabs_normalize); the cumulative window gets an explicit
    # constant partition key (bounded: rows = |sources|) so no
    # unpartitioned WindowExec warning fires
    totals = per_src.agg(F.sum("n_tokens").alias("_total_tokens"))
    w_cum = (
        W.partitionBy(F.lit(0))
        .orderBy(F.col("n_tokens").desc(), F.col("source").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        per_src.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("_total_tokens"), 6).alias(
                "token_share"
            ),
            F.round(
                F.sum("n_tokens").over(w_cum) / F.col("_total_tokens"), 6
            ).alias("cum_share"),
        )
    )


def q_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply-side of ``source_mix_report``: deterministically downsample
    over-represented sources to a UNIFORM target mixture. Per-source keep
    rate = (total_docs / n_sources) / n_docs_in_source, capped at 1 (no
    upsampling); the keep decision compares an md5-derived uniform
    u(doc_id) against the rate — reproducible across engines, runs, and
    partitionings, unlike ``rand()``.

    Scale shape: the rate table is one row per source (grouped agg +
    broadcast join back); the keep decision is shuffle-free row-wise
    codegen. Rates and u are compared RAW (both sides compute identical
    doubles from exact integers) and only rounded in the projection."""
    doc = read_table(spark, sf_dir, "documents")
    rates = uniform_mixture_rates(doc)
    return (
        doc.join(F.broadcast(rates), "source")  # bounded: one row per source
        .withColumn("u", doc_uniform(F.col("doc_id")))
        .filter(F.col("u") < F.col("keep_rate"))
        .select(
            "doc_id",
            "source",
            F.round("keep_rate", 6).alias("keep_rate"),
            F.round("u", 6).alias("u"),
        )
    )


def md5_u32(col):
    """First 8 md5 hex digits of ``col`` as an integer in [0, 2^32) —
    the engine's reproducible hash source (DuckDB twin:
    ``CAST('0x' || substring(md5(x), 1, 8) AS BIGINT)``)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "long"
    )


def doc_uniform(col):
    """md5-derived uniform u(col) ∈ [0,1) — the engine's reproducible
    Bernoulli source (cf. weighted_hash_sample); identical in DuckDB."""
    return md5_u32(col).cast("double") / F.lit(float(1 << 32))


def uniform_mixture_rates(doc: DataFrame) -> DataFrame:
    """Per-source keep rates for a UNIFORM target mixture:
    min(1, (total/n_sources)/n_src). One row per source — broadcast it."""
    per_src = doc.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    # totals via a broadcast 1-row agg crossJoin (BNLJ-whitelisted, like
    # maxabs_normalize), not an unpartitioned window — same bounded
    # result, no WindowExec single-partition warning
    totals = per_src.agg(
        F.sum("n_src").alias("_n_total"), F.count(F.lit(1)).alias("_n_sources")
    )
    return (
        per_src.crossJoin(F.broadcast(totals))
        .select(
            "source",
            F.least(
                F.lit(1.0),
                (F.col("_n_total") / F.col("_n_sources")) / F.col("n_src"),
            ).alias("keep_rate"),
        )
    )


MIX_ALPHA = 0.3  # sampling temperature (mT5/XLM-R style alpha)


def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened language mixture (alpha-sampling): sampling
    weight q_l ∝ p_l^alpha with alpha < 1 upweights tail languages —
    the standard multilingual-pretraining resampler (mT5/XLM-R use
    alpha ≈ 0.3). Keep rate per language = min(1, q_l·N / n_l)
    (downsample-only, no duplication); the keep decision compares the
    md5-derived uniform u(doc_id) against the ROUNDED rate, so both
    engines' pow() results quantize to the same 1e-6 grid before any
    comparison.

    Known residual float risk (r13 review, accepted): the rate passes
    through engine-specific pow() and a float Σw before the 6-dp
    round — a raw rate landing within ~1 ulp of a 0.5e-6 half-boundary
    could round differently across engines and flip that language's
    borderline docs. Unlike the money layer there is no integer grid
    for pow(); the 6-dp round is the mitigation, the residual window is
    ~1e-10 per language, and a flip would surface as a loud hash
    mismatch (not silent corruption) in the driver gate.

    Scale shape: two bounded grouped aggs (one row per language) with
    broadcast 1-row totals (BNLJ-whitelisted), then a shuffle-free
    row-wise keep projection — same shape as ``mixture_resample``."""
    doc = read_table(spark, sf_dir, "documents")
    per_lang = doc.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    tot = per_lang.agg(F.sum("n_lang").alias("_n_total"))
    weighted = per_lang.crossJoin(F.broadcast(tot)).withColumn(
        "w", F.pow(F.col("n_lang") / F.col("_n_total"), F.lit(MIX_ALPHA))
    )
    z = weighted.agg(F.sum("w").alias("_z"))
    rates = (
        weighted.crossJoin(F.broadcast(z))
        .select(
            "lang",
            F.round(
                F.least(
                    F.lit(1.0),
                    (F.col("w") / F.col("_z"))
                    * F.col("_n_total")
                    / F.col("n_lang"),
                ),
                6,
            ).alias("keep_rate"),
        )
    )
    return (
        doc.join(F.broadcast(rates), "lang")  # bounded: one row per language
        .withColumn("u", doc_uniform(F.col("doc_id")))
        .filter(F.col("u") < F.col("keep_rate"))
        .select(
            "doc_id",
            "lang",
            "keep_rate",
            F.round("u", 6).alias("u"),
        )
    )


def shuffle_key(col, epoch: int = 0):
    """Deterministic per-epoch permutation key: md5('epoch{N}:' || id)."""
    return F.md5(F.concat(F.lit(f"epoch{epoch}:"), col.cast("string")))


SHUFFLE_SALT = "epoch0"  # = shuffle_key(..., epoch=0)'s salt, used in oracles


def _guard_key_struct(key_cols: list[str]):
    """The row's range key as a comparable struct (Spark orders structs
    field-by-field, matching the range partitioner's lexicographic
    order). Key columns must be plain ASCENDING column names — a
    descending sort is expressed by negating the column at the call
    site (see affinity.exact_quintile) so the span guard can compare
    keys with plain struct ordering."""
    for c in key_cols:
        if not isinstance(c, str):
            raise TypeError(
                "running-sum order/group columns must be ascending column "
                f"NAMES (got {c!r}); express DESC by negating the column"
            )
    return F.struct(*[F.col(c) for c in key_cols])


def _pid_pinned(df: DataFrame, nparts: int, key_cols: list[str]) -> DataFrame:
    """Range-partition on ``key_cols``, LAZILY pin the result, and tag
    each row with its partition id.

    The persist is load-bearing, not a cache-for-speed: the counts leg
    and the output leg below both branch from this frame, and WITHOUT a
    pinned materialization they are two independent instantiations —
    ``spark_partition_id()`` is a nondeterministic expression, so the
    two subtrees are never ``sameResult`` and neither ReuseExchange nor
    AQE stage reuse may legally share their range shuffles. Each leg
    then samples its OWN range boundaries (the sampler is seeded by the
    runtime RDD id), the partition ids disagree, and positions corrupt.
    This is not theoretical: the r15 no-persist attempts failed the
    span guard nondeterministically at sf0.1 (and deterministically on
    window_ranking at 200 shuffle partitions, where column pruning
    additionally de-identified the legs' subtrees). Against one cached
    materialization both legs see one fixed layout: cache partitions
    are never AQE-coalesced, racing consumers compute against the one
    shuffle dependency (boundaries sample once per RDD instance), and
    eviction recomputes from that same dependency. The ``_drift_raise``
    span guard downstream stays as insurance — any inconsistency is a
    loud error, never silent corruption.

    The persist is LAZY — no job, no collect runs here (r14 verdict
    item 1: the per-invocation counts job + driver round-trip is what
    the r15 reformulation removed); the consumer's single action
    materializes it. Deliberately a bare persist, not cache.swap_persist
    (r08 adjudication, unchanged): a call-site swap key could evict a
    sibling invocation mid-build (segment_migration builds two same-key
    quintiles into one joined query). The leak is one bounded frame per
    invocation, reclaimed at session end; at deployment scale flip the
    storage level to DISK_ONLY if executor memory is contended."""
    return (
        df.repartitionByRange(nparts, *key_cols)
        .persist()
        .withColumn("_rs_pid", F.spark_partition_id())
    )


def _drift_raise(label: str, key_expr):
    """A broadcast-back offset/total is only trusted when the row's
    range key falls inside ITS partition's counts-leg span (r15: the
    offsets now ride the SAME one-action plan instead of driver-side
    literals). Both legs read the one lazily-persisted range-partitioned
    frame (see ``_pid_pinned`` for why the pin is load-bearing), so the
    guard never fires in a healthy plan; if the legs ever saw different
    layouts, any row whose partition assignment differs lands outside
    its counts-leg [min,max] span (range spans are disjoint and
    ordered), or in a partition with no counts row at all (NULL after
    the left join) — both reach this raise instead of silently
    corrupting positions (ADVICE r09's loud-miss contract, carried
    over)."""
    return F.raise_error(
        F.concat(
            F.lit(f"{label}-span miss (range boundary drift?) for key "),
            key_expr.cast("string"),
        )
    ).cast("long")


def global_positions(spark: SparkSession, df: DataFrame, order_cols: list[str]) -> DataFrame:
    """Total-order positions (1-based ``pos``) over ``order_cols``
    WITHOUT a single-partition global window — the distributed
    row-number primitive behind the epoch shuffle and exact ntile.

    Shape (ONE action since r15 — r14 verdict item 1): range-partition
    on the order key (Spark samples boundaries) into a lazily-pinned
    frame (``_pid_pinned`` — the pin is a correctness device, see its
    docstring), aggregate per-partition (count, min-key, max-key) as a
    ≤|partitions|-row side leg of the SAME plan, prefix-sum the counts
    with a window over that bounded leg, broadcast-join the offsets
    back on the partition id, and add them to a per-partition
    row_number. The r01-r14 form instead ran an EAGER counts job at
    frame-build time and baked the offsets as plan literals — one extra
    Spark job, an AQE planning session and a py4j round-trip per
    invocation (~40% of every consumer's wall time at bench scale, r15
    profile), all gone here; the materialization cost itself is
    unchanged (one cache write, as before). Correctness does NOT depend
    on exchange/stage reuse firing — both legs read the one pinned
    layout — and the span guard (``_drift_raise``) turns any residual
    inconsistency into a loud error, never silent corruption.

    ``order_cols`` must be ascending column NAMES forming a total order
    (include a tiebreak column; negate numeric columns for DESC) with
    non-null values. The output carries every input column plus ``pos``
    and ``_gp_tot`` (the total row count as a plan column — consumers
    that used the old driver-side scalar now fold the same integer
    arithmetic in-plan; the values are identical)."""
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    okey = _guard_key_struct(order_cols)
    keyed = _pid_pinned(df, nparts, order_cols)
    counts = keyed.groupBy("_rs_pid").agg(
        F.count(F.lit(1)).alias("_rs_n"),
        F.min(okey).alias("_rs_lo"),
        F.max(okey).alias("_rs_hi"),
    )
    # prefix-sum over the ≤|partitions|-row counts leg: the
    # SinglePartition exchange under these windows is bounded by
    # construction (tests/test_plan_lint.py exempts _rs_pid-ordered
    # unpartitioned windows for exactly this reason)
    w_off = W.orderBy("_rs_pid").rowsBetween(W.unboundedPreceding, -1)
    w_all = W.orderBy("_rs_pid").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    offs = counts.select(
        "_rs_pid",
        "_rs_lo",
        "_rs_hi",
        F.coalesce(F.sum("_rs_n").over(w_off), F.lit(0))
        .cast("long")
        .alias("_rs_off"),
        F.sum("_rs_n").over(w_all).cast("long").alias("_gp_tot"),
    )
    w = W.partitionBy("_rs_pid").orderBy(*order_cols)
    span_ok = (okey >= F.col("_rs_lo")) & (okey <= F.col("_rs_hi"))
    return (
        keyed.withColumn("_rs_rn", F.row_number().over(w).cast("long"))
        .join(F.broadcast(offs), "_rs_pid", "left")
        .withColumn(
            "pos",
            F.when(span_ok, F.col("_rs_rn") + F.col("_rs_off")).otherwise(
                _drift_raise("global_positions offset", okey)
            ),
        )
        .select(*df.columns, "pos", "_gp_tot")
    )


def _null_value_raise(value_col: str, label: str):
    """The value column must be non-null (the windowed prefix sum and
    the counts-leg subtotal must agree exactly; a leading all-NULL frame
    would silently NULL ``cum``). r01-r14 enforced this driver-side on
    the collected counts; the one-action form enforces it in-plan: the
    counts leg carries count(1) vs count(value) per slice, and any row
    of a violating slice raises at action time."""
    return F.raise_error(
        F.lit(
            f"{label}: value column {value_col!r} has NULL value(s) "
            "(non-null contract)"
        )
    ).cast("long")


def global_running_sum(
    spark: SparkSession,
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Running total of ``value_col`` over the total order ``order_cols``
    WITHOUT a single-partition global window — ``global_positions``'s
    sibling for weighted cumsums (token budgets, byte offsets).

    Same one-action shape as ``global_positions`` (see its docstring
    for the r15 reformulation rationale and the drift guard): the
    counts leg totals ``value_col`` per range partition, a bounded
    window prefix-sums the totals, and a broadcast join attaches them
    to the per-partition INCLUSIVE cumulative-sum window. ``value_col``
    must be integral and non-null (enforced in-plan — the prefix sums
    must agree exactly; float addition would be order-sensitive). The
    output carries every input column plus ``cum`` and ``_gr_tot`` (the
    grand total as a plan column — pps step size, ABC class bounds fold
    their integer arithmetic over it in-plan)."""
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    okey = _guard_key_struct(order_cols)
    keyed = _pid_pinned(df, nparts, order_cols)
    counts = keyed.groupBy("_rs_pid").agg(
        F.sum(value_col).alias("_rs_s"),
        F.count(F.lit(1)).alias("_rs_n"),
        F.count(value_col).alias("_rs_nv"),
        F.min(okey).alias("_rs_lo"),
        F.max(okey).alias("_rs_hi"),
    )
    w_off = W.orderBy("_rs_pid").rowsBetween(W.unboundedPreceding, -1)
    w_all = W.orderBy("_rs_pid").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    offs = counts.select(
        "_rs_pid",
        "_rs_lo",
        "_rs_hi",
        # ANY violating partition poisons every row (the old driver-side
        # check was likewise global) — and the raise must wrap the
        # addition below, never be an operand of it: Add's null-safe
        # codegen short-circuits `NULL + raise(...)` to NULL without
        # evaluating the guard (observed r15)
        (
            F.max((F.col("_rs_nv") != F.col("_rs_n")).cast("int")).over(w_all)
            == 1
        ).alias("_rs_nullbad"),
        F.coalesce(F.sum("_rs_s").over(w_off), F.lit(0))
        .cast("long")
        .alias("_rs_off"),
        F.sum("_rs_s").over(w_all).cast("long").alias("_gr_tot"),
    )
    w = (
        W.partitionBy("_rs_pid")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    span_ok = (okey >= F.col("_rs_lo")) & (okey <= F.col("_rs_hi"))
    return (
        keyed.withColumn("_rs_win", F.sum(value_col).over(w).cast("long"))
        .join(F.broadcast(offs), "_rs_pid", "left")
        .withColumn(
            "cum",
            F.when(
                F.col("_rs_nullbad"),
                _null_value_raise(value_col, "global_running_sum"),
            )
            .when(span_ok, F.col("_rs_win") + F.col("_rs_off"))
            .otherwise(_drift_raise("global_running_sum offset", okey)),
        )
        .select(*df.columns, "cum", "_gr_tot")
    )


# grouped_running_sum group-key types: string / integer / date. The
# original reason was literal-map key rendering (driver str() vs
# executor cast('string')); the r15 one-action form joins on the actual
# columns, but the restriction is KEPT — it pins the documented
# low-cardinality-key contract (floats/booleans as group keys are a
# design smell this primitive should refuse) and keeps the contract
# tests stable.
_GRS_KEY_TYPES = (
    T.StringType,
    T.LongType,
    T.IntegerType,
    T.ShortType,
    T.ByteType,
    T.DateType,
)


def grouped_running_sum(
    spark: SparkSession,
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    value_col: str,
) -> DataFrame:
    """PER-GROUP running total of ``value_col`` over ``order_cols``
    WITHOUT a per-group window shuffle — the keyed sibling of
    ``global_running_sum`` for LOW-cardinality group keys, where
    ``Window.partitionBy(group)`` would funnel each group's entire data
    into a single sort task (the scale-killer shape the r08 verdict
    flagged on ``weighted_median_by_group``).

    Shape (ONE action since r15, like the siblings): range-partition on
    ``(group_cols, order_cols)`` — rows of one group span a contiguous
    pid range and every partition holds at most a few groups — total
    ``value_col`` per ``(pid, group)`` as a bounded side leg of the SAME
    plan (≤ |partitions| + |groups| rows by contiguity), prefix-sum per
    group over pid order with windows over that bounded leg, and
    broadcast-join the offsets back on ``(pid, group)``. Parallelism is
    |partitions| regardless of |groups|. The output carries three new
    columns: ``cum`` (INCLUSIVE running sum within the row's group),
    ``gtot`` (the group's grand total) and ``_gr_all`` (the grand total
    over ALL groups — consumers must not re-aggregate the fact to
    rederive either).

    Constraints mirror the sibling: ``value_col`` integral and non-null
    (the two prefix-sum legs must agree exactly; enforced in-plan),
    ``order_cols`` ascending column names forming a total order WITHIN
    each group, group/order columns non-null (a NULL group key misses
    the offsets join and raises at action time). Group columns must be
    string / integer / date typed — ENFORCED eagerly below; the
    restriction pins the documented low-cardinality-key contract.
    Boundary drift between the two reads of the range exchange (only
    possible if exchange reuse failed AND resampling moved a boundary)
    is caught per row by the span guard — see ``_drift_raise``."""
    for c in group_cols:
        dt = df.schema[c].dataType
        if not isinstance(dt, _GRS_KEY_TYPES):
            raise TypeError(
                f"grouped_running_sum group column {c!r} has type {dt}; "
                "only string/integer/date group keys are supported (the "
                "documented low-cardinality-key contract)"
            )
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    gokey = _guard_key_struct([*group_cols, *order_cols])
    keyed = _pid_pinned(df, nparts, [*group_cols, *order_cols])
    counts = keyed.groupBy("_rs_pid", *group_cols).agg(
        F.sum(value_col).alias("_rs_s"),
        F.count(F.lit(1)).alias("_rs_n"),
        F.count(value_col).alias("_rs_nv"),
        F.min(gokey).alias("_rs_lo"),
        F.max(gokey).alias("_rs_hi"),
    )
    # all three prefix/total windows run over the bounded counts leg and
    # order by _rs_pid (the plan-lint exemption marker): per-group
    # offsets, per-group grand totals, and the all-groups grand total
    w_off = (
        W.partitionBy(*group_cols)
        .orderBy("_rs_pid")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_gt = (
        W.partitionBy(*group_cols)
        .orderBy("_rs_pid")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    w_all = W.orderBy("_rs_pid").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    offs = counts.select(
        "_rs_pid",
        *group_cols,
        "_rs_lo",
        "_rs_hi",
        # global any-violation flag; see global_running_sum for why the
        # raise must live INSIDE the when-chain, not under an Add
        (
            F.max((F.col("_rs_nv") != F.col("_rs_n")).cast("int")).over(w_all)
            == 1
        ).alias("_rs_nullbad"),
        F.coalesce(F.sum("_rs_s").over(w_off), F.lit(0))
        .cast("long")
        .alias("_rs_off"),
        F.sum("_rs_s").over(w_gt).cast("long").alias("_rs_gt"),
        F.sum("_rs_s").over(w_all).cast("long").alias("_gr_all"),
    )
    w = (
        W.partitionBy("_rs_pid", *group_cols)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    span_ok = (gokey >= F.col("_rs_lo")) & (gokey <= F.col("_rs_hi"))
    # a NULL group key would miss the offsets equi-join and surface as a
    # (misleading) drift error — name the actual contract violation first
    null_key = functools.reduce(
        lambda a, b: a | b, [F.col(c).isNull() for c in group_cols]
    )

    def _guarded(col, label):
        return (
            F.when(
                null_key,
                F.raise_error(
                    F.lit(
                        "grouped_running_sum: group column contains NULL "
                        "(non-null contract)"
                    )
                ).cast("long"),
            )
            .when(
                F.col("_rs_nullbad"),
                _null_value_raise(value_col, "grouped_running_sum"),
            )
            .when(span_ok, col)
            .otherwise(_drift_raise(label, gokey))
        )

    return (
        keyed.withColumn("_rs_win", F.sum(value_col).over(w).cast("long"))
        .join(F.broadcast(offs), ["_rs_pid", *group_cols], "left")
        .withColumn(
            "cum",
            _guarded(
                F.col("_rs_win") + F.col("_rs_off"),
                "grouped_running_sum offset",
            ),
        )
        .withColumn(
            "gtot", _guarded(F.col("_rs_gt"), "grouped_running_sum total")
        )
        .select(*df.columns, "cum", "gtot", "_gr_all")
    )


def q_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle: assign every document its position
    in a pseudo-random permutation — ORDER BY md5(salt || doc_id). The
    training-data ordering primitive: reshuffling 100 TB per epoch is a
    SORT by a new salt's hash (fully distributed, reproducible on retry,
    skew-free keys by construction), not an in-memory permutation.
    Emitting the position makes the whole permutation value-checked.

    Scale shape: one range-partitioned sort (Spark samples hash
    boundaries). Writing the sorted output per epoch IS the shuffle; a
    trainer then reads sequentially. Positions come from
    ``global_positions`` — range partition + per-partition row_number +
    broadcast-back offsets — so every stage stays cluster-parallel;
    no single-partition global window anywhere in the plan."""
    doc = read_table(spark, sf_dir, "documents")
    keyed = doc.select(
        "doc_id", shuffle_key(F.col("doc_id"), epoch=0).alias("shuffle_key")
    )
    pos = global_positions(spark, keyed, ["shuffle_key"])
    return pos.select("doc_id", "shuffle_key", "pos")


N_CURRICULUM_BINS = 10


def q_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning: rank every document by a difficulty proxy
    (token count — longer ⇒ harder) and assign equal-population deciles,
    reporting per-bin boundaries and token mass. A staged pretraining
    run consumes bins in order (easy → hard); the bin column is what a
    curriculum sampler partitions on.

    Scale shape: EXACT ntile semantics, fully distributed. NTILE(k)
    over a total order is a pure function of the global row position:
    with q = n div k and r = n mod k, the first r buckets hold q+1 rows
    and the rest hold q (the FRONT-LOADED standard split — NOT the
    Bresenham floor((pos-1)·k/n)+1 spread, which distributes the r
    extra rows evenly and diverges from NTILE whenever n mod k ≥ 2;
    r13 review finding — the fixtures' doc counts are all ≡ 0 mod 10,
    so only a non-multiple corpus exposed it). Positions come from
    ``global_positions`` (range partition + per-partition row_number +
    driver offset prefix-sum), so unlike a bare ntile window NOTHING
    funnels through one task; the grouped report after binning is
    bounded (k rows). At even larger scale the same bins can be
    approximated by percentile_approx boundaries + width_bucket, but
    the exact path above already holds at 100 TB."""
    doc = read_table(spark, sf_dir, "documents")
    n_tok = F.size(_tokens()).cast("long")
    keyed = doc.select("doc_id", n_tok.alias("n_tokens"))
    pos = global_positions(spark, keyed, ["n_tokens", "doc_id"])
    k = N_CURRICULUM_BINS
    # the same q/r = divmod(max(n, 1), k) arithmetic the r01-r14 form
    # ran on the driver-side scalar, folded in-plan over the helper's
    # _gp_tot column (identical integers, so identical bins); rows
    # 1..r(q+1) land in the r big buckets, the rest in q-row ones
    # (q can be 0 when n < k: the first branch then covers every row,
    # and the guarded greatest(q, 1) keeps the dead branch well-defined)
    p = F.col("pos")
    q = F.expr(f"greatest(_gp_tot, 1L) div {k}")
    r = F.expr(f"greatest(_gp_tot, 1L) % {k}")
    big_span = r * (q + 1)
    binned = pos.withColumn(
        "bin",
        F.when(
            p <= big_span,
            F.floor((p - 1) / (q + 1)) + 1,
        )
        .otherwise(
            r + F.floor((p - big_span - 1) / F.greatest(q, F.lit(1))) + 1
        )
        .cast("long"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
        F.sum("n_tokens").alias("bin_tokens"),
    )


def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset card — the summary table a corpus release ships
    with: sizes, source/language diversity, the dominant language, the
    exact-duplicate rate, and length stats. One scan for the row-wise
    stats + one digest-grouped pass for the dup rate; everything else
    derives from grouped counts (bounded)."""
    doc = read_table(spark, sf_dir, "documents")
    n_tok = F.size(_tokens()).cast("long")
    base = doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok).alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
        F.count_distinct("source").alias("n_sources"),
        F.count_distinct("lang").alias("n_langs"),
        F.round(F.avg(n_tok), 6).alias("mean_doc_tokens"),
        F.count_distinct(F.md5("text")).alias("n_unique_texts"),
    )
    top_lang = (
        doc.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("lang").asc())
        .limit(1)
        .select(F.col("lang").alias("top_lang"))
    )
    return base.crossJoin(top_lang).select(
        "n_docs",
        "n_tokens",
        "n_chars",
        "n_sources",
        "n_langs",
        "mean_doc_tokens",
        F.round(1 - F.col("n_unique_texts") / F.col("n_docs"), 6).alias("dup_rate"),
        "top_lang",
    )


N_FOLDS = 5
STRATUM_K = 20
N_NEGATIVES = 4


def q_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold assignment: fold = md5-uniform(doc_id)
    bucketed into N_FOLDS — reproducible across engines, runs, and
    partitionings (a ``rand()`` fold would re-deal on every retry,
    leaking train into val). Shuffle-free row-wise codegen; the fold
    histogram is the bounded check surface."""
    doc = read_table(spark, sf_dir, "documents")
    fold = F.floor(doc_uniform(F.col("doc_id")) * N_FOLDS).cast("long")
    return (
        doc.select("doc_id", fold.alias("fold"))
        .groupBy("fold")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
    )


def q_topk_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-stratum sampling: per source, the STRATUM_K docs
    with the smallest md5-uniform — a fixed-SIZE deterministic sample
    (eval-set construction), vs the fixed-RATE `stratified_hash_sample`.
    One windowed top-k per stratum; state is k rows per group."""
    doc = read_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(F.col("u_raw").asc(), F.col("doc_id").asc())
    return (
        doc.select("doc_id", "source", doc_uniform(F.col("doc_id")).alias("u_raw"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= STRATUM_K)
        .select(
            "source",
            "doc_id",
            F.round("u_raw", 6).alias("u"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


PRIORITY_K = 150  # exact sample size (documents table ≥ 500 at every SF)


def priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    priority_col: str,
    k: int,
    cache_key: str,
) -> DataFrame:
    """Shared exact-K sampling core: given a frame with an integer id, a
    weight, and a precomputed ``priority`` column, return the top-``k``
    rows under (priority DESC, id ASC) with a Horvitz–Thompson adjusted
    weight ``est_w`` = max(weight, τ), τ = the (k+1)-th priority (0 when
    the frame has ≤ k rows, i.e. the whole population is the sample).

    One TakeOrderedAndProject(k+1) materializes the candidate frame
    (swap-persisted under ``cache_key``); the boundary row is found by a
    1-row MIN(struct(priority, -id)) aggregate and the kept rows are the
    ones strictly above it under the same total order the sort used —
    deterministic even under exact priority ties."""
    top = swap_persist(
        cache_key,
        df.orderBy(F.col(priority_col).desc(), F.col(id_col).asc()).limit(
            k + 1
        ),
    )
    last_struct = F.struct(
        F.col(priority_col).alias("p"), (-F.col(id_col)).alias("nid")
    )
    bound = top.agg(
        F.count(F.lit(1)).alias("n_top"),
        F.min(last_struct).alias("last"),
    )
    tau = F.when(F.col("n_top") == k + 1, F.col("last.p")).otherwise(
        F.lit(0.0)
    )
    return (
        top.crossJoin(F.broadcast(bound))
        .filter((F.col("n_top") < k + 1) | (last_struct > F.col("last")))
        .withColumn(
            "est_w",
            F.round(
                F.greatest(F.col(weight_col).cast("double"), tau), 6
            ),
        )
        .drop("n_top", "last")
    )


def q_priority_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-K weighted sampling WITHOUT replacement via priority
    sampling (Duffield–Lund–Thorup, JACM 2007): each doc gets priority
    w/u with w = token count and u an md5-derived uniform; the sample is
    the top-K priorities and every kept doc carries its Horvitz–Thompson
    adjusted weight max(w, τ), τ = the (K+1)-th priority — the estimator
    that makes Σ est_w over ANY subset unbiased for that subset's true
    token mass. The missing face of the sampling family: Bernoulli
    (`weighted_hash_sample`) has random size, PPS systematic
    (`pps_systematic_sample`) needs a global cumsum pass; priority
    sampling is exact-K in ONE top-K pass with no shuffle of the fact.

    Cross-engine exactness: u = (m+1)/2^32 from the first 8 md5 hex
    digits, so priority = w·2^32/(m+1) divides one exact integer-valued
    double by another (w < 2^21 keeps w·2^32 under 2^53) — IEEE division
    is correctly rounded, hence bit-identical in Spark and DuckDB; no
    pow/ln anywhere (those are NOT correctly rounded cross-engine).

    Scale shape: TakeOrderedAndProject(K+1) — per-partition partial
    top-K then a single K+1-row merge, no global sort, no window. The
    threshold row is found by a 1-row MIN(struct(priority, -doc_id))
    aggregate over the cached K+1 frame (BNLJ-whitelisted 1-row
    crossJoin), and the kept K rows are the ones strictly above it under
    the same total order the sort used — deterministic even under
    priority ties. A corpus smaller than K+1 keeps everything with
    est_w = w (τ = 0)."""
    doc = read_table(spark, sf_dir, "documents")
    m1 = md5_u32(F.col("doc_id")) + 1
    w_tok = F.size(_tokens()).cast("long")
    d = doc.select(
        "doc_id",
        w_tok.alias("n_tok"),
        (
            w_tok.cast("double") * F.lit(float(1 << 32)) / m1.cast("double")
        ).alias("priority"),
    )
    return priority_sample(
        d, "doc_id", "n_tok", "priority", PRIORITY_K, "priority_sample_topk.top"
    ).select(
        "doc_id",
        "n_tok",
        F.round("priority", 6).alias("priority"),
        "est_w",
    )


PRIORITY_GROUP_K = 20  # per-source sample size (25 docs/source at sf0.01)


def q_priority_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRATIFIED priority sampling: exactly K docs per source, weighted
    by token count, each with its per-stratum Horvitz–Thompson adjusted
    weight max(w, τ_source) — the balanced-across-domains face of
    `priority_sample_topk` (a global top-K lets one heavy source crowd
    out the rest; per-source τ keeps every stratum's subset-sum
    estimator unbiased within its own domain). Same bit-exact priority
    w·2^32/(m+1) as the global sampler (shared `md5_u32`; no pow/ln).

    Scale shape: one ranked window per source with a rank ≤ K+1 filter —
    Spark pushes the bound below the exchange (WindowGroupLimit), so
    per-group sort state is K+1 rows per map partition regardless of
    stratum size (the `topk_hash_sample` precedent; low-card-window
    whitelisted for exactly that reason). τ per source is a grouped MAX
    over that ≤|sources|·(K+1)-row frame broadcast-joined back; a
    stratum smaller than K+1 keeps everything with est_w = w."""
    doc = read_table(spark, sf_dir, "documents")
    m1 = md5_u32(F.col("doc_id")) + 1
    w_tok = F.size(_tokens()).cast("long")
    d = doc.select(
        "source",
        "doc_id",
        w_tok.alias("n_tok"),
        (
            w_tok.cast("double") * F.lit(float(1 << 32)) / m1.cast("double")
        ).alias("priority"),
    )
    w = W.partitionBy("source").orderBy(
        F.col("priority").desc(), F.col("doc_id").asc()
    )
    top = d.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= PRIORITY_GROUP_K + 1
    )
    taus = top.groupBy("source").agg(
        F.max(
            F.when(F.col("rn") == PRIORITY_GROUP_K + 1, F.col("priority"))
        ).alias("tau")
    )
    return (
        top.filter(F.col("rn") <= PRIORITY_GROUP_K)
        .join(F.broadcast(taus), "source")
        .select(
            "source",
            "doc_id",
            "n_tok",
            F.round("priority", 6).alias("priority"),
            F.round(
                F.greatest(
                    F.col("n_tok").cast("double"),
                    F.coalesce(F.col("tau"), F.lit(0.0)),
                ),
                6,
            ).alias("est_w"),
        )
    )


def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training negative sampling: for each anchor doc,
    N_NEGATIVES pseudo-random OTHER docs chosen by a deterministic hash
    ring — neg_j = (anchor + 1 + md5(anchor:j) mod (n_docs-1)) mod
    n_docs over the dense doc_id space. Self-pairs are impossible by
    construction (offset ∈ [1, n-1]); the draw is reproducible on
    retry, which a resumable pipeline needs. Shuffle-free: one row-wise
    explode (the corpus count is a 1-row broadcast).

    PRECONDITIONS (r13 review): doc_ids must be DENSE [0, n) — a sparse
    or 1-based id space makes neg_doc_id name nonexistent documents on
    both engines alike (remap ids first, e.g. via global_positions);
    and the batch must have ≥ 2 docs (n_docs = 1 makes the ring's
    ``mod (n-1)`` degenerate — Spark's non-ANSI mod-by-zero yields NULL
    where DuckDB errors; a 1-doc corpus has no negatives to sample)."""
    doc = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    n = doc.agg(F.count(F.lit(1)).alias("n_docs"))
    negs = F.transform(
        F.sequence(F.lit(0), F.lit(N_NEGATIVES - 1)),
        lambda j: (
            F.col("doc_id")
            + 1
            + md5_u32(
                F.concat(F.col("doc_id").cast("string"), F.lit(":"), j.cast("string"))
            )
            % (F.col("n_docs") - 1)
        )
        % F.col("n_docs"),
    )
    return (
        doc.crossJoin(F.broadcast(n))  # 1-row corpus size
        .select("doc_id", F.posexplode(negs).alias("j", "neg_doc_id"))
        .select("doc_id", F.col("j").cast("long").alias("j"), "neg_doc_id")
    )


# Exact split quotas in tenths: train/val/test = 8/1/1. Each stratum
# gets EXACTLY floor(n·8/10) train and floor(n/10) val docs (test takes
# the remainder), not an expected fraction. Both the Spark expressions
# and the DuckDB oracle are DERIVED from this tuple (per-class floor
# quotas, cut points = partial sums — deliberately NOT cumulative
# floor(n·9/10), which differs from floor(n·8/10)+floor(n/10) when the
# remainders interact).
SPLIT_TENTHS = (("train", 8), ("val", 1), ("test", 1))
_SPLIT_DEN = sum(w for _, w in SPLIT_TENTHS)


def _split_cuts(total_col: str, intdiv: str) -> list[tuple[str, str]]:
    """(label, cut-SQL) for all but the last class: cut_i = Σ_{j≤i}
    floor(total·w_j/den), rendered with the engine's integer-division
    operator (`DIV` for Spark, `//` for DuckDB)."""
    terms: list[str] = []
    cuts: list[tuple[str, str]] = []
    for label, w in SPLIT_TENTHS[:-1]:
        terms.append(f"{total_col} * {w} {intdiv} {_SPLIT_DEN}")
        cuts.append((label, " + ".join(terms)))
    return cuts


def q_exact_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-count stratified train/val/test split: within every source,
    order docs by a deterministic md5 permutation and cut at integer
    quotas — train gets EXACTLY ``floor(n·8/10)`` docs per source, val
    ``floor(n/10)``, test the remainder. The eval-set assembly primitive
    where Bernoulli samplers (``stratified_hash_sample``) are wrong by
    ±√n per stratum and ``kfold_assign``'s hash-mod folds only hit
    quotas in expectation; exactness means a 100-doc source yields a
    10-doc val set, never 7 or 13. Deterministic across engines, runs,
    and partitionings (hash order + integer DIV — re-running a failed
    stage re-deals the SAME split).

    Scale shape: per-source positions come from ``grouped_running_sum``
    over a constant-1 weight (range partition + per-(pid, source)
    offsets — no low-cardinality window sort), quotas are row-local
    int64 ``DIV`` arithmetic on the helper's ``gtot`` literal — no
    second scan, no join, no driver math."""
    d = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .withColumn("h", F.md5(F.col("doc_id").cast("string")))
        .withColumn("one", F.lit(1).cast("long"))
    )
    rs = grouped_running_sum(spark, d, ["source"], ["h", "doc_id"], "one")
    split_col = None
    for label, cut in _split_cuts("gtot", "DIV"):
        cond = F.col("cum") <= F.expr(cut)
        split_col = (
            F.when(cond, label) if split_col is None else split_col.when(cond, label)
        )
    split_col = split_col.otherwise(SPLIT_TENTHS[-1][0])
    return rs.select(
        "doc_id",
        "source",
        F.col("cum").alias("pos"),
        split_col.alias("split"),
    )


_ESS_CASE = (
    "CASE "
    + " ".join(
        f"WHEN pos <= {cut} THEN '{label}'"
        for label, cut in _split_cuts("n", "//")
    )
    + f" ELSE '{SPLIT_TENTHS[-1][0]}' END"
)

_ESS_ORACLE = f"""
    WITH k AS (
        SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    ), c AS (
        SELECT doc_id, source,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY h, doc_id
               ) AS BIGINT) AS pos,
               CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
        FROM k
    )
    SELECT doc_id, source, pos,
           {_ESS_CASE} AS split
    FROM c
"""


N_HASH_BUCKETS = 64  # feature-hashing dimensionality


def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization: tokens → md5-derived bucket in
    [0, 64), per-document bucket counts — the fixed-width sparse
    representation a linear probe/classifier trains on without a
    vocabulary pass. md5 (not xxhash64) so the bucket function is
    engine-portable and the oracle exact; at scale you'd swap in
    xxhash64 (same shape, cheaper hash). Explode → grouped count with
    map-side combine; shuffle carries (doc, bucket, partial count)."""
    doc = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    tok = doc.select("doc_id", F.explode(_tokens()).alias("tok"))
    bucket = (
        md5_u32(F.col("tok"))
        % N_HASH_BUCKETS
    )
    return (
        tok.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_weighted_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic sampling: keep each doc with
    probability equal to its diversity score, decided by comparing an
    md5-derived uniform u(doc_id) ∈ [0,1) against the score. Unlike
    ``rand()``-based sampling this is reproducible across engines, runs,
    and partitionings — the property a resumable 100 TB pipeline needs
    (re-running a failed stage must re-select the SAME docs). Shuffle-
    free row-wise codegen."""
    doc = read_table(spark, sf_dir, "documents")
    toks = _tokens()
    quality = F.size(F.array_distinct(toks)) / F.size(toks)
    u = doc_uniform(F.col("doc_id"))
    return (
        doc.select(
            "doc_id",
            F.round(quality, 6).alias("quality"),
            F.round(u, 6).alias("u"),
        )
        .filter(F.col("u") < F.col("quality"))
    )


PPL_DOCS = 200  # scored-document slice for the checkable query


def q_bigram_loglik(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram log-likelihood scoring (the perplexity
    quality signal): P(w_i | w_{i-1}) with add-1 smoothing from the
    corpus's own bigram/unigram counts, per-document mean log-prob.
    Low scores flag machine-generated / out-of-distribution text.

    Scale shape: the language model IS two grouped aggregates (bigram
    and unigram counts — map-side combined, shuffled once each); scoring
    joins each document's bigrams against the model on the bigram key.
    The model tables scale with vocabulary (square-root-ish of corpus),
    not corpus size, so the joins stay cheap relative to the scan. All
    engine-portable arithmetic: LN on exact integer ratios."""
    doc = read_table(spark, sf_dir, "documents")
    toks = doc.select("doc_id", F.posexplode(_tokens()).alias("pos", "w"))
    w_next = W.partitionBy("doc_id").orderBy("pos")
    bigrams = (
        toks.select(
            "doc_id", "pos", F.col("w").alias("w1"),
            F.lead("w").over(w_next).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
    )
    big_counts = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni_counts = toks.groupBy(F.col("w").alias("w1")).agg(
        F.count(F.lit(1)).alias("c1")
    )
    n_vocab = uni_counts.count()  # scalar: vocabulary size (bounded)
    scored = (
        bigrams.filter(F.col("doc_id") < PPL_DOCS)
        .join(big_counts, ["w1", "w2"])
        .join(uni_counts, "w1")
        # add-1 smoothing; quantize each term so cross-engine grouped-sum
        # association (~1e-16/term) cannot cross the final round boundary
        .withColumn(
            "lp",
            F.round(
                F.log((F.col("c12") + 1) / (F.col("c1") + F.lit(n_vocab))), 9
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("lp"), 6).alias("mean_loglik"),
    )


PPS_K = 100  # systematic sample pointers


def q_pps_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size SYSTEMATIC sampling: lay
    ``PPS_K`` equally-spaced pointers along the corpus's cumulative
    n_chars axis (deterministic mid-step start ``u = step div 2``) and
    keep every document a pointer lands in — the exact-k,
    weight-proportional sampler (big docs can take several pointers:
    ``n_hits`` ≥ 2) that complements the Bernoulli-style
    ``weighted_hash_sample``/``mixture_resample`` keeps. Classic PPS
    from survey statistics / particle-filter resampling, and the shape a
    token-budgeted corpus draw needs ("give me exactly K slots spread
    by size").

    Everything is int64: the cumulative axis comes from
    ``global_running_sum`` (range partition + per-partition window +
    broadcast-back offsets — no single-partition global window), and a doc's
    pointer count is a difference of two CAPPED integer divisions
    ``f(x) = min(K, (x - u - 1 + step) div step)``, so the selected SET
    is engine-exact (no float anywhere; all-nonnegative args keep
    truncating and flooring division identical) and Σ n_hits telescopes
    to ``f(W) - f(0) = K`` exactly whenever W ≥ K — WITHOUT the cap,
    W mod (K·step) > u would overcount (e.g. W=1050, K=100: pointer
    #100 at u+100·step=1005 < W). Degenerate corpora (W < K) clamp
    step to 1 and yield W hits. The step constants fold over the
    helper's ``_gr_tot`` plan column (r15) — no second scan, no 1-row
    crossJoin, no driver round-trip."""
    doc = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    cum = global_running_sum(spark, doc, ["doc_id"], "n_chars")
    # step = max(1, W div K), u = step div 2 — the same integer
    # arithmetic the r01-r14 form ran on the driver-side total, folded
    # in-plan over the helper's _gr_tot column (identical integers;
    # Python // equals Spark div on non-negative operands)
    step = f"greatest(1L, _gr_tot div {PPS_K})"
    u = f"(({step}) div 2)"
    f_hi = f"least({PPS_K}L, (cum - {u} - 1 + ({step})) div ({step}))"
    f_lo = (
        f"least({PPS_K}L, (cum - n_chars - {u} - 1 + ({step})) div ({step}))"
    )
    return (
        cum.withColumn("n_hits", F.expr(f"({f_hi}) - ({f_lo})"))
        .filter(F.col("n_hits") >= 1)
        .select("doc_id", "source", "n_chars", "cum", "n_hits")
    )


_PPS_ORACLE = f"""
    WITH c AS (
        SELECT doc_id, source, n_chars,
               CAST(SUM(n_chars) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum
        FROM documents
    ), t AS (
        SELECT CAST(SUM(n_chars) AS BIGINT) AS w FROM documents
    ), p AS (
        SELECT GREATEST(1, w // {PPS_K}) AS step,
               GREATEST(1, w // {PPS_K}) // 2 AS u
        FROM t
    )
    SELECT doc_id, source, n_chars, cum,
           CAST(LEAST({PPS_K}, (cum - u - 1 + step) // step)
                - LEAST({PPS_K}, (cum - n_chars - u - 1 + step) // step)
                AS BIGINT) AS n_hits
    FROM c CROSS JOIN p
    WHERE LEAST({PPS_K}, (cum - u - 1 + step) // step)
          - LEAST({PPS_K}, (cum - n_chars - u - 1 + step) // step) >= 1
"""


def q_grouped_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority running revenue: every order's cumulative booked
    cents within its order priority, in (date, key) arrival order, plus
    the priority's grand total — the running-balance / budget-burn-down
    primitive over a LOW-cardinality group key (5 priorities).

    The deliberate point of this query is the scale shape: a plain
    ``Window.partitionBy(o_orderpriority)`` would hash the entire orders
    fact into 5 partitions and sort each inside ONE task — at 100 TB,
    five ~20 TB single-task sorts. ``grouped_running_sum`` instead
    range-partitions on (priority, date, key), computes per-(partition,
    group) subtotals inside the same single action, and stitches global
    per-group cumsums from per-partition windows + broadcast-back
    offsets, so parallelism stays |partitions| no matter how few groups
    exist. ``gtot`` rides the same plan as a column — no second fact scan.
    All int64 on the cents grid; (date, key) is a total order within
    every group, so the cumsum is deterministic and hash-checkable."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    rs = grouped_running_sum(
        spark, o, ["o_orderpriority"], ["o_orderdate", "o_orderkey"], "cents"
    )
    return rs.select(
        "o_orderkey",
        "o_orderpriority",
        F.col("cum").alias("cum_cents"),
        F.col("gtot").alias("tot_cents"),
    )


_GRR_ORACLE = """
    WITH src AS (
        SELECT o_orderkey, o_orderpriority, o_orderdate,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    )
    SELECT o_orderkey, o_orderpriority,
           CAST(SUM(cents) OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_cents,
           CAST(SUM(cents) OVER (
               PARTITION BY o_orderpriority
           ) AS BIGINT) AS tot_cents
    FROM src
"""


QUERIES = {
    "exact_stratified_split": q_exact_stratified_split,
    "grouped_running_revenue": q_grouped_running_revenue,
    "pps_systematic_sample": q_pps_systematic_sample,
    "feature_hashing": q_feature_hashing,
    "bigram_loglik": q_bigram_loglik,
    "weighted_hash_sample": q_weighted_hash_sample,
    "seq_packing": q_seq_packing,
    "quality_filter_chain": q_quality_filter_chain,
    "top_p_quality_sample": q_top_p_quality_sample,
    "incremental_dedup": q_incremental_dedup,
    "pii_redaction": q_pii_redaction,
    "source_mix_report": q_source_mix_report,
    "mixture_resample": q_mixture_resample,
    "temperature_mixture": q_temperature_mixture,
    "curriculum_buckets": q_curriculum_buckets,
    "deterministic_shuffle": q_deterministic_shuffle,
    "dataset_card": q_dataset_card,
    "kfold_assign": q_kfold_assign,
    "topk_hash_sample": q_topk_hash_sample,
    "priority_sample_topk": q_priority_sample_topk,
    "priority_sample_per_source": q_priority_sample_per_source,
    "negative_sampling": q_negative_sampling,
}

_STOP_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)

ORACLES: dict[str, str] = {
    "exact_stratified_split": _ESS_ORACLE,
    "grouped_running_revenue": _GRR_ORACLE,
    "pps_systematic_sample": _PPS_ORACLE,
    "bigram_loglik": f"""
        WITH tok AS (
            SELECT doc_id,
                   generate_subscripts(string_split(text, ' '), 1) AS pos,
                   unnest(string_split(text, ' ')) AS w
            FROM documents
        ), big AS (
            SELECT doc_id, pos, w AS w1,
                   LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
            FROM tok
        ), bigrams AS (
            SELECT doc_id, w1, w2 FROM big WHERE w2 IS NOT NULL
        ), bc AS (
            SELECT w1, w2, COUNT(*) AS c12 FROM bigrams GROUP BY w1, w2
        ), uc AS (
            SELECT w AS w1, COUNT(*) AS c1 FROM tok GROUP BY w
        ), nv AS (
            SELECT COUNT(*) AS v FROM uc
        )
        SELECT b.doc_id,
               COUNT(*) AS n_bigrams,
               ROUND(AVG(ROUND(LN(CAST(bc.c12 + 1 AS DOUBLE)
                                  / (uc.c1 + nv.v)), 9)), 6) AS mean_loglik
        FROM bigrams b
        JOIN bc ON b.w1 = bc.w1 AND b.w2 = bc.w2
        JOIN uc ON b.w1 = uc.w1
        CROSS JOIN nv
        WHERE b.doc_id < {PPL_DOCS}
        GROUP BY b.doc_id
    """,
    "priority_sample_per_source": f"""
        WITH d AS (
            SELECT source, doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                   CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                        AS BIGINT) + 1 AS m1
            FROM documents
        ), p AS (
            SELECT source, doc_id, n_tok,
                   CAST(n_tok AS DOUBLE) * 4294967296.0 / CAST(m1 AS DOUBLE)
                       AS priority
            FROM d
        ), r AS (
            SELECT source, doc_id, n_tok, priority,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY priority DESC, doc_id ASC
                   ) AS rn
            FROM p
        ), taus AS (
            SELECT source,
                   MAX(CASE WHEN rn = {PRIORITY_GROUP_K + 1}
                            THEN priority END) AS tau
            FROM r WHERE rn <= {PRIORITY_GROUP_K + 1} GROUP BY source
        )
        SELECT r.source, doc_id, n_tok, ROUND(priority, 6) AS priority,
               ROUND(GREATEST(CAST(n_tok AS DOUBLE),
                              COALESCE(tau, 0.0)), 6) AS est_w
        FROM r JOIN taus ON r.source = taus.source
        WHERE rn <= {PRIORITY_GROUP_K}
    """,
    "priority_sample_topk": f"""
        WITH d AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                   CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                        AS BIGINT) + 1 AS m1
            FROM documents
        ), p AS (
            SELECT doc_id, n_tok,
                   CAST(n_tok AS DOUBLE) * 4294967296.0 / CAST(m1 AS DOUBLE)
                       AS priority
            FROM d
        ), r AS (
            SELECT doc_id, n_tok, priority,
                   ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id ASC)
                       AS rn,
                   COUNT(*) OVER () AS n_all
            FROM p
        ), tau AS (
            SELECT CASE WHEN MAX(n_all) >= {PRIORITY_K + 1}
                        THEN MAX(CASE WHEN rn = {PRIORITY_K + 1}
                                      THEN priority END)
                        ELSE 0.0 END AS t
            FROM r
        )
        SELECT doc_id, n_tok, ROUND(priority, 6) AS priority,
               ROUND(GREATEST(CAST(n_tok AS DOUBLE), t), 6) AS est_w
        FROM r, tau WHERE rn <= {PRIORITY_K}
    """,
    "weighted_hash_sample": """
        WITH s AS (
            SELECT doc_id,
                   ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                         / len(string_split(text, ' ')), 6) AS quality,
                   ROUND(CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                                   AS BIGINT) AS DOUBLE) / 4294967296.0, 6) AS u
            FROM documents
        )
        SELECT doc_id, quality, u FROM s WHERE u < quality
    """,
    "feature_hashing": f"""
        SELECT doc_id,
               CAST('0x' || substring(md5(tok), 1, 8) AS BIGINT)
                   % {N_HASH_BUCKETS} AS bucket,
               COUNT(*) AS n
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents WHERE doc_id < 200)
        GROUP BY doc_id, bucket
    """,
    "seq_packing": f"""
        SELECT doc_id, source,
               len(string_split(text, ' ')) AS n_tokens,
               CAST(FLOOR(
                   (SUM(len(string_split(text, ' ')))
                        OVER (PARTITION BY source ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - len(string_split(text, ' '))) / {PACK_BUDGET}
               ) AS BIGINT) AS pack_id
        FROM documents
    """,
    "quality_filter_chain": f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), m AS (
            SELECT doc_id,
                   len(toks) AS n,
                   CAST(len(list_filter(toks, x -> x IN ({_STOP_SQL}))) AS DOUBLE)
                       / len(toks) AS stop_ratio,
                   CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS div_ratio
            FROM t
        )
        SELECT doc_id,
               CAST(n >= {LEN_MIN} AND n <= {LEN_MAX} AS INT) AS len_ok,
               CAST(div_ratio >= {DIVERSITY_MIN} AS INT) AS diversity_ok,
               CAST(stop_ratio >= {STOPWORD_MIN} AS INT) AS stopword_ok,
               CAST(n >= {LEN_MIN} AND n <= {LEN_MAX}
                    AND div_ratio >= {DIVERSITY_MIN}
                    AND stop_ratio >= {STOPWORD_MIN} AS INT) AS keep
        FROM m
    """,
    "top_p_quality_sample": f"""
        WITH s AS (
            SELECT doc_id, lang, n_chars,
                   ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                         / len(string_split(text, ' ')), 6) AS quality
            FROM documents
        ), c AS (
            SELECT lang, doc_id, quality,
                   SUM(n_chars) OVER (PARTITION BY lang
                                      ORDER BY quality DESC, doc_id ASC
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cum_chars,
                   SUM(n_chars) OVER (PARTITION BY lang) AS lang_chars
            FROM s
        )
        SELECT lang, doc_id, quality, CAST(cum_chars AS BIGINT) AS cum_chars
        FROM c WHERE cum_chars <= {TOP_P} * lang_chars
    """,
    "incremental_dedup": """
        WITH f AS (SELECT doc_id, md5(text) AS fp FROM documents
                   WHERE text IS NOT NULL),
        new AS (SELECT * FROM f WHERE doc_id % 5 = 0),
        corpus AS (SELECT fp FROM f WHERE doc_id % 5 <> 0)
        SELECT MIN(doc_id) AS keep_doc_id, fp, COUNT(*) AS n_batch_copies
        FROM new
        WHERE fp NOT IN (SELECT fp FROM corpus)
        GROUP BY fp
    """,
    "pii_redaction": f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{PAT_EMAIL}'))
                    + len(regexp_extract_all(text, '{PAT_NUM}'))
                    + len(regexp_extract_all(text, '{PAT_TERM}')) AS BIGINT)
                   AS n_redacted,
               md5(regexp_replace(
                       regexp_replace(
                           regexp_replace(text, '{PAT_EMAIL}', '<EMAIL>', 'g'),
                           '{PAT_NUM}', '<NUM>', 'g'),
                       '{PAT_TERM}', '<PII>', 'g')) AS redacted_md5
        FROM documents
    """,
    "kfold_assign": f"""
        WITH f AS (
            SELECT doc_id,
                   CAST(FLOOR(
                       (CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                                  AS BIGINT) AS DOUBLE) / 4294967296.0) * {N_FOLDS}
                   ) AS BIGINT) AS fold
            FROM documents
        )
        SELECT fold, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc_id
        FROM f GROUP BY fold
    """,
    "topk_hash_sample": f"""
        WITH u AS (
            SELECT doc_id, source,
                   CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                             AS BIGINT) AS DOUBLE) / 4294967296.0 AS u_raw
            FROM documents
        ), r AS (
            SELECT source, doc_id, u_raw,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY u_raw ASC, doc_id ASC) AS rn
            FROM u
        )
        SELECT source, doc_id, ROUND(u_raw, 6) AS u, rn
        FROM r WHERE rn <= {STRATUM_K}
    """,
    "negative_sampling": f"""
        WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 200),
        n AS (SELECT COUNT(*) AS n_docs FROM d),
        j AS (SELECT unnest(generate_series(0, {N_NEGATIVES - 1})) AS j)
        SELECT d.doc_id, j.j,
               (d.doc_id + 1
                + CAST('0x' || substring(
                      md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(j.j AS VARCHAR)),
                      1, 8) AS BIGINT) % (n.n_docs - 1)
               ) % n.n_docs AS neg_doc_id
        FROM d CROSS JOIN j CROSS JOIN n
    """,
    "dataset_card": """
        WITH base AS (
            SELECT COUNT(*) AS n_docs,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
                   CAST(SUM(n_chars) AS BIGINT) AS n_chars,
                   COUNT(DISTINCT source) AS n_sources,
                   COUNT(DISTINCT lang) AS n_langs,
                   ROUND(AVG(len(string_split(text, ' '))), 6) AS mean_doc_tokens,
                   COUNT(DISTINCT md5(text)) AS n_unique_texts
            FROM documents
        ), top AS (
            SELECT lang AS top_lang FROM documents
            GROUP BY lang ORDER BY COUNT(*) DESC, lang ASC LIMIT 1
        )
        SELECT n_docs, n_tokens, n_chars, n_sources, n_langs,
               mean_doc_tokens,
               ROUND(1 - CAST(n_unique_texts AS DOUBLE) / n_docs, 6) AS dup_rate,
               top_lang
        FROM base CROSS JOIN top
    """,
    "deterministic_shuffle": f"""
        SELECT doc_id,
               md5('{SHUFFLE_SALT}:' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
               ROW_NUMBER() OVER (
                   ORDER BY md5('{SHUFFLE_SALT}:' || CAST(doc_id AS VARCHAR))
               ) AS pos
        FROM documents
    """,
    "curriculum_buckets": f"""
        WITH binned AS (
            SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
                   NTILE({N_CURRICULUM_BINS}) OVER (ORDER BY len(string_split(text, ' ')) ASC,
                                                    doc_id ASC) AS bin
            FROM documents
        )
        SELECT bin, COUNT(*) AS n_docs,
               MIN(n_tokens) AS min_tokens,
               MAX(n_tokens) AS max_tokens,
               CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
        FROM binned GROUP BY bin
    """,
    "temperature_mixture": f"""
        WITH per_lang AS (
            SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang
        ), tot AS (
            SELECT CAST(SUM(n_lang) AS BIGINT) AS n_total FROM per_lang
        ), weighted AS (
            SELECT lang, n_lang,
                   POWER(CAST(n_lang AS DOUBLE) / n_total, {MIX_ALPHA}) AS w
            FROM per_lang CROSS JOIN tot
        ), z AS (
            SELECT SUM(w) AS z FROM weighted
        ), rates AS (
            SELECT lang,
                   ROUND(LEAST(1.0, (w / z.z) * t.n_total / n_lang), 6)
                       AS keep_rate
            FROM weighted CROSS JOIN z CROSS JOIN tot t
        )
        SELECT d.doc_id, d.lang, r.keep_rate, ROUND(u.u, 6) AS u
        FROM documents d
        JOIN rates r ON d.lang = r.lang
        CROSS JOIN LATERAL (
            SELECT CAST(CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)),
                                               1, 8)
                             AS BIGINT) AS DOUBLE) / 4294967296.0 AS u
        ) u
        WHERE u.u < r.keep_rate
    """,
    "mixture_resample": """
        WITH per_src AS (
            SELECT source, COUNT(*) AS n_src FROM documents GROUP BY source
        ), rates AS (
            SELECT source,
                   LEAST(1.0,
                         (CAST(SUM(n_src) OVER () AS DOUBLE)
                          / COUNT(*) OVER ()) / n_src) AS keep_rate
            FROM per_src
        )
        SELECT d.doc_id, d.source,
               ROUND(r.keep_rate, 6) AS keep_rate,
               ROUND(u.u, 6) AS u
        FROM documents d
        JOIN rates r ON d.source = r.source
        CROSS JOIN LATERAL (
            SELECT CAST(CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
                             AS BIGINT) AS DOUBLE) / 4294967296.0 AS u
        ) u
        WHERE u.u < r.keep_rate
    """,
    "source_mix_report": """
        WITH per_src AS (
            SELECT source, COUNT(*) AS n_docs,
                   SUM(len(string_split(text, ' '))) AS n_tokens
            FROM documents GROUP BY source
        )
        SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
               ROUND(CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER (), 6)
                   AS token_share,
               ROUND(CAST(SUM(n_tokens)
                              OVER (ORDER BY n_tokens DESC, source ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS DOUBLE)
                     / SUM(n_tokens) OVER (), 6) AS cum_share
        FROM per_src
    """,
}
