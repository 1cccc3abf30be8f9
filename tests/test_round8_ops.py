"""Semantic invariants for the round-8 additions (XML round-trip codec,
bitmap-cardinality rollup, largest-remainder apportionment, asymmetric
shingle containment, PPS systematic sampling) — conservation laws and
equivalences the oracle hash can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_xml_roundtrip_preserves_row_level_values(spark):
    """Beyond the oracle's aggregate match: the XML encode/decode is a
    row-level identity on every carried field."""
    from pb_etl_spark.catalog import read_table

    o = read_table(spark, SF_DIR, "orders").selectExpr(
        "o_orderkey AS k",
        "o_orderstatus AS s",
        "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c",
    )
    back = (
        o.selectExpr("to_xml(named_struct('k', k, 's', s, 'c', c)) AS x")
        .selectExpr("from_xml(x, 'k BIGINT, s STRING, c BIGINT') AS r")
        .select("r.k", "r.s", "r.c")
    )
    assert back.exceptAll(o).count() == 0
    assert o.exceptAll(back).count() == 0


def test_bitmap_distinct_matches_exact_count_distinct(spark):
    from pb_etl_spark.catalog import read_table
    from pb_etl_spark.operators.retrieval import q_bitmap_distinct_counts

    got = {
        r["event_type"]: r["n_distinct_users"]
        for r in q_bitmap_distinct_counts(spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in read_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert got == exact


def test_bitmap_or_merge_is_idempotent(spark):
    """Replaying a day's partial into the OR-merge must not change the
    count — the exactly-once-free reingest property the docstring
    promises."""
    from pb_etl_spark.catalog import read_table

    ev = read_table(spark, SF_DIR, "events").selectExpr(
        "event_type",
        "CAST(ts AS DATE) AS d",
        "bitmap_bucket_number(user_id) AS b",
        "bitmap_bit_position(user_id) AS p",
    )
    daily = ev.groupBy("event_type", "d", "b").agg(
        F.expr("bitmap_construct_agg(p)").alias("bm")
    )
    one_day = daily.orderBy("d").limit(1)
    replayed = daily.unionAll(one_day)

    def merged_counts(partials):
        return {
            (r["event_type"], r["b"]): r["cnt"]
            for r in partials.groupBy("event_type", "b")
            .agg(F.expr("bitmap_count(bitmap_or_agg(bm))").alias("cnt"))
            .collect()
        }

    assert merged_counts(daily) == merged_counts(replayed)


def test_largest_remainder_alloc_conserves_budget(spark):
    from pb_etl_spark.operators.advanced import (
        ALLOC_SEATS,
        q_largest_remainder_alloc,
    )

    out = q_largest_remainder_alloc(spark, SF_DIR).toPandas()
    assert int(out["seats"].sum()) == ALLOC_SEATS
    # quota property: every nation gets floor or floor+1 of its exact share
    total = int(out["n_cust"].sum())
    for _, row in out.iterrows():
        base = (int(row["n_cust"]) * ALLOC_SEATS) // total
        assert row["seats"] in (base, base + 1)


def test_shingle_containment_prefix_filter_is_lossless(spark):
    """The one-sided PPJoin prefix must reproduce the naive all-pairs
    plan exactly (same pairs, same counts)."""
    from pb_etl_spark.catalog import read_table
    from pb_etl_spark.operators.dedup import (
        q_shingle_containment_pairs,
        word_shingles,
    )

    got = (
        q_shingle_containment_pairs(spark, SF_DIR)
        .toPandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    sh = word_shingles(read_table(spark, SF_DIR, "documents"))
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    naive = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
        .join(cnt, F.col("src") == F.col("doc_id"))
        .filter(F.col("inter") * 5 >= F.col("n") * 4)
        .select("src", "dst", "inter")
        .toPandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    assert len(got) == len(naive)
    assert (got["src"].values == naive["src"].values).all()
    assert (got["dst"].values == naive["dst"].values).all()
    assert (got["inter"].values == naive["inter"].values).all()
    # asymmetry is real on this fixture OR at least never violated:
    # containment >= 0.8 and src != dst everywhere
    assert (got["src"] != got["dst"]).all()
    assert (got["inter"] * 5 >= got["n_src"] * 4).all()


def test_scan_width_tracks_sparks_actual_scan_partitioning(spark, tmp_path):
    """_scan_width mirrors FilePartition's split formula; on a bare scan
    (where DataFrame.rdd IS safe to consult) the estimate must agree with
    Spark's actual partitioning within packing slack — exact on the
    single-file fixture, within 2× on a hand-built multi-file layout."""
    import pandas as pd

    from pb_etl_spark.catalog import read_table
    from pb_etl_spark.operators.retrieval import _scan_width

    li = read_table(spark, SF_DIR, "lineitem")
    actual = li.rdd.getNumPartitions()
    est = _scan_width(spark, li)
    assert est == actual == 1  # single small file → one split, both ways

    d = tmp_path / "multi"
    d.mkdir()
    for i in range(6):
        pd.DataFrame({"x": range(1000), "f": [i] * 1000}).to_parquet(
            d / f"part-{i}.parquet"
        )
    df = spark.read.parquet(str(d))
    actual = df.rdd.getNumPartitions()
    est = _scan_width(spark, df)
    assert actual / 2 <= est <= actual * 2, (est, actual)


def test_weighted_median_is_the_minimal_half_weight_value(spark):
    """The lower weighted median: smallest cents value v with
    Σ qty[cents ≤ v] ≥ half the group total — checked row-by-row in
    pandas against the operator's output."""
    from pb_etl_spark.catalog import read_table
    from pb_etl_spark.operators.advanced import q_weighted_median_by_group

    out = q_weighted_median_by_group(spark, SF_DIR).toPandas()
    li = (
        read_table(spark, SF_DIR, "lineitem")
        .selectExpr(
            "l_returnflag",
            "CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents",
            "CAST(l_quantity AS BIGINT) AS qty",
        )
        .toPandas()
    )
    for _, row in out.iterrows():
        g = li[li["l_returnflag"] == row["l_returnflag"]]
        tw = int(g["qty"].sum())
        assert tw == row["total_qty"]
        v = int(row["wmedian_cents"])
        at_or_below = int(g.loc[g["cents"] <= v, "qty"].sum())
        assert 2 * at_or_below >= tw
        # minimality: everything strictly below v covers < half
        below = int(g.loc[g["cents"] < v, "qty"].sum())
        assert 2 * below < tw


def test_pps_systematic_sample_places_exactly_k_pointers(spark):
    from pb_etl_spark.catalog import read_table
    from pb_etl_spark.operators.corpus import PPS_K, q_pps_systematic_sample

    out = q_pps_systematic_sample(spark, SF_DIR).toPandas()
    # u + (K-1)*step < K*step <= W, so all K pointers land: Σ hits == K
    assert int(out["n_hits"].sum()) == PPS_K
    assert (out["n_hits"] >= 1).all()
    # a doc covering m steps of the axis takes at most m+1 pointers
    total = (
        read_table(spark, SF_DIR, "documents")
        .agg(F.sum("n_chars").alias("w"))
        .collect()[0]["w"]
    )
    step = total // PPS_K
    assert (out["n_hits"] <= out["n_chars"] // step + 1).all()


def test_pps_pointer_cap_prevents_overcount(spark, tmp_path):
    """Regression (round-8 review): with W = 1050 and K = 100, step = 10
    and u = 5, the UNCAPPED division difference counts pointer #100 at
    u + 100·step = 1005 < W — 105 hits. The LEAST(K, ·) cap must keep
    the telescoped total at exactly K."""
    import pandas as pd

    from pb_etl_spark.operators.corpus import PPS_K, q_pps_systematic_sample

    docs = pd.DataFrame(
        {
            "doc_id": range(105),
            "text": ["x" for _ in range(105)],
            "lang": ["en"] * 105,
            "source": ["s"] * 105,
            "n_chars": [10] * 105,  # W = 1050 = K*step + 50 > K*step
        }
    )
    spark.createDataFrame(docs).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = q_pps_systematic_sample(spark, str(tmp_path)).toPandas()
    assert int(out["n_hits"].sum()) == PPS_K
