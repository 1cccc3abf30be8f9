"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over the
same sf directory, then compares row count, column names, and
order-insensitive values (columns sorted by name, rows sorted by all
columns, NaN/None unified). Use while iterating:

    python tools/check_oracle.py [--vanilla] [--big-oracles] [sf_dir] [query ...]

``--big-oracles`` swaps the three quadratic-candidate oracles
(fuzzy_match_pairs, entity_resolution, entity_golden_record) for the
deletion-key variants in ``BIG_SF_ORACLES`` — identical pair sets,
O(n·L) candidates instead of O(n²) — so big-SF value sweeps can include
them instead of excluding for oracle cost (r11 verdict item 4).

``--vanilla`` builds a PLAIN SparkSession (no pb_etl_spark.session confs),
replicating the driver's harness — round 1 proved queries can pass under
our conf-laden builder session yet crash under the driver's (the
nanosAsLong events read). Vanilla is the truthful gate; default to it.

A plain session launches the JVM with the 1 GiB default driver heap —
plenty at the driver's sf0.01, but at sf0.4+ broadcast-heavy queries
(fuzzy_match_pairs) GC-thrash for tens of minutes without failing. For
big-SF sweeps run with::

    PYSPARK_SUBMIT_ARGS="--driver-memory 16g pyspark-shell" \\
        python tools/check_oracle.py --vanilla /root/repo/.scale/sf0.4
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pb_etl_spark.catalog import BENCH_TABLES
from pb_etl_spark.registry import all_oracles, all_queries
from pb_etl_spark.session import get_spark


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in BENCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir.rstrip('/')}/{t}.parquet'"
        )
    return con


# --------------------------------------------------------------------------
# Big-SF oracle variants (--big-oracles), r11 verdict item 4: the registry
# keeps the maximally-independent brute-force oracles for the driver's
# sf0.01 gate (full n² levenshtein; quadratic candidate generation inside
# the iterative-CC SQL), but at sf0.4+ those are hours of DuckDB time, so
# for four rounds the ×10 sweep carried these names as exclusions. The
# variants below replace ONLY the candidate-generation step with
# deletion-key blocking — keys(s) = {s} ∪ {s minus char i}: any two
# strings with levenshtein ≤ 1 share a key (equal → the i=0 key;
# substitution at p → both minus p; insert/delete → the longer minus the
# edit position equals the shorter's i=0 key) — followed by the SAME
# exact-levenshtein verify, so the pair set is provably identical while
# the cost drops from O(n²) to O(n·L) + matched candidates. Proven
# value-equal to the brute oracles at sf0.01 (test_check_oracle_compare)
# and independently at sf0.4 by the r07 wildcard-method test. DuckDB
# still computes its own blocking, join, levenshtein, and (for the
# entity names) its own recursive-CTE connected components — the sweep
# stays a cross-ENGINE check; only the candidate cover is shared, and
# its completeness is the one property the r07 test pinned separately.
_DELKEY_CTE = """
    keys AS (
        SELECT c_custkey, c_name, c_nationkey,
               CASE WHEN i = 0 THEN c_name
                    ELSE substr(c_name, 1, i-1) || substr(c_name, i+1)
               END AS k
        FROM (SELECT c_custkey, c_name, c_nationkey,
                     UNNEST(range(0, length(c_name)+1)) AS i
              FROM customer)
    )
"""

def _entity_labels(con) -> None:
    """Populate temp table ``_er_lab (id, lab)`` = the entity CC labels
    (component-minimum custkey), with deletion-key candidates and a
    pointer-jumping label loop instead of the registry oracle's
    recursive ``reach`` CTE. The reach CTE materializes every
    (node, reachable-root) pair — Σ|component|² rows — across
    DIAMETER-many iterations; the ×10 fixture's largest name-cluster
    component has ~3000 members, so that form runs for hours. Here each
    round does one min-over-neighbors propagate and one
    ``lab ← lab(lab)`` shortcut (pointer jumping), converging to the
    SAME component minimum in O(log n) rounds of O(edges) joins — the
    classic two-phase SQL connected components. DuckDB still computes
    its own candidates, joins, levenshteins, and label algebra; the
    fixpoint check makes convergence explicit rather than assumed."""
    con.execute(f"""
        CREATE OR REPLACE TEMP TABLE _er_edges AS
        WITH {_DELKEY_CTE},
        fuzzy AS (
            SELECT DISTINCT a.c_custkey AS ia, b.c_custkey AS ib
            FROM keys a JOIN keys b
              ON a.k = b.k AND a.c_custkey < b.c_custkey
             AND a.c_nationkey = b.c_nationkey
            WHERE levenshtein(a.c_name, b.c_name) <= 1
        )
        SELECT ia AS src, ib AS dst FROM fuzzy
        UNION
        SELECT ib, ia FROM fuzzy
    """)
    con.execute(
        "CREATE OR REPLACE TEMP TABLE _er_lab AS "
        "SELECT c_custkey AS id, c_custkey AS lab FROM customer"
    )
    for _ in range(64):
        con.execute("""
            CREATE OR REPLACE TEMP TABLE _er_prop AS
            SELECT l.id, LEAST(l.lab, COALESCE(MIN(nl.lab), l.lab)) AS lab
            FROM _er_lab l
            LEFT JOIN _er_edges e ON e.src = l.id
            LEFT JOIN _er_lab nl ON nl.id = e.dst
            GROUP BY l.id, l.lab
        """)
        con.execute("""
            CREATE OR REPLACE TEMP TABLE _er_next AS
            SELECT a.id, b.lab FROM _er_prop a JOIN _er_prop b ON a.lab = b.id
        """)
        changed = con.execute(
            "SELECT COUNT(*) FROM _er_next a JOIN _er_lab b "
            "ON a.id = b.id AND a.lab <> b.lab"
        ).fetchone()[0]
        con.execute("CREATE OR REPLACE TEMP TABLE _er_lab AS SELECT * FROM _er_next")
        if changed == 0:
            return
    raise RuntimeError("entity CC label loop did not converge in 64 rounds")


def _entity_labels_memo(con) -> None:
    """Build ``_er_lab`` once per connection: both entity queries need
    the same edge build + pointer-jumping loop — the dominant big-SF
    oracle cost — so a full sweep selecting both would otherwise run it
    twice (r13 review finding)."""
    have = con.execute(
        "SELECT COUNT(*) FROM information_schema.tables "
        "WHERE table_name = '_er_lab'"
    ).fetchone()[0]
    if not have:
        _entity_labels(con)


def _entity_resolution_big(con):
    _entity_labels_memo(con)
    return con.execute(
        "SELECT id AS c_custkey, lab AS entity_id FROM _er_lab"
    ).fetchdf()


def _entity_golden_record_big(con):
    _entity_labels_memo(con)
    return con.execute("""
        SELECT e.lab AS entity_id,
               COUNT(*) AS n_members,
               arg_min(c.c_name, c.c_custkey) AS canonical_name,
               CAST(arg_min(c.c_nationkey, c.c_custkey) AS BIGINT)
                   AS nationkey,
               CAST(CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT))
                         AS BIGINT) AS DOUBLE) / 100.0 AS total_acctbal
        FROM customer c JOIN _er_lab e ON c.c_custkey = e.id
        GROUP BY e.lab
    """).fetchdf()


#: name -> SQL string or callable(duckdb connection) -> pandas frame
BIG_SF_ORACLES = {
    "fuzzy_match_pairs": f"""
        WITH {_DELKEY_CTE},
        cand AS (
            SELECT DISTINCT a.c_custkey AS ia, b.c_custkey AS ib,
                   a.c_name AS na, b.c_name AS nb
            FROM keys a JOIN keys b
              ON a.k = b.k AND a.c_custkey < b.c_custkey
        )
        SELECT ia, ib, CAST(levenshtein(na, nb) AS BIGINT) AS dist
        FROM cand WHERE levenshtein(na, nb) <= 1
    """,
    "entity_resolution": _entity_resolution_big,
    "entity_golden_record": _entity_golden_record_big,
}


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    # floats sort RAW: compare() is exact, and when the two engines'
    # row multisets are exactly equal, sorting by the exact values
    # aligns them identically — rounding sort keys would instead let
    # sub-tolerance ties order differently per engine
    df = df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)
    return df


def dtype_mismatches(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    """Exact rendered-dtype check over the raw (pre-canon) frames.

    The driver hashes rendered values, so an un-cast DuckDB SUM (HUGEINT ->
    pandas float64) against Spark's int64 is a driver FAIL even when every
    value is numerically equal — round-5/6 shipped 11 such reds that this
    twin's old float-coercing compare() was blind to. Compare the rendered
    pandas dtypes, not declared schemas: NULL-bearing int columns become
    float64 on BOTH engines (try_funcs, pit_join) and legitimately pass.

    ADVICE r07: EVERY rendered-dtype inequality fails, not just
    numeric-involved ones — a datetime64 column against object-string
    dates renders differently under the driver hash too. The one
    documented exemption is datetime64 resolution (ns vs us, same tz):
    ``str()`` renders both identically, so the driver hash cannot see the
    unit and neither should the twin (DuckDB fetchdf emits [us], Spark
    toPandas [ns]).
    """
    probs = []
    for c in sorted(sdf.columns):
        da, db = sdf[c].dtype, odf[c].dtype
        if da == db:
            continue
        if (
            da.kind == "M"
            and db.kind == "M"
            and getattr(da, "tz", None) == getattr(db, "tz", None)
        ):
            continue  # unit-only datetime difference: identical rendering
        probs.append(f"dtype mismatch in col {c}: spark={da} oracle={db}")
    return probs


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if list(sorted(sdf.columns)) != list(sorted(odf.columns)):
        problems.append(f"columns: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    problems.extend(dtype_mismatches(sdf, odf))
    if len(sdf) != len(odf):
        problems.append(f"rowcount: spark={len(sdf)} oracle={len(odf)}")
    a, b = canon(sdf), canon(odf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                # EXACT float equality (NaN==NaN): the driver hashes
                # rendered values, so any ULP of cross-engine drift is a
                # driver red — round(9) here masked exactly that class.
                # The repo's float convention (identical ROUND 2/6 on
                # both engines, integer-grid arithmetic for windowed
                # money math) makes every emitted float bit-equal; the
                # full registry verified exact at sf0.01 AND sf0.1.
                av = pd.to_numeric(av, errors="coerce").astype(float)
                bv = pd.to_numeric(bv, errors="coerce").astype(float)
                neq = ~((av == bv) | (av.isna() & bv.isna()))
            else:
                neq = ~((av.astype(str) == bv.astype(str)))
            if neq.any():
                i = int(neq.idxmax())
                problems.append(
                    f"values differ in col {c}: {int(neq.sum())} rows, first at row {i}: "
                    f"spark={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r}"
                )
    return problems


def main() -> int:
    argv = [a for a in sys.argv[1:]]
    vanilla = "--vanilla" in argv
    if vanilla:
        argv.remove("--vanilla")
    big = "--big-oracles" in argv
    if big:
        argv.remove("--big-oracles")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("check_oracle_vanilla")
            .master("local[8]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark("check_oracle", master="local[8]", shuffle_partitions=8)
    con = duck_con(sf_dir)
    queries, oracles = all_queries(), all_oracles()
    if big:
        # swap in the deletion-key sweep variants (see BIG_SF_ORACLES);
        # the registry oracles stay brute-force for the driver's gate
        oracles = {**oracles, **BIG_SF_ORACLES}
    unknown = only - set(queries)
    if unknown:
        # a typo must not become a silent 'all green'
        print(f"unknown query names: {sorted(unknown)}")
        return 2
    failed = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            osrc = oracles[name]
            odf = osrc(con) if callable(osrc) else con.execute(osrc).fetchdf()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failed.append(name)
            print(f"FAIL {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"OK   {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(failed)} failures: {failed}" if failed else "\nall green")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
