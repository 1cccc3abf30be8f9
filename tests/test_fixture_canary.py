"""Fixture-drift canary: the driver REGENERATES /root/testdata between
rounds and has already changed its shape once (round 1 → 2: events.ts
flipped TIMESTAMP(NANOS) → TIMESTAMP(MICROS), silently breaking every
batch events query under a vanilla session). These checks read the
parquet footers directly and fail with a diagnosis message instead of
letting 8 queries die with an opaque engine error.

If one of these fails after a fixture regeneration: the FIXTURE moved,
not the engine — update the engine's assumptions (catalog decode paths,
TESTDATA.md expectations) first.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _schema(table: str):
    return pq.ParquetFile(f"{SF_DIR}/{table}.parquet").schema_arrow


def test_all_tables_present_and_nonempty():
    for t in TABLES:
        md = pq.ParquetFile(f"{SF_DIR}/{t}.parquet").metadata
        assert md.num_rows > 0, f"{t} is empty — fixture regeneration broke?"


def test_events_ts_unit_is_one_catalog_handles():
    """catalog.read_events_parquet decodes us/ns explicitly; a new unit
    (ms?) or a type change needs a new decode branch BEFORE queries run."""
    f = _schema("events").field("ts")
    assert str(f.type).startswith("timestamp"), (
        f"events.ts is {f.type}, no longer a timestamp — catalog decode "
        "paths (read_events_parquet) must be updated"
    )
    assert f.type.unit in ("us", "ns"), (
        f"events.ts unit {f.type.unit!r} has no decode branch in "
        "catalog.read_events_parquet — add one"
    )


def test_key_columns_keep_expected_types():
    import pyarrow as pa

    expectations = {
        "events": {"event_id": pa.int64(), "user_id": pa.int64(),
                   "value": pa.float64(), "event_type": pa.string(),
                   "props": pa.string()},
        "documents": {"doc_id": pa.int64(), "text": pa.string(),
                      "lang": pa.string(), "source": pa.string(),
                      "n_chars": pa.int64()},
        "orders": {"o_orderkey": pa.int64(), "o_totalprice": pa.float64()},
        "lineitem": {"l_orderkey": pa.int64(), "l_extendedprice": pa.float64()},
    }
    for table, cols in expectations.items():
        sch = _schema(table)
        for name, typ in cols.items():
            assert sch.field(name).type == typ, (
                f"{table}.{name} changed type to {sch.field(name).type}"
            )


def test_embeddings_are_fixed_width_float_lists():
    f = _schema("embeddings").field("embedding")
    assert "list" in str(f.type) and "float" in str(f.type), f.type
    first = (
        pq.ParquetFile(f"{SF_DIR}/embeddings.parquet").read_row_group(0).to_pylist()
    )
    dims = {len(r["embedding"]) for r in first[:50]}
    assert dims == {64}, (
        f"embedding width changed: {dims} — similarity/vector operators "
        "assume DIM=64 (vectors.py, similarity.py)"
    )


def test_catalog_reads_events_under_vanilla_session(spark):
    """End-to-end canary on the exact path that broke in round 1: the
    unit-autodetecting events read under a session with no special conf."""
    from pb_etl_spark.catalog import read_table

    df = read_table(spark, SF_DIR, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    row = df.selectExpr("min(year(ts)) AS y").first()
    assert 2000 <= row.y <= 2100, f"decoded ts year {row.y} — wrong unit math?"
