"""r14 verdict item 2: the bench stdout record must be DRIVER-legible —
a generic parser reading the name-keyed "queries" dict (no repo code)
gets the 45 slowest queries, while the full 80-query record remains
recoverable by tools/bench_compare.load() via the index-coded "qx"
remainder. These pins keep the hybrid line inside the driver's
2000-byte tail window under worst-case timings."""

from __future__ import annotations

import json
import zlib


def _record(timings: dict[str, float]) -> dict:
    from bench import HEADLINE, NAMED

    named = set(NAMED)
    return {
        "queries": {n: timings[n] for n in NAMED},
        "qx": {
            str(i): timings[n]
            for i, n in enumerate(HEADLINE)
            if n not in named
        },
        "hl": zlib.crc32(";".join(HEADLINE).encode()),
        "metric": "headline_queries_total",
        "value": 99.999,
        "unit": "sec",
        "sf": 0.1,
        "calib_scan_s": 0.2257,
        "calib_shuffle_s": 0.643,
        "boot": "69e30d62+123.9h",
    }


def test_named_subset_is_consistent():
    from bench import HEADLINE, NAMED

    assert len(NAMED) == len(set(NAMED)), "duplicate NAMED entries"
    missing = set(NAMED) - set(HEADLINE)
    assert not missing, f"NAMED entries not in HEADLINE: {missing}"


def test_worst_case_line_fits_driver_tail_window():
    """Every value at its realistic maximum width (99.999 — a 100 s
    single query means the bench is broken anyway) plus a long-uptime
    boot stamp must still leave headroom inside the 2000-byte window."""
    from bench import HEADLINE

    timings = {n: 99.999 for n in HEADLINE}
    line = json.dumps(_record(timings), separators=(",", ":"))
    assert len(line) <= 1900, f"worst-case bench line {len(line)}B > 1900B"


def test_hybrid_record_decodes_to_full_query_dict(tmp_path):
    from bench import HEADLINE
    from tools.bench_compare import load

    timings = {n: round(0.1 + i * 0.001, 3) for i, n in enumerate(HEADLINE)}
    line = json.dumps(_record(timings), separators=(",", ":"))

    raw = tmp_path / "raw.json"
    raw.write_text(line + "\n")
    captured = tmp_path / "driver.json"
    captured.write_text(
        json.dumps(
            {"n": 15, "rc": 0, "tail": ("noise\n" + line)[-2000:], "parsed": None}
        )
    )
    for p in (raw, captured):
        doc = load(str(p))
        assert doc["queries"] == timings, "merge of queries+qx lost rows"
        assert doc["value"] == 99.999


def test_driver_generic_parse_sees_named_slowest():
    """What the driver's own parser (plain json.loads, no repo code)
    reads from the line: a name-keyed queries dict covering the NAMED
    subset — non-empty per-query data, the exact r14 PERF failure."""
    from bench import HEADLINE, NAMED

    timings = {n: 0.5 for n in HEADLINE}
    doc = json.loads(json.dumps(_record(timings), separators=(",", ":")))
    assert set(doc["queries"]) == set(NAMED)
    assert all(isinstance(v, float) for v in doc["queries"].values())


def test_overlapping_queries_and_qx_rejected(tmp_path):
    import pytest

    from bench import HEADLINE, NAMED
    from tools.bench_compare import load

    timings = {n: 0.5 for n in HEADLINE}
    rec = _record(timings)
    rec["qx"][str(HEADLINE.index(NAMED[0]))] = 0.5
    p = tmp_path / "dup.json"
    p.write_text(json.dumps(rec, separators=(",", ":")))
    with pytest.raises(SystemExit, match="BOTH"):
        load(str(p))
