"""Round-over-round bench regression check.

    python tools/bench_compare.py BENCH_r01.json BENCH_r02.json [ratio]

Accepts either the driver's record format (JSON object with the bench
line embedded in its "tail" field) or bench.py's raw one-line output.
Prints per-query deltas, flags entries slower than ``ratio`` (default
1.3×), and exits non-zero if any regression is found. New queries are
listed informationally (no baseline to regress against); removed ones
are flagged loudly — a silently dropped benchmark usually means a
silently dropped capability.

When BOTH files carry the ``calib_scan_s`` machine-speed anchor
(bench.py emits it since round 4), current-side timings are DIVIDED by
the calibration ratio (cur_calib / base_calib) before comparison — the
anchor is a fixed one-stage scan whose only cross-round variable is the
host itself, so this separates ambient drift (reboots, CPU contention;
measured up to 2× between rounds) from actual plan regressions.
"""

from __future__ import annotations

import json
import os
import re
import sys


def _decode_hl_idx(doc: dict) -> dict:
    """Decode the index-coded record bench.py emits since round 12
    ("q": {"<HEADLINE index>": secs}) back to full query names. The
    "hl" crc of the emitting HEADLINE list is verified against the
    current one: HEADLINE is append-only by contract, so a mismatch on
    a PREFIX of the list means someone reordered/deleted entries and
    every older record's indexes are unsafe — fail loudly."""
    import zlib

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import HEADLINE

    idx_q = doc.pop("q")
    max_idx = max(int(i) for i in idx_q)
    if max_idx >= len(HEADLINE):
        # ADVICE r12: without this check a record from a future/other
        # HEADLINE raised a bare IndexError below instead of the loud
        # diagnostic
        raise SystemExit(
            f"bench record indexes up to {max_idx} but the current "
            f"HEADLINE has only {len(HEADLINE)} entries — the record was "
            "made against a longer list; update HEADLINE (append-only) "
            "before decoding"
        )
    if doc.get("hl") is not None:
        # only prefixes long enough to cover every recorded index count:
        # shorter ones (including the empty prefix, whose crc32 is 0 —
        # ADVICE r12: a zeroed/corrupted 'hl' field passed as "empty
        # prefix") could not have produced these indexes
        prefixes = {
            zlib.crc32(";".join(HEADLINE[:n]).encode())
            for n in range(max_idx + 1, len(HEADLINE) + 1)
        }
        if doc["hl"] not in prefixes:
            raise SystemExit(
                "bench record's HEADLINE crc matches no prefix of the "
                "current list covering its indexes — HEADLINE was "
                "reordered/pruned or the record is corrupt; index decode "
                "would mislabel queries"
            )
    doc["queries"] = {HEADLINE[int(i)]: v for i, v in idx_q.items()}
    return doc


def _merge_qx(doc: dict) -> dict:
    """Merge the r15 hybrid record's index-coded remainder ("qx") into
    the name-keyed "queries" dict. The driver reads "queries" as-is (the
    45 slowest, name-keyed — r14 verdict item 2); this tool recovers the
    full 80-query dict. Records without "qx" pass through unchanged."""
    if "qx" in doc:
        shim = dict(doc)
        shim["q"] = shim.pop("qx")
        named = shim.pop("queries")
        decoded = _decode_hl_idx(shim)
        overlap = set(named) & set(decoded["queries"])
        if overlap:
            raise SystemExit(
                f"bench record has {sorted(overlap)[:3]} in BOTH queries "
                "and qx — corrupt record or stale NAMED/HEADLINE lists"
            )
        decoded["queries"].update(named)
        return decoded
    return doc


def load(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        # loosely captured bench output: the JSON record is one line,
        # possibly surrounded by stray shell/sentinel lines — take the
        # first line that parses as a bench record
        doc = next(
            (
                json.loads(line)
                for line in text.splitlines()
                if line.startswith("{") and ('"queries"' in line or '"q"' in line)
            ),
            None,
        )
        if doc is None:
            raise SystemExit(f"{path}: no parseable bench JSON line")
    if "q" in doc and "queries" not in doc:
        return _decode_hl_idx(doc)
    if "queries" in doc:
        return _merge_qx(doc)
    if isinstance(doc.get("parsed"), dict):
        if "q" in doc["parsed"] and "queries" not in doc["parsed"]:
            return _decode_hl_idx(doc["parsed"])
        if "queries" in doc["parsed"]:
            return _merge_qx(doc["parsed"])
    tail = doc.get("tail", "")
    m = re.search(r'\{"(?:metric|queries|enc)".*\}', tail)
    if m:
        inner = json.loads(m.group(0))
        if "q" in inner and "queries" not in inner:
            return _decode_hl_idx(inner)
        return _merge_qx(inner)
    # front-truncated capture (BENCH_r09: the line outgrew the driver's
    # tail window and the leading keys were cut) — rebuild what survived
    # from the key/value pairs; bench.py now emits the scalar summary
    # keys last so future records keep them under the same truncation
    pairs = dict(re.findall(r'"([a-z0-9_]+)": ([0-9.]+)', tail))
    for k in ("n", "rc", "cpus"):
        pairs.pop(k, None)
    scalars = {
        k: float(pairs.pop(k))
        for k in ("value", "sf", "calib_scan_s", "calib_shuffle_s")
        if k in pairs
    }
    if not pairs:
        raise SystemExit(
            f"{path}: no bench line found (checked top level, 'parsed', 'tail')"
        )
    return {"queries": {k: float(v) for k, v in pairs.items()}, **scalars}


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    base, cur = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    bq, cq = base["queries"], cur["queries"]
    drift = 1.0
    if base.get("calib_scan_s") and cur.get("calib_scan_s"):
        drift = cur["calib_scan_s"] / base["calib_scan_s"]
        print(
            f"machine-speed anchor: {base['calib_scan_s']:.4f}s -> "
            f"{cur['calib_scan_s']:.4f}s (drift {drift:.2f}x; "
            f"current timings normalized by it)"
        )
        if not 0.45 <= drift <= 2.2:
            # ambient host drift has been measured up to ~2x between
            # rounds (see module docstring) — only an anchor move
            # BEYOND that range suggests the measurement itself changed
            print(
                "!! anchor moved beyond the ~2x ambient drift ever "
                "observed on this host — check that BOTH runs measured "
                "calib at the same session point (light warm-up -> "
                "calibrate; a warm-up change before calibrate shifts "
                "the anchor ~25% and manufactures fake regressions). "
                "Treat the normalized column with suspicion."
            )
    else:
        print("no calib_scan_s anchor in both files; raw comparison")
    sh_drift = None
    if base.get("calib_shuffle_s") and cur.get("calib_shuffle_s"):
        sh_drift = cur["calib_shuffle_s"] / base["calib_shuffle_s"]
        print(
            f"scheduling-floor anchor: {base['calib_shuffle_s']:.4f}s -> "
            f"{cur['calib_shuffle_s']:.4f}s (drift {sh_drift:.2f}x — "
            f"movers that fall back under {ratio}x when normalized by "
            f"THIS anchor instead are labeled anchor-explained below: "
            f"multi-stage queries that moved with the host's scheduling "
            f"floor, not the code — the r09/r10 wholesale-mover pattern)"
        )
    regressions = []
    slowdowns = []  # true timing regressions only (not removals)
    explained = []  # movers the scheduling-floor anchor accounts for
    for name, t0 in sorted(bq.items()):
        t1 = cq.get(name)
        if t1 is None:
            print(f"!! {name}: REMOVED from bench (was {t0:.3f}s)")
            regressions.append(name)
            continue
        t1n = t1 / drift
        flag = ""
        if t1n > ratio * t0:
            # scan-anchor-normalized it's a mover; before calling it a
            # regression, ask whether the SHUFFLE anchor (the multi-stage
            # scheduling floor, which ambient load inflates far more than
            # the scan) explains it — r10's "3.5-5x movers" all did.
            # ADVICE r11: the excuse requires the mover to TRACK the
            # floor drift (ratio within [sh_drift/1.3, sh_drift*1.3]),
            # not merely sit under it — otherwise any genuine 1.5x code
            # regression is silently excused whenever the shuffle anchor
            # happened to drift 3x that run
            if (
                sh_drift
                and t1 / sh_drift <= ratio * t0
                and t1 / t0 >= sh_drift / ratio
            ):
                flag = (
                    f"  <-- anchor-explained ({t1 / sh_drift:.3f}s under "
                    f"the {sh_drift:.2f}x scheduling-floor drift; "
                    f"host, not code)"
                )
                explained.append(name)
            else:
                flag = f"  <-- REGRESSION (>{ratio}x, drift-normalized)"
                regressions.append(name)
                slowdowns.append(name)
        print(f"   {name}: {t0:.3f}s -> {t1:.3f}s (norm {t1n:.3f}s){flag}")
    for name in sorted(set(cq) - set(bq)):
        print(f" + {name}: {cq[name]:.3f}s (new)")
    # a truncated legacy record may have lost its headline total — fall
    # back to the sum of whatever per-query rows survived
    base_total = base.get("value", sum(bq.values()))
    cur_total = cur.get("value", sum(cq.values()))
    print(
        f"total: {base_total:.3f}s ({len(bq)} queries) -> "
        f"{cur_total:.3f}s ({len(cq)} queries); "
        f"{len(regressions)} regression(s), "
        f"{len(explained)} anchor-explained mover(s)"
    )
    if explained:
        print(
            f"   anchor-explained (not counted as regressions): "
            f"{', '.join(explained)}"
        )
    # wholesale-shift heuristic: SLOWDOWNS only (removals are a query-
    # set change, a different problem), over the COMMON set (names in
    # both files), and only when that set is big enough for "a third"
    # to mean anything
    n_common = sum(1 for name in bq if name in cq)
    if n_common >= 9 and len(slowdowns) > n_common // 3:
        print(
            "!! more than a third of the common set slowed down at once "
            "— real plan regressions are localized; a wholesale shift "
            "means the anchor or the host moved (e.g. calib measured at "
            "a different session point, or heavy ambient load during "
            "one run). Re-run back-to-back before believing any row."
        )
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
