"""Build an ADVERSARIAL oracle fixture: same 10-table layout and exact
schemas as the driver's `/root/testdata/sf*` dirs, but with the
documents / embeddings / events tables replaced by handcrafted edge
rows the driver's generator never produces — the input classes where
Spark and DuckDB semantics can silently diverge while every synthetic
fixture stays green (the r13 review found three such divergences by
reading; this tool finds them by testing):

- documents: empty text, single token, consecutive spaces (empty
  tokens), leading/trailing spaces, exact-duplicate pair, one-word-off
  near-duplicate pair, unicode (diacritics/CJK/emoji), one token
  repeated 60x, exactly-SPAN_W and SPAN_W-1 token counts (dup-span
  window boundary), numeric tokens, an email for the PII patterns —
  plus seeded vocab filler so statistical queries keep mass.
- embeddings: an identical pair (cosine == 1.0 top-k tie), an
  antipodal pair (cosine == -1), one-hot axes (sparse extremes), a
  near-identical pair (1e-3 perturbation, LSH band boundary) — plus
  seeded uniform filler. NO zero vector: cosine of a zero-norm vector
  is 0/0, which is a documented open question probed separately
  (see test_adversarial_fixture.py), not silently mixed into every
  ANN query here.
- events: one user entirely at ONE timestamp (zero-duration intervals,
  total-order ties), a single-event user, exact 60s gaps (the
  range-join band boundary, inclusive-vs-exclusive), an equal-ts
  signup+purchase tie (as-of tie rule), zero / negative / large
  2-decimal values (sign-safe money, 2^53 headroom), an all-one-type
  user — plus seeded normal traffic so sessionization/funnels fire.

All randomness is `random.Random(fixed seed)` — the fixture is
byte-deterministic. TPC-H tables are copied from sf0.001 unchanged
(their generator already covers the relational surface; the edge
classes above live in the three extension tables).

Usage:
    python tools/adversarial_fixture.py [OUT_DIR]        # default .adversarial/
    python tools/check_oracle.py --vanilla .adversarial  # the sweep
"""

from __future__ import annotations

import os
import random
import shutil
import sys
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

SRC_SF = "/root/testdata/sf0.001"
# region + nation are copied verbatim (they are the bounded dimension
# domain queries filter by name); the five FACT-side TPC-H tables are
# SYNTHESIZED with relational edge classes — see _tpch_tables().
TPCH_COPY = "region nation".split()

# the driver generator's vocabulary (observed in its text column) — the
# filler docs reuse it so vocab/BM25/bigram queries keep realistic mass
VOCAB = (
    "the a spark join merge sort scan table row column key value data "
    "filter group agg window batch stream query part line order customer "
    "small big fast slow hash dup vector"
).split()

LANGS = ["en", "de", "es", "fr", "zh"]
SOURCES = ["src0", "src1", "src2", "src3"]


def _doc_rows() -> tuple[list, list, list, list, list]:
    rng = random.Random(1414)
    rows: list[tuple[int, str, str, str]] = []

    def add(text: str, lang: str = "en", source: str = "src0") -> None:
        rows.append((len(rows), text, lang, source))

    # -- the edge block (doc_ids 0..13, fixed) --
    add("")  # empty text: split('') == [''] on both engines
    add("spark")  # single token
    add("a  b")  # consecutive spaces -> empty middle token
    add(" spark join ")  # leading/trailing space -> empty edge tokens
    add("the fast spark join runs the fast merge sort")  # dup pair A
    add("the fast spark join runs the fast merge sort")  # dup pair B
    add("the fast spark join runs the slow merge sort", "de", "src1")  # near-dup
    add("héllo wörld 你好 🙂 café naïve", "zh", "src2")  # unicode
    add(" ".join(["dup"] * 60), "en", "src1")  # one token repeated 60x
    add(" ".join(VOCAB[:10]))  # exactly SPAN_W tokens (one 10-token span)
    add(" ".join(VOCAB[:9]))  # SPAN_W - 1 tokens (below the span window)
    add("1 2 3 42 007", "es", "src3")  # numeric tokens
    add("contact me at edge.case@example.com or 555 0199", "en", "src3")  # PII
    add("spark " + " ".join(VOCAB) + " spark", "de", "src2")  # vocab + repeats
    # -- seeded filler (statistical mass for vocab / BM25 / quality) --
    for _ in range(46):
        n = rng.randint(12, 120)
        text = " ".join(rng.choice(VOCAB) for _ in range(n))
        add(text, rng.choice(LANGS), rng.choice(SOURCES))

    doc_id = [r[0] for r in rows]
    text = [r[1] for r in rows]
    lang = [r[2] for r in rows]
    source = [r[3] for r in rows]
    n_chars = [len(t) for t in text]
    return doc_id, text, lang, source, n_chars


def _emb_rows() -> tuple[list, list, list]:
    rng = random.Random(2828)
    dim = 64
    vecs: list[list[float]] = []
    labels: list[int] = []

    def add(v: list[float], label: int) -> None:
        vecs.append([float(x) for x in v])
        labels.append(label)

    base = [round(rng.uniform(-1, 1), 4) for _ in range(dim)]
    add(base, 0)
    add(list(base), 0)  # identical pair: cosine == 1.0 exactly -> top-k tie
    add([-x for x in base], 1)  # antipodal: cosine == -1
    near = list(base)
    near[0] = round(near[0] + 1e-3, 4)  # near-identical (band boundary)
    add(near, 0)
    one_hot = [0.0] * dim
    one_hot[0] = 1.0
    add(one_hot, 2)  # sparse extreme (orthogonal to most)
    one_hot2 = [0.0] * dim
    one_hot2[dim - 1] = 1.0
    add(one_hot2, 2)
    add([1.0] * dim, 9)  # constant vector; label 9 has exactly one member
    # seeded filler
    for _ in range(57):
        add([round(rng.uniform(-1, 1), 4) for _ in range(dim)], rng.randint(0, 8))
    return list(range(len(vecs))), vecs, labels


def _event_rows() -> tuple[list, list, list, list, list, list]:
    rng = random.Random(4242)
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows: list[tuple[datetime, int, str, float]] = []

    # user 1: TEN events at the SAME microsecond — zero-duration
    # intervals (twap), total-order ties, same-ts sessionization
    same = t0 + timedelta(hours=1)
    for i in range(10):
        rows.append((same, 1, ["view", "click", "purchase", "signup", "error"][i % 5], 10.00))
    # user 2: single event (windows/lag/sessions of length 1)
    rows.append((t0 + timedelta(hours=2), 2, "purchase", 99.99))
    # user 3: exact 60-second gaps — the range-join band boundary
    for i in range(8):
        rows.append((t0 + timedelta(hours=3, seconds=60 * i), 3, "click", 1.00))
    # user 4: signup and purchase at the EXACT same ts (as-of tie), then
    # a normal funnel view -> click -> purchase
    tie = t0 + timedelta(hours=4)
    rows.append((tie, 4, "signup", 0.00))
    rows.append((tie, 4, "purchase", 50.00))
    rows.append((tie + timedelta(minutes=1), 4, "view", 0.00))
    rows.append((tie + timedelta(minutes=2), 4, "click", 0.00))
    rows.append((tie + timedelta(minutes=3), 4, "purchase", 25.50))
    # user 5: zero / negative / large values (sign-safe money, 2^53 headroom)
    rows.append((t0 + timedelta(hours=5), 5, "purchase", 0.00))
    rows.append((t0 + timedelta(hours=5, minutes=1), 5, "error", -185.22))
    rows.append((t0 + timedelta(hours=5, minutes=2), 5, "purchase", 123456789.99))
    # user 6: all one type (degenerate transition matrix row)
    for i in range(6):
        rows.append((t0 + timedelta(hours=6, minutes=10 * i), 6, "view", 5.00))
    # seeded normal traffic: users 10..29 over 10 days
    for _ in range(260):
        ts = t0 + timedelta(
            days=rng.randint(0, 9),
            seconds=rng.randint(0, 86_399),
            microseconds=rng.randint(0, 999_999),
        )
        rows.append(
            (
                ts,
                rng.randint(10, 29),
                rng.choice(["view", "click", "purchase", "signup", "error"]),
                round(rng.uniform(0, 500), 2),
            )
        )

    rows.sort(key=lambda r: (r[0], r[1]))
    event_id = list(range(len(rows)))
    ts = [r[0] for r in rows]
    user_id = [r[1] for r in rows]
    event_type = [r[2] for r in rows]
    value = [r[3] for r in rows]
    props = ['{"k": %d}' % (i % 100) for i in event_id]
    return event_id, ts, user_id, event_type, value, props


def _tpch_tables() -> dict[str, pa.Table]:
    """Adversarial fact-side TPC-H: the relational edge classes a
    benchmark generator's smooth distributions never produce —

    - customers with NO orders (q13's c_count=0 bucket, q22's idle
      balances), negative / zero / EXACTLY-TIED account balances;
    - orders with NO lineitems (EXISTS/anti-join semantics), orders at
      exact date cutoffs (1996-01-01 midnight — BETWEEN/`<` boundary),
      one skew customer holding ~20% of all orders;
    - lineitems at every quantity/discount/tax boundary (1, 50; 0.0,
      0.05, 0.06, 0.07, 0.1 — the tpch_q6 BETWEEN edges; 0.0, 0.08),
      all six (returnflag, linestatus) combos, one FK-orphan lineitem
      (parent order deleted — inner joins must drop it identically),
      and prices chosen so price·(100−disc)·qty products land ON
      half-cent boundaries (the exact class the integer-cents money
      layer exists for — any residual ROUND(SUM(double)) leg diverges);
    - two suppliers with IDENTICAL total revenue in integer cents
      (the tpch_q15 max-revenue tie: both engines must emit BOTH);
    - parts supplied by nobody, parts with identical retailprice
      (order-by ties), p_size at both domain edges.

    Seeded filler rows (same value domains as the driver generator)
    keep every filter family populated."""
    rng = random.Random(7171)
    t0 = datetime(1995, 1, 1)

    # -- customer: ids 0..39 --
    cust = []
    segs = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
    for k in range(40):
        bal = round(rng.uniform(-999.99, 9999.99), 2)
        cust.append((k, f"Customer#{k:09d}", k % 25, bal, segs[k % 5]))
    # deliberate edges: 35-39 get NO orders; exact balance ties; zeros
    cust[35] = (35, "Customer#000000035", 3, 1234.56, "MACHINERY")
    cust[36] = (36, "Customer#000000036", 3, 1234.56, "MACHINERY")  # tie
    cust[37] = (37, "Customer#000000037", 7, 0.00, "BUILDING")
    cust[38] = (38, "Customer#000000038", 7, -0.01, "BUILDING")
    cust[39] = (39, "Customer#000000039", 9, 9999.99, "FURNITURE")

    # -- supplier: ids 0..11 (11 supplies nothing) --
    supp = [
        (s, f"Supplier#{s:09d}", (s * 7) % 25, round(rng.uniform(-99.99, 999.99), 2))
        for s in range(12)
    ]

    # -- part: ids 0..23 (20-23 never ordered; retailprice ties; size edges) --
    nouns = ["widget", "bolt", "gear", "cog"]
    adjs = ["cold", "small", "large", "red"]
    types = ["ECONOMY", "PROMO", "STANDARD"]
    part = []
    for p in range(24):
        part.append(
            (
                p,
                f"{adjs[p % 4]} {nouns[p % 4]}",
                f"Brand#{p % 20 + 1}",
                types[p % 3],
                1 if p == 0 else 50 if p == 1 else (p % 49) + 1,
                901.00 if p in (2, 3) else round(100 + p * 37.13, 2),
            )
        )

    # -- orders: ids 0..69 (60-64 have NO lineitems; 65-69 belong to the
    #    skew customer 0; exact date cutoffs; totalprice recomputed from
    #    lineitems below for the orders that have them) --
    statuses = ["P", "O", "F"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    orders = []
    for o in range(70):
        ck = 0 if o >= 65 else o % 35  # customers 35-39 stay orderless
        if o == 0:
            dt = datetime(1996, 1, 1)  # exact cutoff midnight
        elif o == 1:
            dt = datetime(1995, 12, 31, 23, 59, 59)
        else:
            dt = t0 + timedelta(days=rng.randint(0, 2400), hours=rng.randint(0, 23))
        orders.append(
            [o, ck, statuses[o % 3], 0.0, dt, prios[o % 5]]
        )

    # -- lineitem --
    li = []
    flags = [("N", "O"), ("A", "F"), ("R", "O"), ("R", "F"), ("A", "O"), ("N", "F")]

    def add_li(okey, pkey, skey, qty, price, disc, tax, ship=None):
        ln = sum(1 for r in li if r[0] == okey) + 1
        li.append(
            (
                okey,
                pkey,
                skey,
                ln,
                float(qty),
                round(price, 2),
                disc,
                tax,
                *flags[(okey + ln) % 6],
                ship or (t0 + timedelta(days=rng.randint(0, 2400))),
            )
        )

    # boundary rows: quantity edges, q6 discount BETWEEN edges, tax edges
    add_li(2, 0, 0, 1, 0.01, 0.0, 0.0)
    add_li(2, 1, 1, 50, 99999.99, 0.1, 0.08)
    for i, disc in enumerate((0.05, 0.06, 0.07)):
        add_li(3, 2 + i, 2, 10, 1000.00, disc, 0.04)
    # half-cent product: 0.25 * (1 - 0.06) = 0.2350 → cents 23.50 exact;
    # 33.35 * 0.85 qty? keep it direct: price 0.15, disc 0.03 →
    # 0.15*0.97 = 0.1455 → ROUND(...,2) sits on a half-cent boundary
    add_li(4, 6, 3, 3, 0.15, 0.03, 0.02)
    add_li(4, 7, 3, 7, 33.35, 0.05, 0.0)
    # tpch_q15 tie: suppliers 9 and 10 each sell exactly 90000.00 of
    # revenue inside the q15 window (1996Q1), far above any filler line
    # (≤ ~2000 × 5), and nothing else — the max-revenue tie MUST return
    # both suppliers identically on both engines
    add_li(5, 8, 9, 10, 90000.00, 0.0, 0.0, ship=t0 + timedelta(days=400))
    add_li(6, 9, 10, 10, 90000.00, 0.0, 0.0, ship=t0 + timedelta(days=401))
    # FK orphan: an order key that exists in no orders row
    add_li(9999, 10, 4, 2, 100.00, 0.01, 0.01)
    # seeded filler over orders 7..59 (60-64 stay childless)
    for okey in range(7, 60):
        for _ in range(rng.randint(1, 5)):
            add_li(
                okey,
                rng.randint(0, 19),  # parts 20-23 stay unordered
                rng.randint(0, 10),  # supplier 11 stays idle
                rng.randint(1, 50),
                rng.uniform(1, 2000),
                round(rng.randint(0, 10) / 100, 2),
                round(rng.randint(0, 8) / 100, 2),
            )

    # recompute o_totalprice = Σ round_cents(price·qty·(1+tax)) like a
    # generator would; childless orders keep a nonzero synthetic total
    totals: dict[int, float] = {}
    for r in li:
        cents = round(r[5] * 100) * int(r[4]) * (100 + round(r[7] * 100))
        totals[r[0]] = totals.get(r[0], 0) + cents / 10000.0
    for o in orders:
        o[3] = round(totals.get(o[0], rng.uniform(100, 5000)), 2)

    return {
        "customer": pa.table(
            {
                "c_custkey": pa.array([r[0] for r in cust], pa.int64()),
                "c_name": pa.array([r[1] for r in cust], pa.string()),
                "c_nationkey": pa.array([r[2] for r in cust], pa.int32()),
                "c_acctbal": pa.array([r[3] for r in cust], pa.float64()),
                "c_mktsegment": pa.array([r[4] for r in cust], pa.string()),
            }
        ),
        "supplier": pa.table(
            {
                "s_suppkey": pa.array([r[0] for r in supp], pa.int64()),
                "s_name": pa.array([r[1] for r in supp], pa.string()),
                "s_nationkey": pa.array([r[2] for r in supp], pa.int32()),
                "s_acctbal": pa.array([r[3] for r in supp], pa.float64()),
            }
        ),
        "part": pa.table(
            {
                "p_partkey": pa.array([r[0] for r in part], pa.int64()),
                "p_name": pa.array([r[1] for r in part], pa.string()),
                "p_brand": pa.array([r[2] for r in part], pa.string()),
                "p_type": pa.array([r[3] for r in part], pa.string()),
                "p_size": pa.array([r[4] for r in part], pa.int32()),
                "p_retailprice": pa.array([r[5] for r in part], pa.float64()),
            }
        ),
        "orders": pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in orders], pa.int64()),
                "o_custkey": pa.array([r[1] for r in orders], pa.int64()),
                "o_orderstatus": pa.array([r[2] for r in orders], pa.string()),
                "o_totalprice": pa.array([r[3] for r in orders], pa.float64()),
                "o_orderdate": pa.array([r[4] for r in orders], pa.timestamp("us")),
                "o_orderpriority": pa.array([r[5] for r in orders], pa.string()),
            }
        ),
        "lineitem": pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in li], pa.int64()),
                "l_partkey": pa.array([r[1] for r in li], pa.int64()),
                "l_suppkey": pa.array([r[2] for r in li], pa.int64()),
                "l_linenumber": pa.array([r[3] for r in li], pa.int32()),
                "l_quantity": pa.array([r[4] for r in li], pa.float64()),
                "l_extendedprice": pa.array([r[5] for r in li], pa.float64()),
                "l_discount": pa.array([r[6] for r in li], pa.float64()),
                "l_tax": pa.array([r[7] for r in li], pa.float64()),
                "l_returnflag": pa.array([r[8] for r in li], pa.string()),
                "l_linestatus": pa.array([r[9] for r in li], pa.string()),
                "l_shipdate": pa.array([r[10] for r in li], pa.timestamp("us")),
            }
        ),
    }


def build(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in TPCH_COPY:
        shutil.copyfile(f"{SRC_SF}/{t}.parquet", f"{out_dir}/{t}.parquet")
    for t, tbl in _tpch_tables().items():
        pq.write_table(tbl, f"{out_dir}/{t}.parquet")

    doc_id, text, lang, source, n_chars = _doc_rows()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(doc_id, pa.int64()),
                "text": pa.array(text, pa.string()),
                "lang": pa.array(lang, pa.string()),
                "source": pa.array(source, pa.string()),
                "n_chars": pa.array(n_chars, pa.int64()),
            }
        ),
        f"{out_dir}/documents.parquet",
    )

    vec_id, vecs, labels = _emb_rows()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(vec_id, pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        f"{out_dir}/embeddings.parquet",
    )

    event_id, ts, user_id, event_type, value, props = _event_rows()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(event_id, pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(user_id, pa.int64()),
                "event_type": pa.array(event_type, pa.string()),
                "value": pa.array(value, pa.float64()),
                "props": pa.array(props, pa.string()),
            }
        ),
        f"{out_dir}/events.parquet",
    )
    print(f"adversarial fixture written to {out_dir}")


if __name__ == "__main__":
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    build(sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, ".adversarial"))
