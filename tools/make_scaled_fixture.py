"""Generate a larger-SF fixture by key-shifted replication of sf0.1.

    python tools/make_scaled_fixture.py [K] [SRC] [DST]

Defaults: K=4, SRC=/root/testdata/sf0.1, DST=<repo>/.scale/sf0.4.

The r03 verdict (directive #6) asked for an sf0.2-0.5 smoke of the
heaviest queries: sf0.1 fits comfortably in memory, so a plan that
silently degrades super-linearly (quadratic within-group work, growing
collision neighborhoods) is invisible there. This replicates every
keyed table K times with SHIFTED KEYS — the TPC-H scaling model: key
cardinality grows K×, per-key densities (lines per order, orders per
customer, events per user, members per blocking key) stay CONSTANT, so
a linear plan should time ~K× and anything super-linear shows up as a
scaling exponent > 1.

Per-table treatment (replica i of K, N = base row count):
- region/nation: copied (dimensions don't scale in TPC-H either).
- customer/supplier: keys += i*N; names REGENERATED from the new key
  ('Customer#%09d') so the fuzzy-match/ER deletion-neighborhood
  collision groups keep constant density instead of ×K exact-name
  duplicates (which would quadratically inflate verify pairs — a data
  artifact, not a plan property).
- part/orders/lineitem: all FK/PK keys += i*N of the referenced table.
- events: event_id/user_id shifted; ts kept (K× traffic per hour —
  how event volume actually grows).
- documents: doc_id shifted; each replica's text is a seeded
  word-PERMUTATION of the original (distinct shingles → near-dup
  density constant; identical text would make every MinHash band
  bucket hold all K replicas → K² candidate pairs per group).
- embeddings: vec_id shifted; replicas i>0 get a seeded random
  ORTHOGONAL rotation (norms and pairwise-in-replica geometry
  preserved, cross-replica cosine ~ random) — same reasoning.

Output parquet uses 100k-row row groups so scans parallelize the way
a multi-file production layout would (the base fixture is single-row-
group → 1 task/scan, which understates scan parallelism at 4×).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

ROW_GROUP = 100_000


def write(df: pd.DataFrame, dst: str, name: str) -> None:
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    pq.write_table(tbl, os.path.join(dst, f"{name}.parquet"), row_group_size=ROW_GROUP)
    print(f"  {name}: {len(df)} rows")


def permute_words(text: str, rng: np.random.Generator) -> str:
    w = text.split(" ")
    return " ".join(np.array(w)[rng.permutation(len(w))])


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(repo, ".scale", f"sf{0.1 * k:g}")
    )
    os.makedirs(dst, exist_ok=True)
    rd = lambda t: pd.read_parquet(os.path.join(src, f"{t}.parquet"))

    for t in ("region", "nation"):
        write(rd(t), dst, t)

    cust, supp, part = rd("customer"), rd("supplier"), rd("part")
    orders, lineitem, events = rd("orders"), rd("lineitem"), rd("events")
    docs, emb = rd("documents"), rd("embeddings")
    n_cust, n_supp, n_part = len(cust), len(supp), len(part)
    n_ord, n_ev, n_doc, n_vec = (
        len(orders),
        len(events),
        len(docs),
        len(emb),
    )
    n_user = int(events["user_id"].max()) + 1

    def reps(base: pd.DataFrame, shift) -> pd.DataFrame:
        out = []
        for i in range(k):
            c = base.copy()
            shift(c, i)
            out.append(c)
        return pd.concat(out, ignore_index=True)

    def cust_shift(c, i):
        c["c_custkey"] += i * n_cust
        c["c_name"] = "Customer#" + c["c_custkey"].astype(str).str.zfill(9)

    def supp_shift(c, i):
        c["s_suppkey"] += i * n_supp
        c["s_name"] = "Supplier#" + c["s_suppkey"].astype(str).str.zfill(9)

    def part_shift(c, i):
        c["p_partkey"] += i * n_part

    def ord_shift(c, i):
        c["o_orderkey"] += i * n_ord
        c["o_custkey"] += i * n_cust

    def li_shift(c, i):
        c["l_orderkey"] += i * n_ord
        c["l_partkey"] += i * n_part
        c["l_suppkey"] += i * n_supp

    def ev_shift(c, i):
        c["event_id"] += i * n_ev
        c["user_id"] += i * n_user

    def doc_shift(c, i):
        c["doc_id"] += i * n_doc
        if i > 0:
            rng = np.random.default_rng(1000 + i)
            c["text"] = [permute_words(t, rng) for t in c["text"]]

    def emb_shift(c, i):
        c["vec_id"] += i * n_vec
        if i > 0:
            rng = np.random.default_rng(2000 + i)
            dim = len(c["embedding"].iloc[0])
            q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
            mat = np.stack(c["embedding"].to_numpy())
            rotated = (mat @ q.astype(np.float32)).astype(np.float32)
            c["embedding"] = list(rotated)

    write(reps(cust, cust_shift), dst, "customer")
    write(reps(supp, supp_shift), dst, "supplier")
    write(reps(part, part_shift), dst, "part")
    write(reps(orders, ord_shift), dst, "orders")
    write(reps(lineitem, li_shift), dst, "lineitem")
    write(reps(events, ev_shift), dst, "events")
    write(reps(docs, doc_shift), dst, "documents")
    write(reps(emb, emb_shift), dst, "embeddings")
    print(f"wrote sf{0.1 * k:g} fixture to {dst}")


if __name__ == "__main__":
    main()
