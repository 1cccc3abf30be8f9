"""Distributed BPE merge training — learning a byte-pair-encoding merge
table from the corpus (the tokenizer-training step of an LLM data
pipeline; ``scalar_funcs.q_bpe_token_count`` is the downstream
apply-side counting).

Scale shape (the reason BPE trains fine on 100 TB): only the FIRST step
touches the corpus — one explode + grouped count producing the word
vocabulary with frequencies. Every merge iteration after that operates
on the VOCAB table (|distinct words|, ~sqrt-ish of corpus mass), looping
driver-side over k merges:

  pair counts  : one grouped agg over the vocab's adjacent symbol pairs
                 (weighted by word frequency) — map-side combinable;
  argmax       : a driver-sized ``first()`` on the ordered pair counts
                 (deterministic: count desc, then lexicographic pair);
  apply merge  : Arrow-batched pandas UDF rewriting each word's symbol
                 array left-to-right (vocab-sized, not corpus-sized);
  checkpoint   : ``localCheckpoint`` truncates the growing lineage each
                 round — same discipline as clustering.py's iterative
                 connected components.

Determinism: ties broken lexicographically, so the merge table is a pure
function of the corpus. The exact-equivalence test
(tests/test_tokenize.py) replays the same algorithm in plain Python and
must match merge-for-merge; the registered query is rows-only for the
driver (an iterative argmax loop is not expressible as one SQL oracle).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pb_etl_spark.catalog import read_table

N_MERGES = 15


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """word → corpus frequency; the only corpus-sized pass."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _apply_merge(syms, a: str, b: str) -> list[str]:
    """Left-to-right non-overlapping replacement of adjacent (a, b) with
    a+b — the canonical BPE apply step. ONE implementation shared by the
    trainer's and the encoder's UDFs: the training/apply equivalence
    depends on both using identical overlap semantics."""
    merged, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            merged.append(a + b)
            i += 2
        else:
            merged.append(syms[i])
            i += 1
    return merged


def _merge_udf(a: str, b: str):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def apply_merge(sym_col: pd.Series) -> pd.Series:
        return pd.Series([_apply_merge(list(s), a, b) for s in sym_col])

    return apply_merge


def learn_bpe_merges(
    spark: SparkSession, docs: DataFrame, n_merges: int = N_MERGES
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(left, right, count)] in
    merge order."""
    vocab = word_vocab(docs)
    cur = vocab.select(
        "n", F.split(F.col("w"), "").alias("s")
    ).localCheckpoint(eager=True)

    pair_expr = F.expr(
        "transform(sequence(1, size(s) - 1), "
        "i -> struct(element_at(s, i) AS a, element_at(s, i + 1) AS b))"
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            cur.filter(F.size("s") >= 2)
            .select(F.explode(pair_expr).alias("p"), "n")
            .groupBy("p")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.col("c").desc(), F.col("p.a").asc(), F.col("p.b").asc())
            .first()
        )
        if top is None:
            break
        a, b, c = top["p"]["a"], top["p"]["b"], int(top["c"])
        merges.append((a, b, c))
        prev = cur
        cur = cur.withColumn("s", _merge_udf(a, b)(F.col("s"))).localCheckpoint(
            eager=True
        )
        # drop the superseded round's blocks — same discipline as
        # clustering.py: without this, executor storage pins O(n_merges)
        # copies of the symbolized vocab
        prev.unpersist()
    return merges


# the trainer is deterministic per (corpus slice, n_merges): memoize so
# the encode query (and any harness touching both registered queries)
# does not replay the 15-iteration driver loop
_MERGE_CACHE: dict[tuple[str, int], list[tuple[str, str, int]]] = {}


def _merges_for(spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES):
    key = (sf_dir.rstrip("/"), n_merges)
    if key not in _MERGE_CACHE:
        docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
        _MERGE_CACHE[key] = learn_bpe_merges(spark, docs, n_merges)
    return _MERGE_CACHE[key]


def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table as a DataFrame: (rank, left, right,
    pair_count). Rows-only for the driver (iterative argmax has no
    single-SQL oracle); exact-equivalence vs a plain-Python reference
    implementation is asserted in tests/test_tokenize.py."""
    merges = _merges_for(spark, sf_dir)
    return spark.createDataFrame(
        [(i + 1, a, b, c) for i, (a, b, c) in enumerate(merges)],
        "rank long, left string, right string, pair_count long",
    )


def bpe_encode_udf(merges: list[tuple[str, str]]):
    """Arrow-batched encoder applying the learned merges in RANK ORDER
    to each whitespace word (the canonical BPE apply: training order =
    application priority). The merge list is a driver-side constant
    (KBs) shipped in the closure — the same pattern as the LSH
    hyperplanes and PQ codebooks."""
    from pyspark.sql.functions import pandas_udf

    pairs = [(a, b) for a, b, *_ in merges]

    @pandas_udf("long")
    def encode_count(text_col: pd.Series) -> pd.Series:
        def count_tokens(text: str) -> int:
            total = 0
            for w in text.split(" "):
                if not w:
                    continue
                syms = list(w)
                for a, b in pairs:
                    syms = _apply_merge(syms, a, b)
                total += len(syms)
            return total

        return text_col.map(count_tokens)

    return encode_count


def q_bpe_encode_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLY side: learn the merge table (once, driver-side
    loop over vocab-sized jobs), then encode every document with it —
    per-doc BPE token counts plus the compression ratio vs raw
    characters. The encode pass is embarrassingly parallel (merge table
    broadcast in the closure; one corpus scan). Rows-only like the
    trainer; exactness is pinned by the trainer's reference test plus
    the compression sanity test."""
    docs = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        # guard the ratio: an empty/all-space text has 0 char tokens and
        # would emit a NULL compression
        .filter(F.length(F.trim(F.col("text"))) > 0)
    )
    merges = _merges_for(spark, sf_dir)
    enc = bpe_encode_udf([(a, b) for a, b, _ in merges])
    n_char_tokens = F.length(F.regexp_replace(F.col("text"), " ", "")).cast("long")
    return docs.select(
        "doc_id",
        enc(F.col("text")).alias("bpe_tokens"),
        n_char_tokens.alias("char_tokens"),
        F.round(enc(F.col("text")) / n_char_tokens, 6).alias("compression"),
    )


QUERIES = {
    "bpe_train_merges": q_bpe_train_merges,
    "bpe_encode_counts": q_bpe_encode_counts,
}

ORACLES: dict[str, str] = {}
