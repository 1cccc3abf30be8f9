"""Max-abs normalization with fit-on-train / transform-on-test semantics
(SURVEY.md §2.5 E1 + §2.4 A1; reference ``the_norm`` at
/root/reference/pb_etl/tasks.py:235-244, denominators tasks.py:198-203,
applied to train :267 and test :372).

The fitted state is a 1-row DataFrame of per-column maxima — it travels as
a broadcast cross join, never a driver collect, so the transform is a
shuffle-free map stage at any scale and the denominators can be persisted
as a tiny parquet dataset between pipeline stages (as the reference does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_SUFFIX = "__max"


def fit_maxabs(df: DataFrame, cols: list[str]) -> DataFrame:
    """Compute the 1-row max frame for ``cols`` (A1: column-wise MAX)."""
    return df.agg(*[F.max(c).cast("double").alias(c + MAX_SUFFIX) for c in cols])


def apply_maxabs(df: DataFrame, maxes: DataFrame, cols: list[str]) -> DataFrame:
    """Divide each of ``cols`` by its fitted max (E1). Columns keep their
    names, as in the reference's in-place division."""
    out = df.crossJoin(F.broadcast(maxes))
    for c in cols:
        out = out.withColumn(c, F.col(c) / F.col(c + MAX_SUFFIX))
    return out.drop(*[c + MAX_SUFFIX for c in cols])
