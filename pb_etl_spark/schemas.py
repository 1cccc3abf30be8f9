"""Declared schemas and column-role metadata.

Re-expresses the reference's pandas dtype dicts as Spark StructTypes
(reference: /root/reference/pb_etl/tasks.py:21-43 declares the attribute and
traffic-score schemas; :416,:420 the backtest schemas) and the column-role
lists that drive normalization and one-hot encoding (tasks.py:46-61).

Mapping (SURVEY.md §1.2): int64→LongType, float64→DoubleType,
object→StringType.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _struct(cols: list[tuple[str, T.DataType]]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in cols])


# --- Reference-parity schemas (tasks.py:21-41) -----------------------------

ATTR_SCHEMA = _struct(
    [
        ("TRANSACTION_ID", T.LongType()),
        ("TLD", T.StringType()),
        ("REN", T.LongType()),
        ("REGISTRAR_NAME", T.StringType()),
        ("GL_CODE_NAME", T.StringType()),
        ("COUNTRY", T.StringType()),
        ("DOMAIN_LENGTH", T.LongType()),
        ("HISTORY", T.StringType()),
        ("TRANSFERS", T.LongType()),
        ("TERM_LENGTH", T.StringType()),
        ("RES30", T.LongType()),
        ("RESTORES", T.LongType()),
        ("REREG", T.StringType()),
        ("QTILE", T.StringType()),
        ("HD", T.StringType()),
        ("NS_V0", T.DoubleType()),
        ("NS_V1", T.DoubleType()),
        ("NS_V2", T.DoubleType()),
        ("TARGET", T.LongType()),
    ]
)

# Test attributes = train attributes without the label (tasks.py:130-135).
TEST_ATTR_SCHEMA = _struct(
    [(f.name, f.dataType) for f in ATTR_SCHEMA.fields if f.name != "TARGET"]
)

# Traffic-score schema (tasks.py:43).
TSCORE_SCHEMA = _struct(
    [
        ("TRANSACTION_ID", T.LongType()),
        ("TRAFFIC_SCORE", T.DoubleType()),
    ]
)

# Backtest actuals schema (tasks.py:416).
ACTUALS_SCHEMA = _struct(
    [
        ("TRANSACTION_ID", T.LongType()),
        ("TARGET", T.LongType()),
    ]
)

# Forecast output schema (tasks.py:386-392).
FORECAST_SCHEMA = _struct(
    [
        ("TRANSACTION_ID", T.LongType()),
        ("Y_hat", T.DoubleType()),
    ]
)

# --- Column roles (tasks.py:46-61) -----------------------------------------

# Numeric columns whose values are max-abs normalized (tasks.py:46).
NORM_COLS = ["REN", "DOMAIN_LENGTH", "TRANSFERS", "RESTORES", "TRAFFIC_SCORE"]

# Categorical feature columns (tasks.py:47-58). The reference's encoding
# loop only one-hot encodes the LAST of these due to an indentation quirk
# (tasks.py:278-288, SURVEY.md §2.6 M2); this engine encodes all 10 as the
# reference's README declares — documented divergence.
CAT_COLS = [
    "TLD",
    "REGISTRAR_NAME",
    "GL_CODE_NAME",
    "COUNTRY",
    "HISTORY",
    "TERM_LENGTH",
    "RES30",
    "REREG",
    "QTILE",
    "HD",
]

# All numeric feature columns (tasks.py:60-61).
NUM_COLS = NORM_COLS + ["NS_V0", "NS_V1", "NS_V2"]

LABEL_COL = "TARGET"
KEY_COL = "TRANSACTION_ID"
