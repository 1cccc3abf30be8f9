"""pb_etl_spark — a PySpark-native analytics engine.

A from-scratch, DataFrame-first re-expression of the capabilities of the
reference ETL system (md-en-csci-e-29-final/pb-etl, surveyed in SURVEY.md):
CSV/Parquet sources with completion-flag semantics, left equi-joins on a
bigint key, whole-table aggregations, fit-on-train/apply-on-test
normalization, a binary-classifier scoring pipeline, a backtest report, and
salted (content-addressed) incremental orchestration — plus the extension
surface a large-scale training-data pipeline needs: filters, group-bys,
windows, set ops, streaming windows, deduplication (exact + MinHash/SimHash/
n-gram), similarity search over embeddings, text analysis, and multimodal
column plumbing.

Design rules (see SURVEY.md §4.3, §7):
- Declarative DataFrame/SQL plans; Catalyst + AQE pick physical strategy.
- Built-in ``pyspark.sql.functions`` in the hot path; Arrow-batched pandas
  UDFs only where built-ins genuinely cannot express the semantics.
- No driver-side collects in the relational path; broadcast only
  provably-small frames.
"""

__version__ = "0.1.0"

from pb_etl_spark.session import get_spark  # noqa: F401
