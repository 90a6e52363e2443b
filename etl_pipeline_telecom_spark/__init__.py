"""etl_pipeline_telecom_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the data-processing
capabilities of the reference repo ``jahnavi1thoom/ETL-pipeline-telecom``
(survey: SURVEY.md), extended with large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).

Design rules (see SURVEY.md §4.2, §7):
- declarative DataFrame/SQL plans; let Catalyst/Tungsten optimize
- native Column expressions over UDFs; Pandas UDFs only where built-ins
  genuinely can't express the semantics
- every operator registered in ``catalog`` with a DuckDB oracle SQL string
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
