"""big_data_analytics_final_project_spark — a PySpark-native analytics engine.

A ground-up re-expression of the capabilities of the reference project
``robertgahigihope/Big-Data-Analytics-FINAL-PROJECT`` (a polyglot
MongoDB + HBase + Spark + pandas e-commerce analytics pipeline, see
SURVEY.md) as one idiomatic Spark engine:

- declarative DataFrame / Spark SQL plans (Catalyst optimizes; we never
  hand-schedule),
- explicit schemas, Parquet-columnar storage zones instead of
  document/wide-column stores,
- built-in expressions everywhere; Pandas UDFs only as a documented
  escape hatch (multimodal decode),
- Structured Streaming for the event/session surface the reference
  handled with batch-incremental loaders.

Layout:
    session.py    SparkSession factory (AQE on, UTC, Arrow)
    sources/      table loaders + temp-view registration
    functions/    column-expression helpers (portable hashing, decimal-
                  exact money math, text metrics, vector math)
    operators/    composite dataflow operators (pair mining, dedup
                  family, similarity search, sessionization, multimodal)
    queries/      named analytics registry consumed by __spark_entry__
    streaming/    Structured Streaming surface
    plans/        plan-inspection / optimization-assertion helpers
"""

__version__ = "0.1.0"

from .session import get_session

__all__ = ["get_session", "__version__"]
