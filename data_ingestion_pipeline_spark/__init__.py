"""data_ingestion_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of aliqajar/data_ingestion_pipeline (a FastAPI/Kafka/
TimescaleDB weather-ingestion pipeline) as one idiomatic PySpark
package, extended with the operators a large-scale training-data
pipeline needs (dedup, similarity search, text analysis, multimodal
column plumbing).

Design principles (see SURVEY.md):
- DataFrame/SQL first; Catalyst and Tungsten do the optimizing.
- Every operator is declared lazily and returns a DataFrame; actions
  happen only at the API boundary (driver / bench / tests).
- Aggregates over floating-point columns use exact decimal-sum
  arithmetic so results are bit-identical across engines and across
  partitionings (order-independent) — this is what makes the engine's
  results reproducible on a 1000-executor cluster, not just local[32].
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy public surface: applications reach the facade without
    # paying pyspark import cost at package-import time
    if name == "QueryAPI":
        from data_ingestion_pipeline_spark.api import QueryAPI

        return QueryAPI
    raise AttributeError(name)
