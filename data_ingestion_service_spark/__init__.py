"""PySpark-native analytics / ingestion engine.

A from-scratch, Spark-first implementation of the capability surface of
``suryavamsi-kodeti/data-ingestion-service`` (reference snapshot:
/root/reference/README.md:1 — the snapshot is a stub; see SURVEY.md §0 for
how the capability surface was reconstructed from the driver contract).

Layout:
    session.py    — SparkSession factory tuned for oracle parity + local bench
    catalog.py    — table loaders over the driver-generated parquet fixtures
    registry.py   — query registry: every operator registers a (spark_fn,
                    oracle_sql) pair; __spark_entry__.py is a thin facade
    operators/    — batch relational + LLM-pipeline operators (SURVEY.md §2)
    sources/      — non-parquet sources and sinks (CSV, JSONL, partitioned)
    streaming/    — Structured Streaming operators (SURVEY.md §2.9)
    functions/    — reusable column-expression helpers (vector math, text)
"""

from data_ingestion_service_spark.registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    register,
)

__version__ = "0.1.0"
