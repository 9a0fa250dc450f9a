"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ml_training_data_pipeline_spark.plans.registry — every
operator from SURVEY.md §2 registers a named query there, with matching
DuckDB oracle SQL when the semantics are SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ml_training_data_pipeline_spark.plans import registry

registry._load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's core
    question — "what are the top terms of each document cluster"
    (EP2 shape: clean → TF-IDF → cluster → top-k terms per cluster;
    SURVEY.md §3/§7 step 1)."""
    from ml_training_data_pipeline_spark.plans.flagship import flagship_cluster_top_terms

    return flagship_cluster_top_terms(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; 🔶 operators
    (estimator/LLM-backed) are intentionally absent → rows-only check."""
    return dict(registry.ORACLE_SQL)
