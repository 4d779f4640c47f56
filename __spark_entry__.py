"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one (spark, sf_dir) -> DataFrame callable per
implemented operator (SURVEY.md §2 + north-star extensions).
``oracle_sql()`` — matching DuckDB ANSI SQL per key (omitted only for
non-SQL-expressible ops → rows-only check).

The real registry lives in ``kafka_spark_streaming_app_spark.registry``;
this module is a thin re-export so the engine is usable as a library.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_spark_streaming_app_spark import registry
from kafka_spark_streaming_app_spark.session import apply_runtime_confs

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference sliding-window aggregation) on sf0.001."""
    apply_runtime_confs(spark)
    return registry.QUERIES["windowed_agg_sliding"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def _wrap(fn: registry.QueryFn) -> registry.QueryFn:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in registry.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
