"""Lakehouse table formats (Delta / Iceberg) — jar-backed paths,
gated with remediation.

The connector jars are not on this environment's classpath; these
entry points keep the API surface present and fail with remediation
instead of a raw ClassNotFoundException (same pattern as the Kafka
source wrapper).

The jar gap no longer blocks READING either format: the engine
carries from-scratch metadata-layer readers built on the public
protocol specs — ``sources/deltalog.py`` (transaction-log replay:
JSON commits, parquet checkpoints, time travel) and
``sources/iceberglog.py`` (version hint -> metadata JSON -> Avro
manifest lists/manifests via ``operators/avrocodec.py``). Both hand
the live file set to ``spark.read.parquet`` so Catalyst plans the
scan normally; writers, partitioned tables, deletion vectors and
row-level merges remain jar-backed behavior behind this module's
gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_REMEDIATION = {
    "delta": (
        "Delta Lake needs the delta-spark package: submit with "
        "--packages io.delta:delta-spark_2.13:<version> and set "
        "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension"
    ),
    "iceberg": (
        "Apache Iceberg needs the runtime jar: submit with --packages "
        "org.apache.iceberg:iceberg-spark-runtime-<spark>_2.13:<version> "
        "and configure a catalog (spark.sql.catalog.<name>=...)"
    ),
}


def read_lakehouse(spark: SparkSession, path: str, format: str) -> DataFrame:
    """Read a Delta/Iceberg table, or raise an actionable error when the
    connector is absent."""
    if format not in _REMEDIATION:
        raise ValueError(f"unknown lakehouse format {format!r}")
    try:
        return spark.read.format(format).load(path)
    except Exception as exc:
        # only rewrap CONNECTOR-MISSING failures; a bad path, permission
        # error, or corrupt table with the connector installed must
        # surface as itself, not as bogus --packages advice
        msg = str(exc)
        if any(
            marker in msg
            for marker in (
                "DATA_SOURCE_NOT_FOUND",
                "Failed to find data source",
                "ClassNotFoundException",
            )
        ):
            raise RuntimeError(
                f"{format} connector unavailable: {_REMEDIATION[format]}"
            ) from exc
        raise


_AVRO_REMEDIATION = (
    "Avro needs the spark-avro datasource module: submit with "
    "--packages org.apache.spark:spark-avro_2.13:<spark-version> "
    "(the avro-*.jar files in $SPARK_HOME/jars are Spark's internal "
    "Avro libraries, not the datasource)"
)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Read Avro files, or raise an actionable error when the
    spark-avro datasource module is absent (same gating contract as
    the lakehouse readers)."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as exc:
        msg = str(exc)
        if any(
            marker in msg
            for marker in (
                "DATA_SOURCE_NOT_FOUND",
                "Failed to find data source",
                "ClassNotFoundException",
                "AVRO",
            )
        ):
            raise RuntimeError(
                f"avro datasource unavailable: {_AVRO_REMEDIATION}"
            ) from exc
        raise


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write Avro files with the same availability gating as read_avro."""
    try:
        df.write.mode(mode).format("avro").save(path)
    except Exception as exc:
        msg = str(exc)
        if any(
            marker in msg
            for marker in (
                "DATA_SOURCE_NOT_FOUND",
                "Failed to find data source",
                "ClassNotFoundException",
                "AVRO",
            )
        ):
            raise RuntimeError(
                f"avro datasource unavailable: {_AVRO_REMEDIATION}"
            ) from exc
        raise
