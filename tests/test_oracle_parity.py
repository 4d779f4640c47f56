"""Every registered (query, oracle) pair must match DuckDB exactly —
the local twin of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from kafka_spark_streaming_app_spark import registry

registry.load_all()

ORACLE_CHECKED = sorted(registry.ORACLES)
ROWS_ONLY = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_query_matches_oracle(spark, sf_correctness, name):
    from .oracle import assert_matches_oracle

    df = registry.QUERIES[name](spark, sf_correctness)
    assert_matches_oracle(df, registry.ORACLES[name], sf_correctness)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_correctness, name):
    df = registry.QUERIES[name](spark, sf_correctness)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
