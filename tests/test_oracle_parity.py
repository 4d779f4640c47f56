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


def test_no_rows_only_queries_remain():
    """Since round 3 every query has an oracle (the two sketch queries
    are tolerance-checked). A new rows-only entry is a coverage
    regression unless its docstring argues non-SQL-expressibility —
    this assertion forces that conversation."""
    assert ROWS_ONLY == [], (
        f"queries without oracles: {ROWS_ONLY} — add an oracle_sql "
        f"entry (or a tolerance-mode oracle, see windowed_agg_approx)"
    )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
