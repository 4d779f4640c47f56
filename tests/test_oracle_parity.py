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


def test_driver_shard_rotation_is_deterministic_and_complete():
    """The driver samples queries() head-first when capping at ~50:
    the flagship head must stay fixed, the rotation must be stable
    within a round (same CORRECTNESS file count -> same order), and
    no query may be lost or duplicated by the rotation."""
    import __spark_entry__ as e
    from kafka_spark_streaming_app_spark import registry

    a = list(e.queries())
    b = list(e.queries())
    assert a == b  # deterministic within a round
    assert set(a) == set(registry.QUERIES)  # nothing lost, no dups
    assert len(a) == len(registry.QUERIES)
    assert a[: e._SHARD_HEAD] == list(registry.QUERIES)[: e._SHARD_HEAD]
    # over rounds, consecutive offsets tile the tail: every tail query
    # enters the first _SHARD_STEP rotated positions within
    # ceil(len(tail)/_SHARD_STEP) rounds
    tail = list(registry.QUERIES)[e._SHARD_HEAD:]
    seen = set()
    rounds = -(-len(tail) // e._SHARD_STEP)
    for r in range(rounds + 1):
        off = (r * e._SHARD_STEP) % len(tail)
        seen.update((tail[off:] + tail[:off])[: e._SHARD_STEP])
    assert seen == set(tail)
