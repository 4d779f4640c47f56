"""Skew-mitigation utilities.

AQE's skew-join handles moderate runtime skew, but a join key with a
pathological hot value (one user with 10% of a 100 TB fact table)
wants explicit salting: replicate the small side R times, scatter the
big side's hot keys across R sub-keys, join on (key, salt), then the
downstream agg re-merges. The result is identical to the plain join;
only the shuffle distribution changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the big side salted
    across ``salt_buckets`` sub-partitions.

    The salt must be a PURE function of row content: anything
    nondeterministic (rand(), spark_partition_id(),
    monotonically_increasing_id()) in a shuffle key breaks exactly-once
    under task retries — a re-executed map task would route rows to
    different reducers than the attempt whose output other reducers
    already fetched. Hashing every column spreads a hot key's rows
    across salts (identical duplicate rows co-locate, which is
    acceptable). The small side is exploded ``salt_buckets``× so every
    (key, salt) pair exists.
    """
    row_hash = F.xxhash64(*[F.col(c) for c in big.columns])
    salt = (row_hash % salt_buckets + salt_buckets) % salt_buckets
    big_salted = big.withColumn("_salt", salt.cast("int"))
    small_salted = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = big_salted.join(small_salted, [key, "_salt"], how)
    return out.drop("_salt")
