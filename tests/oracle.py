"""Local stand-in for the driver's DuckDB oracle comparison: row count +
column names + order-insensitive exact value equality.

Stricter than the driver (exact equality, no tolerance) — if this
passes, any sane value-hash passes too.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pd.DataFrame(index=pdf.index)
    for col in sorted(pdf.columns):
        s = pdf[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            s = s.astype("bool")
        elif s.dtype == object:
            # decimals / lists / strings: canonicalize via repr-stable form
            s = s.map(_canon)
        out[col] = s
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def _canon(v):
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (list, np.ndarray)):
        return tuple(_canon(x) for x in v)
    return v


def assert_matches_oracle(
    spark_df: DataFrame, sql: str, sf_dir: str, float_exact: bool = True
) -> None:
    # Run the DuckDB oracle CONCURRENTLY with the Spark collect: the
    # two engines are independent processes/threads (duckdb releases
    # the GIL; the Spark driver blocks on py4j), so each parity test
    # costs max(spark, duckdb) instead of their sum — the suite runs
    # 400+ of these.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as pool:
        want_f = pool.submit(run_oracle, sql, sf_dir)
        got = _normalize(spark_df.toPandas())
        want = _normalize(want_f.result())
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    for col in got.columns:
        g, w = got[col].to_numpy(), want[col].to_numpy()
        if np.issubdtype(g.dtype, np.floating) and not float_exact:
            ok = np.allclose(g, w, rtol=1e-9, atol=1e-12, equal_nan=True)
        elif np.issubdtype(g.dtype, np.floating):
            ok = (
                np.array_equal(g, w)
                or bool(np.all((g == w) | (np.isnan(g) & np.isnan(w))))
            )
        elif np.issubdtype(g.dtype, np.datetime64):
            # NaT != NaT under ==; equal-null semantics like NaN above
            ok = g.shape == w.shape and bool(
                np.all((g == w) | (np.isnat(g) & np.isnat(w)))
            )
        else:
            ok = np.array_equal(g, w)
        if not ok:
            diff = np.nonzero(~(g == w))[0][:5] if g.shape == w.shape else []
            raise AssertionError(
                f"value mismatch in column {col}; first diffs at rows {list(diff)}: "
                f"spark={g[diff] if len(diff) else g[:3]} "
                f"oracle={w[diff] if len(diff) else w[:3]}"
            )
