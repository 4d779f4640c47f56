"""Simulate the spark-graft driver: virgin SparkSession (none of the
engine's confs), import __spark_entry__ from the repo root, smoke
entry(), then run every queries()[name] vs oracle_sql()[name] at
sf0.01 with an order-insensitive value hash.

Usage: python scripts/driver_sim.py [--smoke] [--only q1,q2,...]
"""

import hashlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb
from pyspark.sql import SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def value_hash(pdf):
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    return hashlib.md5(
        pdf.to_csv(index=False, float_format="%.10g").encode()
    ).hexdigest()


def main() -> int:
    smoke_only = "--smoke" in sys.argv
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    if only is None:
        df = e.entry(spark)
        rows = df.collect()
        print(f"entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
        assert len(rows) > 0, "entry() returned no rows"
    if smoke_only:
        spark.stop()
        return 0

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    if only is not None:
        missing = only - set(qs)
        assert not missing, f"--only names not registered: {missing}"
        qs = {n: f for n, f in qs.items() if n in only}
    print(f"{len(qs)} queries, {len(oracles)} oracles")
    failures = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as exc:
            failures.append(name)
            print(f"{name}: SPARK ERROR {exc}")
            continue
        if name in oracles:
            odf = con.execute(oracles[name]).fetchdf()
            match = (
                len(sdf) == len(odf)
                and sorted(sdf.columns) == sorted(odf.columns)
                and value_hash(sdf) == value_hash(odf)
            )
            print(
                f"{name}: spark_rows={len(sdf)} oracle_rows={len(odf)} "
                f"HASH_MATCH={match}"
            )
            if not match:
                failures.append(name)
        else:
            print(f"{name}: rows-only, rows={len(sdf)}")
    spark.stop()
    if failures:
        print(f"FAILED: {failures}")
        return 1
    print("ALL MATCH")
    return 0


if __name__ == "__main__":
    sys.exit(main())
