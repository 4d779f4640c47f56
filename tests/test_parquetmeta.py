"""Parquet footer reader tests: chunk-by-chunk differential test
against DuckDB's NATIVE parquet_metadata() / parquet_file_metadata()
on the real testdata files (codec, num_values, byte sizes, leaf
names, row counts), a Spark-written multi-row-group file, tail-only
reads, and malformed-input guards."""

import glob
import os
import struct

import duckdb
import pytest

from kafka_spark_streaming_app_spark.operators.parquetmeta import (
    read_parquet_footer,
    read_parquet_footer_from_path,
)


def _flatten(meta):
    out = []
    for gi, rg in enumerate(meta["row_groups"]):
        for ci, c in enumerate(rg["columns"]):
            out.append(
                (
                    gi,
                    ci,
                    c["path"],
                    c["num_values"],
                    c["codec"],
                    c["total_compressed_size"],
                    c["total_uncompressed_size"],
                )
            )
    return out


@pytest.mark.parametrize(
    "table", ["orders", "lineitem", "customer", "documents", "events",
              "embeddings", "part", "supplier", "nation", "region"]
)
def test_footer_matches_duckdb_native_reader(table, sf_smoke):
    path = os.path.join(sf_smoke, f"{table}.parquet")
    mine = read_parquet_footer_from_path(path)
    con = duckdb.connect()
    ref = con.execute(
        "SELECT row_group_id, column_id, path_in_schema, num_values,"
        " compression, total_compressed_size, total_uncompressed_size"
        f" FROM parquet_metadata('{path}')"
        " ORDER BY row_group_id, column_id"
    ).fetchall()
    flat = _flatten(mine)
    assert len(flat) == len(ref)
    for a, b in zip(flat, ref):
        # DuckDB prints nested paths "a, list, element"; ours "a.list.element"
        assert a[2] == b[2].replace(", ", "."), (a, b)  # leaf path
        assert a[3] == b[3], (a, b)  # num_values
        assert a[4] == b[4], (a, b)  # codec
        assert a[5] == b[5], (a, b)  # compressed size
        assert a[6] == b[6], (a, b)  # uncompressed size
    n_rows = con.execute(
        f"SELECT num_rows FROM parquet_file_metadata('{path}')"
    ).fetchone()[0]
    assert mine["num_rows"] == n_rows


def test_footer_of_spark_written_multi_row_group_file(spark, tmp_path):
    """A file Spark itself writes with forced-small row groups must
    parse with > 1 row group and per-group counts summing to total."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "multi")
    (
        spark.range(0, 50000)
        .select(F.col("id"), (F.col("id") % 97).alias("m"))
        .coalesce(1)
        .write.option("parquet.block.size", 64 * 1024)
        .mode("overwrite")
        .parquet(out)
    )
    [path] = glob.glob(out + "/part-*.parquet")
    meta = read_parquet_footer_from_path(path)
    assert meta["num_rows"] == 50000
    assert meta["n_row_groups"] > 1
    assert (
        sum(rg["num_rows"] for rg in meta["row_groups"]) == 50000
    )
    for rg in meta["row_groups"]:
        for c in rg["columns"]:
            assert c["num_values"] == rg["num_rows"]
    assert meta["schema_leaves"] == ["id", "m"]
    assert "parquet-mr" in meta["created_by"]


def test_tail_only_read_equals_full_read(sf_smoke):
    path = os.path.join(sf_smoke, "orders.parquet")
    full = read_parquet_footer(open(path, "rb").read())
    tail = read_parquet_footer_from_path(path, tail_bytes=64 * 1024)
    assert full == tail


def test_malformed_inputs_raise():
    with pytest.raises(ValueError, match="PAR1"):
        read_parquet_footer(b"PK\x03\x04" + bytes(16))
    # valid magic but absurd footer length
    bad = bytes(8) + struct.pack("<I", 10**6) + b"PAR1"
    with pytest.raises(ValueError, match="footer length"):
        read_parquet_footer(bad)
