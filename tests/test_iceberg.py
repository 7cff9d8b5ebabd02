"""Iceberg table format (pure-Python spec v1 subset over the avro codec) —
IcebergTable.java analogue: snapshot metadata, manifest-driven planning,
identity-partition pruning, time travel. See hopspark/sources/iceberg.py."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from hopspark.catalog import read_table
from hopspark.sources.iceberg import (
    iceberg_snapshots,
    plan_data_files,
    read_iceberg,
    write_iceberg_table,
)

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture(scope="module")
def table(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ice") / "orders")
    shutil.rmtree(path, ignore_errors=True)
    orders = read_table(spark, "orders", sf_dir)
    first = orders.filter("o_orderkey <= 700")
    second = orders.filter("o_orderkey > 700")
    s1 = write_iceberg_table(first, path, partition_by=["o_orderpriority"])
    s2 = write_iceberg_table(second, path, mode="append")
    return path, s1, s2, orders, first


def test_layout_and_snapshot_log(table):
    path, s1, s2, _, _ = table
    snaps = iceberg_snapshots(path)
    assert [s["snapshot-id"] for s in snaps] == [s1, s2]
    meta = os.path.join(path, "metadata")
    assert os.path.exists(os.path.join(meta, "version-hint.text"))
    assert any(f.endswith(".metadata.json") for f in os.listdir(meta))
    assert any(f.startswith("snap-") and f.endswith(".avro") for f in os.listdir(meta))
    assert any(f.startswith("manifest-") for f in os.listdir(meta))


def test_current_snapshot_reads_union(spark, table):
    path, _, _, orders, _ = table
    cur = read_iceberg(spark, path)
    assert sorted(map(tuple, cur.collect())) == sorted(map(tuple, orders.collect()))


def test_time_travel(spark, table):
    path, s1, _, _, first = table
    tt = read_iceberg(spark, path, snapshot_id=s1)
    assert sorted(map(tuple, tt.collect())) == sorted(map(tuple, first.collect()))


def test_identity_partition_pruning(spark, table):
    """Manifest-level pruning: only files whose partition tuple matches are
    planned — the scan never touches the rest."""
    path, _, _, orders, _ = table
    pruned = plan_data_files(path, partition_filter={"o_orderpriority": "1-URGENT"})
    everything = plan_data_files(path)
    assert 0 < len(pruned) < len(everything)
    assert all(f["partition"] == {"o_orderpriority": "1-URGENT"} for f in pruned)
    got = read_iceberg(spark, path, partition_filter={"o_orderpriority": "1-URGENT"})
    want = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_manifest_counts_match(table):
    path, _, _, orders, _ = table
    files = plan_data_files(path)
    assert sum(f["record_count"] for f in files) == orders.count()
    assert all(f["file_format"] == "PARQUET" for f in files)


def test_create_refuses_overwrite(spark, sf_dir, table):
    path, *_ = table
    with pytest.raises(ValueError, match="already exists"):
        write_iceberg_table(read_table(spark, "region", sf_dir), path)


def test_unknown_snapshot_raises(spark, table):
    path, *_ = table
    with pytest.raises(ValueError, match="unknown snapshot"):
        read_iceberg(spark, path, snapshot_id=123)
