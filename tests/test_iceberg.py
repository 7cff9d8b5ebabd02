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
    _load_metadata,
    delete_from_iceberg,
    expire_snapshots,
    equality_delete_from_iceberg,
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


def test_partitioned_write_scans_source_once(spark, sf_dir, tmp_path_factory):
    """The round-3 writer scanned the fact frame once per partition tuple
    (plus a driver-side distinct collect).  Prove the single-partitionBy-pass
    rewrite: an accumulator ticks per source row, so after a partitioned
    write it must equal EXACTLY the row count — one scan, no more."""
    path = str(tmp_path_factory.mktemp("ice_scan") / "orders")
    orders = read_table(spark, "orders", sf_dir)
    n = orders.count()
    acc = spark.sparkContext.accumulator(0)

    def tick(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    counted = orders.mapInPandas(tick, schema=orders.schema)
    write_iceberg_table(counted, path, partition_by=["o_orderstatus"])
    assert acc.value == n, (
        f"source scanned {acc.value / n:.1f}x (rows seen {acc.value}, "
        f"source rows {n}) — partitioned write must be a single pass"
    )
    # round-trip: the written table matches the source, partition columns
    # retained inside the data files
    got = read_iceberg(spark, path)
    assert got.count() == n
    assert sorted(got.columns) == sorted(orders.columns)
    assert (
        got.agg(F.sum("o_orderkey")).first()[0]
        == orders.agg(F.sum("o_orderkey")).first()[0]
    )

# ----------------------------------------------------- format-version 2


@pytest.fixture(scope="module")
def v2_table(spark, sf_dir, tmp_path_factory):
    """v2 table over nation: create (n_nationkey < 20), append the rest,
    position-delete the even keys, equality-delete region 3, then append
    one region-3 row back (must survive — strict sequence rule)."""
    path = str(tmp_path_factory.mktemp("ice2") / "nation")
    nation = read_table(spark, "nation", sf_dir)
    s1 = write_iceberg_table(
        nation.filter("n_nationkey < 20"), path, format_version=2
    )
    s2 = write_iceberg_table(nation.filter("n_nationkey >= 20"), path, mode="append")
    s3 = delete_from_iceberg(spark, path, "n_nationkey % 2 = 0")
    s4 = equality_delete_from_iceberg(
        spark, path, nation.filter("n_regionkey = 3").select("n_regionkey"),
        ["n_regionkey"],
    )
    resurrected = nation.filter("n_nationkey = 19")  # RUSSIA, region 3
    s5 = write_iceberg_table(resurrected, path, mode="append")
    return path, (s1, s2, s3, s4, s5), nation


def test_v2_metadata_shape(v2_table):
    path, snaps, _ = v2_table
    md, _v = _load_metadata(path)
    assert md["format-version"] == 2
    assert md["last-sequence-number"] == 5
    assert md["schemas"] and md["current-schema-id"] == 0
    assert [s["sequence-number"] for s in md["snapshots"]] == [1, 2, 3, 4, 5]
    assert [s["snapshot-id"] for s in md["snapshots"]] == list(snaps)


def test_v2_merge_on_read(spark, v2_table):
    """Current snapshot = all rows, minus even keys (position deletes),
    minus region 3 rows older than the equality delete — but the region-3
    row appended AFTER the equality delete survives."""
    path, _, nation = v2_table
    got = {r.n_nationkey for r in read_iceberg(spark, path).collect()}
    base = {
        r.n_nationkey
        for r in nation.filter("n_nationkey % 2 != 0 AND n_regionkey != 3").collect()
    }
    assert got == base | {19}


def test_v2_time_travel_pre_delete(spark, v2_table):
    path, (s1, s2, *_), nation = v2_table
    tt = read_iceberg(spark, path, snapshot_id=s2)
    assert tt.count() == nation.count()
    t1 = read_iceberg(spark, path, snapshot_id=s1)
    assert t1.count() == nation.filter("n_nationkey < 20").count()


def test_v2_position_delete_snapshot(spark, v2_table):
    """At the position-delete snapshot only the even keys are gone; the
    equality delete (a later sequence) is not yet visible."""
    path, (_, _, s3, *_), nation = v2_table
    got = {r.n_nationkey for r in read_iceberg(spark, path, snapshot_id=s3).collect()}
    want = {r.n_nationkey for r in nation.filter("n_nationkey % 2 != 0").collect()}
    assert got == want


def test_v2_plan_excludes_delete_files(v2_table):
    path, _, nation = v2_table
    files = plan_data_files(path)
    assert all("deletes-snap" not in f["file_path"] for f in files)
    # record counts are pre-delete (merge-on-read: deletes applied at scan)
    assert sum(f["record_count"] for f in files) == nation.count() + 1


def test_v1_rejects_deletes(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ice1") / "region")
    write_iceberg_table(read_table(spark, "region", sf_dir), path)
    with pytest.raises(NotImplementedError, match="format-version 2"):
        delete_from_iceberg(spark, path, "r_regionkey = 0")
    with pytest.raises(NotImplementedError, match="format-version 2"):
        equality_delete_from_iceberg(
            spark, path, read_table(spark, "region", sf_dir), ["r_regionkey"]
        )


def test_v2_equality_ids_validated(spark, v2_table):
    path, _, nation = v2_table
    with pytest.raises(ValueError, match="not in table schema"):
        equality_delete_from_iceberg(spark, path, nation, ["nope"])


# --- partition transforms (spec §Partition Transforms, Appendix B) ----------


def test_transform_spec_vectors():
    """The published spec's bucket hash test vectors (Appendix B) and the
    documented truncate/date transform examples."""
    from pyspark.sql import types as T

    from hopspark.sources.iceberg import _murmur3_32, _bucket_bytes, transform_value
    import datetime as dt

    # Appendix B hash values
    assert _murmur3_32(_bucket_bytes(34, T.IntegerType())) == 2017239379
    assert _murmur3_32(_bucket_bytes(34, T.LongType())) == 2017239379
    assert _murmur3_32(_bucket_bytes("iceberg", T.StringType())) == 1210000089
    assert _murmur3_32(_bucket_bytes(dt.date(2017, 11, 16), T.DateType())) == -653330422
    assert (
        _murmur3_32(
            _bucket_bytes(dt.datetime(2017, 11, 16, 22, 31, 8), T.TimestampType())
        )
        == -2047944441
    )
    # bucket index = (hash & Integer.MAX_VALUE) % N
    assert transform_value("bucket[16]", 34, T.IntegerType()) == (2017239379 & 0x7FFFFFFF) % 16
    # truncate floors toward -inf on ints, codepoint prefix on strings
    assert transform_value("truncate[10]", 1, T.IntegerType()) == 0
    assert transform_value("truncate[10]", -1, T.IntegerType()) == -10
    assert transform_value("truncate[3]", "iceberg", T.StringType()) == "ice"
    # date/time transforms: ordinals from the 1970 epoch
    assert transform_value("year", dt.date(2017, 11, 16), T.DateType()) == 47
    assert transform_value("month", dt.date(2017, 11, 16), T.DateType()) == 574
    assert transform_value("day", dt.date(2017, 11, 16), T.DateType()) == 17486
    assert (
        transform_value("hour", dt.datetime(2017, 11, 16, 22, 0), T.TimestampType())
        == 419686  # 17486 days * 24 + 22
    )
    # NULL maps to NULL under every transform
    assert transform_value("bucket[16]", None, T.IntegerType()) is None


def test_hidden_partitioning_roundtrip_and_prune(spark, tmp_path):
    """Write with bucket[4](o_custkey) + day(o_orderdate) hidden
    partitioning; a filter on the SOURCE columns must prune files via the
    transformed manifests and return exactly the matching rows."""
    import datetime as dt

    from hopspark.sources.iceberg import (
        plan_data_files,
        read_iceberg,
        transform_value,
        write_iceberg_table,
    )
    from pyspark.sql import types as T

    rows = [
        (i, dt.date(2020, 1, 1 + i % 3), f"c{i}") for i in range(40)
    ]
    df = spark.createDataFrame(rows, "o_custkey int, o_orderdate date, tag string")
    path = str(tmp_path / "hidden_part")
    write_iceberg_table(
        df,
        path,
        partition_by=[("o_custkey", "bucket[4]"), ("o_orderdate", "day")],
        format_version=2,
    )
    all_files = plan_data_files(path)
    probe_date = dt.date(2020, 1, 2)
    pruned = plan_data_files(path, partition_filter={"o_orderdate": probe_date})
    assert 0 < len(pruned) < len(all_files)
    day_ord = transform_value("day", probe_date, T.DateType())
    assert all(f["partition"]["o_orderdate_day"] == day_ord for f in pruned)

    got = read_iceberg(
        spark, path, partition_filter={"o_orderdate": probe_date}
    ).collect()
    want = [r for r in rows if r[1] == probe_date]
    assert sorted((r.o_custkey, r.tag) for r in got) == sorted(
        (i, t) for i, d, t in want
    )
    # bucket pruning on the int source column
    key = 7
    got2 = read_iceberg(spark, path, partition_filter={"o_custkey": key}).collect()
    assert {r.o_custkey for r in got2} >= {key}
    b = transform_value("bucket[4]", key, T.IntegerType())
    pruned2 = plan_data_files(path, partition_filter={"o_custkey": key})
    assert all(f["partition"]["o_custkey_bucket"] == b for f in pruned2)


def test_hidden_partitioning_append_and_delete(spark, tmp_path):
    """Append mode re-derives the transform spec from metadata; position
    deletes commit against a transform-partitioned v2 table."""
    import datetime as dt

    from hopspark.sources.iceberg import (
        delete_from_iceberg,
        read_iceberg,
        write_iceberg_table,
    )

    rows1 = [(i, dt.date(2021, 6, 1), i * 10) for i in range(10)]
    rows2 = [(i, dt.date(2021, 6, 2), i * 10) for i in range(10, 20)]
    schema = "k int, d date, v int"
    path = str(tmp_path / "hidden_append")
    write_iceberg_table(
        spark.createDataFrame(rows1, schema),
        path,
        partition_by=[("d", "month")],
        format_version=2,
    )
    write_iceberg_table(spark.createDataFrame(rows2, schema), path, mode="append")
    assert read_iceberg(spark, path).count() == 20
    delete_from_iceberg(spark, path, "k < 5")
    got = sorted(r.k for r in read_iceberg(spark, path).collect())
    assert got == list(range(5, 20))


def test_schema_evolution_add_and_drop(spark, tmp_path):
    """ADD COLUMN: older files read NULL for the new column, newer appends
    carry values; field-ids stay monotone across evolutions. DROP COLUMN:
    the column disappears from scans; partition sources refuse to drop."""
    import pytest as _pytest

    from hopspark.sources.iceberg import (
        _load_metadata,
        _table_schema,
        add_iceberg_column,
        drop_iceberg_column,
        read_iceberg,
        write_iceberg_table,
    )

    path = str(tmp_path / "evolve")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string")
    write_iceberg_table(df1, path, partition_by=["k"], format_version=2)
    add_iceberg_column(path, "score", "long")
    md, _ = _load_metadata(path)
    ids = [f["id"] for f in _table_schema(md)["fields"]]
    assert ids == [1, 2, 3] and md["last-column-id"] == 3

    df2 = spark.createDataFrame([(3, "c", 30)], "k int, s string, score long")
    write_iceberg_table(df2, path, mode="append")
    got = {r.k: (r.s, r.score) for r in read_iceberg(spark, path).collect()}
    assert got == {1: ("a", None), 2: ("b", None), 3: ("c", 30)}

    drop_iceberg_column(path, "s")
    cols = read_iceberg(spark, path).columns
    assert cols == ["k", "score"]
    with _pytest.raises(ValueError, match="partition field"):
        drop_iceberg_column(path, "k")
    # dropped-then-re-added name gets a FRESH id (no reuse)
    add_iceberg_column(path, "s", "string")
    md, _ = _load_metadata(path)
    assert [f["id"] for f in _table_schema(md)["fields"]] == [1, 3, 4]


def test_expire_snapshots_keeps_current_and_prunes_orphans(
    spark, sf_dir, tmp_path
):
    """expire_snapshots drops all but the newest N snapshots, removes the
    files only they referenced, keeps every surviving snapshot readable,
    and makes time travel to an expired id raise."""
    path = str(tmp_path / "exp")
    nation = read_table(spark, "nation", sf_dir)
    s1 = write_iceberg_table(nation.filter("n_nationkey < 5"), path)
    s2 = write_iceberg_table(
        nation.filter("n_nationkey >= 5 and n_nationkey < 10"),
        path,
        mode="append",
    )
    s3 = write_iceberg_table(
        nation.filter("n_nationkey >= 10"), path, mode="append"
    )
    assert len(iceberg_snapshots(path)) == 3
    before = {
        os.path.join(r, f)
        for r, _d, fs in os.walk(path)
        for f in fs
        if f.endswith((".parquet", ".avro"))
    }

    res = expire_snapshots(path, keep_last=1)
    assert res["expired"] == 2
    snaps = iceberg_snapshots(path)
    assert [s["snapshot-id"] for s in snaps] == [s3]
    # current snapshot reads the FULL table (appends accumulate)
    assert read_iceberg(spark, path).count() == 25
    # time travel to an expired snapshot raises
    with pytest.raises(ValueError):
        read_iceberg(spark, path, snapshot_id=s1).collect()
    after = {
        os.path.join(r, f)
        for r, _d, fs in os.walk(path)
        for f in fs
        if f.endswith((".parquet", ".avro"))
    }
    # expired-only manifest lists are gone; data files shared with the
    # current snapshot survive
    assert len(after) < len(before)
    md, _ = _load_metadata(path)
    live = {f["file_path"] for f in plan_data_files(path)}
    assert all(os.path.exists(f) for f in live)


def test_expire_snapshots_noop_when_all_kept(spark, sf_dir, tmp_path):
    path = str(tmp_path / "expnoop")
    nation = read_table(spark, "nation", sf_dir)
    write_iceberg_table(nation, path)
    res = expire_snapshots(path, keep_last=5)
    assert res == {"expired": 0, "manifests_removed": 0, "files_removed": 0}
    assert read_iceberg(spark, path).count() == 25


def test_compact_data_files_replace_snapshot(spark, sf_dir, tmp_path):
    """Compaction rewrites the current snapshot into one file per
    partition tuple via a REPLACE snapshot; results are unchanged, file
    count drops, MOR deletes are applied into the rewritten files, and
    the pre-compaction snapshot stays time-travel-readable."""
    from hopspark.sources.iceberg import compact_data_files

    path = str(tmp_path / "cmp")
    nation = read_table(spark, "nation", sf_dir)
    s1 = write_iceberg_table(
        nation.filter("n_nationkey < 10"), path, format_version=2
    )
    write_iceberg_table(
        nation.filter("n_nationkey >= 10 and n_nationkey < 20"),
        path,
        mode="append",
    )
    write_iceberg_table(
        nation.filter("n_nationkey >= 20"), path, mode="append"
    )
    delete_from_iceberg(spark, path, "n_nationkey = 7")
    before_files = len(plan_data_files(path))
    res = compact_data_files(spark, path)
    assert res["files_after"] < before_files
    assert res["rows"] == 24
    after = read_iceberg(spark, path)
    assert after.count() == 24
    assert after.filter("n_nationkey = 7").count() == 0
    # pre-compaction snapshot still time-travels (10 rows, delete not yet
    # committed at s1)
    assert read_iceberg(spark, path, snapshot_id=s1).count() == 10


def test_compact_partitioned_one_file_per_tuple(spark, sf_dir, tmp_path):
    from hopspark.sources.iceberg import compact_data_files

    path = str(tmp_path / "cmpp")
    nation = read_table(spark, "nation", sf_dir)
    write_iceberg_table(
        nation.filter("n_nationkey < 12"), path, partition_by=["n_regionkey"]
    )
    write_iceberg_table(
        nation.filter("n_nationkey >= 12"), path, mode="append"
    )
    res = compact_data_files(spark, path)
    # 5 regions -> exactly 5 rewritten files
    assert res["files_after"] == 5
    assert read_iceberg(spark, path).count() == 25
    # partition pruning still plans one file for one region
    assert len(plan_data_files(path, partition_filter={"n_regionkey": 2})) == 1


def test_describe_history_chain_and_filters(spark, sf_dir, tmp_path):
    """DESCRIBE HISTORY (Frontend.java:1230-1248): parent links chain the
    commits, every commit on the current lineage reports
    is_current_ancestor, and FROM / BETWEEN bounds filter on creation
    time. Expired snapshots drop out of the log entirely."""
    from hopspark.engine import Engine
    from hopspark.sources.iceberg import (
        describe_history,
        expire_snapshots,
        write_iceberg_table,
    )

    path = str(tmp_path / "hist")
    df = spark.range(0, 10).selectExpr("id", "CAST(id AS STRING) AS s")
    write_iceberg_table(df.filter("id < 5"), path, format_version=2)
    write_iceberg_table(df.filter("id >= 5"), path, mode="append")

    rows = describe_history(path)
    assert len(rows) == 2
    assert rows[0]["parent_id"] is None
    assert rows[1]["parent_id"] == rows[0]["snapshot_id"]
    assert all(r["is_current_ancestor"] for r in rows)
    assert [r["operation"] for r in rows] == ["append", "append"]

    # FROM bound excludes the first commit
    later = describe_history(path, from_ms=rows[1]["creation_time"])
    assert [r["snapshot_id"] for r in later] == [rows[1]["snapshot_id"]]
    # BETWEEN keeps only the first
    first = describe_history(
        path, from_ms=rows[0]["creation_time"], to_ms=rows[0]["creation_time"]
    )
    assert [r["snapshot_id"] for r in first] == [rows[0]["snapshot_id"]]

    # engine SQL surface, FROM epoch-millis literal
    eng = Engine(spark=spark, sf_dir=sf_dir, register_tables=False)
    got = eng.sql(f"DESCRIBE HISTORY '{path}'").collect()
    assert [r.snapshot_id for r in got] == [r["snapshot_id"] for r in rows]
    assert got[1].parent_id == rows[0]["snapshot_id"]
    got_from = eng.sql(
        f"DESCRIBE HISTORY '{path}' FROM {rows[1]['creation_time']}"
    ).collect()
    assert [r.snapshot_id for r in got_from] == [rows[1]["snapshot_id"]]
    got_btw = eng.sql(
        f"DESCRIBE HISTORY '{path}' BETWEEN {rows[0]['creation_time']} "
        f"AND {rows[0]['creation_time']}"
    ).collect()
    assert [r.snapshot_id for r in got_btw] == [rows[0]["snapshot_id"]]

    # expiration removes history rows
    expire_snapshots(path, keep_last=1)
    assert len(describe_history(path)) == 1
