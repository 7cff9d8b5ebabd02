"""Iceberg table-format queries under the correctness gate.

Reference parity: the reference plans Iceberg scans with merge-on-read
delete application (fe/src/main/java/org/apache/impala/planner/
IcebergScanPlanner.java — position deletes become an ANTI JOIN on
(file, pos), equality deletes an ANTI JOIN on the equality columns).
These queries build a REAL format-v2 table on disk through
hopspark.sources.iceberg (spec-faithful metadata/manifests/delete files),
mutate it with both delete flavors plus a post-delete append, and read it
back — so the gate checks the whole write→delete→plan→anti-join→read
path, with the oracle recomputing the expected survivors from the flat
source table.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hopspark.catalog import read_table
from hopspark.sources.iceberg import (
    delete_from_iceberg,
    equality_delete_from_iceberg,
    read_iceberg,
    write_iceberg_table,
)


#: Per-PROCESS unique fixture root (lazy mkdtemp, removed at exit). A
#: stable shared /tmp path let a CONCURRENT gate process rmtree a table
#: this process was mid-read on — caught by tools/gate_stability.py's
#: concurrent round (the same hazard class as round 3's nested_from_disk).
_FIXTURE_ROOT: str | None = None


def _fixture_path(sf_dir: str, name: str) -> str:
    global _FIXTURE_ROOT
    if _FIXTURE_ROOT is None:
        _FIXTURE_ROOT = tempfile.mkdtemp(prefix="hopspark_ice_")
        atexit.register(shutil.rmtree, _FIXTURE_ROOT, ignore_errors=True)
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    return os.path.join(_FIXTURE_ROOT, f"{name}_{tag}")


def iceberg_v2_mor_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a v2 table from `nation`, position-delete every 4th key,
    equality-delete region 2, then append INDIA (key 8 — a row BOTH deletes
    had removed) back. The merge-on-read scan must drop the position- and
    equality-deleted rows but keep the re-appended one (its data sequence
    number is newer than the equality delete's — the spec's strict
    sequence rule)."""
    path = _fixture_path(sf_dir, "v2_nation")
    shutil.rmtree(path, ignore_errors=True)
    nation = read_table(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    write_iceberg_table(nation, path, format_version=2)
    delete_from_iceberg(spark, path, "n_nationkey % 4 = 0")
    equality_delete_from_iceberg(
        spark, path, nation.filter("n_regionkey = 2").select("n_regionkey"),
        ["n_regionkey"],
    )
    write_iceberg_table(nation.filter("n_nationkey = 8"), path, mode="append")
    return read_iceberg(spark, path).orderBy("n_nationkey")


ICEBERG_V2_MOR_SQL = """
SELECT n_nationkey, n_name, n_regionkey
FROM nation
WHERE (n_nationkey % 4 <> 0 AND n_regionkey <> 2) OR n_nationkey = 8
ORDER BY n_nationkey
"""


def iceberg_time_travel_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-diff read: per-region row counts at the pre-delete snapshot
    vs the current one — SHOW SNAPSHOTS + time-travel, the catalog surface
    the reference exposes for Iceberg (IcebergTable.java snapshot log)."""
    path = _fixture_path(sf_dir, "v2_tt")
    shutil.rmtree(path, ignore_errors=True)
    nation = read_table(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    s1 = write_iceberg_table(nation, path, format_version=2)
    delete_from_iceberg(spark, path, "n_nationkey % 2 = 1")
    before = (
        read_iceberg(spark, path, snapshot_id=s1)
        .groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("n_before"))
    )
    after = (
        read_iceberg(spark, path)
        .groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("n_after"))
    )
    return (
        before.join(after, "n_regionkey", "left")
        .select(
            "n_regionkey",
            "n_before",
            F.coalesce("n_after", F.lit(0)).alias("n_after"),
        )
        .orderBy("n_regionkey")
    )


ICEBERG_TT_DIFF_SQL = """
SELECT n_regionkey,
       COUNT(*) AS n_before,
       CAST(SUM(CASE WHEN n_nationkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_after
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
"""

def iceberg_partition_prune_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identity-partition pruning, oracle-checked: write `orders`
    partitioned by o_orderstatus, scan ONLY the 'O' partition through the
    manifest planner (files whose partition tuple contradicts the filter
    are never opened — plan_data_files), and roll up by priority.  The
    oracle filters the base table, so a hash match proves the pruned scan
    returns exactly the partition's rows.  A planning assert guards that
    pruning actually dropped the other partitions' files."""
    from hopspark.sources.iceberg import plan_data_files

    path = _fixture_path(sf_dir, "part_orders")
    shutil.rmtree(path, ignore_errors=True)
    orders = read_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    write_iceberg_table(orders, path, partition_by=["o_orderstatus"])
    pruned = plan_data_files(path, partition_filter={"o_orderstatus": "O"})
    alln = plan_data_files(path)
    assert len(pruned) < len(alln), "partition pruning dropped no files"
    scan = read_iceberg(
        spark, path, partition_filter={"o_orderstatus": "O"}
    )
    return (
        scan.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("o_orderpriority")
    )


ICEBERG_PRUNE_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
FROM orders
WHERE o_orderstatus = 'O'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def iceberg_hidden_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIDDEN partitioning (spec partition transforms), oracle-checked:
    write `orders` partitioned by month(o_orderdate) — the transformed
    month ordinal lives only in the manifests, never as a table column —
    then scan with a filter on the SOURCE column. The planner pushes the
    literal through the spec's month transform and prunes every other
    month's files (asserted); the oracle filters the flat base table by
    the same month, so a hash match proves transform-pruned planning
    returns exactly the month's rows. This is the 100 TB partition-
    pruning contract: predicates on natural columns skip data files
    without users knowing the partition layout."""
    import datetime as dt

    from hopspark.sources.iceberg import plan_data_files

    path = _fixture_path(sf_dir, "hidden_orders")
    shutil.rmtree(path, ignore_errors=True)
    orders = read_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice"
    )
    write_iceberg_table(
        orders, path, partition_by=[("o_orderdate", "month")]
    )
    probe = dt.date(1995, 3, 1)  # any date in the probed month works
    pruned = plan_data_files(path, partition_filter={"o_orderdate": probe})
    alln = plan_data_files(path)
    assert len(pruned) < len(alln), "hidden-partition pruning dropped no files"
    scan = read_iceberg(spark, path, partition_filter={"o_orderdate": probe})
    # the partition tuple prunes to the month; same-month rows with other
    # days remain by design (hidden partitioning prunes, the residual
    # predicate refines) — keep the month-level grain for the oracle
    return (
        scan.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("o_orderpriority")
    )


ICEBERG_HIDDEN_PRUNE_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
FROM orders
WHERE date_trunc('month', o_orderdate) = DATE '1995-03-01'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def iceberg_maintenance_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full maintenance lifecycle under the gate: build a v2 table
    (3 appends), position-delete a slice, COMPACT (REPLACE snapshot — the
    MOR delete is applied into the rewritten files and small files
    collapse), EXPIRE all but the compacted snapshot (reachability-based
    orphan removal), then read back.  The oracle recomputes the survivors
    from the flat source; the query also proves the compacted table is
    now a single-manifest, delete-free read."""
    from hopspark.sources.iceberg import compact_data_files, expire_snapshots

    path = _fixture_path(sf_dir, "maint_nation")
    shutil.rmtree(path, ignore_errors=True)
    nation = read_table(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    write_iceberg_table(
        nation.filter("n_nationkey < 9"), path, format_version=2
    )
    write_iceberg_table(
        nation.filter("n_nationkey >= 9 and n_nationkey < 17"),
        path,
        mode="append",
    )
    write_iceberg_table(nation.filter("n_nationkey >= 17"), path, mode="append")
    delete_from_iceberg(spark, path, "n_nationkey % 5 = 1")
    compact_data_files(spark, path)
    expire_snapshots(path, keep_last=1)
    return read_iceberg(spark, path).orderBy("n_nationkey")


ICEBERG_MAINTENANCE_SQL = """
SELECT n_nationkey, n_name, n_regionkey
FROM nation
WHERE n_nationkey % 5 <> 1
ORDER BY n_nationkey
"""


def iceberg_describe_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE HISTORY through the engine's SQL surface
    (Frontend.java:1230-1248): build a v2 table with two appends, a delete,
    and a compaction REPLACE commit, then read the snapshot log. The
    snapshot ids and wall-clock times are nondeterministic, so the query
    projects the DETERMINISTIC derivations — commit ordinal, operation,
    parent linkage, and the current-ancestor flag (every commit chains off
    the previous one here, so the whole log is ancestry) — which the
    oracle pins as literals."""
    from hopspark.engine import Engine
    from hopspark.sources.iceberg import compact_data_files

    path = _fixture_path(sf_dir, "hist_nation")
    shutil.rmtree(path, ignore_errors=True)
    nation = read_table(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    write_iceberg_table(
        nation.filter("n_nationkey < 12"), path, format_version=2
    )
    write_iceberg_table(
        nation.filter("n_nationkey >= 12"), path, mode="append"
    )
    delete_from_iceberg(spark, path, "n_nationkey % 7 = 3")
    compact_data_files(spark, path)
    eng = Engine(spark=spark, sf_dir=sf_dir, register_tables=False)
    hist = eng.sql(f"DESCRIBE HISTORY '{path}'")
    from pyspark.sql import Window as W

    w = W.orderBy("creation_time", "snapshot_id")
    return hist.select(
        F.row_number().over(w).alias("ordinal"),
        "operation",
        F.col("parent_id").isNotNull().alias("has_parent"),
        "is_current_ancestor",
    ).orderBy("ordinal")


ICEBERG_HISTORY_SQL = """
SELECT * FROM (VALUES
  (1, 'append', false, true),
  (2, 'append', true, true),
  (3, 'delete', true, true),
  (4, 'replace', true, true)
) t(ordinal, operation, has_parent, is_current_ancestor)
ORDER BY ordinal
"""


QUERIES = {
    "iceberg_v2_mor_read": (iceberg_v2_mor_read, ICEBERG_V2_MOR_SQL),
    "iceberg_describe_history": (
        iceberg_describe_history, ICEBERG_HISTORY_SQL),
    "iceberg_maintenance_roundtrip": (
        iceberg_maintenance_roundtrip, ICEBERG_MAINTENANCE_SQL),
    "iceberg_hidden_partition_prune": (
        iceberg_hidden_partition_prune, ICEBERG_HIDDEN_PRUNE_SQL),
    "iceberg_time_travel_diff": (iceberg_time_travel_diff, ICEBERG_TT_DIFF_SQL),
    "iceberg_partition_prune_agg": (
        iceberg_partition_prune_agg, ICEBERG_PRUNE_SQL),
}
