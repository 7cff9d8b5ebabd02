"""Oracle-checked scan/sink roundtrips for the non-parquet formats.

Each query materializes driver data into one of the reference's table
formats (Avro container, RCFile, SequenceFile, escaped TEXT, ORC, CSV,
JSON), scans it back through the corresponding hopspark reader, and
returns a result whose DuckDB oracle runs on the ORIGINAL parquet view —
so a value-hash match proves the sink+scan pair is lossless, not just
that two copies of the same reader agree.  This upgrades the §2.1 format
rows from unit-only to the same oracle evidence the query operators have.

Reference parity:
  * Avro container scan/sink — be/src/exec/hdfs-avro-scanner.h:86
  * RCFile scan (lazy column skip) — be/src/exec/hdfs-rcfile-scanner.cc:1-641
  * SequenceFile scan — be/src/exec/hdfs-sequence-scanner.cc:1-570
  * Escaped TEXT scan/sink (\\N sentinel) — be/src/exec/hdfs-text-scanner.h:49,
    be/src/exec/delimited-text-parser.cc
  * ORC scan — be/src/exec/hdfs-orc-scanner.h:58

Scale note: every writer here is a per-partition distributed sink (no
driver collect) and every reader is a distributed scan (binaryFile +
mapInPandas for the pure-Python codecs), so the shapes hold at real SF;
the gate merely runs them small.  Text formats round-trip only exactly
string-representable columns (ints/strings) — doubles go through the
binary formats (Avro/ORC), which preserve them bit-exact.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hopspark.catalog import read_table
from hopspark.operators._util import dec
from hopspark.sources.avro_codec import read_avro_native, write_avro_native
from hopspark.sources.io import (
    read_csv,
    read_json,
    read_orc,
    read_sequencefile,
    read_text_escaped,
    write_sequencefile,
    write_text_escaped,
)
from hopspark.sources.rcfile import read_rcfile, write_rcfile

#: Per-process fixture root (same hazard rationale as iceberg_queries.py:
#: a stable shared /tmp path lets a concurrent gate process rmtree a file
#: this process is mid-read on).
_FIXTURE_ROOT: str | None = None


def _fixture_path(sf_dir: str, name: str) -> str:
    global _FIXTURE_ROOT
    if _FIXTURE_ROOT is None:
        _FIXTURE_ROOT = tempfile.mkdtemp(prefix="hopspark_fmt_")
        atexit.register(shutil.rmtree, _FIXTURE_ROOT, ignore_errors=True)
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    path = os.path.join(_FIXTURE_ROOT, f"{name}_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    return path


def avro_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier → Avro container (deflate, pure-Python codec) → scan →
    per-nation aggregate.  Exercises the container framing, sync markers,
    and name-based schema resolution end-to-end."""
    path = _fixture_path(sf_dir, "avro_supplier")
    supp = read_table(spark, "supplier", sf_dir)
    write_avro_native(supp, path)
    back = read_avro_native(spark, path, supp.schema)
    return (
        back.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.sum(dec("s_acctbal")).cast("double").alias("acct_total"),
        )
        .orderBy("s_nationkey")
    )


AVRO_ROUNDTRIP_SQL = """
SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_supp,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS acct_total
FROM supplier
GROUP BY s_nationkey
ORDER BY s_nationkey
"""


def rcfile_roundtrip_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → RCFile (column-major row groups) → pruned scan of 2 of 5
    columns.  The projection reaches the container decoder (unselected
    columns are skipped byte-wise), mirroring the reference's lazy column
    read."""
    path = _fixture_path(sf_dir, "rc_customer")
    cust = read_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    write_rcfile(cust, path)
    back = read_rcfile(
        spark, path, cust.schema, select=["c_custkey", "c_mktsegment"]
    )
    return (
        back.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("c_custkey").alias("key_sum"))
        .orderBy("c_mktsegment")
    )


RCFILE_ROUNDTRIP_SQL = """
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(c_custkey) AS BIGINT) AS key_sum
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def seqfile_roundtrip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer (string/int columns) → SequenceFile of delimited-text
    values → scan through the shared escaped-split parser."""
    path = _fixture_path(sf_dir, "seq_customer")
    cust = read_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    write_sequencefile(cust, path)
    back = read_sequencefile(spark, path, cust.schema)
    return back.orderBy("c_custkey")


SEQFILE_ROUNDTRIP_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
ORDER BY c_custkey
"""


def text_escaped_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → escaped delimited TEXT (\\N null sentinel — one column is
    NULLed via NULLIF to prove the sentinel round-trips as SQL NULL, not
    the literal string) → scan → segment rollup."""
    path = _fixture_path(sf_dir, "txt_customer")
    cust = read_table(spark, "customer", sf_dir).select(
        "c_custkey",
        "c_name",
        F.nullif("c_mktsegment", F.lit("BUILDING")).alias("seg"),
    )
    write_text_escaped(cust, path)
    back = read_text_escaped(spark, path, cust.schema)
    return (
        back.groupBy("seg")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("c_custkey").alias("key_sum"))
        .orderBy(F.asc_nulls_first("seg"))
    )


TEXT_ESCAPED_ROUNDTRIP_SQL = """
SELECT NULLIF(c_mktsegment, 'BUILDING') AS seg,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(c_custkey) AS BIGINT) AS key_sum
FROM customer
GROUP BY 1
ORDER BY seg NULLS FIRST
"""


def orc_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → ORC → scan → status rollup (doubles and timestamps survive
    the binary format bit-exact)."""
    path = _fixture_path(sf_dir, "orc_orders")
    orders = read_table(spark, "orders", sf_dir)
    orders.write.mode("overwrite").orc(path)
    back = read_orc(spark, path)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("o_totalprice")).cast("double").alias("total"),
            F.max("o_orderdate").alias("last_order"),
        )
        .orderBy("o_orderstatus")
    )


ORC_ROUNDTRIP_SQL = """
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
       MAX(o_orderdate) AS last_order
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def csv_roundtrip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation → CSV (Impala-style escaping, \\N nulls) → scan with explicit
    schema → region filter.  The filter applies after the text parse, as
    with any schema-on-read text table."""
    path = _fixture_path(sf_dir, "csv_nation")
    nation = read_table(spark, "nation", sf_dir)
    write_text_escaped(nation, path, sep=",")
    back = read_csv(spark, path, nation.schema, sep=",")
    return back.filter(F.col("n_regionkey") < 3).orderBy("n_nationkey")


CSV_ROUNDTRIP_SQL = """
SELECT n_nationkey, n_name, n_regionkey
FROM nation
WHERE n_regionkey < 3
ORDER BY n_nationkey
"""


def json_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events (id/type/value) → JSON lines → schema-on-read scan → per-type
    rollup.  Doubles print with full precision in JSON, so the decimal
    aggregate matches the parquet oracle exactly."""
    path = _fixture_path(sf_dir, "json_events")
    ev = read_table(spark, "events", sf_dir).select(
        "event_id", "event_type", "value"
    )
    ev.write.mode("overwrite").json(path)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    back = read_json(spark, path, schema)
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value", 18, 6)).cast("double").alias("value_sum"),
        )
        .orderBy("event_type")
    )


JSON_ROUNDTRIP_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
FROM events
GROUP BY event_type
ORDER BY event_type
"""


QUERIES: dict[str, tuple] = {
    "avro_roundtrip_agg": (avro_roundtrip_agg, AVRO_ROUNDTRIP_SQL),
    "rcfile_roundtrip_prune": (rcfile_roundtrip_prune, RCFILE_ROUNDTRIP_SQL),
    "seqfile_roundtrip_scan": (seqfile_roundtrip_scan, SEQFILE_ROUNDTRIP_SQL),
    "text_escaped_roundtrip": (text_escaped_roundtrip, TEXT_ESCAPED_ROUNDTRIP_SQL),
    "orc_roundtrip_agg": (orc_roundtrip_agg, ORC_ROUNDTRIP_SQL),
    "csv_roundtrip_scan": (csv_roundtrip_scan, CSV_ROUNDTRIP_SQL),
    "json_roundtrip_agg": (json_roundtrip_agg, JSON_ROUNDTRIP_SQL),
}
