"""Explicit-schema readers and partitioned writers.

Reference parity:
  * text/CSV scanner with delimiters+escapes — be/src/exec/hdfs-text-scanner.h:49,
    be/src/exec/delimited-text-parser.cc (Spark: spark.read.csv options)
  * parquet scanner with stats/dictionary/bloom skipping —
    be/src/exec/parquet/hdfs-parquet-scanner.h:330-523 (Spark: built-in
    filter pushdown + column index; verified via explain in tests)
  * ORC scanner — be/src/exec/hdfs-orc-scanner.h:58
  * HdfsTableSink dynamic partition insert + sort-by clustering —
    be/src/exec/hdfs-table-sink.h:90 (Spark: partitionBy + sortWithinPartitions)

Avro/SequenceFile need jars absent from this image; they raise with a clear
message (import-gated, per the build constraints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sep: str = ",",
    header: bool = False,
    escape: str = "\\",
    null_value: str = "\\N",
) -> DataFrame:
    """Delimited-text scan with Impala-style escaping and \\N nulls."""
    return (
        spark.read.schema(schema)
        .options(sep=sep, header=header, escape=escape, nullValue=null_value, mode="PERMISSIVE")
        .csv(path)
    )


def read_text_escaped(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sep: str = "|",
    escape: str = "\\",
    null_value: str = "\\N",
) -> DataFrame:
    """Impala delimited-text semantics: the escape char protects a *bare*
    delimiter (no quoting) — be/src/exec/delimited-text-parser.cc. Spark's
    CSV reader only honors escapes inside quoted fields, so this splits on
    un-escaped separators with a JVM regex (whole-stage codegen, no Python):
    split on `(?<!\\e)\\sep`, then unescape `\\e sep → sep`, `\\e\\e → \\e`,
    and map the null marker."""
    import re as _re

    from pyspark.sql import functions as F

    e, s = _re.escape(escape), _re.escape(sep)
    split_pat = f"(?<!{e}){s}"
    lines = spark.read.text(path)
    cols = []
    for i, field in enumerate(schema.fields):
        raw = F.get(F.split(F.col("value"), split_pat), i)
        unescaped = F.regexp_replace(
            F.regexp_replace(raw, e + s, sep), e + e, escape
        )
        val = F.when(unescaped == null_value.replace("\\\\", "\\"), None).otherwise(
            unescaped
        )
        cols.append(val.cast(field.dataType).alias(field.name))
    return lines.select(*cols)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro needs the spark-avro jar, not present in this image."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as exc:  # pragma: no cover - jar-dependent
        raise NotImplementedError(
            "avro source requires the spark-avro package on the classpath"
        ) from exc


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """INSERT [OVERWRITE] ... PARTITION(...) equivalent: dynamic partitioned
    write with optional within-partition clustering (the reference's
    /* +clustered */ sort-by — HdfsTableSink). At scale, `partition_by`
    drives dir-per-partition layout and `sort_by` improves parquet
    min-max skipping for later scans."""
    out = df
    if sort_by:
        keys = (partition_by or []) + sort_by
        out = out.sortWithinPartitions(*keys)
    writer = out.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
