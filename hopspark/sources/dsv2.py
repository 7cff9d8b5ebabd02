"""External data source via Spark's DataSource V2 extension point.

Reference parity: the reference's external-data-source scan node
(be/src/exec/data-source-scan-node.cc:1-406 + ext-data-source thrift API)
lets plugins serve rows to the engine with projection/predicate pushdown.
Spark's idiomatic twin is the DataSource V2 API — here implemented with
PySpark 4's Python Data Source API (pyspark.sql.datasource), wrapping the
pure-Python RCFile codec (sources/rcfile.py) as a fully registrable format:

    spark.dataSource.register(RCFileDataSource)
    df = (spark.read.format("hopspark_rcfile")
          .option("schema", "id BIGINT, name STRING").load(path))
    df.write.format("hopspark_rcfile").option("schema", ...).mode(...).save(path)

Scale design: one input partition per .rc file (the container is a
file-grained unit, so read parallelism = file count, matching the
binaryFile+mapInPandas path); COLUMN PRUNING reaches the codec's lazy
column skip (pruned columns' bytes are seeked past, never parsed); EqualTo
filters are evaluated inside the reader after text-serde casting
(pushFilters), everything else is returned to Spark as residual.
"""

from __future__ import annotations

import os
from datetime import date, datetime
from decimal import Decimal
from typing import Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


def _cast_cell(raw: str | None, dtype: T.DataType):
    """Text-serde → Python value of the field's Spark type (the same
    cast-from-string semantics as the delimited-text scan)."""
    if raw is None:
        return None
    try:
        if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            return int(raw)
        if isinstance(dtype, (T.FloatType, T.DoubleType)):
            return float(raw)
        if isinstance(dtype, T.DecimalType):
            return Decimal(raw)
        if isinstance(dtype, T.BooleanType):
            return raw.lower() == "true"
        if isinstance(dtype, T.TimestampType):
            return datetime.fromisoformat(raw)
        if isinstance(dtype, T.DateType):
            return date.fromisoformat(raw)
        if isinstance(dtype, T.BinaryType):
            return raw.encode("utf-8")
    except (ValueError, ArithmeticError):
        return None  # unparsable cell → NULL, like PERMISSIVE text scans
    return raw


def _ddl_field_names(ddl: str) -> list[str]:
    """Column names from a flat `name TYPE, ...` DDL string (RCFile schemas
    are primitive-only; the only nested commas are DECIMAL(p,s) — split on
    top-level commas, no Spark session needed)."""
    names, depth, start = [], 0, 0
    for i, ch in enumerate(ddl + ","):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            piece = ddl[start:i].strip()
            if piece:
                names.append(piece.split()[0].strip("`"))
            start = i + 1
    return names


class _RCFilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class RCFileReader(DataSourceReader):
    def __init__(self, options: dict, schema: T.StructType, all_names: list[str]) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("hopspark_rcfile requires a load(path)")
        self.schema = schema  # possibly column-pruned by Spark
        # indexes of the pruned columns within the on-disk column order —
        # handed to decode_container, which seeks past unselected columns
        self.select = [all_names.index(f.name) for f in schema.fields]
        self.eq_filters: list[tuple[int, object]] = []

    def pushFilters(self, filters):  # noqa: N802 — API name
        """Accept EqualTo on projected columns (evaluated post-cast inside
        read()); everything else is residual for Spark to re-apply."""
        from pyspark.sql.datasource import EqualTo

        names = [f.name for f in self.schema.fields]
        residual = []
        for f in filters:
            if isinstance(f, EqualTo) and len(f.attribute) == 1 and f.attribute[0] in names:
                i = names.index(f.attribute[0])
                self.eq_filters.append(
                    (i, _cast_cell(str(f.value), self.schema.fields[i].dataType))
                )
            else:
                residual.append(f)
        return iter(residual)

    def partitions(self):
        return [
            _RCFilePartition(os.path.join(self.path, f))
            for f in sorted(os.listdir(self.path))
            if f.endswith(".rc")
        ]

    def read(self, partition: _RCFilePartition) -> Iterator[tuple]:
        from hopspark.sources.rcfile import decode_container

        with open(partition.path, "rb") as f:
            blob = f.read()
        dtypes = [f.dataType for f in self.schema.fields]
        for cells in decode_container(blob, self.select):
            row = tuple(
                _cast_cell(None if c is None else c.decode("utf-8"), t)
                for c, t in zip(cells, dtypes)
            )
            if all(row[i] == v for i, v in self.eq_filters):
                yield row


class _RCFileCommit(WriterCommitMessage):
    def __init__(self, n: int) -> None:
        self.n = n


class RCFileWriter(DataSourceWriter):
    def __init__(self, options: dict, schema: T.StructType, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("hopspark_rcfile requires a save(path)")
        self.schema = schema
        self.overwrite = overwrite
        self.codec = options.get("codec", "deflate")

    def write(self, it: Iterator) -> _RCFileCommit:
        from pyspark import TaskContext

        from hopspark.sources.rcfile import _serialize_cell, write_container

        idx = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        ncols = len(self.schema.fields)
        fname = os.path.join(self.path, f"part-{idx:05d}.rc")
        rows = ([_serialize_cell(r[i]) for i in range(ncols)] for r in it)
        n = write_container(fname, rows, ncols, codec=self.codec)
        if n == 0:
            os.remove(fname)
        return _RCFileCommit(n)


class RCFileDataSource(DataSource):
    """RCFile as a DataSource V2 format (see module docstring)."""

    @classmethod
    def name(cls) -> str:
        return "hopspark_rcfile"

    def schema(self):
        ddl = self.options.get("schema")
        if not ddl:
            raise ValueError(
                "hopspark_rcfile requires .option('schema', '<ddl>') — the "
                "container stores only a column count; names/types live in "
                "the catalog, as with Hive/Impala RCFile tables"
            )
        return ddl

    def reader(self, schema: T.StructType) -> RCFileReader:
        return RCFileReader(
            self.options, schema, _ddl_field_names(self.options["schema"])
        )

    def writer(self, schema: T.StructType, overwrite: bool) -> RCFileWriter:
        if overwrite:
            import shutil

            path = self.options.get("path")
            if path:
                shutil.rmtree(path, ignore_errors=True)
        return RCFileWriter(self.options, schema, overwrite)


def register(spark) -> None:
    """Register the DSv2 formats on a session (idempotent)."""
    spark.dataSource.register(RCFileDataSource)
