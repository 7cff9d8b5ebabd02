"""Minimal Apache Iceberg table format support (pure Python + Spark scans).

Reference parity: the reference reads Iceberg tables through its catalog
(fe/.../catalog/IcebergTable.java; fe/.../analysis/... iceberg scan
planning) — snapshot-based metadata, manifest-driven file planning, and
identity-partition pruning. No Iceberg jars or pyiceberg exist in this
environment, so this module implements the PUBLISHED Iceberg table spec
(v1, https://iceberg.apache.org/spec/) directly:

  metadata/vN.metadata.json   table metadata: schema (field-ids), partition
                              spec, snapshot log, current snapshot pointer
  metadata/snap-*.avro        manifest list (one row per manifest; spec
                              field-ids 500+)
  metadata/manifest-*.avro    manifest files: manifest_entry records
                              (status, snapshot_id, data_file with
                              file_path/partition/record_count; field-ids
                              0-2, 100-104)
  data/...parquet             data files — ALL columns retained (Iceberg is
                              not Hive: identity-partition columns live in
                              the data files AND the manifest partition
                              tuple)

The avro containers are written/read by the pure-Python codec in
avro_codec.py (nested record/array/map support). Supported subset:
format-version 1, identity partition transforms, create + append snapshots,
snapshot time travel, and manifest-level identity-partition pruning (the
scan plans only the files whose partition tuple survives the filter — the
I/O-level win Iceberg exists for). Deletes/schema-evolution/hidden
transforms are out of scope and raise.

Scale notes: metadata and manifests are driver-side (small by design —
Iceberg's own model); the data scan is a plain distributed parquet read
over the planned file list, so Catalyst pushdown/pruning applies as usual.
A production writer would commit files from a distributed write rather
than the per-partition loop used for fixtures here (documented trade-off).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hopspark.sources.avro_codec import decode_container, write_container

# ---------------------------------------------------------------- schemas

_ICE_TO_SPARK = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "binary": T.BinaryType(),
    "date": T.DateType(),
    "timestamp": T.TimestampNTZType(),
    "timestamptz": T.TimestampType(),
}
_SPARK_TO_ICE = {v.typeName(): k for k, v in _ICE_TO_SPARK.items()}


def _spark_to_iceberg_schema(schema: T.StructType) -> dict:
    fields = []
    for i, f in enumerate(schema.fields, start=1):
        tn = f.dataType.typeName()
        if isinstance(f.dataType, T.DecimalType):
            ice = f"decimal({f.dataType.precision}, {f.dataType.scale})"
        elif tn in _SPARK_TO_ICE:
            ice = _SPARK_TO_ICE[tn]
        else:
            raise NotImplementedError(f"iceberg type for {f.dataType}")
        fields.append(
            {"id": i, "name": f.name, "required": not f.nullable, "type": ice}
        )
    return {"type": "struct", "schema-id": 0, "fields": fields}


def _iceberg_to_spark_schema(ice: dict) -> T.StructType:
    out = []
    for f in ice["fields"]:
        t = f["type"]
        if isinstance(t, str) and t.startswith("decimal("):
            p, s = t[8:-1].split(",")
            dt: T.DataType = T.DecimalType(int(p), int(s))
        else:
            dt = _ICE_TO_SPARK[t]
        out.append(T.StructField(f["name"], dt, not f["required"]))
    return T.StructType(out)


def _partition_avro_type(schema: T.StructType, partition_by: list[str]) -> dict:
    """Avro record for the manifest `partition` tuple (spec: one field per
    partition field, field-ids from the spec)."""
    fields = []
    for i, name in enumerate(partition_by):
        sf = schema[name]
        from hopspark.sources.avro_codec import _spark_type_to_avro

        fields.append(
            {
                "name": name,
                "type": ["null", _spark_type_to_avro(sf.dataType, f"p_{name}")],
                "field-id": 1000 + i,
            }
        )
    return {"type": "record", "name": "r102", "fields": fields}


def _manifest_entry_schema(partition_type: dict) -> dict:
    """manifest_entry (spec v1: field-ids 0,1,2; data_file 100-104)."""
    data_file = {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {"name": "partition", "type": partition_type, "field-id": 102},
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
        ],
    }
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
            {"name": "data_file", "type": data_file, "field-id": 2},
        ],
    }


_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "added_snapshot_id", "type": ["null", "long"], "field-id": 503},
        {"name": "added_data_files_count", "type": ["null", "int"], "field-id": 504},
        {"name": "added_rows_count", "type": ["null", "long"], "field-id": 512},
    ],
}

# ----------------------------------------------------------------- writer


def _load_metadata(path: str) -> tuple[dict, int]:
    meta_dir = os.path.join(path, "metadata")
    hint = os.path.join(meta_dir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            v = int(f.read().strip())
    else:
        versions = [
            int(f.split(".")[0][1:])
            for f in os.listdir(meta_dir)
            if f.endswith(".metadata.json")
        ]
        if not versions:
            raise FileNotFoundError(f"no iceberg metadata under {meta_dir}")
        v = max(versions)
    with open(os.path.join(meta_dir, f"v{v}.metadata.json")) as f:
        return json.load(f), v


def _commit_metadata(path: str, md: dict, version: int) -> None:
    meta_dir = os.path.join(path, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    with open(os.path.join(meta_dir, f"v{version}.metadata.json"), "w") as f:
        json.dump(md, f, indent=2)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write(str(version))


def write_iceberg_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "create",
) -> int:
    """Create or append a snapshot; returns the new snapshot id.

    Identity partition transforms only. Fixture-oriented writer: each
    partition value's rows are written in their own parquet job so every
    data file holds exactly one partition tuple (the invariant manifests
    require); all table columns stay in the data files per the spec."""
    partition_by = list(partition_by or [])
    schema = df.schema
    meta_dir = os.path.join(path, "metadata")
    data_dir = os.path.join(path, "data")

    if mode == "create":
        if os.path.exists(meta_dir) and os.listdir(meta_dir):
            raise ValueError(f"table already exists at {path}")
        md = {
            "format-version": 1,
            "table-uuid": str(uuid.uuid4()),
            "location": path,
            "last-updated-ms": int(time.time() * 1000),
            "last-column-id": len(schema.fields),
            "schema": _spark_to_iceberg_schema(schema),
            "partition-spec": [
                {
                    "name": c,
                    "transform": "identity",
                    "source-id": [f.name for f in schema.fields].index(c) + 1,
                    "field-id": 1000 + i,
                }
                for i, c in enumerate(partition_by)
            ],
            "current-snapshot-id": -1,
            "snapshots": [],
        }
        version = 0
    elif mode == "append":
        md, version = _load_metadata(path)
        partition_by = [p["name"] for p in md["partition-spec"]]
    else:
        raise ValueError("mode must be create or append")

    snapshot_id = int(time.time() * 1000) * 1000 + len(md["snapshots"])
    snap_dir = os.path.join(data_dir, f"snap-{snapshot_id}")

    # data files: one write per partition tuple (identity invariant)
    if partition_by:
        tuples = [tuple(r) for r in df.select(*partition_by).distinct().collect()]
        groups = []
        for i, vals in enumerate(sorted(tuples, key=str)):
            cond = None
            for c, v in zip(partition_by, vals):
                p = F.col(c).eqNullSafe(F.lit(v))
                cond = p if cond is None else cond & p
            out = os.path.join(snap_dir, f"p{i:04d}")
            df.filter(cond).write.mode("errorifexists").parquet(out)
            groups.append((dict(zip(partition_by, vals)), out))
    else:
        df.write.mode("errorifexists").parquet(snap_dir)
        groups = [({}, snap_dir)]

    # one manifest for the snapshot's added files
    part_type = _partition_avro_type(schema, partition_by)
    entry_schema = _manifest_entry_schema(part_type)
    entries = []
    n_rows = 0
    for pvals, out in groups:
        for fname in sorted(os.listdir(out)):
            if not fname.endswith(".parquet"):
                continue
            fpath = os.path.join(out, fname)
            import pyarrow.parquet as pq

            count = pq.ParquetFile(fpath).metadata.num_rows
            n_rows += count
            entries.append(
                (
                    1,  # status: ADDED
                    snapshot_id,
                    {
                        "file_path": fpath,
                        "file_format": "PARQUET",
                        "partition": pvals,
                        "record_count": count,
                        "file_size_in_bytes": os.path.getsize(fpath),
                    },
                )
            )
    os.makedirs(meta_dir, exist_ok=True)
    manifest_path = os.path.join(meta_dir, f"manifest-{snapshot_id}.avro")
    write_container(manifest_path, entry_schema, entries)

    # manifest list = previous snapshot's manifests + the new one
    prev = [
        s for s in md["snapshots"] if s["snapshot-id"] == md["current-snapshot-id"]
    ]
    manifests: list[tuple] = []
    if prev:
        blob = open(prev[0]["manifest-list"], "rb").read()
        for row in decode_container(blob):
            manifests.append(row)
    manifests.append(
        (manifest_path, os.path.getsize(manifest_path), 0, snapshot_id,
         len(entries), n_rows)
    )
    list_path = os.path.join(meta_dir, f"snap-{snapshot_id}.avro")
    write_container(list_path, _MANIFEST_LIST_SCHEMA, manifests)

    md["snapshots"].append(
        {
            "snapshot-id": snapshot_id,
            "timestamp-ms": int(time.time() * 1000),
            "manifest-list": list_path,
            "summary": {"operation": "append"},
        }
    )
    md["current-snapshot-id"] = snapshot_id
    md["last-updated-ms"] = int(time.time() * 1000)
    _commit_metadata(path, md, version + 1)
    return snapshot_id


# ----------------------------------------------------------------- reader


def iceberg_snapshots(path: str) -> list[dict]:
    """Snapshot log (id, timestamp) — SHOW SNAPSHOTS / time-travel surface."""
    md, _ = _load_metadata(path)
    return md["snapshots"]


def plan_data_files(
    path: str,
    snapshot_id: int | None = None,
    partition_filter: dict | None = None,
) -> list[dict]:
    """Manifest-driven scan planning: resolve the snapshot, read its
    manifest list, read each manifest, keep live entries (status != 2
    DELETED), and apply identity-partition pruning — files whose partition
    tuple contradicts `partition_filter` are never touched."""
    md, _ = _load_metadata(path)
    sid = snapshot_id if snapshot_id is not None else md["current-snapshot-id"]
    snaps = {s["snapshot-id"]: s for s in md["snapshots"]}
    if sid not in snaps:
        raise ValueError(f"unknown snapshot {sid}; have {sorted(snaps)}")
    files: list[dict] = []
    blob = open(snaps[sid]["manifest-list"], "rb").read()
    for mrow in decode_container(blob):
        manifest_path = mrow[0]
        for status, _snap, data_file in decode_container(
            open(manifest_path, "rb").read()
        ):
            if status == 2:  # DELETED
                continue
            part = data_file["partition"] or {}
            if partition_filter and any(
                k in part and part[k] != v for k, v in partition_filter.items()
            ):
                continue
            files.append(data_file)
    return files


def read_iceberg(
    spark: SparkSession,
    path: str,
    snapshot_id: int | None = None,
    partition_filter: dict | None = None,
) -> DataFrame:
    """Scan an Iceberg table (current or time-travel snapshot), planning
    files from manifests with identity-partition pruning, then reading the
    surviving parquet files with the table schema."""
    md, _ = _load_metadata(path)
    schema = _iceberg_to_spark_schema(md["schema"])
    files = [f["file_path"] for f in plan_data_files(path, snapshot_id, partition_filter)]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*files)
