"""File-format sources & sinks (SURVEY.md §2.1–2.2).

The reference implements per-format scanners (parquet/ORC/text/Avro/
SequenceFile — be/src/exec/hdfs-parquet-scanner.h, hdfs-orc-scanner.h,
hdfs-text-scanner.h, hdfs-avro-scanner.h) and the HdfsTableSink
(be/src/exec/hdfs-table-sink.h:90) for INSERT [OVERWRITE] ... PARTITION.
On Spark each is a one-line `spark.read.<fmt>` with pushdown/pruning built
in; this package adds the engine-level conveniences: explicit-schema reads,
partitioned writes with dynamic partitioning, and sort-by clustering.
"""

from hopspark.sources.io import read_csv, read_json, read_orc, read_parquet, write_partitioned

__all__ = ["read_parquet", "read_csv", "read_json", "read_orc", "write_partitioned"]
