"""hopspark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference MPP SQL engine (Apache
Impala 4.1 source tree; see SURVEY.md), rebuilt Spark-first.

Layers (SURVEY.md §7):
  session   — tuned SparkSession factory (AQE, CBO, runtime bloom filters)
  catalog   — explicit-schema table registry over parquet dirs
  engine    — `Engine.sql()` front door with the Impala-dialect translation
  functions — Impala function-library surface on top of pyspark.sql.functions
  operators — DataFrame-native operator implementations (SURVEY.md §2)
  sources   — file-format readers/writers (parquet/csv/json/orc)
  plans     — plan-inspection helpers (pushdown/broadcast assertions)
  streaming — optional Structured Streaming extensions (reference has none)
"""

from hopspark.session import get_spark
from hopspark.engine import Engine

__all__ = ["get_spark", "Engine"]
__version__ = "0.1.0"
