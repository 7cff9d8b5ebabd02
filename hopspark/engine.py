"""Engine front door: `Engine.sql()` — the Spark analogue of the reference's
query lifecycle (SURVEY.md §3).

Reference pipeline: HS2 ExecuteStatement → CUP parse → analyze/rewrite →
single-node plan → distributed plan → coordinator execution
(be/src/service/impala-server.h:197; fe/.../service/Frontend.java:2004-2018;
fe/.../planner/Planner.java:248-256). On Spark, everything from parse
onwards is Catalyst + AQE; the engine contributes the dialect translation,
the function library registration, and the table catalog binding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hopspark import catalog
from hopspark.dialect import translate
from hopspark.functions import register_all
from hopspark.session import get_spark


class Engine:
    """A bound analytics-engine session: catalog + functions + dialect."""

    def __init__(
        self,
        spark: SparkSession | None = None,
        sf_dir: str = catalog.DEFAULT_SF_DIR,
        register_tables: bool = True,
    ) -> None:
        self.spark = spark or get_spark()
        self.sf_dir = sf_dir
        register_all(self.spark)
        if register_tables:
            catalog.register(self.spark, sf_dir)

    # -- query surface ------------------------------------------------------

    def sql(self, impala_sql: str) -> DataFrame:
        """Run an Impala-dialect SQL statement; returns a lazy DataFrame."""
        return self.spark.sql(translate(impala_sql))

    def table(self, name: str) -> DataFrame:
        return catalog.read_table(self.spark, name, self.sf_dir)

    def explain(self, impala_sql: str) -> str:
        df = self.sql(impala_sql)
        return df._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
