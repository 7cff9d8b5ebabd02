"""Impala-SQL → Spark-SQL dialect translation (SURVEY.md §3 mapping table).

The reference parses its own SQL dialect with a CUP grammar
(fe/src/main/cup/sql-parser.cup in the reference tree). Spark SQL accepts
~95% of that dialect unchanged; this package rewrites the deltas and leaves
everything else for Catalyst:

  * function-name/argument deltas (isnull(a,b), nullifzero, zeroifnull,
    ndv, appx_median, dayname, ... — SURVEY.md §2.11)
  * IREGEXP / case-insensitive regex predicate
  * default NULL ordering: Impala sorts NULLS LAST for ASC and NULLS FIRST
    for DESC (fe/.../analysis/OrderByElement.java:115-117) — the exact
    opposite of Spark; we make the default explicit on every sort item.
  * plan hints [broadcast] / [shuffle] / straight_join → Spark hints.
"""

from hopspark.dialect.translate import translate

__all__ = ["translate"]
