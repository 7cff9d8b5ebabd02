"""Impala function-library surface (SURVEY.md §2.11).

The reference registers 239 scalar function names + aggregate builtins
(common/function-registry/impala_functions.py and
fe/.../catalog/BuiltinsDb.java in the reference tree). The vast majority map
1:1 to pyspark.sql.functions and need nothing here; the dialect layer
renames the rest (hopspark/dialect/translate.py). This package supplies the
residue that needs real code:

  * python-UDF implementations of Impala-only scalars (fnv_hash,
    jaro_winkler, rotateleft, ...) registered under their Impala names
  * column-level helpers used by the operators package
"""

from hopspark.functions.registry import register_all

__all__ = ["register_all"]
