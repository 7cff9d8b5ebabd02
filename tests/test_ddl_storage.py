"""CREATE TABLE storage-clause dialect (sql-parser.cup create_tbl_stmt;
HdfsFileFormat.java) — STORED AS → USING, ROW FORMAT DELIMITED → csv opts."""

import pytest

from hopspark.dialect.translate import translate
from hopspark.engine import Engine


def test_stored_as_parquet_rewrite():
    out = translate("CREATE TABLE t1 (i INT) STORED AS PARQUET")
    assert "USING parquet" in out and "STORED" not in out


def test_external_keyword_dropped():
    out = translate(
        "CREATE EXTERNAL TABLE t2 (d DECIMAL(10,2)) STORED AS PARQUET "
        "LOCATION '/tmp/x'"
    )
    assert "EXTERNAL" not in out and "USING parquet" in out
    assert "LOCATION '/tmp/x'" in out


def test_using_precedes_partitioned_by():
    out = translate(
        "CREATE TABLE t3 (i INT) PARTITIONED BY (p STRING) STORED AS PARQUET"
    )
    assert out.index("USING parquet") < out.index("PARTITIONED BY")


def test_row_format_delimited_to_csv_options():
    out = translate(
        "CREATE TABLE t5 (i INT) ROW FORMAT DELIMITED FIELDS "
        "TERMINATED BY '|' STORED AS TEXTFILE"
    )
    assert "USING csv" in out and "sep '|'" in out


def test_textfile_default_ctrl_a():
    out = translate("CREATE TABLE t6 (i INT) STORED AS TEXTFILE")
    # the reference's default text field separator is ctrl-A, emitted as a
    # Spark unicode escape so the DDL string stays printable
    assert "sep '\\u0001'" in out


def test_unsupported_formats_raise():
    for fmt in ("SEQUENCEFILE", "RCFILE", "KUDU", "ICEBERG"):
        with pytest.raises(ValueError, match="not available through SQL DDL"):
            translate(f"CREATE TABLE bad (i INT) STORED AS {fmt}")


def test_plain_create_table_untouched():
    sql = "CREATE TABLE t8 (i INT)"
    assert translate(sql) == sql


def test_end_to_end_create_insert_select(spark, sf_dir):
    eng = Engine(spark, sf_dir=sf_dir)
    eng.sql("DROP TABLE IF EXISTS ddl_sto_t")
    eng.sql(
        "CREATE TABLE ddl_sto_t (i INT, s STRING) ROW FORMAT DELIMITED "
        "FIELDS TERMINATED BY '|' STORED AS TEXTFILE"
    )
    try:
        eng.sql("INSERT INTO ddl_sto_t VALUES (2, 'b')")
        assert [
            tuple(r) for r in eng.sql("SELECT * FROM ddl_sto_t").collect()
        ] == [(2, "b")]
    finally:
        eng.sql("DROP TABLE IF EXISTS ddl_sto_t")


def test_ctas_stored_as(spark, sf_dir):
    eng = Engine(spark, sf_dir=sf_dir)
    eng.sql("DROP TABLE IF EXISTS ddl_sto_ctas")
    eng.sql(
        "CREATE TABLE ddl_sto_ctas STORED AS PARQUET AS "
        "SELECT n_nationkey FROM nation"
    )
    try:
        n = eng.sql("SELECT COUNT(*) AS n FROM ddl_sto_ctas").collect()[0][0]
        assert n == 25
    finally:
        eng.sql("DROP TABLE IF EXISTS ddl_sto_ctas")
