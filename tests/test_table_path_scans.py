"""Rootless collection scans — ``FROM tbl.arr_col`` — the reference's
table-path idiom (testdata QueryTest/nested-types-scanner-basic.test,
nested-types-scanner-maps.test; fe Path.java resolution). The engine
rewrites a FROM/JOIN item whose dotted path starts at a catalog table and
ends at a collection into an inline LATERAL VIEW subquery
(engine.py _rewrite_table_path_scans)."""

from __future__ import annotations

import pytest

from hopspark.engine import Engine


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    e = Engine(spark=spark, sf_dir=sf_dir)
    # mirrors the shape of the reference's complextypestbl
    spark.sql("""
    CREATE OR REPLACE TEMP VIEW ctt AS
    SELECT * FROM VALUES
      (1, array(1,2,3), array(array(1,2),array(3,4)),
       named_struct('a', 10, 'b', array(100,200),
                    'c', named_struct('d',
                        array(named_struct('e', -1, 'f', 'aaa'),
                              named_struct('e', 11, 'f', 'c')))),
       map('k1', 7, 'k2', 8)),
      (2, array(), array(array(9)),
       named_struct('a', 20, 'b', array(300),
                    'c', named_struct('d',
                        array(named_struct('e', 5, 'f', 'zz')))),
       map('k3', 9)),
      (3, CAST(NULL AS array<int>), CAST(NULL AS array<array<int>>),
       named_struct('a', 30, 'b', CAST(NULL AS array<int>),
                    'c', named_struct('d',
                        CAST(NULL AS array<struct<e:int,f:string>>))),
       CAST(NULL AS map<string,int>))
    AS t(id, int_array, int_array_array, nested_struct, m)
    """)
    return e


def _rows(eng, sql):
    return [tuple(r) for r in eng.sql(sql).collect()]


def test_scalar_array_scan(eng):
    # nested-types-scanner-basic.test: select item from tbl.int_array
    assert _rows(eng, "select item from ctt.int_array order by item") == [
        (1,), (2,), (3,),
    ]
    # empty + NULL collections contribute no rows
    assert _rows(eng, "select count(*) from ctt.int_array") == [(3,)]
    # SELECT * on a scalar array exposes item only
    assert _rows(eng, "select * from ctt.int_array order by item") == [
        (1,), (2,), (3,),
    ]


def test_array_of_array_item_path(eng):
    assert _rows(
        eng, "select item from ctt.int_array_array.item order by item"
    ) == [(1,), (2,), (3,), (4,), (9,)]
    # scanning the OUTER array: rows are the inner arrays
    assert _rows(eng, "select count(*) from ctt.int_array_array") == [(3,)]


def test_struct_hop_to_array(eng):
    assert _rows(
        eng, "select item from ctt.nested_struct.b order by item"
    ) == [(100,), (200,), (300,)]


def test_struct_element_star_flattens_fields(eng):
    # IMPALA-10482 row shape: * on an array-of-struct scan = fields, no pos
    assert _rows(
        eng, "select * from ctt.nested_struct.c.d.item order by e"
    ) == [(-1, "aaa"), (5, "zz"), (11, "c")]


def test_aliased_element_field_access(eng):
    assert _rows(
        eng,
        "select inner_array.item.e from ctt.nested_struct.c.d.item"
        " inner_array order by 1",
    ) == [(-1,), (5,), (11,)]


def test_pos_virtual_column(eng):
    assert _rows(
        eng, "select a.item it, a.pos p from ctt.int_array a order by p"
    ) == [(1, 0), (2, 1), (3, 2)]


def test_map_scan_key_value(eng):
    # nested-types-scanner-maps.test: FROM tbl.map_col exposes key/value
    assert _rows(eng, "select key, value from ctt.m order by key") == [
        ("k1", 7), ("k2", 8), ("k3", 9),
    ]
    assert _rows(eng, "select * from ctt.m order by key") == [
        ("k1", 7), ("k2", 8), ("k3", 9),
    ]


def test_non_paths_untouched(eng):
    # plain table scans and scalar-column "paths" must not rewrite
    assert _rows(eng, "select count(*) from orders")[0][0] > 0
    with pytest.raises(Exception):
        eng.sql("select 1 from ctt.id").collect()  # scalar: not a scan
    # a db-qualified-looking name whose head is not a table: untouched
    with pytest.raises(Exception):
        eng.sql("select 1 from nosuchdb.nosuchtable").collect()


def test_relative_collection_join_still_works(eng):
    # the ALIAS-rooted form stays on the translate-layer rewrite
    assert _rows(
        eng,
        "select a.item from ctt t, t.int_array a where t.id = 1"
        " order by 1",
    ) == [(1,), (2,), (3,)]
