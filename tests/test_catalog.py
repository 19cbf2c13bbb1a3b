"""Catalog / ModuleDatabase / @table decorator tests.

Mirrors reference test/test_core.py (listing, KeyError messages, deprecation
warning, function-table equality) and decorator kwarg filtering
(decorator.py:35-47).
"""

import sys
import types

import pytest

from datarepo_spark import (
    Catalog,
    DictDatabase,
    ModuleDatabase,
    TableMetadata,
    table,
)


def _make_module(spark):
    mod = types.ModuleType("fake_db_module")

    @table(description="frame one")
    def frame1(spark_session=None):
        s = spark_session or spark
        return s.createDataFrame([(1, 2), (2, 4), (3, 6)], ["a", "b"])

    @table(is_deprecated=True)
    def old_frame():
        return spark.createDataFrame([(1,)], ["a"])

    @table()
    def filtered(min_a: int = 0):
        df = spark.createDataFrame([(1,), (2,), (3,)], ["a"])
        return df.filter(df.a >= min_a)

    def not_a_table():
        return 42

    mod.frame1 = frame1
    mod.old_frame = old_frame
    mod.filtered = filtered
    mod.not_a_table = not_a_table
    sys.modules[mod.__name__] = mod
    return mod


@pytest.fixture()
def catalog(spark):
    mod = _make_module(spark)
    return Catalog({"demo": ModuleDatabase(mod)})


class TestCatalog:
    def test_dbs_listing(self, catalog):
        assert catalog.dbs() == ["demo"]

    def test_missing_db_keyerror_lists_available(self, catalog):
        with pytest.raises(KeyError, match="Available databases.*demo"):
            catalog.db("nope")

    def test_table_listing_ignores_non_tables(self, catalog):
        assert catalog.db("demo").get_tables() == [
            "filtered",
            "frame1",
            "old_frame",
        ]

    def test_missing_table_keyerror(self, catalog):
        with pytest.raises(KeyError, match="Available tables"):
            catalog.db("demo").table("nope")

    def test_table_call(self, catalog):
        rows = catalog.db("demo").table("frame1").orderBy("a").collect()
        assert [(r.a, r.b) for r in rows] == [(1, 2), (2, 4), (3, 6)]

    def test_module_attr_passthrough(self, catalog):
        db = catalog.db("demo")
        assert db.not_a_table() == 42

    def test_deprecation_warning(self, catalog):
        with pytest.warns(DeprecationWarning, match="old_frame"):
            catalog.db("demo").table("old_frame")

    def test_kwarg_filtering(self, catalog):
        # extra kwargs not in the fn signature are dropped silently
        df = catalog.db("demo").table("filtered", min_a=2, irrelevant="x")
        assert sorted(r.a for r in df.collect()) == [2, 3]

    def test_global_args(self, spark):
        mod = _make_module(spark)
        cat = Catalog({"demo": ModuleDatabase(mod)})
        cat.set_global_args({"min_a": 3})
        df = cat.db("demo").table("filtered")
        assert [r.a for r in df.collect()] == [3]
        # call-site kwargs beat global args
        df = cat.db("demo").table("filtered", min_a=1)
        assert sorted(r.a for r in df.collect()) == [1, 2, 3]

    def test_dict_database(self, spark):
        @table()
        def t1():
            return spark.range(3)

        db = DictDatabase({"t1": t1})
        assert db.get_tables() == ["t1"]
        assert db.table("t1").count() == 3

    def test_function_table_schema(self, catalog):
        schema = catalog.db("demo").get_table("frame1").get_schema()
        assert [c.column for c in schema.columns] == ["a", "b"]

    def test_metadata_attached(self, catalog):
        tbl = catalog.db("demo").get_table("frame1")
        assert isinstance(tbl.table_metadata, TableMetadata)
        assert tbl.table_metadata.description == "frame one"
