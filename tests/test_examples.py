"""The examples must stay runnable — they are the user-facing docs
surface (reference parity: docs/examples/tpch_tables.py builds the
reference's docs site in its CI)."""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


class TestTpchCatalogExample:
    def test_tables_resolve_and_filter(self, spark):
        from examples.tpch_catalog import catalog

        from datarepo_spark import Filter

        db = catalog.db("tpch")
        assert sorted(db.tables())[:3] == ["customer", "lineitem", "nation"]
        df = db.table("part", filters=[Filter("p_size", ">", 40)])
        rows = df.select("p_size").distinct().collect()
        assert rows and all(r["p_size"] > 40 for r in rows)

    def test_function_table_runs(self, spark):
        from examples.tpch_catalog import catalog

        df = catalog.db("tpch").table("order_revenue")
        assert df.count() > 0
        assert set(df.columns) == {"l_orderkey", "revenue"}

    def test_web_export_builds_from_example(self, spark, tmp_path):
        from examples.tpch_catalog import catalog
        from datarepo_spark.export.web import export_catalogs

        out = export_catalogs({"tpch": catalog}, str(tmp_path))
        data = [p for p in os.listdir(tmp_path)]
        assert data, out

    def test_roapi_export_builds_from_example(self, spark):
        from examples.tpch_catalog import catalog
        from datarepo_spark.export.roapi import export_to_roapi_tables

        tables = export_to_roapi_tables(catalog)
        names = {t["name"] for t in tables}
        assert "part" in names and "lineitem" in names
