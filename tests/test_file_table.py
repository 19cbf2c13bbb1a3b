"""FileTable: CSV/JSON/ORC/text sources behind the DNF table protocol."""

import pytest
from pyspark.sql import types as T

from datarepo_spark.core.filters import Filter
from datarepo_spark.tables.file_table import FileTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)

ROWS = [(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5), (4, "d", None)]


@pytest.fixture(scope="module")
def paths(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("filetable")
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = {}
    for fmt in ("csv", "json", "orc"):
        p = str(base / fmt)
        w = df.write.mode("overwrite")
        if fmt == "csv":
            w = w.option("header", "true")
        getattr(w, fmt)(p)
        out[fmt] = p
    return out


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
class TestFormats:
    def test_roundtrip_filter_projection(self, spark, paths, fmt):
        t = FileTable("t", paths[fmt], fmt, schema=SCHEMA)
        df = t(
            filters=[Filter("score", ">", 2.0)],
            columns=["id", "name"],
            spark=spark,
        )
        assert df.columns == ["id", "name"]
        assert sorted((r.id, r.name) for r in df.collect()) == [
            (2, "b"),
            (3, "c"),
        ]

    def test_full_scan(self, spark, paths, fmt):
        t = FileTable("t", paths[fmt], fmt, schema=SCHEMA)
        assert t(spark=spark).count() == 4

    def test_unknown_filter_column_raises(self, spark, paths, fmt):
        t = FileTable("t", paths[fmt], fmt, schema=SCHEMA)
        with pytest.raises(ValueError):
            t(filters=[Filter("bogus", "=", 1)], spark=spark)

    def test_unknown_projection_raises(self, spark, paths, fmt):
        t = FileTable("t", paths[fmt], fmt, schema=SCHEMA)
        with pytest.raises(ValueError, match="Unknown columns"):
            t(columns=["bogus"], spark=spark)

    def test_get_schema(self, spark, paths, fmt):
        t = FileTable("t", paths[fmt], fmt, schema=SCHEMA)
        cols = {c.column: c.type for c in t.get_schema().columns}
        assert cols == {"id": "bigint", "name": "string", "score": "double"}


class TestSpecifics:
    def test_bad_format_raises(self):
        with pytest.raises(ValueError, match="file_format"):
            FileTable("t", "/x", "avro")

    def test_text_format_reads_lines(self, spark, tmp_path):
        p = str(tmp_path / "lines")
        spark.createDataFrame(
            [("hello",), ("world",)], ["value"]
        ).write.mode("overwrite").text(p)
        t = FileTable("t", p, "text")
        got = sorted(r.value for r in t(spark=spark).collect())
        assert got == ["hello", "world"]

    def test_inferred_schema_when_undeclared(self, spark, paths):
        t = FileTable("t", paths["orc"], "orc")
        cols = {c.column for c in t.get_schema(spark).columns}
        assert cols == {"id", "name", "score"}

    def test_multi_uri_union(self, spark, paths, tmp_path):
        extra = str(tmp_path / "extra")
        spark.createDataFrame(
            [(9, "z", 9.9)], SCHEMA
        ).write.mode("overwrite").orc(extra)
        t = FileTable("t", [paths["orc"], extra], "orc", schema=SCHEMA)
        assert t(spark=spark).count() == 5

    def test_orc_predicate_pushdown(self, spark, paths):
        t = FileTable("t", paths["orc"], "orc", schema=SCHEMA)
        df = t(filters=[Filter("id", "=", 2)], spark=spark)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [" in plan
        assert "id" in plan.split("PushedFilters")[1][:80]
