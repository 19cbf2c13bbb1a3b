"""Execute the generated viewer's JavaScript (routing, page rendering,
badges, escaping) under node with a minimal DOM shim — the string
assertions in test_jdbc_and_exports only prove the code SHIPS; this
proves it RUNS. Skipped when no node runtime is available."""

import os
import shutil
import subprocess

import pytest
from pyspark.sql import types as T

from datarepo_spark import Catalog, DictDatabase
from datarepo_spark.export.web import export_and_generate_site
from datarepo_spark.tables.metadata import Partition
from datarepo_spark.tables.parquet_table import ParquetTable

HARNESS = os.path.join(os.path.dirname(__file__), "viewer_dom_harness.js")


@pytest.fixture(scope="module")
def node():
    path = shutil.which("node")
    if path is None:
        pytest.skip("no node runtime in this environment")
    return path


def _site(tmp_path):
    spikes = ParquetTable(
        "spikes",
        str(tmp_path / "spikes"),
        partitioning=[Partition("implant_id", T.IntegerType())],
        schema=T.StructType([T.StructField("value", T.LongType())]),
        description="spike bins",
    )
    waves = ParquetTable(
        "waves",
        str(tmp_path / "waves"),
        schema=T.StructType([T.StructField("x", T.LongType())]),
        description="raw waveforms",
    )
    cat = Catalog(
        {"neuro": DictDatabase({"spikes": spikes, "waves": waves})},
        metadata={"owner": "t"},
    )
    out = str(tmp_path / "site")
    export_and_generate_site({"main": cat}, out)
    return out


def test_viewer_routes_render_under_node(node, tmp_path):
    out = _site(tmp_path)
    proc = subprocess.run(
        [node, HARNESS, out], capture_output=True, text=True, timeout=60
    )
    assert proc.returncode == 0, proc.stderr
    checks = dict(
        line.split(" ", 2)[1:]
        for line in proc.stdout.splitlines()
        if line.startswith("CHECK ")
    )
    assert checks.get("done") == "true", proc.stdout
    assert checks.get("redirect") == "#main"
    for key in (
        "catalog-lists-db",
        "db-lists-table",
        "table-renders",
        "crumbs",
        "badges",
        "esc-quotes",
        "safe-url",
    ):
        assert checks.get(key) == "true", (key, proc.stdout)
