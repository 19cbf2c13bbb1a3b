"""Interactive REPL pre-loaded with the engine namespace.

Parity: reference src/datarepo/__init__.py:6-46 (IPython session with
Catalog/Filter/pl in scope) — here the namespace is Spark-native: an active
SparkSession, the catalog classes, the Filter algebra, and
pyspark.sql.functions as F.
"""

from __future__ import annotations

from typing import Any, Optional


def start_repl(
    catalogs: Optional[dict[str, Any]] = None,
    sf_dir: Optional[str] = None,
) -> None:
    from pyspark.sql import functions as F  # noqa: N812

    from . import (
        Catalog,
        DictDatabase,
        Filter,
        ModuleDatabase,
        ParquetTable,
        get_spark,
        table,
    )
    from .queries.testdata import testdata_catalog

    spark = get_spark(app_name="datarepo-spark-repl")
    namespace: dict[str, Any] = {
        "spark": spark,
        "F": F,
        "Catalog": Catalog,
        "DictDatabase": DictDatabase,
        "ModuleDatabase": ModuleDatabase,
        "ParquetTable": ParquetTable,
        "Filter": Filter,
        "table": table,
    }
    if sf_dir:
        namespace["catalog"] = testdata_catalog(sf_dir)
    if catalogs:
        namespace.update(catalogs)

    banner = (
        "datarepo-spark REPL — in scope: spark, F, Catalog, Filter, "
        "ParquetTable, table" + (", catalog" if "catalog" in namespace else "")
    )
    try:
        import IPython

        IPython.start_ipython(argv=[], user_ns=namespace, display_banner=banner)
    except ImportError:
        import code

        code.interact(banner=banner, local=namespace)


if __name__ == "__main__":
    import sys

    start_repl(sf_dir=sys.argv[1] if len(sys.argv) > 1 else None)
