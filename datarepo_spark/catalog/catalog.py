"""Catalog layer: named databases of tables, module reflection, global args.

Parity: reference src/datarepo/core/catalog/catalog.py —
  - Database protocol (get_tables/tables/table)            :10-41
  - ModuleDatabase (a Python module IS the database)       :44-135
  - attribute passthrough for ``db.my_table()`` style      :61-63
  - deprecation warning on deprecated-table access         :117-118
  - KeyError listing available names                       :108-110, :248-251
  - DatabaseWithGlobalArgs kwarg merging                   :138-183
  - Catalog.db / dbs / set_global_args                     :193-264

Tables are any object satisfying TableProtocol (callable returning a Spark
DataFrame + ``table_metadata``). The catalog itself is pure Python — the
distributed work lives entirely in the returned DataFrames.
"""

from __future__ import annotations

import warnings
from types import ModuleType
from typing import Any, Optional, Protocol, runtime_checkable

from pyspark.sql import DataFrame

from ..tables.metadata import TableProtocol


@runtime_checkable
class Database(Protocol):
    def get_tables(self) -> list[str]: ...

    def tables(self) -> dict[str, TableProtocol]: ...

    def table(self, name: str, *args: Any, **kwargs: Any) -> DataFrame: ...


class ModuleDatabase:
    """Reflects a Python module: every attribute with ``table_metadata``
    is a table; everything else is ignored."""

    def __init__(self, module: ModuleType) -> None:
        self._module = module

    def __getattr__(self, name: str) -> Any:
        # Passthrough so ``db.my_table(...)`` works like the reference's
        # HACK passthrough (catalog.py:61-63).
        return getattr(self._module, name)

    def _is_table(self, obj: Any) -> bool:
        return hasattr(obj, "table_metadata") and callable(obj)

    def tables(self) -> dict[str, Any]:
        out: dict[str, Any] = {}
        for name in dir(self._module):
            if name.startswith("_"):
                continue
            obj = getattr(self._module, name)
            if self._is_table(obj):
                out[name] = obj
        return out

    def get_tables(self) -> list[str]:
        return sorted(self.tables())

    def get_table(self, name: str) -> Any:
        tbl = self.tables().get(name)
        if tbl is None:
            raise KeyError(
                f"Table {name!r} not found. Available tables: "
                f"{self.get_tables()}"
            )
        return tbl

    def table(self, name: str, *args: Any, **kwargs: Any) -> DataFrame:
        tbl = self.get_table(name)
        meta = getattr(tbl, "table_metadata", None)
        if meta is not None and getattr(meta, "is_deprecated", False):
            warnings.warn(
                f"Table {name!r} is deprecated", DeprecationWarning, stacklevel=2
            )
        return tbl(*args, **kwargs)


class DictDatabase:
    """A database from an explicit name→table mapping (convenience;
    interchangeable with ModuleDatabase through the Database protocol)."""

    def __init__(self, tables: dict[str, Any]) -> None:
        self._tables = dict(tables)

    def tables(self) -> dict[str, Any]:
        return dict(self._tables)

    def get_tables(self) -> list[str]:
        return sorted(self._tables)

    def get_table(self, name: str) -> Any:
        if name not in self._tables:
            raise KeyError(
                f"Table {name!r} not found. Available tables: "
                f"{self.get_tables()}"
            )
        return self._tables[name]

    def table(self, name: str, *args: Any, **kwargs: Any) -> DataFrame:
        tbl = self.get_table(name)
        meta = getattr(tbl, "table_metadata", None)
        if meta is not None and getattr(meta, "is_deprecated", False):
            warnings.warn(
                f"Table {name!r} is deprecated", DeprecationWarning, stacklevel=2
            )
        return tbl(*args, **kwargs)


class DatabaseWithGlobalArgs:
    """Wraps a database, merging catalog-level kwargs into every table call
    (reference catalog.py:138-183). Call-site kwargs win on conflict."""

    def __init__(self, database: Any, global_args: dict[str, Any]) -> None:
        self._database = database
        self._global_args = dict(global_args)

    def __getattr__(self, name: str) -> Any:
        return getattr(self._database, name)

    def get_tables(self) -> list[str]:
        return self._database.get_tables()

    def tables(self) -> dict[str, Any]:
        return self._database.tables()

    def get_table(self, name: str) -> Any:
        return self._database.get_table(name)

    def table(self, name: str, *args: Any, **kwargs: Any) -> DataFrame:
        merged = {**self._global_args, **kwargs}
        return self._database.table(name, *args, **merged)


class Catalog:
    """Named collection of databases with optional per-session global args."""

    def __init__(
        self,
        databases: dict[str, Any],
        metadata: Optional[dict[str, Any]] = None,
    ) -> None:
        self._databases = dict(databases)
        self.metadata = metadata or {}
        self._global_args: dict[str, Any] = {}

    def set_global_args(self, args: dict[str, Any]) -> None:
        self._global_args = dict(args)

    def dbs(self) -> list[str]:
        return sorted(self._databases)

    def register_temp_views(
        self,
        spark: Any,
        database: Optional[str] = None,
        name_format: str = "{db}_{table}",
        **table_kwargs: Any,
    ) -> list[str]:
        """Register every table as a Spark temp view so the whole catalog
        is queryable with ``spark.sql`` (``SELECT … FROM db_table``).
        Views are lazy DataFrames — scans/pushdown still apply. Returns the
        registered view names."""
        names = []
        for db_name in self.dbs():
            if database is not None and db_name != database:
                continue
            db = self.db(db_name)
            for t_name in db.get_tables():
                view = name_format.format(db=db_name, table=t_name)
                df = db.table(t_name, spark=spark, **table_kwargs)
                df.createOrReplaceTempView(view)
                names.append(view)
        return names

    def db(self, name: str) -> Any:
        if name not in self._databases:
            raise KeyError(
                f"Database {name!r} not found. Available databases: "
                f"{self.dbs()}"
            )
        database = self._databases[name]
        if self._global_args:
            return DatabaseWithGlobalArgs(database, self._global_args)
        return database
