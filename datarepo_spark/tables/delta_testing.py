"""Write tiny Delta tables for tests — hand-authored protocol commits.

The environment has neither delta-spark nor the deltalake package (the
reference's tests write fixtures with ``deltalake.write_deltalake``,
test_deltalake_table.py:370-374). The Delta PROTOCOL is public and simple
for the subset tests need: parquet data files + JSON commits with
protocol/metaData/add/remove actions. Tiny data only — this is a test
utility, not a write path.
"""

from __future__ import annotations

import json
import os
import uuid
from collections import defaultdict
from typing import Any, Optional, Sequence

from pyspark.sql import types as T

_SPARK_TO_DELTA = {
    T.LongType: "long",
    T.IntegerType: "integer",
    T.ShortType: "short",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.StringType: "string",
    T.BooleanType: "boolean",
    T.DateType: "date",
    T.TimestampType: "timestamp",
}


def _schema_string(schema: T.StructType) -> str:
    fields = []
    for f in schema.fields:
        if isinstance(f.dataType, T.ArrayType):
            dtype: Any = {
                "type": "array",
                "elementType": _SPARK_TO_DELTA[type(f.dataType.elementType)],
                "containsNull": True,
            }
        else:
            dtype = _SPARK_TO_DELTA[type(f.dataType)]
        fields.append(
            {"name": f.name, "type": dtype, "nullable": True, "metadata": {}}
        )
    return json.dumps({"type": "struct", "fields": fields})


def _serialize_partition_value(value: Any) -> Optional[str]:
    if value is None:
        return None
    if isinstance(value, bool):
        return "true" if value else "false"
    return str(value)


class DeltaFixtureWriter:
    """Appends versioned commits to a Delta table directory."""

    def __init__(
        self,
        base: str,
        schema: T.StructType,
        partition_cols: Sequence[str] = (),
    ) -> None:
        self.base = base
        self.schema = schema
        self.partition_cols = list(partition_cols)
        self.log_dir = os.path.join(base, "_delta_log")
        os.makedirs(self.log_dir, exist_ok=True)
        self.version = -1
        self._active: list[str] = []

    def _data_fields(self) -> list[T.StructField]:
        return [
            f for f in self.schema.fields if f.name not in self.partition_cols
        ]

    def commit(
        self,
        rows: Sequence[dict[str, Any]],
        mode: str = "append",
        file_schema: Optional[T.StructType] = None,
        filename: Optional[str] = None,
    ) -> int:
        """Write ``rows`` as one parquet file per partition tuple and append
        a commit. ``mode="overwrite"`` also removes all previous files.
        ``file_schema`` writes files with a drifted physical schema (for
        normalization tests) while metaData keeps the declared schema.
        ``filename`` fixes every file's basename (the protocol only
        guarantees full-relative-path uniqueness — compactors DO emit the
        same basename in every partition dir; tests use this to prove the
        reader doesn't key on basenames)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        self.version += 1
        actions: list[dict[str, Any]] = []
        if self.version == 0:
            actions.append(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
            )
            actions.append(
                {
                    "metaData": {
                        "id": str(uuid.uuid4()),
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": _schema_string(self.schema),
                        "partitionColumns": self.partition_cols,
                        "configuration": {},
                        "createdTime": 0,
                    }
                }
            )
        if mode == "overwrite":
            for path in self._active:
                actions.append(
                    {"remove": {"path": path, "deletionTimestamp": 0,
                                "dataChange": True}}
                )
            self._active = []

        groups: dict[tuple, list[dict]] = defaultdict(list)
        for row in rows:
            groups[tuple(row.get(c) for c in self.partition_cols)].append(row)

        write_fields = (
            [f for f in (file_schema or self.schema).fields
             if f.name not in self.partition_cols]
            if file_schema is None
            else list(file_schema.fields)
        )
        for key, grp in groups.items():
            segs = [
                f"{c}={_serialize_partition_value(v)}"
                for c, v in zip(self.partition_cols, key)
            ]
            rel_dir = "/".join(segs)
            fname = filename or f"part-{uuid.uuid4().hex}-c000.parquet"
            rel_path = f"{rel_dir}/{fname}" if rel_dir else fname
            abs_dir = os.path.join(self.base, rel_dir)
            os.makedirs(abs_dir, exist_ok=True)
            cols = {
                f.name: [r.get(f.name) for r in grp] for f in write_fields
            }
            pq.write_table(pa.table(cols), os.path.join(abs_dir, fname))
            actions.append(
                {
                    "add": {
                        "path": rel_path,
                        "partitionValues": {
                            c: _serialize_partition_value(v)
                            for c, v in zip(self.partition_cols, key)
                        },
                        "size": os.path.getsize(os.path.join(abs_dir, fname)),
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                }
            )
            self._active.append(rel_path)

        commit_path = os.path.join(self.log_dir, f"{self.version:020d}.json")
        with open(commit_path, "w", encoding="utf-8") as handle:
            for action in actions:
                handle.write(json.dumps(action) + "\n")
        return self.version
