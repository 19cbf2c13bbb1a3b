"""Per-file statistics: the Delta protocol's ``add.stats`` JSON and the
file-skipping evaluator that consumes it.

Why this exists: partition pruning only helps along the partition axis.
The reference's Delta story (deltalake_table.py — delta-rs under the
hood) also skips *files* whose footer min/max cannot satisfy the query
predicate — at 100 TB this is the difference between "scan the whole
partition" and "open the 3 files whose id range overlaps the filter".
The public protocol carries the skipping index in each add action as a
JSON ``stats`` string:

    {"numRecords": N,
     "minValues": {col: v, ...},
     "maxValues": {col: v, ...},
     "nullCount": {col: n, ...}}

Write side (:func:`collect_file_stats`): aggregate the parquet footer's
row-group statistics — metadata-only, no data read, the jar-less
equivalent of delta-spark collecting stats from its writer tasks. At
scale this is O(files) footer reads on the driver per commit, the same
asymptotics as the move/commit loop that already exists.

Read side (:func:`stats_prune`): evaluate the table's DNF filters
against each file's [min, max] envelope and nullCount. Pruning must be
SOUND (never drop a file that could match) and need not be complete —
rows are re-filtered after the scan, so any "don't know" degrades to
"keep the file".

Soundness rules encoded here:
- strings are only compared when both sides are ASCII (parquet orders
  UTF-8 stats by byte; Python compares by code point — they agree on
  ASCII only);
- string stats longer than ``_MAX_STR_STATS`` are dropped entirely: a
  truncated max would be an UNSOUND upper bound (delta-spark pads the
  last character up for the same reason; omitting is equally sound and
  simpler);
- NaN poisons float envelopes (parquet row-group stats ignore NaN, so a
  file containing NaN has a min/max that doesn't cover it); float
  columns therefore only prune when the footer guarantees NaN-free
  pages is unknowable → we keep comparisons but treat ``=``/``in`` on
  float NaN values as non-prunable;
- any type mismatch or parse failure → keep the file.
"""

from __future__ import annotations

import datetime as _dt
import json
import math
from typing import Any, Optional, Sequence

from pyspark.sql import types as T

from ..core.filters import Filter

# Delta's spark.databricks.delta.properties.defaults.dataSkippingNumIndexedCols
_DEFAULT_INDEXED_COLS = 32
# Beyond this, string min/max are omitted (see module docstring).
_MAX_STR_STATS = 64

_STATS_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.StringType,
    T.BooleanType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
)


def _jsonable(value: Any, dtype: T.DataType) -> Any:
    """Serialize a stats bound the way Delta's JSON stats do."""
    if value is None:
        return None
    if isinstance(dtype, T.DateType):
        if isinstance(value, _dt.date):
            return value.isoformat()
        return str(value)
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        if isinstance(value, _dt.datetime):
            return value.isoformat()
        return str(value)
    if isinstance(value, float) and not math.isfinite(value):
        return None  # JSON has no Infinity/NaN; drop the bound
    if isinstance(value, bytes):
        return None  # binary stats are not indexed
    return value


def collect_file_stats(
    path: str,
    data_schema: T.StructType,
    indexed_cols: int = _DEFAULT_INDEXED_COLS,
) -> Optional[str]:
    """Aggregate ``path``'s parquet row-group footer statistics into a
    Delta ``add.stats`` JSON string, or None when the footer yields
    nothing usable. Only the first ``indexed_cols`` top-level primitive
    columns of ``data_schema`` are indexed (delta's
    dataSkippingNumIndexedCols default)."""
    try:
        import pyarrow.parquet as pq

        meta = pq.ParquetFile(path).metadata
    except Exception:
        return None

    wanted: dict[str, T.DataType] = {}
    for field in data_schema.fields[:indexed_cols]:
        if isinstance(field.dataType, _STATS_TYPES):
            wanted[field.name] = field.dataType

    num_records = meta.num_rows
    mins: dict[str, Any] = {}
    maxs: dict[str, Any] = {}
    nulls: dict[str, int] = {}
    # a single row group missing a piece of stats poisons only that
    # piece — nullCount can stay exact while min/max is abandoned
    minmax_ok: dict[str, bool] = {n: True for n in wanted}
    nulls_ok: dict[str, bool] = {n: True for n in wanted}

    for rg in range(meta.num_row_groups):
        group = meta.row_group(rg)
        for ci in range(group.num_columns):
            col = group.column(ci)
            # nested columns have dotted path_in_schema; top-level only
            name = col.path_in_schema
            if name not in wanted:
                continue
            stats = col.statistics
            if stats is None:
                minmax_ok[name] = False
                nulls_ok[name] = False
                continue
            if stats.null_count is not None:
                nulls[name] = nulls.get(name, 0) + stats.null_count
            else:
                nulls_ok[name] = False
            if not stats.has_min_max:
                # an all-null row group legitimately has no min/max
                # (ColumnChunkMetaData.num_values counts nulls too)
                if stats.null_count == col.num_values:
                    continue
                minmax_ok[name] = False
                continue
            mn, mx = stats.min, stats.max
            if name in mins:
                try:
                    mins[name] = min(mins[name], mn)
                    maxs[name] = max(maxs[name], mx)
                except TypeError:
                    minmax_ok[name] = False
            else:
                mins[name], maxs[name] = mn, mx

    min_values: dict[str, Any] = {}
    max_values: dict[str, Any] = {}
    null_count: dict[str, int] = {}
    for name, dtype in wanted.items():
        if name in nulls and nulls_ok.get(name):
            null_count[name] = nulls[name]
        if name not in mins or not minmax_ok.get(name):
            continue
        mn, mx = mins[name], maxs[name]
        if isinstance(dtype, T.StringType) and (
            not isinstance(mn, str)
            or not isinstance(mx, str)
            or len(mn) > _MAX_STR_STATS
            or len(mx) > _MAX_STR_STATS
        ):
            continue
        mn_j, mx_j = _jsonable(mn, dtype), _jsonable(mx, dtype)
        if mn_j is None or mx_j is None:
            continue
        min_values[name] = mn_j
        max_values[name] = mx_j

    if not min_values and not null_count:
        return None
    return json.dumps(
        {
            "numRecords": num_records,
            "minValues": min_values,
            "maxValues": max_values,
            "nullCount": null_count,
        },
        default=str,
    )


# -- read side ---------------------------------------------------------------


def _coerce(value: Any, dtype: T.DataType) -> Any:
    """Bring a JSON-decoded stats bound back to a comparable Python value
    for ``dtype``. Returns None when no sound comparison exists."""
    if value is None:
        return None
    if isinstance(dtype, T.DateType):
        if isinstance(value, str):
            try:
                return _dt.date.fromisoformat(value[:10])
            except ValueError:
                return None
        return value if isinstance(value, _dt.date) else None
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        if isinstance(value, str):
            try:
                return _dt.datetime.fromisoformat(value)
            except ValueError:
                return None
        return value if isinstance(value, _dt.datetime) else None
    return value


def _comparable(a: Any, b: Any) -> bool:
    """True when ``a OP b`` is a sound pruning comparison."""
    if a is None or b is None:
        return False
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, str) != isinstance(b, str):
        return False
    if isinstance(a, str):
        # parquet string stats are byte-ordered; Python is code-point
        # ordered. They agree on ASCII — prune only there.
        return a.isascii() and b.isascii()
    if isinstance(b, float) and math.isnan(b):
        return False  # NaN never bounded by row-group stats
    return True


def _filter_possible(
    f: Filter,
    dtype: T.DataType,
    mn: Any,
    mx: Any,
    nulls: Optional[int],
    num_records: Optional[int],
) -> bool:
    """Could any row of a file with envelope [mn, mx] / nulls match
    ``f``? Must err toward True."""
    op, value = f.operator, f.value
    # filter literals for temporal columns arrive as date/datetime OR
    # ISO strings; bring them to the stats' coerced representation
    if isinstance(dtype, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        if isinstance(value, (list, tuple, set)):
            coerced = []
            for v in value:
                if v is None:
                    coerced.append(None)
                    continue
                cv = _coerce(v, dtype)
                if cv is None:
                    if op == "in":
                        return True  # unparseable member might match
                    continue  # "not in": a smaller list only weakens pruning
                coerced.append(cv)
            value = coerced
        elif value is not None:
            value = _coerce(value, dtype)
            if value is None:
                return True

    all_null = (
        nulls is not None
        and num_records is not None
        and num_records > 0
        and nulls >= num_records
    )
    if op == "=" and value is None:
        # isNull semantics (matches delta_table._eval_filter)
        return nulls is None or nulls > 0
    if all_null:
        # Every value is NULL, and NULL satisfies no comparison (SQL
        # three-valued logic: even `!=` yields NULL, not TRUE) — only an
        # explicit null membership can match.
        if op == "in":
            return isinstance(value, (list, tuple, set)) and None in value
        if op in ("=", "!=", "<", "<=", ">", ">=", "not in", "contains"):
            return False
        return True  # unknown operator: never prune
    if mn is None or mx is None:
        return True

    try:
        if op == "=":
            if not _comparable(mn, value):
                return True
            return mn <= value <= mx
        if op == "<":
            return not _comparable(mn, value) or mn < value
        if op == "<=":
            return not _comparable(mn, value) or mn <= value
        if op == ">":
            return not _comparable(mx, value) or mx > value
        if op == ">=":
            return not _comparable(mx, value) or mx >= value
        if op == "in":
            if not isinstance(value, (list, tuple, set)):
                return True
            vals = list(value)
            if None in vals and (nulls is None or nulls > 0):
                return True
            return any(
                not _comparable(mn, v) or (v is not None and mn <= v <= mx)
                for v in vals
            )
        if op == "!=":
            if not _comparable(mn, value):
                return True
            return not (mn == mx == value and (nulls or 0) == 0)
        if op == "not in":
            if not isinstance(value, (list, tuple, set)):
                return True
            if not _comparable(mn, mx):
                return True
            return not (
                mn == mx and mn in value and (nulls or 0) == 0
            )
    except TypeError:
        return True
    return True  # contains / includes*: not index-prunable


def file_may_match(
    stats_json: Optional[str],
    conj: Sequence[Filter],
    data_schema: T.StructType,
) -> bool:
    """Sound per-file test: can a file with these stats satisfy every
    filter of one DNF conjunction? No stats → always True."""
    if not stats_json:
        return True
    try:
        stats = json.loads(stats_json) if isinstance(stats_json, str) else stats_json
    except (ValueError, TypeError):
        return True
    if not isinstance(stats, dict):
        return True
    min_values = stats.get("minValues") or {}
    max_values = stats.get("maxValues") or {}
    null_count = stats.get("nullCount") or {}
    num_records = stats.get("numRecords")
    dtypes = {fld.name: fld.dataType for fld in data_schema.fields}

    for f in conj:
        dtype = dtypes.get(f.column)
        if dtype is None:
            continue  # partition or unknown column: not ours to judge
        mn = _coerce(min_values.get(f.column), dtype)
        mx = _coerce(max_values.get(f.column), dtype)
        nulls = null_count.get(f.column)
        if not _filter_possible(f, dtype, mn, mx, nulls, num_records):
            return False
    return True


def stats_prune(files: list, dnf, data_schema: T.StructType) -> list:
    """Drop files no DNF conjunction can match. ``files`` are AddFile
    records whose ``stats`` attribute carries the add action's JSON
    string (None → kept). Sound by construction: every "don't know"
    path in :func:`file_may_match` keeps the file, and the full
    predicate is re-applied to rows after the scan."""
    if not dnf:
        return files
    return [
        add
        for add in files
        if any(
            file_may_match(getattr(add, "stats", None), conj, data_schema)
            for conj in dnf
        )
    ]
