"""Delta Lake source table with the reference's read semantics.

Parity target: reference DeltalakeTable (deltalake_table.py:68-300):
declared schema, DNF *and* raw-SQL-string predicates, column projection
with unique-column read-set widening, ``extra_cols`` computed columns,
``unique_columns`` dedup, schema normalization, empty-result synthesis,
and ``version=`` time travel.

Execution strategy, Spark-first:
  1. If delta-spark is on the classpath, ``spark.read.format("delta")``
     does everything natively (lazy end-to-end, data skipping, versionAsOf).
  2. Otherwise (this environment), a pure-Python log replay
     (:mod:`datarepo_spark.tables.delta_log`) resolves the active file set
     on the driver — exactly what a Delta Snapshot is — after pruning files
     whose ``partitionValues`` can't satisfy the filters. Data is then read
     with Spark's native distributed parquet reader; partition columns are
     restored with a broadcast join on the (globally unique) file name.

Unlike the reference's eager fetchall-then-re-lazy flow (deltalake_table.py
:244-257), both paths stay lazy: nothing executes until an action.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from typing import Any, Optional, Sequence, Union
from urllib.parse import unquote

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core.compile import filters_to_column
from ..core.readconf import apply_parquet_read_compat
from ..core.filters import (
    Filter,
    InputFilters,
    NormalizedFilters,
    normalize_filters,
    validate_filters,
)
from .delta_log import DeltaLog, DeltaSnapshot, cast_partition_value
from .delta_stats import stats_prune
from .metadata import (
    TableColumn,
    TableMetadata,
    TablePartition,
    TableSchema,
    TableType,
)
from .normalize import empty_normalized_df, normalize_df
from .storage import apply_storage_options, get_storage_options
from .parquet_table import _active_spark

ExtraCol = tuple[str, Union[Column, str]]

# DV read-path switch: at or below this many total deleted positions
# (summed descriptor cardinality over the scan's files) the positions
# are parsed driver-side and applied as a broadcast anti-join (fully
# JVM-side); above it each scan task filters against its OWN file's
# bitmap inside an Arrow-batched mapInPandas — positions never touch
# the driver, memory is bounded by one file's DV. Tests monkeypatch
# this to force the distributed path.
DV_BROADCAST_MAX_CARDINALITY = 1_000_000


def _scan_key(path: str, nseg: int) -> str:
    """The driver-side join key matching the scan's ``__delta_rel``
    column: the last ``nseg`` (= partition dirs + filename) segments of
    the DECODED add path. Normalizing to the suffix makes the keying
    identical for relative paths, deeper-nested foreign layouts, and
    the ABSOLUTE paths a shallow clone's log references."""
    segs = unquote(path).split("/")
    return "/".join(segs[-nseg:])


def _dv_filter_map_in_pandas(
    spark: SparkSession, df: DataFrame, table_uri: str, files, nseg: int
) -> DataFrame:
    """Drop soft-deleted rows by per-file bitmap lookup executor-side.

    Ships only {relative path → DV descriptor} (bytes per FILE, not per
    deleted row); each python worker lazily parses the bitmaps for the
    files its batches touch and caches them for the task's lifetime.
    Requires ``__delta_rel`` / ``__delta_pos`` columns on ``df``."""
    dv_map = {
        _scan_key(add.path, nseg): add.deletion_vector
        for add in files
        if add.deletion_vector
    }
    b_dv = spark.sparkContext.broadcast((table_uri, dv_map))
    schema = df.schema

    def _mask(batches):
        import numpy as np

        from datarepo_spark.tables.delta_dv import read_deletion_vector

        uri, descriptors = b_dv.value
        cache: dict = {}
        for pdf in batches:
            rels = pdf["__delta_rel"].to_numpy()
            keep = np.ones(len(pdf), dtype=bool)
            for rel in dict.fromkeys(rels):
                desc = descriptors.get(rel)
                if desc is None:
                    continue
                positions = cache.get(rel)
                if positions is None:
                    positions = np.asarray(
                        read_deletion_vector(uri, desc), dtype=np.int64
                    )
                    cache[rel] = positions
                sel = rels == rel
                keep[sel] = ~np.isin(
                    pdf["__delta_pos"].to_numpy()[sel], positions
                )
            yield pdf[keep]

    return df.mapInPandas(_mask, schema=schema)


@dataclass
class DeltaCacheOptions:
    """The reference's scan-cache knobs (deltalake_table.py:34-65).

    ``file_cache_last_checkpoint_valid_duration`` IS acted on here: it
    becomes the TTL of the driver-side snapshot cache — within the
    window a table call replays no log at all; outside it a hit is
    revalidated with one directory-listing fingerprint check (see
    :meth:`DeltaLog.snapshot`). Accepts ``"300"``/``"300s"``/``"5m"``/
    ``"2h"``. ``file_cache_path`` persists resolved snapshots as JSON
    under that directory (the reference's on-disk cache semantics,
    deltalake_table.py:40-65): a COLD process skips the full log replay
    — it loads the cached snapshot after one fingerprint listing (or
    zero I/O within the TTL). Our write path invalidates the entries on
    commit; entries made stale by other writers fail the fingerprint
    check and fall through to a replay. Object-store retry/timeout
    remain hadoop-aws confs (fs.s3a.attempts.maximum /
    fs.s3a.connection.timeout); the per-call ``timeout`` argument maps
    onto them."""

    file_cache_path: Optional[str] = None
    file_cache_last_checkpoint_valid_duration: Optional[str] = None

    def ttl_seconds(self) -> Optional[float]:
        return parse_duration(self.file_cache_last_checkpoint_valid_duration)


_DURATION_RE = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*(ms|s|m|h|d)?\s*$")
_DURATION_UNITS = {None: 1.0, "ms": 0.001, "s": 1.0, "m": 60.0, "h": 3600.0, "d": 86400.0}


def parse_duration(text: Optional[str]) -> Optional[float]:
    """'300' / '300s' / '5m' / '1.5h' → seconds; None passes through."""
    if text is None:
        return None
    m = _DURATION_RE.match(str(text))
    if not m:
        raise ValueError(f"Unparseable duration: {text!r}")
    return float(m.group(1)) * _DURATION_UNITS[m.group(2)]


def _partition_prune(
    snapshot: DeltaSnapshot, dnf: NormalizedFilters
) -> list:
    """Keep files whose partitionValues might satisfy the DNF. Filters on
    non-partition columns are unknown at this level → treated as TRUE.
    (The full predicate is re-applied to rows afterwards, so this only has
    to be sound, not complete.) With column mapping active,
    partitionValues are keyed by PHYSICAL names (protocol rule)."""
    if not dnf or not snapshot.partition_columns:
        return snapshot.files
    part_cols = set(snapshot.partition_columns)

    def conj_matches(conj: list[Filter], values: dict) -> bool:
        for f in conj:
            if f.column not in part_cols:
                continue
            field = snapshot.partition_field(f.column)
            actual = cast_partition_value(
                values.get(snapshot.physical_name(field)), field.dataType
            )
            if not _eval_filter(actual, f):
                return False
        return True

    return [
        add
        for add in snapshot.files
        if any(conj_matches(conj, add.partition_values) for conj in dnf)
    ]


def _names_differ(
    snapshot: DeltaSnapshot, pf: T.StructField, lf: T.StructField
) -> bool:
    """Does this field (or anything nested in it) need renaming?"""
    if pf.name != lf.name:
        return True

    def dt_differs(pdt: T.DataType, ldt: T.DataType) -> bool:
        if isinstance(ldt, T.StructType):
            return any(
                _names_differ(snapshot, p, l)
                for p, l in zip(pdt.fields, ldt.fields)
            )
        if isinstance(ldt, T.ArrayType):
            return dt_differs(pdt.elementType, ldt.elementType)
        if isinstance(ldt, T.MapType):
            return dt_differs(pdt.keyType, ldt.keyType) or dt_differs(
                pdt.valueType, ldt.valueType
            )
        return False

    return dt_differs(pf.dataType, lf.dataType)


def _remap_to_logical(
    df: DataFrame, snapshot: DeltaSnapshot, keep_rel: bool = False
) -> DataFrame:
    """Rename a column-mapped scan's physical names (col-<uuid>) back to
    the table's logical names, recursing through structs, arrays, and
    map values. Pure projection — whole-stage codegen, no shuffle."""

    def conv(col: Column, pdt: T.DataType, ldt: T.DataType) -> Column:
        if isinstance(ldt, T.StructType):
            rebuilt = F.struct(
                *[
                    conv(col[p.name], p.dataType, l.dataType).alias(l.name)
                    for p, l in zip(pdt.fields, ldt.fields)
                ]
            )
            # struct(...) of a NULL struct yields a row of nulls, not
            # NULL — preserve nullness explicitly
            return F.when(col.isNull(), F.lit(None)).otherwise(rebuilt)
        if isinstance(ldt, T.ArrayType):
            if not isinstance(
                ldt.elementType, (T.StructType, T.ArrayType, T.MapType)
            ):
                return col
            return F.transform(
                col, lambda x: conv(x, pdt.elementType, ldt.elementType)
            )
        if isinstance(ldt, T.MapType):
            if not isinstance(
                ldt.valueType, (T.StructType, T.ArrayType, T.MapType)
            ):
                return col
            return F.transform_values(
                col, lambda _k, v: conv(v, pdt.valueType, ldt.valueType)
            )
        return col

    pdata = snapshot.physical_data_schema
    ldata = snapshot.data_schema
    out: list[Column] = []
    for pf, lf in zip(pdata.fields, ldata.fields):
        if _names_differ(snapshot, pf, lf):
            out.append(
                conv(F.col(f"`{pf.name}`"), pf.dataType, lf.dataType)
                .alias(lf.name)
            )
        else:
            out.append(F.col(f"`{pf.name}`"))
    # partition columns (restored with logical names) and bookkeeping
    # columns pass through untouched
    out.extend(F.col(c) for c in snapshot.partition_columns if c in df.columns)
    if keep_rel and "__delta_rel" in df.columns:
        out.append(F.col("__delta_rel"))
    if "__delta_pos" in df.columns:
        out.append(F.col("__delta_pos"))
    return df.select(*out)


def _eval_filter(actual: Any, f: Filter) -> bool:
    op, value = f.operator, f.value
    if actual is None:
        return op in ("=", "in") and (
            value is None or (op == "in" and None in value)
        )
    try:
        if op == "=":
            return actual == value
        if op == "!=":
            return actual != value
        if op == "<":
            return actual < value
        if op == "<=":
            return actual <= value
        if op == ">":
            return actual > value
        if op == ">=":
            return actual >= value
        if op == "in":
            return actual in value
        if op == "not in":
            return actual not in value
        if op == "contains":
            return str(value) in str(actual)
    except TypeError:
        return True  # incomparable → cannot prune soundly
    return True  # includes* on a partition column: not prunable


class DeltalakeTable:
    def __init__(
        self,
        name: str,
        uri: str,
        schema: Optional[T.StructType] = None,
        unique_columns: Optional[Sequence[str]] = None,
        extra_cols: Sequence[ExtraCol] = (),
        description: str = "",
        docs_filters: Sequence[Filter] = (),
        docs_columns: Optional[Sequence[str]] = None,
        table_metadata: Optional[TableMetadata] = None,
        use_native: Optional[bool] = None,
        boto3_session: Optional[Any] = None,
        endpoint_url: Optional[str] = None,
        storage_options: Optional[dict[str, str]] = None,
    ) -> None:
        self.name = name
        self.uri = uri.rstrip("/")
        self.schema = schema
        self.unique_columns = list(unique_columns or [])
        self.extra_cols = list(extra_cols)
        self.docs_filters = list(docs_filters)
        self.docs_columns = list(docs_columns) if docs_columns else None
        self.use_native = use_native
        # reference deltalake_table.py threads boto3_session/endpoint_url
        # into delta-rs storage_options (util.py:64-100); Spark-side these
        # become per-bucket fs.s3a.* confs (tables/storage.py).
        self.storage_options = dict(storage_options or {})
        if boto3_session is not None or endpoint_url is not None:
            self.storage_options.update(
                get_storage_options(boto3_session, endpoint_url)
            )
        self.table_metadata = table_metadata or TableMetadata(
            table_type=TableType.DELTA.value,
            description=description,
        )

    # -- native availability ------------------------------------------------

    def _native_available(self, spark: SparkSession) -> bool:
        if self.use_native is not None:
            return self.use_native
        try:
            spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
                "org.apache.spark.sql.delta.DeltaLog"
            )
            return True
        except Exception:
            return False

    # -- read ----------------------------------------------------------------

    def __call__(
        self,
        filters: InputFilters = None,
        columns: Optional[Sequence[str]] = None,
        version: Optional[int] = None,
        spark: Optional[SparkSession] = None,
        timeout: Optional[str] = None,
        cache_options: Optional[DeltaCacheOptions] = None,
        boto3_session: Optional[Any] = None,
        endpoint_url: Optional[str] = None,
        storage_options: Optional[dict[str, str]] = None,
        **kwargs: Any,
    ) -> DataFrame:
        # timeout → S3A request-timeout confs; cache_options → snapshot-
        # cache TTL (see DeltaCacheOptions). Per-call
        # boto3_session/endpoint_url/storage_options override the
        # constructor's (reference deltalake_table.py accepts per-call
        # credentials); unknown kwargs raise instead of being swallowed.
        if kwargs:
            raise TypeError(
                f"{type(self).__name__}.__call__ got unknown arguments: "
                f"{sorted(kwargs)}"
            )
        session = _active_spark(spark)
        apply_parquet_read_compat(session)
        effective_storage = dict(self.storage_options)
        if storage_options:
            effective_storage.update(storage_options)
        if boto3_session is not None or endpoint_url is not None:
            effective_storage.update(
                get_storage_options(boto3_session, endpoint_url)
            )
        if effective_storage:
            apply_storage_options(session, effective_storage, self.uri)
        if timeout is not None:
            # reference DEFAULT_TIMEOUT semantics: object-store request
            # timeout, which on Spark is the S3A connection conf (millis)
            millis = int(parse_duration(timeout) * 1000)
            hconf = session.sparkContext._jsc.hadoopConfiguration()
            hconf.set("fs.s3a.connection.timeout", str(millis))
            hconf.set("fs.s3a.connection.request.timeout", str(millis))
        sql_filter: Optional[str] = None
        if isinstance(filters, str):
            # Raw SQL predicate passthrough (reference deltalake_table.py:37,
            # :437-443): the string becomes a Catalyst filter directly.
            sql_filter, dnf = filters, []
        else:
            dnf = normalize_filters(filters)

        if self._native_available(session):
            df, snapshot = self._read_native(session, version), None
        else:
            snapshot = DeltaLog(self.uri).snapshot(
                version,
                cache_ttl=(
                    cache_options.ttl_seconds() if cache_options else None
                ),
                file_cache_path=(
                    cache_options.file_cache_path if cache_options else None
                ),
            )
            df = self._read_from_log(session, snapshot, dnf)
            if df is None:  # no files after pruning → exact-schema empty
                return self._finish(
                    empty_normalized_df(session, self._declared_schema(snapshot)),
                    sql_filter,
                    dnf,
                    columns,
                    session,
                    snapshot,
                )
        return self._finish(df, sql_filter, dnf, columns, session, snapshot)

    def _read_native(
        self, spark: SparkSession, version: Optional[int]
    ) -> DataFrame:
        reader = spark.read.format("delta")
        if version is not None:
            reader = reader.option("versionAsOf", str(version))
        return reader.load(self.uri)

    def _read_from_log(
        self,
        spark: SparkSession,
        snapshot: DeltaSnapshot,
        dnf: NormalizedFilters,
        keep_rel: bool = False,
        keep_pos: bool = False,
    ) -> Optional[DataFrame]:
        """``keep_rel=True`` keeps the ``__delta_rel`` column (each row's
        add.path) — merge_delta uses it to find which files contain
        matched keys, the copy-on-write rewrite unit. ``keep_pos=True``
        additionally keeps ``__delta_pos`` (each LIVE row's physical
        parquet row index) — delete_delta's deletion-vector coordinate."""
        files = _partition_prune(snapshot, dnf)
        # Second pruning axis: each surviving file's add.stats envelope
        # (numRecords/minValues/maxValues/nullCount) vs the same DNF.
        # Partition pruning cuts along the layout; stats pruning cuts
        # WITHIN a partition — on a range-clustered 100 TB table this is
        # what turns "scan the partition" into "open the few files whose
        # min/max overlap the predicate". Sound-only: rows are
        # re-filtered after the scan (_finish), so unknowns keep files.
        # Column mapping: stats keys are physical names — translate the
        # DNF before consulting envelopes.
        mapping = snapshot.column_mapping_mode != "none"
        if mapping:
            phys = snapshot.physical_name_map
            stats_dnf = [
                [Filter(phys.get(f.column, f.column), f.operator, f.value)
                 for f in conj]
                for conj in dnf
            ] if dnf else dnf
            files = stats_prune(files, stats_dnf, snapshot.physical_data_schema)
        else:
            files = stats_prune(files, dnf, snapshot.data_schema)
        if not files:
            return None
        paths = [
            os.path.join(self.uri, unquote(add.path)) for add in files
        ]
        # With column mapping the parquet files carry PHYSICAL column
        # names (col-<uuid>): scan under the physical schema; logical
        # names are rebuilt at every nesting level at the END of this
        # method (after the _metadata-based partition restore, which a
        # projection would sever). Without this the logical-schema scan
        # would resolve no columns and return all-null rows.
        read_schema = (
            snapshot.physical_data_schema if mapping else snapshot.data_schema
        )
        df = spark.read.schema(read_schema).parquet(*paths)
        # Deletion vectors: soft-deleted (file, row_index) pairs must
        # vanish from every read. Capture the parquet row index at scan
        # time and anti-join the broadcast DV position set after the
        # file-path attribution below.
        has_dv = any(add.deletion_vector for add in files)
        if has_dv or keep_pos:
            df = df.withColumn("__delta_pos", F.col("_metadata.row_index"))
        if (keep_rel or has_dv or keep_pos) and not snapshot.partition_columns:
            segs = F.split(F.col("_metadata.file_path"), "/")
            df = df.withColumn(
                "__delta_rel",
                F.url_decode(
                    F.replace(
                        F.element_at(segs, -1), F.lit("+"), F.lit("%2B")
                    )
                ),
            )
        if snapshot.partition_columns:
            # Restore partition columns from partitionValues via a broadcast
            # join keyed on the file's RELATIVE path — the only identifier
            # the protocol guarantees unique (basenames can repeat across
            # partition dirs, e.g. compacted tables writing data.parquet
            # per dir; a basename join would silently duplicate those
            # files' rows). The relative path always has exactly
            # n_partition_cols + 1 segments (one dir per partition column),
            # so it's a fixed-size suffix of _metadata.file_path. Both
            # sides normalize to the ON-DISK name: the driver percent-
            # decodes the protocol's URL-encoded add.path; Spark's
            # file_path is a URI (space→%20, %→%25), decoded with
            # url_decode after guarding literal '+' (URI paths keep '+'
            # verbatim; url_decode would turn it into a space).
            part_fields = [
                snapshot.partition_field(c) for c in snapshot.partition_columns
            ]
            lookup_schema = T.StructType(
                [T.StructField("__delta_rel", T.StringType(), False)]
                + part_fields
            )
            nseg = len(snapshot.partition_columns) + 1
            rows = [
                tuple(
                    [_scan_key(add.path, nseg)]
                    + [
                        cast_partition_value(
                            # column mapping keys partitionValues by
                            # PHYSICAL name (physical_name == f.name
                            # when mapping is off)
                            add.partition_values.get(
                                snapshot.physical_name(f)
                            ),
                            f.dataType,
                        )
                        for f in part_fields
                    ]
                )
                for add in files
            ]
            lookup = spark.createDataFrame(rows, lookup_schema)
            segs = F.split(F.col("_metadata.file_path"), "/")
            rel_uri = F.concat_ws("/", F.slice(segs, -nseg, nseg))
            df = (
                df.withColumn(
                    "__delta_rel",
                    F.url_decode(
                        F.replace(rel_uri, F.lit("+"), F.lit("%2B"))
                    ),
                )
                .join(F.broadcast(lookup), "__delta_rel", "left")
            )
        if has_dv:
            total_card = 0
            card_known = True
            for add in files:
                dv = add.deletion_vector
                if not dv:
                    continue
                card = dv.get("cardinality")
                if card is None:
                    card_known = False
                    break
                total_card += int(card)
            if card_known and total_card <= DV_BROADCAST_MAX_CARDINALITY:
                # small DV set: parse driver-side and broadcast
                # anti-join — data rows never shuffle, plan stays fully
                # JVM-side (no Arrow transit of the data columns)
                from .delta_dv import read_deletion_vector

                dv_nseg = len(snapshot.partition_columns) + 1
                dv_rows = [
                    (_scan_key(add.path, dv_nseg), int(pos))
                    for add in files
                    if add.deletion_vector
                    for pos in read_deletion_vector(
                        self.uri, add.deletion_vector
                    )
                ]
                dv_df = spark.createDataFrame(
                    dv_rows,
                    T.StructType(
                        [
                            T.StructField(
                                "__delta_rel", T.StringType(), False
                            ),
                            T.StructField(
                                "__delta_pos", T.LongType(), False
                            ),
                        ]
                    ),
                )
                df = df.join(
                    F.broadcast(dv_df),
                    ["__delta_rel", "__delta_pos"],
                    "left_anti",
                )
            else:
                # large (or unknown-size) DV set: never materialize the
                # positions on the driver. Deletion vectors are per-FILE
                # and the scan is naturally partitioned by file, so each
                # task filters its own rows against its file's bitmap
                # locally — zero shuffle, zero broadcast of positions;
                # only the tiny per-file DESCRIPTOR map ships (this is
                # delta-spark's own shape: the bitmap is applied inside
                # the scan). Memory is bounded by one file's DV.
                predicate = filters_to_column(dnf)
                if predicate is not None and not (
                    keep_rel or keep_pos or mapping
                ):
                    # mapInPandas blocks pushdown: apply the row filter
                    # BELOW the Python stage so the parquet scan still
                    # skips row groups (idempotently re-applied in
                    # _finish). Skipped when the caller wants raw
                    # positions (delete/update need unmatched rows too)
                    # or names are still physical (mapping).
                    df = df.filter(predicate)
                df = _dv_filter_map_in_pandas(
                    spark, df, self.uri, files,
                    len(snapshot.partition_columns) + 1,
                )
            if not keep_pos:
                df = df.drop("__delta_pos")
        if "__delta_rel" in df.columns and not (keep_rel or keep_pos):
            df = df.drop("__delta_rel")
        if mapping:
            df = _remap_to_logical(df, snapshot, keep_rel=keep_rel)
        return df

    # -- post-read semantics ---------------------------------------------------

    def _declared_schema(self, snapshot: Optional[DeltaSnapshot]) -> T.StructType:
        if self.schema is not None:
            return self.schema
        if snapshot is not None:
            return snapshot.schema
        raise ValueError(f"No schema available for Delta table {self.name}")

    def _finish(
        self,
        df: DataFrame,
        sql_filter: Optional[str],
        dnf: NormalizedFilters,
        columns: Optional[Sequence[str]],
        spark: SparkSession,
        snapshot: Optional[DeltaSnapshot],
    ) -> DataFrame:
        schema = self._declared_schema(snapshot)
        extra_names = [name for name, _ in self.extra_cols]
        schema_names = [f.name for f in schema.fields]
        known = schema_names + extra_names
        # Filters may only reference stored columns (the reference compiles
        # them into the scan's WHERE, where extra_cols don't exist yet).
        if dnf:
            validate_filters(dnf, schema_names)

        # Predicates run against the full stored schema BEFORE projection,
        # so they may reference unselected columns — same as SQL's
        # SELECT cols WHERE pred (reference deltalake_table.py:232-243).
        # Partition pruning above was only sound, not complete — the full
        # filter is re-applied at row level here.
        if sql_filter:
            df = df.filter(sql_filter)
        predicate = filters_to_column(dnf)
        if predicate is not None:
            df = df.filter(predicate)

        # Read-set widening (reference deltalake_table.py:222-237): dedup
        # keys must be present while deduping even if the caller didn't
        # select them; trimmed again at the end.
        selected = list(columns) if columns is not None else known
        for c in selected:
            if c not in known:
                raise ValueError(
                    f"Column {c!r} not in schema (available: {known})"
                )
        read_set = [c for c in selected if c not in extra_names]
        for c in self.unique_columns:
            if c not in read_set and c in schema_names:
                read_set.append(c)

        df = normalize_df(df, schema, read_set)

        # extra_cols: computed, schema-readonly columns
        # (reference deltalake_table.py:83,222-229,263-264).
        for name, expr in self.extra_cols:
            if name in selected:
                col = F.expr(expr) if isinstance(expr, str) else expr
                df = df.withColumn(name, col)

        # Dedup by unique key. Reference keeps first-in-scan-order
        # (deltalake_table.py:266-279); scan order is not defined across
        # distributed files, so semantics here are documented "any row per
        # key" — same contract the reference's own sorted-compare tests
        # actually rely on.
        if self.unique_columns:
            df = df.dropDuplicates(self.unique_columns)

        return df.select(*selected)

    # -- introspection ----------------------------------------------------------

    def get_schema(self, spark: Optional[SparkSession] = None) -> TableSchema:
        try:
            snapshot: Optional[DeltaSnapshot] = DeltaLog(self.uri).snapshot()
        except Exception:
            snapshot = None
        schema = self._declared_schema(snapshot)
        part_cols = snapshot.partition_columns if snapshot else []
        columns = [
            TableColumn(column=f.name, type=f.dataType.simpleString())
            for f in schema.fields
            if f.name not in part_cols
        ]
        for name, _ in self.extra_cols:
            columns.append(TableColumn(column=name, type="computed", readonly=True))
        partitions = [
            TablePartition(
                column_name=c,
                type_annotation=(
                    snapshot.partition_field(c).dataType.simpleString()
                    if snapshot
                    else "string"
                ),
            )
            for c in part_cols
        ]
        return TableSchema(columns=columns, partitions=partitions)
