"""Driver simulation: plain SparkSession (none of the engine confs),
entry() smoke check, then a sample of queries vs their DuckDB oracles
with the driver's order-insensitive exact comparison."""
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("DRIVE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entrymod

df = entrymod.entry(spark)
n = df.count()
assert n > 0, "entry() returned 0 rows"
print(f"entry(): {n} rows, schema: {df.schema.simpleString()[:120]}")

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
    )

queries = entrymod.queries()
oracles = entrymod.oracle_sql()
names = sys.argv[1:] if len(sys.argv) > 1 else None
if not names:
    rng = random.Random(44)
    names = rng.sample(sorted(oracles), 12)
    # always include the newest queries
    for extra in (
        "ivm_topk_by_status",
        "streaming_dedup_first_twin",
        "streaming_stream_static_twin",
        "graph_common_neighbors",
        "events_peak_concurrency",
        "profile_spearman_rank",
    ):
        if extra in oracles and extra not in names:
            names.append(extra)

def _key(row):
    # None-safe total order (rollup/cube emit NULL group keys)
    return tuple((v is None, str(v)) for v in row)


fails = []
for name in names:
    try:
        sdf = queries[name](spark, SF_DIR)
        cols = sorted(sdf.columns)
        srows = sorted(
            (tuple(r[c] for c in cols) for r in sdf.collect()), key=_key
        )
        # fetchall(), NOT fetchdf(): pandas coerces nullable int columns
        # to float64 (None -> NaN, 14 -> 14.0), false-alarming every row
        # of queries like set_union_all_drift; native fetch keeps None
        # as None and ints as ints, like the driver's value hash.
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        assert sorted(ocols) == cols, (
            f"schema: spark {cols} vs oracle {sorted(ocols)}"
        )
        idx = [ocols.index(c) for c in cols]
        orows = sorted(
            (tuple(row[i] for i in idx) for row in cur.fetchall()),
            key=_key,
        )
        if len(srows) != len(orows):
            raise AssertionError(f"rows: {len(srows)} vs {len(orows)}")
        mism = sum(1 for a, b in zip(srows, orows) if a != b)
        # exact tuple compare can false-alarm on pandas NaN/None; only
        # flag if actual values differ as strings too
        if mism:
            mism2 = sum(
                1
                for a, b in zip(srows, orows)
                if [str(x) for x in a] != [str(y) for y in b]
            )
            if mism2:
                raise AssertionError(f"{mism2} mismatched rows")
        print(f"  OK {name} ({len(srows)} rows)")
    except Exception as exc:
        fails.append((name, exc))
        print(f"  FAIL {name}: {exc}")

if fails:
    sys.exit(1)
print("driver-sim: all green")
