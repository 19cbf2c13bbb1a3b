"""Gate forensics (VERDICT r9 #1b): freeze a rows-level snapshot of the
driver window so a red CORRECTNESS row becomes a DIFFABLE artifact.

For every query in the driver's gate window (the first N ``queries()``
entries, N=50), run BOTH the Spark query (plain driver-style session)
and the DuckDB oracle at sf0.01, canonicalize exactly the way the
driver's value hash does (sort columns by name, sort row tuples, repr
every value), and record:

- ``spark_hash`` / ``oracle_hash``: sha256 over the canonical rows
- ``rows``: row count on each side
- ``schema``: the sorted column list with Spark-side types
- ``sample``: the first 3 canonical rows from each side (repr'd), so a
  later mismatch shows actual values, not just a hash bit

Output: GATE_SNAPSHOT_r{N}.json at the repo root (pass the round as
argv[1], default "10"). If a driver gate later reports a red row for a
query whose snapshot shows spark_hash == oracle_hash, the snapshot
pins what THIS environment computed row-by-row — the diff against the
driver's artifact names the divergence (value rendering, library
version, row set) instead of leaving an unreproducible bit.

Usage: python tools/gate_forensics.py [round] [n_window]
"""

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _key(row):
    # None-safe total order (rollup/cube emit NULL group keys)
    return tuple((v is None, str(v)) for v in row)


def _canon_hash(rows):
    """sha256 over str()-canonicalized sorted rows — the same value
    canonicalization tools/drive_driver.py passes/fails on, so a hash
    equality here is exactly 'the driver-sim would call these equal'."""
    h = hashlib.sha256()
    for r in rows:
        h.update(
            repr(tuple("\0" if v is None else str(v) for v in r)).encode()
        )
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "10"
    n_window = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    window = list(queries)[:n_window]

    out = {
        "round": rnd,
        "sf_dir": SF_DIR,
        "generated_unix": int(time.time()),
        "window": window,
        "queries": {},
    }
    n_mismatch = 0
    for name in window:
        rec = {}
        try:
            sdf = queries[name](spark, SF_DIR)
            cols = sorted(sdf.columns)
            typed = {
                f.name: f.dataType.simpleString() for f in sdf.schema.fields
            }
            srows = sorted(
                (tuple(r[c] for c in cols) for r in sdf.collect()),
                key=_key,
            )
            rec["schema"] = {c: typed[c] for c in cols}
            rec["spark_rows"] = len(srows)
            rec["spark_hash"] = _canon_hash(srows)
            rec["spark_sample"] = [
                [repr(v) for v in r] for r in srows[:3]
            ]
            if name in oracles:
                cur = con.execute(oracles[name])
                ocols = [d[0] for d in cur.description]
                idx = [ocols.index(c) for c in cols]
                orows = sorted(
                    (tuple(row[i] for i in idx) for row in cur.fetchall()),
                    key=_key,
                )
                rec["oracle_rows"] = len(orows)
                rec["oracle_hash"] = _canon_hash(orows)
                rec["oracle_sample"] = [
                    [repr(v) for v in r] for r in orows[:3]
                ]
                rec["match"] = rec["spark_hash"] == rec["oracle_hash"]
                if not rec["match"]:
                    n_mismatch += 1
                    # record the first differing row so the mismatch is
                    # immediately readable without recomputation
                    for a, b in zip(srows, orows):
                        if [str(x) for x in a] != [str(y) for y in b]:
                            rec["first_diff"] = {
                                "spark": [repr(v) for v in a],
                                "oracle": [repr(v) for v in b],
                            }
                            break
            else:
                rec["oracle_rows"] = None
                rec["match"] = None
        except Exception as exc:  # snapshot must record, not die
            rec["error"] = f"{type(exc).__name__}: {exc}"
            n_mismatch += 1
        out["queries"][name] = rec
        tag = rec.get("match")
        print(f"  {'OK ' if tag else ('??' if tag is None else 'DIFF')} "
              f"{name} ({rec.get('spark_rows')} rows)")

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"GATE_SNAPSHOT_r{rnd}.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {path}; value-mismatches/errors: {n_mismatch}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
