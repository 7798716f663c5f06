"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 and compares against
oracle_sql() via DuckDB: row count, column-name set, and exact
(order-insensitive) value equality. Exact float equality is intentional —
the engine is engineered for bit-identical results (decimal-exact sums,
portable integer hashing), so any drift is a bug.

Usage: python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    """Type-strict normalization mirroring the driver's hash: an int cell
    and a float cell NEVER compare equal (the driver formats cells before
    hashing, so Spark long 123 vs oracle float 123.0 is a hash mismatch —
    e.g. DuckDB SUM(BIGINT) returning HUGEINT lands in pandas as float64).
    Python equality (123 == 123.0) hid exactly that defect for two rounds.
    """
    import numpy as np

    if v is None:
        return None
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "NaN"
        return ("f", float(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    return v


def dtype_class(dt) -> str:
    s = str(dt)
    if s.lower().startswith(("int", "uint")):
        return "int"
    if s.lower().startswith("float"):
        return "float"
    return "other"


def frame_key(df):
    """pandas DataFrame -> (colnames sorted, per-col dtype classes,
    multiset of normalized rows)."""
    cols = sorted(df.columns)
    dclasses = [dtype_class(df[c].dtype) for c in cols]
    rows = sorted(
        (
            tuple(norm_cell(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)
        ),
        key=repr,  # mixed None/str/float cells aren't mutually orderable
    )
    return cols, dclasses, rows


def main() -> int:
    import __spark_entry__ as e
    from btrdb_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("check", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: spark error: {ex}")
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: oracle error: {ex}")
            continue
        scols, sdts, srows = frame_key(sdf)
        ocols, odts, orows = frame_key(odf)
        status = []
        if scols != ocols:
            status.append(f"schema spark={scols} oracle={ocols}")
        elif sdts != odts:
            bad = [
                f"{c}: spark={a} oracle={b}"
                for c, a, b in zip(scols, sdts, odts)
                if a != b
            ]
            status.append(f"dtype class mismatch ({'; '.join(bad)})")
        if len(srows) != len(orows):
            status.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        elif scols == ocols and srows != orows:
            bad = sum(1 for a, b in zip(srows, orows) if a != b)
            for a, b in zip(srows, orows):
                if a != b:
                    status.append(f"values differ ({bad}/{len(srows)} rows), first: spark={a} oracle={b}")
                    break
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            print(f"OK   {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
