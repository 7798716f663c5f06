"""Profile a subset of declared queries with bench.py's exact
methodology (noop sink, rep floors), for A/B isolation of per-entry
regressions in the r12 window. Usage:

    python tools/prof_queries_r12.py [--reps N] name [name ...]

Honors BTRDB_SPARK_LOCAL_DIR (so the shm-only vs shm+disk-pair scratch
election can be A/B'd without code edits), SPARK_GRAFT_SF_DIR and
SPARK_GRAFT_CPUS like bench.py. Prints one JSON line per query:
{"query": name, "reps": [...], "floor": min}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    reps_n = 4
    if args and args[0] == "--reps":
        reps_n = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 8)

    import __spark_entry__ as entrymod
    from btrdb_spark.session import get_spark

    spark = get_spark("btrdb_prof_queries", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # same warm-up as bench.py
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(1000).groupBy().count().count()
    import pandas as _pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf as _pudf

    _warm = _pudf(lambda s: s, "long")
    spark.range(1000).select(_warm("id")).write.format("noop").mode("overwrite").save()

    qs = entrymod.queries()
    for name in args:
        fn = qs[name]
        reps: list[float] = []
        for _ in range(reps_n):
            spark.sparkContext.setJobDescription(f"prof:{name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            reps.append(round(time.time() - t0, 3))
        print(
            json.dumps({"query": name, "reps": reps, "floor": min(reps)}),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
