"""Dump .explain('formatted') for the paths r13 touched, into plans/r13/.

Usage: python tools/capture_plans_r13.py {before|after} [query ...]
  before — run against the pre-change package materialized in
           /tmp/repo_r13_before (git archive of the commit named in
           PREP below), naming files *_before.txt
  after  — run against /root/repo, naming files *_after.txt

Default capture set:
  raw_values — representative memoized-read declared query for the O(1)
    mutation-stamp change (bc651c6). The stamp work is driver-side
    memo-keying only, so before/after plans are expected IDENTICAL
    (modulo plan ids); the committed pair is the proof of that claim.

PREP for 'before':
  cd /tmp && rm -rf repo_r13_before && mkdir repo_r13_before &&
  git -C /root/repo archive 4b22937 | tar -x -C repo_r13_before
"""

import io
import os
import sys

from contextlib import redirect_stdout

MODE = sys.argv[1] if len(sys.argv) > 1 else "after"
QUERIES = sys.argv[2:] or ["raw_values"]
REPO = "/tmp/repo_r13_before" if MODE == "before" else "/root/repo"
sys.path.insert(0, REPO)
OUT = "/root/repo/plans/r13"
os.makedirs(OUT, exist_ok=True)

SF = "/root/testdata/sf0.001"


def main() -> None:
    import __spark_entry__ as entrymod

    from btrdb_spark.session import get_spark

    spark = get_spark(f"plans_r13_{MODE}", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in QUERIES:
        df = qs[name](spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(OUT, f"{name}_{MODE}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {name}_{MODE}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
