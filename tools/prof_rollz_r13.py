"""r13 A/B: rolling_zscore sliding frame vs exact prefix-difference.

Shipped: three aggregates (count, sum(dec), sum(dec2)) over a 20-row
sliding ROWS frame. Spark's SlidingWindowFunctionFrame has no retract
path — it re-evaluates the aggregate over the whole frame every time the
frame moves, so the window stage does O(n * w) decimal additions
(decimal(38,6) is the slow >18-digit representation).

Candidate: running (UNBOUNDED PRECEDING) sums are incremental O(n) in
Spark; the frame sum is the difference of two exact decimals —
bit-identical as long as NULL semantics are preserved:
  n        = least(row_number, w)            (frame row count)
  cnt_nn   = running count(dec) - lag(running count, w, 0)
  s_frame  = when(cnt_nn > 0, running sum - coalesce(lag(running sum, w), 0))
(the `when` guard reproduces sum's NULL-on-all-null-frame behavior even
when earlier rows held values; decimal arithmetic is exact so the
difference equals the frame sum digit-for-digit, and the cast to double
of equal decimals is the identical double).

Equivalence proven with exceptAll both ways before timing.

Usage: python tools/prof_rollz_r13.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F
from pyspark.sql import DataFrame, Window


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def floor_of(fn, reps: int = 3) -> float:
    out = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        out.append(time.time() - t0)
    return min(out)


def rolling_zscore_prefix(points: DataFrame, window_rows: int = 20) -> DataFrame:
    wr = window_rows
    ord_w = Window.partitionBy("uuid").orderBy("time", "value")
    cum = ord_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec = F.col("value").cast("decimal(38,6)")
    dec2 = (F.col("value") * F.col("value")).cast("decimal(38,6)")

    rn = F.row_number().over(ord_w)
    rs = F.sum(dec).over(cum)
    rss = F.sum(dec2).over(cum)
    rc = F.count(dec).over(cum)

    base = points.select(
        "uuid", "time", "value",
        rn.alias("_rn"), rs.alias("_rs"), rss.alias("_rss"), rc.alias("_rc"),
    )
    zero = F.lit(0).cast("decimal(38,6)")
    lag_rs = F.coalesce(F.lag("_rs", wr).over(ord_w), zero)
    lag_rss = F.coalesce(F.lag("_rss", wr).over(ord_w), zero)
    lag_rc = F.coalesce(F.lag("_rc", wr).over(ord_w), F.lit(0))
    n = F.least(F.col("_rn"), F.lit(wr))
    cnt_nn = F.col("_rc") - lag_rc
    s = F.when(cnt_nn > 0, (F.col("_rs") - lag_rs)).cast("double")
    ss = F.when(cnt_nn > 0, (F.col("_rss") - lag_rss)).cast("double")
    m = s / n
    var = (ss - s * m) / (n - F.lit(1))
    z = F.when(
        (n >= wr) & (var > 0), (F.col("value") - m) / F.sqrt(var)
    )
    return base.select(
        "uuid", "time", "value",
        n.cast("long").alias("n_window"),
        m.alias("mean_w"),
        z.alias("z"),
    ).orderBy("uuid", "time", "value")


def main() -> None:
    import __spark_entry__ as entrymod  # noqa: F401
    from btrdb_spark.session import get_spark
    from btrdb_spark.sources.tables import events_as_points
    from btrdb_spark.operators import resample as rs_ops

    spark = get_spark("prof_rollz_r13", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    pts = events_as_points(spark, sf)
    print("points rows:", pts.count(), flush=True)

    a = rs_ops.rolling_zscore(pts, window_rows=20)
    b = rolling_zscore_prefix(pts, window_rows=20)
    d1, d2 = a.exceptAll(b).count(), b.exceptAll(a).count()
    print(f"equivalence: exceptAll {d1}/{d2} (must be 0/0)", flush=True)

    spark.sparkContext.setJobDescription("rollz shipped warm")
    noop(rs_ops.rolling_zscore(pts, window_rows=20))
    spark.sparkContext.setJobDescription("rollz shipped")
    t1 = floor_of(lambda: noop(rs_ops.rolling_zscore(pts, window_rows=20)))
    spark.sparkContext.setJobDescription("rollz prefix")
    t2 = floor_of(lambda: noop(rolling_zscore_prefix(pts, window_rows=20)))
    spark.sparkContext.setJobDescription("rollz shipped 2")
    t3 = floor_of(lambda: noop(rs_ops.rolling_zscore(pts, window_rows=20)))
    spark.sparkContext.setJobDescription("rollz prefix 2")
    t4 = floor_of(lambda: noop(rolling_zscore_prefix(pts, window_rows=20)))
    print(f"rolling_zscore: shipped={t1:.3f}/{t3:.3f}s prefix={t2:.3f}/{t4:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
