"""r13 A/B: stream_correlations_topk_lsh coefficient-array build.

Shipped shape (correlate._topk_lsh_from_bucket_means): distinct buckets
crossJoin 64 plane ids -> md5 coef per (bucket, j) row -> groupBy(bucket)
collect_list/array_sort -> per-bucket array. That is one full shuffle of
(#buckets x P*T) rows plus a 64x crossJoin fan-out, feeding a broadcast.

Candidate: per-bucket transform(sequence(0, P*T-1)) computes the same 64
md5 coefficients INLINE per distinct bucket — zero crossJoin, zero
shuffle. Risk (measured here): higher-order functions are interpreted,
not codegen'd (the r13 substring v2 lesson), so the md5 expression may
run slower per element than the shuffled form.

Both sides' outputs are proven identical (exceptAll both ways) before
timing. Phases also timed: m materialization, signature fold, candidate
join, Pearson tail — cumulative noop-sunk prefixes of the full operator.

Usage: python tools/prof_corr_coef_r13.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def floor_of(fn, reps: int = 3) -> float:
    out = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        out.append(time.time() - t0)
    return min(out)


def coef_of(bucket_col, j_col):
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "_",
                        bucket_col.cast("string"),
                        j_col.cast("string"),
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        - F.lit(1 << 15)
    )


def main() -> None:
    import __spark_entry__ as entrymod  # noqa: F401  (sys.path side effects)
    from btrdb_spark.session import get_spark
    from btrdb_spark.sources.tables import events_as_points
    from btrdb_spark.operators import correlate

    spark = get_spark("prof_corr_coef_r13", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    P, T = 8, 8

    pts = events_as_points(spark, sf)
    width = 1 << 42
    from btrdb_spark.functions import decsum
    from btrdb_spark.functions.timeops import bucket_start

    m = (
        pts.withColumn("bucket", bucket_start(F.col("time"), width))
        .groupBy("uuid", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"), *decsum.sum_aggs(F.col("value")))
        .select(
            "uuid",
            "bucket",
            F.floor(
                (decsum.vsum().cast("double") / F.col("cnt")) * F.lit(correlate._Q)
            ).cast("long").alias("mq"),
        )
    ).localCheckpoint()
    print("m rows:", m.count(), " distinct buckets:", m.select("bucket").distinct().count(), flush=True)

    # shipped coef build
    jd = spark.range(P * T).select(F.col("id").cast("int").alias("j"))

    def shipped():
        return (
            m.select("bucket").distinct()
            .crossJoin(F.broadcast(jd))
            .select("bucket", "j", coef_of(F.col("bucket"), F.col("j")).alias("c"))
            .groupBy("bucket")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "c"))),
                    lambda x: x["c"],
                ).alias("cs")
            )
        )

    def candidate():
        return (
            m.select("bucket").distinct()
            .select(
                "bucket",
                F.transform(
                    F.sequence(F.lit(0), F.lit(P * T - 1)),
                    lambda j: coef_of(F.col("bucket"), j),
                ).alias("cs"),
            )
        )

    a, b = shipped(), candidate()
    d1 = a.exceptAll(b).count()
    d2 = b.exceptAll(a).count()
    print(f"equivalence: exceptAll {d1}/{d2} (must be 0/0)", flush=True)

    spark.sparkContext.setJobDescription("coef shipped")
    t_ship = floor_of(lambda: noop(shipped()))
    spark.sparkContext.setJobDescription("coef candidate")
    t_cand = floor_of(lambda: noop(candidate()))
    spark.sparkContext.setJobDescription("coef shipped 2")
    t_ship2 = floor_of(lambda: noop(shipped()))
    print(f"coef build: shipped={t_ship:.3f}/{t_ship2:.3f}s candidate={t_cand:.3f}s", flush=True)

    # full-operator A/B: monkeypatch-free — run the declared query twice
    q = entrymod.queries()["stream_correlations_topk_lsh"]
    spark.sparkContext.setJobDescription("full operator")
    noop(q(spark, sf))  # warm
    t_full = floor_of(lambda: noop(q(spark, sf)))
    print(f"full stream_correlations_topk_lsh: {t_full:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
