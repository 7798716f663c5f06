"""r13 exact_substring_spans A/B (VERDICT r12 #5): replace the
token-array-carrying positional explode + gram-hash groupBy + join-back
with cheaper shapes, alternated in fresh JVMs on the bench probe's own
corpus (200k 50-word docs, 2% exact-dup fraction).

Variants:
  v1_current    — shipped kernel (dedup.exact_substring_spans)
  v2_transform  — gram hashes computed INSIDE one transform() over the
                  position sequence, posexplode of the long array: the
                  Generate no longer copies the whole token array per
                  output row (guide §2.3 "project before the exchange" /
                  per-task work §1.2-2)
  v3_window     — v2 + duplicate detection via count().over(partitionBy
                  gh) instead of groupBy+join-back: one shuffle of occ
                  serves both, and the second tokenize+hash pass for the
                  join side disappears (guide §2.4)
  v4_interval   — v3 + coverage via per-doc interval union (lead window)
                  instead of explode(k positions)+distinct: work per dup
                  occurrence drops from k exploded rows + distinct
                  shuffle to one windowed row (guide §2.3 aggregate
                  before you shuffle)

Usage: python tools/prof_substring_r13.py [variant ...]
(no args = all four, alternated v1,v4,v1,v4,v2,v3 to price the headline
pair back-to-back). Each variant runs in a fresh JVM via subprocess.
"""

import os
import subprocess
import sys
import time

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

K = 8


def make_docs(spark, n_docs=200_000):
    eff = F.when(F.col("id") % 50 == 0, F.col("id") + 1).otherwise(F.col("id"))
    words = F.transform(
        F.sequence(F.lit(0), F.lit(49)),
        lambda i: F.concat(F.lit("w"), ((eff * 53 + i * 7919) % 9973).cast("string")),
    )
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text")
    ).cache()
    docs.count()
    return docs


def v1_current(docs: DataFrame) -> DataFrame:
    from btrdb_spark.functions import dedup as dd

    return dd.exact_substring_spans(docs, k=K)


def _occ_v2(docs: DataFrame, k: int):
    toks = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    ).select("doc_id", F.col("toks"), F.size(F.col("toks")).alias("n"))
    pos_seq = F.when(
        F.col("n") >= k, F.sequence(F.lit(1), F.col("n") - k + 1)
    ).otherwise(F.array().cast("array<int>"))
    gh_arr = F.transform(
        pos_seq,
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(F.col("toks"), i, F.lit(k)))),
    )
    occ = toks.select(
        "doc_id", F.posexplode(gh_arr).alias("pos0", "gh")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "gh")
    return toks, occ


def v2_transform(docs: DataFrame) -> DataFrame:
    k = K
    toks, occ = _occ_v2(docs, k)
    dup = occ.groupBy("gh").agg(F.count(F.lit(1)).alias("cnt")).filter(F.col("cnt") > 1)
    dup_occ = occ.join(dup.select("gh"), "gh")
    cov = (
        dup_occ.select(
            "doc_id", F.explode(F.sequence(F.col("pos"), F.col("pos") + k - 1)).alias("p")
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("dup_tokens"))
    )
    return _finish(toks, cov)


def v3_window(docs: DataFrame) -> DataFrame:
    k = K
    toks, occ = _occ_v2(docs, k)
    wg = Window.partitionBy("gh")
    dup_occ = (
        occ.withColumn("cnt", F.count(F.lit(1)).over(wg))
        .filter(F.col("cnt") > 1)
        .drop("cnt")
    )
    cov = (
        dup_occ.select(
            "doc_id", F.explode(F.sequence(F.col("pos"), F.col("pos") + k - 1)).alias("p")
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("dup_tokens"))
    )
    return _finish(toks, cov)


def v4_interval(docs: DataFrame) -> DataFrame:
    k = K
    toks, occ = _occ_v2(docs, k)
    wg = Window.partitionBy("gh")
    dup_occ = (
        occ.withColumn("cnt", F.count(F.lit(1)).over(wg))
        .filter(F.col("cnt") > 1)
        .drop("cnt")
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    cov = (
        dup_occ.select(
            "doc_id",
            F.coalesce(
                F.least(F.lit(k), F.lead("pos").over(wd) - F.col("pos")), F.lit(k)
            ).alias("contrib"),
        )
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("dup_tokens"))
    )
    return _finish(toks, cov)


def _finish(toks: DataFrame, cov: DataFrame) -> DataFrame:
    return (
        toks.select("doc_id", "n")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_tokens"),
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias("dup_tokens"),
            (
                F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("double")
                / F.col("n").cast("double")
            ).alias("dup_frac"),
        )
    )


def v5_reuse(docs: DataFrame) -> DataFrame:
    """Phase attribution showed ~1.26s of p3_join is the occ RECOMPUTE
    (two consumers: the dup groupBy and the join probe side) and ~0.6s
    of the final step re-tokenizes for (doc_id, n). v5 materializes the
    narrow occ (doc_id long, pos int, gh long) once via localCheckpoint
    (guide §5 lineage cut — same fold as the r12 AnnIndex tally) and
    derives n_tokens by counting separators (no token array)."""
    k = K
    n_cheap = (
        F.length(F.col("text"))
        - F.length(F.regexp_replace(F.col("text"), " ", ""))
        + F.lit(1)
    )
    toks = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    ).select("doc_id", F.col("toks"), F.size(F.col("toks")).alias("n"))
    pos_seq = F.when(
        F.col("n") >= k, F.sequence(F.lit(1), F.col("n") - k + 1)
    ).otherwise(F.array().cast("array<int>"))
    occ = toks.select("doc_id", F.explode(pos_seq).alias("pos"), F.col("toks")).select(
        "doc_id",
        "pos",
        F.xxhash64(F.concat_ws(" ", F.slice(F.col("toks"), F.col("pos"), k))).alias("gh"),
    ).localCheckpoint()
    dup = occ.groupBy("gh").agg(F.count(F.lit(1)).alias("cnt")).filter(F.col("cnt") > 1)
    dup_occ = occ.join(dup.select("gh"), "gh")
    cov = (
        dup_occ.select(
            "doc_id", F.explode(F.sequence(F.col("pos"), F.col("pos") + k - 1)).alias("p")
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("dup_tokens"))
    )
    base = docs.select("doc_id", n_cheap.cast("int").alias("n"))
    return _finish(base, cov)


VARIANTS = {
    "v1_current": v1_current,
    "v2_transform": v2_transform,
    "v3_window": v3_window,
    "v4_interval": v4_interval,
    "v5_reuse": v5_reuse,
}


def run_variant(name: str) -> None:
    sys.path.insert(0, "/root/repo")
    from btrdb_spark.session import get_spark

    spark = get_spark(f"prof_sub_{name}", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = make_docs(spark)
    fn = VARIANTS[name]
    # untimed JIT/codegen warm-up on a small slice (bench protocol)
    fn(docs.limit(5000)).write.format("noop").mode("overwrite").save()
    reps = []
    for i in range(4):
        spark.sparkContext.setJobDescription(f"substring {name} rep{i}")
        t0 = time.time()
        fn(docs).write.format("noop").mode("overwrite").save()
        reps.append(time.time() - t0)
        print(f"  rep{i}: {reps[-1]:.2f}s", flush=True)
        if i >= 1:
            lo1, lo2 = sorted(reps)[:2]
            if lo2 <= lo1 * 1.2:
                break
    # cross-variant result parity on the fixture corpus (exact rows)
    n_diff = (
        fn(docs).exceptAll(v1_current(docs)).count()
        + v1_current(docs).exceptAll(fn(docs)).count()
        if name != "v1_current"
        else 0
    )
    print(
        f"{name}: floor={min(reps):.2f}s -> {200_000/min(reps)/1e3:.1f}k docs/s"
        f"  reps={[round(r, 2) for r in reps]}  rows_diff_vs_v1={n_diff}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    names = sys.argv[1:] or ["v1_current", "v4_interval", "v1_current", "v4_interval", "v2_transform", "v3_window"]
    if len(names) == 1:
        run_variant(names[0])
    else:
        for nm in names:
            subprocess.run([sys.executable, __file__, nm], check=False)
            time.sleep(10)
