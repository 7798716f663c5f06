"""r13: phase attribution for exact_substring_spans v1 (the A/B in
prof_substring_r13.py showed the shipped shape beats all three JVM
restructures — this tool asks WHERE its time goes before deciding
whether an Arrow kernel for the gram-hash pass is worth building).

Phases (each noop-sunk, cumulative prefixes of the v1 pipeline):
  p0_tokenize   docs -> toks(doc_id, toks, n)
  p1_occ        + position explode + gram xxhash64
  p2_dup        + groupBy(gh).count.filter(>1)
  p3_join       + occ join dup
  p4_cov        + coverage explode + distinct + per-doc count
  p5_full       the full operator (== bench probe)
"""

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from btrdb_spark.session import get_spark
from tools.prof_substring_r13 import make_docs

K = 8


def phases(docs):
    n = F.size(F.col("toks"))
    toks = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    ).select("doc_id", F.col("toks"), n.alias("n"))
    pos_seq = F.when(
        F.col("n") >= K, F.sequence(F.lit(1), F.col("n") - K + 1)
    ).otherwise(F.array().cast("array<int>"))
    occ = toks.select("doc_id", F.explode(pos_seq).alias("pos"), F.col("toks")).select(
        "doc_id",
        "pos",
        F.xxhash64(F.concat_ws(" ", F.slice(F.col("toks"), F.col("pos"), K))).alias("gh"),
    )
    dup = occ.groupBy("gh").agg(F.count(F.lit(1)).alias("cnt")).filter(F.col("cnt") > 1)
    dup_occ = occ.join(dup.select("gh"), "gh")
    cov = (
        dup_occ.select(
            "doc_id", F.explode(F.sequence(F.col("pos"), F.col("pos") + K - 1)).alias("p")
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("dup_tokens"))
    )
    from btrdb_spark.functions import dedup as dd

    return {
        "p0_tokenize": toks,
        "p1_occ": occ,
        "p2_dup": dup,
        "p3_join": dup_occ,
        "p4_cov": cov,
        "p5_full": dd.exact_substring_spans(docs, k=K),
    }


def main():
    spark = get_spark("prof_sub_phases", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = make_docs(spark)
    ph = phases(docs)
    # warm-up every phase once on a slice
    for nm, df in phases(docs.limit(5000)).items():
        df.write.format("noop").mode("overwrite").save()
    res = {}
    for nm, df in ph.items():
        reps = []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"{nm} rep{i}")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            reps.append(time.time() - t0)
            if i >= 1 and sorted(reps)[1] <= sorted(reps)[0] * 1.2:
                break
        res[nm] = min(reps)
        print(f"{nm}: floor={min(reps):.2f}s reps={[round(r,2) for r in reps]}", flush=True)
    print({k: round(v, 2) for k, v in res.items()}, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
