"""Fleet-scale probe for stream_correlations (verdict r8 #6): measure
the exact all-pairs plan and the LSH-pruned top-k plan as the stream
count grows, to locate the S^2 cliff and demonstrate the escape.

Ladder: full all-pairs at 1x and 4x streams (pair rows scale ~R^2:
7.6M -> ~121M at the sf0.1 fixture); LSH top-k additionally at 10x
(~757M pair rows for the exact plan — the point where all-pairs stops
being a sane interactive query on one node). Also reports LSH recall:
the fraction of each stream's exact top-1 partner recovered by the
pruned plan at 1x.

Stream replication is deterministic: each fixture stream (user_id)
spawns R copies uuid = "<user_id>#<r>" with values shifted by a
per-replica affine tweak (value * (1 + r/64) + r), preserving nonzero
variance so the zero-variance prefilter removes nothing — worst case
for the pair fan-out.

Run: python tools/prof_corr.py  (sf0.1 fixture, local[32])
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from btrdb_spark.session import get_spark
from btrdb_spark.sources.tables import events_as_points
from btrdb_spark.operators import correlate

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated_points(spark, r):
    pts = events_as_points(spark, SF)
    if r == 1:
        return pts
    reps = F.array(*[F.lit(i) for i in range(r)])
    return (
        pts.select("uuid", "time", "value", F.explode(reps).alias("_r"))
        .select(
            F.concat_ws("#", "uuid", F.col("_r").cast("string")).alias("uuid"),
            "time",
            (
                F.col("value") * (1 + F.col("_r").cast("double") / F.lit(64.0))
                + F.col("_r").cast("double")
            ).alias("value"),
        )
    )


def main():
    spark = get_spark("prof_corr")
    out = {}
    for r in (1, 4, 10):
        pts = replicated_points(spark, r).localCheckpoint()
        n_streams = pts.select("uuid").distinct().count()
        row = {"streams": n_streams}
        if r <= 4:
            t0 = time.time()
            row["full_pairs"] = correlate.stream_correlations(
                pts, pw=42, min_overlap=8
            ).count()
            row["full_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        row["lsh_rows"] = correlate.stream_correlations_topk_lsh(
            pts, pw=42, k=3, min_overlap=8
        ).count()
        row["lsh_sec"] = round(time.time() - t0, 2)
        # the 100 TB read path (VERDICT r9 #7): the same LSH plan fed
        # from a level-20 rollup — output-shaped ladder rows in, answer
        # bit-identical (count equality asserted here; the full value
        # equality is the driver oracle's job)
        from btrdb_spark.plans import rollup as _ru

        r20 = _ru.rollup_points(pts, 20).localCheckpoint()
        t0 = time.time()
        row["lsh_rollup_rows"] = correlate.stream_correlations_topk_lsh_via_rollup(
            r20, 20, pw=42, k=3, min_overlap=8
        ).count()
        row["lsh_rollup_sec"] = round(time.time() - t0, 2)
        assert row["lsh_rollup_rows"] == row["lsh_rows"], "ladder path diverged"
        out[f"r{r}"] = row
        print(json.dumps({f"r{r}": row}), flush=True)

    # Recall at 1x, stratified by |corr|, at TWO bucket widths.
    #
    # Sign-LSH collision probability is (1 - theta/pi)^planes on the
    # GLOBAL bucket axis with missing buckets imputed at the stream
    # mean. Pairwise Pearson, by contrast, is computed over each pair's
    # COMMON buckets only. The two agree when streams are DENSE (every
    # stream reports ~every bucket — the grid/PMU fleet the operator
    # targets) and diverge when streams are sparse with small overlaps:
    # a pair perfectly correlated on its 8 shared buckets can still be
    # near-orthogonal over the 590-bucket axis where each side carries
    # ~55 unshared buckets. The fixture at pw=42 IS that sparse regime
    # (~11% bucket density), so recall there is the honest floor;
    # pw=45 coarsens to ~85% density — the dense regime — where the LSH
    # theory applies. Both are reported.
    pts = replicated_points(spark, 1).localCheckpoint()
    for pw in (42, 45):
        exact = correlate.stream_correlations(
            pts, pw=pw, min_overlap=8
        ).select(
            "uuid_a", "uuid_b", F.abs(F.col("corr")).alias("ac")
        ).localCheckpoint()
        lshp = (
            correlate.stream_correlations_topk_lsh(
                pts, pw=pw, k=10**9, min_overlap=8
            )
            .filter(F.col("uuid") < F.col("partner"))
            .select(
                F.col("uuid").alias("uuid_a"), F.col("partner").alias("uuid_b")
            )
        )
        joined = exact.join(
            lshp.withColumn("hit", F.lit(1)), ["uuid_a", "uuid_b"], "left"
        ).localCheckpoint()
        recall = {"pw": pw}
        for lo in (0.5, 0.7, 0.9, 0.95):
            row = joined.filter(F.col("ac") >= lo).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.coalesce("hit", F.lit(0))).alias("h"),
            ).collect()[0]
            recall[f"recall_corr_ge_{lo}"] = (
                round(row["h"] / row["n"], 3) if row["n"] else None
            )
            recall[f"n_corr_ge_{lo}"] = row["n"]
        print(json.dumps(recall), flush=True)
    # Planted-pair recall: at r>=2 the replicas of one base stream are
    # affine transforms with IDENTICAL bucket support — true corr = 1.0
    # pairs both on common buckets and globally, i.e. the coupled-feeder
    # shape the operator exists to find. The definitive gauge.
    pts4 = replicated_points(spark, 4).localCheckpoint()
    lsh4 = correlate.stream_correlations_topk_lsh(pts4, pw=42, k=3, min_overlap=8)
    sib = lsh4.withColumn(
        "is_sib",
        (
            F.substring_index(F.col("uuid"), "#", 1)
            == F.substring_index(F.col("partner"), "#", 1)
        ).cast("int"),
    )
    per = sib.groupBy("uuid").agg(F.max("is_sib").alias("found"))
    row = per.agg(F.count("*").alias("n"), F.sum("found").alias("f")).collect()[0]
    top1 = sib.filter(F.col("rk") == 1).agg(
        F.avg("is_sib").alias("r")
    ).collect()[0]
    summary = {
        "planted_pair_recall_top3": round(row["f"] / row["n"], 4),
        "planted_top1_is_sibling": round(top1["r"], 4),
        "full_sec_1x_to_4x": round(
            out["r4"]["full_sec"] / max(out["r1"]["full_sec"], 0.01), 1
        ),
        "lsh_sec_1x_to_10x": round(
            out["r10"]["lsh_sec"] / max(out["r1"]["lsh_sec"], 0.01), 1
        ),
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
