"""PQ scale probe: encode throughput and asymmetric-scan rate on a
200k x 64f synthetic corpus (100x the sf0.1 embeddings fixture) — the
cliff check for the quantized-ANN path, analogous to the corpus/points
probes. Probe data is generated in-memory; fixtures untouched."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from btrdb_spark.functions import similarity as sim
from btrdb_spark.session import get_spark

N = 200_000
DIM = 64


def main():
    spark = get_spark("prof_pq", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    vecs = spark.range(N).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda j: ((F.col("id") * 31 + j * 7) % 1000 / 500.0 - 1.0).cast("double"),
        ).alias("embedding"),
    ).cache()
    vecs.count()
    # train on a driver-sized sample (the faiss convention)
    sample = np.array(
        [r["embedding"] for r in vecs.filter(F.col("vec_id") < 20_000).collect()]
    )
    books = sim.train_pq_codebooks(sample, m=8, nbits=8)
    cb = sim.pq_codebooks_df(spark, books)

    def best_of(fn, n=3):
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return best

    enc_s = best_of(
        lambda: sim.pq_encode(vecs, cb, 8, 8)
        .write.format("noop").mode("overwrite").save()
    )
    print(f"pq_encode: best={enc_s:.2f}s -> {N/enc_s/1e3:.1f}K vectors/s", flush=True)

    probes = vecs.filter(F.col("vec_id") < 32)
    scan_s = best_of(
        lambda: sim.ann_pq_topk(vecs, probes, books, k=5)
        .write.format("noop").mode("overwrite").save()
    )
    print(
        f"ann_pq_topk (32 probes x {N} codes): best={scan_s:.2f}s -> "
        f"{32*N/scan_s/1e6:.1f}M probe-code pairs/s",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
