"""r13 A/B: unrolled fixed-dim dot/norm vs higher-order-function fold.

Shipped `_dot` = aggregate(zip_with(a, b, x*y), 0.0, acc+x): a left fold
(((0.0 + a0*b0) + a1*b1) + ...). Higher-order functions are
CodegenFallback (interpreted per element — the r13 substring v2 lesson),
so every candidate pair pays ~dim interpreted lambda evals.

Candidate: when the embedding dim is statically known (64 in every
declared query), emit the SAME left-associated sum as a plain expression
chain — bit-identical float association, whole-stage-codegen'd.

Equivalence is proven with exceptAll both ways (exact value compare)
before timing; alternated A/B floors after.

Usage: python tools/prof_dot_unroll_r13.py
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


def dot_unrolled(a, b, dim: int):
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + a[i].cast("double") * b[i].cast("double")
    return acc


def norm_unrolled(a, dim: int):
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + a[i].cast("double") * a[i].cast("double")
    return F.sqrt(acc)


def main() -> None:
    import __spark_entry__ as entrymod  # noqa: F401
    from btrdb_spark.session import get_spark
    from btrdb_spark.functions import similarity

    spark = get_spark("prof_dot_unroll_r13", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    DIM = 64

    # ---- micro-equivalence: the two dot forms over the fixture ----
    emb = spark.read.parquet(sf + "/embeddings.parquet")
    a = emb.select(
        F.col("vec_id"),
        similarity._dot(F.col("embedding"), F.col("embedding")).alias("d"),
        similarity._norm(F.col("embedding")).alias("n"),
    )
    b = emb.select(
        F.col("vec_id"),
        dot_unrolled(F.col("embedding"), F.col("embedding"), DIM).alias("d"),
        norm_unrolled(F.col("embedding"), DIM).alias("n"),
    )
    d1, d2 = a.exceptAll(b).count(), b.exceptAll(a).count()
    print(f"micro equivalence: exceptAll {d1}/{d2} (must be 0/0)", flush=True)

    # ---- operator A/B: embedding_neardup_pairs shipped vs unrolled ----
    def shipped():
        return similarity.embedding_neardup_pairs(
            emb, emb.filter(F.col("vec_id") < 100), threshold=0.28
        )

    def unrolled():
        c = emb.select(
            F.col("vec_id").alias("doc_b"),
            F.col("embedding").alias("cvec"),
            norm_unrolled(F.col("embedding"), DIM).alias("cnorm"),
        )
        p = emb.filter(F.col("vec_id") < 100).select(
            F.col("vec_id").alias("doc_a"),
            F.col("embedding").alias("pvec"),
            norm_unrolled(F.col("embedding"), DIM).alias("pnorm"),
        )
        return (
            c.join(F.broadcast(p), F.col("doc_a") < F.col("doc_b"))
            .select(
                "doc_a",
                "doc_b",
                (
                    dot_unrolled(F.col("cvec"), F.col("pvec"), DIM)
                    / (F.col("cnorm") * F.col("pnorm"))
                ).alias("cosine"),
            )
            .filter(F.col("cosine") >= F.lit(0.28))
            .orderBy("doc_a", "doc_b")
        )

    sa, sb = shipped(), unrolled()
    d1, d2 = sa.exceptAll(sb).count(), sb.exceptAll(sa).count()
    print(f"neardup equivalence: exceptAll {d1}/{d2} (must be 0/0)", flush=True)

    spark.sparkContext.setJobDescription("neardup shipped warm")
    noop(shipped())
    spark.sparkContext.setJobDescription("neardup shipped")
    t1 = floor_of(lambda: noop(shipped()))
    spark.sparkContext.setJobDescription("neardup unrolled")
    t2 = floor_of(lambda: noop(unrolled()))
    spark.sparkContext.setJobDescription("neardup shipped 2")
    t3 = floor_of(lambda: noop(shipped()))
    spark.sparkContext.setJobDescription("neardup unrolled 2")
    t4 = floor_of(lambda: noop(unrolled()))
    print(
        f"embedding_neardup_pairs: shipped={t1:.3f}/{t3:.3f}s "
        f"unrolled={t2:.3f}/{t4:.3f}s",
        flush=True,
    )

    # ---- cosine_topk the same way (shares _dot through the operator) ----
    q = entrymod.queries()["cosine_topk"]
    spark.sparkContext.setJobDescription("cosine_topk shipped")
    t5 = floor_of(lambda: noop(q(spark, sf)))
    print(f"cosine_topk shipped floor: {t5:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
