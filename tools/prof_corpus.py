"""Corpus scale probe: run the headline text/dedup operators on a
200k-doc synthetic corpus (400x the sf0.01 fixture, 40x sf0.1) and
report docs/sec — the cliff check for the LLM-pipeline ops, analogous
to the 100M-point engine probe. Probe data lives in /tmp; the driver
fixtures are never touched.

Corpus shape mirrors real pretraining text statistics where they matter
to the operators: ~55 tokens/doc from a skewed vocabulary (token ids
drawn across 4 magnitude bands, so frequent tokens exist), 5% exact
duplicates, and a boilerplate header shared by 2% of docs (the
hot-shingle stressor for gram-keyed shuffles).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from btrdb_spark.session import get_spark

N = 200_000
OUT = "/tmp/prof_corpus_docs.parquet"


def build(spark):
    if os.path.exists(OUT):
        return
    # deterministic synthesis, fully distributed: token = "w<zipfish id>"
    # via xxhash64 mixing; duplicate/near-dup structure from id arithmetic
    base = spark.range(N).select(
        F.col("id").alias("doc_id"),
        # 5% exact dups: doc_id % 20 == 7 copies doc_id - 1's text
        F.when(F.col("id") % 20 == 7, F.col("id") - 1)
        .otherwise(F.col("id"))
        .alias("src_id"),
        (F.col("id") % 4).alias("variant"),
    )
    tok = (
        "concat('w', cast(pmod(xxhash64(src_id * 57 + i), "
        "cast(pow(10, 1 + pmod(xxhash64(src_id * 131 + i), 4)) as bigint)) as string))"
    )
    docs = base.select(
        "doc_id",
        F.expr(
            "concat_ws(' ', "
            # 2% share an 8-token boilerplate header (hot shingles)
            "case when pmod(doc_id, 50) = 3 then "
            "  'terms of service apply to this document text' "
            "else null end, "
            f"array_join(transform(sequence(1, 55), i -> {tok}), ' '))"
        ).alias("text"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("src"), (F.col("doc_id") % 4).cast("string")).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("long"))
    docs.write.mode("overwrite").parquet(OUT)


def main():
    spark = get_spark("prof_corpus", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    docs = spark.read.parquet(OUT)
    docs.cache().count()

    from btrdb_spark.functions import dedup, pipeline, text

    probes = {
        "dedup_exact": lambda: dedup.exact_duplicates(docs).count(),
        "minhash_lsh_pairs": lambda: dedup.minhash_lsh_pairs(docs).count(),
        "exact_substring_spans": lambda: dedup.exact_substring_spans(docs, k=8).count(),
        "lang_id": lambda: text.lang_id(docs).count(),
        "text_quality": lambda: text.quality_stats(docs).count(),
        "pipeline_funnel": lambda: pipeline.pipeline_funnel(docs).count(),
        # round-4 ops
        "gopher_quality": lambda: text.gopher_quality(docs).count(),
        "token_freq_quality": lambda: text.token_freq_quality(docs).count(),
        "domain_stats": lambda: text.domain_stats(docs).count(),
        "strip_duplicate_spans": lambda: dedup.strip_duplicate_spans(docs, k=8).count(),
        "containment_capped": lambda: dedup.ngram_containment_pairs(
            docs, n=3, threshold=0.8, max_df=8
        ).count(),
        # round-6 ops: the cliff check for the new families
        "fuzzy_prefix_pairs": lambda: dedup.fuzzy_prefix_pairs(docs).count(),
        "collocations_topk": lambda: text.collocations_topk(docs).count(),
        "weighted_sample": lambda: pipeline.weighted_sample(
            docs, n_draws=256
        ).count(),
        # r7: the mixture-epoch shape — draws ~ corpus size. Must stay
        # linear: bucket-keyed equi-join, n_buckets scaled so per-bucket
        # pair fan-out stays ~20M (verdict r6 ask #1).
        "weighted_sample_epoch": lambda: pipeline.weighted_sample(
            docs, n_draws=100_000, n_buckets=1024
        ).count(),
        "rendezvous_shards": lambda: pipeline.rendezvous_shard_assign(
            docs, n_shards=64
        ).count(),
        "source_jaccard_kmv": lambda: __import__(
            "btrdb_spark.functions.sketches", fromlist=["x"]
        ).source_jaccard_kmv(docs).count(),
        # r8 sampling contract at probe scale: the recall gauge on a
        # 1/100 deterministic doc-sample of the 200k corpus — cost must
        # track the SAMPLE (2k docs), not the corpus
        "lsh_recall_audit_mod100": lambda: dedup.lsh_recall_audit(
            docs, sample_mod=100
        ).count(),
    }
    only = set(sys.argv[1:])
    if only:
        probes = {k: v for k, v in probes.items() if k in only}
    print(f"corpus: {N} docs")
    for name, fn in probes.items():
        best = float("inf")
        rows = None
        for _ in range(2):
            t0 = time.time()
            rows = fn()
            best = min(best, time.time() - t0)
        print(
            f"{name}: best={best:.2f}s -> {N / best / 1e3:.1f}K docs/s ({rows} rows)",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
