"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: queries X corpus cross join
with the probe side broadcast, dot products evaluated JVM-side with
zip_with/aggregate (no Python). At 100 TB the scale path is LSH bucketing
(`lsh_buckets`): random-hyperplane signs computed from a deterministic
md5-derived pseudo-projection, so candidates only join within a bucket —
same shape as the minhash band join in functions/dedup.py.

Determinism: products and sums are computed left-to-right in double
precision in both Spark (F.aggregate fold) and the DuckDB oracle
(list_dot_product over DOUBLE[]), so scores match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each probe (self-matches excluded).

    Output: (query_id, neighbor_id, rank, cosine). Ties broken by
    neighbor_id ascending for determinism.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("cnorm"),
    )
    p = probes.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("pvec"),
        _norm(F.col(vec_col)).alias("pnorm"),
    )
    scored = (
        c.crossJoin(F.broadcast(p))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("cvec"), F.col("pvec")) / (F.col("cnorm") * F.col("pnorm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cosine")
        .orderBy("query_id", "rank")
    )


def lsh_buckets(
    corpus: DataFrame,
    n_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH: sign-bit signature per vector -> bucket id.

    Pseudo-random plane coefficients are md5-derived (deterministic,
    engine-portable): coef(p, j) = (('0x'||substr(md5(p||'_'||j),1,8))::int
    / 2^31) - 1  in [-1, 1).
    """
    def coef(p: int, j: Column) -> Column:
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{p}_"), j.cast("string"))), 1, 8), 16, 10
        ).cast("double")
        return h / F.lit(float(1 << 31)) - F.lit(1.0)

    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, j: x.cast("double") * coef(p, j),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0))
    return corpus.select(F.col(id_col).alias("vec_id"), sig.alias("bucket"))


def embedding_neardup_pairs(
    corpus: DataFrame,
    probes: DataFrame,
    threshold: float = 0.28,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: probe x corpus pairs with
    cosine >= threshold (probe_id < corpus_id to dedup the symmetric pair).

    The probe side broadcasts; the corpus side streams — at 100 TB the
    probe set is the (bounded) suspect batch, or the blocked/LSH-bucketed
    candidates from lsh_buckets, never the full cross product.
    """
    c = corpus.select(
        F.col(id_col).alias("doc_b"), F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("cnorm"),
    )
    p = probes.select(
        F.col(id_col).alias("doc_a"), F.col(vec_col).alias("pvec"),
        _norm(F.col(vec_col)).alias("pnorm"),
    )
    return (
        c.join(F.broadcast(p), F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            (_dot(F.col("cvec"), F.col("pvec")) / (F.col("cnorm") * F.col("pnorm"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(threshold))
        .orderBy("doc_a", "doc_b")
    )


# ---------------- DuckDB oracle mirrors ----------------

ORACLES = {
    "embedding_neardup_pairs": """
        WITH c AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                   sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
            FROM embeddings
        )
        SELECT p.vec_id AS doc_a, c.vec_id AS doc_b,
               list_dot_product(c.v, p.v) / (c.nrm * p.nrm) AS cosine
        FROM c JOIN c p ON p.vec_id < 100 AND p.vec_id < c.vec_id
        WHERE list_dot_product(c.v, p.v) / (c.nrm * p.nrm) >= 0.28
        ORDER BY 1, 2
    """,
    "cosine_topk": """
        WITH c AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                   sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
            FROM embeddings
        ), scored AS (
            SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
                   list_dot_product(c.v, p.v) / (c.nrm * p.nrm) AS cosine
            FROM c JOIN c p ON p.vec_id < 10 AND c.vec_id <> p.vec_id
        ), ranked AS (
            SELECT query_id, neighbor_id, cosine,
                   ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cosine
        FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
    """,
}
