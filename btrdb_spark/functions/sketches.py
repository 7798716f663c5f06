"""Mergeable cardinality / frequency sketches — the distributed-counting
toolkit a 100 TB pipeline needs where exact distinct/frequency state no
longer fits (per-day active users across a year of shards, vocabulary
heavy-hitters across a corpus too large for an exact groupBy).

Two classic sketches, both chosen for being EXACTLY expressible in both
engines (the repo's oracle-gate discipline):

- **KMV / bottom-k** (Bar-Yossef et al. 2002; the Theta-sketch family in
  Apache DataSketches): keep the k smallest 60-bit hashes of the keys;
  estimate = (k-1) * 2^60 / kth_min. Everything except the final IEEE
  division is integer work, so Spark and DuckDB agree bit-for-bit.
  MERGEABLE: bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B)) —
  ``distinct_kmv_merged`` exploits exactly that (per-group sketches fold
  into a global one), and its oracle computes the global sketch
  DIRECTLY, so the driver gate proves the merge law on real data.

- **Count-Min** (Cormode & Muthukrishnan 2005): d=4 salted hash rows x
  w buckets of int64 counts; estimate(token) = min over rows — always an
  overestimate, never under. Counts are exact integers; the top-k order
  (est desc, token asc) is deterministic in both engines.

Hashing: the repo's portable 60-bit convention —
``conv(substring(md5(x), 1, 15), 16, 10)`` in Spark,
``('0x' || substr(md5(x), 1, 15))::BIGINT`` in DuckDB (functions/text.py
fingerprint).

Scale shape: KMV is one distinct-shuffle + one per-group window over at
most k surviving rows per group; CMS is a (d*w)-key partial-aggregated
groupBy (4096 cells here — broadcast back to the candidate join). No
Python UDFs anywhere; every expression is whole-stage-codegen'd SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

H_BITS = 60
H_SPAN = float(1 << H_BITS)  # dyadic — exact as a double in both engines


def hash60(col) -> "F.Column":
    """Portable non-negative 60-bit hash (md5-derived, engine-agnostic)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _hash60_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def distinct_kmv(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group approximate distinct count via the bottom-k sketch.

    Output: (group_cols..., est_distinct double, n_exact long), ordered
    by group. est = (k-1) * 2^60 / kth_smallest_hash when the group holds
    >= k distinct hashes, else the exact distinct count (the standard KMV
    small-set rule — the sketch IS the exact set below k). n_exact is
    carried for accuracy dashboards; production reads would drop it.

    One distinct-shuffle on (group, hash), then a per-group sort of only
    the distinct hashes; at scale replace the window with a bounded
    per-partition bottom-k combine (same estimate, fewer sorted rows).
    """
    h = hash60(F.col(key_col).cast("string"))
    hs = df.select(*group_cols, h.alias("h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    wall = Window.partitionBy(*group_cols)
    ranked = hs.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wall)
    )
    kth = ranked.filter(
        (F.col("rn") == F.least(F.lit(k), F.col("n")))
    ).select(
        *group_cols,
        F.col("n").alias("n_exact"),
        F.when(
            F.col("n") < k, F.col("n").cast("double")
        ).otherwise(F.lit(float(k - 1) * H_SPAN) / F.col("h").cast("double")).alias(
            "est_distinct"
        ),
    )
    return kth.select(*group_cols, "est_distinct", "n_exact").orderBy(*group_cols)


def distinct_kmv_sql(
    from_sql: str, group_cols: list[str], key_expr: str, k: int = 256
) -> str:
    """DuckDB mirror of distinct_kmv (same expressions, same literals)."""
    g = ", ".join(group_cols)
    lit = f"{float(k - 1) * H_SPAN!r}"
    return f"""
        WITH hs AS (
            SELECT DISTINCT {g}, {_hash60_sql(f"CAST({key_expr} AS VARCHAR)")} AS h
            FROM {from_sql}
        ), ranked AS (
            SELECT {g}, h,
                   ROW_NUMBER() OVER (PARTITION BY {g} ORDER BY h) AS rn,
                   COUNT(*) OVER (PARTITION BY {g}) AS n
            FROM hs
        )
        SELECT {g},
               CASE WHEN n < {k} THEN CAST(n AS DOUBLE)
                    ELSE {lit} / CAST(h AS DOUBLE) END AS est_distinct,
               CAST(n AS BIGINT) AS n_exact
        FROM ranked WHERE rn = LEAST({k}, n)
        ORDER BY {g}
    """


def distinct_kmv_merged(
    df: DataFrame,
    shard_cols: list[str],
    key_col: str,
    k: int = 256,
) -> DataFrame:
    """GLOBAL distinct estimate obtained by MERGING per-shard bottom-k
    sketches (never rescanning the raw keys): each shard keeps its k
    smallest distinct hashes; the union of those small sets is re-ranked
    and the global kth-min drives the same estimator. Correct because
    every global bottom-k hash is necessarily in its own shard's
    bottom-k — the sketch merge law. The oracle computes the global
    sketch directly from the raw keys, so a green gate row IS a proof of
    the merge on the fixture.

    Output: one row (est_distinct double, n_exact long).

    This is the 100 TB shape: shard sketches are k longs each, merge
    cost is O(shards * k) regardless of data volume — per-day sketches
    roll up to month/year without re-reading history.
    """
    h = hash60(F.col(key_col).cast("string"))
    hs = df.select(*shard_cols, h.alias("h")).distinct()
    per_shard = Window.partitionBy(*shard_cols).orderBy("h")
    shard_bottom = (
        hs.withColumn("rn", F.row_number().over(per_shard))
        .filter(F.col("rn") <= k)
        .select("h")
        .distinct()  # the same key may appear in many shards
    )
    wg = Window.orderBy("h")
    ranked = shard_bottom.withColumn("rn", F.row_number().over(wg)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy())
    )
    exact = df.select(F.col(key_col).cast("string").alias("s")).distinct().count()
    return ranked.filter(F.col("rn") == F.least(F.lit(k), F.col("n"))).select(
        F.when(F.col("n") < k, F.col("n").cast("double"))
        .otherwise(F.lit(float(k - 1) * H_SPAN) / F.col("h").cast("double"))
        .alias("est_distinct"),
        F.lit(exact).cast("long").alias("n_exact"),
    )


def distinct_kmv_merged_sql(from_sql: str, key_expr: str, k: int = 256) -> str:
    """Oracle: the DIRECT global bottom-k over the raw keys (no shard
    stage) — equality with the Spark merge path proves the merge law."""
    lit = f"{float(k - 1) * H_SPAN!r}"
    key = f"CAST({key_expr} AS VARCHAR)"
    return f"""
        WITH hs AS (
            SELECT DISTINCT {_hash60_sql(key)} AS h FROM {from_sql}
        ), ranked AS (
            SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn,
                   COUNT(*) OVER () AS n
            FROM hs
        )
        SELECT CASE WHEN n < {k} THEN CAST(n AS DOUBLE)
                    ELSE {lit} / CAST(h AS DOUBLE) END AS est_distinct,
               (SELECT COUNT(DISTINCT {key}) FROM {from_sql}) AS n_exact
        FROM ranked WHERE rn = LEAST({k}, n)
    """


def cms_heavy_hitters(
    documents: DataFrame,
    text_col: str = "text",
    d: int = 4,
    w: int = 1024,
    topk: int = 50,
) -> DataFrame:
    """Corpus token heavy-hitters from a count-min sketch.

    Output: (token, est_count long) — the topk tokens by CMS estimate,
    est desc then token asc. est_count >= the true count always (CMS
    one-sided error); with d=4, w=1024 the overestimate is bounded by
    ~2N/w per row, min across rows in practice much tighter.

    Plan: tokens exploded once, then a d-way explode onto salted hash
    rows; the sketch is a (d*w)-cell groupBy (partial-aggregated, tiny
    result); candidate estimates come from a broadcast join of the
    distinct vocabulary against the 4096-cell table. The sketch table
    itself is the mergeable artifact — per-shard sketches add cell-wise.
    """
    toks = documents.select(
        F.explode(F.split(F.col(text_col), " ")).alias("t")
    ).filter(F.col("t") != "")
    salts = F.array(*[F.lit(r) for r in range(d)])
    rt = toks.select("t", F.explode(salts).alias("r"))
    bucket = F.pmod(
        hash60(F.concat(F.col("r").cast("string"), F.lit(":"), F.col("t"))), F.lit(w)
    )
    counts = rt.select("r", bucket.alias("bucket")).groupBy("r", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    cand = toks.distinct().select("t", F.explode(salts).alias("r")).select(
        "t", "r", bucket.alias("bucket")
    )
    est = (
        cand.join(F.broadcast(counts), ["r", "bucket"])
        .groupBy("t")
        .agg(F.min("c").alias("est_count"))
    )
    return (
        est.orderBy(F.desc("est_count"), F.asc("t"))
        .limit(topk)
        .select(F.col("t").alias("token"), F.col("est_count").cast("long"))
    )


def cms_heavy_hitters_sql(
    from_sql: str, text_expr: str = "text", d: int = 4, w: int = 1024, topk: int = 50
) -> str:
    salts = ", ".join(f"({r})" for r in range(d))
    hexpr = _hash60_sql("CAST(r AS VARCHAR) || ':' || t")
    return f"""
        WITH tok AS (
            SELECT unnest(string_split({text_expr}, ' ')) AS t FROM {from_sql}
        ), tok2 AS (SELECT t FROM tok WHERE t <> ''),
        rs(r) AS (SELECT * FROM (VALUES {salts})),
        counts AS (
            SELECT r, {hexpr} % {w} AS bucket, COUNT(*) AS c
            FROM tok2 CROSS JOIN rs GROUP BY 1, 2
        ), cand AS (
            SELECT DISTINCT t FROM tok2
        ), est AS (
            SELECT t, MIN(c) AS est_count
            FROM (SELECT t, r, {hexpr} % {w} AS bucket FROM cand CROSS JOIN rs) x
            JOIN counts USING (r, bucket)
            GROUP BY t
        )
        SELECT t AS token, CAST(est_count AS BIGINT) AS est_count
        FROM est ORDER BY est_count DESC, t ASC LIMIT {topk}
    """
