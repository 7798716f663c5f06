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


def sample_quantiles_merged(
    df: DataFrame,
    shard_cols: list[str],
    value_col: str,
    key_cols: list[str],
    k: int = 512,
) -> DataFrame:
    """Global quantile estimates from a MERGED bounded uniform sample —
    the quantile member of the sketch family (distinct: KMV/HLL,
    frequency: CMS, membership: Bloom). Each shard keeps the k rows with
    the smallest deterministic row-id hashes (a uniform sample without
    replacement — the bottom-k sample of Cohen & Kaplan 2007); shard
    samples union and re-rank to the global bottom-k, which is IDENTICAL
    to the sample a direct global pass would draw (the same bottom-k
    merge law as distinct_kmv_merged). Quantiles are exact order
    statistics over the sample — nearest-lower rank, integer arithmetic,
    zero float ops — so the oracle (direct global sample) matches
    bit-for-bit.

    Output: one row (p50, p90, p99 double, n_sample long).

    The 100 TB shape: per-shard state is k (hash, value) pairs no matter
    the shard size; merge cost O(shards * k); the sample (unlike a
    KLL/t-digest) is also REUSABLE for any other statistic after the
    fact. Accuracy: rank error ~1/sqrt(k) — k=512 gives ~4.4%.
    """
    h = hash60(F.concat_ws(":", *[F.col(c).cast("string") for c in key_cols]))
    rows = df.select(*shard_cols, h.alias("h"), F.col(value_col).alias("v"))
    per_shard = Window.partitionBy(*shard_cols).orderBy("h", "v")
    shard_bottom = (
        rows.withColumn("rn", F.row_number().over(per_shard))
        .filter(F.col("rn") <= k)
        .select("h", "v")
    )
    wg = Window.orderBy("h", "v")
    sample = (
        shard_bottom.withColumn("rn", F.row_number().over(wg)).filter(F.col("rn") <= k)
    )
    wv = Window.orderBy("v", "h")
    ranked = (
        sample.withColumn("vr", F.row_number().over(wv))
        .withColumn("s", F.count(F.lit(1)).over(Window.partitionBy()))
    )
    def at(num: int, den: int):
        # nearest-lower order statistic: 1 + (num*(s-1)) // den, exact ints
        r = F.lit(1) + F.floor((F.lit(num) * (F.col("s") - 1)) / F.lit(den)).cast("long")
        return F.max(F.when(F.col("vr") == r, F.col("v")))

    return ranked.groupBy().agg(
        at(1, 2).alias("p50"),
        at(9, 10).alias("p90"),
        at(99, 100).alias("p99"),
        F.max("s").cast("long").alias("n_sample"),
    )


def sample_quantiles_by_group(
    df: DataFrame,
    group_cols: list[str],
    shard_cols: list[str],
    value_col: str,
    key_cols: list[str],
    k: int = 256,
) -> DataFrame:
    """Per-GROUP quantiles from merged per-(group, shard) bottom-k
    samples — sample_quantiles_merged with a group dimension (per-domain
    document-length distributions, per-language token-count monitoring).
    Every window is partitioned by at least the group columns, so no
    single-partition stage exists anywhere: the scan reduces to
    groups x shards x k sampled rows, then to groups x k.

    Output: (group_cols..., p50, p90, p99 double, n_sample long),
    group-ordered.
    """
    h = hash60(F.concat_ws(":", *[F.col(c).cast("string") for c in key_cols]))
    rows = df.select(
        *group_cols, *[c for c in shard_cols if c not in group_cols],
        h.alias("h"), F.col(value_col).alias("v"),
    )
    per_shard = Window.partitionBy(*group_cols, *shard_cols).orderBy("h", "v")
    shard_bottom = (
        rows.withColumn("rn", F.row_number().over(per_shard))
        .filter(F.col("rn") <= k)
        .select(*group_cols, "h", "v")
    )
    wg = Window.partitionBy(*group_cols).orderBy("h", "v")
    sample = (
        shard_bottom.withColumn("rn", F.row_number().over(wg)).filter(F.col("rn") <= k)
    )
    wv = Window.partitionBy(*group_cols).orderBy("v", "h")
    ranked = sample.withColumn("vr", F.row_number().over(wv)).withColumn(
        "s", F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
    )

    def at(num: int, den: int):
        r = F.lit(1) + F.floor((F.lit(num) * (F.col("s") - 1)) / F.lit(den)).cast("long")
        return F.max(F.when(F.col("vr") == r, F.col("v")))

    return (
        ranked.groupBy(*group_cols)
        .agg(
            at(1, 2).alias("p50"),
            at(9, 10).alias("p90"),
            at(99, 100).alias("p99"),
            F.max("s").cast("long").alias("n_sample"),
        )
        .orderBy(*group_cols)
    )


def sample_quantiles_by_group_sql(
    from_sql: str,
    group_exprs: list[str],
    value_expr: str,
    key_exprs: list[str],
    k: int = 256,
) -> str:
    """Oracle: the DIRECT per-group bottom-k sample (no shard stage)."""
    keycat = " || ':' || ".join(f"CAST({e} AS VARCHAR)" for e in key_exprs)
    h = _hash60_sql(keycat)
    g = ", ".join(group_exprs)
    qsel = ", ".join(
        f"MAX(CASE WHEN vr = 1 + ({num} * (s - 1)) // {den} THEN v END) AS p{nm}"
        for num, den, nm in [(1, 2, 50), (9, 10, 90), (99, 100, 99)]
    )
    return f"""
        WITH rows_ AS (
            SELECT {g}, {h} AS h, {value_expr} AS v FROM {from_sql}
        ), sample_ AS (
            SELECT {g}, h, v FROM (
                SELECT {g}, h, v,
                       ROW_NUMBER() OVER (PARTITION BY {g} ORDER BY h, v) AS rn
                FROM rows_
            ) WHERE rn <= {k}
        ), ranked AS (
            SELECT {g}, v,
                   ROW_NUMBER() OVER (PARTITION BY {g} ORDER BY v, h) AS vr,
                   COUNT(*) OVER (PARTITION BY {g}) AS s
            FROM sample_
        )
        SELECT {g}, {qsel}, CAST(MAX(s) AS BIGINT) AS n_sample
        FROM ranked GROUP BY {g} ORDER BY {g}
    """


def sample_quantiles_merged_sql(
    from_sql: str, value_expr: str, key_exprs: list[str], k: int = 512
) -> str:
    """Oracle: the DIRECT global bottom-k sample over the raw rows (no
    shard stage) — equality with the Spark merge path proves that
    shard-sample union re-ranked IS the global sample."""
    keycat = " || ':' || ".join(f"CAST({e} AS VARCHAR)" for e in key_exprs)
    h = _hash60_sql(keycat)
    qsel = ", ".join(
        f"MAX(CASE WHEN vr = 1 + ({num} * (s - 1)) // {den} THEN v END) AS p{nm}"
        for num, den, nm in [(1, 2, 50), (9, 10, 90), (99, 100, 99)]
    )
    return f"""
        WITH rows_ AS (
            SELECT {h} AS h, {value_expr} AS v FROM {from_sql}
        ), sample_ AS (
            SELECT h, v FROM (
                SELECT h, v, ROW_NUMBER() OVER (ORDER BY h, v) AS rn FROM rows_
            ) WHERE rn <= {k}
        ), ranked AS (
            SELECT v, ROW_NUMBER() OVER (ORDER BY v, h) AS vr,
                   COUNT(*) OVER () AS s
            FROM sample_
        )
        SELECT {qsel}, CAST(MAX(s) AS BIGINT) AS n_sample FROM ranked
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


def _hll_params(b: int) -> tuple[int, int, int, int, float]:
    """(m, K, rmax, mask, A) for register-prefix width ``b``.

    m = 2^b registers; the top b hash bits pick the register, the low
    K = 60-b bits feed the leading-zero rank rho in 1..rmax (rmax = K+1
    when the low bits are all zero). A is the raw-estimator numerator
    alpha_m * m^2 * 2^rmax folded to ONE double literal so each engine
    performs exactly one IEEE division."""
    m = 1 << b
    K = H_BITS - b
    rmax = K + 1
    mask = (1 << K) - 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return m, K, rmax, mask, alpha * m * m * float(1 << rmax)


def distinct_hll(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    b: int = 9,
) -> DataFrame:
    """Per-group approximate distinct count via HyperLogLog (Flajolet et
    al. 2007) — CONSTANT sketch size (2^b registers) regardless of
    cardinality, where KMV keeps k hashes. The two are complementary:
    KMV is exact below k (use it for small groups), HLL's raw estimator
    shines once groups exceed ~2.5*m distinct keys.

    Output: (group_cols..., est_hll double, zero_registers long).

    Everything except the single final division is INTEGER work, so the
    oracle matches bit-for-bit: rho comes from length(bin(w)) (minimal
    binary repr, identical in Spark and DuckDB — no float log2), and the
    register sum SUM(2^-M) is scaled by 2^rmax into an exact int64
    (max 2^b * 2^rmax = 2^61 at b=9). The standard small-range linear-
    counting branch is deliberately OMITTED: it needs ln(), whose last
    ulp is libm-dependent across engines — small groups should route to
    distinct_kmv instead (documented contract, not a gap).

    Scale shape: one partial-aggregated groupBy to (group, register) —
    at most m rows per group survive the map side — then a per-group
    fold. Registers are the mergeable artifact (element-wise MAX).
    """
    m, K, rmax, mask, A = _hll_params(b)
    h = hash60(F.col(key_col).cast("string"))
    w = h.bitwiseAND(F.lit(mask))
    rho = F.when(w == 0, F.lit(rmax)).otherwise(F.lit(rmax) - F.length(F.bin(w)))
    regs = (
        df.select(*group_cols, F.shiftright(h, K).alias("bucket"), rho.alias("mreg"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("mreg").alias("mreg"))
    )
    agg = regs.groupBy(*group_cols).agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({rmax} - mreg AS INT))")
        ).alias("s_present"),
        F.count(F.lit(1)).alias("nb"),
    )
    s = F.col("s_present") + (F.lit(m) - F.col("nb")) * F.lit(1 << rmax)
    return agg.select(
        *group_cols,
        (F.lit(A) / s.cast("double")).alias("est_hll"),
        (F.lit(m) - F.col("nb")).cast("long").alias("zero_registers"),
    ).orderBy(*group_cols)


def _hll_regs_sql(from_sql: str, group_exprs: list[str], key_expr: str, b: int) -> str:
    """Shared oracle CTE body: (group..., bucket, mreg) register table."""
    _, K, rmax, mask, _ = _hll_params(b)
    g = ", ".join(group_exprs) + ", " if group_exprs else ""
    gb = ", ".join(str(i + 1) for i in range(len(group_exprs) + 1))
    h = _hash60_sql(f"CAST({key_expr} AS VARCHAR)")
    return f"""
        SELECT {g}(h >> {K}) AS bucket,
               MAX(CASE WHEN (h & {mask}) = 0 THEN {rmax}
                        ELSE {rmax} - length(bin(h & {mask})) END) AS mreg
        FROM (SELECT {g}{h} AS h FROM {from_sql}) hs
        GROUP BY {gb}
    """


def distinct_hll_sql(
    from_sql: str, group_cols: list[str], key_expr: str, b: int = 9
) -> str:
    """DuckDB mirror of distinct_hll (same integer registers, same single
    division literal)."""
    m, _, rmax, _, A = _hll_params(b)
    g = ", ".join(group_cols)
    return f"""
        WITH regs AS ({_hll_regs_sql(from_sql, group_cols, key_expr, b)}),
        agg AS (
            SELECT {g},
                   CAST(SUM(1::BIGINT << CAST({rmax} - mreg AS INT)) AS BIGINT)
                       AS s_present,
                   COUNT(*) AS nb
            FROM regs GROUP BY {g}
        )
        SELECT {g},
               {A!r} / CAST(s_present + ({m} - nb) * (1::BIGINT << {rmax}) AS DOUBLE)
                   AS est_hll,
               CAST({m} - nb AS BIGINT) AS zero_registers
        FROM agg ORDER BY {g}
    """


def distinct_hll_merged(
    df: DataFrame,
    shard_cols: list[str],
    key_col: str,
    b: int = 9,
) -> DataFrame:
    """GLOBAL distinct estimate by MERGING per-shard HLL register tables
    (element-wise MAX — never rescanning raw keys): the HLL merge law is
    max-per-register, so merged registers are IDENTICAL to the registers
    a direct global sketch would hold. The oracle computes that direct
    global sketch from the raw keys; a green gate row is a bit-exact
    proof of the merge on real data, mirroring distinct_kmv_merged.

    Output: one row (est_hll double, zero_registers long, n_exact long).

    The 100 TB shape: a register table is m small ints per shard
    (2 KiB at b=9) — per-day sketches roll up to month/year/corpus
    without re-reading history, and unlike KMV the size never grows
    with cardinality.
    """
    m, K, rmax, mask, A = _hll_params(b)
    h = hash60(F.col(key_col).cast("string"))
    w = h.bitwiseAND(F.lit(mask))
    rho = F.when(w == 0, F.lit(rmax)).otherwise(F.lit(rmax) - F.length(F.bin(w)))
    shard_regs = (
        df.select(*shard_cols, F.shiftright(h, K).alias("bucket"), rho.alias("mreg"))
        .groupBy(*shard_cols, "bucket")
        .agg(F.max("mreg").alias("mreg"))
    )
    merged = shard_regs.groupBy("bucket").agg(F.max("mreg").alias("mreg"))
    agg = merged.groupBy().agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({rmax} - mreg AS INT))")
        ).alias("s_present"),
        F.count(F.lit(1)).alias("nb"),
    )
    s = F.col("s_present") + (F.lit(m) - F.col("nb")) * F.lit(1 << rmax)
    exact = df.select(F.col(key_col).cast("string").alias("s")).distinct().count()
    return agg.select(
        (F.lit(A) / s.cast("double")).alias("est_hll"),
        (F.lit(m) - F.col("nb")).cast("long").alias("zero_registers"),
        F.lit(exact).cast("long").alias("n_exact"),
    )


def distinct_hll_merged_sql(from_sql: str, key_expr: str, b: int = 9) -> str:
    """Oracle: the DIRECT global register table over the raw keys (no
    shard stage) — equality with the Spark merge path proves the law."""
    m, _, rmax, _, A = _hll_params(b)
    key = f"CAST({key_expr} AS VARCHAR)"
    return f"""
        WITH regs AS ({_hll_regs_sql(from_sql, [], key_expr, b)}),
        agg AS (
            SELECT CAST(SUM(1::BIGINT << CAST({rmax} - mreg AS INT)) AS BIGINT)
                       AS s_present,
                   COUNT(*) AS nb
            FROM regs
        )
        SELECT {A!r} / CAST(s_present + ({m} - nb) * (1::BIGINT << {rmax}) AS DOUBLE)
                   AS est_hll,
               CAST({m} - nb AS BIGINT) AS zero_registers,
               (SELECT COUNT(DISTINCT {key}) FROM {from_sql}) AS n_exact
        FROM agg
    """


def bloom_decontaminate(
    documents: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    m_bits: int = 1 << 15,
    k: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination through a BLOOM FILTER instead of the
    exact gram join (functions/text.py ngram_contamination): the eval
    set's word n-grams are folded into an m_bits-bit filter (k salted
    positions per gram, double hashing h1 + i*h2 per Kirsch-Mitzenmacher
    2006), and every corpus gram probes the filter. One-sided error:
    never misses a truly contaminated gram, may overflag (the oracle
    mirrors the SAME filter, so Spark and DuckDB agree bit-for-bit
    INCLUDING any false positives — the gate proves the mechanics).

    Output: (doc_id, flagged_grams, n_grams, flagged_frac) for docs with
    at least one flagged gram, ordered by doc_id.

    Why this exists next to the exact join: at 100 TB the corpus side is
    identical (explode + broadcast probe), but the broadcast payload
    stops scaling with the eval set — a filter over 100M eval grams is
    m_bits/8 bytes (fixed, e.g. 128 MiB at 2^30 bits) versus 800 MB of
    raw 64-bit gram hashes, and filters from MANY eval suites OR
    together into one probe table (mergeable, like every sketch here).
    Bits pack 60 per int64 word (DuckDB errors on 1<<63, and 60 keeps
    the shift domain identical in both engines).
    """
    from .dedup import _shingles, _spread

    salts = F.array(*[F.lit(i) for i in range(k)])
    md5 = F.md5(F.col("gram"))
    h1 = F.conv(F.substring(md5, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(md5, 17, 15), 16, 10).cast("long")
    pos = F.pmod(h1 + F.col("i") * h2, F.lit(m_bits))
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 60 AS INT))")

    bloom = (
        _spread(eval_docs)
        .select(F.explode(_shingles(F.col(text_col), n)).alias("gram"))
        .distinct()
        .select("gram", F.explode(salts).alias("i"))
        .select(pos.alias("pos"))
        .select(
            F.floor(F.col("pos") / 60).cast("long").alias("word"), mask.alias("mask")
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    probes = (
        _spread(documents)
        .select("doc_id", _shingles(F.col(text_col), n).alias("grams"))
        .select(
            "doc_id",
            F.size("grams").cast("long").alias("n_grams"),
            F.explode("grams").alias("gram"),
        )
        .select("doc_id", "n_grams", "gram", F.explode(salts).alias("i"))
        .select("doc_id", "n_grams", "gram", pos.alias("pos"))
        .select(
            "doc_id",
            "n_grams",
            "gram",
            F.floor(F.col("pos") / 60).cast("long").alias("word"),
            mask.alias("mask"),
        )
    )
    gram_hits = (
        probes.join(F.broadcast(bloom), "word")
        .filter(F.col("bits").bitwiseAND(F.col("mask")) != 0)
        .groupBy("doc_id", "n_grams", "gram")
        .agg(F.count(F.lit(1)).alias("npos"))
        .filter(F.col("npos") == k)
    )
    return (
        gram_hits.groupBy("doc_id", "n_grams")
        .agg(F.count(F.lit(1)).alias("flagged_grams"))
        .select(
            "doc_id",
            "flagged_grams",
            "n_grams",
            (F.col("flagged_grams") / F.col("n_grams")).alias("flagged_frac"),
        )
        .orderBy("doc_id")
    )


def bloom_decontaminate_sql(
    eval_filter_sql: str, n: int = 8, m_bits: int = 1 << 15, k: int = 5
) -> str:
    """DuckDB mirror of bloom_decontaminate over the documents view (same
    filter construction, same probe arithmetic — h1/h2 are md5 hex chars
    1-15 and 17-31, positions (h1 + i*h2) % m_bits, 60-bit words)."""
    from .dedup import _shingle_sql

    salts = ", ".join(f"({i})" for i in range(k))
    return f"""
        WITH eg AS (
            SELECT DISTINCT shingle AS gram FROM ({_shingle_sql(n)}) e
            WHERE doc_id IN (SELECT doc_id FROM documents WHERE {eval_filter_sql})
        ),
        salts(i) AS (SELECT * FROM (VALUES {salts})),
        epos AS (
            SELECT (('0x' || substr(md5(gram), 1, 15))::BIGINT
                    + i * ('0x' || substr(md5(gram), 17, 15))::BIGINT)
                   % {m_bits} AS pos
            FROM eg CROSS JOIN salts
        ),
        bloom AS (
            SELECT pos // 60 AS word,
                   bit_or(1::BIGINT << CAST(pos % 60 AS INT)) AS bits
            FROM epos GROUP BY 1
        ),
        cg AS (SELECT doc_id, shingle AS gram FROM ({_shingle_sql(n)})),
        sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM cg GROUP BY 1),
        cpos AS (
            SELECT doc_id, gram,
                   (('0x' || substr(md5(gram), 1, 15))::BIGINT
                    + i * ('0x' || substr(md5(gram), 17, 15))::BIGINT)
                   % {m_bits} AS pos
            FROM cg CROSS JOIN salts
        ),
        hit AS (
            SELECT doc_id, gram, COUNT(*) AS npos
            FROM cpos JOIN bloom ON bloom.word = cpos.pos // 60
            WHERE (bloom.bits & (1::BIGINT << CAST(cpos.pos % 60 AS INT))) <> 0
            GROUP BY 1, 2
        ),
        fl AS (
            SELECT doc_id, COUNT(*) AS flagged_grams
            FROM hit WHERE npos = {k} GROUP BY 1
        )
        SELECT fl.doc_id,
               CAST(flagged_grams AS BIGINT) AS flagged_grams,
               CAST(n_grams AS BIGINT) AS n_grams,
               flagged_grams / n_grams AS flagged_frac
        FROM fl JOIN sizes USING (doc_id) ORDER BY fl.doc_id
    """


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


def source_jaccard_kmv(
    documents: DataFrame,
    n: int = 3,
    k: int = 256,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Pairwise corpus overlap between SOURCES via KMV sketches — the
    dataset-level dedup diagnostic ("which crawls overlap, and how
    much?") that doc-pair dedup cannot answer without an all-pairs pass.

    Each source's shingle set reduces to its k smallest 60-bit hashes;
    for a pair (A, B) the k-minimum-values Jaccard estimator is
    |{bottom-k of A∪B} ∩ A ∩ B| / min(k, |A∪B sketch|) (Broder 1997 /
    Beyer et al. 2007) — when the union fits inside k the estimate is
    EXACT. Everything is integer until the single final division, so the
    DuckDB oracle (same estimator, same md5 hash order) matches
    bit-for-bit.

    Scale shape: per-source state is k hashes regardless of corpus size
    (the shingle explode + distinct is one shuffle keyed by (source,
    shingle)); the pair stage expands sketches x pairs via a broadcast of
    the source-pair grid — sized for dashboard-scale source counts
    (hundreds); at thousands of sources, shard the grid.

    Output: (source_a, source_b, n_shared long, est_jaccard double),
    pair-ordered.
    """
    from .dedup import _shingles

    sh = documents.select(
        F.col(group_col).alias("src"),
        F.explode(_shingles(F.col(text_col), n)).alias("shingle"),
    ).distinct()
    sk = (
        sh.select("src", hash60(F.col("shingle")).alias("h"))
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("src").orderBy("h"))
        )
        .filter(F.col("rn") <= k)
        .select("src", "h")
    )
    srcs = sk.select("src").distinct()
    pairs = (
        srcs.select(F.col("src").alias("sa"))
        .crossJoin(srcs.select(F.col("src").alias("sb")))
        .filter(F.col("sa") < F.col("sb"))
    )
    u = sk.join(
        F.broadcast(pairs),
        (F.col("src") == F.col("sa")) | (F.col("src") == F.col("sb")),
    )
    d = u.groupBy("sa", "sb", "h").agg(F.count(F.lit(1)).alias("cnt"))
    wp = Window.partitionBy("sa", "sb")
    r = d.withColumn("rn", F.row_number().over(wp.orderBy("h"))).withColumn(
        "s", F.count(F.lit(1)).over(wp)
    )
    shared = F.sum(
        F.when((F.col("rn") <= k) & (F.col("cnt") == 2), 1).otherwise(0)
    ).cast("long")
    denom = F.least(F.lit(k).cast("long"), F.max("s"))
    return (
        r.groupBy(F.col("sa").alias("source_a"), F.col("sb").alias("source_b"))
        .agg(
            shared.alias("n_shared"),
            (shared.cast("double") / denom.cast("double")).alias("est_jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


def source_jaccard_kmv_sql(
    n: int = 3, k: int = 256, group_col: str = "source"
) -> str:
    """DuckDB mirror: identical shingling, hash order, and estimator."""
    nm1 = n - 1
    return f"""
        WITH sh AS (
            SELECT DISTINCT src, shingle FROM (
                SELECT {group_col} AS src, UNNEST(list_distinct(list_transform(
                    range(1, greatest(len(string_split(text, ' ')) - {nm1}, 0) + 1),
                    i -> array_to_string(string_split(text, ' ')[i:i+{nm1}], ' ')))) AS shingle
                FROM documents
            )
        ), hs AS (
            SELECT src, {_hash60_sql('shingle')} AS h FROM sh
        ), sk AS (
            SELECT src, h FROM (
                SELECT src, h, ROW_NUMBER() OVER (PARTITION BY src ORDER BY h) AS rn
                FROM hs
            ) WHERE rn <= {k}
        ), srcs AS (SELECT DISTINCT src FROM sk
        ), pairs AS (
            SELECT a.src AS sa, b.src AS sb FROM srcs a JOIN srcs b ON a.src < b.src
        ), u AS (
            SELECT p.sa, p.sb, s.h FROM sk s
            JOIN pairs p ON s.src = p.sa OR s.src = p.sb
        ), d AS (
            SELECT sa, sb, h, COUNT(*) AS cnt FROM u GROUP BY 1, 2, 3
        ), r AS (
            SELECT sa, sb, h, cnt,
                   ROW_NUMBER() OVER (PARTITION BY sa, sb ORDER BY h) AS rn,
                   COUNT(*) OVER (PARTITION BY sa, sb) AS s
            FROM d
        )
        SELECT sa AS source_a, sb AS source_b,
               CAST(SUM(CASE WHEN rn <= {k} AND cnt = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_shared,
               CAST(SUM(CASE WHEN rn <= {k} AND cnt = 2 THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(LEAST({k}, MAX(s)) AS DOUBLE) AS est_jaccard
        FROM r GROUP BY sa, sb ORDER BY source_a, source_b
    """
