"""End-to-end corpus cleaning — the canonical LLM-training-data pipeline,
composed from this repo's primitives in ONE declarative plan:

    language filter  ∧  quality filter  ∧  exact-dedup keeper
        ∧  NOT minhash-near-duplicate (keep-lowest-id policy)

Everything is DataFrame composition, so Catalyst fuses the four filters
into one pass over `documents` plus the (sub-quadratic) LSH candidate
join; the survivor set and each doc's token count come out in a single
job. At 100 TB each stage's shuffle is keyed by 64-bit hashes or doc ids,
never raw text (see functions/dedup.py scale notes).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup, text


def clean_corpus(
    documents: DataFrame,
    lang: str = "en",
    min_tokens: int = 20,
    min_stopword_ratio: float = 0.05,
    neardup_threshold: float = 0.8,
    text_col: str = "text",
) -> DataFrame:
    """Survivor docs after the full cleaning ladder.

    Output: (doc_id, n_tokens), doc_id-ordered. Near-dup policy: for every
    minhash-LSH pair with est_jaccard >= threshold, the higher doc_id is
    dropped (greedy keep-lowest, the standard large-scale policy — not a
    transitive closure, which would need an iterative connected-components
    pass).
    """
    lang_ok = text.lang_id(documents, text_col).filter(
        F.col("pred_lang") == lang
    ).select("doc_id")
    qual = text.quality_stats(documents, text_col).filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
    ).select("doc_id", "n_tokens")
    keepers = (
        documents.groupBy(F.md5(F.col(text_col)).alias("_th"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    near_b = (
        dedup.minhash_lsh_pairs(documents, text_col=text_col)
        .filter(F.col("est_jaccard") >= neardup_threshold)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return (
        documents.select("doc_id")
        .join(lang_ok, "doc_id", "semi")
        .join(qual, "doc_id")  # inner: also carries n_tokens
        .join(keepers, "doc_id", "semi")
        .join(near_b, "doc_id", "anti")
        .select("doc_id", "n_tokens")
        .orderBy("doc_id")
    )


def train_val_test_split(
    documents: DataFrame,
    weights: tuple[int, int, int] = (80, 10, 10),
    salt: str = "split-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment by salted id hash.

    The property that matters for a training corpus: the split is a pure
    function of (salt, id) — stable under corpus growth, repartitioning,
    re-runs, and engine version, unlike ``randomSplit`` (which depends on
    partitioning). New documents never move existing ones between splits.
    One narrow projection, no shuffle: the split column is computed where
    the row already lives. Change ``salt`` to draw a fresh partition.

    Output: (doc_id, split) with split in {'train','val','test'},
    hash-bucketed 0-99 against cumulative ``weights`` (must sum to 100).
    """
    assert sum(weights) == 100, "weights are percents and must sum to 100"
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
        % 100
    )
    split = (
        F.when(bucket < weights[0], F.lit("train"))
        .when(bucket < weights[0] + weights[1], F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return documents.select(F.col(id_col), split.alias("split")).orderBy(id_col)


def pack_token_shards(
    documents: DataFrame,
    budget_tokens: int = 2048,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Assign documents to fixed-token-budget training shards — the
    GPT-style stream-packing convention: concatenate documents in a
    deterministic order (group, doc_id) and cut every ``budget_tokens``;
    a document may straddle a shard boundary (its ``offset_in_shard``
    says where it starts in its shard).

    Scale design: ONE window pass, partitioned by ``group_col`` (source /
    language / date-bucket), so each group's running sum is independent —
    the natural parallel unit for mixture-of-sources corpora. A single
    global stream (group_col=None semantics) would serialize the cumsum
    into one task and is deliberately not offered. All integer
    arithmetic: shard ids are reproducible bit-for-bit on any engine.
    """
    from pyspark.sql import Window

    from .text import token_counts

    toks = token_counts(documents, text_col).select("doc_id", "n_tokens")
    df = documents.select(group_col, "doc_id").join(toks, "doc_id")
    w = (
        Window.partitionBy(group_col)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return df.select(
        "doc_id",
        F.col(group_col).alias("source"),
        "n_tokens",
        cum_before.alias("cum_before"),
    ).select(
        "doc_id",
        "source",
        "n_tokens",
        F.expr(f"cum_before DIV {int(budget_tokens)}").alias("shard_id"),
        (F.col("cum_before") % F.lit(int(budget_tokens))).alias("offset_in_shard"),
    ).orderBy("source", "doc_id")


def mixture_sample(
    documents: DataFrame,
    weights: Mapping[str, float],
    salt: str = "mix-v1",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted mixture over sources: keep a
    ``weights[source]`` fraction of each source's documents, chosen by
    salted id hash (same stability contract as train_val_test_split —
    pure function of (salt, id), immune to partitioning/corpus growth;
    a new salt draws a fresh sample). Sources absent from ``weights``
    are dropped. Pure narrow filter: no shuffle, no sampling state.

    Output: (doc_id, source), the surviving mixture.
    """
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
        % 10_000
    )
    keep = F.lit(False)
    for src, frac in sorted(weights.items()):
        keep = keep | ((F.col(group_col) == F.lit(src)) & (bucket < int(frac * 10_000)))
    return (
        documents.filter(keep)
        .select(F.col(id_col), F.col(group_col).alias("source"))
        .orderBy(id_col)
    )


def mixture_upsample(
    documents: DataFrame,
    weights: Mapping[str, float],
    salt: str = "mix-v1",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted mixture supporting UPSAMPLING: weight 2.7 emits every doc
    of that source 2 times plus a salted-hash-chosen 70% of docs a 3rd
    time — how pre-training mixes repeat high-quality sources (epochs >
    1) while downsampling crawl. Deterministic: a pure function of
    (salt, id), stable under partitioning and corpus growth.

    Scale shape: a narrow projection + bounded explode (copies ≤
    ceil(max weight)); no shuffle, no sampling state.

    Output: (doc_id, source, copy) with copy in [0, n_copies); sources
    absent from ``weights`` are dropped.
    """
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
        % 10_000
    )
    n_copies = F.lit(0)
    for src, w in sorted(weights.items()):
        whole = int(w)
        frac_bps = int(round((w - whole) * 10_000))
        n_copies = F.when(
            F.col(group_col) == F.lit(src),
            F.lit(whole) + F.when(bucket < frac_bps, 1).otherwise(0),
        ).otherwise(n_copies)
    return (
        documents.select(
            F.col(id_col), F.col(group_col).alias("source"), n_copies.alias("n")
        )
        .filter(F.col("n") > 0)
        .select(
            id_col,
            "source",
            F.explode(F.sequence(F.lit(0), F.col("n") - 1)).alias("copy"),
        )
        .select(id_col, "source", F.col("copy").cast("long").alias("copy"))
        .orderBy(id_col, "copy")
    )


def mixture_upsample_oracle_sql(weights: Mapping[str, float], salt: str) -> str:
    cases = []
    for src, w in sorted(weights.items()):
        whole = int(w)
        frac_bps = int(round((w - whole) * 10_000))
        cases.append(
            f"WHEN source = '{src}' THEN {whole} + CASE WHEN hv < {frac_bps} THEN 1 ELSE 0 END"
        )
    case_sql = "CASE " + " ".join(cases) + " ELSE 0 END"
    return f"""
        WITH h AS (
            SELECT doc_id, source,
                   ('0x' || substr(md5('{salt}' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                       % 10000 AS hv
            FROM documents
        ), n AS (
            SELECT doc_id, source, {case_sql} AS n FROM h
        )
        SELECT doc_id, source, CAST(UNNEST(generate_series(0, n - 1)) AS BIGINT) AS copy
        FROM n WHERE n > 0
        ORDER BY doc_id, copy
    """


def global_shuffle(
    documents: DataFrame,
    n_shards: int = 64,
    salt: str = "shuffle-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic training-order shuffle: every document gets a
    (shard, pos_in_shard) slot from a salted hash — the reproducible
    global shuffle a training run needs (same (salt, corpus) -> same
    order on any cluster, any partitioning).

    Scale shape: the hash is a narrow projection; position assignment is
    a row_number WINDOW PER SHARD (never a global single-partition sort —
    the classic driver-bottleneck mistake). Readers consume shards in id
    order, rows in pos order: a total order without any global sort.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    from pyspark.sql import Window

    df = documents.select(F.col(id_col), h.alias("h"))
    w = Window.partitionBy(F.col("h") % n_shards).orderBy("h", id_col)
    return (
        df.select(
            id_col,
            (F.col("h") % n_shards).alias("shard"),
            F.row_number().over(w).cast("long").alias("pos_in_shard"),
        )
        .orderBy("shard", "pos_in_shard")
    )


def global_shuffle_oracle_sql(n_shards: int, salt: str) -> str:
    return f"""
        WITH h AS (
            SELECT doc_id,
                   ('0x' || substr(md5('{salt}' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
            FROM documents
        )
        SELECT doc_id,
               h % {n_shards} AS shard,
               CAST(ROW_NUMBER() OVER (PARTITION BY h % {n_shards} ORDER BY h, doc_id) AS BIGINT)
                   AS pos_in_shard
        FROM h ORDER BY shard, pos_in_shard
    """


def stratified_sample(
    documents: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "strat-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum deterministic sampling — the mixture-rebalancing
    primitive (e.g. keep 100% of rare languages, 5% of English crawl).

    Same stability contract as train_val_test_split: inclusion is a pure
    function of (salt, id), so the sample is stable under corpus growth,
    repartitioning and engine version, and DIFFERENT strata draw from the
    same hash stream (a doc that survives at 5% also survives at 10% —
    nested samples for ablations). Fractions are quantized to millionths.
    One narrow projection + filter, no shuffle. Strata not listed in
    ``fractions`` fall back to ``default_fraction``.

    Output: the sampled rows (doc_id, <strata_col>).
    """
    hv = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
        % 1000000
    )
    thr = F.lit(int(round(default_fraction * 1000000)))
    for k, v in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == k, F.lit(int(round(v * 1000000)))).otherwise(thr)
    return (
        documents.select(id_col, strata_col)
        .filter(hv < thr)
        .orderBy(id_col)
    )


def stratified_sample_oracle_sql(
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "strat-v1",
) -> str:
    cases = " ".join(
        f"WHEN {strata_col} = '{k}' THEN {int(round(v * 1000000))}"
        for k, v in sorted(fractions.items())
    )
    return f"""
        SELECT doc_id, {strata_col}
        FROM (
            SELECT doc_id, {strata_col},
                   ('0x' || substr(md5('{salt}' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000 AS hv
            FROM documents
        )
        WHERE hv < (CASE {cases} ELSE {int(round(default_fraction * 1000000))} END)
        ORDER BY doc_id
    """



ORACLES = {
    # mirrors pack_token_shards(budget_tokens=2048, group_col='source')
    "pack_token_shards": """
        WITH t AS (
            SELECT doc_id, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        ),
        c AS (
            SELECT doc_id, source, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS cum_before
            FROM t
        )
        SELECT doc_id, source, n_tokens,
               CAST(cum_before // 2048 AS BIGINT) AS shard_id,
               CAST(cum_before % 2048 AS BIGINT) AS offset_in_shard
        FROM c ORDER BY source, doc_id
    """,
    # mirrors mixture_sample(weights={'src0':1.0,'src1':.5,'src2':.25,'src3':.1})
    "mixture_sample": """
        SELECT doc_id, source FROM (
            SELECT doc_id, source,
                   ('0x' || substr(md5('mix-v1' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                       % 10000 AS hv
            FROM documents
        )
        WHERE (source = 'src0' AND hv < 10000)
           OR (source = 'src1' AND hv < 5000)
           OR (source = 'src2' AND hv < 2500)
           OR (source = 'src3' AND hv < 1000)
        ORDER BY doc_id
    """,
    # mirrors train_val_test_split(weights=(80,10,10), salt='split-v1')
    "train_val_test_split": """
        SELECT doc_id,
               CASE WHEN hv < 80 THEN 'train'
                    WHEN hv < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT doc_id,
                   ('0x' || substr(md5('split-v1' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS hv
            FROM documents
        )
        ORDER BY doc_id
    """,
}


def pipeline_funnel(
    documents: DataFrame,
    lang: str = "en",
    min_tokens: int = 20,
    min_stopword_ratio: float = 0.05,
    neardup_threshold: float = 0.8,
    text_col: str = "text",
) -> DataFrame:
    """Per-stage attrition report for the clean_corpus ladder — the
    observability every production data pipeline publishes next to its
    output (how many docs/tokens survived language ID, quality, exact
    dedup, near-dedup).

    Output: (stage_ord, stage, n_docs, n_tokens), 5 rows:
    input -> lang -> quality -> exact_dedup -> neardup, each cumulative.

    Plan shape: stage predicates become per-doc BOOLEAN columns (left
    joins against the same frames clean_corpus semi/anti-joins — Catalyst
    shares the subplans), then ONE global aggregation computes all five
    (count, token-sum) pairs as conditional sums, and a 5-element
    explode shapes the report. No per-stage re-scan of the corpus: the
    funnel costs one pass + the LSH candidate join, the same as
    clean_corpus itself. All outputs are integers — no float drift.
    """
    nt = F.size(F.split(F.col(text_col), " ")).cast("long")
    lang_ok = text.lang_id(documents, text_col).filter(
        F.col("pred_lang") == lang
    ).select("doc_id", F.lit(1).alias("_l"))
    qual = text.quality_stats(documents, text_col).filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
    ).select("doc_id", F.lit(1).alias("_q"))
    keepers = (
        documents.groupBy(F.md5(F.col(text_col)).alias("_th"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", F.lit(1).alias("_k"))
    )
    near_b = (
        dedup.minhash_lsh_pairs(documents, text_col=text_col)
        .filter(F.col("est_jaccard") >= neardup_threshold)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("_n", F.lit(1))
    )
    flagged = (
        documents.select("doc_id", nt.alias("nt"))
        .join(lang_ok, "doc_id", "left")
        .join(qual, "doc_id", "left")
        .join(keepers, "doc_id", "left")
        .join(near_b, "doc_id", "left")
        .select(
            "nt",
            F.col("_l").isNotNull().alias("c1"),
            (F.col("_l").isNotNull() & F.col("_q").isNotNull()).alias("c2"),
            (
                F.col("_l").isNotNull()
                & F.col("_q").isNotNull()
                & F.col("_k").isNotNull()
            ).alias("c3"),
            (
                F.col("_l").isNotNull()
                & F.col("_q").isNotNull()
                & F.col("_k").isNotNull()
                & F.col("_n").isNull()
            ).alias("c4"),
        )
    )

    def _pair(cond):
        return [
            F.sum(F.when(cond, 1).otherwise(0)).cast("long"),
            F.sum(F.when(cond, F.col("nt")).otherwise(0)).cast("long"),
        ]

    agg = flagged.agg(
        F.count(F.lit(1)).cast("long").alias("d0"),
        F.sum("nt").cast("long").alias("t0"),
        *[c.alias(n) for c, n in zip(_pair(F.col("c1")), ["d1", "t1"])],
        *[c.alias(n) for c, n in zip(_pair(F.col("c2")), ["d2", "t2"])],
        *[c.alias(n) for c, n in zip(_pair(F.col("c3")), ["d3", "t3"])],
        *[c.alias(n) for c, n in zip(_pair(F.col("c4")), ["d4", "t4"])],
    )
    stages = ["input", "lang", "quality", "exact_dedup", "neardup"]
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("stage_ord"),
                F.lit(s).alias("stage"),
                F.col(f"d{i}").alias("n_docs"),
                F.col(f"t{i}").alias("n_tokens"),
            )
            for i, s in enumerate(stages)
        ]
    )
    return (
        agg.select(F.explode(rows).alias("r"))
        .select("r.stage_ord", "r.stage", "r.n_docs", "r.n_tokens")
        .orderBy("stage_ord")
    )


def clean_corpus_decontaminated(
    documents: DataFrame,
    eval_docs: DataFrame,
    lang: str = "en",
    min_tokens: int = 20,
    min_stopword_ratio: float = 0.05,
    neardup_threshold: float = 0.8,
    contamination_n: int = 8,
    max_contamination_frac: float = 0.0,
    text_col: str = "text",
) -> DataFrame:
    """clean_corpus plus the benchmark-decontamination stage — the FULL
    pre-training hygiene ladder:

        lang ∧ quality ∧ exact-dedup ∧ ¬near-dup ∧ ¬contaminated

    A doc is contaminated when the fraction of its word n-grams found in
    the eval set exceeds ``max_contamination_frac`` (default 0: ANY
    shared n-gram drops the doc — the conservative published practice).
    Docs that are themselves IN the eval set are dropped by the same
    rule (self-overlap is total).

    Plan shape: the four clean_corpus stages fuse as before; the
    decontamination adds one broadcast join against the (tiny) eval-set
    gram hashes and one anti-join — the corpus side still never shuffles
    on the gram key (see text.ngram_contamination scale notes).
    """
    contaminated = (
        text.ngram_contamination(documents, eval_docs, n=contamination_n, text_col=text_col)
        .filter(F.col("contamination_frac") > max_contamination_frac)
        .select("doc_id")
    )
    return (
        clean_corpus(
            documents,
            lang=lang,
            min_tokens=min_tokens,
            min_stopword_ratio=min_stopword_ratio,
            neardup_threshold=neardup_threshold,
            text_col=text_col,
        )
        .join(contaminated, "doc_id", "anti")
        .orderBy("doc_id")
    )


def shard_manifest(
    documents: DataFrame,
    budget_tokens: int = 2048,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Manifest rollup of pack_token_shards — what the trainer's data
    loader reads before touching a shard: per (group, shard): how many
    docs START in it, their token mass, and the fill fraction of the
    budget. The packing-quality report (underfilled tails, straddle
    rates) for capacity planning.

    Integer counts/sums + ONE double division (fill_frac), so the
    oracle matches exactly. One extra groupBy over the packing output —
    the manifest is shard-count-sized regardless of corpus size.
    """
    packed = pack_token_shards(documents, budget_tokens, group_col, text_col)
    return (
        packed.groupBy(group_col, "shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
            F.min("offset_in_shard").cast("long").alias("first_offset"),
        )
        .withColumn(
            "fill_frac",
            F.col("sum_tokens").cast("double") / F.lit(float(budget_tokens)),
        )
        .orderBy(group_col, "shard_id")
    )


def shard_manifest_oracle_sql(budget_tokens: int = 2048) -> str:
    """DuckDB mirror over the pack_token_shards oracle shape."""
    return f"""
        WITH t AS (
            SELECT doc_id, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        ), c AS (
            SELECT doc_id, source, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS cum_before
            FROM t
        ), packed AS (
            SELECT doc_id, source, n_tokens,
                   CAST(cum_before // {budget_tokens} AS BIGINT) AS shard_id,
                   CAST(cum_before % {budget_tokens} AS BIGINT) AS offset_in_shard
            FROM c
        )
        SELECT source, shard_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
               CAST(MIN(offset_in_shard) AS BIGINT) AS first_offset,
               CAST(SUM(n_tokens) AS DOUBLE) / {float(budget_tokens)!r} AS fill_frac
        FROM packed GROUP BY source, shard_id
        ORDER BY source, shard_id
    """


def weighted_sample(
    documents: DataFrame,
    weight_col: str = "n_chars",
    n_draws: int = 64,
    salt: str = "wsam-v1",
    n_buckets: int = 32,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITH replacement, P(doc per draw) ∝ its integer
    weight — the token-proportional document sampler (sample training
    docs ∝ token count rather than uniformly, the standard mixture-epoch
    draw). Exact inverse-CDF over INTEGER cumulative weights with
    deterministic md5 draws: zero float ops, so Spark and DuckDB agree
    bit-for-bit, and reruns are reproducible by (salt, draw index).

    The prefix sum is two-level so no global single-partition window
    exists at scale: within-bucket cumulative sums run under
    ``Window.partitionBy(bucket)`` (docs hash into ``n_buckets`` by id),
    and the cross-bucket offsets are a bucket-count-sized aggregate —
    the classic distributed scan. Draw resolution is bucket-keyed (r7):
    each draw is routed to its weight-bucket driver-side-free via a
    literal-array scan over the n_buckets cumulative offsets (pure
    codegen, n_draws * n_buckets comparisons, no join), then an
    EQUI-join on the bucket id pairs each draw only with that bucket's
    docs — cost n_docs * n_draws / n_buckets comparisons instead of the
    former O(n_docs * n_draws) broadcast nested-loop interval join.
    Raise ``n_buckets`` when n_draws approaches corpus size (the
    mixture-epoch case); the plan shape is unchanged.

    Requires ``id_col`` castable to long (bucketing is ``pmod(id,
    n_buckets)`` so the oracle SQL can mirror it exactly); an empty or
    all-nonpositive weight table returns an empty result rather than
    erroring.

    Output: (draw_id, doc_id, weight), draw_id-ordered.
    """
    w = documents.select(
        F.col(id_col).alias("doc_id"),
        F.col(weight_col).cast("long").alias("w"),
        F.pmod(F.col(id_col).cast("long"), F.lit(n_buckets)).alias("b"),
    ).filter(F.col("w") > 0)
    from pyspark.sql import Window

    in_bucket = (
        Window.partitionBy("b")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = w.withColumn("hi_local", F.sum("w").over(in_bucket))
    boff = (
        w.groupBy("b")
        .agg(F.sum("w").alias("bw"))
        .withColumn(
            "off",
            F.coalesce(
                F.sum("bw").over(
                    Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("b", "off")
    )
    iv = cum.join(F.broadcast(boff), "b").select(
        "b",
        "doc_id",
        "w",
        (F.col("off") + F.col("hi_local") - F.col("w")).alias("lo"),
        (F.col("off") + F.col("hi_local")).alias("hi"),
    )
    spark = documents.sparkSession
    # Bounded driver reads: one scalar + n_buckets (b, off) rows. The
    # offsets become a LITERAL array so draw->bucket routing is a pure
    # codegen scan — no nested-loop join anywhere in the plan.
    spans = sorted(
        (r["b"], r["off"]) for r in boff.collect()
    )  # ascending b == ascending off
    if not spans:
        id_type = documents.select(F.col(id_col).alias("doc_id")).schema[0].dataType
        from pyspark.sql.types import LongType, StructField, StructType

        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("draw_id", LongType()),
                    StructField("doc_id", id_type),
                    StructField("weight", LongType()),
                ]
            ),
        )
    total = w.groupBy().agg(F.sum("w")).collect()[0][0]  # one scalar
    offs_arr = F.array(*[F.lit(int(off)) for _, off in spans])
    bs_arr = F.array(*[F.lit(int(b)) for b, _ in spans])
    draws = spark.range(n_draws).select(
        F.col("id").alias("draw_id"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(salt + ":"), F.col("id").cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % F.lit(int(total))
        ).alias("r"),
    )
    draws_b = draws.withColumn(
        "b",
        F.element_at(
            bs_arr, F.size(F.filter(offs_arr, lambda o: o <= F.col("r")))
        ),
    )
    return (
        iv.join(F.broadcast(draws_b), "b")
        .filter((F.col("r") >= F.col("lo")) & (F.col("r") < F.col("hi")))
        .select("draw_id", "doc_id", F.col("w").alias("weight"))
        .orderBy("draw_id")
    )


def weighted_sample_oracle_sql(
    weight_col: str = "n_chars",
    n_draws: int = 64,
    salt: str = "wsam-v1",
    n_buckets: int = 32,
) -> str:
    """DuckDB mirror: identical bucketed integer prefix sums + md5 draws."""
    return f"""
        WITH w AS (
            SELECT doc_id, CAST({weight_col} AS BIGINT) AS w,
                   doc_id % {n_buckets} AS b
            FROM documents WHERE {weight_col} > 0
        ), cum AS (
            SELECT doc_id, w, b,
                   SUM(w) OVER (PARTITION BY b ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi_local
            FROM w
        ), boff AS (
            SELECT b, COALESCE(SUM(bw) OVER (ORDER BY b
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
            FROM (SELECT b, SUM(w) AS bw FROM w GROUP BY b)
        ), iv AS (
            SELECT c.doc_id, c.w,
                   o.off + c.hi_local - c.w AS lo,
                   o.off + c.hi_local AS hi
            FROM cum c JOIN boff o USING (b)
        ), tot AS (SELECT SUM(w) AS t FROM w
        ), draws AS (
            SELECT r.range AS draw_id,
                   ('0x' || substr(md5('{salt}:' || CAST(r.range AS VARCHAR)), 1, 15))::BIGINT
                       % (SELECT t FROM tot) AS r
            FROM range({n_draws}) r
        )
        SELECT d.draw_id, iv.doc_id, iv.w AS weight
        FROM draws d JOIN iv ON d.r >= iv.lo AND d.r < iv.hi
        ORDER BY d.draw_id
    """


def rendezvous_shard_assign(
    documents: DataFrame,
    n_shards: int,
    salt: str = "rdv-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment — the stable
    resharding primitive (Thaler & Ravishankar 1996, the scheme behind
    consistent routing in most production object stores): doc d lands on
    argmax_s hash(salt, d, s). Growing n_shards by one moves EXACTLY the
    docs whose new shard wins the argmax — 1/(S+1) of the corpus in
    expectation — where mod-hashing reshuffles almost everything.

    Deterministic md5 hashing, so assignment is reproducible and
    engine-portable; the argmax is an integer struct-max (ties broken by
    higher shard id, matching the oracle's ORDER BY h DESC, shard DESC).

    Scale shape: docs x n_shards exploded rows through ONE map-side-
    combinable groupBy — no join, no window. For n_shards in the
    thousands, switch the explode to a per-row loop-free top-1 via a
    fused expression; the exploded form keeps whole-stage codegen.

    Output: (doc_id, shard long), doc-ordered.
    """
    spark = documents.sparkSession
    shards = spark.range(n_shards).select(F.col("id").alias("shard"))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.lit(salt), F.col(id_col).cast("string"), F.col("shard").cast("string")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    scored = documents.select(id_col).crossJoin(F.broadcast(shards)).select(
        id_col, "shard", h.alias("h")
    )
    best = scored.groupBy(id_col).agg(
        F.max(F.struct(F.col("h"), F.col("shard"))).alias("top")
    )
    return best.select(
        id_col, F.col("top.shard").cast("long").alias("shard")
    ).orderBy(id_col)


def rendezvous_shard_oracle_sql(n_shards: int, salt: str = "rdv-v1") -> str:
    return f"""
        SELECT doc_id, CAST(shard AS BIGINT) AS shard FROM (
            SELECT d.doc_id, s.range AS shard,
                   ROW_NUMBER() OVER (
                       PARTITION BY d.doc_id
                       ORDER BY ('0x' || substr(md5(
                           '{salt}' || ':' || CAST(d.doc_id AS VARCHAR)
                                   || ':' || CAST(s.range AS VARCHAR)), 1, 15))::BIGINT DESC,
                                s.range DESC) AS rn
            FROM documents d CROSS JOIN range({n_shards}) s
        ) WHERE rn = 1 ORDER BY doc_id
    """


def mixture_temperature_weights(
    documents: DataFrame, q_scale: int = 1 << 20
) -> DataFrame:
    """Temperature-scaled source mixture weights at alpha = 1/2 — the
    standard multi-source rebalancing (sample source s ∝ n_s^alpha,
    alpha < 1 upweights small sources; the multilingual-pretraining
    recipe) with the repo's exact-arithmetic contract: sqrt is the ONE
    correctly-rounded libm-independent float op IEEE 754 mandates, the
    sqrt weight is quantized to ``floor(sqrt(n) * q_scale)`` int64, the
    quantized weights sum as integers (order-free), and each share is a
    single final IEEE division — bit-equal in both engines.

    Scale shape: per-source token counts are one map-side-combinable
    groupBy over a handful of sources; everything after is node-sized.

    Output: (source, n_tokens, share_proportional, share_temperature,
    boost) ordered by source; boost = temperature/proportional shares
    ratio (>1 means the source is upweighted).
    """
    per_src = (
        documents.select(
            "source", F.size(F.split(F.col("text"), " ")).cast("long").alias("nt")
        )
        .groupBy("source")
        .agg(F.sum("nt").alias("n_tokens"))
    )
    q = F.floor(F.sqrt(F.col("n_tokens").cast("double")) * F.lit(q_scale)).cast(
        "long"
    )
    w = per_src.select("source", "n_tokens", q.alias("q"))
    tot = w.groupBy().agg(
        F.sum("n_tokens").alias("tn"), F.sum("q").alias("tq")
    )
    out = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("tn").cast("double")).alias(
            "share_proportional"
        ),
        (F.col("q").cast("double") / F.col("tq").cast("double")).alias(
            "share_temperature"
        ),
        (
            (F.col("q").cast("double") / F.col("tq").cast("double"))
            / (F.col("n_tokens").cast("double") / F.col("tn").cast("double"))
        ).alias("boost"),
    )
    return out.orderBy("source")


def mixture_temperature_oracle_sql(q_scale: int = 1 << 20) -> str:
    """DuckDB mirror: identical sqrt-quantize-to-int64 and final
    divisions."""
    return f"""
        WITH per_src AS (
            SELECT source,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
            FROM documents GROUP BY source
        ), w AS (
            SELECT source, n_tokens,
                   CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * {q_scale})
                        AS BIGINT) AS q
            FROM per_src
        ), tot AS (SELECT SUM(n_tokens) AS tn, SUM(q) AS tq FROM w)
        SELECT source, n_tokens,
               CAST(n_tokens AS DOUBLE) / CAST((SELECT tn FROM tot) AS DOUBLE)
                   AS share_proportional,
               CAST(q AS DOUBLE) / CAST((SELECT tq FROM tot) AS DOUBLE)
                   AS share_temperature,
               (CAST(q AS DOUBLE) / CAST((SELECT tq FROM tot) AS DOUBLE))
                   / (CAST(n_tokens AS DOUBLE)
                      / CAST((SELECT tn FROM tot) AS DOUBLE)) AS boost
        FROM w ORDER BY source
    """
