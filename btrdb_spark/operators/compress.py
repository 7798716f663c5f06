"""Swinging-door trendline (SDT) compression per stream.

The classic telemetry downsampler (PI-historian lineage): keep a sparse
subset of points such that every dropped point is within a tolerance E
of the line between retained neighbors. The reference compresses blocks
losslessly (delta-delta); SDT is the LOSSY domain compressor its users
apply before archival/visualization — a sequential state machine over
time order, which Catalyst windows cannot express (state depends on
prior decisions), so it joins ewma in the Arrow-kernel family
(mapInPandas over a uuid-hash repartition — one kernel call per
partition, streams folded group-by-group inside).

Algorithm (one pass per stream, times strictly increasing after a
max-value-per-timestamp dedup):

    anchor = p[0] (kept);  doors smax=+inf, smin=-inf
    for p in rest:
        dt  = p.t - anchor.t
        smax = min(smax, (p.v - anchor.v + E) / dt)   # upper door
        smin = max(smin, (p.v - anchor.v - E) / dt)   # lower door
        if smin > smax:            # no single line fits anymore
            keep prev; anchor = prev
            smax = (p.v - anchor.v + E) / dt'         # doors vs new anchor
            smin = (p.v - anchor.v - E) / dt'
        prev = p
    keep last point

Determinism contract: the kernel and the DuckDB recursive-CTE oracle
evaluate the IDENTICAL float expressions in the identical order, so the
kept set matches bit-for-bit. Duplicate timestamps are collapsed to
their max value first (both sides) — SDT needs strictly increasing time.

Scale shape: one shuffle keyed by uuid; O(1) state per stream. Giant
streams chunk by (uuid, time-chunk) with anchors re-seeded per chunk
(compression ratio loses one segment per boundary; error bound holds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sdt_compress(points: DataFrame, tolerance: float) -> DataFrame:
    """Retained points after swinging-door compression at ``tolerance``.

    Output: (uuid, time, value) — the kept subset, ordered.
    """
    if tolerance <= 0:
        raise ValueError("tolerance must be positive")
    e = float(tolerance)

    def _door(rows):
        ts = rows["time"].to_numpy()
        vs = rows["value"].to_numpy()
        n = len(ts)
        keep = [0]
        if n > 1:
            # times stay int64 until the delta: float(t) above 2^53 would
            # round, while the oracle subtracts integers exactly
            a_t, a_v = int(ts[0]), float(vs[0])
            smax, smin = float("inf"), float("-inf")
            for i in range(1, n):
                t, v = int(ts[i]), float(vs[i])
                dt = float(t - a_t)
                smax = min(smax, (v - a_v + e) / dt)
                smin = max(smin, (v - a_v - e) / dt)
                if smin > smax:
                    keep.append(i - 1)
                    a_t, a_v = int(ts[i - 1]), float(vs[i - 1])
                    dt = float(t - a_t)
                    smax = (v - a_v + e) / dt
                    smin = (v - a_v - e) / dt
            if keep[-1] != n - 1:
                keep.append(n - 1)
        return rows.iloc[sorted(set(keep))][["uuid", "time", "value"]]

    def fold(pdfs):
        import pandas as pd

        # One kernel call per PARTITION (mapInPandas over a uuid-hash
        # repartition): per-group applyInPandas paid ~20 ms of Arrow
        # batch/frame overhead per stream. Partition chunks arrive in
        # arbitrary order — concat ALL, then resolve duplicate timestamps
        # (max value, the repo-wide superdense convention) and walk each
        # stream's door sequentially.
        chunks = list(pdfs)
        if not chunks:
            return
        rows = (
            pd.concat(chunks, ignore_index=True)
            .groupby(["uuid", "time"], as_index=False)
            .agg({"value": "max"})
            .sort_values(["uuid", "time"], kind="mergesort")
        )
        out = [
            _door(g)
            for _, g in rows.groupby("uuid", sort=False)
        ]
        yield pd.concat(out, ignore_index=True) if out else rows[
            ["uuid", "time", "value"]
        ]

    return (
        points.select("uuid", "time", "value")
        .repartition(F.col("uuid"))
        .mapInPandas(fold, "uuid string, time long, value double")
    )


def sdt_oracle_sql(points_sql: str, tolerance: float) -> str:
    """DuckDB recursive-CTE mirror of sdt_compress (identical float ops)."""
    e = float(tolerance)
    return f"""
        WITH RECURSIVE s AS (
            SELECT uuid, time, MAX(value) AS value FROM {points_sql} p
            GROUP BY uuid, time
        ), r AS (
            SELECT uuid, time, value,
                   ROW_NUMBER() OVER (PARTITION BY uuid ORDER BY time) AS rn,
                   COUNT(*) OVER (PARTITION BY uuid) AS n
            FROM s
        ), rec AS (
            SELECT uuid, rn, time, value,
                   time AS a_t, value AS a_v,
                   CAST('infinity' AS DOUBLE) AS smax,
                   CAST('-infinity' AS DOUBLE) AS smin,
                   FALSE AS prev_kept
            FROM r WHERE rn = 1
            UNION ALL
            SELECT r.uuid, r.rn, r.time, r.value,
                   CASE WHEN GREATEST(rec.smin, (r.value - rec.a_v - {e!r}) / (r.time - rec.a_t))
                             > LEAST(rec.smax, (r.value - rec.a_v + {e!r}) / (r.time - rec.a_t))
                        THEN rec.time ELSE rec.a_t END,
                   CASE WHEN GREATEST(rec.smin, (r.value - rec.a_v - {e!r}) / (r.time - rec.a_t))
                             > LEAST(rec.smax, (r.value - rec.a_v + {e!r}) / (r.time - rec.a_t))
                        THEN rec.value ELSE rec.a_v END,
                   CASE WHEN GREATEST(rec.smin, (r.value - rec.a_v - {e!r}) / (r.time - rec.a_t))
                             > LEAST(rec.smax, (r.value - rec.a_v + {e!r}) / (r.time - rec.a_t))
                        THEN (r.value - rec.value + {e!r}) / (r.time - rec.time)
                        ELSE LEAST(rec.smax, (r.value - rec.a_v + {e!r}) / (r.time - rec.a_t)) END,
                   CASE WHEN GREATEST(rec.smin, (r.value - rec.a_v - {e!r}) / (r.time - rec.a_t))
                             > LEAST(rec.smax, (r.value - rec.a_v + {e!r}) / (r.time - rec.a_t))
                        THEN (r.value - rec.value - {e!r}) / (r.time - rec.time)
                        ELSE GREATEST(rec.smin, (r.value - rec.a_v - {e!r}) / (r.time - rec.a_t)) END,
                   GREATEST(rec.smin, (r.value - rec.a_v - {e!r}) / (r.time - rec.a_t))
                       > LEAST(rec.smax, (r.value - rec.a_v + {e!r}) / (r.time - rec.a_t))
            FROM rec JOIN r ON r.uuid = rec.uuid AND r.rn = rec.rn + 1
        )
        SELECT uuid, time, value FROM r WHERE rn = 1
        UNION
        SELECT p.uuid, p.time, p.value
        FROM rec c JOIN r p ON p.uuid = c.uuid AND p.rn = c.rn - 1
        WHERE c.prev_kept
        UNION
        SELECT uuid, time, value FROM r WHERE rn = n
        ORDER BY uuid, time
    """


def sax_motifs(
    points: DataFrame,
    pw: int = 45,
    word_len: int = 4,
    k: int = 3,
) -> DataFrame:
    """SAX motif mining (Lin & Keogh's Symbolic Aggregate approXimation):
    per stream, z-normalize the 2^pw bucket-mean series against the
    stream's own mean/std, map each bucket to a 4-letter alphabet by the
    standard normal quartile breakpoints, slide a ``word_len``-symbol
    window over consecutive (row-order) buckets, and report each
    stream's top-k most frequent words — its recurring shapes (motifs).
    The pattern-mining read ("what does this feeder keep doing") that
    raw or StatPoint scans cannot answer directly.

    Determinism: bucket means are 2^-20-quantized (the correlations
    contract); the stream mean/std use exact sufficient statistics and
    the (ss - s*m)/(n-1) assembly (rolling_zscore convention); symbols
    are pure comparisons against the literal breakpoints
    (-0.6744897501960817, 0.0, 0.6744897501960817 — N(0,1) quartiles),
    so no new float arithmetic orders exist to diverge. Ties in the
    top-k break by word ascending.

    Plan shape: one (uuid, bucket) groupBy (ladder-compatible), one
    broadcast of the per-stream stats, one lead() window pass to build
    words, one (uuid, word) count, one per-stream top-k window. Gaps in
    the bucket sequence are treated as adjacent (classic SAX over the
    PAA sequence — the symbols are positional, not temporal; document
    the choice, don't hide it).
    """
    from ..functions import decsum
    from ..functions.timeops import bucket_start as _bs

    width = 1 << pw
    _Q = float(1 << 20)
    m = (
        points.withColumn("bucket", _bs(F.col("time"), width))
        .groupBy("uuid", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"), *decsum.sum_aggs(F.col("value")))
        .select(
            "uuid",
            "bucket",
            (
                F.floor((decsum.vsum().cast("double") / F.col("cnt")) * F.lit(_Q))
                .cast("long")
                .cast("double")
                / F.lit(_Q)
            ).alias("x"),
        )
    )
    stats = (
        m.groupBy("uuid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("x").cast("decimal(38,6)")).alias("s_d"),
            F.sum((F.col("x") * F.col("x")).cast("decimal(38,6)")).alias("ss_d"),
        )
        .select(
            "uuid", "n",
            F.col("s_d").cast("double").alias("s"),
            F.col("ss_d").cast("double").alias("ss"),
        )
    )
    mu = F.col("s") / F.col("n")
    var = (F.col("ss") - F.col("s") * mu) / (F.col("n") - F.lit(1))
    stats = stats.select(
        "uuid", mu.alias("mu"), F.when(var > 0, F.sqrt(var)).alias("sd")
    )
    z = (F.col("x") - F.col("mu")) / F.col("sd")
    B1, B2, B3 = -0.6744897501960817, 0.0, 0.6744897501960817
    sym = (
        F.when(z < B1, F.lit("a"))
        .when(z < B2, F.lit("b"))
        .when(z < B3, F.lit("c"))
        .otherwise(F.lit("d"))
    )
    w = Window.partitionBy("uuid").orderBy("bucket")
    symbols = (
        m.join(F.broadcast(stats), "uuid")
        .filter(F.col("sd").isNotNull())
        .withColumn("sym", sym)
    )
    word = F.concat(
        *[F.lead("sym", i).over(w) for i in range(word_len)]
    )
    words = (
        symbols.withColumn("word", word)
        .filter(F.length("word") == word_len)  # lead past the end -> NULL concat
        .groupBy("uuid", "word")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    rw = Window.partitionBy("uuid").orderBy(F.desc("n_occurrences"), F.asc("word"))
    return (
        words.withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= k)
        .select("uuid", "word", "n_occurrences", F.col("rank").cast("long").alias("rank"))
        .orderBy("uuid", "rank")
    )


def sax_oracle_sql(
    points_sql: str, pw: int = 45, word_len: int = 4, k: int = 3
) -> str:
    """DuckDB mirror of sax_motifs (identical quantization, stats
    assembly, breakpoints, and word construction)."""
    width = 1 << pw
    _Q = float(1 << 20)
    leads = " || ".join(
        f"LEAD(sym, {i}) OVER (PARTITION BY uuid ORDER BY bucket)"
        for i in range(word_len)
    )
    return f"""
        WITH m AS (
            SELECT uuid,
                   (time // {width}) * {width} AS bucket,
                   CAST(CAST(FLOOR((CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)) * {_Q!r}) AS BIGINT) AS DOUBLE) / {_Q!r} AS x
            FROM {points_sql} p GROUP BY 1, 2
        ), st AS (
            SELECT uuid, COUNT(*) AS n,
                   CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS s,
                   CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS ss
            FROM m GROUP BY uuid
        ), st2 AS (
            SELECT uuid, s / n AS mu,
                   CASE WHEN (ss - s * (s / n)) / (n - 1) > 0
                        THEN sqrt((ss - s * (s / n)) / (n - 1)) END AS sd
            FROM st
        ), syms AS (
            SELECT m.uuid, m.bucket,
                   CASE WHEN (m.x - st2.mu) / st2.sd < -0.6744897501960817 THEN 'a'
                        WHEN (m.x - st2.mu) / st2.sd < 0.0 THEN 'b'
                        WHEN (m.x - st2.mu) / st2.sd < 0.6744897501960817 THEN 'c'
                        ELSE 'd' END AS sym
            FROM m JOIN st2 ON st2.uuid = m.uuid
            WHERE st2.sd IS NOT NULL
        ), words AS (
            SELECT uuid, word, COUNT(*) AS n_occurrences FROM (
                SELECT uuid, {leads} AS word FROM syms
            ) WHERE length(word) = {word_len}
            GROUP BY uuid, word
        ), ranked AS (
            SELECT uuid, word, n_occurrences,
                   ROW_NUMBER() OVER (PARTITION BY uuid ORDER BY n_occurrences DESC, word ASC) AS rank
            FROM words
        )
        SELECT uuid, word, CAST(n_occurrences AS BIGINT) AS n_occurrences,
               CAST(rank AS BIGINT) AS rank
        FROM ranked WHERE rank <= {k} ORDER BY uuid, rank
    """
