"""Text-analysis operators: quality scoring, token counting, language ID,
document fingerprinting.

All pure built-in Spark SQL expressions (no Python in the hot path): at
100 TB these run inside whole-stage codegen as a single scan-project, no
shuffle at all except the final order (which a real pipeline would drop).
DuckDB oracle mirrors use the identical arithmetic so results match
bit-for-bit (integer counts; ratios are single double divisions of ints).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Real stopword lexicon (10 languages x ~45 words, functions/lexicon.py).
# Re-exported here because quality_stats' stopword_ratio and several
# downstream oracles are defined over STOPWORDS["en"].
from .lexicon import STOPWORDS, lexicon_values_sql


def _tokens(text: Column) -> Column:
    return F.split(text, " ")


def quality_stats(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features: token count, char stats, ratios.

    Output columns: doc_id, n_tokens, n_chars_measured, avg_token_len,
    stopword_ratio, distinct_token_ratio.
    """
    toks = _tokens(F.col(text_col))
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_distinct = F.size(F.array_distinct(toks))
    return documents.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        n_chars.cast("long").alias("n_chars_measured"),
        ((n_chars - (n_tokens - F.lit(1))) / n_tokens).alias("avg_token_len"),
        (n_stop / n_tokens).alias("stopword_ratio"),
        (n_distinct / n_tokens).alias("distinct_token_ratio"),
    ).orderBy("doc_id")


def token_counts(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count plus a BPE-ish subword estimate (len/4 heuristic)."""
    toks = _tokens(F.col(text_col))
    return documents.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        (F.length(F.col(text_col)) / F.lit(4)).cast("long").alias("est_bpe_tokens"),
    ).orderBy("doc_id")


def lang_id(
    documents: DataFrame,
    text_col: str = "text",
    lexicon: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Stopword-overlap language ID: argmax language by distinct-stopword
    hits against the real 10-language lexicon (functions/lexicon.py).

    Scale shape: the lexicon compiles into codegen'd array_intersect
    expressions — a single scan-project with NO shuffle and no join, the
    cheapest possible plan for a fixed lexicon. For lexicons loaded at
    runtime (or too large to compile into the plan) use
    lang_id_lexicon(), the broadcast-join variant.

    Text is lowercased before matching. Deterministic tie-break:
    lexicographically smallest language code (zero-hit docs get the
    smallest code in the lexicon with 0 hits).
    Output: (doc_id, pred_lang, pred_hits).
    """
    lexicon = lexicon or STOPWORDS
    toks = F.array_distinct(_tokens(F.lower(F.col(text_col))))
    scored = F.array(*[
        F.struct(
            (-F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws])))).alias("neg_hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, ws in sorted(lexicon.items())
    ])
    best = F.array_min(scored)
    return documents.select(
        "doc_id",
        best["lang"].alias("pred_lang"),
        (-best["neg_hits"]).cast("long").alias("pred_hits"),
    ).orderBy("doc_id")


def lang_id_lexicon(
    documents: DataFrame, lexicon_df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """lang_id against a runtime (lang, word) lexicon TABLE.

    Scale shape: distinct tokens explode once, equi-join the broadcast
    lexicon (lexicons are KBs; the corpus side never shuffles on the
    word key), then ONE groupBy(doc_id)-argmax. Zero-hit docs are
    handled by unioning a per-doc (fallback-lang, 0 hits) sentinel into
    the same aggregation — no corpus-sized second join (a left join of
    docs onto per-doc bests would be a sort-merge join of two
    corpus-sized sides). Fallback = smallest lang code with 0 hits,
    identical to lang_id()'s all-zero argmax, so the two variants agree
    row-for-row on the same lexicon.
    """
    toks = documents.select(
        "doc_id",
        F.explode(F.array_distinct(_tokens(F.lower(F.col(text_col))))).alias("tok"),
    )
    hits = (
        toks.join(F.broadcast(lexicon_df), toks["tok"] == lexicon_df["word"])
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).alias("hits"))  # tokens pre-deduped per doc
    )
    fallback = F.broadcast(lexicon_df.agg(F.min("lang").alias("fb_lang")))
    sentinel = documents.select("doc_id").crossJoin(fallback).select(
        "doc_id", F.col("fb_lang").alias("lang"), F.lit(0).cast("long").alias("hits")
    )
    best = (
        hits.unionByName(sentinel)
        .groupBy("doc_id")
        .agg(F.min(F.struct((-F.col("hits")).alias("neg_hits"), F.col("lang"))).alias("b"))
    )
    return best.select(
        "doc_id",
        F.col("b.lang").alias("pred_lang"),
        (-F.col("b.neg_hits")).cast("long").alias("pred_hits"),
    ).orderBy("doc_id")


def fingerprint(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Stable 64-bit-ish document fingerprint (md5-derived, portable)."""
    return documents.select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col(text_col)), 1, 15), 16, 10).cast("long").alias("fp"),
    ).orderBy("doc_id")


# ---------------- DuckDB oracle mirrors ----------------
# lang_id oracles are GENERATED from the same STOPWORDS dict the Spark
# plan compiles, so lexicon edits can never desynchronize the two sides.


def _list_sql(words: list[str]) -> str:
    return "[" + ",".join(f"'{w}'" for w in words) + "]"


_STOP_EN = _list_sql(STOPWORDS["en"])


def _lang_id_oracle() -> str:
    scored = "\n                UNION ALL\n                ".join(
        f"SELECT doc_id, '{lang}' AS lang, "
        f"len(list_intersect(toks, {_list_sql(ws)})) AS hits FROM t"
        for lang, ws in sorted(STOPWORDS.items())
    )
    return f"""
        WITH t AS (
            SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS toks FROM documents
        ), scored AS (
                {scored}
        ), ranked AS (
            SELECT doc_id, lang, hits,
                   ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang ASC) AS rn
            FROM scored
        )
        SELECT doc_id, lang AS pred_lang, CAST(hits AS BIGINT) AS pred_hits
        FROM ranked WHERE rn = 1 ORDER BY doc_id
    """


def _lang_id_lexicon_oracle() -> str:
    return f"""
        WITH tok AS (
            SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS tok
            FROM documents
        ), hits AS (
            SELECT doc_id, lang, COUNT(*) AS hits
            FROM tok JOIN {lexicon_values_sql()} ON tok.tok = lex.word
            GROUP BY doc_id, lang
        ), ranked AS (
            SELECT doc_id, lang, hits,
                   ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang ASC) AS rn
            FROM hits
        )
        SELECT d.doc_id,
               COALESCE(r.lang, (SELECT MIN(lang) FROM {lexicon_values_sql()})) AS pred_lang,
               CAST(COALESCE(r.hits, 0) AS BIGINT) AS pred_hits
        FROM documents d LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r USING (doc_id)
        ORDER BY d.doc_id
    """

ORACLES = {
    "text_quality": f"""
        WITH t AS (
            SELECT doc_id, text, string_split(text, ' ') AS toks, LENGTH(text) AS n_chars_m
            FROM documents
        )
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(n_chars_m AS BIGINT) AS n_chars_measured,
               (n_chars_m - (len(toks) - 1)) / len(toks) AS avg_token_len,
               len(list_filter(toks, x -> list_contains({_STOP_EN}, x))) / len(toks) AS stopword_ratio,
               len(list_distinct(toks)) / len(toks) AS distinct_token_ratio
        FROM t ORDER BY doc_id
    """,
    "lang_id": _lang_id_oracle(),
    "lang_id_lexicon_join": _lang_id_lexicon_oracle(),
}


def ngram_contamination(
    documents: DataFrame, eval_docs: DataFrame, n: int = 8, text_col: str = "text"
) -> DataFrame:
    """Benchmark decontamination scan: for every corpus doc, how many of
    its word n-grams appear in ANY eval-set document.

    The standard pre-training hygiene step (decontaminate the corpus
    against evaluation sets). Scale shape: the eval side is tiny
    (benchmarks are KBs, the corpus is TBs), so its distinct gram hashes
    BROADCAST and the corpus-side explode is followed by a broadcast
    inner join + one groupBy(doc_id) — the 100 TB side never shuffles on
    the gram key. Grams are compared as 64-bit hashes; the oracle
    compares raw gram strings (hash collisions are possible in theory
    but md5-60bit over a test corpus is collision-free, and the oracle
    would catch one).

    Output: (doc_id, n_gram_hits, n_grams, contamination_frac) for docs
    with at least one hit.
    """
    from .dedup import _shingles, _spread

    # _spread: a small/medium corpus parquet is often ONE row group = one
    # task; without it the whole shingle kernel serializes on one core
    # (measured 29x with spread + single-eval below at sf0.01). The gram
    # array is aliased ONCE and size/explode reference the attribute —
    # the projection computing `grams` sits below the Generate, so the
    # shingle transform runs once per row, not twice.  xxhash64 (codegen'd
    # JVM hash) is the join key — internal only, the oracle joins on the
    # raw gram strings.
    corpus = (
        _spread(documents)
        .select("doc_id", _shingles(F.col(text_col), n).alias("grams"))
        .select(
            "doc_id",
            F.size("grams").cast("long").alias("n_grams"),
            F.explode("grams").alias("gram"),
        )
        .select("doc_id", "n_grams", F.xxhash64("gram").alias("gh"))
    )
    eval_grams = (
        _spread(eval_docs)
        .select(_shingles(F.col(text_col), n).alias("grams"))
        .select(F.explode("grams").alias("gram"))
        .select(F.xxhash64("gram").alias("gh"))
        .distinct()
    )
    return (
        corpus.join(F.broadcast(eval_grams), "gh")
        .groupBy("doc_id", "n_grams")
        .agg(F.count(F.lit(1)).alias("n_gram_hits"))
        .select(
            "doc_id",
            "n_gram_hits",
            F.col("n_grams"),
            (F.col("n_gram_hits") / F.col("n_grams")).alias("contamination_frac"),
        )
        .orderBy("doc_id")
    )


def topk_by_tokens(documents: DataFrame, k: int = 5, text_col: str = "text") -> DataFrame:
    """Top-k longest documents per predicted language — the top-k-per-group
    pattern the reference lacks entirely (SURVEY §2.6 'No top-k operator').

    Window row_number + filter: Spark plans this as a partial top-k sort
    per partition (WindowGroupLimit pushes k below the shuffle in recent
    Spark), so the full per-group sort never materializes. Deterministic
    tie-break on doc_id.
    """
    scored = lang_id(documents, text_col).join(
        token_counts(documents, text_col).select("doc_id", "n_tokens"), "doc_id"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("pred_lang").orderBy(F.desc("n_tokens"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("pred_lang", "rank", "doc_id", "n_tokens")
        .orderBy("pred_lang", "rank")
    )


def contamination_oracle_sql(eval_filter_sql: str, n: int) -> str:
    """DuckDB mirror of ngram_contamination; eval set = documents rows
    matching ``eval_filter_sql``. Compares raw gram strings (the Spark
    side compares 60-bit md5 hashes — identical absent a collision)."""
    from .dedup import _shingle_sql

    return f"""
        WITH dg AS ({_shingle_sql(n)}),
        sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM dg GROUP BY 1),
        eg AS (
            SELECT DISTINCT shingle FROM ({_shingle_sql(n)}) e
            WHERE doc_id IN (SELECT doc_id FROM documents WHERE {eval_filter_sql})
        )
        SELECT dg.doc_id,
               COUNT(*) AS n_gram_hits,
               CAST(ANY_VALUE(sizes.n_grams) AS BIGINT) AS n_grams,
               COUNT(*) / ANY_VALUE(sizes.n_grams) AS contamination_frac
        FROM dg JOIN eg USING (shingle) JOIN sizes ON sizes.doc_id = dg.doc_id
        GROUP BY dg.doc_id ORDER BY dg.doc_id
    """


def topk_oracle_sql(k: int) -> str:
    return f"""
        WITH langs AS ({ORACLES["lang_id"]}),
        tok AS (
            SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        ),
        r AS (
            SELECT l.pred_lang, t.doc_id, t.n_tokens,
                   ROW_NUMBER() OVER (
                       PARTITION BY l.pred_lang
                       ORDER BY t.n_tokens DESC, t.doc_id ASC) AS rank
            FROM langs l JOIN tok t ON l.doc_id = t.doc_id
        )
        SELECT pred_lang, CAST(rank AS BIGINT) AS rank, doc_id, n_tokens
        FROM r WHERE rank <= {k} ORDER BY pred_lang, rank
    """


def repetition_scores(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021 §A1.1):
    the fraction of bigram occurrences taken by the single most frequent
    bigram, and the fraction of trigram occurrences whose trigram appears
    more than once. High values flag machine-generated / boilerplate text.

    Scale shape: one explode per gram order, partial-aggregated groupBy on
    (doc_id, gram) — a high-cardinality balanced key — then a per-doc
    rollup on doc_id. No window over the full corpus, no broadcast of
    anything corpus-sized; fractions are single double divisions of int
    counts so the DuckDB oracle matches bit-for-bit.

    Output: (doc_id, n_tokens, top_bigram_frac, dup_trigram_frac).
    """

    def gram_counts(n: int) -> DataFrame:
        # bind the split ONCE via the single-element-transform trick
        # (dedup._shingles) — element_at inside the lambda references the
        # bound array, so split(text) is not re-evaluated per gram term
        def grams_of(toks: Column) -> Column:
            return F.transform(
                F.when(
                    F.size(toks) >= n,
                    F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
                ).otherwise(F.array().cast("array<int>")),
                lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
            )

        grams = F.element_at(
            F.transform(F.array(F.split(F.col(text_col), " ")), grams_of), 1
        )
        from .dedup import _spread

        return (
            _spread(documents)
            .select("doc_id", F.explode(grams).alias("gram"))
            .groupBy("doc_id", "gram")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    bi = gram_counts(2).groupBy("doc_id").agg(
        (F.max("cnt") / F.sum("cnt")).alias("top_bigram_frac")
    )
    tri = gram_counts(3).groupBy("doc_id").agg(
        (
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)) / F.sum("cnt")
        ).alias("dup_trigram_frac")
    )
    ntok = documents.select(
        "doc_id", F.size(_tokens(F.col(text_col))).cast("long").alias("n_tokens")
    )
    return (
        ntok.join(bi, "doc_id").join(tri, "doc_id")
        .select("doc_id", "n_tokens", "top_bigram_frac", "dup_trigram_frac")
        .orderBy("doc_id")
    )


def repetition_oracle_sql() -> str:
    return """
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks,
                   len(string_split(text, ' ')) AS n
            FROM documents
        ), bi AS (
            SELECT doc_id, gram, COUNT(*) AS cnt
            FROM (SELECT doc_id,
                         UNNEST(list_transform(generate_series(1, n - 1),
                                i -> toks[i] || ' ' || toks[i + 1])) AS gram
                  FROM t)
            GROUP BY 1, 2
        ), tri AS (
            SELECT doc_id, gram, COUNT(*) AS cnt
            FROM (SELECT doc_id,
                         UNNEST(list_transform(generate_series(1, n - 2),
                                i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS gram
                  FROM t)
            GROUP BY 1, 2
        ), bia AS (
            SELECT doc_id, MAX(cnt) / CAST(SUM(cnt) AS DOUBLE) AS top_bigram_frac
            FROM bi GROUP BY 1
        ), tria AS (
            SELECT doc_id,
                   SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) / CAST(SUM(cnt) AS DOUBLE)
                       AS dup_trigram_frac
            FROM tri GROUP BY 1
        )
        SELECT t.doc_id, CAST(t.n AS BIGINT) AS n_tokens,
               bia.top_bigram_frac, tria.dup_trigram_frac
        FROM t JOIN bia ON t.doc_id = bia.doc_id JOIN tria ON t.doc_id = tria.doc_id
        ORDER BY t.doc_id
    """


def tfidf_top_terms(documents: DataFrame, k: int = 5, text_col: str = "text") -> DataFrame:
    """Per-document top-k characteristic terms by a tf-idf weight.

    score = tf * N / df (linear idf). Linear rather than log idf so the
    score is built purely from IEEE-exact ops (*, /) and the DuckDB
    oracle is bit-identical — ln() is correctly-rounded in neither engine
    and may differ in the last ulp. Ranking is score DESC, term ASC, so
    equal-score ties are deterministic.

    Scale: two partial-aggregated shuffles (tf on (doc, term), df on
    term), one shuffle join tf x df keyed on term (vocab-sized keyspace —
    balanced, not broadcast: a 100 TB crawl's vocabulary is not
    dimension-sized), then a WindowGroupLimit top-k per doc. The corpus
    count is a scalar aggregate, not a collect.
    """
    from pyspark.sql import Window

    from .dedup import _spread

    # _spread: a small-file corpus parquet is one row group = one task;
    # round-robin it so the explode+partial-agg map side parallelizes.
    toks = _spread(documents).select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = documents.count()
    scored = tf.join(dfreq, "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        (F.col("tf") * F.lit(float(n_docs)) / F.col("df")).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "tf", "df", "score")
        .orderBy("doc_id", "rank")
    )


def tfidf_oracle_sql(k: int) -> str:
    """DuckDB mirror; the corpus count is computed in-query so the oracle
    is self-contained on the same table."""
    return f"""
        WITH tf AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
                  FROM documents)
            GROUP BY 1, 2
        ),
        dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
        r AS (
            SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
                   tf.tf * n.n_docs / dfreq.df AS score,
                   ROW_NUMBER() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY tf.tf * n.n_docs / dfreq.df DESC, tf.term ASC) AS rank
            FROM tf JOIN dfreq USING (term) CROSS JOIN n
        )
        SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df, score
        FROM r WHERE rank <= {k} ORDER BY doc_id, rank
    """


def bm25_topk(
    documents: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 ranking of documents for a bag of query terms — the
    lexical retrieval step of a training-data curation pipeline (e.g.
    mining domain-relevant documents out of a crawl).

    score(d) = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    with the RATIONAL idf form (N - df + 0.5)/(df + 0.5): a monotone
    transform of the classic log idf, so rankings are preserved while the
    whole score stays inside IEEE +-*/ (ln is correctly rounded in
    neither engine — same convention as tfidf_top_terms). Cross-term
    accumulation is float addition, whose result depends on order (Spark
    reserves the right to reassociate); per-term scores are therefore
    quantized to 2^-40 (floor of the 2^40-scaled value — ~1e-12, far
    below any ranking-relevant difference) and summed as EXACT longs,
    then divided back by the power of two (exact) — order-independent
    and bit-identical across engines.

    Scale shape: the term filter prunes the exploded tokens to query
    terms only (a handful), so tf is a tiny partial-aggregated groupBy;
    doc lengths come straight off the scan; N and avgdl are scalar
    aggregates. Top-k is a global TakeOrdered (never a full sort).

    Output: (rank, doc_id, score), rank 1..k by score DESC, doc_id ASC.
    """
    from pyspark.sql import Window

    from .dedup import _spread

    if not terms:
        raise ValueError("terms must be non-empty")
    stats = documents.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(_tokens(F.col(text_col)))).alias("sum_dl"),
    ).collect()[0]
    n_docs, sum_dl = stats["n_docs"], stats["sum_dl"]
    avgdl = sum_dl / n_docs  # exact ints -> one IEEE division
    toks = _spread(documents).select(
        "doc_id", F.explode(_tokens(F.col(text_col))).alias("term")
    )
    tf = (
        toks.filter(F.col("term").isin(list(terms)))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dl = documents.select(
        "doc_id", F.size(_tokens(F.col(text_col))).alias("dl")
    )
    idf = (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    den = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * (F.col("dl") / F.lit(avgdl))
    )
    q = float(1 << 40)
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            F.floor(
                (idf * (F.col("tf") * F.lit(k1 + 1.0) / den)) * F.lit(q)
            ).cast("long").alias("sq"),
        )
    )
    ranked = (
        scored.groupBy("doc_id")
        .agg((F.sum("sq") / F.lit(q)).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))  # k rows only
    return ranked.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "doc_id", "score"
    )


def bm25_oracle_sql(
    terms: list[str], k: int = 10, k1: float = 1.2, b: float = 0.75
) -> str:
    """DuckDB mirror of bm25_topk — identical arithmetic structure."""
    term_list = "[" + ",".join(f"'{t}'" for t in terms) + "]"
    q = float(1 << 40)
    return f"""
        WITH stats AS (
            SELECT COUNT(*) AS n_docs,
                   SUM(len(string_split(text, ' '))) AS sum_dl
            FROM documents
        ), toks AS (
            SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
        ), tf AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM toks
            WHERE list_contains({term_list}, term) GROUP BY 1, 2
        ), dfreq AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
        ), dl AS (
            SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
        ), scored AS (
            SELECT tf.doc_id,
                   CAST(FLOOR((((CAST(stats.n_docs AS DOUBLE) - dfreq.df + 0.5) / (dfreq.df + 0.5))
                   * (tf.tf * {k1 + 1.0!r} /
                      (tf.tf + {k1!r} * (1.0 - {b!r} + {b!r} * (dl.dl / (stats.sum_dl / CAST(stats.n_docs AS DOUBLE))))))) * {q!r}) AS BIGINT) AS sq
            FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id), stats
        ), ranked AS (
            SELECT doc_id, SUM(sq) / {q!r} AS score FROM scored
            GROUP BY doc_id ORDER BY score DESC, doc_id ASC LIMIT {k}
        )
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank,
               doc_id, score
        FROM ranked
    """


# PII patterns: deliberately in the regex subset where Java (Spark) and
# RE2 (DuckDB) agree — character classes, bounded quantifiers, \b, no
# backreferences, no lookaround. Cross-engine agreement on synthesized
# PII is asserted in tests/test_new_ops_r3.py, not just on the fixture.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d[\d\-]{7,14}\d",
}


def pii_scrub(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4s / international-format phone numbers — the
    standard pre-training privacy pass. Pure codegen regexp expressions
    (scan-project, no shuffle, no Python); each category is counted and
    replaced with a typed placeholder in a fixed order (email -> ipv4 ->
    phone) so the scrubbed text is deterministic.

    Output: (doc_id, n_email, n_ipv4, n_phone, clean_len, clean_fp) —
    the fingerprint stands in for the scrubbed text so the oracle
    comparison stays compact.
    """
    t = F.col(text_col)
    counts = {
        k: F.regexp_count(t, F.lit(p)).cast("long").alias(f"n_{k}")
        for k, p in PII_PATTERNS.items()
    }
    clean = t
    for k, p in PII_PATTERNS.items():
        clean = F.regexp_replace(clean, p, f"<{k}>")
    return documents.select(
        "doc_id",
        counts["email"],
        counts["ipv4"],
        counts["phone"],
        F.length(clean).cast("long").alias("clean_len"),
        F.conv(F.substring(F.md5(clean), 1, 15), 16, 10).cast("long").alias("clean_fp"),
    ).orderBy("doc_id")


def pii_scrub_oracle_sql() -> str:
    e, i, p = (PII_PATTERNS[k].replace("'", "''") for k in ("email", "ipv4", "phone"))
    clean = f"regexp_replace(regexp_replace(regexp_replace(text, '{e}', '<email>', 'g'), '{i}', '<ipv4>', 'g'), '{p}', '<phone>', 'g')"
    return f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '{e}')) AS n_email,
               len(regexp_extract_all(text, '{i}')) AS n_ipv4,
               len(regexp_extract_all(text, '{p}')) AS n_phone,
               LENGTH({clean}) AS clean_len,
               ('0x' || substr(md5({clean}), 1, 15))::BIGINT AS clean_fp
        FROM documents ORDER BY doc_id
    """


def gram_contrast_topk(
    documents: DataFrame,
    target_max_id: int = 25,
    n: int = 2,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Domain-contrast document selection — the deterministic core of
    DSIR-style importance resampling (Xie et al. 2023): score each
    OUT-of-target document by how much its n-gram profile looks like the
    target set, and return the top-k. The curation primitive for "find
    me more data like this seed set" at corpus scale.

    Per distinct gram g (document frequencies, not term frequencies):
        weight(g) = df_target(g) * N_ref - df_ref(g) * N_target
    (the cross-multiplied df ratio — positive iff g is relatively more
    frequent in the target; INTEGER, so scoring is exact — DSIR's
    log-ratio weights are the deployment-scale variant, a monotone
    refinement this plan swaps in by changing one expression).
    Doc score = sum of weight(g) over the doc's distinct grams.

    Output: (doc_id, score, rank), top-k reference docs by score desc,
    ties -> doc_id asc.

    Plan shape / 100 TB notes: grams travel as xxhash64 longs (the
    exact_substring_spans convention; the oracle joins literal strings,
    proving the fixture collision-free). One groupBy(gram_hash) builds
    the df-contrast weights — map-side combinable, balanced keys; one
    hash join scores (doc, gram) pairs; one groupBy(doc) folds scores;
    TakeOrdered top-k. Never pairwise, never a corpus-sized broadcast.
    """
    toks = F.split(F.col(text_col), " ")

    def grams_of(t: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(n)]),
        )

    grams = F.when(F.size(toks) >= n, grams_of(toks)).otherwise(
        F.array().cast("array<string>")
    )
    doc_grams = (
        documents.select(
            "doc_id",
            (F.col("doc_id") < target_max_id).alias("is_target"),
            F.explode(F.array_distinct(grams)).alias("gram"),
        )
        .select("doc_id", "is_target", F.xxhash64(F.col("gram")).alias("gh"))
        # consumed twice (weights + scoring): localCheckpoint materializes
        # the (doc, gram-hash) edge list once instead of re-splitting the
        # corpus — the stream_correlations reuse pattern; at cluster scale
        # the edge list is executor-storage-resident and hash-shaped
        .localCheckpoint()
    )
    n_t, n_r = documents.agg(
        F.sum(F.when(F.col("doc_id") < target_max_id, 1).otherwise(0)),
        F.sum(F.when(F.col("doc_id") < target_max_id, 0).otherwise(1)),
    ).first()
    weights = doc_grams.groupBy("gh").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("df_t"),
        F.sum(F.when(F.col("is_target"), 0).otherwise(1)).alias("df_r"),
    ).select(
        "gh",
        (F.col("df_t") * F.lit(int(n_r)) - F.col("df_r") * F.lit(int(n_t)))
        .cast("long")
        .alias("wt"),
    )
    scored = (
        doc_grams.filter(~F.col("is_target"))
        .join(weights, "gh")
        .groupBy("doc_id")
        .agg(F.sum("wt").cast("long").alias("score"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "score", F.col("rank").cast("long").alias("rank"))
        .orderBy("rank")
    )


def gram_contrast_oracle_sql(
    target_max_id: int = 25, n: int = 2, k: int = 20
) -> str:
    """DuckDB mirror of gram_contrast_topk (literal gram strings)."""
    nm1 = n - 1
    return f"""
        WITH dg AS (
            SELECT DISTINCT doc_id, (doc_id < {target_max_id}) AS is_target, gram
            FROM (
                SELECT doc_id,
                       UNNEST(list_transform(
                           range(1, greatest(len(string_split(text, ' ')) - {nm1}, 0) + 1),
                           i -> array_to_string(string_split(text, ' ')[i:i+{nm1}], ' ')
                       )) AS gram
                FROM documents
            )
        ), nn AS (
            SELECT SUM(CASE WHEN doc_id < {target_max_id} THEN 1 ELSE 0 END) AS n_t,
                   SUM(CASE WHEN doc_id < {target_max_id} THEN 0 ELSE 1 END) AS n_r
            FROM documents
        ), wt AS (
            SELECT gram,
                   SUM(CASE WHEN is_target THEN 1 ELSE 0 END) * (SELECT n_r FROM nn)
                 - SUM(CASE WHEN is_target THEN 0 ELSE 1 END) * (SELECT n_t FROM nn) AS wt
            FROM dg GROUP BY gram
        ), scored AS (
            SELECT dg.doc_id, CAST(SUM(wt.wt) AS BIGINT) AS score
            FROM dg JOIN wt USING (gram)
            WHERE NOT dg.is_target
            GROUP BY dg.doc_id
        ), ranked AS (
            SELECT doc_id, score,
                   ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rank
            FROM scored
        )
        SELECT doc_id, score, CAST(rank AS BIGINT) AS rank
        FROM ranked WHERE rank <= {k} ORDER BY rank
    """


# ---------------- Gopher quality rules (Rae et al. 2021, Appendix A) ----------------

GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc Gopher quality-filter metrics and verdict (the published
    MassiveWeb rules, Rae et al. 2021 Appendix A — the de-facto standard
    pretraining text filter; also the core of RedPajama/Dolma's rule set).

    Metrics (all exact integer counts; ratios are single double
    divisions, bit-identical cross-engine):
      n_words            whitespace tokens
      mean_word_len      (n_chars - (n_words-1)) / n_words
      symbol_word_ratio  (# occurrences of '#' + non-overlapping '...')
                         / n_words
      alpha_word_frac    words containing >=1 ascii letter / n_words
      bullet_line_frac   lines starting '- ' or '* '
      ellipsis_line_frac lines ending '...'
      n_stop_hits        how many of the 8 Gopher stopwords appear
      passes             the conjunction of the published thresholds:
                         50 <= n_words <= 100000, 3 <= mean_word_len <= 10,
                         symbol_word_ratio <= 0.1, bullet_line_frac <= 0.9,
                         ellipsis_line_frac <= 0.3, alpha_word_frac >= 0.8,
                         n_stop_hits >= 2

    One scan-project inside whole-stage codegen; no shuffle, no UDF.
    """
    txt = F.col(text_col)
    toks = _tokens(txt)
    n_words = F.size(toks)
    n_chars = F.length(txt)
    mean_wl = (n_chars - (n_words - F.lit(1))) / n_words
    n_hash = F.length(txt) - F.length(F.replace(txt, F.lit("#"), F.lit("")))
    n_ellip = (F.length(txt) - F.length(F.replace(txt, F.lit("..."), F.lit("")))) / F.lit(3)
    sym_ratio = (n_hash + n_ellip) / n_words
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    alpha_frac = alpha_words / n_words
    lines = F.split(txt, "\n")
    n_lines = F.size(lines)
    bullet = F.size(
        F.filter(lines, lambda l: l.startswith("- ") | l.startswith("* "))
    )
    ellip_l = F.size(F.filter(lines, lambda l: l.endswith("...")))
    bullet_frac = bullet / n_lines
    ellip_frac = ellip_l / n_lines
    stop_hits = sum(
        (F.array_contains(toks, w).cast("long") for w in GOPHER_STOPS),
        F.lit(0),
    )
    passes = (
        (n_words >= 50) & (n_words <= 100_000)
        & (mean_wl >= 3.0) & (mean_wl <= 10.0)
        & (sym_ratio <= 0.1)
        & (bullet_frac <= 0.9)
        & (ellip_frac <= 0.3)
        & (alpha_frac >= 0.8)
        & (stop_hits >= 2)
    )
    return documents.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        sym_ratio.alias("symbol_word_ratio"),
        alpha_frac.alias("alpha_word_frac"),
        bullet_frac.alias("bullet_line_frac"),
        ellip_frac.alias("ellipsis_line_frac"),
        stop_hits.cast("long").alias("n_stop_hits"),
        passes.alias("passes"),
    ).orderBy("doc_id")


def gopher_quality_oracle_sql() -> str:
    stops = ", ".join(f"'{w}'" for w in GOPHER_STOPS)
    return f"""
        WITH m AS (
            SELECT doc_id,
                   string_split(text, ' ') AS toks,
                   string_split(text, chr(10)) AS lines,
                   LENGTH(text) AS n_chars,
                   LENGTH(text) - LENGTH(REPLACE(text, '#', '')) AS n_hash,
                   (LENGTH(text) - LENGTH(REPLACE(text, '...', ''))) / 3 AS n_ellip
            FROM documents
        ), c AS (
            SELECT doc_id,
                   len(toks) AS n_words, n_chars, n_hash, n_ellip,
                   len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS alpha_words,
                   len(lines) AS n_lines,
                   len(list_filter(lines, l -> l LIKE '- %' OR l LIKE '* %')) AS bullet,
                   len(list_filter(lines, l -> l LIKE '%...')) AS ellip_l,
                   len(list_filter([{stops}], w -> list_contains(toks, w))) AS stop_hits
            FROM m
        )
        SELECT doc_id,
               CAST(n_words AS BIGINT) AS n_words,
               CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words AS mean_word_len,
               (n_hash + n_ellip) / n_words AS symbol_word_ratio,
               CAST(alpha_words AS DOUBLE) / n_words AS alpha_word_frac,
               CAST(bullet AS DOUBLE) / n_lines AS bullet_line_frac,
               CAST(ellip_l AS DOUBLE) / n_lines AS ellipsis_line_frac,
               CAST(stop_hits AS BIGINT) AS n_stop_hits,
               (n_words BETWEEN 50 AND 100000)
                 AND (CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words BETWEEN 3.0 AND 10.0)
                 AND ((n_hash + n_ellip) / n_words <= 0.1)
                 AND (CAST(bullet AS DOUBLE) / n_lines <= 0.9)
                 AND (CAST(ellip_l AS DOUBLE) / n_lines <= 0.3)
                 AND (CAST(alpha_words AS DOUBLE) / n_words >= 0.8)
                 AND (stop_hits >= 2) AS passes
        FROM c ORDER BY doc_id
    """


def vocab_stats(documents: DataFrame, top_k: int = 10, text_col: str = "text") -> DataFrame:
    """Corpus-level vocabulary statistics (one row): total tokens N,
    vocab size V, hapax count, type-token ratio V/N, hapax fraction, and
    the probability mass of the top_k most frequent tokens — the
    Zipf-head concentration every corpus report leads with.

    One explode + one groupBy (map-side combinable) + a top-k over the
    (tiny) vocabulary frame. All counts integer-exact; the three ratios
    are single double divisions.
    """
    tok = documents.select(
        F.explode(_tokens(F.col(text_col))).alias("token")
    )
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    # totals in one pass; the top-k head via sort-limit
    # (TakeOrderedAndProject — per-partition top-k then merge, never a
    # global sort or a partitionBy-less window over the whole vocabulary)
    totals = vocab.agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum((F.col("cnt") == 1).cast("long")).alias("n_hapax"),
    )
    top = (
        vocab.orderBy(F.desc("cnt"), F.asc("token"))
        .limit(top_k)
        .agg(F.sum("cnt").alias("top_cnt"))
    )
    return (
        totals.crossJoin(F.broadcast(top))
        .select(
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("vocab_size").cast("long").alias("vocab_size"),
            F.col("n_hapax").cast("long").alias("n_hapax"),
            (F.col("vocab_size") / F.col("n_tokens")).alias("type_token_ratio"),
            (F.col("n_hapax") / F.col("vocab_size")).alias("hapax_frac"),
            (F.col("top_cnt") / F.col("n_tokens")).alias("topk_mass"),
        )
    )


def vocab_stats_oracle_sql(top_k: int = 10) -> str:
    return f"""
        WITH tok AS (
            SELECT UNNEST(string_split(text, ' ')) AS token FROM documents
        ), vocab AS (
            SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
        ), ranked AS (
            SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS rk
            FROM vocab
        )
        SELECT CAST(SUM(cnt) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS vocab_size,
               CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
               CAST(COUNT(*) AS DOUBLE) / SUM(cnt) AS type_token_ratio,
               CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS hapax_frac,
               CAST(SUM(CASE WHEN rk <= {top_k} THEN cnt ELSE 0 END) AS DOUBLE) / SUM(cnt) AS topk_mass
        FROM ranked
    """


def domain_stats(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source corpus accounting: doc count, exact-duplicate rate
    (md5 text hash), char volume — the table a curation run reports per
    crawl/domain to decide what to keep. One groupBy on source with
    map-side-combinable aggregates (the distinct-hash count shuffles
    (source, hash) pairs once)."""
    return (
        documents.select(
            "source", F.md5(F.col(text_col)).alias("h"), F.length(F.col(text_col)).alias("nc")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("h").alias("n_unique"),
            F.sum("nc").alias("total_chars"),
        )
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_unique").cast("long").alias("n_unique"),
            ((F.col("n_docs") - F.col("n_unique")) / F.col("n_docs")).alias("dup_frac"),
            F.col("total_chars").cast("long").alias("total_chars"),
            (F.col("total_chars") / F.col("n_docs")).alias("avg_chars"),
        )
        .orderBy("source")
    )


def domain_stats_oracle_sql() -> str:
    return """
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique,
               CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*) AS dup_frac,
               CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
               CAST(SUM(LENGTH(text)) AS DOUBLE) / COUNT(*) AS avg_chars
        FROM documents GROUP BY source ORDER BY source
    """


def token_freq_quality(
    documents: DataFrame, min_cnt: int = 2, text_col: str = "text"
) -> DataFrame:
    """Corpus-frequency fluency proxy (the CCNet idea without the LM):
    score each doc by how common its tokens are in THIS corpus — docs
    full of corpus-rare tokens are gibberish/boilerplate candidates.

    Output: (doc_id, n_tokens, mean_token_count, rare_token_frac) where
    mean_token_count = mean over the doc's token OCCURRENCES of each
    token's corpus count, and rare_token_frac = fraction with corpus
    count < min_cnt. Integer sums, two single double divisions —
    bit-identical cross-engine. (A production deployment swaps the
    corpus unigram table for a KenLM perplexity; the plan shape —
    token-keyed join of occurrences against a count table, one doc-side
    aggregate — is identical.)

    Plan: one token explode + groupBy for the vocabulary, one keyed join
    occurrences->vocab on token, one groupBy doc. Both shuffles keyed by
    token/doc; AQE handles hot-token skew.
    """
    occ = documents.select(
        "doc_id", F.explode(_tokens(F.col(text_col))).alias("token")
    )
    vocab = occ.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        occ.join(vocab, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("cnt").alias("s"),
            F.sum((F.col("cnt") < min_cnt).cast("long")).alias("rare"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("s") / F.col("n_tokens")).alias("mean_token_count"),
            (F.col("rare") / F.col("n_tokens")).alias("rare_token_frac"),
        )
        .orderBy("doc_id")
    )


def token_freq_quality_oracle_sql(min_cnt: int = 2) -> str:
    return f"""
        WITH occ AS (
            SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
            FROM documents
        ), vocab AS (
            SELECT token, COUNT(*) AS cnt FROM occ GROUP BY token
        )
        SELECT o.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(v.cnt) AS DOUBLE) / COUNT(*) AS mean_token_count,
               CAST(SUM(CASE WHEN v.cnt < {min_cnt} THEN 1 ELSE 0 END) AS DOUBLE)
                   / COUNT(*) AS rare_token_frac
        FROM occ o JOIN vocab v USING (token)
        GROUP BY o.doc_id ORDER BY o.doc_id
    """


def lang_mismatch(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Curation QC: docs whose lexicon-predicted language disagrees with
    the table's labeled ``lang`` — mislabeled upstream metadata is a
    classic corpus defect (wrong-language docs poison per-language
    mixtures). Output: (doc_id, lang, pred_lang, pred_hits) for the
    disagreeing docs only. Composes lang_id's codegen'd scan with one
    filter — still no shuffle."""
    pred = lang_id(documents, text_col=text_col)
    return (
        documents.select("doc_id", "lang")
        .join(pred, "doc_id")
        .filter(F.col("lang") != F.col("pred_lang"))
        .select("doc_id", "lang", "pred_lang", "pred_hits")
        .orderBy("doc_id")
    )


def lang_mismatch_oracle_sql() -> str:
    inner = _lang_id_oracle()
    return f"""
        WITH pred AS ({inner})
        SELECT d.doc_id, d.lang, p.pred_lang, p.pred_hits
        FROM documents d JOIN pred p USING (doc_id)
        WHERE d.lang <> p.pred_lang
        ORDER BY d.doc_id
    """


def collocations_topk(
    documents: DataFrame,
    k: int = 30,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Top-k bigram collocations by pointwise-mutual-information LIFT —
    the classic "machine learning"-finder (Church & Hanks 1990) used to
    audit tokenizer merge candidates and spot boilerplate phrases.

    lift(x,y) = P(x,y) / (P(x)·P(y)) = c_xy · N_uni² / (N_bi · c_x · c_y)
    — the exp of PMI, a monotone transform, so the RANKING is PMI's
    while the arithmetic stays inside exact int64 products (< 2^53 for
    corpus token counts up to ~10^8 per factor; beyond that shift to
    per-billion scaling) with ONE final IEEE division — bit-identical
    across engines, no ln anywhere (ln is correctly rounded in neither).

    Scale shape: bigrams and unigrams are two map-side-combinable
    groupBys over the token stream; the two count joins are keyed by
    token (shuffled equi-joins — a 100 TB vocab cannot broadcast); top-k
    is a global TakeOrdered. min_count suppresses the hapax-pair noise
    that dominates raw PMI.

    Output: (rank, bigram, c_xy, c_x, c_y, lift), rank 1..k by lift
    DESC, bigram ASC.
    """
    from pyspark.sql import Window

    toks = documents.select(_tokens(F.col(text_col)).alias("t"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        toks.select(
            F.explode(
                F.when(
                    F.size("t") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("t") - 1),
                        lambda i: F.struct(
                            F.element_at("t", i).alias("x"),
                            F.element_at("t", i + F.lit(1)).alias("y"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))
            ).alias("p")
        )
        .select("p.x", "p.y")
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= min_count)
    )
    n_uni = uni.groupBy().agg(F.sum("c")).collect()[0][0]
    n_bi = (
        toks.select((F.greatest(F.size("t") - 1, F.lit(0))).alias("nb"))
        .groupBy()
        .agg(F.sum("nb"))
        .collect()[0][0]
    )
    scored = (
        bi.join(uni.select(F.col("w").alias("x"), F.col("c").alias("c_x")), "x")
        .join(uni.select(F.col("w").alias("y"), F.col("c").alias("c_y")), "y")
        .select(
            F.concat_ws(" ", "x", "y").alias("bigram"),
            "c_xy",
            "c_x",
            "c_y",
            (
                (F.col("c_xy") * F.lit(int(n_uni)) * F.lit(int(n_uni))).cast("double")
                / (F.lit(int(n_bi)) * F.col("c_x") * F.col("c_y")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("bigram"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("lift"), F.asc("bigram"))  # k rows only
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "bigram", "c_xy", "c_x", "c_y", "lift"
    )


def collocations_oracle_sql(k: int = 30, min_count: int = 5) -> str:
    """DuckDB mirror — identical integer products, one final division."""
    return f"""
        WITH toks AS (
            SELECT string_split(text, ' ') AS t FROM documents
        ), uni AS (
            SELECT w, COUNT(*) AS c FROM (SELECT UNNEST(t) AS w FROM toks) GROUP BY w
        ), nu AS (SELECT SUM(c) AS n_uni FROM uni
        ), nb AS (
            SELECT SUM(greatest(len(t) - 1, 0)) AS n_bi FROM toks
        ), bi AS (
            SELECT x, y, COUNT(*) AS c_xy FROM (
                SELECT t[i] AS x, t[i+1] AS y
                FROM toks, UNNEST(range(1, greatest(len(t), 1))) AS r(i)
            ) GROUP BY x, y HAVING COUNT(*) >= {min_count}
        ), scored AS (
            SELECT x || ' ' || y AS bigram, c_xy, u1.c AS c_x, u2.c AS c_y,
                   CAST(c_xy * n_uni * n_uni AS DOUBLE)
                     / CAST(n_bi * u1.c * u2.c AS DOUBLE) AS lift
            FROM bi JOIN uni u1 ON bi.x = u1.w
                    JOIN uni u2 ON bi.y = u2.w
                    CROSS JOIN nu CROSS JOIN nb
        )
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY lift DESC, bigram ASC) AS BIGINT) AS rank,
               bigram, CAST(c_xy AS BIGINT) AS c_xy, CAST(c_x AS BIGINT) AS c_x,
               CAST(c_y AS BIGINT) AS c_y, lift
        FROM scored ORDER BY lift DESC, bigram ASC LIMIT {k}
    """


# ------------------------------------------------------------------ r8


def tokenizer_fertility_by_lang(
    documents: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Tokenizer-fertility profile per language: whitespace tokens,
    BPE-ish subword estimate (the token_counts len/4 heuristic), and the
    fertility ratio (subwords per word) plus chars-per-word — the
    pre-training readout that tells you which languages your tokenizer
    over-fragments (fertility >> 1 means the context window buys fewer
    words there).

    Integer sums per language with single IEEE divisions at the end —
    one scan, one keyed groupBy (lang cardinality output). The corpus
    lang column is the grouping key (swap in lang_id for unlabeled
    corpora).

    Output: (lang, n_docs, n_tokens, n_bpe, fertility, chars_per_token),
    ordered by lang.
    """
    toks = _tokens(F.col(text_col))
    per_doc = documents.select(
        "lang",
        F.size(toks).cast("long").alias("nt"),
        (F.length(F.col(text_col)) / F.lit(4)).cast("long").alias("nb"),
        F.length(F.col(text_col)).cast("long").alias("nc"),
    )
    agg = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").alias("n_tokens"),
        F.sum("nb").alias("n_bpe"),
        F.sum("nc").alias("n_chars"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_tokens",
        "n_bpe",
        (F.col("n_bpe").cast("double") / F.col("n_tokens").cast("double")).alias(
            "fertility"
        ),
        (
            F.col("n_chars").cast("double") / F.col("n_tokens").cast("double")
        ).alias("chars_per_token"),
    ).orderBy("lang")


def tokenizer_fertility_oracle_sql() -> str:
    return """
        WITH per_doc AS (
            SELECT lang,
                   len(string_split(text, ' ')) AS nt,
                   CAST(length(text) // 4 AS BIGINT) AS nb,
                   length(text) AS nc
            FROM documents
        ), agg AS (
            SELECT lang, COUNT(*) AS n_docs, SUM(nt) AS n_tokens,
                   SUM(nb) AS n_bpe, SUM(nc) AS n_chars
            FROM per_doc GROUP BY lang
        )
        SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(n_bpe AS BIGINT) AS n_bpe,
               CAST(n_bpe AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS fertility,
               CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                   AS chars_per_token
        FROM agg ORDER BY lang
    """


def gini_source_concentration(documents: DataFrame) -> DataFrame:
    """Gini coefficient of the corpus's per-source document counts — the
    one-number concentration gauge (0 = every source contributes equally,
    →1 = one crawl dominates) that a mixture designer watches before
    setting sampling weights.

    Exact arithmetic: counts are integers, sources are ranked ascending
    by (count, source) — the deterministic tie-break — and
    G = 2·Σ(rank·c) / (n·Σc) − (n+1)/n is two IEEE divisions and one
    subtraction of exact int64 aggregates, identical in both engines.

    Scale: one keyed groupBy (source cardinality output) plus a window
    over the SOURCE table (thousands of rows at worst — the single
    partition it implies is source-sized, never data-sized).

    Output: one row (n_sources, n_docs, gini).
    """
    from pyspark.sql import Window

    counts = documents.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("c", "source")
    ranked = counts.withColumn("i", F.row_number().over(w))
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_sources"),
        F.sum("c").alias("n_docs"),
        F.sum(F.col("i") * F.col("c")).alias("ic"),
    )
    return agg.select(
        "n_sources",
        "n_docs",
        (
            (F.lit(2.0) * F.col("ic").cast("double"))
            / (F.col("n_sources") * F.col("n_docs")).cast("double")
            - (F.col("n_sources") + 1).cast("double")
            / F.col("n_sources").cast("double")
        ).alias("gini"),
    )


def gini_source_oracle_sql() -> str:
    return """
        WITH counts AS (
            SELECT source, COUNT(*) AS c FROM documents GROUP BY source
        ), ranked AS (
            SELECT c, ROW_NUMBER() OVER (ORDER BY c, source) AS i FROM counts
        ), agg AS (
            SELECT COUNT(*) AS n_sources, SUM(c) AS n_docs,
                   SUM(i * c) AS ic
            FROM ranked
        )
        SELECT CAST(n_sources AS BIGINT) AS n_sources,
               CAST(n_docs AS BIGINT) AS n_docs,
               (2.0 * CAST(ic AS DOUBLE))
                   / CAST(n_sources * n_docs AS DOUBLE)
               - CAST(n_sources + 1 AS DOUBLE) / CAST(n_sources AS DOUBLE)
                   AS gini
        FROM agg
    """
