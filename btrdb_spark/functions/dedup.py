"""Deduplication operators for large-scale training-data pipelines.

All hashing is *engine-portable*: md5 of the text (hex -> int64 via the
first 15 hex chars), so the DuckDB oracle computes bit-identical values.
No Python UDFs — everything is built-in Spark SQL functions (JVM-side,
whole-stage-codegen'd), which is what survives a 100 TB corpus.

Scale notes:
- exact_duplicates: one shuffle on a 64-bit hash (never on the raw text —
  shuffling full documents at 100 TB is the classic mistake).
- ngram_jaccard_pairs: explode to (doc, shingle) edges, self-join on
  shingle. The shingle join is the quadratic risk at scale: stop-shingle
  removal / minhash (below) is the scale path; this exact variant is the
  correctness baseline.
- minhash_lsh_pairs: k permutation min-hashes per doc (one explode +
  groupBy), banded into b buckets; candidate pairs only where a whole band
  collides — the standard sub-quadratic LSH design. Signatures are
  arrays, bands are hashed to one long each, and the pair join runs on
  (band_id, band_hash) — a shuffle whose key cardinality grows with the
  corpus, keeping partitions balanced.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Mersenne prime 2^61-1; hash values reduced to 32 bits before the affine
# transform so a_i*h + b_i stays inside int64 (documented in oracle too).
MERSENNE = (1 << 61) - 1
H32 = (1 << 32) - 1


def _h64(c: Column) -> Column:
    """Portable 60-bit hash: first 15 hex chars of md5 as int64.

    DuckDB mirror: ('0x' || substr(md5(x), 1, 15))::BIGINT
    """
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def _shingles(text: Column, n: int) -> Column:
    """Distinct word n-gram shingles of a text column (1-indexed slices).

    DuckDB mirror uses list_transform(range(...)) with the same 1-based
    indexing; both sides split on a single space.
    """
    toks = F.split(text, " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    return F.array_distinct(grams)


def exact_duplicates(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: group by content hash, keep the lowest doc_id.

    Output: (text_hash, keeper_doc_id, n_copies) for every distinct text.
    """
    return (
        documents.select(F.md5(F.col(text_col)).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("text_hash")
    )


def shingle_edges(documents: DataFrame, n: int, text_col: str = "text") -> DataFrame:
    return documents.select(
        "doc_id", F.explode(_shingles(F.col(text_col), n)).alias("shingle")
    )


def ngram_jaccard_pairs(
    documents: DataFrame, n: int = 3, threshold: float = 0.5, text_col: str = "text"
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (doc_a < doc_b, jaccard >= threshold)."""
    edges = shingle_edges(documents, n, text_col).cache()
    sizes = edges.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = edges.alias("a")
    b = edges.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb"))
    out = (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= F.lit(threshold))
    )
    return out.select("doc_a", "doc_b", "jaccard").orderBy("doc_a", "doc_b")


def minhash_signatures(
    documents: DataFrame, n: int = 3, num_hashes: int = 32, text_col: str = "text"
) -> DataFrame:
    """(doc_id, i, sig): min over shingles of (a_i * h32(shingle) + b_i) mod p."""
    edges = shingle_edges(documents, n, text_col)
    hashed = edges.select("doc_id", (_h64(F.col("shingle")) % F.lit(H32 + 1)).alias("h32"))
    perms = F.explode(
        F.array(*[
            F.struct(F.lit(i).alias("i"), F.lit(2 * i + 1).alias("a"), F.lit(7919 * i + 1).alias("b"))
            for i in range(num_hashes)
        ])
    ).alias("perm")
    return (
        hashed.select("doc_id", "h32", perms)
        .select(
            "doc_id",
            F.col("perm.i").alias("i"),
            ((F.col("perm.a").cast("long") * F.col("h32") + F.col("perm.b")) % F.lit(MERSENNE)).alias("hv"),
        )
        .groupBy("doc_id", "i")
        .agg(F.min("hv").alias("sig"))
    )


def minhash_lsh_pairs(
    documents: DataFrame,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """LSH candidate pairs: docs sharing at least one full band of minhashes.

    Output: (doc_a, doc_b, est_jaccard) where est_jaccard is the fraction of
    matching signature components.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(documents, n, num_hashes, text_col).cache()
    band_hash = F.md5(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "sig"))),
                lambda s: s["sig"].cast("string"),
            ),
            ",",
        )
    )
    banded = (
        sigs.withColumn("band", F.floor(F.col("i") / F.lit(rows_per_band)).cast("int"))
        .groupBy("doc_id", "band")
        .agg(band_hash.alias("band_hash"))
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("i").alias("i"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b2"), F.col("i").alias("ib"), F.col("sig").alias("sig_b"))
    est = (
        cand.join(sa, "doc_a")
        .join(sb, (F.col("doc_b") == F.col("doc_b2")) & (F.col("i") == F.col("ib")))
        .groupBy("doc_a", "doc_b")
        .agg((F.sum(F.when(F.col("sig_a") == F.col("sig_b"), 1).otherwise(0)) / F.count(F.lit(1))).alias("est_jaccard"))
    )
    return est.select("doc_a", "doc_b", "est_jaccard").orderBy("doc_a", "doc_b")


def simhash_signatures(documents: DataFrame, bits: int = 16, text_col: str = "text") -> DataFrame:
    """SimHash: sign-sum of token-hash bits -> one integer signature.

    Near-dups differ in few bits (compare via hamming distance). Pure
    column expressions: explode tokens -> per-(doc, bit) sign sums -> one
    groupBy. bits kept small (16 default) because each bit is a column
    expression; at scale you'd fuse this into a single pandas_udf over
    token arrays if bits=64 mattered.
    """
    toks = documents.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    h = _h64(F.col("tok"))
    sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(bits)
        ]
    )
    sig = F.lit(0).cast("long")
    for b in range(bits):
        sig = sig + F.when(F.col(f"b{b}") > 0, F.lit(1 << b).cast("long")).otherwise(0)
    return sums.select("doc_id", sig.alias("simhash")).orderBy("doc_id")


def simhash_pairs(documents: DataFrame, bits: int = 16, max_hamming: int = 3, text_col: str = "text") -> DataFrame:
    """Near-dup candidates by simhash hamming distance <= max_hamming."""
    sigs = simhash_signatures(documents, bits, text_col)
    a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"))
    b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"))
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("doc_a", "doc_b")
    )


# ---------------- DuckDB oracle mirrors ----------------

_SHINGLES_SQL = """
    SELECT doc_id, UNNEST(list_distinct(list_transform(
        range(1, greatest(len(string_split(text, ' ')) - {nm1}, 0) + 1),
        i -> array_to_string(string_split(text, ' ')[i:i+{nm1}], ' ')))) AS shingle
    FROM documents
"""


def _shingle_sql(n: int) -> str:
    return _SHINGLES_SQL.format(nm1=n - 1)


_SIMHASH_BITS = 16
_simhash_sums = ", ".join(
    f"SUM(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
    for b in range(_SIMHASH_BITS)
)
_simhash_sig = " + ".join(
    f"CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(_SIMHASH_BITS)
)

ORACLES = {
    "simhash_pairs": f"""
        WITH toks AS (
            SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
        ), h AS (
            SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv FROM toks
        ), sums AS (
            SELECT doc_id, {_simhash_sums} FROM h GROUP BY 1
        ), sigs AS (
            SELECT doc_id, {_simhash_sig} AS simhash FROM sums
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        ORDER BY 1, 2
    """,
    "dedup_exact": """
        SELECT md5(text) AS text_hash, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
        FROM documents GROUP BY 1 ORDER BY 1
    """,
    "ngram_jaccard_pairs": f"""
        WITH sh AS ({_shingle_sql(3)}),
        sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY 1),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               inter / (sa.n_shingles + sb.n_shingles - inter) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE inter / (sa.n_shingles + sb.n_shingles - inter) >= 0.5
        ORDER BY doc_a, doc_b
    """,
    "minhash_lsh_pairs": f"""
        WITH sh AS ({_shingle_sql(3)}),
        hashed AS (
            SELECT doc_id, (('0x' || substr(md5(shingle), 1, 15))::BIGINT % {H32 + 1}) AS h32
            FROM sh
        ),
        perms AS (
            SELECT i, 2 * i + 1 AS a, 7919 * i + 1 AS b
            FROM (SELECT UNNEST(range(0, 32)) AS i)
        ),
        sigs AS (
            SELECT doc_id, i, MIN((a * h32 + b) % {MERSENNE}) AS sig
            FROM hashed CROSS JOIN perms
            GROUP BY 1, 2
        ),
        banded AS (
            SELECT doc_id, i // 4 AS band,
                   md5(string_agg(CAST(sig AS VARCHAR), ',' ORDER BY i)) AS band_hash
            FROM sigs GROUP BY 1, 2
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b,
               SUM(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END) / COUNT(*) AS est_jaccard
        FROM cand
        JOIN sigs sa ON sa.doc_id = doc_a
        JOIN sigs sb ON sb.doc_id = doc_b AND sb.i = sa.i
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
}
