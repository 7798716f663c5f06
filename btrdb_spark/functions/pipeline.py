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


ORACLES = {
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
