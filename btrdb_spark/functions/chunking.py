"""Document chunking + chunk-level dedup for training-data pipelines.

A pre-training pipeline rarely trains on whole documents: it slices them
into fixed token windows (with overlap for context continuity), then
dedups at the *chunk* level — near-identical boilerplate chunks recur
across millions of pages even when whole-document hashes differ.

Scale shape:
- ``doc_chunk`` is a pure scan-project-explode: split once, slice per
  start offset inside a single codegen'd projection. No shuffle — at
  100 TB it is embarrassingly parallel and the output is written
  partition-local.
- ``chunk_dedup_stats`` shuffles once on a 64-bit chunk hash (never on
  chunk text), then once on doc_id for the per-doc rollup — both keys
  are high-cardinality and balanced. Same design as
  dedup.exact_duplicates (dedup.py) lifted from documents to chunks.

Reference parity: the reference engine has no text operators at all
(SURVEY §2 — its data plane is (time,value) only); these extend the
engine for LLM-corpus workloads as first-class oracle-gated operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _spread


def doc_chunk(
    documents: DataFrame,
    chunk_tokens: int = 32,
    stride: int = 24,
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token-window chunking.

    Chunk start offsets are 0, stride, 2*stride, ... while < n_tokens;
    each chunk takes ``chunk_tokens`` tokens (the final chunks are
    shorter). chunk_ix = start // stride, so (doc_id, chunk_ix) is a
    stable chunk identity independent of execution order.

    Output: (doc_id, chunk_ix, start_token, n_chunk_tokens, chunk_text),
    ordered by (doc_id, chunk_ix).
    """
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    out = (
        _spread(documents)
        .select("doc_id", toks.alias("toks"), n.alias("n"))
        .select(
            "doc_id",
            "toks",
            F.explode(F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride))).alias("start"),
            "n",
        )
        .select(
            "doc_id",
            (F.col("start") / stride).cast("long").alias("chunk_ix"),
            F.col("start").cast("long").alias("start_token"),
            F.least(F.lit(chunk_tokens), F.col("n") - F.col("start"))
            .cast("long")
            .alias("n_chunk_tokens"),
            F.array_join(
                F.slice(F.col("toks"), F.col("start") + 1, F.lit(chunk_tokens)), " "
            ).alias("chunk_text"),
        )
    )
    return out.orderBy("doc_id", "chunk_ix")


def chunk_dedup_stats(
    documents: DataFrame,
    chunk_tokens: int = 32,
    stride: int = 24,
    text_col: str = "text",
) -> DataFrame:
    """Chunk-level dedup rollup: per doc, how many of its chunks are
    shared (appear verbatim in >= 2 distinct documents).

    Internally joins on xxhash64(chunk_text) — the codegen'd JVM hash —
    while the oracle groups raw chunk strings (identical absent a 64-bit
    collision, which the oracle comparison would surface).

    Output: (doc_id, n_chunks, n_shared_chunks, shared_frac), ordered by
    doc_id.
    """
    chunks = doc_chunk(documents, chunk_tokens, stride, text_col).select(
        "doc_id", F.xxhash64("chunk_text").alias("ch")
    )
    # distinct docs per chunk hash: one balanced shuffle on the hash
    sharing = chunks.groupBy("ch").agg(
        F.count_distinct("doc_id").alias("n_docs_with_chunk")
    )
    return (
        chunks.join(sharing, "ch")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("n_docs_with_chunk") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_shared_chunks"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_shared_chunks",
            (F.col("n_shared_chunks") / F.col("n_chunks")).alias("shared_frac"),
        )
        .orderBy("doc_id")
    )


# ---------------- DuckDB oracle mirrors ----------------

def chunk_oracle_sql(chunk_tokens: int, stride: int) -> str:
    return f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks,
                   len(string_split(text, ' ')) AS n
            FROM documents
        )
        SELECT doc_id,
               CAST(start / {stride} AS BIGINT) AS chunk_ix,
               CAST(start AS BIGINT) AS start_token,
               CAST(LEAST({chunk_tokens}, n - start) AS BIGINT) AS n_chunk_tokens,
               array_to_string(toks[start + 1 : start + {chunk_tokens}], ' ') AS chunk_text
        FROM t, UNNEST(generate_series(0, n - 1, {stride})) AS u(start)
        ORDER BY doc_id, chunk_ix
    """


def chunk_dedup_oracle_sql(chunk_tokens: int, stride: int) -> str:
    return f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks,
                   len(string_split(text, ' ')) AS n
            FROM documents
        ), chunks AS (
            SELECT doc_id,
                   array_to_string(toks[start + 1 : start + {chunk_tokens}], ' ') AS chunk_text
            FROM t, UNNEST(generate_series(0, n - 1, {stride})) AS u(start)
        ), sharing AS (
            SELECT chunk_text, COUNT(DISTINCT doc_id) AS n_docs_with_chunk
            FROM chunks GROUP BY 1
        )
        SELECT c.doc_id,
               COUNT(*) AS n_chunks,
               CAST(SUM(CASE WHEN s.n_docs_with_chunk >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_shared_chunks,
               CAST(SUM(CASE WHEN s.n_docs_with_chunk >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                   / COUNT(*) AS shared_frac
        FROM chunks c JOIN sharing s USING (chunk_text)
        GROUP BY c.doc_id ORDER BY c.doc_id
    """
