"""Persistent incremental ANN index — O(new vectors) similarity search
and maintenance over a growing embedding corpus.

The one-shot ANN operators (``similarity.ann_ivf_topk`` and friends)
re-assign every corpus vector to its IVF cell per run: at 100 TB that is
a full corpus scan + coarse-quantization to answer today's queries. This
module persists the IVF state those operators rebuild each time — the
coarse-quantizer centroids and the (vec_id, cell, embedding) posting
table — as an append-only parquet index behind the same atomic
generation pointers as the engine tables (store.py), maintained
incrementally (one ``update()`` per ingest micro-batch, the exact
pattern of functions/dedup_index.py, itself the plans/rollup.py
``ingest_batch`` pattern).

``probe(batch, k, nprobe)`` answers top-k cosine neighbors for the NEW
vectors touching only:

- O(batch) assignment work — nprobe nearest cells for the batch alone
  (centroids are tiny and broadcast);
- the posting-table partitions of the probed cells. At cluster scale the
  posting table is written partitioned BY CELL, so the cell equi-join
  is partition-pruned: a probe reads ~nprobe/n_centroids of the index
  and never the raw corpus table.

Equivalence contract (oracle-gated): ``probe(batch)`` over an index
built incrementally from ``corpus`` (any update batching) ==
``similarity.ann_ivf_topk(corpus, batch, centroids=<same>)`` bit-exact,
because cell assignment and cosine are pure functions of the vectors
and the persisted centroids.

Reference parity note: the reference engine has no vector surface; this
is a training-data-pipeline extension (SURVEY.md §6) — the embedding
analog of the r9 DedupIndex.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .similarity import _dot, _norm, ivf_cells


class AnnIndex:
    """Append-only IVF index over an embedding corpus.

    Layout under ``base_dir`` (each behind a store generation pointer):

    - ``centroids`` : (vec_id long, embedding array<double>) — the coarse
      quantizer, fixed at ``set_centroids`` time (faiss contract: train
      once on a bootstrap sample, assignments stay valid as the corpus
      grows; retraining is a rebuild, not an update).
    - ``cells``     : (vec_id long, cell long, embedding) — posting table,
      written ``partitionBy("cell")`` so probes prune to their cells.

    vec_ids must be unique across the corpus (ingest contract); crash
    replay of an epoch is guarded like DedupIndex.update.
    """

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        backend=None,
    ):
        from .. import store as store_mod

        self.spark = spark
        self.base = base_dir
        self.id_col = id_col
        self.vec_col = vec_col
        self.store = backend if backend is not None else store_mod.DEFAULT
        os.makedirs(base_dir, exist_ok=True)

    # ---- epoch guard (identical contract to DedupIndex) ----

    def committed_epoch(self) -> int | None:
        path = os.path.join(self.base, "EPOCH")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return int(f.read().strip())

    def _mark_epoch(self, epoch: int) -> None:
        tmp = os.path.join(self.base, ".EPOCH.tmp")
        with open(tmp, "w") as f:
            f.write(str(int(epoch)))
        os.replace(tmp, os.path.join(self.base, "EPOCH"))

    def _table(self, name: str) -> DataFrame | None:
        path = self.store.resolve(self.base, name)
        if path is None:
            return None
        import glob as _glob

        has = _glob.glob(os.path.join(path, "*.parquet")) or _glob.glob(
            os.path.join(path, "*", "*.parquet")
        )
        if not has:
            return None
        return self.spark.read.parquet(path)

    # ---- build / maintain ----

    def set_centroids(self, centroids: DataFrame) -> None:
        """Persist the coarse quantizer (once, before the first update)."""
        centroids.select(
            F.col(self.id_col).alias("vec_id"),
            F.col(self.vec_col).cast("array<double>").alias("embedding"),
        ).coalesce(1).write.mode("overwrite").parquet(
            self.store.current_dir(self.base, "centroids", create=True)
        )

    def centroids(self) -> DataFrame:
        c = self._table("centroids")
        if c is None:
            raise RuntimeError("AnnIndex: set_centroids() before use")
        return c

    def update(self, new_vecs: DataFrame, epoch: int | None = None) -> None:
        """Append posting rows for ``new_vecs`` — O(batch) work: one
        broadcast-centroid assignment of the batch, one partitioned
        append. Epoch replay guard as in DedupIndex.update; a replayed
        crash-window batch re-appends rows, and probe() dedups posting
        rows on vec_id so replay degrades cost, never correctness."""
        if epoch is not None:
            done = self.committed_epoch()
            if done is not None and done >= epoch:
                return
        assign = ivf_cells(
            new_vecs, self.centroids(), self.id_col, self.vec_col, nprobe=1
        ).select("vec_id", "cell")
        rows = new_vecs.select(
            F.col(self.id_col).alias("vec_id"),
            F.col(self.vec_col).cast("array<double>").alias("embedding"),
        ).join(assign, "vec_id")
        rows.write.mode("append").partitionBy("cell").parquet(
            self.store.current_dir(self.base, "cells", create=True)
        )
        if epoch is not None:
            self._mark_epoch(epoch)

    # ---- query ----

    def probe(self, batch_vecs: DataFrame, k: int = 5, nprobe: int = 2) -> DataFrame:
        """Top-k cosine neighbors among the INDEXED corpus for each batch
        vector: (query_id, neighbor_id, rank, cosine) — bit-identical to
        ann_ivf_topk(corpus, batch, centroids=index.centroids()) with
        the same nprobe. The batch side (assignments + vectors) is
        broadcast; the posting table streams only its probed cells."""
        cents = self.centroids()
        probe_cells = ivf_cells(
            batch_vecs, cents, self.id_col, self.vec_col, nprobe=nprobe
        ).select(F.col("vec_id").alias("query_id"), "cell")
        p = (
            batch_vecs.select(
                F.col(self.id_col).alias("query_id"),
                F.col(self.vec_col).cast("array<double>").alias("pvec"),
            )
            .withColumn("pnorm", _norm(F.col("pvec")))
            .join(probe_cells, "query_id")
        )
        idx = self._table("cells")
        if idx is None:
            return p.select(
                "query_id",
                F.lit(None).cast("long").alias("neighbor_id"),
                F.lit(None).cast("long").alias("rank"),
                F.lit(None).cast("double").alias("cosine"),
            ).filter(F.lit(False))
        # crash-replay residue tolerance: posting rows dedup on vec_id
        # WITHIN the probed cells only (partition-pruned), never corpus-wide
        c = (
            idx.join(
                F.broadcast(probe_cells.select("cell").distinct()), "cell"
            )
            .dropDuplicates(["vec_id"])
            .select(
                F.col("vec_id").alias("neighbor_id"),
                "cell",
                F.col("embedding").alias("cvec"),
            )
            .withColumn("cnorm", _norm(F.col("cvec")))
        )
        scored = (
            c.join(F.broadcast(p), "cell")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select(
                "query_id",
                "neighbor_id",
                (
                    _dot(F.col("cvec"), F.col("pvec"))
                    / (F.col("cnorm") * F.col("pnorm"))
                ).alias("cosine"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query_id",
                "neighbor_id",
                F.col("rank").cast("long").alias("rank"),
                "cosine",
            )
            .orderBy("query_id", "rank")
        )


    def cell_stats(self) -> DataFrame:
        """Posting-list balance per IVF cell: (cell, n_vecs, frac) — THE
        operational gauge for an IVF index. probe() cost is proportional
        to the probed cells' posting mass, so a skewed quantizer (one
        cell holding half the corpus) silently turns nprobe=2 into a
        half-corpus scan; watch max(frac)*n_cells and retrain/rebuild
        when it drifts (the faiss imbalance_factor readout). Duplicate
        posting rows (crash-replay residue) are deduped on vec_id before
        counting, so the gauge reads logical corpus size."""
        idx = self._table("cells")
        if idx is None:
            return self.spark.createDataFrame(
                [], "cell long, n_vecs long, frac double"
            )
        per = (
            idx.dropDuplicates(["vec_id"])
            .groupBy(F.col("cell").cast("long").alias("cell"))
            .agg(F.count(F.lit(1)).alias("n_vecs"))
        )
        total = per.agg(F.sum("n_vecs").alias("_t"))
        return (
            per.crossJoin(F.broadcast(total))
            .select(
                "cell",
                "n_vecs",
                (F.col("n_vecs").cast("double") / F.col("_t").cast("double")).alias(
                    "frac"
                ),
            )
            .orderBy("cell")
        )


def attach_embedding_ingest(
    stream_df: DataFrame,
    index: AnnIndex,
    checkpoint_dir: str,
):
    """foreachBatch sink maintaining the ANN index from a streaming
    embedding source — the similarity twin of
    dedup_index.attach_document_ingest: exactly-once via the epoch guard,
    restart-durable via the checkpoint."""

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        index.update(batch_df, epoch=int(epoch_id))

    return (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
