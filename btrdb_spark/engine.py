"""BTrDB-like engine facade: the stateful write path over Spark tables.

Maps the reference's ingest machinery onto Spark-native storage (SURVEY.md
§2.1, §3.1):

- Insert (S1)  -> validated append into a *hot* buffer table (the PQM
  buffer analog, pqm.go:510-625). Ack = durable parquet write (the WAL
  analog); minor version = buffered row count (pqm.go:352).
- Flush (S4)   -> compaction: hot rows move to the cold points table
  stamped with major+1 (quasar.go:73-112 WritePrimaryStorage). Happens
  automatically when the buffer exceeds `flush_threshold` (32768 points,
  pqm.go:29-35).
- DeleteRange (V3) -> range tombstone row at a new version (COW:
  quasar.go:481-514).
- Obliterate (S7)  -> metadata tombstone + data removal
  (quasar.go:572-593); the uuid can never be reused
  (metaprovider.go:292,316).
- Reads at latest merge hot ∪ cold (J2 merge-on-read, pqm.go:428-470);
  pinned-version reads see only committed data.

Version bookkeeping mirrors internal/bprovider/bprovider.go:32-33:
9 = created-but-empty, 10 = first committed data, +1 per flush/delete.

Storage layout: each logical table is a parquet directory; commits are
appends (immutable files — the COW analog), so historical versions remain
readable forever. On a cluster this is a Delta/Iceberg table partitioned
by (uuid_bucket, time_bucket); the engine only relies on append +
version-column semantics, which both provide. Stream metadata is
dimension-sized and rewritten per mutation (etcd analog).
"""

from __future__ import annotations

import os
import uuid as uuidlib
from collections.abc import Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import metadata as md
from .operators import raw as raw_ops
from .operators import windows as win_ops
from .operators import changes as chg_ops
from .schemas import (
    DELETES_SCHEMA,
    HOT_POINTS_SCHEMA,
    MAX_INSERT_TIME,
    MIN_TIME,
    POINTS_SCHEMA,
    STREAMS_SCHEMA,
    VERSION_CREATED,
    VERSION_FIRST_DATA,
)

MAX_INSERT_SIZE = 25000        # grpcinterface/serve.go:57
FLUSH_THRESHOLD = 32768        # pqm.go:29
N_UUID_BUCKETS = 16            # cold-table partition fanout (hash ring analog)
TIME_PARTITION_PW = 47         # 2^47 ns ≈ 1.6 days per time partition


def uuid_bucket(col):
    """Deterministic uuid -> partition bucket. The analog of the reference's
    MASH hash ring (internal/configprovider/clustering.go:78-95): co-locates
    a stream's data so single-stream queries prune to one partition
    directory. At 100 TB raise N_UUID_BUCKETS."""
    return F.pmod(F.xxhash64(col), F.lit(N_UUID_BUCKETS))


def time_bucket(col):
    """Second partition dimension: coarse time bucket (~1.6 days). A time-
    range query prunes whole directories (PartitionFilters) before parquet
    row-group min/max skipping runs — the tree-descent analog for the
    dominant query shape (single stream, bounded range). Arithmetic shift
    = floor division, correct for negative times."""
    return F.shiftright(col, TIME_PARTITION_PW)


class BTrDBEngine:
    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        flush_threshold: int = FLUSH_THRESHOLD,
        ladder: bool = False,
    ):
        self.spark = spark
        self.base = base_dir
        self.flush_threshold = flush_threshold
        os.makedirs(base_dir, exist_ok=True)
        self.ladder = None
        if ladder:
            from .plans.rollup import RollupLadder

            self.ladder = RollupLadder(spark, f"{base_dir}/rollups")

    # ---------- table access ----------

    def _path(self, name: str) -> str:
        return f"{self.base}/{name}"

    def _read(self, name: str, schema) -> DataFrame:
        path = self._path(name)
        if not os.path.exists(path):
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(path)

    @property
    def points(self) -> DataFrame:
        path = self._path("points")
        if not os.path.exists(path):
            return self.spark.createDataFrame(
                [], "uuid string, time long, value double, version long, uuid_bucket long"
            )
        # partition columns uuid_bucket/time_bucket come from the directory
        # layout; time_bucket is consumed by points_pruned, not exposed here
        return self.spark.read.parquet(path).select(
            "uuid", "time", "value", "version", "uuid_bucket"
        )

    def points_pruned(
        self, uuid: str | None = None, start: int | None = None, end: int | None = None
    ) -> DataFrame:
        """Cold points with every partition dimension pruned that the query
        bounds allow: uuid -> uuid_bucket directory, [start, end) ->
        time_bucket directory range (plus parquet min/max on uuid/time
        inside the surviving files)."""
        path = self._path("points")
        if not os.path.exists(path):
            return self.spark.createDataFrame([], POINTS_SCHEMA)
        df = self.spark.read.parquet(path)
        if uuid is not None:
            df = df.filter(
                (F.col("uuid_bucket") == uuid_bucket(F.lit(uuid))) & (F.col("uuid") == uuid)
            )
        if start is not None:
            df = df.filter(F.col("time_bucket") >= (start >> TIME_PARTITION_PW))
        if end is not None:
            df = df.filter(F.col("time_bucket") <= ((end - 1) >> TIME_PARTITION_PW))
        return df.select("uuid", "time", "value", "version")

    def stream_points(self, uuid: str) -> DataFrame:
        """Single-stream cold points with partition pruning: the bucket
        predicate hits the uuid_bucket=NN directories (PartitionFilters),
        the uuid/time predicates hit parquet row groups (PushedFilters)."""
        return self.points_pruned(uuid)

    @property
    def hot(self) -> DataFrame:
        return self._read("hot", HOT_POINTS_SCHEMA)

    @property
    def deletes(self) -> DataFrame:
        return self._read("deletes", DELETES_SCHEMA)

    @property
    def streams(self) -> DataFrame:
        return self._read("streams", STREAMS_SCHEMA)

    # ---------- metadata plane (M1-M4) ----------

    def create_stream(
        self,
        collection: str,
        tags: Mapping[str, str] | None = None,
        annotations: Mapping[str, str] | None = None,
        uuid: str | None = None,
    ) -> str:
        """M1: create a stream; enforces uniqueness incl. tombstones
        (metaprovider.go:239-331)."""
        tags = dict(tags or {})
        annotations = dict(annotations or {})
        md.validate_collection(collection)
        md.validate_kv(tags, md.MAX_TAGS, "tag")
        md.validate_kv(annotations, md.MAX_ANNOTATIONS, "annotation")
        uuid = uuid or str(uuidlib.uuid4())
        existing = self.streams
        clash = existing.filter(F.col("uuid") == uuid).count()
        if clash:
            raise ValueError(f"uuid already used (possibly tombstoned): {uuid}")
        # MapType columns don't support equality — compare a canonical
        # sorted "k=v,..." rendering (the reference canonicalizes tagsets
        # the same way for its uniqueness index, metaprovider.go:288-307).
        canon = F.array_join(
            F.transform(
                F.array_sort(F.map_entries(F.col("tags"))),
                lambda e: F.concat(e["key"], F.lit("="), e["value"]),
            ),
            ",",
        )
        tagset_clash = (
            md.live(existing)
            .filter(F.col("collection") == collection)
            .filter(canon == F.lit(",".join(f"{k}={v}" for k, v in sorted(tags.items()))))
            .count()
        )
        if tagset_clash:
            raise ValueError(f"duplicate (collection, tagset): {collection} {tags}")
        row = self.spark.createDataFrame(
            [(uuid, collection, tags, annotations, 1, None)], STREAMS_SCHEMA
        )
        row.write.mode("append").parquet(self._path("streams"))
        return uuid

    def set_annotations(
        self, uuid: str, expected_version: int, changes: Mapping[str, str | None]
    ) -> None:
        """M2: CAS annotation update; None value deletes the key
        (metaprovider.go:142-208)."""
        md.validate_kv(changes, md.MAX_ANNOTATIONS, "annotation")
        cur = self.streams.filter(F.col("uuid") == uuid).collect()
        if not cur or cur[0]["tombstoned"] is not None:
            raise KeyError(f"no such stream: {uuid}")
        row = cur[0]
        if row["annotation_version"] != expected_version:
            raise ValueError(
                f"annotation version mismatch: expected {expected_version}, "
                f"actual {row['annotation_version']}"
            )
        anns = dict(row["annotations"] or {})
        for k, v in changes.items():
            if v is None:
                anns.pop(k, None)
            else:
                anns[k] = v
        self._rewrite_stream_row(uuid, annotations=anns, annotation_version=expected_version + 1)

    def _rewrite_stream_row(self, uuid: str, **updates) -> None:
        rows = [r.asDict() for r in self.streams.collect()]
        for r in rows:
            if r["uuid"] == uuid:
                r.update(updates)
        df = self.spark.createDataFrame(
            [tuple(r[f.name] for f in STREAMS_SCHEMA.fields) for r in rows], STREAMS_SCHEMA
        )
        df.write.mode("overwrite").parquet(self._path("streams_tmp"))
        self.spark.read.schema(STREAMS_SCHEMA).parquet(self._path("streams_tmp")).write.mode(
            "overwrite"
        ).parquet(self._path("streams"))

    # ---------- version bookkeeping (V4) ----------

    def stream_version(self, uuid: str) -> tuple[int, int]:
        """(major, minor): major from committed data/deletes, minor = hot rows
        (pqm.go:337-355)."""
        if not md.live(self.streams).filter(F.col("uuid") == uuid).count():
            raise KeyError(f"no such stream: {uuid}")
        committed = (
            self.points.filter(F.col("uuid") == uuid)
            .select("version")
            .unionByName(self.deletes.filter(F.col("uuid") == uuid).select("version"))
            .agg(F.max("version").alias("v"))
            .collect()[0]["v"]
        )
        major = committed if committed is not None else VERSION_CREATED
        minor = self.hot.filter(F.col("uuid") == uuid).count()
        return major, minor

    def info(self) -> dict:
        """Info RPC analog (reference grpcinterface/serve.go:818-872,
        version/consts.go:5-7): build/version report plus basic catalog
        stats — the one §2.13 cluster operator SURVEY keeps in scope.
        Cluster topology (MASH) has no analog; Spark's cluster manager
        owns placement."""
        from . import __version__

        return {
            "engine": "btrdb_spark",
            "version": __version__,
            "reference_api": "4.15",  # version/consts.go:5-7 (MajorVersion 4, MinorVersion 15)
            "spark_version": self.spark.version,
            "healthy": True,
            "n_streams": md.live(self.streams).count(),
        }

    # ---------- write path (S1-S4) ----------

    def insert(self, uuid: str, values: Iterable[tuple[int, float]], sync: bool = False) -> tuple[int, int]:
        """S1: buffered insert. Validates domain, appends to the hot table,
        auto-flushes past the threshold (or immediately when sync=True)."""
        values = list(values)
        if len(values) > MAX_INSERT_SIZE:
            raise ValueError(f"insert too large: {len(values)} > {MAX_INSERT_SIZE}")
        major, minor = self.stream_version(uuid)  # also validates existence
        if not values:
            return major, minor
        for t, v in values:
            if not (MIN_TIME <= t < MAX_INSERT_TIME):
                raise ValueError(f"time out of domain: {t}")
            if v != v or v in (float("inf"), float("-inf")):
                raise ValueError(f"non-finite value at t={t}")
        base_seq = minor
        rows = [(uuid, int(t), float(v), base_seq + i) for i, (t, v) in enumerate(values)]
        self.spark.createDataFrame(rows, HOT_POINTS_SCHEMA).write.mode("append").parquet(
            self._path("hot")
        )
        minor += len(values)
        if sync or minor >= self.flush_threshold:
            return self.flush(uuid)
        return major, minor

    def flush(self, uuid: str) -> tuple[int, int]:
        """S4: commit the hot buffer into the cold points table at major+1."""
        major, minor = self.stream_version(uuid)
        if minor == 0:
            return major, 0
        new_major = VERSION_FIRST_DATA if major == VERSION_CREATED else major + 1
        mine = self.hot.filter(F.col("uuid") == uuid)
        (
            mine.select(
                "uuid", "time", "value", F.lit(new_major).cast("long").alias("version")
            )
            .withColumn("uuid_bucket", uuid_bucket(F.col("uuid")))
            .withColumn("time_bucket", time_bucket(F.col("time")))
            .sort("time")  # the reference sorts batches before merge (qtree.go:623)
            .write.mode("append")
            .partitionBy("uuid_bucket", "time_bucket")
            .parquet(self._path("points"))
        )
        if self.ladder is not None:
            # incremental rollup maintenance (A4) — O(batch) partial append,
            # stamped with the commit version (CGeneration analog) so the
            # ladder can also serve query-at-version
            self.ladder.ingest_batch(
                mine.select(
                    "uuid", "time", "value", F.lit(new_major).cast("long").alias("version")
                )
            )
        self._clear_hot(uuid)
        return new_major, 0

    def bulk_load(self, points: DataFrame, version: int | None = None) -> None:
        """Backfill path: commit an arbitrarily large (uuid, time, value)
        DataFrame straight to cold storage + rollup ladder, bypassing the
        25k-point RPC buffer (which exists for interactive ingest, not
        100 TB history loads).

        Layout contract: one shuffle keyed by uuid_bucket co-locates each
        stream, sortWithinPartitions(uuid, time) gives time-clustered row
        groups (parquet min/max skipping serves single-stream range reads),
        and writing from bucket-partitioned tasks produces one coherent
        file per bucket per load instead of tasks x buckets small files.
        The ladder partial append is O(batch) (plans/rollup.py).
        """
        v = F.lit(version if version is not None else VERSION_FIRST_DATA)
        batch = (
            points.select("uuid", "time", "value", v.cast("long").alias("version"))
            .withColumn("uuid_bucket", uuid_bucket(F.col("uuid")))
            .withColumn("time_bucket", time_bucket(F.col("time")))
        )
        (
            batch.repartition(N_UUID_BUCKETS, F.col("uuid_bucket"))
            .sortWithinPartitions("uuid", "time")
            .write.mode("append")
            .partitionBy("uuid_bucket", "time_bucket")
            .parquet(self._path("points"))
        )
        if self.ladder is not None:
            self.ladder.ingest_batch(
                points.select("uuid", "time", "value").withColumn(
                    "version", v.cast("long")
                )
            )

    def compact_points(self) -> None:
        """OPTIMIZE analog: rewrite the cold table so each (uuid_bucket,
        time_bucket) partition holds few large time-sorted files instead of
        one small file per flush. Append-only ingest accumulates small
        files (every flush = one commit); scan cost at 100 TB is dominated
        by file/footer overhead unless a background compactor runs. On
        Delta/Iceberg this is OPTIMIZE / rewriteDataFiles; versions are
        unaffected (the version column, not file identity, carries MVCC)."""
        import shutil

        path = self._path("points")
        if not os.path.exists(path):
            return
        tmp = self._path("points_compact_tmp")
        (
            self.spark.read.parquet(path)
            .repartition(N_UUID_BUCKETS, F.col("uuid_bucket"))
            .sortWithinPartitions("uuid", "time")
            .write.mode("overwrite")
            .partitionBy("uuid_bucket", "time_bucket")
            .parquet(tmp)
        )
        shutil.rmtree(path)
        os.rename(tmp, path)
        if self.ladder is not None:
            self.ladder.compact()

    def _clear_hot(self, uuid: str) -> None:
        rest = self.hot.filter(F.col("uuid") != uuid)
        rest.write.mode("overwrite").parquet(self._path("hot_tmp"))
        self.spark.read.schema(HOT_POINTS_SCHEMA).parquet(self._path("hot_tmp")).write.mode(
            "overwrite"
        ).parquet(self._path("hot"))

    def delete_range(self, uuid: str, start: int, end: int) -> int:
        """V3: range tombstone at a new version; flushes the buffer first so
        buffered points in range are also deleted."""
        if not (MIN_TIME <= start < end <= MAX_INSERT_TIME):
            raise ValueError(f"bad delete range [{start}, {end})")
        major, minor = self.stream_version(uuid)
        if minor:
            major, _ = self.flush(uuid)
        new_major = VERSION_FIRST_DATA if major == VERSION_CREATED else major + 1
        self.spark.createDataFrame(
            [(uuid, start, end, new_major)], DELETES_SCHEMA
        ).write.mode("append").parquet(self._path("deletes"))
        if self.ladder is not None:
            from .operators.raw import apply_deletes
            from .plans.rollup import invalidate_buckets

            live = apply_deletes(self.stream_points(uuid), self.deletes)
            invalidate_buckets(self.ladder, live, uuid, start, end)
        return new_major

    def obliterate(self, uuid: str) -> None:
        """S7: tombstone metadata and drop the stream's data."""
        if not self.streams.filter(F.col("uuid") == uuid).count():
            raise KeyError(f"no such stream: {uuid}")
        self._rewrite_stream_row(uuid, tombstoned="deleted")
        if os.path.exists(self._path("points")):
            import shutil

            rest = self.points.filter(F.col("uuid") != uuid).withColumn(
                "time_bucket", time_bucket(F.col("time"))
            )
            if rest.isEmpty():
                shutil.rmtree(self._path("points"))
            else:
                rest.write.mode("overwrite").partitionBy("uuid_bucket", "time_bucket").parquet(
                    self._path("points_tmp")
                )
                self.spark.read.parquet(self._path("points_tmp")).write.mode(
                    "overwrite"
                ).partitionBy("uuid_bucket", "time_bucket").parquet(self._path("points"))
        self._clear_hot(uuid)
        if self.ladder is not None:
            for pw in self.ladder.levels:
                tmp = f"{self.ladder._path(pw)}_tmp"
                keep = self.ladder.level(pw).filter(F.col("uuid") != uuid)
                keep.write.mode("overwrite").parquet(tmp)
                self.spark.read.parquet(tmp).write.mode("overwrite").parquet(
                    self.ladder._path(pw)
                )

    # ---------- read path (merge-on-read) ----------

    def _queryable(
        self,
        version: int | None,
        uuid: str | None = None,
        start: int | None = None,
        end: int | None = None,
    ) -> tuple[DataFrame, DataFrame]:
        """(points, deletes) visible at `version`; latest merges the hot
        buffer in as an uncommitted overlay (J2). The cold side prunes
        every partition dimension the (uuid, time-range) bounds allow."""
        pts = self.points_pruned(uuid, start, end)
        if version is None:
            hot = self.hot
            if uuid is not None:
                hot = hot.filter(F.col("uuid") == uuid)
            overlay = hot.select(
                "uuid", "time", "value", F.lit((1 << 62)).cast("long").alias("version")
            )
            pts = pts.unionByName(overlay)
        return pts, self.deletes

    def raw_values(self, uuid: str, start: int, end: int, version: int | None = None) -> DataFrame:
        pts, dels = self._queryable(version, uuid, start, end)
        return raw_ops.raw_values(pts, uuid, start, end, version=version, deletes=dels)

    def aligned_windows(self, uuid: str, start: int, end: int, pw: int, version: int | None = None) -> DataFrame:
        """A1 — routed through the rollup ladder when it can answer exactly:
        latest-version query, no buffered rows for the stream, and a
        maintained level at or below pw. Otherwise the raw path (which is
        always exact; the ladder is a pure accelerator)."""
        if self.ladder is not None:
            if version is None:
                # latest: valid unless unflushed hot rows must merge in
                routable = not self.hot.filter(F.col("uuid") == uuid).limit(1).count()
            else:
                # historical: version-stamped partials serve it exactly,
                # UNLESS a delete rewrote bucket history (invalidation
                # reflects post-delete latest) — then raw path only
                routable = not self.deletes.filter(F.col("uuid") == uuid).limit(1).count()
            if routable:
                routed = self.ladder.aligned_windows(uuid, start, end, pw, version=version)
                if routed is not None:
                    return routed
        # prune with the SNAPPED bounds (the operator widens start downward
        # to the 2^pw grid — quasar.go:279-283), never the raw ones
        width = 1 << pw
        snap_s = start - (start % width + width) % width
        snap_e = end - (end % width + width) % width
        pts, dels = self._queryable(version, uuid, snap_s, snap_e)
        return win_ops.aligned_windows(pts, uuid, start, end, pw, version=version, deletes=dels)

    def windows(
        self,
        uuid: str,
        start: int,
        end: int,
        width: int,
        version: int | None = None,
        depth: int | None = None,
    ) -> DataFrame:
        pts, dels = self._queryable(version, uuid, start, end)
        if (
            self.ladder is not None
            and version is None
            and not self.hot.filter(F.col("uuid") == uuid).limit(1).count()
            and not self.deletes.filter(F.col("uuid") == uuid).limit(1).count()
        ):
            # hybrid plan: interior buckets from the ladder, edges from the
            # (pruned) raw scan — exact for any width; `depth` opts into
            # the reference's approximate whole-bucket attribution
            routed = self.ladder.windows(pts, uuid, start, end, width, depth=depth)
            if routed is not None:
                return routed
        return win_ops.windows(pts, uuid, start, end, width, version=version, deletes=dels)

    def nearest(self, uuid: str, t: int, backward: bool, version: int | None = None):
        # one-sided prune: backward needs time < t, forward time >= t
        pts, dels = self._queryable(
            version, uuid, start=None if backward else t, end=t if backward else None
        )
        out = raw_ops.nearest_all(pts, t, backward, version=version, deletes=dels).collect()
        return (out[0]["time"], out[0]["value"]) if out else None

    def aligned_windows_collection(
        self,
        collection: str,
        start: int,
        end: int,
        pw: int,
        is_prefix: bool = True,
        tags: Mapping[str, str | None] | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """A1 across EVERY stream matching a metadata predicate — in one
        distributed plan. The reference client must LookupStreams and then
        issue one AlignedWindows RPC per stream (client-side loop); here the
        stream set is a broadcast semi-join against the cold scan and the
        stats come back grouped by (uuid, bucket) in a single job — the
        canonical fleet-wide dashboard query at 100 TB.
        """
        uuids = md.lookup_streams(
            self.streams, collection=collection, is_prefix=is_prefix, tags=tags
        ).select("uuid")
        width = 1 << pw
        snap_s = start - (start % width + width) % width
        snap_e = end - (end % width + width) % width
        pts, dels = self._queryable(version, None, snap_s, snap_e)
        pts = pts.join(F.broadcast(uuids), "uuid", "semi")
        return win_ops.aligned_windows(
            pts, None, start, end, pw, version=version, deletes=dels
        )

    def changed_ranges(
        self, uuid: str, from_ver: int, to_ver: int | None, resolution: int
    ) -> DataFrame:
        """V2. to_ver=None means latest: committed changes > from_ver PLUS
        the buckets touched by the unflushed buffer (pqm.go:357-381)."""
        pts = self.points_pruned(uuid)
        if to_ver is None:
            hot = self.hot
            if uuid is not None:
                hot = hot.filter(F.col("uuid") == uuid)
            overlay = hot.select(
                "uuid", "time", "value", F.lit(1 << 62).cast("long").alias("version")
            )
            pts = pts.unionByName(overlay)
            to_ver = 1 << 62
        return chg_ops.changed_ranges(
            pts, uuid, from_ver, to_ver, resolution, deletes=self.deletes
        )
