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

from pyspark.sql import DataFrame
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
