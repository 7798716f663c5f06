"""Regression tests for the ADVICE r9 findings (store/engine items live
in test_store_concurrency.py; this file covers the operator-side ones)."""

from __future__ import annotations

import pytest


def test_lsh_projection_sums_survive_int64_overflow(spark):
    """ADVICE r9 #3, resolved by BOUND: the operator's envelope is
    |mq| < ~2^31 (|value| < ~2048 at the 2^20 quantization), enforced
    LOUDLY by the shared Pearson tail's xa*xb int64 multiply under ANSI.
    Within it, |zq| < 2^32 and each projection term < 2^47, so the
    plain long projection sum is exact up to 2^16 buckets/stream and
    matches the oracle's HUGEINT sign bit-for-bit; beyond it ANSI
    raises ARITHMETIC_OVERFLOW instead of silently diverging. (The
    decsum hi/lo split was tried and A/B-measured a 5-8x signature-
    stage slowdown — 128 array-buffer aggs blow up codegen — so the
    bound, not the split, is the shipped resolution.) This fixture sits
    at the envelope's edge (values ~ +/-1900 -> |mq| ~ 2^30.9, products
    ~ 2^62) and asserts Spark == oracle bit-for-bit."""
    import duckdb

    from btrdb_spark.operators.correlate import (
        correlations_topk_lsh_oracle_sql,
        stream_correlations_topk_lsh,
    )

    width = 1 << 42
    rows = []
    # deterministic large-swing series at the envelope edge; siblings
    # s0/s1 correlated, s2 anti-correlated, s3 a different period
    for b in range(192):
        base = 1900.0 if (b * 2654435761) % 2 == 0 else -1900.0
        wob = ((b * 40503) % 97 - 48) * 0.9
        rows.append(("s0", b * width + 5, base + wob))
        rows.append(("s1", b * width + 7, base * 0.9 + wob))
        rows.append(("s2", b * width + 9, -base + wob))
        rows.append(
            ("s3", b * width + 11, (1900.0 if b % 3 == 0 else -1900.0) + wob)
        )
    pts = spark.createDataFrame(rows, "uuid string, time long, value double")
    got = sorted(
        tuple(r)
        for r in stream_correlations_topk_lsh(
            pts, pw=42, k=3, min_overlap=8
        ).collect()
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE pts(uuid VARCHAR, time BIGINT, value DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            correlations_topk_lsh_oracle_sql("pts", pw=42, k=3, min_overlap=8)
        ).fetchall()
    )
    assert got == want
    # sanity on the fixture itself: the planted sibling/anti pairs are
    # found and exact (|corr| filter would hide an all-empty bug)
    assert len(got) >= 6
    partners = {(u, p) for (u, p, _n, _c, rk) in got if rk == 1}
    assert ("s0", "s1") in partners and ("s1", "s0") in partners
