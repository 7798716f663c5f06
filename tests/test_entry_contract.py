"""Driver-contract invariants for __spark_entry__ (no Spark needed)."""

from __future__ import annotations

import __spark_entry__ as e


def test_every_query_has_an_oracle():
    qs = set(e.queries())
    os_ = set(e.oracle_sql())
    # every declared query must be oracle-gated: a queries() entry without
    # an oracle silently downgrades to the driver's weaker rows-only check.
    # Exceptions are DECLARED (and mirrored in test_registry_gate); none
    # remain since r9 gave image_phash_pairs its arithmetic oracle.
    declared_rows_only: set[str] = set()
    assert qs - os_ - declared_rows_only == set(), (
        f"queries missing oracles: {sorted(qs - os_ - declared_rows_only)}"
    )
    assert os_ - qs == set(), f"oracles without queries: {sorted(os_ - qs)}"


def test_oracle_sql_mentions_only_registered_tables():
    # catch typos: oracles may only reference the driver's pre-registered
    # views (or self-contained CTEs/VALUES)
    tables = {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    }
    for name, sql in e.oracle_sql().items():
        lowered = sql.lower()
        assert any(t in lowered for t in tables), f"{name}: oracle references no known table"
