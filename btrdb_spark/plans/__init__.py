"""Materialized plans: the multi-resolution rollup ladder."""
