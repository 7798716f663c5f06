"""Scalar / column-level helpers and scale-out pipeline functions."""
