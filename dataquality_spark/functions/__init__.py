"""Vectorized scoring functions (numpy cores + Spark pandas-UDF wrappers)."""
