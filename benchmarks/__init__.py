"""Benchmark scripts (importable for bench.py)."""
