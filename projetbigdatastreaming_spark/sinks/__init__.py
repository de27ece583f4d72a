"""Sinks (K1-K6)."""
