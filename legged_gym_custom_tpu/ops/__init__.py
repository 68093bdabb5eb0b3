"""Pallas TPU kernels for hot paths (populated as profiling identifies them)."""
