"""Pallas TPU kernels for hot paths."""
