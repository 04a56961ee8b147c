"""Low-level device ops (Pallas kernels and helpers)."""
