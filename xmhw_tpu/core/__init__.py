"""Pure-JAX numerical core operating on dense (time, cell) arrays."""
