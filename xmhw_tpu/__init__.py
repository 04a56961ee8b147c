"""xmhw_tpu — TPU-native marine heatwave detection (JAX/XLA/Pallas).

A ground-up rebuild of the capabilities of coecms/xmhw (Hobday et al. 2016
marine-heatwave detection) designed for TPU hardware: dense (time, cell)
arrays, jit-compiled kernels, cell-axis sharding over a device mesh, and a
lightweight labeled-array + NetCDF shell replacing xarray/dask.

Public API (reference parity: README.rst:16-21):
    threshold()      day-of-year percentile/mean climatology
    detect()         MHW event identification + ~30 per-event properties
    block_average()  year-block statistics
    mhw_rank()       per-property ranks and return periods
"""

import os as _os

# Tunnel-client host-memory guard (harmless elsewhere): the axon PJRT
# client journals every H2D transfer's bytes host-side so it can replay
# the session if the tunnel connection drops. On streamed pipelines that
# upload the whole dataset once per stripe, the journal retains a copy
# of EVERY upload — measured ~171 MB resident per 180 MB device_put,
# surviving buffer deletion (live_buffers()==0), ~43 GB over a 68 GB
# planet-scale run. AXON_JOURNAL_COMPACT=1 (read at client init, so it
# must be set before the first device use) lets the client compact the
# journal down to executable ops: host RSS stays flat at the working
# set. The trade: a dropped tunnel can no longer be transparently
# replayed — the call fails and must be retried, which the streamed
# functions already handle durably via resume=True. Export
# AXON_JOURNAL_COMPACT=0 before import to keep transparent replay.
_os.environ.setdefault("AXON_JOURNAL_COMPACT", "1")


def _enable_compile_cache():
    """Persistent XLA compile cache for EVERY process importing the
    package (XMHW_COMPILE_CACHE overrides the path, '0' disables).

    First-call latency is compile time — multi-second remote compiles on
    the TPU tunnel. Caching executables on disk is the TPU-native answer
    to the reference's zero-compile pandas start: pay the compile once
    per machine (or pre-seed with ``xmhw-tpu warmup``), not once per
    process. Accelerator backends only: XLA:CPU cache entries are AOT
    results pinned to the exact compile-machine ISA feature set — on
    this harness loading one warns "could lead to execution errors such
    as SIGILL" and recompiles anyway (measured: 230 s to seed, zero
    speedup). Config-only (no backend is initialized here)."""
    path = _os.environ.get("XMHW_COMPILE_CACHE",
                           _os.path.expanduser("~/.cache/jax_xmhw"))
    if path in ("0", ""):
        return
    if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return  # CPU-only process (e.g. the test suite): see above
    try:
        import jax

        # the platform may also be pinned via jax.config before this
        # import (the env var is ignored on some builds) — same skip
        if (getattr(jax.config, "jax_platforms", None) or
                "").strip().lower() == "cpu":
            return
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
        jax.config.update("jax_persistent_cache_enable_xla_caches",
                          "none")  # kernel cache only, no AOT blobs
    except Exception:  # pragma: no cover - very old jaxlib
        pass


_enable_compile_cache()

from .api import detect, flip_cold, land_check, threshold
from .exception import XmhwException
from .stats_api import block_average, mhw_rank
from .stream import (merge_grid_band_files, stream_block_average,
                     stream_detect, stream_rank, stream_run,
                     stream_threshold)
from .xrlite import (DataArray, Dataset, TimeIndex, open_dataset,
                     save_dataset, to_dataframe, to_xarray)

__version__ = "0.1.0"

__all__ = [
    "DataArray",
    "Dataset",
    "TimeIndex",
    "XmhwException",
    "block_average",
    "detect",
    "flip_cold",
    "land_check",
    "merge_grid_band_files",
    "mhw_rank",
    "open_dataset",
    "save_dataset",
    "stream_block_average",
    "stream_detect",
    "stream_rank",
    "stream_run",
    "stream_threshold",
    "threshold",
    "to_dataframe",
    "to_xarray",
    "__version__",
]
