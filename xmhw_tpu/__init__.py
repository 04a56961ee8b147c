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
