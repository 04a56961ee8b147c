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
