"""Planet-scale streamed pipeline demonstration.

Generates a synthetic multi-GB SST grid on disk, then runs BOTH
streamed pipelines end-to-end file-to-file, reporting wall time and
peak host RSS — host memory stays O(time x stripe) regardless of grid
size (the automated version of the reference's manual split workflow,
reference: docs/dask.rst:44-86):

* staged: stream_threshold + stream_detect (the reference's staged
  workflow shape), and
* fused: stream_run — climatology + detection + year-block stats +
  ranks in ONE pass over the file (one upload per stripe).

Usage:  python examples/planet_stream.py [ny] [nx] [years]
Defaults are a reduced grid (96 x 96 x 10 yr ~ 1.3 GB); the full
0.25-degree OISST scale is ny=720 nx=1440 years=40 (~60 GB on disk).
"""

import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import xmhw_tpu as xm  # noqa: E402
from xmhw_tpu.stream import GridReader, stream_detect, stream_threshold  # noqa: E402
from xmhw_tpu.xrlite import TimeIndex, encode_cf_time  # noqa: E402


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def make_input(path, ny, nx, years, land_frac=0.3, seed=0):
    """Write a synthetic (time, lat, lon) SST NetCDF in stripes."""
    import h5py

    rng = np.random.default_rng(seed)
    t = np.arange("1982-01-01", f"{1982 + years}-01-01",
                  dtype="datetime64[D]").astype("datetime64[ns]")
    T = len(t)
    land = rng.random((ny, nx)) < land_frac
    raw, units, cal = encode_cf_time(TimeIndex(t))
    with h5py.File(path, "w") as h:
        tv = h.create_dataset("time", data=raw)
        tv.make_scale("time")
        tv.attrs["units"] = units
        tv.attrs["calendar"] = cal
        la = h.create_dataset("lat", data=np.linspace(-60, 60, ny))
        la.make_scale("lat")
        lo = h.create_dataset("lon", data=np.linspace(0, 359, nx))
        lo.make_scale("lon")
        v = h.create_dataset("sst", shape=(T, ny, nx), dtype="f4",
                             chunks=(min(T, 4096), 1, nx))
        v.attrs["units"] = "degree_C"
        v.dims[0].attach_scale(tv)
        v.dims[1].attach_scale(la)
        v.dims[2].attach_scale(lo)
        day = np.arange(T, dtype=np.float32)[:, None, None]
        seas = 15 + 3 * np.sin(2 * np.pi * day / 365.25)
        stripe = max(1, int(2 ** 28 / (T * nx * 4)))
        buf = np.empty((T, stripe, nx), np.float32)
        for y0 in range(0, ny, stripe):
            y1 = min(y0 + stripe, ny)
            b = buf[:, : y1 - y0]
            b[:] = seas
            b += rng.normal(0, 2.0, b.shape).astype(np.float32)
            b[:, land[y0:y1]] = np.nan
            v[:, y0:y1] = b
    return T


def main(ny=96, nx=96, years=10, layout="compact"):
    base = os.environ.get("XMHW_STREAM_DIR", "/tmp/xmhw_stream")
    os.makedirs(base, exist_ok=True)
    sst = os.path.join(base, "sst_big.nc")
    clim = os.path.join(base, "clim_big.nc")
    mhw = os.path.join(base, "mhw_big.nc")

    t0 = time.time()
    T = make_input(sst, ny, nx, years)
    t1 = time.time()
    gb = os.path.getsize(sst) / 1e9
    print(f"input: {ny}x{nx}x{T}d = {gb:.1f} GB in {t1 - t0:.0f}s "
          f"(rss {rss_gb():.1f} GB)")

    t1 = time.time()
    stream_threshold(sst, "sst", clim)
    t2 = time.time()
    print(f"stream_threshold: {t2 - t1:.0f}s (rss {rss_gb():.1f} GB)")

    stream_detect(sst, "sst", clim, mhw, events_layout=layout)
    t3 = time.time()
    print(f"stream_detect[{layout}]: {t3 - t2:.0f}s "
          f"(rss {rss_gb():.1f} GB)")

    with GridReader(mhw, "duration", lead_dim=None) as g:
        n = np.isfinite(g.read(0, g.grid_shape[0])).sum()
    cells = int(ny * nx)
    print(f"events found: {n}; {cells / (t3 - t1):.0f} cells/s end-to-end "
          f"(threshold+detect, file-to-file)")

    # fused single pass: same outputs plus block stats + ranks, ONE
    # read + ONE upload of the data (docs/streaming.md)
    t4 = time.time()
    xm.stream_run(sst, "sst",
                  os.path.join(base, "f_clim.nc"),
                  os.path.join(base, "f_mhw.nc"),
                  block_path=os.path.join(base, "f_block.nc"),
                  rank_path=os.path.join(base, "f_rank.nc"),
                  events_layout=layout)
    t5 = time.time()
    print(f"stream_run (fused, + block stats + ranks): {t5 - t4:.0f}s "
          f"(rss {rss_gb():.1f} GB); staged threshold+detect alone was "
          f"{t3 - t1:.0f}s")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4]]
    main(*args) if args else main()
