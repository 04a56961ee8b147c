#!/usr/bin/env python
"""End-to-end demo on the bundled OISST test subset (2003-2004,
Tasman Sea) — the xmhw_tpu analogue of the reference's demo notebook
(reference: docs/xmhw_demo.ipynb)."""

import os

import numpy as np

import xmhw_tpu as xm

SST = os.environ.get("XMHW_DEMO_DATA",
                     "/root/reference/test/testdata/oisst_2003_2004.nc")


def _synthetic():
    """Fallback when the OISST subset is not available (e.g. CI):
    a 2-year seasonal series with noise on a small Tasman-Sea grid."""
    from xmhw_tpu.xrlite import Coord, DataArray

    t = np.arange("2003-01-01", "2005-01-01",
                  dtype="datetime64[D]").astype("datetime64[ns]")
    rng = np.random.default_rng(3)
    day = np.arange(len(t), dtype=np.float32)
    # smoothed noise so multi-day exceedance runs (events) exist
    noise = rng.normal(0, 1.0, (len(t) + 14, 8, 4))
    sm = np.stack([noise[k:k + len(t)] for k in range(15)]).mean(0)
    ts = (15 + 3 * np.sin(2 * np.pi * day / 365.25)[:, None, None]
          + 2.5 * sm).astype(np.float32)
    ts[:, 0, 0] = np.nan  # a land cell
    return DataArray(
        ts, ("time", "lat", "lon"),
        {"time": Coord(("time",), t),
         "lat": Coord(("lat",), np.linspace(-44, -40, 8)),
         "lon": Coord(("lon",), np.linspace(147, 149, 4))},
        {"units": "degree_C"}, name="sst")


def main():
    if os.path.exists(SST):
        sst = xm.open_dataset(SST)["sst"]
    else:
        print(f"({SST} not found; using a synthetic series)")
        sst = _synthetic()
    print("input:", dict(sst.sizes))

    clim = xm.threshold(sst)
    print("climatology:", dict(clim.dims))

    mhw, inter = xm.detect(sst, clim["thresh"], clim["seas"],
                           intermediate=True)
    nev = np.isfinite(mhw["event"].data).sum()
    print(f"{nev} events; mean duration "
          f"{np.nanmean(mhw['duration'].data):.1f} days; "
          f"max intensity {np.nanmax(mhw['intensity_max'].data):.2f} degC")

    blk = xm.block_average(mhw, dstime=inter)
    print("block years:", list(blk.coords['years'].values),
          "ecount sum:", int(np.nansum(blk['ecount'].data)))

    rank, ret = xm.mhw_rank(mhw)
    print("rank vars:", list(rank.keys())[:5], "...")

    clim.to_netcdf("/tmp/demo_clim.nc")
    mhw.to_netcdf("/tmp/demo_mhw.nc")
    print("wrote /tmp/demo_clim.nc /tmp/demo_mhw.nc")


if __name__ == "__main__":
    main()
