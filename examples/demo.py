#!/usr/bin/env python
"""End-to-end demo on the bundled OISST test subset (2003-2004,
Tasman Sea) — the xmhw_tpu analogue of the reference's demo notebook
(reference: docs/xmhw_demo.ipynb)."""

import numpy as np

import xmhw_tpu as xm

SST = "/root/reference/test/testdata/oisst_2003_2004.nc"


def main():
    ds = xm.open_dataset(SST)
    sst = ds["sst"]
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
