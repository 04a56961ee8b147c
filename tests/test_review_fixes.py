"""Regression tests for the round-3 review-pass fixes in the API layer
(stats_api/api/identify): removeMissing grid alignment, zero-event
block_average, synthetic-calendar intermediate binning, reference
start-row placement for joined events, and noleap parity-helper rows."""

import numpy as np
import pytest

import xmhw_tpu as xm
from xmhw_tpu.xrlite import Coord, DataArray


def _grid_da(sst, t, lats, lons):
    return DataArray(
        sst, ("time", "lat", "lon"),
        {"time": Coord(("time",), t),
         "lat": Coord(("lat",), np.asarray(lats, float)),
         "lon": Coord(("lon",), np.asarray(lons, float))},
        {"units": "degC"})


@pytest.fixture(scope="module")
def descending_grid():
    rng = np.random.default_rng(3)
    t = np.arange("2000-01-01", "2004-01-01",
                  dtype="datetime64[D]").astype("datetime64[ns]")
    T = len(t)
    day = np.arange(T)[:, None, None]
    sst = (15 + 3 * np.sin(2 * np.pi * day / 365.25)
           + rng.normal(0, 2.0, (T, 3, 2)))
    # NaNs in 2001 at the FIRST (northernmost) lat row only
    sst[400:420, 0, 0] = np.nan
    return _grid_da(sst, t, [30, 20, 10], [100, 110])  # descending lat


def test_remove_missing_masks_the_right_cell(descending_grid):
    """removeMissing must mask at matching coordinate LABELS even when
    the mhw dataset's grid order (sorted-unique) differs from the
    dstime file's native order (descending latitude)."""
    da = descending_grid
    clim = xm.threshold(da, dtype=np.float64)
    mhw = xm.detect(da, clim["thresh"], clim["seas"], dtype=np.float64)
    blk = xm.block_average(mhw, dstime=da, removeMissing=True)
    ec = blk["ecount"]
    lat_vals = np.asarray(ec.coords["lat"].values)
    years = np.asarray(blk["ecount"].coords["years"].values)
    yrow = int(np.nonzero(years == 2001)[0][0])
    i_dirty = int(np.nonzero(lat_vals == 30)[0][0])
    i_clean = int(np.nonzero(lat_vals == 10)[0][0])
    lon_vals = np.asarray(ec.coords["lon"].values)
    j = int(np.nonzero(lon_vals == 100)[0][0])
    assert np.isnan(ec.data[yrow, i_dirty, j])     # NaN-year cell masked
    assert np.isfinite(ec.data[yrow, i_clean, j])  # clean cell kept


def test_block_average_zero_events(descending_grid):
    """A legitimate zero-event detect() result (union layout, E=0) must
    produce empty bins, not a reshape crash."""
    da = descending_grid
    clim = xm.threshold(da, dtype=np.float64)
    # threshold far above any value -> no events
    hot = clim["thresh"].copy(data=np.asarray(clim["thresh"].data) + 50)
    mhw = xm.detect(da, hot, clim["seas"], dtype=np.float64)
    assert np.asarray(mhw["event"].data).shape[0] == 0
    blk = xm.block_average(mhw, dstime=da)
    assert float(np.nansum(np.asarray(blk["ecount"].data))) == 0.0


def test_intermediate_noleap_bins_by_year():
    """block_average(dstime=mhw_inter) on a synthetic (noleap) calendar
    must bin days by YEAR, not by raw CF offset."""
    from xmhw_tpu.xrlite import TimeIndex, decode_cf_time

    rng = np.random.default_rng(5)
    T = 365 * 4
    tindex = decode_cf_time(np.arange(T, dtype=np.float64),
                            "days since 2000-01-01", "noleap")
    day = np.arange(T)[:, None, None]
    sst = (15 + 3 * np.sin(2 * np.pi * day / 365.0)
           + rng.normal(0, 2.0, (T, 2, 2)))
    da = DataArray(sst, ("time", "lat", "lon"),
                   {"time": Coord(("time",), tindex),
                    "lat": Coord(("lat",), np.array([10., 20.])),
                    "lon": Coord(("lon",), np.array([100., 110.]))},
                   {"units": "degC"})
    clim = xm.threshold(da, dtype=np.float64)
    mhw, inter = xm.detect(da, clim["thresh"], clim["seas"],
                           intermediate=True, dtype=np.float64)
    blk = xm.block_average(mhw, dstime=inter)
    years = np.asarray(blk["ts_mean"].coords["years"].values)
    np.testing.assert_array_equal(years, [2000, 2001, 2002, 2003])


def test_mhw_filter_joined_start_at_first_component_end():
    """Reference join_gaps keeps the merged start VALUE at the FIRST
    component run's end row (identify.py:313-316); the merged end stays
    at the last row."""
    from xmhw_tpu.identify import mhw_filter

    b = np.zeros(20, bool)
    b[2:8] = True    # run 2..7 (6 days)
    b[10:16] = True  # run 10..15 (6 days), gap 8..9 (2 days)
    out = mhw_filter(b, min_duration=5, join_gaps=True, max_gap=2)
    assert out["n_events"] == 1
    assert out["start"][7] == 2.0          # first component's end row
    assert np.isnan(out["start"][15])
    assert out["end"][15] == 15.0          # merged end row
    assert np.isnan(out["end"][7])
    # unjoined: both at the single end row
    out2 = mhw_filter(b, min_duration=5, join_gaps=False, max_gap=2)
    assert out2["n_events"] == 2
    assert out2["start"][7] == 2.0 and out2["end"][7] == 7.0
    assert out2["start"][15] == 10.0 and out2["end"][15] == 15.0


def test_calculate_thresh_noleap_has_no_doy60_row():
    """The parity helpers mirror the reference's groupby('doy'): only
    PRESENT doys appear (noleap pooling has no doy-60 row at all)."""
    from xmhw_tpu.identify import calculate_seas, calculate_thresh

    rng = np.random.default_rng(0)
    # doys of two noleap years under the 366-mapping (60 never occurs)
    doy1 = np.concatenate([np.arange(1, 60), np.arange(61, 367)])
    doys = np.concatenate([doy1, doy1])
    vals = rng.normal(15, 2, len(doys))
    tw = DataArray(vals, ("z",), {"doy": Coord(("z",), doys)})
    th = calculate_thresh(tw)
    se = calculate_seas(tw)
    for out in (th, se):
        got_doys = np.asarray(out.coords["doy"].values)
        assert len(got_doys) == 365
        assert 60 not in got_doys
        assert np.isfinite(np.asarray(out.data)).all()
