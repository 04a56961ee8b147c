"""Calendar / doy tests (mirrors reference add_doy & get_calendar coverage,
reference: test/test_identify.py:38-54, 197-215)."""

import numpy as np
import pytest

import xmhw_tpu as xm
from xmhw_tpu.core.calendar import compute_doy, get_calendar
from xmhw_tpu.exception import XmhwException
from xmhw_tpu.xrlite import TimeIndex, decode_cf_time


def test_doy366_oisst(oisst_ts, oisst_doy):
    t = oisst_ts.coords["time"].values
    doy, ndoy = compute_doy(t)
    assert ndoy == 366
    np.testing.assert_array_equal(doy, oisst_doy)


def test_doy_tstep_5day(oisst_ts):
    # 5-day averages, 'trim' boundary: 146 steps = 2 x 73
    t = oisst_ts.coords["time"].values
    sub_vals = t.values[2::5][:146]
    doy, ndoy = compute_doy(TimeIndex(sub_vals), keep_tstep=True)
    assert ndoy == 73
    np.testing.assert_array_equal(
        doy, np.concatenate([np.arange(1, 74), np.arange(1, 74)]))


def test_doy_tstep_monthly(oisst_ts):
    months = np.arange("2003-01", "2005-01", dtype="datetime64[M]")
    doy, ndoy = compute_doy(TimeIndex(months.astype("datetime64[ns]")),
                            keep_tstep=True)
    assert ndoy == 12
    np.testing.assert_array_equal(
        doy, np.concatenate([np.arange(1, 13), np.arange(1, 13)]))


def test_doy_tstep_incomplete_year_raises():
    t = np.arange("2003-01-01", "2004-06-01", dtype="datetime64[D]")
    with pytest.raises(XmhwException):
        compute_doy(TimeIndex(t.astype("datetime64[ns]")), keep_tstep=True)


def test_get_calendar_all_calendars():
    """All 8 CF calendars map to their days/year
    (reference: xmhw_fixtures.py:335-368)."""
    expected = {
        "noleap": 365, "all_leap": 366, "365_day": 365, "366_day": 366,
        "360_day": 360, "gregorian": 365.25, "standard": 365.25,
        "julian": 365.25, "proleptic_gregorian": 365.25,
    }
    for cal, nd in expected.items():
        t = decode_cf_time(np.arange(6), "days since 2000-01-01", cal)
        assert get_calendar(t) == nd, cal


def test_get_calendar_normalization():
    for raw, nd in (("360", 360), ("365", 365), ("366", 366),
                    ("leap", 365.25)):
        t = TimeIndex(np.arange(3), calendar=raw,
                      units="days since 2000-01-01")
        t.attrs["calendar"] = raw
        assert get_calendar(t) == nd


def test_synthetic_calendar_decode():
    t = decode_cf_time(np.arange(0, 730), "days since 2001-01-01",
                       "noleap")
    assert t.year[0] == 2001 and t.year[-1] == 2002
    assert t.dayofyear[0] == 1 and t.dayofyear[364] == 365
    assert t.dayofyear[365] == 1
    t360 = decode_cf_time(np.arange(0, 720), "days since 2001-01-01",
                          "360_day")
    assert (np.bincount(t360.month)[1:] == 60).all()  # 12 x 30-day months


def test_360day_forces_tstep(oisst_ts):
    """threshold() must force tstep=True for 360-day calendars
    (reference: xmhw.py:143-144)."""
    rng = np.random.default_rng(7)
    vals = rng.normal(15.0, 2.0, (720, 2, 2))
    t360 = decode_cf_time(np.arange(720), "days since 2001-01-01",
                          "360_day")
    from xmhw_tpu.xrlite import Coord, DataArray
    da = DataArray(
        vals, ("time", "lat", "lon"),
        {"time": Coord(("time",), t360),
         "lat": Coord(("lat",), [0.0, 1.0]),
         "lon": Coord(("lon",), [0.0, 1.0])})
    clim = xm.threshold(da, dtype=np.float64)
    assert clim["thresh"].sizes["doy"] == 360


def test_monthly_tstep_end_to_end(oisst_ts):
    """BASELINE config 4: monthly-mean SST climatology + detection via the
    tstep path (reference: docs mention non-daily support via tstep)."""


    from xmhw_tpu.xrlite import Coord, DataArray

    # monthly means of the OISST fixture (2 years -> 24 steps)
    vals = np.asarray(oisst_ts.values, np.float64)
    t = oisst_ts.coords["time"].values
    months = t.values.astype("datetime64[M]")
    um = np.unique(months)
    monthly = np.stack([vals[months == m].mean(axis=0) for m in um])
    mt = um.astype("datetime64[ns]")
    da = DataArray(monthly, ("time", "lat", "lon"),
                   {"time": Coord(("time",), mt),
                    "lat": oisst_ts.coords["lat"],
                    "lon": oisst_ts.coords["lon"]})
    clim = xm.threshold(da, tstep=True, windowHalfWidth=1,
                        smoothPercentile=False, dtype=np.float64)
    assert clim["thresh"].sizes["doy"] == 12
    mhw = xm.detect(da, clim["thresh"], clim["seas"], tstep=True,
                    minDuration=2, maxGap=1, dtype=np.float64)
    # any events found must respect minDuration in steps
    d = mhw["duration"].data
    if np.isfinite(d).any():
        assert np.nanmin(d) >= 2


def test_noleap_calendar_end_to_end(tmp_path):
    """Synthetic (noleap) calendar through the whole pipeline:
    climatologyPeriod date-string selection, detect, block_average and
    mhw_rank year derivation — all from raw CF offsets (regressions:
    string sel silently selected nothing; offsets were read as years)."""
    import xmhw_tpu as xm
    from xmhw_tpu.xrlite import Coord, DataArray, TimeIndex

    ny = 6
    T = 365 * ny
    rng = np.random.default_rng(7)
    offsets = np.arange(T, dtype=np.float64) + 0.5
    ti = TimeIndex(offsets, calendar="noleap",
                   units="days since 2000-01-01")
    day = np.arange(T)[:, None]
    noise = rng.normal(0, 1, (T + 14, 4))
    sm = np.stack([noise[k:k + T] for k in range(15)]).mean(0)
    data = 15 + 3 * np.sin(2 * np.pi * day / 365.0) + 3 * sm
    da = DataArray(data, ("time", "cellx"),
                   {"time": Coord(("time",), ti),
                    "cellx": Coord(("cellx",), np.arange(4.0))})

    clim_sub = xm.threshold(da, climatologyPeriod=[2001, 2004],
                            dtype=np.float64)
    assert "2001-2004" in clim_sub.attrs["xmhw_parameters"]
    clim = xm.threshold(da, dtype=np.float64)
    # the sub-period selection must actually subset (regression: the
    # string slice on raw offsets selected nothing / everything)
    assert not np.allclose(np.nan_to_num(clim_sub["thresh"].data),
                           np.nan_to_num(clim["thresh"].data))

    # reference parity: groupby('doy') on noleap data yields only the
    # 365 PRESENT doys (no synthetic Feb-29 row) and smooths over them
    assert clim["thresh"].sizes["doy"] == 365
    assert 60 not in clim["thresh"].coords["doy"].values

    mhw = xm.detect(da, clim["thresh"], clim["seas"], dtype=np.float64)
    assert np.isfinite(mhw["event"].data).sum() > 0
    assert mhw["time_start"].attrs.get("calendar") == "noleap"

    blk = xm.block_average(mhw, period=[2000, 2005])
    # events must land in bins (regression: offsets-as-years emptied all)
    assert np.nansum(blk["ecount"].data) == np.isfinite(
        mhw["event"].data).sum()
    rank, ret = xm.mhw_rank(mhw)
    # nYears derived from the record -> return periods within (0, ny+1]
    rp = ret["intensity_max"].data
    assert np.nanmax(rp) <= ny + 1 + 1e-9


def test_stack_cell_coordinate_less_dim():
    """land_check / stacking on dims without coordinate variables
    (regression: KeyError)."""
    import xmhw_tpu as xm
    from xmhw_tpu.xrlite import Coord, DataArray

    t = np.arange("2001-01-01", "2003-01-01",
                  dtype="datetime64[D]").astype("datetime64[ns]")
    data = 15 + np.random.default_rng(0).normal(0, 1, (len(t), 3))
    da = DataArray(data, ("time", "x"), {"time": Coord(("time",), t)})
    out = xm.land_check(da)
    assert out.shape == (len(t), 3)
    clim = xm.threshold(da, dtype=np.float64)
    assert clim["thresh"].sizes["doy"] == 366
