"""xarray-input adapter: duck-typed objects pass the whole pipeline.

The reference's public contract is xarray DataArrays in
(reference: xmhw/xmhw.py:53-57, 325-334). xarray itself is not installed
here, so these tests drive the entry points with minimal xarray-SHAPED
stub objects (dims/coords/values/attrs/encoding) and assert the results
equal the native-xrlite path bit for bit.
"""

import numpy as np
import pytest

import xmhw_tpu as xm
from xmhw_tpu.xrlite import DataArray, TimeIndex
from xmhw_tpu.xrlite.adapt import as_dataarray, as_dataset


class FakeCoord:
    """Shape of an xarray coordinate DataArray."""

    def __init__(self, dims, values, attrs=None, encoding=None):
        self.dims = tuple(dims)
        self.values = values
        self.attrs = dict(attrs or {})
        self.encoding = dict(encoding or {})


class FakeDataArray:
    """Shape of an xarray.DataArray (structural only, no xarray)."""

    def __init__(self, values, dims, coords, attrs=None, name=None):
        self.values = np.asarray(values)
        self.dims = tuple(dims)
        self.coords = dict(coords)
        self.attrs = dict(attrs or {})
        self.name = name


class FakeDataset:
    def __init__(self, data_vars, attrs=None):
        self.data_vars = dict(data_vars)
        self.attrs = dict(attrs or {})


def _grid_series(seed=0, T=731, ny=2, nx=3):
    rng = np.random.default_rng(seed)
    t = np.arange(np.datetime64("2000-01-01"),
                  np.datetime64("2000-01-01") + np.timedelta64(T, "D"))
    doy_cycle = np.sin(2 * np.pi * np.arange(T) / 365.25)
    # ~10-day autocorrelated anomalies so multi-day exceedance runs
    # (events) actually occur
    noise = rng.normal(0, 1.2, (T + 9, ny, nx))
    noise = np.mean([noise[i:i + T] for i in range(10)], axis=0) * 3
    data = (15 + 3 * doy_cycle[:, None, None] + noise).astype(np.float64)
    lat = np.linspace(-44, -42, ny)
    lon = np.linspace(148, 150, nx)
    return t, lat, lon, data


def _fake(t, lat, lon, data):
    return FakeDataArray(
        data, ("time", "lat", "lon"),
        {
            "time": FakeCoord(("time",), t.astype("datetime64[ns]"),
                              encoding={"calendar": "standard"}),
            "lat": FakeCoord(("lat",), lat, {"units": "degrees_north"}),
            "lon": FakeCoord(("lon",), lon, {"units": "degrees_east"}),
        },
        attrs={"units": "degC"}, name="sst")


def _native(t, lat, lon, data):
    return DataArray(
        data, ("time", "lat", "lon"),
        {"time": t.astype("datetime64[ns]"),
         "lat": ("lat", lat, {"units": "degrees_north"}),
         "lon": ("lon", lon, {"units": "degrees_east"})},
        attrs={"units": "degC"}, name="sst")


def test_as_dataarray_roundtrip():
    t, lat, lon, data = _grid_series()
    da = as_dataarray(_fake(t, lat, lon, data))
    assert da.dims == ("time", "lat", "lon")
    assert np.array_equal(da.data, data)
    assert da.coords["lat"].attrs["units"] == "degrees_north"
    # encoding-only calendar lands in attrs (xarray keeps it in .encoding)
    assert da.coords["time"].attrs.get("calendar") == "standard"
    assert da.name == "sst"
    # xrlite objects pass through unchanged (no copy)
    native = _native(t, lat, lon, data)
    assert as_dataarray(native) is native


def test_as_dataarray_rejects_junk():
    with pytest.raises(TypeError):
        as_dataarray([1, 2, 3])
    with pytest.raises(TypeError):
        as_dataset(42)


def test_threshold_detect_equal_via_stub():
    t, lat, lon, data = _grid_series()
    fake = _fake(t, lat, lon, data)
    native = _native(t, lat, lon, data)

    clim_f = xm.threshold(fake, dtype=np.float64)
    clim_n = xm.threshold(native, dtype=np.float64)
    np.testing.assert_array_equal(clim_f["thresh"].data,
                                  clim_n["thresh"].data)
    np.testing.assert_array_equal(clim_f["seas"].data, clim_n["seas"].data)

    # detect with STUB climatology inputs too (FakeDataArray th/se)
    th_fake = FakeDataArray(
        clim_n["thresh"].data, clim_n["thresh"].dims,
        {"doy": FakeCoord(("doy",), clim_n["thresh"].coords["doy"].values),
         "lat": FakeCoord(("lat",), lat), "lon": FakeCoord(("lon",), lon)})
    se_fake = FakeDataArray(
        clim_n["seas"].data, clim_n["seas"].dims,
        {"doy": FakeCoord(("doy",), clim_n["seas"].coords["doy"].values),
         "lat": FakeCoord(("lat",), lat), "lon": FakeCoord(("lon",), lon)})
    mhw_f = xm.detect(fake, th_fake, se_fake, dtype=np.float64)
    mhw_n = xm.detect(native, clim_n["thresh"], clim_n["seas"],
                      dtype=np.float64)
    assert set(mhw_f.keys()) == set(mhw_n.keys())
    for k in mhw_n.keys():
        np.testing.assert_array_equal(
            np.asarray(mhw_f[k].data), np.asarray(mhw_n[k].data),
            err_msg=k)

    # stats layer accepts the stub-shaped Dataset as well
    fake_mhw = FakeDataset(
        {k: FakeDataArray(mhw_n[k].data, mhw_n[k].dims,
                          {d: FakeCoord((d,), mhw_n[k].coords[d].values)
                           for d in mhw_n[k].dims
                           if d in mhw_n[k].coords},
                          attrs=mhw_n[k].attrs)
         for k in mhw_n.keys()})
    blk_f = xm.block_average(fake_mhw, dstime=fake)
    blk_n = xm.block_average(mhw_n, dstime=native)
    for k in blk_n.keys():
        np.testing.assert_array_equal(
            np.asarray(blk_f[k].data), np.asarray(blk_n[k].data),
            err_msg=k)
    rank_f, rp_f = xm.mhw_rank(fake_mhw)
    rank_n, rp_n = xm.mhw_rank(mhw_n)
    for k in rank_n.keys():
        np.testing.assert_array_equal(np.asarray(rank_f[k].data),
                                      np.asarray(rank_n[k].data))
        np.testing.assert_array_equal(np.asarray(rp_f[k].data),
                                      np.asarray(rp_n[k].data))


class _NoleapDate:
    """Shape of a cftime.DatetimeNoLeap object."""

    calendar = "noleap"

    def __init__(self, year, month, day):
        self.year, self.month, self.day = year, month, day
        self.hour = self.minute = self.second = 0


def test_cftime_object_time_axis():
    # 2 noleap years of dates as cftime-shaped objects
    dates = []
    mlen = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]
    for y in (2000, 2001):
        for m, n in enumerate(mlen, start=1):
            dates.extend(_NoleapDate(y, m, d) for d in range(1, n + 1))
    vals = np.empty(len(dates), object)
    vals[:] = dates
    da = as_dataarray(FakeDataArray(
        np.zeros((len(dates), 2)), ("time", "cell"),
        {"time": FakeCoord(("time",), vals)}))
    ti = da.coords["time"].values
    assert isinstance(ti, TimeIndex)
    assert ti.calendar == "noleap"
    np.testing.assert_array_equal(np.asarray(ti.year),
                                  np.repeat([2000, 2001], 365))
    np.testing.assert_array_equal(np.asarray(ti.month)[:62],
                                  np.repeat([1, 2], [31, 28]).tolist()
                                  + [3, 3, 3])
    # days are consecutive offsets
    np.testing.assert_array_equal(np.diff(np.asarray(ti.values)),
                                  np.ones(len(dates) - 1))


def test_cftime_standard_objects_become_datetime64():
    class _StdDate(_NoleapDate):
        calendar = "standard"

    vals = np.empty(3, object)
    vals[:] = [_StdDate(2004, 2, 28), _StdDate(2004, 2, 29),
               _StdDate(2004, 3, 1)]
    da = as_dataarray(FakeDataArray(
        np.zeros((3, 1)), ("time", "c"),
        {"time": FakeCoord(("time",), vals)}))
    tv = np.asarray(da.coords["time"].values.values)
    assert tv.dtype == np.dtype("datetime64[ns]")
    assert tv[1] == np.datetime64("2004-02-29")
