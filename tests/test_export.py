"""Exporters: xrlite -> xarray / pandas (xrlite/export.py).

The xarray tests skip when xarray is not installed (same pattern as the
golden-data skips); the pandas tests always run. Reference anchor: the
reference returns xarray Datasets (xmhw.py:210-214, 465-478) and builds
its per-cell tables in pandas (identify.py:377).
"""

import numpy as np
import pytest

import xmhw_tpu as xm
from xmhw_tpu.xrlite import Coord, DataArray, Dataset, TimeIndex


def _small_da():
    t = np.arange("2000-01-01", "2000-01-11",
                  dtype="datetime64[D]").astype("datetime64[ns]")
    data = np.arange(10 * 2 * 3, dtype=np.float64).reshape(10, 2, 3)
    data[0, 0, 0] = np.nan
    return DataArray(
        data, ("time", "lat", "lon"),
        {"time": Coord(("time",), TimeIndex(t)),
         "lat": Coord(("lat",), np.array([10.0, 20.0]),
                      {"units": "degrees_north"}),
         "lon": Coord(("lon",), np.array([100.0, 110.0, 120.0]))},
        {"units": "degree_C"}, name="sst")


def _small_ds():
    da = _small_da()
    ds = Dataset(attrs={"title": "t"})
    ds["sst"] = da
    ds["flag"] = DataArray(np.ones((2, 3)), ("lat", "lon"),
                           {"lat": da.coords["lat"],
                            "lon": da.coords["lon"]})
    return ds


# ---------------------------------------------------------------- pandas --

def test_to_dataframe_dataarray_roundtrip():
    da = _small_da()
    df = da.to_dataframe()
    assert list(df.index.names) == ["time", "lat", "lon"]
    assert len(df) == 10 * 2 * 3
    # values flatten in C order over (time, lat, lon)
    np.testing.assert_array_equal(
        df["sst"].to_numpy().reshape(10, 2, 3)[1:], da.data[1:])
    assert np.isnan(df["sst"].iloc[0])


def test_to_dataframe_dataset_broadcasts():
    ds = _small_ds()
    df = ds.to_dataframe()
    assert set(df.columns) >= {"sst", "flag"}
    # flag (lat, lon) broadcasts over time
    np.testing.assert_array_equal(
        df["flag"].to_numpy().reshape(10, 2, 3),
        np.broadcast_to(np.ones((2, 3)), (10, 2, 3)))


def test_to_dataframe_event_table():
    """detect() output (events x cell coords) exports to a frame."""
    t = np.arange("2001-01-01", "2004-01-01",
                  dtype="datetime64[D]").astype("datetime64[ns]")
    rng = np.random.default_rng(0)
    data = (15 + 3 * np.sin(2 * np.pi * np.arange(len(t)) / 365.25)
            )[:, None, None] + rng.normal(0, 1, (len(t), 2, 2))
    da = DataArray(
        data.astype(np.float64), ("time", "lat", "lon"),
        {"time": Coord(("time",), TimeIndex(t)),
         "lat": Coord(("lat",), np.array([0.0, 1.0])),
         "lon": Coord(("lon",), np.array([0.0, 1.0]))})
    clim = xm.threshold(da)
    mhw = xm.detect(da, clim["thresh"], clim["seas"])
    df = mhw.to_dataframe()
    assert "intensity_max" in df.columns
    valid = np.isfinite(df["event"].to_numpy())
    assert valid.sum() == np.isfinite(mhw["event"].data).sum()


def test_to_dataframe_missing_pandas_message(monkeypatch):
    import builtins

    real_import = builtins.__import__

    def fake(name, *a, **k):
        if name == "pandas":
            raise ImportError("no pandas")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", fake)
    with pytest.raises(ImportError, match="pandas"):
        _small_da().to_dataframe()


def test_export_coord_values_timeindex():
    """Coord conversion logic runs without xarray installed."""
    from xmhw_tpu.xrlite.export import _export_coord_values

    t = np.arange("2000-01-01", "2000-01-04",
                  dtype="datetime64[D]").astype("datetime64[ns]")
    vals, attrs = _export_coord_values(Coord(("time",), TimeIndex(t)))
    assert np.issubdtype(np.asarray(vals).dtype, np.datetime64)

    ti = TimeIndex(np.arange(360.0), calendar="360_day",
                   units="days since 1990-01-01")
    vals, attrs = _export_coord_values(Coord(("time",), ti))
    assert attrs["calendar"] == "360_day"
    assert attrs["units"].startswith("days since")
    np.testing.assert_array_equal(vals, np.arange(360.0))


# ---------------------------------------------------------------- xarray --

try:
    import xarray as xr

    HAVE_XARRAY = True
except ImportError:
    HAVE_XARRAY = False

needs_xarray = pytest.mark.skipif(not HAVE_XARRAY,
                                  reason="xarray not installed")


@needs_xarray
def test_to_xarray_dataarray():
    da = _small_da()
    out = da.to_xarray()
    assert isinstance(out, xr.DataArray)
    assert out.dims == ("time", "lat", "lon")
    assert out.name == "sst"
    assert out.attrs["units"] == "degree_C"
    assert out.coords["lat"].attrs["units"] == "degrees_north"
    assert np.issubdtype(out.coords["time"].dtype, np.datetime64)
    np.testing.assert_array_equal(np.asarray(out.data)[1:], da.data[1:])
    assert np.isnan(np.asarray(out.data)[0, 0, 0])


@needs_xarray
def test_to_xarray_dataset_threshold_roundtrip():
    """threshold(xr input).to_xarray() matches the reference's output
    shape: thresh/seas on (doy, cell-dims) with attrs + provenance."""
    da = _small_da()
    t = np.arange("2001-01-01", "2005-01-01",
                  dtype="datetime64[D]").astype("datetime64[ns]")
    rng = np.random.default_rng(1)
    data = (15 + 3 * np.sin(2 * np.pi * np.arange(len(t)) / 365.25)
            )[:, None, None] + rng.normal(0, 1, (len(t), 2, 2))
    xda = xr.DataArray(
        data, dims=("time", "lat", "lon"),
        coords={"time": t, "lat": [0.0, 1.0], "lon": [0.0, 1.0]},
        attrs={"units": "degree_C"}, name="sst")
    clim = xm.threshold(xda)
    out = clim.to_xarray()
    assert isinstance(out, xr.Dataset)
    assert set(out.data_vars) >= {"thresh", "seas"}
    assert out["thresh"].dims == ("doy", "lat", "lon")
    assert "xmhw_parameters" in out.attrs
    # NaN layout: no land here, everything finite
    assert np.isfinite(out["thresh"].data).all()


@needs_xarray
def test_to_xarray_synthetic_calendar_attrs():
    """Synthetic (noleap) time coords keep CF decoding metadata."""
    raw = np.arange(365.0)
    ti = TimeIndex(raw, calendar="noleap",
                   units="days since 2000-01-01 00:00:00")
    da = DataArray(np.zeros(365), ("time",),
                   {"time": Coord(("time",), ti)})
    out = da.to_xarray(decode_times=False)
    assert out.coords["time"].attrs["calendar"] == "noleap"
    assert "since" in out.coords["time"].attrs["units"]
