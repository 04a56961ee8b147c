"""Observability utilities (SURVEY §5 aux subsystems)."""

import logging

import jax.numpy as jnp
import numpy as np

from xmhw_tpu.utils import logger, timed


def test_timed_sync_and_log(caplog):
    x = jnp.asarray(np.ones((100, 100)))
    logger.setLevel(logging.INFO)
    with caplog.at_level(logging.INFO, logger="xmhw_tpu"):
        with timed("unit-test", sync=x) as t:
            y = x * 2
            t["sync"] = y
    assert t["seconds"] >= 0
    assert any("unit-test" in r.message for r in caplog.records)


def test_timed_no_log():
    with timed("quiet", log=False) as t:
        pass
    assert "seconds" in t


def test_nat_netcdf_external_semantics(tmp_path):
    """NaT datetimes encode as the declared NaN fill, not INT64_MIN's
    offset (external readers decoded that as year-1677 dates)."""
    import h5py

    import xmhw_tpu as xm
    from xmhw_tpu.xrlite import Coord, DataArray, Dataset

    t = np.array(["2003-01-05", "NaT", "2003-03-01"],
                 dtype="datetime64[ns]")
    ds = Dataset()
    ds["time_start"] = DataArray(t, ("events",),
                                 {"events": Coord(("events",),
                                                  np.arange(3))})
    p = str(tmp_path / "nat.nc")
    ds.to_netcdf(p)
    with h5py.File(p, "r") as f:
        raw = f["time_start"][...]
        assert np.isnan(raw[1]), raw  # NaN fill, not -106751.99...
        assert np.isfinite(raw[0]) and np.isfinite(raw[2])
    back = xm.open_dataset(p)
    got = back["time_start"].data
    assert np.isnat(got[1])
    np.testing.assert_array_equal(got[[0, 2]], t[[0, 2]])


def test_cf_packed_input(tmp_path):
    """Packed int16 input (scale_factor/add_offset/_FillValue) decodes
    like xarray — real OISST distributions ship this way."""
    import h5py

    import xmhw_tpu as xm

    p = str(tmp_path / "packed.nc")
    t = np.arange(5.0)
    sst_true = np.array([[12.3, 15.0], [np.nan, 14.2], [13.1, 15.5],
                         [12.0, 14.8], [13.3, 15.1]])
    packed = np.where(np.isnan(sst_true), -999,
                      np.round((sst_true - 10.0) / 0.01)).astype(np.int16)
    with h5py.File(p, "w") as f:
        tv = f.create_dataset("time", data=t)
        tv.make_scale("time")
        tv.attrs["units"] = "days since 2000-01-01"
        xv = f.create_dataset("x", data=np.arange(2.0))
        xv.make_scale("x")
        d = f.create_dataset("sst", data=packed)
        d.dims[0].attach_scale(tv)
        d.dims[1].attach_scale(xv)
        d.attrs["scale_factor"] = np.float32(0.01)
        d.attrs["add_offset"] = np.float32(10.0)
        d.attrs["_FillValue"] = np.int16(-999)
    ds = xm.open_dataset(p)
    got = ds["sst"].data
    assert np.issubdtype(got.dtype, np.floating)
    np.testing.assert_allclose(got, sst_true, atol=1e-5, equal_nan=True)


def test_synthetic_time_vars_survive_roundtrip(tmp_path):
    """time_start on a noleap calendar keeps units/calendar through a
    NetCDF round trip so year-binning still works (regression)."""
    import xmhw_tpu as xm
    from xmhw_tpu.stats_api import _years_of
    from xmhw_tpu.xrlite import Coord, DataArray, Dataset

    ds = Dataset()
    ds["time_start"] = DataArray(
        np.array([7300.5, 7665.5, np.nan]), ("events",),
        {"events": Coord(("events",), np.arange(3))},
        {"units": "days since 2000-01-01", "calendar": "noleap"})
    p = str(tmp_path / "syn.nc")
    ds.to_netcdf(p)
    back = xm.open_dataset(p)
    assert back["time_start"].attrs.get("calendar") == "noleap"
    yrs, ok = _years_of(back["time_start"].data,
                        back["time_start"].attrs)
    np.testing.assert_array_equal(yrs[:2], [2020, 2021])
    np.testing.assert_array_equal(ok, [True, True, False])


def test_julian_calendar_decoding():
    """julian leap rule (1900 IS a leap year) — cftime parity."""
    from xmhw_tpu.xrlite.timeutils import decode_cf_time

    ti = decode_cf_time(np.arange(3.0), "days since 1900-02-28", "julian")
    assert (ti.month[1], ti.day[1]) == (2, 29)
    assert (ti.month[2], ti.day[2]) == (3, 1)
    # 100 julian years = 36525 days
    ti2 = decode_cf_time(np.array([36525.0]), "days since 1900-01-01",
                         "julian")
    assert (int(ti2.year[0]), int(ti2.month[0]), int(ti2.day[0])) == \
        (2000, 1, 1)


def test_wide_range_cf_epoch():
    """'days since 0001-01-01' (outside datetime64[ns] range) decodes
    modern data correctly instead of silently wrapping (regression)."""
    from xmhw_tpu.xrlite.timeutils import decode_cf_time

    ti = decode_cf_time(np.array([719162.0, np.nan]),
                        "days since 0001-01-01 00:00:00", "standard")
    assert str(ti.values[0]).startswith("1970-01-01T00")
    assert np.isnat(ti.values[1])
    with np.testing.assert_raises(ValueError):
        decode_cf_time(np.array([10.0]), "days since 0001-01-01",
                       "standard")


def test_to_netcdf_does_not_mutate_bool_attrs(tmp_path):
    import xmhw_tpu as xm
    from xmhw_tpu.xrlite import Coord, DataArray, Dataset

    ds = Dataset()
    ds["flag"] = DataArray(np.array([True, False]), ("x",),
                           {"x": Coord(("x",), np.arange(2))})
    ds.to_netcdf(str(tmp_path / "b.nc"))
    assert "dtype" not in ds["flag"].attrs


def test_dataset_pickle_deepcopy():
    import copy
    import pickle

    from xmhw_tpu.xrlite import Coord, DataArray, Dataset

    ds = Dataset()
    ds["a"] = DataArray(np.arange(3.0), ("x",),
                        {"x": Coord(("x",), np.arange(3))})
    back = pickle.loads(pickle.dumps(ds))
    np.testing.assert_array_equal(back["a"].data, ds["a"].data)
    dc = copy.deepcopy(ds)
    np.testing.assert_array_equal(dc["a"].data, ds["a"].data)


def test_xarray_style_coord_tuple():
    from xmhw_tpu.xrlite import DataArray

    da = DataArray(np.zeros((2, 3)), ("time", "cell"),
                   {"lon": ("cell", np.array([10.0, 11.0, 12.0])),
                    "time": ("time", np.arange(2))})
    assert da.coords["lon"].dims == ("cell",)
    np.testing.assert_array_equal(da.coords["lon"].values,
                                  [10.0, 11.0, 12.0])
    with np.testing.assert_raises(ValueError):
        DataArray(np.zeros((2, 3)), ("time", "cell"),
                  {"lon": np.array([10.0, 11.0, 12.0])})


def test_sel_descending_coord():
    from xmhw_tpu.xrlite import Coord, DataArray

    da = DataArray(np.arange(4.0), ("lat",),
                   {"lat": Coord(("lat",), np.array([40., 30., 20., 10.]))})
    out = da.sel(lat=slice(35, 15))
    np.testing.assert_array_equal(out.coords["lat"].values, [30., 20.])
    out2 = da.sel(lat=slice(30, 20))  # inclusive bounds
    np.testing.assert_array_equal(out2.coords["lat"].values, [30., 20.])


def test_isel_scalar_time_coord():
    from xmhw_tpu.xrlite import Coord, DataArray, TimeIndex

    t = np.arange("2001-01-01", "2001-01-04",
                  dtype="datetime64[D]").astype("datetime64[ns]")
    da = DataArray(np.arange(3.0), ("time",),
                   {"time": Coord(("time",), TimeIndex(t))})
    p = da.isel(time=1)
    v = p.coords["time"].values
    assert np.ndim(v) == 0 or isinstance(v, np.datetime64)
    assert np.datetime64(v) == t[1]
