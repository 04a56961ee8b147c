"""Stats layer tests (mirrors + extends reference test_stats.py, whose
block_average test is an empty stub, reference: test/test_stats.py:34-35)."""

import numpy as np
import pytest

import xmhw_tpu as xm
from xmhw_tpu.exception import XmhwException
from xmhw_tpu.stats_api import check_variables, rank_variable
from xmhw_tpu.xrlite import Coord, DataArray, Dataset


@pytest.fixture(scope="module")
def mhw_oisst(oisst_ts):
    clim = xm.threshold(oisst_ts, dtype=np.float64)
    mhw, inter = xm.detect(oisst_ts, clim["thresh"], clim["seas"],
                           intermediate=True, dtype=np.float64)
    return mhw, inter


def test_rank_variable_fixture():
    """Reference rank fixture (xmhw_fixtures.py:371-383): int_max
    [2.3,1.2,3.5,2.4,2.3] -> rank [4,5,1,2,3]."""
    vals = np.array([2.3, 1.2, 3.5, 2.4, 2.3])
    np.testing.assert_array_equal(rank_variable(vals), [4, 5, 1, 2, 3])


def test_rank_variable_nan():
    vals = np.array([2.3, np.nan, 3.5])
    r = rank_variable(vals)
    np.testing.assert_array_equal(r[[0, 2]], [2, 1])
    assert np.isnan(r[1])


def test_mhw_rank(mhw_oisst):
    mhw, _ = mhw_oisst
    rank, ret = xm.mhw_rank(mhw)
    # ranks are 1..n per cell on finite entries
    r = rank["intensity_max"].sel(lat=-42.625, lon=148.125).values
    fin = np.isfinite(r)
    np.testing.assert_array_equal(np.sort(r[fin]),
                                  np.arange(1, fin.sum() + 1))
    # return period = (nYears+1)/rank, monotone in rank
    rp = ret["intensity_max"].sel(lat=-42.625, lon=148.125).values
    assert np.nanmax(rp[fin]) == rp[fin][np.argmin(r[fin])]
    # no time/index/event variables ranked
    assert "time_start" not in rank
    assert "index_start" not in rank
    assert "event" not in rank


def test_check_variables_paths(mhw_oisst):
    _, inter = mhw_oisst
    # full intermediate: ts + thresh + seas present -> cats computed
    ds, sw_cats, sw_temp = check_variables(inter)
    assert sw_cats and sw_temp
    assert set(ds.keys()) == {"ts", "cats"}
    # ts-only DataArray
    ds2, c2, t2 = check_variables(inter["ts"])
    assert not c2 and t2
    assert set(ds2.keys()) == {"ts"}
    # dataset without ts
    nots = Dataset()
    nots["cats"] = inter["ts"].copy()
    nots["other"] = inter["ts"].copy()
    ds3, c3, t3 = check_variables(nots)
    assert c3 and not t3


def test_block_average_events_only(mhw_oisst):
    mhw, _ = mhw_oisst
    block = xm.block_average(mhw, period=[2003, 2004])
    assert block["ecount"].dims == ("years", "lat", "lon")
    np.testing.assert_array_equal(block.coords["years"].values,
                                  [2003, 2004])
    # total events across blocks == total events detected
    total = np.nansum(block["ecount"].data)
    assert total == np.isfinite(mhw["event"].data).sum()
    # mean duration within plausible range
    d = block["duration"].data
    assert np.nanmin(d) >= 5

    # consistency: per-cell one-block count equals per-year event count
    ystart = mhw["time_start"].sel(lat=-42.625, lon=148.125).values
    y = ystart[~np.isnat(ystart)].astype("datetime64[Y]").astype(int) + 1970
    c2003 = (y == 2003).sum()
    assert block["ecount"].sel(lat=-42.625, lon=148.125).values[0] == c2003


def test_block_average_with_ts(mhw_oisst):
    mhw, inter = mhw_oisst
    block = xm.block_average(mhw, dstime=inter)
    for v in ("ts_mean", "ts_max", "ts_min", "moderate_days",
              "strong_days", "severe_days", "extreme_days", "total_days"):
        assert v in block, v
    ts = inter["ts"].sel(lat=-42.625, lon=148.125).values
    from xmhw_tpu.xrlite import TimeIndex
    tyears = TimeIndex(np.asarray(inter.coords["time"].values)).year
    np.testing.assert_allclose(
        block["ts_mean"].sel(lat=-42.625, lon=148.125).values[0],
        ts[tyears == 2003].mean())
    # total_days == sum of category days
    tot = block["total_days"].data
    parts = sum(block[f"{c}_days"].data for c in
                ("moderate", "strong", "severe", "extreme"))
    np.testing.assert_allclose(tot, parts)


def test_block_average_blocklength2(mhw_oisst):
    mhw, _ = mhw_oisst
    block = xm.block_average(mhw, period=[2003, 2004], blockLength=2)
    assert len(block.coords["years"].values) == 1
    assert np.nansum(block["ecount"].data) == np.isfinite(
        mhw["event"].data).sum()


def test_block_average_validation(mhw_oisst):
    mhw, _ = mhw_oisst
    with pytest.raises(XmhwException):
        xm.block_average(mhw)  # no period, no ts
    with pytest.raises(XmhwException):
        xm.block_average(mhw, period=[2003, 2004], removeMissing=True)


def test_block_average_point(mhw_oisst, oisst_ts):
    """Point-mode path (broken in the reference: stats.py:138,166,176)."""
    pt = oisst_ts.sel(lat=-42.625, lon=148.125)
    clim = xm.threshold(pt, dtype=np.float64)
    mhw, inter = xm.detect(pt, clim["thresh"], clim["seas"],
                           intermediate=True, dtype=np.float64)
    block = xm.block_average(mhw, dstime=inter)
    assert block["ecount"].dims == ("years",)
    grid_mhw, _ = mhw_oisst
    grid_block = xm.block_average(grid_mhw, period=[2003, 2004])
    np.testing.assert_allclose(
        block["ecount"].values,
        grid_block["ecount"].sel(lat=-42.625, lon=148.125).values)


def test_block_average_reference_quirks(mhw_oisst):
    mhw, _ = mhw_oisst
    q = xm.block_average(mhw, period=[2003, 2004], reference_quirks=True)
    fixed = xm.block_average(mhw, period=[2003, 2004])
    # quirk mode reproduces the reference's copy-paste aggregation
    np.testing.assert_allclose(np.nan_to_num(q["intensity_mean_abs"].data),
                               np.nan_to_num(q["intensity_mean"].data))
    # fixed mode aggregates the real _abs variable (SSTs ~ 15 degC)
    assert np.nanmean(fixed["intensity_mean_abs"].data) > 10


def test_find_across(mhw_oisst):
    mhw, _ = mhw_oisst
    from xmhw_tpu.stats_api import find_across
    mask = find_across(mhw)
    y0 = mhw["time_start"].data.astype("datetime64[Y]")
    y1 = mhw["time_end"].data.astype("datetime64[Y]")
    man = (y0 != y1) & ~np.isnat(mhw["time_start"].data) & ~np.isnat(
        mhw["time_end"].data)
    np.testing.assert_array_equal(mask, man)


def test_cat_days():
    """Reference cat_days fixture (test_stats.py:38-43)."""
    from xmhw_tpu.stats import cat_days
    cats = np.array([1, 2, 1, 1, 2, 3, 1, 4, 3, 2, 1, 1, 2])
    assert cat_days(cats) == 6
    assert cat_days(cats, cat=2) == 4
    assert cat_days(cats, cat=3) == 2
    assert cat_days(cats, cat=4) == 1


def test_reference_import_paths(oisst_ts):
    """Users of the reference import from xmhw.xmhw / xmhw.identify /
    xmhw.stats; the same paths work here."""
    from xmhw_tpu.xmhw import detect, threshold  # noqa: F401
    from xmhw_tpu.identify import add_doy, feb29, mhw_filter, runavg
    from xmhw_tpu.features import get_edge, get_period, get_rate
    from xmhw_tpu.stats import block_average, mhw_rank  # noqa: F401
    from xmhw_tpu.xrlite import DataArray, Coord

    ts = add_doy(oisst_ts)
    a = np.arange(1, 367)
    expected = np.concatenate((np.delete(a, [59]), a))
    np.testing.assert_array_equal(ts.coords["doy"].values, expected)

    da = DataArray(np.array([1.0, 2, 2, 4, 3, 2]), ("doy",),
                   {"doy": Coord(("doy",), np.arange(1, 7))})
    np.testing.assert_almost_equal(
        runavg(da, 3).data, [1.66667, 1.66667, 2.66667, 3.0, 3.0, 2.0],
        decimal=5)
    import pytest as _pytest
    from xmhw_tpu.exception import XmhwException
    with _pytest.raises(XmhwException):
        runavg(da, 2)

    # feb29 on a synthetic climatology
    clim = DataArray(np.arange(366, dtype=float), ("doy",),
                     {"doy": Coord(("doy",), np.arange(1, 367))})
    np.testing.assert_allclose(feb29(clim), np.mean([58, 59, 60]))

    # mhw_filter series-level wrapper
    b = np.zeros(29, bool)
    b[1:6] = b[11:17] = b[20:25] = True
    out = mhw_filter(b, 5, True, 3)
    assert out["n_events"] == 2  # scalar for 1-D input (like the rest)
    assert np.nanmax(out["events"]) == 11

    # get_period matches the reference unit test (test_features.py:64-81)
    start = np.array([0, 8, 18]); end = np.array([4, 15, 25])
    ons, dec = get_period(start, end, np.array([0, 10, 19]), 25)
    np.testing.assert_array_equal(ons, [1, 10.5, 19.5])
    np.testing.assert_array_equal(dec, [4.5, -2.5, -12])
    ons2, dec2 = get_period(start, end, np.array([3, 15, 25]), 25)
    np.testing.assert_array_equal(ons2, [3.0, 15.5, 25.5])
    np.testing.assert_array_equal(dec2, [1.5, -7.5, 1.0])

    # get_edge matches the reference unit test (test_features.py:55-62)
    edges = get_edge(np.array([2.3, 2.3]), np.array([1.7, 1.7]),
                     np.array([2, 0]), 0)
    np.testing.assert_allclose(edges, [2.0, 2.3])

    # get_rate matches the reference unit test (test_features.py:84-89)
    np.testing.assert_allclose(
        get_rate(np.array([1.4, 2.4, 1.8]), np.array([1.0, 1.5, 2.5]),
                 np.array([1, 10.5, 19.5])),
        [0.4, 0.08571429, -0.03589744], rtol=1e-6)


def test_compact_events_layout(mhw_oisst, oisst_ts):
    """detect(events_layout='compact') + block_average/mhw_rank give the
    same statistics as the union layout."""
    clim = xm.threshold(oisst_ts, dtype=np.float64)
    compact = xm.detect(oisst_ts, clim["thresh"], clim["seas"],
                        dtype=np.float64, events_layout="compact")
    assert compact["event"].dims == ("ev", "lat", "lon")
    union, _ = mhw_oisst
    # same number of events
    assert np.isfinite(compact["event"].data).sum() == np.isfinite(
        union["event"].data).sum()
    # same sorted per-cell event start indexes
    cu = union["event"].sel(lat=-42.625, lon=148.125).values
    cc = compact["event"].sel(lat=-42.625, lon=148.125).values
    np.testing.assert_array_equal(np.sort(cu[np.isfinite(cu)]),
                                  np.sort(cc[np.isfinite(cc)]))
    # block stats identical
    b1 = xm.block_average(union, period=[2003, 2004])
    b2 = xm.block_average(compact, period=[2003, 2004])
    for v in ("ecount", "duration", "intensity_max", "total_icum"):
        np.testing.assert_allclose(np.nan_to_num(b1[v].data),
                                   np.nan_to_num(b2[v].data), err_msg=v)
    # rank works on the compact layout
    rank, _ = xm.mhw_rank(compact)
    r = rank["intensity_max"].sel(lat=-42.625, lon=148.125).values
    fin = np.isfinite(r)
    np.testing.assert_array_equal(np.sort(r[fin]),
                                  np.arange(1, fin.sum() + 1))


def test_calc_clim_and_window_roll(oisst_ts, clim_oisst):
    """calc_clim / window_roll / calculate_thresh / calculate_seas /
    join_events parity helpers (reference: xmhw.py:250-307,
    identify.py:184-270, 532-536)."""
    from xmhw_tpu.identify import (calculate_seas, calculate_thresh,
                                   join_events, window_roll)
    from xmhw_tpu.xmhw import calc_clim

    pt = oisst_ts.sel(lat=-42.625, lon=148.125)
    th, se = calc_clim(pt, skipna=True)
    np.testing.assert_array_almost_equal(
        clim_oisst["thresh1"].values[82:], th.values[82:])
    np.testing.assert_array_almost_equal(
        clim_oisst["seas1"].values[82:], se.values[82:], decimal=4)

    # window_roll on the first 3 days with w=1 matches the reference's
    # tstack fixture values (test_identify.py:81-88)
    sub = pt.sel(time=slice("2003-01-01", "2003-01-03"))
    tw = window_roll(sub, 1)
    np.testing.assert_almost_equal(
        np.sort(tw.values),
        np.sort([16.99, 17.39, 16.99, 17.39, 17.3, 17.39, 17.3]),
        decimal=5)
    # calculate_thresh/seas consume the pooled series
    th3 = calculate_thresh(tw, 90, tstep=True)
    se3 = calculate_seas(tw, tstep=True)
    assert th3.sizes["doy"] == 3 and se3.sizes["doy"] == 3
    d1 = tw.values[np.asarray(tw.coords["doy"].values) == 1]
    np.testing.assert_allclose(se3.values[0], d1.mean())
    np.testing.assert_allclose(th3.values[0], np.quantile(d1, 0.9))

    # join_events (reference join fixture, xmhw_fixtures.py:159-166)
    evs = np.arange(20, dtype=float)
    out = join_events(evs, {(1, 7), (12, 18)})
    exp = np.arange(20, dtype=float)
    exp[1:8] = 1
    exp[12:19] = 12
    np.testing.assert_array_equal(out, exp)


def test_block_average_device_path(mhw_oisst):
    """device=True jit kernel matches the numpy host path."""
    mhw, inter = mhw_oisst
    host = xm.block_average(mhw, period=[2003, 2004])
    dev = xm.block_average(mhw, period=[2003, 2004], device=True)
    for v in host.keys():
        np.testing.assert_allclose(
            np.nan_to_num(dev[v].data, nan=-9e9),
            np.nan_to_num(host[v].data, nan=-9e9), rtol=1e-12,
            err_msg=v)
    # with ts stats appended
    host2 = xm.block_average(mhw, dstime=inter)
    dev2 = xm.block_average(mhw, dstime=inter, device=True)
    for v in host2.keys():
        np.testing.assert_allclose(
            np.nan_to_num(dev2[v].data, nan=-9e9),
            np.nan_to_num(host2[v].data, nan=-9e9), rtol=1e-12,
            err_msg=v)


def test_block_ts_stats_device_matches_host(mhw_oisst, oisst_ts):
    """Device per-day block stats (binned_day_stats) vs the host bincount
    path: ts mode, cats mode, removeMissing, blockLength=2."""
    mhw, inter = mhw_oisst
    for kw in ({"dstime": oisst_ts},             # ts-only mode
               {"dstime": inter},                # cats mode (ts/thresh/seas)
               {"dstime": inter, "removeMissing": True},
               {"dstime": inter, "blockLength": 2}):
        host = xm.block_average(mhw, **kw)
        dev = xm.block_average(mhw, device=True, **kw)
        assert set(host.keys()) == set(dev.keys())
        for v in host.keys():
            np.testing.assert_allclose(
                np.asarray(dev[v].data), np.asarray(host[v].data),
                rtol=1e-9, atol=1e-9, equal_nan=True,
                err_msg=f"{v} {kw}")


def test_block_ts_stats_device_cell_blocked(mhw_oisst, oisst_ts):
    """Cell-blocked device path (cell_block smaller than the grid) equals
    the single-block result."""
    from xmhw_tpu.stats_api import (_block_ts_stats_device, _flatten_cells,
                                    _years_of, check_coordinates,
                                    check_variables)
    from xmhw_tpu.xrlite import Coord, Dataset

    mhw, inter = mhw_oisst
    dstime, sw_cats, sw_temp = check_variables(inter)
    assert sw_temp and sw_cats
    tdim, _ = check_coordinates(dstime)
    tyears, _ = _years_of(dstime["ts"].coords[tdim].values)
    ts_flat, gd, gs = _flatten_cells(dstime["ts"], tdim)
    bins = np.arange(2003, 2006)
    yc = Coord(("years",), bins[:-1].astype(np.int64))
    a = _block_ts_stats_device(Dataset(), dstime, "cats", tdim, tyears,
                               ts_flat, gd, gs, bins, 2, yc, False)
    b = _block_ts_stats_device(Dataset(), dstime, "cats", tdim, tyears,
                               ts_flat, gd, gs, bins, 2, yc, False,
                               cell_block=7)
    for v in a.keys():
        np.testing.assert_allclose(np.asarray(b[v].data),
                                   np.asarray(a[v].data), rtol=1e-12,
                                   equal_nan=True, err_msg=v)


def test_global_scale_pipeline_compact(oisst_ts):
    """BASELINE config 5 shape at test scale: compact events layout ->
    device block stats -> rank, end to end on a larger grid."""
    rng = np.random.default_rng(9)
    t = np.arange("2001-01-01", "2004-01-01",
                  dtype="datetime64[D]").astype("datetime64[ns]")
    T = len(t)
    day = np.arange(T)[:, None, None]
    noise = rng.normal(0, 1, (T + 14, 12, 12))
    sm = np.stack([noise[k:k + T] for k in range(15)]).mean(0)
    data = (14 + 4 * np.sin(2 * np.pi * day / 365.25) + 3 * sm).astype(
        np.float32)
    da = xm.DataArray(
        data, ("time", "lat", "lon"),
        {"time": (("time",), t), "lat": (("lat",), np.arange(12.0)),
         "lon": (("lon",), np.arange(12.0))})
    clim = xm.threshold(da)
    mhw = xm.detect(da, clim["thresh"], clim["seas"],
                    events_layout="compact")
    blk = xm.block_average(mhw, period=[2001, 2003], device=True)
    assert blk["ecount"].dims == ("years", "lat", "lon")
    assert np.nansum(blk["ecount"].data) == np.isfinite(
        mhw["event"].data).sum()
    rank, ret = xm.mhw_rank(mhw)
    r = rank["intensity_max"].data
    fin = np.isfinite(r)
    assert fin.any()
    # per-cell ranks are permutations of 1..n
    cellr = r[:, 5, 5]
    cf = np.isfinite(cellr)
    np.testing.assert_array_equal(np.sort(cellr[cf]),
                                  np.arange(1, cf.sum() + 1))


def test_block_average_split_majority_days():
    """split=True assigns a boundary-crossing event to the block with the
    MOST of its days: 20 Dec 2000 - 1 Mar 2001 (12 days in 2000, 60 in
    2001) goes to the 2001 block (ADVICE r1: midpoint year would give
    2000)."""
    ev = Coord(("events",), np.array([0, 1]))
    t0 = np.array(["2000-12-20", "2000-03-01"], "datetime64[ns]")
    t1 = np.array(["2001-03-01", "2000-03-10"], "datetime64[ns]")
    mhw = Dataset()
    mhw["time_start"] = DataArray(t0, ("events",), {"events": ev})
    mhw["time_end"] = DataArray(t1, ("events",), {"events": ev})
    mhw["event"] = DataArray(np.array([10.0, 20.0]), ("events",),
                             {"events": ev})
    mhw["duration"] = DataArray(np.array([72.0, 10.0]), ("events",),
                                {"events": ev})
    for extra in ("intensity_max", "intensity_mean", "intensity_cumulative",
                  "intensity_mean_relThresh",
                  "intensity_cumulative_relThresh", "severity_mean",
                  "severity_cumulative", "intensity_mean_abs",
                  "intensity_cumulative_abs", "rate_onset", "rate_decline"):
        mhw[extra] = DataArray(np.array([1.0, 2.0]), ("events",),
                               {"events": ev})
    out = xm.block_average(mhw, period=[2000, 2001], split=True,
                           mtime="time_start")
    # crossing event -> 2001 block; short event stays in 2000
    np.testing.assert_array_equal(out["ecount"].values, [1.0, 1.0])
    assert out["duration"].values[1] == 72.0
    # without split both land in 2000 (time_start year)
    out2 = xm.block_average(mhw, period=[2000, 2001], split=False,
                            mtime="time_start")
    np.testing.assert_array_equal(np.nan_to_num(out2["ecount"].values),
                                  [2.0, 0.0])


def test_check_coordinates_unstacked_grid(oisst_ts, mhw_oisst):
    """Reference stats.py:241-281: an unstacked (time, lat, lon) dstime is
    accepted (land handled — NaN cells drop out of every aggregation) and
    the time dim is found by dtype, whatever its name."""
    from xmhw_tpu.stats_api import check_coordinates

    mhw, _ = mhw_oisst
    tdim, stack = check_coordinates(
        Dataset({"ts": oisst_ts}) if not isinstance(oisst_ts, Dataset)
        else oisst_ts)
    assert tdim == "time" and stack == "grid"
    # full block_average with the unstacked grid dstime
    out = xm.block_average(mhw, dstime=oisst_ts)
    assert out["ts_mean"].dims == ("years", "lat", "lon")
    # reference raises on an all-land grid
    land = oisst_ts.copy(data=np.full_like(oisst_ts.data, np.nan))
    with pytest.raises(XmhwException):
        check_coordinates(Dataset({"ts": land}))


def test_check_coordinates_point_and_renamed_time(oisst_ts):
    from xmhw_tpu.stats_api import check_coordinates
    from xmhw_tpu.xrlite import Coord, DataArray

    pt = oisst_ts.sel(lat=-42.625, lon=148.125)
    tdim, stack = check_coordinates(Dataset({"ts": pt}))
    assert stack == "point"
    # renamed time dim is still found by datetime dtype
    t = pt.coords["time"].values
    da = DataArray(pt.data, ("T",), {"T": Coord(("T",), t)})
    tdim, stack = check_coordinates(Dataset({"ts": da}))
    assert tdim == "T"


def test_rank_events_desc_matches_host():
    """Device ordinal rank == host rank_variable (ties, NaNs, all-NaN
    columns)."""
    import jax.numpy as jnp

    from xmhw_tpu.core.stats import rank_events_desc
    from xmhw_tpu.stats_api import rank_variable

    rng = np.random.default_rng(3)
    v = rng.normal(size=(17, 9))
    v[rng.random((17, 9)) < 0.2] = np.nan
    v[3] = v[5]          # force cross-row ties
    v[:, 4] = np.nan     # all-NaN column
    got = np.asarray(rank_events_desc(jnp.asarray(v),
                                      jnp.ones((17, 9), bool)))
    want = rank_variable(v, axis=0)
    np.testing.assert_allclose(got, want, equal_nan=True)
    # valid mask excludes rows
    valid = np.ones((17, 9), bool)
    valid[10:] = False
    got2 = np.asarray(rank_events_desc(jnp.asarray(v),
                                       jnp.asarray(valid)))
    want2 = rank_variable(np.where(valid, v, np.nan), axis=0)
    np.testing.assert_allclose(got2, want2, equal_nan=True)


def test_mhw_rank_device_matches_host(oisst_ts):
    clim = xm.threshold(oisst_ts, dtype=np.float64)
    mhw = xm.detect(oisst_ts, clim["thresh"], clim["seas"],
                    dtype=np.float64)
    rh, ph = xm.mhw_rank(mhw)
    rd, pd_ = xm.mhw_rank(mhw, device=True)
    for k in rh.keys():
        np.testing.assert_allclose(rd[k].data, rh[k].data,
                                   equal_nan=True, err_msg=k)
        np.testing.assert_allclose(pd_[k].data, ph[k].data,
                                   equal_nan=True, err_msg=k)


def test_block_average_unidentifiable_ts_falls_back(oisst_ts):
    """A dstime whose temperature variable cannot be identified degrades
    to event-only statistics instead of a bare KeyError (regression)."""
    from xmhw_tpu.xrlite import Dataset

    clim = xm.threshold(oisst_ts, dtype=np.float64)
    mhw = xm.detect(oisst_ts, clim["thresh"], clim["seas"],
                    dtype=np.float64)
    weird = Dataset()
    weird["sst"] = oisst_ts
    weird["foo"] = oisst_ts
    blk = xm.block_average(mhw, dstime=weird, period=[2003, 2004])
    assert "ecount" in blk
    assert "ts_mean" not in blk


def test_total_icum_empty_block_is_zero(oisst_ts):
    """pandas groupby sum of an empty group is 0.0 — total_icum parity
    (host and device paths)."""
    clim = xm.threshold(oisst_ts, dtype=np.float64)
    mhw = xm.detect(oisst_ts, clim["thresh"], clim["seas"],
                    dtype=np.float64)
    # bins beyond the record: every block empty
    blk = xm.block_average(mhw, period=[2010, 2012])
    assert np.all(blk["total_icum"].data == 0.0)
    assert np.all(np.isnan(blk["intensity_mean"].data))
    blkd = xm.block_average(mhw, period=[2010, 2012], device=True)
    assert np.all(blkd["total_icum"].data == 0.0)
