"""Differential tests: the framework vs an independent naive numpy oracle
(tests/oracle.py) on randomized data. Agreement between two independent
implementations of the Hobday pipeline is the strongest whole-chain
correctness evidence available without the reference's dependency stack.
"""

import numpy as np
import pytest

import xmhw_tpu as xm
from oracle import clim_oracle, events_oracle
from xmhw_tpu.xrlite import Coord, DataArray


def _grid(seed, T_years=3, nlat=2, nlon=2, nan_frac=0.0, land=False):
    rng = np.random.default_rng(seed)
    t = np.arange("2001-01-01", f"{2001 + T_years}-01-01",
                  dtype="datetime64[D]").astype("datetime64[ns]")
    T = len(t)
    day = np.arange(T)[:, None, None]
    base = 14 + 4 * np.sin(2 * np.pi * day / 365.25)
    noise = rng.normal(0, 1, (T + 14, nlat, nlon))
    sm = np.stack([noise[k:k + T] for k in range(15)]).mean(0)
    ts = base + 3.0 * sm + rng.normal(0, 0.5, (1, nlat, nlon))
    if nan_frac:
        mask = rng.random(ts.shape) < nan_frac
        ts[mask] = np.nan
    if land:
        ts[:, 0, 0] = np.nan
    return DataArray(
        ts, ("time", "lat", "lon"),
        {"time": Coord(("time",), t),
         "lat": Coord(("lat",), np.arange(nlat, dtype=float)),
         "lon": Coord(("lon",), np.arange(nlon, dtype=float))})


@pytest.mark.parametrize("seed,nan_frac,land", [
    (0, 0.0, False),
    (1, 0.02, False),
    (2, 0.0, True),
    (5, 0.10, True),
])
def test_threshold_vs_oracle(seed, nan_frac, land):
    da = _grid(seed, nan_frac=nan_frac, land=land)
    clim = xm.threshold(da, dtype=np.float64)
    from xmhw_tpu.core.calendar import compute_doy
    from xmhw_tpu.xrlite import TimeIndex

    doy, ndoy = compute_doy(TimeIndex(np.asarray(
        da.coords["time"].values)))
    for la in range(da.sizes["lat"]):
        for lo in range(da.sizes["lon"]):
            col = np.asarray(da.data[:, la, lo], np.float64)
            if np.isnan(col).all():
                continue
            th_o, se_o = clim_oracle(col, doy, ndoy)
            th_f = clim["thresh"].sel(lat=float(la), lon=float(lo)).values
            se_f = clim["seas"].sel(lat=float(la), lon=float(lo)).values
            np.testing.assert_allclose(th_f, th_o, atol=1e-10,
                                       equal_nan=True)
            np.testing.assert_allclose(se_f, se_o, atol=1e-10,
                                       equal_nan=True)


@pytest.mark.parametrize("seed,md,mg,join,nan_frac,min_ev", [
    (0, 5, 2, True, 0.0, 10),
    (1, 5, 3, True, 0.02, 10),
    (2, 3, 2, True, 0.0, 10),
    (3, 5, 2, False, 0.0, 10),
    (4, 7, 4, True, 0.05, 10),
    # long-duration + heavy NaN: few events survive, but every one of
    # their 30 properties must still match the oracle
    (5, 8, 4, True, 0.10, 3),
    (6, 5, 0, True, 0.0, 10),
    (7, 2, 1, True, 0.0, 10),
])
def test_detect_vs_oracle(seed, md, mg, join, nan_frac, min_ev):
    da = _grid(seed, T_years=4, nan_frac=nan_frac)
    clim = xm.threshold(da, dtype=np.float64)
    mhw = xm.detect(da, clim["thresh"], clim["seas"], minDuration=md,
                    joinGaps=join, maxGap=mg, dtype=np.float64)
    from xmhw_tpu.core.calendar import compute_doy
    from xmhw_tpu.xrlite import TimeIndex

    tvals = np.asarray(da.coords["time"].values)
    doy, ndoy = compute_doy(TimeIndex(tvals))
    checked_events = 0
    for la in range(da.sizes["lat"]):
        for lo in range(da.sizes["lon"]):
            col = np.asarray(da.data[:, la, lo], np.float64)
            th = clim["thresh"].sel(lat=float(la), lon=float(lo)).values
            se = clim["seas"].sel(lat=float(la), lon=float(lo)).values
            th_t = th[doy - 1]
            se_t = se[doy - 1]
            evs = events_oracle(col, th_t, se_t, md, join, mg)
            # framework events for this cell
            fev = {}
            labels = mhw["event"].sel(lat=float(la), lon=float(lo)).values
            fin = np.isfinite(labels)
            assert fin.sum() == len(evs), (la, lo)
            rows = np.nonzero(fin)[0]
            for k in mhw.keys():
                if k in ("lat", "lon") or "time" in k:
                    continue
                fev[k] = mhw[k].sel(lat=float(la),
                                    lon=float(lo)).values[rows]
            order = np.argsort(labels[fin])
            for j, ev in enumerate(sorted(evs,
                                          key=lambda d: d["event"])):
                checked_events += 1
                for prop, want in ev.items():
                    got = fev[prop][order[j]]
                    np.testing.assert_allclose(
                        got, want, rtol=1e-8, atol=1e-8, equal_nan=True,
                        err_msg=f"{prop} cell=({la},{lo}) ev={j} "
                                f"seed={seed}")
    assert checked_events >= min_ev  # configs must actually produce events


def test_block_average_vs_oracle(oisst_ts):
    """Naive per-cell/per-year loops vs the vectorized block_average."""
    clim = xm.threshold(oisst_ts, dtype=np.float64)
    mhw = xm.detect(oisst_ts, clim["thresh"], clim["seas"],
                    dtype=np.float64)
    blk = xm.block_average(mhw, period=[2003, 2004])

    lats = mhw.coords["lat"].values
    lons = mhw.coords["lon"].values
    for la in lats:
        for lo in lons:
            starts = mhw["time_start"].sel(lat=la, lon=lo).values
            years = starts.astype("datetime64[Y]").astype(int) + 1970
            ok = ~np.isnat(starts)
            for bi, year in enumerate((2003, 2004)):
                sel = ok & (years == year)
                # naive aggregations
                def naive(var, how):
                    v = mhw[var].sel(lat=la, lon=lo).values[sel]
                    v = v[np.isfinite(v)]
                    if len(v) == 0:
                        # pandas groupby: empty sum -> 0.0, others NaN
                        return 0.0 if how == "sum" else np.nan
                    return {"mean": np.mean, "max": np.max,
                            "sum": np.sum}[how](v)

                got = blk["ecount"].sel(lat=la, lon=lo).values[bi]
                np.testing.assert_allclose(got, sel.sum())
                for out, var, how in (
                        ("duration", "duration", "mean"),
                        ("intensity_max", "intensity_max", "mean"),
                        ("intensity_max_max", "intensity_max", "max"),
                        ("total_icum", "intensity_cumulative", "sum"),
                        ("rate_onset", "rate_onset", "mean"),
                        ("severity_cumulative", "severity_cumulative",
                         "mean")):
                    got = blk[out].sel(lat=la, lon=lo).values[bi]
                    np.testing.assert_allclose(
                        got, naive(var, how), equal_nan=True,
                        err_msg=f"{out} {la} {lo} {year}")


def test_coldspells_vs_oracle():
    """coldSpells mode == heatwave detection on the negated series with
    intensities flipped (reference: xmhw.py:153-154, 481-482)."""
    da = _grid(7, T_years=3)
    clim = xm.threshold(da, coldSpells=True, dtype=np.float64)
    cold = xm.detect(da, clim["thresh"], clim["seas"], coldSpells=True,
                     dtype=np.float64)
    # manual: negate input, run normal pipeline, flip intensity signs
    neg = da.copy(data=-np.asarray(da.data))
    clim2 = xm.threshold(neg, dtype=np.float64)
    hot = xm.detect(neg, clim2["thresh"], clim2["seas"], dtype=np.float64)
    np.testing.assert_allclose(
        np.nan_to_num(clim["thresh"].data),
        np.nan_to_num(clim2["thresh"].data))
    for v in ("event", "duration", "rate_onset"):
        np.testing.assert_allclose(np.nan_to_num(cold[v].data),
                                   np.nan_to_num(hot[v].data), err_msg=v)
    np.testing.assert_allclose(
        np.nan_to_num(cold["intensity_max"].data),
        np.nan_to_num(-hot["intensity_max"].data))
    np.testing.assert_allclose(
        np.nan_to_num(cold["intensity_var"].data),
        np.nan_to_num(hot["intensity_var"].data))


def test_tstep_monthly_vs_oracle():
    """tstep (monthly) path vs the oracle on the step-number calendar."""
    rng = np.random.default_rng(11)
    months = np.arange("2001-01", "2007-01",
                       dtype="datetime64[M]").astype("datetime64[ns]")
    T = len(months)
    vals = (15 + 5 * np.sin(2 * np.pi * np.arange(T) / 12)[:, None, None]
            + rng.normal(0, 1.5, (T, 2, 2)))
    da = DataArray(vals, ("time", "lat", "lon"),
                   {"time": Coord(("time",), months),
                    "lat": Coord(("lat",), [0.0, 1.0]),
                    "lon": Coord(("lon",), [0.0, 1.0])})
    clim = xm.threshold(da, tstep=True, windowHalfWidth=1,
                        smoothPercentile=False, dtype=np.float64)
    mhw = xm.detect(da, clim["thresh"], clim["seas"], tstep=True,
                    minDuration=2, maxGap=1, dtype=np.float64)
    doy = np.tile(np.arange(1, 13), T // 12)
    checked = 0
    for la in (0.0, 1.0):
        for lo in (0.0, 1.0):
            col = np.asarray(da.data[:, int(la), int(lo)], np.float64)
            th_o, se_o = clim_oracle(col, doy, 12, w=1, smooth=False,
                                     feb29=False)
            th_f = clim["thresh"].sel(lat=la, lon=lo).values
            np.testing.assert_allclose(th_f, th_o, atol=1e-10,
                                       equal_nan=True)
            evs = events_oracle(col, th_o[doy - 1], se_o[doy - 1], 2,
                                True, 1)
            labels = mhw["event"].sel(lat=la, lon=lo).values
            assert np.isfinite(labels).sum() == len(evs)
            checked += len(evs)
    assert checked > 0


def test_intermediate_vs_oracle():
    """Per-day intermediate values vs a naive recomputation."""
    da = _grid(12, T_years=3, nan_frac=0.02)
    clim = xm.threshold(da, dtype=np.float64)
    mhw, inter = xm.detect(da, clim["thresh"], clim["seas"],
                           intermediate=True, dtype=np.float64)
    from xmhw_tpu.core.calendar import compute_doy
    from xmhw_tpu.xrlite import TimeIndex

    tvals = np.asarray(da.coords["time"].values)
    doy, _ = compute_doy(TimeIndex(tvals))
    for la in range(2):
        for lo in range(2):
            col = np.asarray(da.data[:, la, lo], np.float64)
            th = clim["thresh"].sel(lat=float(la),
                                    lon=float(lo)).values[doy - 1]
            se = clim["seas"].sel(lat=float(la),
                                  lon=float(lo)).values[doy - 1]
            evs = events_oracle(col, th, se, 5, True, 2)
            daymask = np.zeros(len(col), bool)
            evid = np.full(len(col), np.nan)
            for e in evs:
                s, en = int(e["index_start"]), int(e["index_end"])
                daymask[s:en + 1] = True
                evid[s:en + 1] = s
            got_ev = inter["events"].sel(lat=float(la),
                                         lon=float(lo)).values
            np.testing.assert_array_equal(np.nan_to_num(got_ev, nan=-1),
                                          np.nan_to_num(evid, nan=-1))
            relSeas = np.where(daymask, col - se, np.nan)
            sev = np.where(daymask, (col - se) / -(th - se), np.nan)
            cats = np.floor(1 + np.where(daymask,
                                         (col - th) / (th - se), np.nan))
            for name, want in (("relSeas", relSeas), ("severity", sev),
                               ("cats", cats)):
                got = inter[name].sel(lat=float(la),
                                      lon=float(lo)).values
                np.testing.assert_allclose(
                    np.nan_to_num(got, nan=-9e9),
                    np.nan_to_num(want, nan=-9e9), rtol=1e-10,
                    err_msg=name)
            # bthresh: plain exceedance, NaN-safe False
            bt = inter["bthresh"].sel(lat=float(la),
                                      lon=float(lo)).values
            want_bt = np.zeros(len(col), bool)
            fin = np.isfinite(col) & np.isfinite(th)
            want_bt[fin] = col[fin] > th[fin]
            np.testing.assert_array_equal(bt.astype(bool), want_bt)


@pytest.mark.parametrize("seed,pctile,w,smooth,smooth_w", [
    (11, 80, 5, True, 31),
    (12, 95, 3, True, 11),
    (13, 90, 7, False, 31),
    (14, 99, 2, True, 5),
])
def test_threshold_params_vs_oracle(seed, pctile, w, smooth, smooth_w):
    """Non-default pctile / windowHalfWidth / smoothing vs the oracle —
    the percentile kernel's rank arithmetic and the circular smoother
    must hold across the whole parameter surface, not just defaults."""
    da = _grid(seed, nan_frac=0.01)
    clim = xm.threshold(da, pctile=pctile, windowHalfWidth=w,
                        smoothPercentile=smooth,
                        smoothPercentileWidth=smooth_w, dtype=np.float64)
    from xmhw_tpu.core.calendar import compute_doy
    from xmhw_tpu.xrlite import TimeIndex

    doy, ndoy = compute_doy(TimeIndex(np.asarray(
        da.coords["time"].values)))
    for la in range(da.sizes["lat"]):
        for lo in range(da.sizes["lon"]):
            col = np.asarray(da.data[:, la, lo], np.float64)
            th_o, se_o = clim_oracle(col, doy, ndoy, w=w, pctile=pctile,
                                     smooth=smooth, smooth_w=smooth_w)
            np.testing.assert_allclose(
                clim["thresh"].sel(lat=float(la), lon=float(lo)).values,
                th_o, atol=1e-10, equal_nan=True,
                err_msg=f"thresh pctile={pctile} w={w}")
            np.testing.assert_allclose(
                clim["seas"].sel(lat=float(la), lon=float(lo)).values,
                se_o, atol=1e-10, equal_nan=True)


def test_detect_reference_quirks_vs_pandas_artifact():
    """reference_quirks=True reproduces the reference's day-0 fillna
    artifact end-to-end through the public API: a qualifying run that
    starts on day 0 loses its first day; without the quirk it keeps it."""
    t = np.arange("2001-01-01", "2002-01-01",
                  dtype="datetime64[D]").astype("datetime64[ns]")
    T = len(t)
    data = np.full((T, 1, 1), 10.0)
    data[:8, 0, 0] = 20.0    # 8-day exceedance run from day 0
    data[100:107, 0, 0] = 20.0
    da = DataArray(
        data, ("time", "lat", "lon"),
        {"time": Coord(("time",), t),
         "lat": Coord(("lat",), np.array([0.0])),
         "lon": Coord(("lon",), np.array([0.0]))})
    th = DataArray(np.full((366, 1, 1), 15.0), ("doy", "lat", "lon"),
                   {"doy": Coord(("doy",), np.arange(1, 367)),
                    "lat": Coord(("lat",), np.array([0.0])),
                    "lon": Coord(("lon",), np.array([0.0]))})
    se = th.copy(data=np.full((366, 1, 1), 10.0))
    plain = xm.detect(da, th, se, dtype=np.float64)
    quirk = xm.detect(da, th, se, dtype=np.float64,
                      reference_quirks=True)
    d_plain = np.sort(plain["duration"].data[np.isfinite(
        plain["duration"].data)])
    d_quirk = np.sort(quirk["duration"].data[np.isfinite(
        quirk["duration"].data)])
    np.testing.assert_array_equal(d_plain, [7.0, 8.0])
    np.testing.assert_array_equal(d_quirk, [7.0, 7.0])  # day 0 dropped
