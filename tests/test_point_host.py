"""Differential tests: host numpy point engine (core/point.py) vs the
device engines through the same public API (XMHW_POINT_HOST=0 forces
points onto run_clim/run_detect), plus the independent naive oracle.

The point path must be indistinguishable from the grid engines — every
event variable, the intermediate dataset, and every quirk flag
(reference_quirks day-0 artifact, joinGaps=False, maxPadLength,
coldSpells)."""

import numpy as np
import pytest
from numpy import testing as nptest

import xmhw_tpu as xm
from xmhw_tpu.xrlite import Coord, DataArray

from oracle import clim_oracle, events_oracle


def _series(T=2200, seed=3, nan_runs=((150, 160), (900, 903))):
    rng = np.random.default_rng(seed)
    t = (np.datetime64("2000-01-01") + np.arange(T)).astype(
        "datetime64[ns]")
    day = np.arange(T)
    x = (14 + 2.5 * np.sin(2 * np.pi * day / 365.25)
         + rng.normal(0, 1.6, T))
    # force a long exceedance run touching day 0 (quirk territory)
    x[:9] += 6.0
    # and one ending exactly at T-1
    x[-7:] += 6.0
    for lo, hi in nan_runs:
        x[lo:hi] = np.nan
    return DataArray(x, ("time",), {"time": Coord(("time",), t)})


def _detect_both(da, monkeypatch, **kw):
    clim = xm.threshold(da, dtype=np.float64)
    host = xm.detect(da, clim["thresh"], clim["seas"], dtype=np.float64,
                     **kw)
    monkeypatch.setenv("XMHW_POINT_HOST", "0")
    dev = xm.detect(da, clim["thresh"], clim["seas"], dtype=np.float64,
                    **kw)
    monkeypatch.delenv("XMHW_POINT_HOST")
    return host, dev


def test_point_clim_matches_device(monkeypatch):
    da = _series()
    host = xm.threshold(da, dtype=np.float64)
    monkeypatch.setenv("XMHW_POINT_HOST", "0")
    dev = xm.threshold(da, dtype=np.float64)
    monkeypatch.delenv("XMHW_POINT_HOST")
    for v in ("thresh", "seas"):
        nptest.assert_allclose(host[v].data, dev[v].data, rtol=1e-12,
                               equal_nan=True, err_msg=v)


def test_point_clim_matches_oracle():
    """Independent check: numpy engine vs the naive pooled oracle."""
    from xmhw_tpu.core.calendar import compute_doy
    from xmhw_tpu.xrlite import TimeIndex

    da = _series(T=1500)
    doy, ndoy = compute_doy(TimeIndex(da.coords["time"].values))
    clim = xm.threshold(da, dtype=np.float64)
    th_o, se_o = clim_oracle(np.asarray(da.data, np.float64), doy, ndoy)
    nptest.assert_allclose(clim["thresh"].data, th_o, rtol=1e-10,
                           equal_nan=True)
    nptest.assert_allclose(clim["seas"].data, se_o, rtol=1e-10,
                           equal_nan=True)


@pytest.mark.parametrize("kw", [
    {},
    {"joinGaps": False},
    {"reference_quirks": True},
    {"minDuration": 3, "maxGap": 1},
    {"coldSpells": True},
    {"maxPadLength": 4},
])
def test_point_detect_matches_device(monkeypatch, kw):
    da = _series()
    if kw.get("coldSpells"):
        clim = xm.threshold(da, coldSpells=True, dtype=np.float64)
        host = xm.detect(da, clim["thresh"], clim["seas"],
                         dtype=np.float64, **kw)
        monkeypatch.setenv("XMHW_POINT_HOST", "0")
        dev = xm.detect(da, clim["thresh"], clim["seas"],
                        dtype=np.float64, **kw)
        monkeypatch.delenv("XMHW_POINT_HOST")
    else:
        host, dev = _detect_both(da, monkeypatch, **kw)
    assert set(host.keys()) == set(dev.keys())
    assert list(host["event"].coords["events"].values) == list(
        dev["event"].coords["events"].values)
    for v in host.keys():
        a, b = host[v].data, dev[v].data
        if np.issubdtype(np.asarray(a).dtype, np.datetime64):
            nptest.assert_array_equal(a, b, err_msg=v)
        else:
            nptest.assert_allclose(a, b, rtol=1e-9, atol=1e-12,
                                   equal_nan=True, err_msg=v)


def test_point_detect_intermediate_matches(monkeypatch):
    da = _series()
    host, dev = _detect_both(da, monkeypatch, intermediate=True)
    hm, hi = host
    dm, di = dev
    assert set(hi.keys()) == set(di.keys())
    for v in hi.keys():
        a, b = hi[v].data, di[v].data
        nptest.assert_allclose(np.asarray(a, np.float64),
                               np.asarray(b, np.float64), rtol=1e-9,
                               atol=1e-12, equal_nan=True, err_msg=v)


def test_point_detect_matches_oracle():
    """Event properties vs the independent per-event oracle."""
    da = _series(T=1800, seed=11)
    clim = xm.threshold(da, dtype=np.float64)
    mhw = xm.detect(da, clim["thresh"], clim["seas"], dtype=np.float64)
    from xmhw_tpu.core.calendar import compute_doy
    from xmhw_tpu.xrlite import TimeIndex

    doy, _ = compute_doy(TimeIndex(da.coords["time"].values))
    pos = doy - 1
    th_t = np.asarray(clim["thresh"].data, np.float64)[pos]
    se_t = np.asarray(clim["seas"].data, np.float64)[pos]
    evs = events_oracle(np.asarray(da.data, np.float64), th_t, se_t)
    got_ev = mhw["event"].data
    fin = np.isfinite(got_ev)
    assert fin.sum() == len(evs)
    for name in ("event", "duration", "intensity_max", "intensity_var",
                 "severity_cumulative", "category", "rate_onset",
                 "rate_decline", "duration_extreme"):
        want = np.asarray([e[name] for e in evs])
        nptest.assert_allclose(mhw[name].data[fin], want, rtol=1e-9,
                               equal_nan=True, err_msg=name)


def test_point_maxpad_interpolation_matches_device():
    from xmhw_tpu.core.point import point_interpolate_na
    import jax.numpy as jnp
    from xmhw_tpu.core.events import interpolate_na_device

    rng = np.random.default_rng(0)
    x = rng.normal(size=(200, 1))
    x[10:13, 0] = np.nan   # short interior gap: filled
    x[50:60, 0] = np.nan   # long gap: stays NaN under max_gap=4
    x[:2, 0] = np.nan      # leading: never filled
    x[-3:, 0] = np.nan     # trailing: never filled
    host = point_interpolate_na(x, max_gap=4)
    dev = np.asarray(interpolate_na_device(jnp.asarray(x), max_gap=4))
    nptest.assert_allclose(host, dev, rtol=1e-12, equal_nan=True)
