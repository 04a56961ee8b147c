"""Event feature engine tests: reference define_events 9-day fixture
(reference: test/test_identify.py:155-190) through the public detect API,
plus flip_cold (reference: test/test_features.py:92-103)."""

import numpy as np

import xmhw_tpu as xm
from xmhw_tpu.xrlite import Coord, DataArray, Dataset


def test_define_events_fixture(define_data, mhw_expected):
    ts, th, se = define_data
    mhw = xm.detect(ts, th, se, minDuration=5, joinGaps=True, maxGap=2,
                    dtype=np.float64)
    assert list(mhw["events"].values) == [1]
    for k, v in mhw_expected.items():
        got = float(np.asarray(mhw[k].data).reshape(-1)[0])
        np.testing.assert_allclose(got, v, rtol=1e-5, atol=1e-5,
                                   err_msg=k)
    # time variables
    assert np.datetime64("2001-01-02") == mhw["time_start"].data.reshape(
        -1)[0].astype("datetime64[D]")
    assert np.datetime64("2001-01-07") == mhw["time_end"].data.reshape(
        -1)[0].astype("datetime64[D]")
    assert np.datetime64("2001-01-06") == mhw["time_peak"].data.reshape(
        -1)[0].astype("datetime64[D]")
    # grid coords survive
    assert mhw["event"].dims == ("events", "lat", "lon")
    np.testing.assert_allclose(mhw.coords["lat"].values, [45.5])


def test_define_events_intermediate(define_data, inter_expected):
    ts, th, se = define_data
    mhw, inter = xm.detect(ts, th, se, intermediate=True, dtype=np.float64)
    for k, v in inter_expected.items():
        got = np.asarray(inter[k].data).reshape(9)
        want = np.asarray(v, dtype=got.dtype if got.dtype != bool
                          else bool)
        if got.dtype == bool:
            np.testing.assert_array_equal(got, want, err_msg=k)
        else:
            np.testing.assert_allclose(got, want.astype(float),
                                       atol=2e-5, err_msg=k)


def test_detect_no_event_cell(define_data):
    ts, th, se = define_data
    cold = ts.copy(data=ts.data - 10.0)  # never exceeds threshold
    mhw = xm.detect(cold, th, se, dtype=np.float64)
    assert mhw["event"].sizes["events"] == 0


def test_rates_closed_form():
    """Onset/decline closed form vs the reference rates fixture
    (reference: xmhw_fixtures.py:170-182, test_features.py:45-51)."""
    # index_start=3, index_end=10, index_peak=8, relS_first=2.3,
    # relS_last=1.8, intensity_max=3.1, anom_first=0.3, anom_last=0.2,
    # last=321 -> onset 0.32727273, decline 0.84
    start, end, peak, last = 3.0, 10.0, 8.0, 321
    relS_first, relS_last, imax = 2.3, 1.8, 3.1
    anom_first, anom_last = 0.3, 0.2
    rel_peak = peak - start
    x = rel_peak if rel_peak != 0 else 1.0
    onset_period = x if start == 0 else x + 0.5
    esp = end - start - rel_peak
    y = esp if rel_peak != last else 1.0
    decline_period = y if end == last else y + 0.5
    edge_on = 0.5 * (relS_first + (relS_first if start == 0 else anom_first))
    edge_de = 0.5 * (relS_last + (relS_last if end == last else anom_last))
    np.testing.assert_almost_equal((imax - edge_on) / onset_period,
                                   0.32727273)
    np.testing.assert_almost_equal((imax - edge_de) / decline_period, 0.84)


def test_event_touching_series_edges():
    """Events at the very start/end of the series use the half-day-free
    period rule (reference: features.py:225-263)."""
    time = np.arange("2001-01-01", "2001-01-11",
                     dtype="datetime64[D]").astype("datetime64[ns]")
    ts = DataArray(
        np.array([19.0, 19.5, 20.0, 19.4, 19.2, 14, 14, 14, 14,
                  14.0]).reshape(10, 1, 1),
        ("time", "lat", "lon"),
        {"time": Coord(("time",), time), "lat": Coord(("lat",), [0.0]),
         "lon": Coord(("lon",), [0.0])})
    doyc = Coord(("doy",), np.arange(1, 11))
    th = DataArray(np.full((10, 1, 1), 16.0), ("doy", "lat", "lon"),
                   {"doy": doyc, "lat": Coord(("lat",), [0.0]),
                    "lon": Coord(("lon",), [0.0])})
    se = DataArray(np.full((10, 1, 1), 15.0), ("doy", "lat", "lon"),
                   {"doy": doyc, "lat": Coord(("lat",), [0.0]),
                    "lon": Coord(("lon",), [0.0])})
    mhw = xm.detect(ts, th, se, dtype=np.float64)
    vals = {k: float(np.asarray(mhw[k].data).reshape(-1)[0])
            for k in ("index_start", "index_end", "index_peak",
                      "rate_onset", "rate_decline", "duration")}
    assert vals["index_start"] == 0 and vals["index_end"] == 4
    assert vals["index_peak"] == 2
    # onset: start==0 -> period = rel_peak = 2, edge = relS_first = 4.0
    np.testing.assert_allclose(vals["rate_onset"], (5.0 - 4.0) / 2.0)
    # decline: end != tsend -> period = (4-0-2)+0.5, edge=.5*(4.2+(14-15))
    np.testing.assert_allclose(vals["rate_decline"],
                               (5.0 - 0.5 * (4.2 - 1.0)) / 2.5)


def test_flip_cold():
    ds = Dataset()
    y = DataArray(np.array([1.0, 2.0, np.nan]), ("x",),
                  {"x": Coord(("x",), np.arange(3))})
    ds["intensity_sum_dummy"] = y
    ds["intensity_var_dummy"] = y
    ds["dummy"] = y
    ds2 = xm.flip_cold(ds)
    np.testing.assert_array_equal(ds2["intensity_sum_dummy"].data,
                                  [-1.0, -2.0, np.nan])
    np.testing.assert_array_equal(ds2["intensity_var_dummy"].data,
                                  [1.0, 2.0, np.nan])
    np.testing.assert_array_equal(ds2["dummy"].data, [1.0, 2.0, np.nan])


def test_run_detect_optimistic_k_overflow_retry():
    """run_detect fixes K from the FIRST block's counting pass and
    retries optimistically when a later block overflows the table. Force
    that: block 1 has a single long event per cell, block 2 has ~60
    short ones — far above the first block's K=32 — and require equality
    with a single-block run (which sizes K from a global count)."""
    import numpy as np

    from xmhw_tpu.core.calendar import compute_doy
    from xmhw_tpu.core.pipeline import run_detect
    from xmhw_tpu.xrlite import TimeIndex

    T, C = 730, 8
    t = np.arange("2001-01-01", "2003-01-01",
                  dtype="datetime64[D]").astype("datetime64[ns]")[:T]
    doy, _ = compute_doy(TimeIndex(t))
    doy_pos = (doy - 1).astype(np.int32)

    th = np.full((366, C), 0.5, np.float64)
    se = np.zeros((366, C), np.float64)
    ts = np.zeros((T, C), np.float64)
    ts[100:160, :4] = 1.0                # one long event (first block)
    for k in range(60):                  # 60 short events (second block)
        ts[12 * k:12 * k + 6, 4:] = 1.0

    multi = run_detect(ts, th, se, doy_pos, min_duration=5,
                       join_gaps=True, max_gap=2, block=4)
    one = run_detect(ts, th, se, doy_pos, min_duration=5,
                     join_gaps=True, max_gap=2)
    np.testing.assert_array_equal(multi[1], one[1])  # n_events
    assert multi[1][:4].max() == 1 and multi[1][4:].min() >= 55
    for k in ("event", "duration", "intensity_max"):
        a, b = multi[0][k], one[0][k]
        K = min(a.shape[0], b.shape[0])
        assert np.isfinite(a[K:]).sum() == 0
        assert np.isfinite(b[K:]).sum() == 0
        np.testing.assert_array_equal(np.nan_to_num(a[:K]),
                                      np.nan_to_num(b[:K]), err_msg=k)


def test_run_detect_k_cap_still_warns(caplog):
    """k_cap truncation still warns and caps under the optimistic-K
    scheme (no silent drops)."""
    import logging

    import numpy as np

    from xmhw_tpu.core.calendar import compute_doy
    from xmhw_tpu.core.pipeline import run_detect
    from xmhw_tpu.xrlite import TimeIndex

    T, C = 730, 4
    t = np.arange("2001-01-01", "2003-01-01",
                  dtype="datetime64[D]").astype("datetime64[ns]")[:T]
    doy, _ = compute_doy(TimeIndex(t))
    doy_pos = (doy - 1).astype(np.int32)
    th = np.full((366, C), 0.5, np.float64)
    se = np.zeros((366, C), np.float64)
    ts = np.zeros((T, C), np.float64)
    for k in range(60):
        ts[12 * k:12 * k + 6, :] = 1.0

    with caplog.at_level(logging.WARNING, logger="xmhw_tpu"):
        tables, n_events, _ = run_detect(
            ts, th, se, doy_pos, min_duration=5, join_gaps=True,
            max_gap=2, k_cap=32)
    assert n_events.max() == 32           # capped, table-consistent
    assert tables["event"].shape[0] == 32
    assert any("truncated" in r.message for r in caplog.records)
