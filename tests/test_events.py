"""Event RLE core tests (mirrors reference test_identify.py mhw_filter /
join_gaps coverage, reference: test/test_identify.py:90-122)."""

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from xmhw_tpu.core.events import interpolate_na_device, mhw_filter


def test_mhw_filter_no_join(filter_data):
    a, exp, _ = filter_data
    f = mhw_filter(jnp.asarray(a)[:, None], min_duration=5,
                   join_gaps=False)
    np.testing.assert_array_equal(np.asarray(f["event_id"])[:, 0], exp)
    assert int(f["n_events"][0]) == 3
    # start/end geometry of the second event
    st = np.asarray(f["ev_start"])[:, 0]
    en = np.asarray(f["ev_end"])[:, 0]
    assert st[12] == 11 and en[12] == 16


def test_mhw_filter_join_maxgap3(filter_data):
    a, _, exp_joined = filter_data
    f = mhw_filter(jnp.asarray(a)[:, None], min_duration=5,
                   join_gaps=True, max_gap=3)
    np.testing.assert_array_equal(np.asarray(f["event_id"])[:, 0],
                                  exp_joined)
    assert int(f["n_events"][0]) == 2
    st = np.asarray(f["ev_start"])[:, 0]
    en = np.asarray(f["ev_end"])[:, 0]
    assert st[20] == 11 and en[20] == 24  # merged span includes gap days


def test_mhw_filter_default_gap_no_join(filter_data):
    a, exp, _ = filter_data
    f = mhw_filter(jnp.asarray(a)[:, None], min_duration=5,
                   join_gaps=True, max_gap=2)
    np.testing.assert_array_equal(np.asarray(f["event_id"])[:, 0], exp)


def test_mhw_filter_multicell(filter_data):
    a, exp, exp_joined = filter_data
    grid = np.stack([a, np.zeros_like(a), a], axis=1)
    f = mhw_filter(jnp.asarray(grid), min_duration=5, join_gaps=True,
                   max_gap=3)
    np.testing.assert_array_equal(np.asarray(f["n_events"]), [2, 0, 2])
    np.testing.assert_array_equal(np.asarray(f["event_id"])[:, 1], -1)
    np.testing.assert_array_equal(np.asarray(f["event_id"])[:, 2],
                                  exp_joined)


def test_transitive_chain_join():
    # three 5-day events separated by 2-day gaps: all merge into one
    a = np.zeros(25, bool)
    a[1:6] = a[8:13] = a[15:20] = True
    f = mhw_filter(jnp.asarray(a)[:, None], min_duration=5,
                   join_gaps=True, max_gap=2)
    assert int(f["n_events"][0]) == 1
    eid = np.asarray(f["event_id"])[:, 0]
    assert (eid[1:20] == 1).all() and (eid[0] == -1) and (eid[20:] == -1
                                                          ).all()


def test_join_does_not_cross_long_gap():
    a = np.zeros(30, bool)
    a[0:5] = a[10:15] = True  # gap of 5 days > maxGap
    f = mhw_filter(jnp.asarray(a)[:, None], min_duration=5,
                   join_gaps=True, max_gap=2)
    assert int(f["n_events"][0]) == 2


def test_sub_minduration_runs_absorbed_in_gap():
    # short (2-day) run inside a small gap between two kept events gets
    # absorbed by the join (reference join semantics: everything between
    # chain ends becomes part of the merged event)
    a = np.zeros(30, bool)
    a[0:5] = True
    a[6:8] = True   # 2-day run, below minDuration
    a[9:14] = True  # non-kept stretch 5..8 is 4 days -> joins at maxGap=4
    f = mhw_filter(jnp.asarray(a)[:, None], min_duration=5,
                   join_gaps=True, max_gap=4)
    assert int(f["n_events"][0]) == 1
    eid = np.asarray(f["event_id"])[:, 0]
    assert (eid[0:14] == 0).all()


def test_interpolate_na_device():
    x = np.array([1.0, np.nan, 3.0, np.nan, np.nan, np.nan, 7.0, np.nan])
    out = np.asarray(interpolate_na_device(jnp.asarray(x)[:, None],
                                           max_gap=2))[:, 0]
    # single-NaN gap filled, 3-NaN gap left, trailing NaN never filled
    np.testing.assert_allclose(out[:3], [1.0, 2.0, 3.0])
    assert np.isnan(out[3:6]).all()
    assert out[6] == 7.0 and np.isnan(out[7])
    out2 = np.asarray(interpolate_na_device(jnp.asarray(x)[:, None]))[:, 0]
    np.testing.assert_allclose(out2[:7], [1, 2, 3, 4, 5, 6, 7])


def test_interpolate_na_device_matches_host():
    """Device interpolate_na == the labeled-array host implementation."""
    from xmhw_tpu.xrlite import Coord, DataArray

    rng = np.random.default_rng(4)
    T, C = 500, 17
    data = rng.normal(15, 2, (T, C))
    mask = rng.random((T, C)) < 0.1
    data[mask] = np.nan
    data[0, 0] = np.nan  # leading NaN never filled
    data[-1, 1] = np.nan  # trailing NaN never filled
    da = DataArray(data.copy(), ("time", "c"),
                   {"time": Coord(("time",), np.arange(T)),
                    "c": Coord(("c",), np.arange(C))})
    host = da.interpolate_na("time", max_gap=3).data
    dev = np.asarray(interpolate_na_device(jnp.asarray(data), max_gap=3))
    np.testing.assert_allclose(np.nan_to_num(dev, nan=-9e9),
                               np.nan_to_num(host, nan=-9e9), rtol=1e-12)


def _pandas_reference_filter(b, min_duration=5, join_gaps=True, max_gap=2):
    """Oracle replicating the reference's mhw_filter/join_gaps pandas chain
    (reference identify.py:415-479, 273-325, 532-536) — INCLUDING the
    fillna(0) day-0 artifact. Returns per-day start-index labels (NaN off
    event)."""
    idxarr = pd.Series(np.arange(len(b), dtype=float))
    bth = pd.Series(np.asarray(b, bool))
    events = (idxarr.where(~bth).ffill()).fillna(0)
    events_map = idxarr - events
    shifted = (events_map - events_map.shift(1)).shift(-1)
    shifted = shifted.where(~np.isnan(shifted), -events_map)
    duration = events_map.where(shifted <= -min_duration)
    end = idxarr.where(~np.isnan(duration))
    st = end - duration + 1
    events = events + 1
    sel = events.where(events.isin(st) & (events_map != 0))
    if join_gaps:
        s = st.dropna()
        e = end.dropna()
        if len(s) > 1:
            pairs = set(zip(s.values, e.values))
            eshift = e.shift(1).fillna(value=-(max_gap + 1))
            gaps = (s - eshift) > max_gap + 1
            gaps_shifted = gaps.shift(-1).fillna(value=True)
            s2 = s.where(gaps).dropna()
            e2 = e.where(gaps_shifted).dropna()
            if len(s2) < len(s):
                for js, je in set(zip(s2.values, e2.values)) - pairs:
                    sel.iloc[int(js):int(je) + 1] = js
    return sel.values


def _labels(f):
    eid = np.asarray(f["event_id"][:, 0]).astype(float)
    eid[eid < 0] = np.nan
    return eid


@pytest.mark.parametrize("lead", [3, 5, 6, 9])
def test_day0_quirk_matches_pandas_reference(lead):
    # a run touching day 0 (length `lead`), then regular events
    b = np.zeros(40, bool)
    b[:lead] = True
    b[12:19] = True
    b[21:27] = True  # gap of 2 from previous -> joined
    for join in (True, False):
        exp = _pandas_reference_filter(b, 5, join, 2)
        f = mhw_filter(jnp.asarray(b)[:, None], min_duration=5,
                       join_gaps=join, max_gap=2, day0_fillna_quirk=True)
        np.testing.assert_array_equal(_labels(f), exp)


def test_day0_quirk_randomized_vs_pandas_reference():
    rng = np.random.default_rng(7)
    for trial in range(30):
        b = rng.random(60) < 0.45
        b[0] = trial % 2 == 0  # half the trials start mid-run
        exp = _pandas_reference_filter(b, 5, True, 2)
        f = mhw_filter(jnp.asarray(b)[:, None], min_duration=5,
                       join_gaps=True, max_gap=2, day0_fillna_quirk=True)
        np.testing.assert_array_equal(_labels(f), exp)


def test_day0_default_includes_first_day():
    # deliberate fix: without the quirk a leading 5-day run IS an event
    # starting at index 0 (the reference would discard it entirely)
    b = np.zeros(30, bool)
    b[:5] = True
    f = mhw_filter(jnp.asarray(b)[:, None], min_duration=5)
    lab = _labels(f)
    assert np.all(lab[:5] == 0.0) and np.all(np.isnan(lab[5:]))
    fq = mhw_filter(jnp.asarray(b)[:, None], min_duration=5,
                    day0_fillna_quirk=True)
    assert np.all(np.isnan(_labels(fq)))


def test_relthreshnorm_golden_filter_parity(dsnorm):
    """External anchor: the reference repo's relthreshnorm.nc golden
    (reference: test/xmhw_fixtures.py:36,64-66) holds per-day event labels
    and relThreshNorm produced by the reference pipeline on a real 2x2
    grid (2012-2013, 731 days).  relThreshNorm is positive exactly on
    above-threshold days and negative on joined-gap days, so the
    exceedance mask is reconstructible wherever the file is finite;
    running our mhw_filter on it must reproduce the reference's labels.

    The file masks some in-event days to NaN (e.g. a stored event visibly
    1 day long -- below minDuration, so days are provably hidden); on
    cells touched by that masking our runs are truncated below
    minDuration.  The assertions therefore are: (a) the fully-visible
    cell matches exactly, (b) every event we produce matches the
    reference label bit-for-bit, (c) every reference event-day we miss
    belongs to an event with fewer than minDuration visible days (i.e.
    provably incomplete input, never an engine divergence)."""
    import os

    from xmhw_tpu.core.calendar import compute_doy
    from xmhw_tpu.identify import mhw_filter as filt
    from xmhw_tpu.xrlite.timeutils import TimeIndex

    g = dsnorm
    T = g["event"].sizes["time"]
    ev = g["event"].values.reshape(T, -1)
    rn = g["relThreshNorm"].values.reshape(T, -1)
    bthresh = np.where(np.isfinite(rn), rn > 0, False)
    ours = filt(bthresh, 5, True, 2)["events"]

    # (a) cell 0 has no masked event days: exact label parity
    eq0 = (np.isnan(ev[:, 0]) & np.isnan(ours[:, 0])) | (
        ev[:, 0] == ours[:, 0])
    assert eq0.all()
    # (b) every label we emit equals the reference's
    fin = np.isfinite(ours)
    np.testing.assert_array_equal(ev[fin], ours[fin])
    # (c) misses are exactly the provably-masked events
    missed = np.isfinite(ev) & ~fin
    for c in range(ev.shape[1]):
        for e in np.unique(ev[missed[:, c], c]):
            assert (ev[:, c] == e).sum() < 5, (c, e)
    # doy coordinate parity on a leap-spanning axis (2012 is leap)
    ti = g["event"].coords["time"].values
    if not isinstance(ti, TimeIndex):
        ti = TimeIndex(np.asarray(ti))
    doy, ndoy = compute_doy(ti)
    np.testing.assert_array_equal(np.asarray(doy), g["doy"].values)
    assert ndoy == 366
