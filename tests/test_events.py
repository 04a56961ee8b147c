"""Event RLE core tests (mirrors reference test_identify.py mhw_filter /
join_gaps coverage, reference: test/test_identify.py:90-122)."""

import jax.numpy as jnp
import numpy as np

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
