"""Climatology core tests (mirrors reference runavg/window_roll/feb29
coverage, reference: test/test_identify.py:57-88)."""

import jax.numpy as jnp
import numpy as np

from xmhw_tpu.core.calendar import build_window_index
from xmhw_tpu.core.clim import doy_clim, feb29_patch, runavg_circular


def test_runavg_reference_values():
    a = jnp.array([1.0, 2, 2, 4, 3, 2])[:, None]
    b = np.asarray(runavg_circular(a, 3))[:, 0]
    np.testing.assert_almost_equal(
        b, [1.66667, 1.66667, 2.66667, 3.0, 3.0, 2.0], decimal=5)
    c = np.asarray(runavg_circular(a, 5))[:, 0]
    np.testing.assert_almost_equal(c, [2.0, 2.2, 2.4, 2.6, 2.4, 2.4],
                                   decimal=5)


def test_runavg_nan_propagates():
    a = jnp.array([1.0, np.nan, 2, 4, 3, 2])[:, None]
    b = np.asarray(runavg_circular(a, 3))[:, 0]
    assert np.isnan(b[0]) and np.isnan(b[1]) and np.isnan(b[2])
    assert np.isfinite(b[3:]).all()


def test_window_pool_quantile_matches_reference_semantics():
    """Pooled values for doy d = all ts within +-w steps of every timestep
    with that doy, NaN values dropped (reference window_roll + groupby
    quantile, identify.py:184-242)."""
    rng = np.random.default_rng(42)
    T, C, w = 366 * 4, 3, 5
    doy = (np.arange(T) % 366) + 1
    ts = rng.normal(15, 3, (T, C))
    ts[100:130, 1] = np.nan
    gidx, Z = build_window_index(doy, w, 366)
    assert Z <= (2 * w + 1) * 4
    th, se = doy_clim(jnp.asarray(ts), jnp.asarray(gidx), 90)
    th, se = np.asarray(th), np.asarray(se)
    for d in (1, 59, 60, 200, 366):
        for c in range(C):
            pool = []
            for t in np.nonzero(doy == d)[0]:
                pool.extend(ts[max(0, t - w):t + w + 1, c])
            pool = np.asarray(pool)
            pool = pool[np.isfinite(pool)]
            np.testing.assert_allclose(th[d - 1, c], np.quantile(pool, 0.9),
                                       rtol=1e-12)
            np.testing.assert_allclose(se[d - 1, c], pool.mean(),
                                       rtol=1e-12)


def test_window_roll_tstack_values(oisst_ts):
    """First 3 days of 2003 at one point with w=1 pool to the reference's
    tstack fixture values (reference: test_identify.py:81-88)."""
    sub = oisst_ts.sel(time=slice("2003-01-01", "2003-01-03"),
                       lat=-42.625, lon=148.125)
    vals = np.asarray(sub.values, np.float64)[:, None]
    doy = np.array([1, 2, 3])
    gidx, _ = build_window_index(doy, 1, 3)
    pooled = np.sort(
        vals[gidx[gidx >= 0], 0])
    expected = np.sort([16.99, 17.39, 16.99, 17.39, 17.3, 17.39, 17.3])
    np.testing.assert_almost_equal(pooled, expected, decimal=5)


def test_feb29_patch():
    clim = np.arange(366 * 2, dtype=float).reshape(366, 2)
    out = np.asarray(feb29_patch(jnp.asarray(clim)))
    np.testing.assert_allclose(out[59], clim[58:61].mean(axis=0))
    # other rows untouched
    np.testing.assert_allclose(out[:59], clim[:59])
    np.testing.assert_allclose(out[60:], clim[60:])


def test_feb29_patch_skipna():
    clim = np.ones((366, 1))
    clim[58, 0] = np.nan
    out = np.asarray(feb29_patch(jnp.asarray(clim)))
    assert out[59, 0] == 1.0  # mean of the two finite neighbours


def test_empty_bucket_gives_nan():
    doy = np.array([1, 2, 3, 1, 2, 3], dtype=np.int64)
    ts = np.ones((6, 1))
    gidx, _ = build_window_index(doy, 0, 4)  # doy 4 never occurs
    th, se = doy_clim(jnp.asarray(ts), jnp.asarray(gidx), 90)
    assert np.isnan(np.asarray(th)[3, 0]) and np.isnan(np.asarray(se)[3, 0])
    assert np.asarray(th)[0, 0] == 1.0


def test_select_quantile_matches_sort_with_ties():
    """Radix-select must handle duplicate values: the (k+1)-th order
    statistic can EQUAL the k-th (OISST data is 0.01-quantized)."""
    import jax.numpy as jnp

    from xmhw_tpu.core.clim import (_interp_quantile, _masked_sort,
                                    _select_quantile)

    rng = np.random.default_rng(3)
    vals = np.round(rng.normal(15, 3, (40, 111, 17)), 2).astype(np.float32)
    mask = rng.random((40, 111, 17)) > 0.1
    sq = np.asarray(_select_quantile(jnp.asarray(vals), jnp.asarray(mask),
                                     90))
    sv, n = _masked_sort(jnp.asarray(vals), jnp.asarray(mask))
    gq = np.asarray(_interp_quantile(sv, n, 90))
    np.testing.assert_allclose(sq, gq, atol=1e-6)
    # negative values exercise the sign-flip in the uint32 key
    vals2 = (vals - 15.0).astype(np.float32)
    sq2 = np.asarray(_select_quantile(jnp.asarray(vals2),
                                      jnp.asarray(mask), 90))
    sv2, n2 = _masked_sort(jnp.asarray(vals2), jnp.asarray(mask))
    gq2 = np.asarray(_interp_quantile(sv2, n2, 90))
    np.testing.assert_allclose(sq2, gq2, atol=1e-6)


def test_quantile_position_exact_int_arithmetic():
    """pctile*(n-1) positions are computed exactly in int32: 90% of n=451
    is rank 405 exactly (float32 0.9*450 floors to 404). ADVICE r1."""
    import jax.numpy as jnp

    from xmhw_tpu.core.clim import _select_quantile

    n = 451
    rng = np.random.default_rng(5)
    base = np.arange(n, dtype=np.float32)
    vals = np.stack([rng.permutation(base) for _ in range(3)],
                    axis=1)[None]  # (1, n, 3)
    mask = np.ones_like(vals, bool)
    out = np.asarray(_select_quantile(jnp.asarray(vals), jnp.asarray(mask),
                                      90))
    np.testing.assert_array_equal(out, np.full((1, 3), 405.0))
