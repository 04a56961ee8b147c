"""Compiled-Pallas kernels on the real TPU chip vs the float64 numpy oracle.

The rest of the suite runs the Pallas kernels in interpret mode on CPU;
this module exercises the ACTUAL Mosaic-compiled path (the code carries
workarounds for TPU lowering landmines — signed radix keys in
core/clim.py, i1-layout issues in ops/pallas/detect_scan.py — that
interpret mode cannot regress). Run with:

    XMHW_TPU_TESTS=1 PYTHONPATH=/root/repo:/root/.axon_site \
        python -m pytest tests/test_tpu_compiled.py -v

Skipped automatically when the backend is not a TPU (normal CI).
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="needs a real accelerator (run with XMHW_TPU_TESTS=1)")


def _series(T, C, seed=0):
    rng = np.random.default_rng(seed)
    day = np.arange(T, dtype=np.float32)[:, None]
    base = 15 + 3 * np.sin(2 * np.pi * day / 365.25)
    noise = rng.normal(0, 1.0, (T + 14, C)).astype(np.float32)
    sm = np.stack([noise[k:k + T] for k in range(15)]).mean(0)
    return (base + 2.5 * sm).astype(np.float32)


def test_pallas_clim_compiled_vs_f64_oracle():
    """Compiled fused window-percentile kernel vs the independent numpy
    float64 oracle (radix-select + exact int32 rank arithmetic on chip)."""
    import jax.numpy as jnp
    from oracle import clim_oracle

    from xmhw_tpu.core.calendar import build_window_ranges, compute_doy
    from xmhw_tpu.core.pipeline import _pallas_clim_block
    from xmhw_tpu.xrlite import TimeIndex

    t = np.arange("2001-01-01", "2005-01-01",
                  dtype="datetime64[D]").astype("datetime64[ns]")
    T = len(t)
    doy, ndoy = compute_doy(TimeIndex(t))
    starts, lens, ny, rmax = build_window_ranges(doy, 5, ndoy)
    C = 128
    ts = _series(T, C)
    ts[100:140, 7] = np.nan  # missing chunk
    ts[:, 3] = np.nan        # land cell
    ts_p = np.pad(ts, ((0, rmax), (0, 0)), constant_values=np.nan)

    # full shipped pipeline: pool kernel + feb29 patch + 31-day smoothing
    th, se = _pallas_clim_block(
        jnp.asarray(ts_p), jnp.asarray(starts.reshape(-1)),
        jnp.asarray(lens.reshape(-1)), ndoy=ndoy, ny=ny, rmax=rmax,
        pctile=90, smooth=True, smooth_w=31, patch_feb29=True)
    th, se = np.asarray(th), np.asarray(se)
    assert np.isnan(th[:, 3]).all() and np.isnan(se[:, 3]).all()

    ts64 = ts.astype(np.float64)
    for c in (0, 3, 7, 42, C - 1):
        th64, se64 = clim_oracle(ts64[:, c], doy, ndoy, w=5, pctile=90,
                                 smooth=True, smooth_w=31)
        np.testing.assert_array_equal(np.isnan(th[:, c]), np.isnan(th64))
        fin = np.isfinite(th64)
        if fin.any():
            assert np.max(np.abs(th[fin, c] - th64[fin])) < 2e-3
            assert np.max(np.abs(se[fin, c] - se64[fin])) < 2e-3


def test_detect_scan_compiled_accuracy_full_length():
    """Compiled one-pass detect scans at T=14610 vs the float64 oracle:
    the f32-vs-f64 accuracy check that STATUS r1 only recorded manually.
    The Kahan-compensated prefix carry must keep event statistics
    (including near-zero variances) within f32 tolerance of the truth."""
    import jax.numpy as jnp
    from oracle import clim_oracle, events_oracle

    from xmhw_tpu.core.calendar import compute_doy
    from xmhw_tpu.core.features_scan import detect_kernel
    from xmhw_tpu.xrlite import TimeIndex

    t = np.arange("1982-01-01", "2022-01-01",
                  dtype="datetime64[D]").astype("datetime64[ns]")
    T = len(t)
    doy, ndoy = compute_doy(TimeIndex(t))
    C = 16
    ts = _series(T, C, seed=3)
    ts64 = ts.astype(np.float64)
    th64 = np.empty((ndoy, C))
    se64 = np.empty((ndoy, C))
    for c in range(C):
        th64[:, c], se64[:, c] = clim_oracle(ts64[:, c], doy, ndoy, w=5,
                                             pctile=90, smooth=True,
                                             smooth_w=31)
    doy_pos = (doy - 1).astype(np.int32)
    th_t = th64[doy_pos]
    se_t = se64[doy_pos]

    # pad cells to a 128-lane tile for the Pallas scan path
    Cp = 128
    pad = ((0, 0), (0, Cp - C))
    tbl, nev, _ = detect_kernel(
        jnp.asarray(np.pad(ts, pad, constant_values=np.nan)),
        jnp.asarray(np.pad(th64.astype(np.float32), pad,
                           constant_values=np.nan)),
        jnp.asarray(np.pad(se64.astype(np.float32), pad,
                           constant_values=np.nan)),
        jnp.asarray(doy_pos), K=256, use_pallas_scan=True)
    tbl = {k: np.asarray(v) for k, v in tbl.items()}
    nev = np.asarray(nev)

    checked = 0
    for c in range(C):
        evs = events_oracle(ts64[:, c], th_t[:, c], se_t[:, c])
        assert nev[c] == len(evs), f"cell {c}: {nev[c]} vs {len(evs)}"
        for k, ev in enumerate(evs):
            assert tbl["event"][k, c] == ev["event"]
            assert tbl["duration"][k, c] == ev["duration"]
            for prop, tol in (("intensity_max", 1e-3),
                              ("intensity_mean", 1e-3),
                              ("intensity_cumulative", 5e-3),
                              ("severity_var", 5e-3),
                              ("rate_onset", 2e-3),
                              ("rate_decline", 2e-3)):
                a, b = tbl[prop][k, c], ev[prop]
                if np.isnan(b):
                    assert np.isnan(a), (prop, k, c)
                else:
                    assert abs(a - b) <= tol + 1e-3 * abs(b), (
                        prop, k, c, a, b)
            checked += 1
    assert checked > 100  # the grid must actually contain events


def test_fused_step_runs_compiled():
    """The flagship fused threshold+detect step (bench/dryrun path)
    compiles and runs on the chip with finite outputs."""
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    th = np.asarray(out[0])
    assert np.isfinite(th).any()
    assert int(np.asarray(out[4]).sum()) >= 0
