#!/usr/bin/env python
"""Benchmark suite: the five BASELINE.md configs on the real TPU chip.

Headline metric (stdout JSON line, driver contract): grid-cells/sec per
chip for the fused threshold+detect step at GLOBAL scale — every block
of a 620k-ocean-cell x 40-year grid is actually executed on the chip
(not extrapolated from a few blocks). vs_baseline compares against the
driver-set north star: global 0.25-degree OISST in <60 s on a v5e-8,
i.e. 620000/60/8 ~= 1292 cells/s/chip = 1.0.

The full config suite (BASELINE.md "configs to implement") is embedded
in the JSON line under detail.configs and traced on stderr:

  1 single_point      ~30-yr series through the public API (host incl.)
  2 tasman_regional   50x50 grid, 30% land NaNs, skipna on/off, union
                      assembly included (user-visible end-to-end)
  3 global_fused      device-resident fused kernel over all 152 blocks
  4 monthly_tstep     non-daily tstep path through the public API
  5 stats_pipeline    detect(compact) + block_average(device) + mhw_rank

Synthetic global data is generated on-device (seasonal cycle +
AR-smoothed noise): the axon harness tunnel moves host<->device data at
~12 MB/s, which would measure the tunnel, not the framework. The
regional configs DO go through the public host API and report their
upload share separately.
"""

import json
import os
import sys
import time

import numpy as np

FAST = bool(os.environ.get("XMHW_BENCH_FAST"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _host_series(T, ny, nx, land_frac=0.3, seed=1):
    rng = np.random.default_rng(seed)
    day = np.arange(T, dtype=np.float32)[:, None, None]
    base = 15 + 3 * np.sin(2 * np.pi * day / 365.25)
    noise = rng.normal(0, 1.0, (T + 14, ny, nx)).astype(np.float32)
    sm = np.stack([noise[k:k + T] for k in range(15)]).mean(0)
    ts = (base + 2.5 * sm).astype(np.float32)
    land = rng.random((ny, nx)) < land_frac
    ts[:, land] = np.nan
    return ts


def _dataarray(ts, t):
    from xmhw_tpu.xrlite import Coord, DataArray

    ny, nx = ts.shape[1:]
    return DataArray(
        ts, ("time", "lat", "lon"),
        {"time": Coord(("time",), t),
         "lat": Coord(("lat",), np.linspace(-45, -33, ny)),
         "lon": Coord(("lon",), np.linspace(147, 159, nx))},
        {"units": "degree_C"})


def bench_global_fused():
    """Config 3: fused threshold+detect over a full global grid's worth
    of device-resident blocks (620k ocean cells, 40 years)."""
    import jax
    import jax.numpy as jnp

    from xmhw_tpu.core.calendar import build_window_ranges, compute_doy
    from xmhw_tpu.core.features_scan import detect_kernel
    from xmhw_tpu.core.pipeline import _pallas_clim_block
    from xmhw_tpu.xrlite import TimeIndex

    t = np.arange("1982-01-01", "2022-01-01",
                  dtype="datetime64[D]").astype("datetime64[ns]")
    T = len(t)
    doy, ndoy = compute_doy(TimeIndex(t))
    starts_np, lens_np, ny, rmax = build_window_ranges(doy, 5, ndoy)
    C = 256 if FAST else 4096
    K = 128
    GLOBAL_CELLS = 620_000
    n_blocks = 2 if FAST else -(-GLOBAL_CELLS // C)  # 152

    starts = jnp.asarray(starts_np.reshape(-1))
    lens = jnp.asarray(lens_np.reshape(-1))
    doy_pos = jnp.asarray((doy - 1).astype(np.int32))
    use_pallas = jax.default_backend() != "cpu"

    if not use_pallas:  # CPU smoke path: XLA kernels (interpret-mode
        # Pallas at full length would take hours off-chip)
        from xmhw_tpu.core.calendar import build_window_index
        from xmhw_tpu.core.clim import clim_kernel

        gidx_np, _ = build_window_index(doy, 5, ndoy)
        gidx = jnp.asarray(gidx_np)

    @jax.jit
    def gen(key):
        day = jnp.arange(T, dtype=jnp.float32)[:, None]
        base = 15 + 3 * jnp.sin(2 * jnp.pi * day / 365.25)
        noise = jax.random.normal(key, (T, C), jnp.float32)
        sm = sum(jnp.roll(noise, k, 0) for k in range(-7, 8)) / 15.0
        return jnp.pad(base + 2.5 * sm, ((0, rmax), (0, 0)),
                       constant_values=jnp.nan)

    def _core(ts_p):
        if use_pallas:
            th, se = _pallas_clim_block(
                ts_p, starts, lens, ndoy=ndoy, ny=ny, rmax=rmax,
                pctile=90, smooth=True, smooth_w=31, patch_feb29=True)
        else:
            th, se = clim_kernel(ts_p[:T], gidx)
        return detect_kernel(ts_p[:T], th, se, doy_pos, K=K,
                             use_pallas_scan=use_pallas)

    @jax.jit
    def step(ts_p):
        table, nev, _ = _core(ts_p)
        digest = jnp.stack(
            [jnp.nansum(v.astype(jnp.float32)) for v in table.values()])
        return digest, jnp.sum(nev)

    # BASELINE config 5 at global scale: the full device-resident stats
    # pipeline chained on the fused step — year-block aggregations
    # (block_average device kernel) + ordinal ranks/return periods for
    # every ranked property, nothing leaving the chip but a digest
    from xmhw_tpu.core.stats import (EVENT_VARS, binned_event_stats,
                                     rank_events_desc)

    year_of = jnp.asarray(
        (t.astype("datetime64[Y]").astype(np.int64)
         - t[0].astype("datetime64[Y]").astype(np.int64)).astype(np.int32))
    n_years = int(np.asarray(year_of).max()) + 1

    @jax.jit
    def step_stats(ts_p):
        table, nev, _ = _core(ts_p)
        tstart = table["time_start"]
        valid = tstart >= 0
        bins = year_of[jnp.clip(tstart, 0, T - 1)]
        vals = jnp.stack([table[k].astype(jnp.float32)
                          for k in EVENT_VARS])
        blk = binned_event_stats(vals, bins, valid, nbins=n_years)
        ranks = {k: rank_events_desc(table[k].astype(jnp.float32), valid)
                 for k in ("intensity_max", "duration",
                           "intensity_cumulative", "severity_mean",
                           "rate_onset")}
        digest = (jnp.stack([jnp.nansum(v) for v in blk.values()]).sum()
                  + jnp.stack([jnp.nansum((n_years + 1.0) / r)
                               for r in ranks.values()]).sum())
        return digest, jnp.sum(nev)

    # Pre-stage a handful of distinct device-resident input blocks and
    # round-robin the timed steps over them: the synthetic generator
    # (random normal + 15-day smoothing, ~70 ms/block) is test harness,
    # not framework, so it stays OUTSIDE the timed region. 152 blocks of
    # (T, 4096) f32 would need ~36 GB HBM, hence the rotation.
    ngen = min(4, n_blocks)
    keys = jax.random.split(jax.random.PRNGKey(0), ngen + 1)
    staged = [gen(k) for k in keys[:ngen]]
    # warmup: compile, then a few untimed steps — the first post-compile
    # executions run up to ~2x slow while the chip ramps clocks
    digest, nev = step(staged[-1])
    assert np.isfinite(np.asarray(digest)).all()
    warm_events = int(nev)
    ramp = [step(staged[i % ngen]) for i in range(4)]
    _ = np.asarray(jnp.stack([d for d, _ in ramp]).sum(axis=0))

    t0 = time.perf_counter()
    outs = [step(staged[i % ngen]) for i in range(n_blocks)]
    # one device-side reduction + two host fetches (D2H through the
    # tunnel is ~12 MB/s with ~100 ms RTT; per-block scalar fetches
    # would measure the tunnel, not the chip)
    total_events = int(np.asarray(
        jnp.stack([n for _, n in outs]).sum()))
    _ = np.asarray(jnp.stack([d for d, _ in outs]).sum(axis=0))
    dt = time.perf_counter() - t0

    # stats pipeline at global scale (device-resident end to end)
    ds0, _ = step_stats(staged[-1])
    assert np.isfinite(float(np.asarray(ds0)))
    t1 = time.perf_counter()
    souts = [step_stats(staged[i % ngen]) for i in range(n_blocks)]
    _ = np.asarray(jnp.stack([d for d, _ in souts]).sum())
    dstats = time.perf_counter() - t1

    cells = n_blocks * C
    rate = cells / dt
    return {
        "name": "global_fused",
        "cells_per_sec_per_chip": round(rate, 1),
        "wall_s": round(dt, 3),
        "cells": cells,
        "T_days": T,
        "events": total_events,
        "warmup_events": warm_events,
        "global_oisst_1chip_s": round(GLOBAL_CELLS / rate, 1),
        "global_oisst_8chip_s": round(GLOBAL_CELLS / (rate * 8), 1),
        "with_stats_rank_wall_s": round(dstats, 3),
        "with_stats_rank_cells_per_sec": round(cells / dstats, 1),
    }, rate


def bench_point():
    """Config 1: single point, ~30-yr daily series, public API."""
    import xmhw_tpu as xm

    t = np.arange("1992-01-01", "2022-01-01",
                  dtype="datetime64[D]").astype("datetime64[ns]")
    T = len(t)
    ts = _host_series(T, 1, 1, land_frac=0.0)[:, 0, 0]
    da = _dataarray(ts[:, None, None], t).isel(lat=0, lon=0)

    t0 = time.perf_counter()
    clim = xm.threshold(da)
    mhw = xm.detect(da, clim["thresh"], clim["seas"])
    t1 = time.perf_counter()
    clim = xm.threshold(da)
    mhw = xm.detect(da, clim["thresh"], clim["seas"])
    t2 = time.perf_counter()
    return {
        "name": "single_point",
        "cold_s": round(t1 - t0, 3),  # incl. device acquisition + compile
        "warm_s": round(t2 - t1, 3),
        "T_days": T,
        "events": int(np.isfinite(mhw["event"].data).sum()),
    }


def bench_regional(years=None):
    """Config 2: Tasman-Sea-style 50x50 grid with land NaNs through the
    full public API (threshold + detect, union layout, host assembly
    included), skipna on and off."""
    import xmhw_tpu as xm

    years = years or (3 if FAST else 40)
    t = np.arange(f"{2022 - years}-01-01", "2022-01-01",
                  dtype="datetime64[D]").astype("datetime64[ns]")
    T = len(t)
    ny = nx = 16 if FAST else 50
    ts = _host_series(T, ny, nx)
    da = _dataarray(ts, t)
    ocean = int((~np.isnan(ts).all(axis=0)).sum())

    out = {"name": "tasman_regional", "T_days": T, "grid": f"{ny}x{nx}",
           "ocean_cells": ocean}
    for skipna in (False, True):
        key = "skipna_true" if skipna else "skipna_false"
        rec = {}
        clim = mhw = None
        for phase in ("cold", "warm"):  # cold = remote compiles included
            del clim, mhw  # return the grids to the allocation pool
            t0 = time.perf_counter()
            clim = xm.threshold(da, skipna=skipna)
            t1 = time.perf_counter()
            mhw = xm.detect(da, clim["thresh"], clim["seas"])
            t2 = time.perf_counter()
            rec[f"threshold_{phase}_s"] = round(t1 - t0, 3)
            rec[f"detect_{phase}_s"] = round(t2 - t1, 3)
            rec[f"end_to_end_{phase}_s"] = round(t2 - t0, 3)
        rec["cells_per_sec"] = round(
            ocean / rec["end_to_end_warm_s"], 1)
        rec["events"] = int(np.isfinite(mhw["event"].data).sum())
        out[key] = rec
    return out


def bench_monthly():
    """Config 4: non-daily (monthly) tstep path through the public API."""
    import xmhw_tpu as xm
    from xmhw_tpu.xrlite import Coord, DataArray

    years = 3 if FAST else 40
    months = years * 12
    t = np.array([np.datetime64(f"{1982 + m // 12:04d}-"
                                f"{m % 12 + 1:02d}-15", "ns")
                  for m in range(months)])
    ny = nx = 16 if FAST else 50
    rng = np.random.default_rng(2)
    mon = np.arange(months, dtype=np.float32)[:, None, None]
    ts = (15 + 3 * np.sin(2 * np.pi * mon / 12)
          + rng.normal(0, 1.0, (months, ny, nx))).astype(np.float32)
    ts[:, rng.random((ny, nx)) < 0.3] = np.nan
    da = DataArray(
        ts, ("time", "lat", "lon"),
        {"time": Coord(("time",), t),
         "lat": Coord(("lat",), np.arange(ny, dtype=float)),
         "lon": Coord(("lon",), np.arange(nx, dtype=float))})
    ocean = int((~np.isnan(ts).all(axis=0)).sum())

    t0 = time.perf_counter()
    clim = xm.threshold(da, tstep=True)
    mhw = xm.detect(da, clim["thresh"], clim["seas"], tstep=True,
                    minDuration=3, maxGap=1)
    t1 = time.perf_counter()
    clim = xm.threshold(da, tstep=True)
    mhw = xm.detect(da, clim["thresh"], clim["seas"], tstep=True,
                    minDuration=3, maxGap=1)
    t2 = time.perf_counter()
    dt = t2 - t1
    return {
        "name": "monthly_tstep",
        "cold_s": round(t1 - t0, 3),
        "wall_s": round(dt, 3),
        "steps": months,
        "ocean_cells": ocean,
        "events": int(np.isfinite(mhw["event"].data).sum()),
    }


def bench_stats():
    """Config 5: full stats pipeline — threshold + detect (compact
    layout) + block_average(device) + mhw_rank."""
    import xmhw_tpu as xm

    years = 3 if FAST else 40
    t = np.arange(f"{2022 - years}-01-01", "2022-01-01",
                  dtype="datetime64[D]").astype("datetime64[ns]")
    T = len(t)
    ny = nx = 16 if FAST else 50
    ts = _host_series(T, ny, nx, seed=5)
    da = _dataarray(ts, t)
    ocean = int((~np.isnan(ts).all(axis=0)).sum())

    t0 = time.perf_counter()
    clim = xm.threshold(da)
    mhw = xm.detect(da, clim["thresh"], clim["seas"],
                    events_layout="compact")
    t1 = time.perf_counter()
    block = xm.block_average(mhw, period=[2022 - years, 2021],
                             device=True)
    rank, ret = xm.mhw_rank(mhw)
    t2 = time.perf_counter()
    block = xm.block_average(mhw, period=[2022 - years, 2021],
                             device=True)
    rank, ret = xm.mhw_rank(mhw)
    t3 = time.perf_counter()
    warm_total = (t1 - t0) + (t3 - t2)
    return {
        "name": "stats_pipeline",
        "threshold_detect_s": round(t1 - t0, 3),
        "stats_cold_s": round(t2 - t1, 3),
        "stats_warm_s": round(t3 - t2, 3),
        "end_to_end_s": round(warm_total, 3),
        "cells_per_sec": round(ocean / warm_total, 1),
        "ocean_cells": ocean,
        "block_vars": len(list(block.keys())),
        "ranked_vars": len(list(rank.keys())),
    }


def main():
    # Persistent compilation cache: cold-start numbers here include
    # remote-helper compiles (~0.5-60 s each); caching executables on
    # disk makes repeat runs reflect the framework, not the compiler.
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_xmhw"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception as e:
        log(f"[bench] compilation cache unavailable: {e}")

    # acquire the device up front (single-holder TPU lock on this
    # harness takes up to ~4 min, silently) so the first config's cold
    # number measures compiles, not acquisition
    t0 = time.perf_counter()
    try:
        import jax
        import jax.numpy as jnp

        float(jnp.zeros(()).sum())
        log(f"[bench] device acquired in {time.perf_counter() - t0:.1f}s"
            f" ({jax.devices()[0].platform})")
    except Exception as e:
        log(f"[bench] device acquisition failed: {e}")

    configs = {}
    rate = None
    for fn in (bench_point, bench_regional, bench_monthly, bench_stats,
               bench_global_fused):
        name = fn.__name__
        log(f"[bench] running {name} ...")
        t0 = time.perf_counter()
        try:
            res = fn()
            if isinstance(res, tuple):
                res, rate = res
            configs[res.pop("name")] = res
            log(f"[bench] {name} done in "
                f"{time.perf_counter() - t0:.1f}s: {res}")
        except Exception as e:  # record, keep the suite alive
            configs[name] = {"error": f"{type(e).__name__}: {e}"}
            log(f"[bench] {name} FAILED: {e}")

    baseline_rate = 620000 / 60 / 8  # cells/s/chip for the <60s target
    rate = rate or 0.0
    print(json.dumps({
        "metric": "threshold_detect_cells_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "cells/s",
        "vs_baseline": round(rate / baseline_rate, 2),
        "detail": {"configs": configs},
    }))


if __name__ == "__main__":
    main()
