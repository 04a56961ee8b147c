"""Sweep the detect-step gather knobs on the real chip.

Two statics shape the 28 ms of gather/layout glue in the fused step
(round-5 trace): TBK (the two-level counting block: the block gather
fetches (K, TBK, 2, C) = 536 MB at TBK=128) and GRP (rows per
boundary-gather index on the folded scan output). This times
detect_kernel alone for a grid of (tbk, grp), N calls batched in ONE
jit via lax.fori_loop rotating 2 staged inputs (loop-invariant bodies
get hoisted), one scalar fetched.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/gather_tune.py
"""
import os
import sys
import time

os.environ.setdefault("AXON_JOURNAL_COMPACT", "1")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from xmhw_tpu.core.calendar import build_window_ranges, compute_doy
    from xmhw_tpu.core.features_scan import detect_kernel
    from xmhw_tpu.core.pipeline import _pallas_clim_block
    from xmhw_tpu.xrlite import TimeIndex

    t = np.arange("1982-01-01", "2022-01-01",
                  dtype="datetime64[D]").astype("datetime64[ns]")
    T = len(t)
    doy, ndoy = compute_doy(TimeIndex(t))
    starts_np, lens_np, ny, rmax = build_window_ranges(doy, 5, ndoy)
    C, K, N = 4096, 128, 10
    starts = jnp.asarray(starts_np.reshape(-1))
    lens = jnp.asarray(lens_np.reshape(-1))
    doy_pos = jnp.asarray((doy - 1).astype(np.int32))

    @jax.jit
    def gen(key):
        day = jnp.arange(T, dtype=jnp.float32)[:, None]
        base = 15 + 3 * jnp.sin(2 * jnp.pi * day / 365.25)
        noise = jax.random.normal(key, (T, C), jnp.float32)
        sm = sum(jnp.roll(noise, k, 0) for k in range(-7, 8)) / 15.0
        return jnp.pad(base + 2.5 * sm, ((0, rmax), (0, 0)),
                       constant_values=jnp.nan)

    ts0 = gen(jax.random.PRNGKey(0))
    ts1 = gen(jax.random.PRNGKey(1))
    th, se = jax.jit(lambda x: _pallas_clim_block(
        x, starts, lens, ndoy=ndoy, ny=ny, rmax=rmax, pctile=90,
        smooth=True, smooth_w=31, patch_feb29=True))(ts0)
    ts0, ts1 = ts0[:T], ts1[:T]
    _ = float(jnp.sum(th))

    def timed(tbk, grp, cnt_ct=True):
        @jax.jit
        def loop(a, b):
            def body(i, acc):
                # rotate two staged inputs so the body depends on i
                # (a loop-invariant body would be hoisted by XLA)
                cur = lax.cond(i % 2 == 0, lambda: a, lambda: b)
                table, nev, _ = detect_kernel(
                    cur, th, se, doy_pos, K=K, use_pallas_scan=True,
                    tbk=tbk, grp=grp, cnt_ct=cnt_ct)
                dig = sum(jnp.nansum(v.astype(jnp.float32))
                          for v in table.values())
                return acc + dig + jnp.sum(nev).astype(jnp.float32)
            return lax.fori_loop(0, N, body, jnp.float32(0.0))

        r = float(loop(ts0, ts1))  # compile + warm + fetch
        for _ in range(2):  # clock ramp
            r = float(loop(ts0, ts1))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = float(loop(ts0, ts1))
            best = min(best, (time.perf_counter() - t0) / N)
        return best * 1e3, r

    grid = [(128, 4, 1), (128, 4, 0), (64, 4, 1), (256, 4, 1)]
    if len(sys.argv) > 1:
        grid = [tuple(map(int, g.split(","))) for g in sys.argv[1:]]
    results = {}
    for cfg in grid:
        tbk, grp = cfg[0], cfg[1]
        cnt_ct = bool(cfg[2]) if len(cfg) > 2 else True
        ms, dig = timed(tbk, grp, cnt_ct)
        results[(tbk, grp, cnt_ct)] = ms
        print(f"tbk={tbk:4d} grp={grp} cnt_ct={int(cnt_ct)}  "
              f"{ms:7.2f} ms/call  digest={dig:.6g}", flush=True)
    base = next(iter(results.values()), None)
    if base:
        for k, v in sorted(results.items(), key=lambda kv: kv[1]):
            print(f"  {k}: {v:.2f} ms ({v / base * 100:.0f}% of baseline)")


if __name__ == "__main__":
    main()
