"""Time the Pallas climatology kernel alone on the real chip.

The clim kernel is the largest single device item of the fused step
(18.0 ms in the round-4 trace, VPU radix bound). This times
_pallas_clim_block standalone — N calls batched in ONE jit via
lax.fori_loop rotating 2 staged inputs (loop-invariant bodies get
hoisted), one scalar fetched — for a list of G batch sizes, to measure
radix-loop changes (e.g. the round-5 common-prefix skip) without the
detect step's noise.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/clim_tune.py [G ...]
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
    from xmhw_tpu.core.pipeline import _pallas_clim_block
    from xmhw_tpu.xrlite import TimeIndex

    t = np.arange("1982-01-01", "2022-01-01",
                  dtype="datetime64[D]").astype("datetime64[ns]")
    T = len(t)
    doy, ndoy = compute_doy(TimeIndex(t))
    starts_np, lens_np, ny, rmax = build_window_ranges(doy, 5, ndoy)
    C, N = 4096, 10
    starts = jnp.asarray(starts_np.reshape(-1))
    lens = jnp.asarray(lens_np.reshape(-1))

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

    def timed(batch):
        @jax.jit
        def loop(a, b):
            def body(i, acc):
                cur = lax.cond(i % 2 == 0, lambda: a, lambda: b)
                th, se = _pallas_clim_block(
                    cur, starts, lens, ndoy=ndoy, ny=ny, rmax=rmax,
                    pctile=90, smooth=True, smooth_w=31,
                    patch_feb29=True, batch=batch)
                return (acc + jnp.nansum(th) + jnp.nansum(se))
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

    batches = [int(a) for a in sys.argv[1:]] or [8]
    for b in batches:
        ms, dig = timed(b)
        print(f"batch={b:3d}  {ms:7.2f} ms/call  digest={dig:.6g}",
              flush=True)


if __name__ == "__main__":
    main()
