"""Host <-> device orchestration: cell blocking, sharding, K selection.

Replaces the reference's dask.delayed graph build + ``dask.compute``
scheduler boundary (reference: xmhw/xmhw.py:182-197, 440-454) with a simple
deterministic loop: cells are processed in fixed-size blocks (static shapes
-> one XLA compilation), each block optionally sharded over a device mesh.
Blocking bounds HBM use for planet-scale grids — the analogue of the
reference's documented manual grid splitting (reference: docs/dask.rst:44-86)
but automatic and without task-graph overhead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import cell_mesh, cell_sharding, pad_cells, replicated
from .clim import clim_kernel
from .events import mhw_filter
from .features_scan import detect_kernel


def _auto_block(T: int, Z: int, ndoy: int, n_dev: int,
                budget_bytes: float = 6e9) -> int:
    """Pick a cell-block size so peak HBM fits the budget.

    Measured on v5e: throughput saturates near 4096 cells/block (smaller
    blocks are launch-overhead bound, 2x smaller blocks ran 4x slower);
    the climatology gather holds ~2 (ndoy, Z, B) buffers and the detect
    kernel ~25 live (T, B) arrays.
    """
    per_cell = max(2 * ndoy * Z * 4, 25 * T * 4)
    b = int(budget_bytes / max(per_cell, 1))
    b = max(128, min(b, 1 << 16))
    # round down to a power of two for stable compilation shapes
    b = 1 << (b.bit_length() - 1)
    return max(b, n_dev) if n_dev > 1 else b


class CellRunner:
    """Runs a jitted kernel over (time, cell) data in padded cell blocks."""

    def __init__(self, n_cells: int, T: int, Z: int = 1, ndoy: int = 366,
                 block: int | None = None, mesh=None, use_mesh: bool = True):
        self.mesh = mesh
        if mesh is None and use_mesh and len(jax.devices()) > 1:
            self.mesh = cell_mesh()
        n_dev = len(self.mesh.devices.flat) if self.mesh else 1
        self.block = block or _auto_block(T, Z, ndoy, n_dev)
        if self.mesh and self.block % n_dev:
            self.block = -(-self.block // n_dev) * n_dev
        # when the grid is smaller than the block, shrink — but only to
        # a COARSE quantum (1024 cells): streamed pipelines feed stripes
        # whose ocean-cell counts all differ, and a per-stripe block
        # shape would compile a fresh kernel variant per stripe (each a
        # multi-second remote compile on the bench harness). NaN padding
        # is dropped on output, so over-padding costs only bandwidth.
        q = 1024 * max(n_dev, 1) if n_cells > 1024 else max(n_dev, 1)
        self.block = min(self.block, max(n_dev, -(-n_cells // q) * q))
        self.n_cells = n_cells

    def device_block(self, arr_np: np.ndarray, lo: int) -> jax.Array:
        """Slice cells [lo, lo+block), pad with NaN, ship to device(s)."""
        blk = arr_np[..., lo:lo + self.block]
        blk, _ = pad_cells(blk, self.block)
        x = jnp.asarray(blk)
        if self.mesh:
            x = jax.device_put(x, cell_sharding(self.mesh, x.ndim))
        return x

    def device_replicated(self, arr_np: np.ndarray) -> jax.Array:
        x = jnp.asarray(arr_np)
        if self.mesh:
            x = jax.device_put(x, replicated(self.mesh))
        return x

    def blocks(self):
        return range(0, self.n_cells, self.block)


def _use_pallas_clim(dtype, override):
    if override is not None:
        return override
    return dtype == np.float32 and jax.default_backend() != "cpu"


@functools.partial(
    jax.jit,
    static_argnames=("ndoy", "ny", "rmax", "pctile", "smooth", "smooth_w",
                     "patch_feb29", "interpret"),
)
def _pallas_clim_block(ts_p, starts, lens, ndoy, ny, rmax, pctile, smooth,
                       smooth_w, patch_feb29, interpret=False):
    from ..ops.pallas.doy_quantile import pallas_doy_clim
    from .clim import feb29_patch, runavg_circular

    th, se = pallas_doy_clim(ts_p, starts, lens, ndoy=ndoy, ny=ny,
                             rmax=rmax, pctile=pctile,
                             interpret=interpret)
    if patch_feb29:
        th = feb29_patch(th)
        se = feb29_patch(se)
    if smooth:
        th = runavg_circular(th, smooth_w)
        se = runavg_circular(se, smooth_w)
    return th, se


def run_clim(ts_np: np.ndarray, doy_np: np.ndarray, w: int, ndoy: int,
             pctile: int, smooth: bool, smooth_w: int, patch_feb29: bool,
             block: int | None = None, mesh=None, use_pallas=None,
             pallas_interpret=False):
    """Climatology for all cells: (T, C) -> (thresh, seas) as (ndoy, C).

    TPU-native calc_clim (reference: xmhw/xmhw.py:250-307) over cell
    blocks. float32 on an accelerator uses the fused Pallas kernel
    (ops/pallas/doy_quantile.py, ~2.3x the XLA path); float64/CPU uses
    the XLA path (comparator sort for exact reference parity).
    """
    from .calendar import build_window_index, build_window_ranges

    T, C = ts_np.shape
    pallas = _use_pallas_clim(ts_np.dtype, use_pallas)
    out_t = np.empty((ndoy, C), ts_np.dtype)
    out_s = np.empty((ndoy, C), ts_np.dtype)

    if pallas:
        starts_np, lens_np, ny, rmax = build_window_ranges(doy_np, w, ndoy)
        runner = CellRunner(C, T, 2 * w + 1, ndoy, block=block, mesh=mesh)
        # each device shard feeds the kernel whole 128-lane tiles
        n_dev = len(runner.mesh.devices.flat) if runner.mesh else 1
        quantum = 128 * n_dev
        if runner.block % quantum:
            runner.block = -(-runner.block // quantum) * quantum
        ts_pad = np.pad(ts_np, ((0, rmax), (0, 0)),
                        constant_values=np.nan)
        starts = runner.device_replicated(starts_np.reshape(-1))
        lens = runner.device_replicated(lens_np.reshape(-1))

        fn = functools.partial(
            _pallas_clim_block, ndoy=ndoy, ny=ny, rmax=rmax,
            pctile=pctile, smooth=smooth, smooth_w=smooth_w,
            patch_feb29=patch_feb29, interpret=pallas_interpret)
        if runner.mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from ..parallel.mesh import CELL_AXIS

            fn = jax.jit(shard_map(
                fn, mesh=runner.mesh,
                in_specs=(P(None, CELL_AXIS), P(), P()),
                out_specs=(P(None, CELL_AXIS), P(None, CELL_AXIS)),
                check_vma=False))
        for lo in runner.blocks():
            ts = runner.device_block(ts_pad, lo)
            th, se = fn(ts, starts, lens)
            hi = min(lo + runner.block, C)
            out_t[:, lo:hi] = np.asarray(th)[:, : hi - lo]
            out_s[:, lo:hi] = np.asarray(se)[:, : hi - lo]
        return out_t, out_s

    gidx_np, Z = build_window_index(doy_np, w, ndoy)
    runner = CellRunner(C, T, Z, ndoy, block=block, mesh=mesh)
    gidx = runner.device_replicated(gidx_np)
    for lo in runner.blocks():
        ts = runner.device_block(ts_np, lo)
        th, se = clim_kernel(ts, gidx, pctile=pctile, smooth=smooth,
                             smooth_w=smooth_w, patch_feb29=patch_feb29)
        hi = min(lo + runner.block, C)
        out_t[:, lo:hi] = np.asarray(th)[:, : hi - lo]
        out_s[:, lo:hi] = np.asarray(se)[:, : hi - lo]
    return out_t, out_s


@functools.partial(
    jax.jit,
    static_argnames=("pctile", "smooth", "smooth_w", "patch_feb29", "K",
                     "min_duration", "join_gaps", "max_gap"),
)
def fused_threshold_detect(ts, gidx, doy_pos, pctile=90, smooth=True,
                           smooth_w=31, patch_feb29=True, K=64,
                           min_duration=5, join_gaps=True, max_gap=2):
    """threshold() + detect() as ONE fused XLA program for a cell block.

    The climatology never leaves the device: the percentile/mean feed the
    detection gather directly. This is the flagship compute step used by
    the benchmark and the multi-chip dry run; sharding the trailing cell
    axis over a mesh parallelizes it with zero collectives.
    """
    th, se = clim_kernel(ts, gidx, pctile=pctile, smooth=smooth,
                         smooth_w=smooth_w, patch_feb29=patch_feb29)
    table, n_events, _ = detect_kernel(
        ts, th, se, doy_pos, K=K, min_duration=min_duration,
        join_gaps=join_gaps, max_gap=max_gap, intermediate=False)
    return th, se, table, n_events


@functools.partial(
    jax.jit, static_argnames=("min_duration", "join_gaps", "max_gap",
                              "day0_fillna_quirk"))
def _count_kernel(ts, th, pos, min_duration, join_gaps, max_gap,
                  day0_fillna_quirk=False):
    """Cheap counting pass: events per cell (fixes K before the feature
    pass). Module-level jit so repeated detect() calls reuse the
    compilation."""
    return mhw_filter(ts > th[pos], min_duration=min_duration,
                      join_gaps=join_gaps, max_gap=max_gap,
                      day0_fillna_quirk=day0_fillna_quirk)["n_events"]


def _round_k(k: int) -> int:
    """Round event capacity up to limit recompilation (32, then pow2)."""
    k = max(k, 1)
    if k <= 32:
        return 32
    return 1 << (k - 1).bit_length()


@functools.lru_cache(maxsize=None)
def _sharded_detect_kernel(mesh, **static_kw):
    """detect_kernel wrapped in shard_map for the Pallas-scan branch.

    The XLA branch auto-partitions under NamedSharding inputs with zero
    collectives, but pallas_call needs an explicit shard_map so each
    device runs the kernel on its local cell shard (same pattern as
    run_clim's climatology kernel). Cached per (mesh, statics) so the
    per-block loop in run_detect reuses ONE wrapper (and its trace)
    instead of rebuilding it every block."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import CELL_AXIS

    fn = functools.partial(detect_kernel, **static_kw)
    cells2d = P(None, CELL_AXIS)
    return jax.jit(shard_map(
        fn, mesh=mesh,
        in_specs=(cells2d, cells2d, cells2d, P()),
        # (table dict, n_events, inter dict) — specs are tree prefixes
        out_specs=(cells2d, P(CELL_AXIS), cells2d),
        check_vma=False))


def run_detect(ts_np, th_np, se_np, doy_pos_np, min_duration, join_gaps,
               max_gap, intermediate=False, block=None, mesh=None,
               k_cap=None, day0_fillna_quirk=False, use_pallas=None,
               pallas_interpret=False, k_min=None):
    """Detection for all cells: returns (tables dict of (K, C) numpy,
    n_events (C,), inter dict of (T, C) numpy).

    ``th_np``/``se_np`` are (D, C) doy climatologies; ``doy_pos_np`` (T,)
    maps timesteps to climatology rows (broadcast happens on device).

    Each cell block is uploaded ONCE and stays device-resident; H2D
    traffic is one ts/th/se transfer per block. The event-table capacity
    K is fixed by a cheap counting pass on the FIRST block only; later
    blocks run the feature pass optimistically and retry with a larger K
    when the raw per-cell counts (returned by detect_kernel even beyond
    K) overflow the table — in the common case that saves one full
    mhw_filter pass per block. K values are rounded (32, then powers of
    two) so at most a handful of kernel variants compile; the host output
    is padded to the global maximum. Replaces the per-cell define_events
    fan-out (reference: xmhw/xmhw.py:440-454, identify.py:328-412).
    """
    T, C = ts_np.shape
    runner = CellRunner(C, T, block=block, mesh=mesh)
    n_dev = len(runner.mesh.devices.flat) if runner.mesh else 1
    use_pallas_scan = use_pallas if use_pallas is not None else (
        ts_np.dtype == np.float32 and jax.default_backend() != "cpu")
    if use_pallas_scan:
        # each device shard must feed the kernel whole 128-lane tiles
        quantum = 128 * n_dev
        if runner.block % quantum:
            runner.block = -(-runner.block // quantum) * quantum

    # the cap is the user's EXACT memory contract — never round it up
    kcap_eff = int(k_cap) if k_cap is not None else None

    def _cap(k):
        return min(k, kcap_eff) if kcap_eff is not None else k

    def _fill_of(v):
        return -1 if np.issubdtype(v.dtype, np.integer) else np.nan

    from ..xrlite.alloc import alloc_empty, alloc_filled

    n_events = np.zeros(C, np.int32)
    dropped = 0
    K = None
    tables = None  # host outputs, written block-by-block (no buffering)
    inter_out = {}
    doy_pos = runner.device_replicated(doy_pos_np)
    for lo in runner.blocks():
        ts = runner.device_block(ts_np, lo)
        th = runner.device_block(th_np, lo)
        se = runner.device_block(se_np, lo)
        if K is None:
            n = _count_kernel(ts, th, doy_pos, min_duration=min_duration,
                              join_gaps=join_gaps, max_gap=max_gap,
                              day0_fillna_quirk=day0_fillna_quirk)
            # k_min: callers processing many chunks (stream_detect) pass
            # the K discovered so far, so later chunks start at the
            # stable capacity instead of regrowing (and recompiling the
            # kernel per K variant) chunk after chunk
            K = _cap(_round_k(max(int(jnp.max(n)), int(k_min or 1))))
        while True:
            static_kw = dict(
                K=K, min_duration=min_duration, join_gaps=join_gaps,
                max_gap=max_gap, intermediate=intermediate,
                use_pallas_scan=use_pallas_scan,
                pallas_interpret=pallas_interpret,
                day0_fillna_quirk=day0_fillna_quirk)
            if use_pallas_scan and runner.mesh is not None:
                fn = _sharded_detect_kernel(runner.mesh, **static_kw)
                tbl, nev, inter = fn(ts, th, se, doy_pos)
            else:
                tbl, nev, inter = detect_kernel(ts, th, se, doy_pos,
                                                **static_kw)
            raw_max = int(jnp.max(nev))
            if raw_max <= K or _cap(_round_k(raw_max)) == K:
                break
            K = _cap(_round_k(raw_max))  # overflow: retry larger
        nev = np.asarray(nev)
        dropped += int(np.maximum(nev - K, 0).sum())  # only under k_cap
        hi = min(lo + runner.block, C)
        w = hi - lo
        n_events[lo:hi] = np.minimum(nev, K)[:w]
        if tables is None:
            tables = {k: alloc_filled((K, C), _fill_of(v), v.dtype)
                      for k, v in tbl.items()}
            if intermediate:
                inter_out = {k: alloc_empty((T, C), v.dtype)
                             for k, v in inter.items()}
        elif next(iter(tables.values())).shape[0] < K:
            # rare overflow growth: keep the written prefix rows
            for k, old in tables.items():
                grown = alloc_filled((K, C), _fill_of(old), old.dtype)
                grown[:old.shape[0]] = old
                tables[k] = grown
        for k, v in tbl.items():
            tables[k][:v.shape[0], lo:hi] = np.asarray(v)[:, :w]
        for k, v in inter.items():
            inter_out[k][:, lo:hi] = np.asarray(v)[:, :w]

    if dropped:
        from ..utils import logger

        logger.warning(
            "k_cap=%d truncated the event table: %d event(s) dropped "
            "across the grid", k_cap, dropped)
    return tables, n_events, inter_out
