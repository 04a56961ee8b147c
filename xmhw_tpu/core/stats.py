"""Device-side year-block statistics kernels.

The host path (stats_api._binned_reduce) uses numpy bincount — fine for
regional grids, host-bound at planet scale. This kernel computes all the
event-table block aggregations in one jit: the bin count is small
(#years / blockLength), so every reduction is a masked sum/max over the
compact (K, C) event tables — no scatters, vectorized over all cells.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# output name -> (source index, reduction); sources order fixed below
EVENT_AGGS = [
    ("ecount", 0, "count"),
    ("duration", 1, "mean"),
    ("intensity_max", 2, "mean"),
    ("intensity_max_max", 2, "max"),
    ("intensity_mean", 3, "mean"),
    ("intensity_cumulative", 4, "mean"),
    ("total_icum", 4, "sum"),
    ("intensity_mean_relThresh", 5, "mean"),
    ("intensity_cumulative_relThresh", 6, "mean"),
    ("severity_mean", 7, "mean"),
    ("severity_cumulative", 8, "mean"),
    ("intensity_mean_abs", 9, "mean"),
    ("intensity_cumulative_abs", 10, "mean"),
    ("rate_onset", 11, "mean"),
    ("rate_decline", 12, "mean"),
]
EVENT_VARS = [
    "event", "duration", "intensity_max", "intensity_mean",
    "intensity_cumulative", "intensity_mean_relThresh",
    "intensity_cumulative_relThresh", "severity_mean",
    "severity_cumulative", "intensity_mean_abs",
    "intensity_cumulative_abs", "rate_onset", "rate_decline",
]


def category_index(ts, th, se, xp=jnp):
    """Hobday category index ``floor(1 + (ts-th)/(th-se))`` (reference:
    xmhw/stats.py:227-231, features.py:62). The single definition used
    by the fused pipeline, the streamed stats stage, and the in-memory
    block_average (pass ``xp=numpy`` for the host path) — one place to
    change the NaN/clipping policy, three paths stay in sync."""
    return xp.floor(1.0 + (ts - th) / (th - se))


@functools.partial(jax.jit, static_argnames=("nbins",))
def binned_event_stats(values, bin_idx, valid, nbins):
    """All block aggregations over compact event tables, on device.

    values: (NV, K, C) float — stacked EVENT_VARS
    bin_idx: (K, C) int32; valid: (K, C) bool
    Returns dict name -> (nbins, C) float32/float64 (NaN-empty bins).
    """
    dt = values.dtype
    nan = jnp.asarray(jnp.nan, dt)
    # (nbins, K, C) one-hot membership — nbins is small
    b = jnp.arange(nbins, dtype=jnp.int32)[:, None, None]
    member = valid[None] & (bin_idx[None] == b)

    out = {}
    for name, i, how in EVENT_AGGS:
        v = values[i]
        fin = member & jnp.isfinite(v)[None]
        cnt = jnp.sum(fin, axis=1).astype(dt)
        if how == "count":
            out[name] = cnt
            continue
        s = jnp.sum(jnp.where(fin, v[None], 0), axis=1)
        if how == "sum":
            # pandas sum of an empty group is 0.0 (reference total_icum)
            out[name] = s
        elif how == "mean":
            out[name] = jnp.where(cnt > 0, s / jnp.maximum(cnt, 1), nan)
        else:  # max
            m = jnp.max(jnp.where(fin, v[None], -jnp.inf), axis=1)
            out[name] = jnp.where(cnt > 0, m, nan)
    return out


@functools.partial(jax.jit, static_argnames=("edges", "with_cats",
                                             "count_nans"))
def binned_day_stats(ts, cats, edges, with_cats=False, count_nans=False):
    """Per-day year-block statistics on device: the other half of
    block_average (reference: xmhw/stats.py:366-428 — agg_ts/agg_cats).

    ts: (T, C) float; cats: (T, C) float (ignored unless ``with_cats``).
    ``edges``: static tuple of nbins+1 time indexes — year blocks are
    CONTIGUOUS runs of the time axis, so each block reduction is a
    static slice + reduction (XLA fuses each into one pass over the
    slice; no (nbins, T, C) broadcast, no scatters). Returns dict of
    (nbins, C) arrays: ts_mean/ts_max/ts_min, plus
    moderate/strong/severe/extreme/total_days with ``with_cats``, plus
    nan_days with ``count_nans`` (for removeMissing masking).
    """
    dt = ts.dtype
    nan = jnp.asarray(jnp.nan, dt)
    names = ["ts_mean", "ts_max", "ts_min"]
    if with_cats:
        names += ["moderate_days", "strong_days", "severe_days",
                  "extreme_days", "total_days"]
    if count_nans:
        names += ["nan_days"]
    rows = {n: [] for n in names}
    for i in range(len(edges) - 1):
        seg = jax.lax.slice_in_dim(ts, edges[i], edges[i + 1], axis=0)
        fin = jnp.isfinite(seg)
        cnt = jnp.sum(fin, axis=0).astype(dt)
        s = jnp.sum(jnp.where(fin, seg, 0), axis=0)
        nz = cnt > 0
        rows["ts_mean"].append(jnp.where(nz, s / jnp.maximum(cnt, 1), nan))
        rows["ts_max"].append(jnp.where(
            nz, jnp.max(jnp.where(fin, seg, -jnp.inf), axis=0), nan))
        rows["ts_min"].append(jnp.where(
            nz, jnp.min(jnp.where(fin, seg, jnp.inf), axis=0), nan))
        if with_cats:
            cseg = jax.lax.slice_in_dim(cats, edges[i], edges[i + 1],
                                        axis=0)
            total = jnp.zeros(ts.shape[1], dt)
            for cat, cname in ((1, "moderate_days"), (2, "strong_days"),
                               (3, "severe_days"), (4, "extreme_days")):
                c = jnp.sum(cseg == cat, axis=0).astype(dt)
                rows[cname].append(c)
                total = total + c
            rows["total_days"].append(total)
        if count_nans:
            rows["nan_days"].append(
                (edges[i + 1] - edges[i]) - cnt)
    return {n: jnp.stack(v) for n, v in rows.items()}


def day_block_edges(tyears, bins):
    """Static time-axis slice edges for ``binned_day_stats``.

    tyears: (T,) host int years (monotone non-decreasing); bins: block
    boundary years (left-closed). Days before bins[0] / after bins[-1]
    fall outside every edge pair and are excluded, matching the host
    path's in-range mask. Returns a hashable tuple of nbins+1 ints.
    """
    import numpy as np

    return tuple(int(x) for x in np.searchsorted(tyears, bins,
                                                 side="left"))


@jax.jit
def rank_events_desc(v, valid):
    """Ordinal descending rank over the event axis, on device.

    v: (K, C) float; valid: (K, C) bool. Returns (K, C) float ranks
    (1 = largest; NaN where invalid/non-finite), replicating
    stats_api.rank_variable's double-argsort tie semantics exactly
    (reference: xmhw/stats.py:493-510): among equal values the EARLIER
    slot receives the larger rank. Computed as a broadcast
    compare-count — K is small (event capacity), so the (K, K, C)
    comparison is cheap and avoids device sorts.
    """
    from jax import lax

    K, C = v.shape
    ok = valid & jnp.isfinite(v)
    a = jnp.where(ok, v, jnp.inf)
    aj = a[:, None, :]   # candidate predecessors j
    ak = a[None, :, :]   # ranked entries k
    jlt = (lax.broadcasted_iota(jnp.int32, (K, K, C), 0)
           < lax.broadcasted_iota(jnp.int32, (K, K, C), 1))
    before = ok[:, None, :] & ((aj < ak) | ((aj == ak) & jlt))
    pos = jnp.sum(before.astype(jnp.int32), axis=0)
    m = jnp.sum(ok.astype(jnp.int32), axis=0)
    return jnp.where(ok, (m[None, :] - pos).astype(v.dtype),
                     jnp.asarray(jnp.nan, v.dtype))
