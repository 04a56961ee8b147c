"""Reference-style helper module: ``from xmhw_tpu.identify import ...``
mirrors the reference's ``xmhw.identify`` surface (reference:
xmhw/identify.py) with the same names and semantics, implemented on the
TPU-native core. Functions operating on labeled arrays take/return
:class:`xmhw_tpu.DataArray`.
"""

from __future__ import annotations

import numpy as np

from .annotate import annotate_ds  # noqa: F401 (same name as reference)
from .api import land_check  # noqa: F401
from .core.calendar import build_window_index, compute_doy
from .core.calendar import get_calendar  # noqa: F401
from .exception import XmhwException
from .xrlite import Coord, DataArray, TimeIndex

__all__ = [
    "add_doy",
    "annotate_ds",
    "feb29",
    "get_calendar",
    "land_check",
    "mhw_filter",
    "runavg",
    "window_roll_index",
]


def add_doy(ts: DataArray, tdim: str = "time", keep_tstep: bool = False):
    """Add a 'doy' coordinate (366-day mapping, or step numbering in
    tstep mode). Reference: identify.py:28-79."""
    coord = ts.coords[tdim]
    vals = coord.values
    tindex = vals if isinstance(vals, TimeIndex) else TimeIndex(
        np.asarray(vals))
    doy, _ = compute_doy(tindex, keep_tstep=keep_tstep)
    out = ts.copy()
    out.coords["doy"] = Coord((tdim,), np.asarray(doy))
    return out


def feb29(clim: DataArray, dim: str = "doy"):
    """Mean of doys 59..61 (28 Feb, 29 Feb, 1 Mar), skipna.
    Reference: identify.py:137-151."""
    ax = clim.dims.index(dim)
    doyvals = np.asarray(clim.coords[dim].values)
    sel = np.isin(doyvals, [59, 60, 61])
    sub = np.take(clim.data, np.nonzero(sel)[0], axis=ax)
    return np.nanmean(sub, axis=ax)


def runavg(ts: DataArray, w: int):
    """Periodic running mean over the 'doy' dim; w must be odd.
    Reference: identify.py:154-181."""
    import jax.numpy as jnp

    from .core.clim import runavg_circular

    if w % 2 == 0:
        raise XmhwException("Running average window should be odd")
    ax = ts.dims.index("doy")
    data = np.moveaxis(np.asarray(ts.data, np.float64), ax, 0)
    lead = data.shape
    flat = data.reshape(lead[0], -1)
    out = np.asarray(runavg_circular(jnp.asarray(flat), w))
    out = np.moveaxis(out.reshape(lead), 0, ax)
    res = ts.copy(data=out.astype(ts.data.dtype, copy=False))
    return res


def window_roll_index(ts: DataArray, w: int, tdim: str = "time",
                      keep_tstep: bool = False):
    """TPU-native replacement for the reference's window_roll
    (identify.py:184-209): instead of materializing an 11x-length stacked
    series, return the static (ndoy, Z) gather table of pooled time
    indices (-1 padded). ``ts[gidx[d]]`` reproduces the pooled multiset
    for doy d+1 (positions only; NaN values are dropped on device)."""
    coord = ts.coords[tdim]
    vals = coord.values
    tindex = vals if isinstance(vals, TimeIndex) else TimeIndex(
        np.asarray(vals))
    doy, ndoy = compute_doy(tindex, keep_tstep=keep_tstep)
    gidx, _ = build_window_index(doy, w, ndoy)
    return gidx


def mhw_filter(bthresh, min_duration=5, join_gaps=True, max_gap=2):
    """Identify qualifying events from a boolean exceedance series.

    Reference: identify.py:415-479. Accepts a 1-D or (time, cell) boolean
    numpy array; returns dict with per-day 'events' (start-index labels,
    NaN off-event) plus 'start'/'end' index arrays per event.
    """
    import jax.numpy as jnp

    from .core.events import mhw_filter as _filter

    b = np.asarray(bthresh, bool)
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    f = _filter(jnp.asarray(b), min_duration=int(min_duration),
                join_gaps=bool(join_gaps), max_gap=int(max_gap))
    eid = np.asarray(f["event_id"]).astype(float)
    eid[eid < 0] = np.nan
    out = {
        "events": eid[:, 0] if squeeze else eid,
        "n_events": np.asarray(f["n_events"]),
        "start": np.asarray(f["ev_start"]),
        "end": np.asarray(f["ev_end"]),
    }
    return out
