"""Streamed planet-scale pipeline: chunked NetCDF in, region-written NetCDF out.

The reference documents a manual workflow for grids too large for memory:
split the grid into chunk-aligned blocks, run threshold/detect per block,
and recombine the outputs (reference: docs/dask.rst:44-86). This module
automates it with host memory bounded by O(time x stripe):

* the input variable is read in latitude stripes via HDF5 hyperslabs
  (never the whole grid);
* each stripe is land-compacted, pushed through the same device kernels
  the in-memory API uses (core.pipeline.run_clim / run_detect), and the
  result is region-written into the output file;
* every large host buffer is REUSED across stripes — this matters
  doubly in environments where fresh-page supply is slow (see
  xrlite/alloc.py).

Outputs are normal NetCDF4 files that xmhw_tpu.open_dataset (or xarray)
reads back; variable metadata matches annotate_ds (reference:
identify.py:539-696).
"""

from __future__ import annotations

import numpy as np

from .annotate import (MHW_VAR_ATTRS, detect_params_attr,
                       threshold_params_attr)
from .core.calendar import compute_doy, get_calendar
from .core.pipeline import run_clim, run_detect
from .exception import XmhwException
from .xrlite import TimeIndex, encode_cf_time
from .xrlite.alloc import alloc_filled

__all__ = ["stream_threshold", "stream_detect", "GridReader"]

_TIME_LIKE = ("time_start", "time_end", "time_peak")


class GridReader:
    """Lazy handle on one (time|doy, y, x, ...) NetCDF4/HDF5 variable.

    Reads hyperslab stripes over the FIRST grid dimension without loading
    the variable. Classic netCDF3 files are not supported for streaming
    (convert with nccopy -k nc4; the in-memory API reads them fine).
    """

    def __init__(self, path, var, lead_dim=None):
        import h5py

        with open(path, "rb") as fh:
            if fh.read(4) != b"\x89HDF":
                raise XmhwException(
                    f"{path}: streaming needs a NetCDF4/HDF5 file")
        self._h = h5py.File(path, "r")
        if var not in self._h:
            raise XmhwException(f"variable {var!r} not in {path}")
        self.v = self._h[var]
        self.dims = self._dims_of(self.v)
        self.attrs = {k: v for k, v in self.v.attrs.items()
                      if not k.startswith(("DIMENSION", "CLASS", "NAME",
                                           "_Netcdf4"))}
        lead = lead_dim or self.dims[0]
        if self.dims[0] != lead:
            raise XmhwException(
                f"{var}: leading dim is {self.dims[0]}, expected {lead} "
                "(streaming requires the time/doy axis first)")
        self.grid_dims = self.dims[1:]
        if not self.grid_dims:
            raise XmhwException(
                "Series has only time dimension use point=True option,"
                " exiting")
        self.grid_shape = self.v.shape[1:]

    @staticmethod
    def _dims_of(node):
        dims = []
        if "DIMENSION_LIST" in node.attrs:
            for refs in node.attrs["DIMENSION_LIST"]:
                dims.append(node.file[refs[0]].name.lstrip("/"))
        else:
            dims = [f"dim_{i}" for i in range(node.ndim)]
        return dims

    def coord(self, name):
        """(values, attrs) of a dimension coordinate; time decoded."""
        from .xrlite.netcdf import _h5attrs, _is_time
        from .xrlite.timeutils import decode_cf_time

        node = self._h[name]
        attrs = _h5attrs(node)
        vals = node[()]
        if _is_time(name, attrs):
            cal = str(attrs.pop("calendar", "standard"))
            units = str(attrs.pop("units"))
            t = decode_cf_time(vals, units, cal)
            t.attrs.update(attrs)
            t.encoding = {"units": units, "calendar": cal}
            return t, attrs
        return vals, attrs

    def read(self, lo, hi, t_sel=slice(None)):
        """(T, cells) float stripe of grid rows [lo, hi)."""
        block = self.v[(t_sel, slice(lo, hi))]
        fv = self.v.attrs.get("_FillValue")
        block = np.asarray(block)
        if fv is not None and np.issubdtype(block.dtype, np.floating):
            fv = np.asarray(fv).item()
            if not np.isnan(fv):
                block = np.where(block == fv, np.nan, block)
        return block.reshape(block.shape[0], -1)

    def close(self):
        self._h.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _auto_stripe(T, grid_shape, itemsize=4, budget=2 ** 28):
    """Grid rows per stripe so one (T, stripe) read is ~256 MB."""
    row_cells = int(np.prod(grid_shape[1:], dtype=np.int64)) or 1
    rows = max(1, int(budget / (T * row_cells * itemsize)))
    return min(rows, grid_shape[0])


class _Writer:
    """Incremental NetCDF4 writer (dimension-scales convention)."""

    def __init__(self, path, dim_coords, global_attrs=None):
        import h5py

        self.h = h5py.File(path, "w")
        self.scales = {}
        for name, (vals, attrs) in dim_coords.items():
            if isinstance(vals, TimeIndex) or (
                    np.asarray(vals).dtype.kind == "M"):
                t = vals if isinstance(vals, TimeIndex) else TimeIndex(
                    np.asarray(vals))
                raw, units, cal = encode_cf_time(
                    t, getattr(t, "encoding", {}).get("units"))
                attrs = dict(attrs or {}, units=units, calendar=cal)
                vals = raw
            node = self.h.create_dataset(name, data=np.asarray(vals))
            node.make_scale(name)
            for k, v in (attrs or {}).items():
                try:
                    node.attrs[k] = v
                except TypeError:
                    node.attrs[k] = str(v)
            self.scales[name] = node
        for k, v in (global_attrs or {}).items():
            try:
                self.h.attrs[k] = v
            except TypeError:
                self.h.attrs[k] = str(v)

    def create(self, name, dims, dtype, attrs=None, fill=np.nan,
               chunks=None):
        shape = tuple(self.scales[d].shape[0] for d in dims)
        kw = {}
        if chunks and all(s > 0 for s in shape):
            # h5py rejects chunked layouts with any zero extent (e.g. an
            # empty events axis); contiguous is fine for empty datasets
            kw["chunks"] = tuple(min(c, s) for c, s in zip(chunks, shape))
        node = self.h.create_dataset(name, shape=shape, dtype=dtype,
                                     fillvalue=fill, **kw)
        for i, d in enumerate(dims):
            node.dims[i].attach_scale(self.scales[d])
        if np.issubdtype(np.dtype(dtype), np.floating):
            node.attrs["_FillValue"] = np.array([np.nan], dtype=dtype)
        for k, v in (attrs or {}).items():
            try:
                node.attrs[k] = v
            except TypeError:
                node.attrs[k] = str(v)
        return node

    def close(self):
        self.h.close()


def _compact_ocean(block):
    """Drop all-NaN (land) columns; returns (compacted, keep_idx)."""
    keep = np.nonzero(~np.isnan(block).all(axis=0))[0]
    if keep.size == block.shape[1]:
        return block, keep
    return np.ascontiguousarray(block[:, keep]), keep


def stream_threshold(
    in_path,
    var,
    out_path,
    tdim="time",
    climatologyPeriod=[None, None],
    pctile=90,
    windowHalfWidth=5,
    smoothPercentile=True,
    smoothPercentileWidth=31,
    maxPadLength=None,
    coldSpells=False,
    tstep=False,
    skipna=False,
    dtype=np.float32,
    stripe=None,
    cell_block=None,
    mesh=None,
):
    """threshold() streamed file-to-file; host memory O(time x stripe).

    Same semantics as :func:`xmhw_tpu.threshold` (reference:
    xmhw/xmhw.py:38-247); returns the output path.
    """
    if smoothPercentileWidth % 2 == 0:
        raise XmhwException("smoothPercentileWidth should be odd")
    with GridReader(in_path, var, lead_dim=tdim) as g:
        tindex, _ = g.coord(tdim)
        if not isinstance(tindex, TimeIndex):
            raise XmhwException(f"{tdim} must be a CF time coordinate")
        t_sel = slice(None)
        if all(climatologyPeriod):
            years = tindex.year
            idx = np.nonzero((years >= int(climatologyPeriod[0]))
                             & (years <= int(climatologyPeriod[1])))[0]
            t_sel = slice(int(idx[0]), int(idx[-1]) + 1)
            tindex = TimeIndex(tindex.values[t_sel])
        if get_calendar(tindex) == 360.0:
            tstep = True
        doy, ndoy = compute_doy(tindex, keep_tstep=tstep)
        T = len(doy)

        rows = stripe or _auto_stripe(T, g.grid_shape)
        dim_coords = {"doy": (np.arange(1, ndoy + 1), {})}
        for d in g.grid_dims:
            dim_coords[d] = g.coord(d)
        w = _Writer(out_path, dim_coords, global_attrs={
            "xmhw_parameters": threshold_params_attr(
                pctile, tindex.year[0], tindex.year[-1], windowHalfWidth,
                skipna, smoothPercentile, smoothPercentileWidth, False),
            "source": "xmhw_tpu stream_threshold",
        })
        units = g.attrs.get("units", "degree_C")
        if isinstance(units, bytes):
            units = units.decode("utf-8", "replace")
        units = str(units)
        out_vars = {
            "thresh": w.create(
                "thresh", ("doy", *g.grid_dims), np.dtype(dtype).str,
                {"long_name": f"{pctile}th percentile threshold",
                 "units": units}),
            "seas": w.create(
                "seas", ("doy", *g.grid_dims), np.dtype(dtype).str,
                {"long_name": "climatological mean", "units": units}),
        }
        row_cells = int(np.prod(g.grid_shape[1:], dtype=np.int64)) or 1
        buf = alloc_filled((ndoy, rows * row_cells), np.nan, dtype)
        for lo in range(0, g.grid_shape[0], rows):
            hi = min(lo + rows, g.grid_shape[0])
            block = g.read(lo, hi, t_sel).astype(dtype, copy=False)
            comp, keep = _compact_ocean(block)
            c_str = (hi - lo) * row_cells
            th = se = None
            if keep.size:
                if maxPadLength:
                    from .api import _interpolate_na

                    comp = _interpolate_na(comp, maxPadLength)
                if coldSpells:
                    comp = -comp
                th, se = run_clim(
                    comp, doy, windowHalfWidth, ndoy, pctile=pctile,
                    smooth=smoothPercentile, smooth_w=smoothPercentileWidth,
                    patch_feb29=not tstep, block=cell_block, mesh=mesh)
            for name, vals in (("thresh", th), ("seas", se)):
                view = buf[:, :c_str]
                view.fill(np.nan)
                if vals is not None:
                    view[:, keep] = vals
                out_vars[name][:, lo:hi] = view.reshape(
                    ndoy, hi - lo, *g.grid_shape[1:])
        w.close()
    return out_path


def _encode_times(idx, time_vals, units, cal):
    """Event time indexes -> CF-encoded floats (NaN where no event)."""
    t = TimeIndex(time_vals[np.clip(idx, 0, len(time_vals) - 1)]
                  .reshape(-1))
    raw, _, _ = encode_cf_time(t, units)
    raw = np.asarray(raw, np.float64).reshape(idx.shape)
    return np.where(idx >= 0, raw, np.nan)


def stream_detect(
    ts_path,
    var,
    clim_path,
    out_path,
    tdim="time",
    minDuration=5,
    joinGaps=True,
    maxGap=2,
    maxPadLength=None,
    coldSpells=False,
    tstep=False,
    dtype=np.float32,
    stripe=None,
    cell_block=None,
    mesh=None,
    events_layout="compact",
    thresh_var="thresh",
    seas_var="seas",
    reference_quirks=False,
):
    """detect() streamed file-to-file.

    Host memory: the time-series data is streamed per stripe
    (O(time x stripe)), but the COMPACT per-stripe event tables of every
    stripe are retained between the detect pass and the write pass —
    ~31 x K x ocean_cells values total (the union axis is only known
    after all stripes are detected). At 620k ocean cells / K=128 that is
    a few GB of host tables; the grid itself is never resident.

    ``events_layout="compact"`` writes (ev, lat, lon, ...) per-cell event
    slots — the planet-scale layout. ``"union"`` writes the reference's
    (events, lat, lon, ...) union layout (output size grows with the
    global number of distinct events; fine at regional scale).
    Same event semantics as :func:`xmhw_tpu.detect` including the
    coldSpells intensity flip (reference: xmhw/xmhw.py:310-518);
    returns the output path.
    """
    if maxGap >= minDuration:
        raise XmhwException(
            "Maximum gap between mhw events should"
            + " be smaller than event minimum duration")
    with GridReader(ts_path, var, lead_dim=tdim) as g, \
            GridReader(clim_path, thresh_var, lead_dim="doy") as gth, \
            GridReader(clim_path, seas_var, lead_dim="doy") as gse:
        if tuple(gth.grid_shape) != tuple(g.grid_shape):
            raise XmhwException(
                f"climatology grid {gth.grid_shape} != timeseries grid "
                f"{g.grid_shape}")
        tindex, _ = g.coord(tdim)
        doy, _ = compute_doy(tindex, keep_tstep=tstep)
        th_doys, _ = gth.coord("doy")
        pos = np.searchsorted(th_doys, doy)
        bad = (pos >= len(th_doys)) | (
            th_doys[np.clip(pos, 0, len(th_doys) - 1)] != doy)
        if bad.any():
            raise XmhwException(
                "Climatology doy axis does not cover the timeseries doys")
        doy_pos = pos.astype(np.int32)
        time_vals = tindex.values
        units = getattr(tindex, "encoding", {}).get("units")
        cal = getattr(tindex, "encoding", {}).get("calendar", "standard")

        T = len(doy)
        rows = stripe or _auto_stripe(T, g.grid_shape)
        row_cells = int(np.prod(g.grid_shape[1:], dtype=np.int64)) or 1

        # ---- phase A: detect per stripe, keep compact tables ------------
        stripes = []  # (lo, hi, keep, tables {name: (K_b, n_keep)})
        kmax = 1
        label_union = []
        for lo in range(0, g.grid_shape[0], rows):
            hi = min(lo + rows, g.grid_shape[0])
            block = g.read(lo, hi).astype(dtype, copy=False)
            comp, keep = _compact_ocean(block)
            if keep.size == 0:
                stripes.append((lo, hi, keep, {}))
                continue
            th = gth.read(lo, hi).astype(dtype, copy=False)[:, keep]
            se = gse.read(lo, hi).astype(dtype, copy=False)[:, keep]
            if maxPadLength:
                from .api import _interpolate_na

                comp = _interpolate_na(comp, maxPadLength)
            if coldSpells:
                comp = -comp
            tables, n_events, _ = run_detect(
                comp, th, se, doy_pos, min_duration=minDuration,
                join_gaps=joinGaps, max_gap=maxGap, block=cell_block,
                mesh=mesh, day0_fillna_quirk=reference_quirks)
            if coldSpells:
                # flip_cold (reference: xmhw/features.py:298-315): cold
                # spells report negated intensities, variances excluded
                for k in tables:
                    if "intensity" in k and "_var" not in k:
                        tables[k] = -tables[k]
            kmax = max(kmax, tables["event"].shape[0])
            if events_layout == "union":
                lab = tables["event"]
                fin = np.isfinite(lab)
                if fin.any():
                    label_union.append(np.unique(lab[fin]))
            stripes.append((lo, hi, keep, tables))

        # ---- phase B: write --------------------------------------------
        if events_layout == "union":
            union = (np.unique(np.concatenate(label_union)).astype(np.int64)
                     if label_union else np.zeros(0, np.int64))
            ev_dim, ev_vals = "events", union
        else:
            ev_dim, ev_vals = "ev", np.arange(kmax)
        E = len(ev_vals)
        dim_coords = {ev_dim: (ev_vals, {})}
        for d in g.grid_dims:
            dim_coords[d] = g.coord(d)
        w = _Writer(out_path, dim_coords, global_attrs={
            "xmhw_parameters": detect_params_attr(
                minDuration, joinGaps, maxGap, coldSpells, maxPadLength,
                False),
            "source": "xmhw_tpu stream_detect",
        })
        some = next((s for s in stripes if s[3]), None)
        if some is None:
            w.close()
            raise XmhwException("All points of grid are either land or NaN")
        names = list(some[3].keys())
        u = g.attrs.get("units", "degree_C")
        if isinstance(u, bytes):
            u = u.decode("utf-8", "replace")
        out_vars = {}
        for name in names:
            dt = (np.float64 if name in _TIME_LIKE
                  else some[3][name].dtype)
            attrs = {}
            if name in MHW_VAR_ATTRS:
                long_name, unit_t = MHW_VAR_ATTRS[name]
                attrs = {"long_name": long_name,
                         "units": str(unit_t).format(u=str(u))}
            if name in _TIME_LIKE and units:
                attrs.update(units=units, calendar=cal)
            out_vars[name] = w.create(
                name, (ev_dim, *g.grid_dims), np.dtype(dt).str, attrs,
                chunks=(max(1, min(E, 4096)), 1, *g.grid_shape[1:]))
        buf = alloc_filled((max(E, 1), rows * row_cells), np.nan,
                           np.float64)
        for lo, hi, keep, tables in stripes:
            c_str = (hi - lo) * row_cells
            if events_layout == "union" and keep.size:
                lab = tables["event"]
                fin = np.isfinite(lab)
                rr = np.searchsorted(union, lab[fin].astype(np.int64))
                cc = np.broadcast_to(keep, lab.shape)[fin]
            for name in names:
                view = buf[:E, :c_str]
                view.fill(np.nan)
                if keep.size:
                    tab = tables[name]
                    if name in _TIME_LIKE:
                        tab = _encode_times(tab.astype(np.int64),
                                            time_vals, units, cal)
                    if events_layout == "union":
                        # 2-D fancy indexing writes through the view; a
                        # flat reshape of the non-contiguous view (when
                        # this is a partial final stripe) would COPY and
                        # silently drop the writes
                        view[rr, cc] = tab[fin]
                    else:
                        view[:tab.shape[0], keep] = tab
                out_vars[name][:, lo:hi] = view.reshape(
                    E, hi - lo, *g.grid_shape[1:])
        w.close()
    return out_path
