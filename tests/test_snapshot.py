"""Regression pin: exact float64 outputs on the OISST fixture, frozen in
round 1 (after golden-parity validation against Eric Oliver's outputs and
the differential oracle). Any future change to these numbers must be a
deliberate semantic decision."""

import json
import os

import numpy as np

import xmhw_tpu as xm

SNAP = os.path.join(os.path.dirname(__file__), "golden_snapshot.json")


def test_snapshot_regression(oisst_ts):
    snap = json.load(open(SNAP))
    clim = xm.threshold(oisst_ts, dtype=np.float64)
    mhw = xm.detect(oisst_ts, clim["thresh"], clim["seas"],
                    dtype=np.float64)
    assert int(np.isfinite(mhw["event"].data).sum()) == \
        snap["n_events_total"]
    np.testing.assert_array_equal(mhw["events"].values,
                                  snap["events_coord"])
    lat, lon = snap["cell"]["lat"], snap["cell"]["lon"]
    for k, want in snap["cell_values"].items():
        v = mhw[k].sel(lat=lat, lon=lon).values
        got = v[np.isfinite(v)]
        np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-7,
                                   err_msg=k)
    th = clim["thresh"].sel(lat=lat, lon=lon).values[::30]
    np.testing.assert_allclose(th, snap["thresh_sample"], rtol=1e-7)
