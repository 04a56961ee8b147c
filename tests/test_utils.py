"""Observability utilities (SURVEY §5 aux subsystems)."""

import logging

import jax.numpy as jnp
import numpy as np

from xmhw_tpu.utils import logger, timed


def test_timed_sync_and_log(caplog):
    x = jnp.asarray(np.ones((100, 100)))
    logger.setLevel(logging.INFO)
    with caplog.at_level(logging.INFO, logger="xmhw_tpu"):
        with timed("unit-test", sync=x) as t:
            y = x * 2
            t["sync"] = y
    assert t["seconds"] >= 0
    assert any("unit-test" in r.message for r in caplog.records)


def test_timed_no_log():
    with timed("quiet", log=False) as t:
        pass
    assert "seconds" in t


def test_nat_netcdf_external_semantics(tmp_path):
    """NaT datetimes encode as the declared NaN fill, not INT64_MIN's
    offset (external readers decoded that as year-1677 dates)."""
    import h5py

    import xmhw_tpu as xm
    from xmhw_tpu.xrlite import Coord, DataArray, Dataset

    t = np.array(["2003-01-05", "NaT", "2003-03-01"],
                 dtype="datetime64[ns]")
    ds = Dataset()
    ds["time_start"] = DataArray(t, ("events",),
                                 {"events": Coord(("events",),
                                                  np.arange(3))})
    p = str(tmp_path / "nat.nc")
    ds.to_netcdf(p)
    with h5py.File(p, "r") as f:
        raw = f["time_start"][...]
        assert np.isnan(raw[1]), raw  # NaN fill, not -106751.99...
        assert np.isfinite(raw[0]) and np.isfinite(raw[2])
    back = xm.open_dataset(p)
    got = back["time_start"].data
    assert np.isnat(got[1])
    np.testing.assert_array_equal(got[[0, 2]], t[[0, 2]])
