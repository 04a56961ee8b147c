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
