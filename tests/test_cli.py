"""CLI (python -m xmhw_tpu) — streamed pipelines without writing
Python. The reference has no CLI; its documented planet workflow is a
hand-written staging script (reference: docs/dask.rst:44-86)."""

import subprocess
import sys

import numpy as np
import pytest

import xmhw_tpu as xm
from xmhw_tpu.__main__ import main


def test_cli_help():
    with pytest.raises(SystemExit) as e:
        main(["--help"])
    assert e.value.code == 0


def test_cli_staged_chain_matches_api(tmp_path, oisst_file):
    c = str(tmp_path / "c.nc")
    m = str(tmp_path / "m.nc")
    b = str(tmp_path / "b.nc")
    r = str(tmp_path / "r.nc")
    assert main(["--f64", "threshold", oisst_file, "sst", c,
                 "--stripe", "3"]) == 0
    assert main(["--f64", "detect", oisst_file, "sst", c, m,
                 "--stripe", "3"]) == 0
    assert main(["block-average", m, b, "--dstime", oisst_file,
                 "--dstime-var", "sst", "--clim", c,
                 "--stripe", "3"]) == 0
    assert main(["rank", m, r, "--stripe", "2"]) == 0

    ds = xm.open_dataset(oisst_file)
    clim = xm.threshold(ds["sst"], dtype=np.float64)
    mhw = xm.detect(ds["sst"], clim["thresh"], clim["seas"],
                    events_layout="compact", dtype=np.float64)
    mf = xm.open_dataset(m)
    assert (int(np.isfinite(mf["event"].data).sum())
            == int(np.isfinite(mhw["event"].data).sum()))


@pytest.mark.slow
def test_cli_run_fused_with_resume_flag(tmp_path, oisst_file):
    d = tmp_path
    assert main(["--f64", "run", oisst_file, "sst",
                 str(d / "c.nc"), str(d / "m.nc"),
                 "--block", str(d / "b.nc"), "--rank", str(d / "r.nc"),
                 "--stripe", "3", "--resume"]) == 0
    for f in ("c.nc", "m.nc", "b.nc", "r.nc", "r_return.nc"):
        assert (d / f).exists(), f


def test_cli_entrypoint_runs():
    r = subprocess.run([sys.executable, "-m", "xmhw_tpu", "--help"],
                       capture_output=True, text=True,
                       cwd="/root/repo")
    assert r.returncode == 0
    assert "fused single pass" in r.stdout


@pytest.fixture()
def oisst_file():
    import os

    path = os.path.join(
        os.environ.get("XMHW_TESTDATA",
                       "/root/reference/test/testdata"),
        "oisst_2003_2004.nc")
    if not os.path.exists(path):
        pytest.skip("golden testdata not available")
    return path
