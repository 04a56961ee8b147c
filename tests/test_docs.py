"""Docs cannot rot: run examples/demo.py and every ```python block in
docs/*.md against synthetic data.

The reference's CI executes its documentation (--doctest-modules
--doctest-glob='*.rst', reference: setup.cfg:37-38); this is the
equivalent for the markdown docs here. Each doc file's blocks run
sequentially in one namespace seeded with the objects the prose
introduces (``sst``, ``monthly_sst``) and the files they reference
(sst.nc, sst_global.nc) created in a temp cwd.
"""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

import xmhw_tpu as xm
from xmhw_tpu.xrlite import Coord, DataArray

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = os.path.join(REPO, "docs")


def _extract_blocks(md_path):
    text = open(md_path).read()
    return re.findall(r"```python\n(.*?)```", text, re.DOTALL)


def _synthetic_sst(y0=1982, y1=2013, lats=(-42.625, -41.625, -40.625),
                   lons=(148.125, 148.375), seed=0, land=True):
    t = np.arange(f"{y0}-01-01", f"{y1 + 1}-01-01",
                  dtype="datetime64[D]").astype("datetime64[ns]")
    rng = np.random.default_rng(seed)
    day = np.arange(len(t), dtype=np.float32)
    # 15-day-smoothed noise: white noise almost never exceeds the 90th
    # percentile for 5 consecutive days, so events would be absent
    noise = rng.normal(0, 1.0, (len(t) + 14, len(lats), len(lons)))
    sm = np.stack([noise[k:k + len(t)] for k in range(15)]).mean(0)
    ts = (15 + 3 * np.sin(2 * np.pi * day / 365.25)[:, None, None]
          + 2.5 * sm).astype(np.float32)
    if land:
        ts[:, 0, 0] = np.nan
    return DataArray(
        ts, ("time", "lat", "lon"),
        {"time": Coord(("time",), t),
         "lat": Coord(("lat",), np.array(lats)),
         "lon": Coord(("lon",), np.array(lons))},
        {"units": "degree_C"}, name="sst")


@pytest.fixture(scope="module")
def doc_env(tmp_path_factory):
    """Temp cwd with the files + objects the doc snippets reference."""
    d = tmp_path_factory.mktemp("docs")
    sst = _synthetic_sst()
    ds = xm.Dataset()
    ds["sst"] = sst
    ds.to_netcdf(str(d / "sst.nc"))

    gl = _synthetic_sst(y0=2000, y1=2002, lats=tuple(np.linspace(-50, -30, 6)),
                        lons=tuple(np.linspace(100, 130, 4)), seed=1)
    dg = xm.Dataset()
    dg["sst"] = gl
    dg.to_netcdf(str(d / "sst_global.nc"))

    months = 6 * 12
    tm = np.array([np.datetime64(f"{2000 + m // 12:04d}-"
                                 f"{m % 12 + 1:02d}-15", "ns")
                   for m in range(months)])
    rng = np.random.default_rng(2)
    mts = (15 + 3 * np.sin(2 * np.pi * np.arange(months) / 12)
           )[:, None, None] + rng.normal(0, 1, (months, 3, 2))
    monthly = DataArray(
        mts.astype(np.float32), ("time", "lat", "lon"),
        {"time": Coord(("time",), tm),
         "lat": Coord(("lat",), np.arange(3.0)),
         "lon": Coord(("lon",), np.arange(2.0))})
    return {"dir": d, "sst": sst, "monthly_sst": monthly}


@pytest.mark.parametrize("doc", ["gettingstarted.md", "streaming.md",
                                 "workflows.md", "performance.md"])
def test_doc_code_blocks_run(doc, doc_env, monkeypatch):
    monkeypatch.chdir(doc_env["dir"])
    blocks = _extract_blocks(os.path.join(DOCS, doc))
    assert blocks, f"{doc}: no python blocks found (extractor broken?)"
    ns = {"xm": xm, "np": np, "sst": doc_env["sst"],
          "monthly_sst": doc_env["monthly_sst"]}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"{doc}[block {i}]", "exec"), ns)
        except Exception as e:
            raise AssertionError(
                f"{doc} block {i} failed: {type(e).__name__}: {e}\n"
                f"---\n{block}") from e


def test_demo_runs(tmp_path):
    """examples/demo.py end to end (synthetic fallback when the golden
    OISST subset is absent, as on CI)."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "demo.py")],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": REPO + os.pathsep
             + os.environ.get("PYTHONPATH", "")})
    assert out.returncode == 0, out.stdout + out.stderr
    assert "events" in out.stdout
