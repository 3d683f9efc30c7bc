import subprocess
import sys

import numpy as np

from lira_tpu.io.datasets import load_data
from lira_tpu.io.xvecs import write_xvecs


def test_load_data_bvecs(tmp_path, rng):
    d = tmp_path / "toy"
    d.mkdir()
    base = rng.integers(0, 256, size=(40, 8)).astype(np.uint8)
    query = rng.integers(0, 256, size=(5, 8)).astype(np.uint8)
    write_xvecs(str(d / "toy_base.bvecs"), base)
    write_xvecs(str(d / "toy_query.bvecs"), query)
    bundle = load_data("toy", data_path=str(tmp_path))
    assert bundle.base.dtype == np.float32
    np.testing.assert_array_equal(bundle.base, base.astype(np.float32))
    np.testing.assert_array_equal(bundle.query, query.astype(np.float32))
    assert bundle.groundtruth is None


def test_cli_help():
    out = subprocess.run(
        [sys.executable, "-m", "lira_tpu", "--help"],
        capture_output=True, text=True, env={"PYTHONPATH": ".", "PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0
    assert "smallscale" in out.stdout


def test_cli_unknown_command():
    out = subprocess.run(
        [sys.executable, "-m", "lira_tpu", "nope"],
        capture_output=True, text=True, env={"PYTHONPATH": ".", "PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 1
