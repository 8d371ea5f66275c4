"""CLI smoke test through the real surface (subprocess)."""

import os
import subprocess
import sys

import numpy as np

from tests.test_run import square_dataset  # noqa: F401  (fixture reuse)


def test_cli_end_to_end(square_dataset, tmp_path):  # noqa: F811
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # CPU run, no TPU tunnel
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = str(tmp_path / "cli_out")
    res = subprocess.run(
        [
            sys.executable, "-m", "evo_tpu.run.cli",
            "--dataset", square_dataset,
            "--output-dir", out_dir,
            "--max-frames", "3",
            "--no-compensation",
        ],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "processed" in res.stdout
    assert os.path.exists(os.path.join(out_dir, "trajectory.txt"))
    assert os.path.exists(os.path.join(out_dir, "final_cost.txt"))
    rows = np.loadtxt(os.path.join(out_dir, "trajectory.txt"))
    assert rows.shape[1] == 4 and len(rows) > 3
