"""The shipped examples must actually run (subprocess, CPU, few epochs)."""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_quickstart_runs(tmp_path):
    env = {
        **os.environ,
        "QUICKSTART_CPU": "1",
        "QUICKSTART_EPOCHS": "3",
        "XLA_FLAGS": "",
        # the subprocess runs from tmp_path and the package is not installed,
        # so the repo root must ride PYTHONPATH (keep the machine's existing
        # entries — sitecustomize lives there)
        "PYTHONPATH": os.pathsep.join(
            [str(REPO)] + [p for p in [os.environ.get("PYTHONPATH", "")] if p]
        ),
    }
    out = subprocess.run(
        [sys.executable, str(REPO / "examples" / "quickstart.py")],
        env=env,
        cwd=str(tmp_path),  # artifacts land in the tmp dir's outputs/
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "test loss after" in out.stdout
    assert "pair predictions" in out.stdout
    assert (tmp_path / "outputs/quickstart/serving/serving.json").exists()
