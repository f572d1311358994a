"""Run the package's doctests through the standalone harness."""

import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_doctest_harness_passes():
    proc = subprocess.run(
        [sys.executable, str(REPO / "pre_commit_hooks" / "run_doctests.py")],
        capture_output=True,
        text=True,
        cwd=str(REPO),
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin", "PYTHONPATH": str(REPO), "HOME": "/root"},
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "0 failed" in proc.stdout.splitlines()[-1]
