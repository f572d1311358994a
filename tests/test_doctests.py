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
    # Exact-match the failure count ('0 failed' as a substring would also
    # accept '10 failed').
    import re

    m = re.search(r"total: (\d+) tests, (\d+) failed", proc.stdout.splitlines()[-1])
    assert m, proc.stdout
    assert int(m.group(2)) == 0 and int(m.group(1)) > 0
