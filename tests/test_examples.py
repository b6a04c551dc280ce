"""The examples/ scripts stay runnable (SURVEY §4 smoke tier)."""

import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_psops_embedding_demo(tmp_path):
    """Full train -> export -> native C++ rollout demo exits 0 and reports
    sub-5e-4 native/JAX parity (asserted inside the script)."""
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "examples" / "psops_embedding.py"),
            "--cpu",
            "--epochs", "1",
            "--workdir", str(tmp_path / "demo"),
        ],
        capture_output=True,
        text=True,
        timeout=570,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "PSOPS-embedding demo OK" in proc.stdout
