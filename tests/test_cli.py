"""CLI driver tests (the uno_ampl equivalent)."""

import shutil
import subprocess
import sys
from pathlib import Path

import pytest

FIXTURE = Path("/root/reference/examples/hs015.nl")
pytestmark = pytest.mark.skipif(not FIXTURE.exists(), reason="fixture missing")


def run_cli(tmp_path, *args):
    nl = tmp_path / "hs015.nl"
    shutil.copy(FIXTURE, nl)
    env = {"PYTHONPATH": str(Path(__file__).parent.parent),
           "JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
           "HOME": str(tmp_path)}
    return subprocess.run(
        [sys.executable, "-m", "uno_tpu", str(nl), *args],
        capture_output=True, text=True, timeout=900, env=env, cwd=tmp_path), nl


def test_cli_solves_and_writes_sol(tmp_path):
    proc, nl = run_cli(tmp_path, "-AMPL", "preset=ipopt", "logger=SILENT")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "status:           optimal" in proc.stdout
    assert "306.49" in proc.stdout
    sol = nl.with_suffix(".sol")
    assert sol.exists()
    body = sol.read_text().splitlines()
    assert "optimal" in body[0]


def test_cli_unknown_option(tmp_path):
    proc, _ = run_cli(tmp_path, "frobnicate=1")
    assert proc.returncode == 2
    assert "unknown option" in proc.stderr


def test_cli_help():
    env = {"PYTHONPATH": str(Path(__file__).parent.parent),
           "JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin"}
    proc = subprocess.run([sys.executable, "-m", "uno_tpu", "--help"],
                          capture_output=True, text=True, timeout=300, env=env)
    assert proc.returncode == 0
    assert "presets:" in proc.stdout


def test_option_file_layering(tmp_path):
    """Option file applies between defaults and CLI (Options.cpp:92-113;
    layering defaults <- option file <- preset <- command line)."""
    opt = tmp_path / "uno.options"
    opt.write_text("# comment line\nmax_iterations 3\nlogger SILENT\n")
    proc, _ = run_cli(tmp_path, f"option_file={opt}", "preset=ipopt")
    assert proc.returncode == 1, proc.stderr[-2000:]   # hits the 3-iter cap
    assert "iteration_limit" in proc.stdout
    # CLI overrides the file (last layer wins)
    proc2, _ = run_cli(tmp_path, f"option_file={opt}", "preset=ipopt",
                       "max_iterations=500")
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    assert "status:           optimal" in proc2.stdout
