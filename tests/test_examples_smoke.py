"""Examples surface smoke: every script byte-compiles, and the light ones
run end to end on the CPU backend (mirrors the reference keeping its
example binaries building in CI — SURVEY §4)."""

import os
import py_compile
import subprocess
import sys
from pathlib import Path

import pytest

EXAMPLES = sorted((Path(__file__).resolve().parents[1] / "examples")
                  .glob("*.py"))


def test_all_examples_compile():
    assert len(EXAMPLES) >= 20
    for path in EXAMPLES:
        py_compile.compile(str(path), doraise=True)


@pytest.mark.parametrize("name", ["registry_assets.py"])
def test_light_example_runs(name):
    env = dict(os.environ, OAR_EXAMPLES_CPU="1",
               PYTHONPATH=str(Path(__file__).resolve().parents[1]))
    proc = subprocess.run(
        [sys.executable, name], cwd=str(EXAMPLES[0].parent), env=env,
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert proc.stdout.strip()
