"""Example smoke tests (VERDICT r3 item 5/7): every examples/*.py runs to
completion on the CPU backend — the documented entry points cannot silently
break under refactors. Mirrors the reference building all demos/examples in
CI (/root/reference/CMakeLists.txt:344-351, .github/workflows/build.yml).

Each example is executed as a subprocess with --platform cpu (examples/
_common.py) and an 8-virtual-device mesh for the distributed one. Runtime
is compile-dominated on first run and drops sharply once the persistent
compile cache is warm.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES_DIR = os.path.join(REPO, "examples")

EXAMPLES = sorted(
    f for f in os.listdir(EXAMPLES_DIR) if f.endswith(".py") and f != "_common.py"
)


def test_all_examples_are_listed():
    # a new example file automatically joins the parametrization below;
    # this guards the glob itself
    assert len(EXAMPLES) >= 14, EXAMPLES


@pytest.mark.parametrize("example", EXAMPLES)
def test_example_runs(example):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "").replace("--xla_force_host_platform_device_count=8", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES_DIR, example), "--platform", "cpu"],
        cwd=EXAMPLES_DIR,
        env=env,
        capture_output=True,
        timeout=540,
    )
    assert proc.returncode == 0, (
        f"{example} failed (rc={proc.returncode}):\n"
        + proc.stdout.decode(errors="replace")[-2000:]
        + proc.stderr.decode(errors="replace")[-2000:]
    )
