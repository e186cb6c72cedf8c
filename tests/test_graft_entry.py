"""Driver-contract regression tests for __graft_entry__.

Round-1 failure mode (VERDICT.md "missing" #1): the driver imports
`__graft_entry__` and calls `dryrun_multichip(8)` directly from a process
whose jax may already be initialized against the single real TPU. The
fix re-executes the dryrun in a fresh subprocess with the CPU platform
forced; this test exercises exactly the driver's import-and-call shape,
with NO cpu/virtual-device environment preset.
"""

import os
import subprocess
import sys
import pytest

pytestmark = pytest.mark.slow  # subprocess dryrun: fresh interpreter + 8-dev CPU mesh compile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_driver_style():
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    code = "import __graft_entry__ as g; g.dryrun_multichip(8)"
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-4000:])
    assert "dryrun disco+kd ok" in proc.stdout
    assert "dryrun mgda ok" in proc.stdout
    assert "dryrun gspmd dp x spatial ok" in proc.stdout
    assert "dryrun seg dp ok" in proc.stdout
    assert "dryrun gspmd seg dp x spatial ok" in proc.stdout
