"""Driver-context validation of ``__graft_entry__.dryrun_multichip``.

Round-1 regression: the conftest pre-forces 8 CPU devices, so the in-process
test of ``dryrun_multichip`` passed while the driver's fresh-process
invocation failed (it queried ``jax.device_count()`` before the platform
config updates, initializing the axon backend and freezing the knobs —
``MULTICHIP_r01.json`` ok=false). This test runs the function exactly the
way the driver does: a fresh subprocess with the production PYTHONPATH
(axon sitecustomize active when present), no conftest help.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AXON_SITE = "/root/.axon_site"


def _production_env():
    env = dict(os.environ)
    # Reproduce the driver environment: repo + (if present) the axon
    # sitecustomize that force-registers the TPU platform on import.
    path = [REPO] + ([AXON_SITE] if os.path.isdir(AXON_SITE) else [])
    env["PYTHONPATH"] = ":".join(path)
    # The point of the test is that dryrun_multichip must win even when the
    # environment does NOT pre-select CPU.
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    return env


def test_dryrun_multichip_fresh_process():
    proc = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip\n"
         "dryrun_multichip(8)\n"
         "print('DRYRUN_OK')\n"],
        env=_production_env(),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"dryrun_multichip failed in driver context:\n"
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"
    )
    assert "DRYRUN_OK" in proc.stdout
