"""Multi-host (jax.distributed) validation on CPU.

Launches scripts/pod_scale.py as TWO OS processes joined through a Gloo
coordinator, each owning 4 CPU devices of an 8-device global mesh. The run
exercises the full multi-host path: per-host dispersion sampling,
``make_array_from_process_local_data`` global assembly, the component-form
flight under SPMD across hosts, and cross-host psum/all_gather statistics.
Both processes must succeed and print IDENTICAL global stats — the
pod-scale replacement for the reference's single-host process pool
(`monte_carlo.py:92-154`).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # 2-process Gloo run: minutes of wall time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
POD_SCALE = os.path.join(REPO, "scripts", "pod_scale.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(600)
def test_two_process_pod_scale_identical_stats():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("JAX_PLATFORMS", None)  # pod_scale forces cpu itself (--devices)

    def launch(pid):
        return subprocess.Popen(
            [sys.executable, POD_SCALE, "256", "--devices", "4",
             "--max-time", "1.2",
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )

    procs = [launch(0), launch(1)]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=560)
        assert p.returncode == 0, f"rc={p.returncode}\n{stderr[-2000:]}"
        line = [l for l in stdout.splitlines() if l.startswith("{")][-1]
        outs.append(json.loads(line))

    a, b = outs
    # Compare only the deterministic fields — wall_s/traj_per_s are
    # per-process timings and legitimately differ by scheduling jitter.
    timing = {"wall_s", "traj_per_s"}
    a_det = {k: v for k, v in a.items() if k not in timing}
    b_det = {k: v for k, v in b.items() if k not in timing}
    assert a_det == b_det, f"process stats diverged: {a} vs {b}"
    assert a["processes"] == 2
    assert a["devices"] == 8
    assert a["lanes"] == 256
    assert a["apogee_mean_at_cutoff"] > 0
