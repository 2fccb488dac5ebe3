"""Post-hoc CLI: scan per-simulation JSON exports for the maximum apogee.

Parity with `/root/reference/find_max_apogee.py:1-16`, generalized: scans
every ``sim_*.json`` in the directory instead of a hard-coded id range.

Usage: python -m erpl_monte_carlo_sim_tpu.cli.find_max_apogee <sim_results_dir>
"""

from __future__ import annotations

import glob
import json
import os
import sys


def main(dir_path: str) -> tuple:
    max_apogee = 0.0
    max_sim = -1
    for path in sorted(glob.glob(os.path.join(dir_path, "sim_*.json"))):
        try:
            with open(path) as f:
                data = json.load(f)
            apo = data["apogee_altitude"]
        except Exception:
            continue
        if apo > max_apogee:
            max_apogee = apo
            max_sim = data.get(
                "simulation_id",
                int(os.path.basename(path)[4:-5]),
            )
    print(f"Max apogee in sim_{max_sim}.json: {max_apogee}")
    return max_sim, max_apogee


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "outputs")
