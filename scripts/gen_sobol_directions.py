"""Bake Sobol direction numbers into the package's data directory.

Extracts the first ``D`` dimensions of the Joe-Kuo (new-joe-kuo-6.21201)
direction-number set from scipy's Sobol implementation (public table; scipy
just ships a convenient copy) and writes them as a [D, 32] uint32 array to
``erpl_monte_carlo_sim_tpu/data/sobol_directions.npz``.

The baked file is what ``ops/sobol.py`` loads at runtime, so the on-device
generator has no scipy dependency and no reliance on scipy's private
``_sv`` attribute outside this one regeneration script.

Run (only if the table ever needs regenerating / widening):
    python scripts/gen_sobol_directions.py [D]
"""
import pathlib
import sys

import numpy as np
from scipy.stats import qmc

D = int(sys.argv[1]) if len(sys.argv) > 1 else 640
OUT = (pathlib.Path(__file__).resolve().parents[1]
       / "erpl_monte_carlo_sim_tpu" / "data" / "sobol_directions.npz")


def main():
    sob = qmc.Sobol(d=D, scramble=False, bits=32)
    v = np.ascontiguousarray(sob._sv, dtype=np.uint32)
    assert v.shape == (D, 32), v.shape
    # sanity: regenerate the first 8 points of the first 8 dims via the
    # Gray-code direct formula and compare against scipy's own stream
    ref = qmc.Sobol(d=8, scramble=False, bits=32).random(8)
    for i in range(8):
        g = i ^ (i >> 1)
        x = np.zeros(8, np.uint32)
        for j in range(32):
            if (g >> j) & 1:
                x ^= v[:8, j]
        np.testing.assert_allclose(x * 2.0 ** -32, ref[i], atol=0)
    np.savez_compressed(OUT, v=v)
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes, d={D})")


if __name__ == "__main__":
    main()
