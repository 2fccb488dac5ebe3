"""Experimental execution paths — correct, not yet performance-competitive.

Both whole-flight Pallas kernels were retired here in round 2 WITH DATA
(`PALLAS_r02.json`, `NOTES.md`): on this axon/Mosaic toolchain they run
107 ms/step (component form) and 352 ms/step (composite form) at B=1024
while matching the XLA path to <1e-4 m — vs ~0.9 ms/step for 131k lanes on
the component-form XLA batch path (`engine/batch.py`), which shares the
same physics (`engine/component.py`) and delivers the VMEM-residency win
the kernels were built for. They remain here as compiled-path regression
artifacts (`scripts/pallas_smoke.py`) and as the starting point if a
directly-attached toolchain changes the Mosaic numbers.
"""

from .pallas_component import simulate_summary_component
from .pallas_kernel import simulate_summary_pallas

__all__ = ["simulate_summary_component", "simulate_summary_pallas"]
