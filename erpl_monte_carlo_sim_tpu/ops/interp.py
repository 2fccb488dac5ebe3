"""Table lookup / interpolation primitives.

The reference uses ``np.interp`` everywhere (`utils.py:147-149`), which
CLAMPS at table endpoints. ``jnp.interp`` has the same clamping semantics and
lowers to a fused searchsorted+gather on TPU, so we use it directly. The
wrappers here exist to pin the semantic contract and to give the hot path a
single choke point if we later swap in a Pallas gather kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["interpolate_1d", "interpolate_vec"]


def interpolate_1d(x, x_table: jnp.ndarray, y_table: jnp.ndarray) -> jnp.ndarray:
    """Piecewise-linear interpolation, clamped at the table endpoints.

    Parity: `utils.py:147-149` (``np.interp``). ``x_table`` must be
    monotonically increasing. ``x`` may be any shape; tables are 1-D along
    the last axis (batched tables broadcast under vmap).
    """
    return jnp.interp(x, x_table, y_table)


def interpolate_vec(x, x_table: jnp.ndarray, y_table: jnp.ndarray) -> jnp.ndarray:
    """Interpolate a vector-valued table ``y_table[N, C]`` at scalar ``x``.

    GATHER-FREE tent-basis formulation: clamped piecewise-linear
    interpolation is exactly a weighted sum of the table rows with "tent"
    (hat) weights, so the whole query is a broadcast multiply + reduction —
    pure VPU work that fuses into the surrounding kernel. This matters
    because the Monte Carlo batch carries a PER-LANE wind table
    ([B, N, 3] under vmap) and per-lane gathers lower catastrophically on
    TPU (measured ~200x slower than arithmetic at B=8192), while this form
    vectorizes perfectly.

    Semantics match ``np.interp`` per component (`environment.py:267-276`):
    clamped at both endpoints, ``x_table`` strictly increasing.
    Returns shape ``[C]`` (vmap adds batch dims).
    """
    x = jnp.asarray(x)
    # Clamp into the table range: tent weights then reproduce endpoint
    # clamping exactly (at x = x_table[0] the first tent is 1, etc.).
    xc = jnp.clip(x, x_table[0], x_table[-1])
    # Tent weight for node n: rises over [x_{n-1}, x_n], falls over
    # [x_n, x_{n+1}]; half-infinite plateaus at the two ends.
    dx = jnp.maximum(jnp.diff(x_table), 1e-30)  # guard duplicate knots
    left = jnp.concatenate([jnp.ones_like(dx[:1]), dx])   # width below node n
    right = jnp.concatenate([dx, jnp.ones_like(dx[:1])])  # width above node n
    up = (xc[..., None] - (x_table - left)) / left         # 1 at node, 0 below
    down = ((x_table + right) - xc[..., None]) / right     # 1 at node, 0 above
    w = jnp.clip(jnp.minimum(up, down), 0.0, 1.0)
    return jnp.sum(w[..., :, None] * y_table, axis=-2)
