"""On-device scrambled-Sobol sequences (uint32 bit ops, fully jittable).

TPU-native replacement for the host-side scipy stage of the QMC sampling
path (`mc/dispersions.py`): the reference has no QMC at all, and the
pre-round-3 rebuild generated Sobol matrices with ``scipy.stats.qmc`` +
``scipy.special.ndtri`` on the host — measured at 0.9-4.3 s per 262k-lane
slab on the tunneled TPU, serialized with the simulation. Everything here
traces under ``jit``, so the whole draw fuses into the one sampling
dispatch.

Construction:

* **Direction numbers** — Joe-Kuo ``new-joe-kuo-6.21201`` (first 640
  dims), baked into ``data/sobol_directions.npz`` by
  ``scripts/gen_sobol_directions.py`` (verified there against scipy's own
  point stream).
* **Generation** — Gray-code direct form: ``x_i = XOR_{j in
  bits(gray(i))} v_j``, vectorized over points as an unrolled XOR
  reduction over the ``ceil(log2 n)`` live bits (pure VPU uint32 work; no
  gathers, no sequential dependence — unlike the classic recursive
  construction, every point is independent).
* **Scrambling** — hash-based Owen scrambling (Laine-Karras permutation
  applied in reversed-bit space; Burley, "Practical Hash-based Owen
  Scrambling", JCGT 2020). For a uniformly random per-dimension seed the
  first ``+= seed`` round makes the output exactly uniform on uint32 and
  the remaining rounds are bijections (``x ^= x*c`` with even ``c``), so
  every scrambled coordinate is marginally U(0,1) and estimators stay
  unbiased — the property the RQMC error bars (``sobol_scrambles``) rely
  on. The digit permutations are hash-derived rather than fully nested-
  uniform, i.e. a practical approximation of Owen's scramble, like
  scipy's own LMS+shift variant.

Conversion to (0,1) uses bin centers (``(x + 0.5) * 2^-bits``), so 0 and 1
are unreachable and ``ndtri`` stays finite without clipping.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["direction_numbers", "sobol_uniform", "sobol_normal", "max_dims"]

_U32 = jnp.uint32


@functools.lru_cache(maxsize=1)
def _table() -> np.ndarray:
    from importlib.resources import files

    with (files("erpl_monte_carlo_sim_tpu.data") / "sobol_directions.npz"
          ).open("rb") as f:
        return np.load(f)["v"]


def max_dims() -> int:
    """Largest supported dimension count (baked-table width)."""
    return int(_table().shape[0])


def direction_numbers(d: int) -> np.ndarray:
    """First ``d`` Joe-Kuo direction-number rows, shape [d, 32] uint32."""
    t = _table()
    if not 1 <= d <= t.shape[0]:
        raise ValueError(
            f"sobol dimension {d} outside the baked table (1..{t.shape[0]}); "
            "regenerate with scripts/gen_sobol_directions.py if more are needed"
        )
    return t[:d]


def _sobol_bits(n: int, v) -> jnp.ndarray:
    """Unscrambled Sobol integers for points 0..n-1, shape [n, d] uint32."""
    i = jnp.arange(n, dtype=_U32)
    gray = i ^ (i >> 1)
    x = jnp.zeros((n, v.shape[0]), _U32)
    for j in range(max(1, (n - 1).bit_length())):
        bit = (gray >> j) & _U32(1)
        x = x ^ (bit[:, None] * v[None, :, j])
    return x


def _reverse_bits(x):
    x = ((x >> 1) & _U32(0x55555555)) | ((x & _U32(0x55555555)) << 1)
    x = ((x >> 2) & _U32(0x33333333)) | ((x & _U32(0x33333333)) << 2)
    x = ((x >> 4) & _U32(0x0F0F0F0F)) | ((x & _U32(0x0F0F0F0F)) << 4)
    x = ((x >> 8) & _U32(0x00FF00FF)) | ((x & _U32(0x00FF00FF)) << 8)
    return (x >> 16) | (x << 16)


def _owen_scramble(x, seeds):
    """Hash-based Owen scramble of [n, d] Sobol integers with per-dimension
    uint32 ``seeds`` [d]. Bijective in x for every seed; uniform in seed."""
    x = _reverse_bits(x)
    x = x + seeds[None, :]
    for c in (0x6C50B47C, 0xB82F1E52, 0xC7AFE638, 0x8D22F6E6):
        x = x ^ (x * _U32(c))
    return _reverse_bits(x)


def _to_unit(x, dtype):
    dtype = jnp.dtype(dtype)
    if dtype == jnp.float64:
        return (x.astype(jnp.float64) + 0.5) * jnp.float64(2.0 ** -32)
    # drop to 24 bits first so the float32 result stays strictly inside (0,1)
    return ((x >> 8).astype(dtype) + jnp.asarray(0.5, dtype)) * jnp.asarray(
        2.0 ** -24, dtype
    )


@functools.partial(jax.jit, static_argnames=("n", "d", "scrambles", "dtype"))
def sobol_uniform(key, n: int, d: int, scrambles: int = 1,
                  dtype=jnp.float32) -> jnp.ndarray:
    """[n, d] scrambled-Sobol points in (0,1), deterministic in ``key``.

    With ``scrambles=K`` (n divisible by K), the batch is K contiguous
    blocks of the SAME base points under independently seeded scrambles —
    K i.i.d. randomized-QMC replicates, for valid error bars.

    Jittable (and already jitted standalone); when called inside an outer
    jit the inner jit inlines.
    """
    if n % scrambles:
        raise ValueError("n must be a multiple of scrambles")
    v = jnp.asarray(direction_numbers(d))
    base = _sobol_bits(n // scrambles, v)
    seeds = jax.random.bits(key, (scrambles, d), "uint32")
    blocks = jax.vmap(lambda s: _owen_scramble(base, s))(seeds)
    return _to_unit(blocks.reshape(n, d), dtype)


def sobol_normal(key, n: int, d: int, scrambles: int = 1,
                 dtype=jnp.float32) -> jnp.ndarray:
    """[n, d] standard-normal scrambled-Sobol draws (inverse-CDF transform)."""
    from jax.scipy.special import ndtri

    return ndtri(sobol_uniform(key, n, d, scrambles, dtype))
