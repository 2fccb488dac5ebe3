"""Subset-simulation driver: the analyzer's rare-event entry points.

Extracted from mc/analyzer.py (round 4, god-module slimming): the
MonteCarloAnalyzer methods that re-express the dispersion distribution as
a push-forward of N(0, I_d) and drive ``mc.subset``'s adaptive multilevel
splitting with batched flight evaluations. Mixed into the analyzer class
(``MonteCarloAnalyzer(SubsetDriverMixin, ...)``) so the public API is
unchanged: ``analyzer.subset_tail(...)`` / ``analyzer.subset_quantile(...)``.

Reference counterpart: none — `monte_carlo.py:444-459` stops at fixed
percentiles of a fixed-n run.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .filter import outlier_mask

__all__ = ["SubsetDriverMixin"]


class SubsetDriverMixin:
    """Rare-event methods shared into ``MonteCarloAnalyzer``."""

    def subset_tail(self, initial_conditions, metric: str,
                    threshold: float, *, direction: str = "above",
                    n_per_level: int = 2048, p0: float = 0.125,
                    seed: int = 0, n_runs: int = 1, beta0: float = 0.6,
                    max_levels: int = 15,
                    chunk_steps: Optional[int] = None) -> dict:
        """Deep-tail exceedance probability by subset simulation
        (``mc.subset``): P(metric > threshold) down to ~1e-9 at a few
        thousand flights per decade of probability.

        The dispersion distribution is re-expressed as a push-forward of
        N(0, I_d) (``mc.dispersions.sample_from_normals``: 19 scalar
        channels + the full per-lane AR(1) turbulence driver), and pCN
        MCMC walks u-space conditioned on intermediate thresholds; each
        chain step is one BATCHED flight simulation, so the device always
        sees wide lanes. Complements ``mc.tail`` (GPD extrapolation:
        cheap, model risk) and ``importance_shift`` (needs a chosen
        direction): subset simulation finds the failure region itself.

        ``direction="below"`` estimates P(metric < threshold) (negated
        internally). Invalid lanes (outlier filter) never count as
        exceedances, matching ``mc.stats.exceedance``'s
        finite-and-valid convention; ``probability`` is the JOINT
        P(exceed AND valid) and ``probability_given_valid`` divides by
        the level-0 valid fraction (= the conditional probability
        ``exceedance`` reports, up to its own sampling error).

        Runs its own standard-normal draws: the analyzer's ``sampler`` /
        ``antithetic`` / ``importance_shift`` / ``control_variates``
        knobs do not apply here. Forecast ensembles are rejected (the
        member index is discrete; condition on one member and run per
        member).

        ``n_runs > 1`` runs that many independent replicates (seeds
        ``seed .. seed + n_runs - 1``, one compile shared) and pools them
        with ``mc.pool_subset_runs``: the returned ``cov``/``ci95`` come
        from the BETWEEN-SEED spread instead of the per-run Au & Beck
        level-independence approximation, which the measured flight
        studies show under-covers by 1.5-2.2x (NOTES.md). Use it whenever
        the decision is tight; ``failure_channels`` then pools every
        replicate's failure population and per-run diagnostics ride in
        ``runs``.
        """
        from .subset import pool_subset_runs, subset_simulation

        g_fn, d, n_knots, sign, ic = self._subset_g_fn(
            initial_conditions, metric, direction, n_runs, chunk_steps)

        results, pop_u, pop_fail = [], [], []
        for k in range(int(n_runs)):
            r = subset_simulation(
                g_fn, d, threshold=sign * float(threshold),
                n_per_level=n_per_level, p0=p0, seed=seed + k,
                beta0=beta0, max_levels=max_levels,
                return_population=True,
            )
            pop_u.append(r.pop("u_final"))
            pop_fail.append(r.pop("g_final") >= sign * float(threshold))
            # map internal (sign-flipped) thresholds back to metric units
            r["threshold"] = float(threshold)
            for lv in r["levels"]:
                lv["threshold"] = sign * lv["threshold"]
            results.append(r)
        res = results[0] if int(n_runs) == 1 else pool_subset_runs(results)
        res["failure_channels"] = self._failure_channels(
            np.concatenate(pop_u, axis=0),
            np.concatenate(pop_fail, axis=0), n_knots)
        res["metric"] = metric
        res["direction"] = direction
        vf = res["valid_fraction"]
        res["probability_given_valid"] = (
            res["probability"] / vf if vf > 0 else float("nan")
        )
        return res

    def subset_quantile(self, initial_conditions, metric: str,
                        p_target: float, *, direction: str = "above",
                        n_per_level: int = 2048, p0: float = 0.125,
                        seed: int = 0, n_runs: int = 1,
                        beta0: float = 0.6,
                        chunk_steps: Optional[int] = None) -> dict:
        """Deep-tail quantile by subset simulation (``mc.subset``): the
        metric bound ``T`` with P(metric > T) = ``p_target`` — the
        inverse of :meth:`subset_tail`, for bounds at probabilities far
        beyond counting reach ("the 1e-6 apogee ceiling"). Same normals
        re-expression, invalid-lane convention (``p_target`` is the
        JOINT exceed-AND-valid fraction), ensemble rejection, and
        replicate pooling (``n_runs > 1`` -> ``mc.pool_subset_quantiles``:
        mean bound with a between-seed Student-t CI in METRIC units —
        prefer it; the single-run ``ci95_threshold`` inherits the
        Au & Beck level-independence approximation).

        ``direction="below"`` finds T with P(metric < T) = p_target
        (lower bound; ``ci95_threshold`` stays [lo, hi] in metric
        units). ``failure_channels`` profiles the population beyond the
        estimated bound, exactly as in :meth:`subset_tail`."""
        from .subset import pool_subset_quantiles, subset_quantile

        g_fn, d, n_knots, sign, _ = self._subset_g_fn(
            initial_conditions, metric, direction, n_runs, chunk_steps)

        results, pop_u, pop_fail = [], [], []
        for k in range(int(n_runs)):
            r = subset_quantile(
                g_fn, d, p_target=float(p_target),
                n_per_level=n_per_level, p0=p0, seed=seed + k,
                beta0=beta0, return_population=True,
            )
            pop_u.append(r.pop("u_final"))
            pop_fail.append(r.pop("g_final") >= r["threshold"])
            # map internal (sign-flipped) values back to metric units
            r["threshold"] = sign * r["threshold"]
            lo, hi = r["ci95_threshold"]
            r["ci95_threshold"] = sorted(
                [sign * lo, sign * hi],
                key=lambda v: (np.isnan(v), v),
            ) if direction == "below" else [lo, hi]
            for lv in r["levels"]:
                lv["threshold"] = sign * lv["threshold"]
            results.append(r)
        res = results[0] if int(n_runs) == 1 \
            else pool_subset_quantiles(results)
        res["failure_channels"] = self._failure_channels(
            np.concatenate(pop_u, axis=0),
            np.concatenate(pop_fail, axis=0), n_knots)
        res["metric"] = metric
        res["direction"] = direction
        return res

    def _subset_g_fn(self, initial_conditions, metric: str,
                     direction: str, n_runs: int, chunk_steps):
        """Shared front end of the subset-simulation entry points:
        validates, re-expresses the dispersion distribution as a
        push-forward of N(0, I_d), and returns ``(g_fn, d, n_knots,
        sign, ic)`` with ``g_fn`` the host-callable batched
        metric-of-normals (one jitted compile shared across replicate
        runs; invalid/non-finite lanes -> -inf)."""
        from ..engine.batch import simulate_summary_batch
        from .dispersions import normal_dims, sample_from_normals

        scalar_metrics = ("apogee_altitude", "apogee_time", "range",
                          "flight_time", "max_speed")
        if metric not in scalar_metrics:
            raise ValueError(
                f"metric must be one of {scalar_metrics}, got {metric!r}"
            )
        if direction not in ("above", "below"):
            raise ValueError(
                f"direction must be 'above' or 'below', got {direction!r}"
            )
        if int(n_runs) < 1:
            raise ValueError(f"n_runs must be >= 1, got {n_runs}")
        from .analyzer import _as_ic

        ic = _as_ic(initial_conditions)
        base_wind = None
        if (self.base_wind_profile is not None
                and self.base_altitude_profile is not None):
            if np.asarray(self.base_wind_profile).ndim == 3:
                raise ValueError(
                    "subset simulation does not support forecast "
                    "ensembles; condition on one member "
                    "(base_wind_profile[k]) and run per member"
                )
            base_wind = (self.base_altitude_profile,
                         self.base_wind_profile)
            n_knots = int(np.asarray(self.base_altitude_profile).shape[0])
        else:
            n_knots = int(self.wind_grid_points)
        d = normal_dims(n_knots)
        sign = 1.0 if direction == "above" else -1.0
        dtype = jnp.asarray(self.scene.rocket.dry_mass).dtype
        cfg = self.sim_config
        bounds = self.bounds
        scene = self.scene
        params = self.uncertainty_params

        def _metric_of(u):
            scene_b, ic_b, _ = sample_from_normals(
                u, scene, ic, params=params, base_wind=base_wind,
                wind_grid_points=self.wind_grid_points,
                wind_grid_top=self.wind_grid_top, dtype=dtype,
            )
            if chunk_steps is not None:
                from ..engine.simulate import simulate_batch_chunked

                summary = simulate_batch_chunked(
                    scene_b, ic_b, cfg, chunk_steps=chunk_steps)
            else:
                summary = simulate_summary_batch(scene_b, ic_b, cfg)
            valid, _ = outlier_mask(summary, bounds)
            vals = getattr(summary, metric)
            return jnp.where(valid & jnp.isfinite(vals),
                             sign * vals, -jnp.inf)

        # chunked runs drive their own host loop of jitted chunks; the
        # plain path jits end-to-end (two shapes: n_per_level and n_keep)
        g_dev = _metric_of if chunk_steps is not None \
            else jax.jit(_metric_of)

        def g_fn(u_np):
            return np.asarray(g_dev(jnp.asarray(u_np, dtype)))

        return g_fn, d, n_knots, sign, ic

    # column layout of mc.dispersions._sample_normals_impl (fixed contract)
    _U_CHANNELS = (
        "initial_position_x", "initial_position_y", "initial_position_z",
        "initial_velocity_x", "initial_velocity_y", "initial_velocity_z",
        "initial_attitude_x", "initial_attitude_y", "initial_attitude_z",
        "initial_angular_velocity_x", "initial_angular_velocity_y",
        "initial_angular_velocity_z",
        "mass", "thrust_recorded", "motor_thrust", "motor_flow",
        "wind_speed", "wind_direction", "density",
    )

    @classmethod
    def _failure_channels(cls, u_final, fail_mask, n_knots: int):
        """The ``failure_channels`` block: standardized conditional means
        of every dispersion channel over the failure-region samples the
        subset run ends with — the EMPIRICAL DESIGN POINT ("deep
        exceedances are +2.3-sigma thrust with above-median tailwind"),
        which doubles as a principled ``importance_shift`` suggestion.
        ``None`` when no final-population lane reaches the threshold."""
        fail = np.asarray(fail_mask, bool)
        if not fail.any():
            return None
        uf = np.asarray(u_final, np.float64)[fail]
        chans = [
            {"name": nm, "mean": float(uf[:, j].mean()),
             "std": float(uf[:, j].std())}
            for j, nm in enumerate(cls._U_CHANNELS)
        ]
        turb = uf[:, len(cls._U_CHANNELS):].reshape(uf.shape[0],
                                                    n_knots, 3)
        return {
            "n_failure_samples": int(fail.sum()),
            "channels": chans,
            # per-component mean square of the AR(1) driver (nominal 1.0;
            # >1 = the tail recruits turbulence energy in that component)
            "turbulence_ms": {
                "u": float((turb[..., 0] ** 2).mean()),
                "v": float((turb[..., 1] ** 2).mean()),
                "w": float((turb[..., 2] ** 2).mean()),
            },
            "note": (
                "sigma-units conditional means over the failure region "
                "(MCMC-correlated samples: indicative, not stderr-exact). "
                "wind_speed/wind_direction are uniform channels — a "
                "positive mean reads 'above median'. thrust_recorded is "
                "the reference's dead channel (drawn but the motor uses "
                "its own draw, monte_carlo.py:170,193): its mean is a "
                "built-in placebo check."
            ),
        }

