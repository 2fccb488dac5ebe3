"""Importance sampling for rare-event tail estimation.

The reference can only estimate P(metric > t) by counting plain Monte
Carlo hits — hopeless below ~10/n. Exponential tilting fixes that: draw
the dominant Gaussian multiplier channels with their means shifted
toward the failure region (``sample_dispersions(importance_shift=...)``)
and weight every lane by the likelihood ratio back to the nominal
distribution. A 1e-6 tail becomes estimable with thousands of lanes
instead of tens of millions.

Math: target density f = N(0,1) per standardized channel, proposal
g = N(theta,1); the per-lane log-weight is
``sum_c(-theta_c z_c + theta_c^2 / 2)`` with z_c the recorded
standardized draw (under g). Estimators are SELF-NORMALIZED ratios
(numerator and the validity indicator both weighted), so the outlier
filter is handled the same way as `mc.cv`'s ratio form, and weights only
need to be known up to a constant. The effective sample size
``n_eff = (sum w)^2 / sum w^2`` is reported — the honest "how many plain
lanes is this worth" number; a tiny n_eff means the shift overshot.

Choosing the tilt: on the exceedance EVENT the weights are bounded
(w <= exp(-theta z_t + theta^2/2) with z_t the threshold's z-score), but
the self-normalizing denominator sees every lane and its weight variance
grows as exp(theta^2) — over-tilting makes the DENOMINATOR the noise
source. Practical rule: theta ~ 0.5-0.75 of the threshold z-score;
check ``n_eff`` (denominator health) AND ``n_eff_tail`` (event
coverage) and re-tilt if either collapses.

Weights are recoverable post-hoc from the ``DispersionSample`` (the
shifted draws are recorded like any others), so the sample pytree schema
— and with it checkpointing and determinism-by-key re-simulation — is
unchanged.
"""

from __future__ import annotations

import numpy as np

__all__ = ["log_weights", "weighted_tail", "weighted_mean"]

# channel -> (sample field, how to get sigma from (params, motor))
_CHANNELS = {
    "mass": ("mass_multiplier",
             lambda p, m: float(p.mass_uncertainty)),
    "motor_thrust": ("motor_thrust_multiplier",
                     lambda p, m: float(np.asarray(m.thrust_uncertainty))),
    "motor_flow": ("motor_flow_multiplier",
                   lambda p, m: float(np.asarray(m.mass_flow_uncertainty))),
    "density": ("density_multiplier",
                lambda p, m: float(p.atmospheric_density_uncertainty)),
}


def log_weights(sample, params, motor, importance_shift) -> np.ndarray:
    """Per-lane log likelihood-ratio back to the nominal distribution.

    ``sample`` holds the draws made UNDER the shifted proposal; the
    standardized value z = (mult - 1)/sigma therefore includes the shift,
    and log w = sum_c(-theta_c z_c + theta_c^2/2) exactly cancels it in
    expectation (E_g[w] = 1 per channel).
    """
    lw = None
    for name, theta in dict(importance_shift).items():
        field, sig_fn = _CHANNELS[name]
        sigma = sig_fn(params, motor)
        if sigma <= 0.0:
            raise ValueError(f"channel {name!r} has zero sigma; it cannot "
                             "have been tilted")
        z = (np.asarray(getattr(sample, field), np.float64) - 1.0) / sigma
        term = -theta * z + 0.5 * theta * theta
        lw = term if lw is None else lw + term
    if lw is None:
        lw = np.zeros(np.asarray(sample.mass_multiplier).shape[0])
    return lw


def _nw(log_w: np.ndarray) -> np.ndarray:
    """Exp-normalized weights (max-subtracted for overflow safety)."""
    lw = np.asarray(log_w, np.float64)
    return np.exp(lw - lw.max())


def weighted_mean(values, mask, log_w) -> dict:
    """Self-normalized IS estimate of E[value | valid] under the NOMINAL
    distribution, with a delta-method stderr and the effective sample
    size. ``mask`` is the validity indicator; both numerator and
    denominator are weighted over ALL lanes (ratio form — see module
    docstring)."""
    v = np.asarray(values, np.float64)
    m = np.asarray(mask, bool) & np.isfinite(v)
    w = _nw(log_w)
    n = w.size
    den = float((w * m).sum())
    if den <= 0.0:
        return {"mean": float("nan"), "stderr": float("nan"),
                "n_eff": 0.0, "n": n}
    mu = float((w * np.where(m, v, 0.0)).sum() / den)
    # delta method on the ratio sum(w y 1)/sum(w 1): per-lane residuals
    r = w * np.where(m, v - mu, 0.0)
    var = float((r ** 2).sum()) / den ** 2
    w_used = w * m
    n_eff = float(w_used.sum() ** 2 / max((w_used ** 2).sum(), 1e-300))
    return {"mean": mu, "stderr": float(np.sqrt(var)),
            "n_eff": n_eff, "n": n}


def weighted_tail(values, mask, log_w, thresholds) -> list:
    """Self-normalized IS estimate of P(value > t | valid) per threshold,
    under the nominal distribution, with delta-method stderr and the
    tail-specific effective sample size (weights restricted to exceeding
    lanes — the number that actually controls the estimate's noise)."""
    v = np.asarray(values, np.float64)
    m = np.asarray(mask, bool) & np.isfinite(v)
    w = _nw(log_w)
    den = float((w * m).sum())
    out = []
    for t in np.atleast_1d(np.asarray(thresholds, np.float64)):
        if den <= 0.0:
            out.append({"threshold": float(t), "probability": float("nan"),
                        "stderr": float("nan"), "n_eff_tail": 0.0,
                        "method": "importance"})
            continue
        hit = m & (v > t)
        if not hit.any():
            # zero weighted hits: the estimate is VACUOUS, not certain.
            # A 0 +- 0 row would read as confidence exactly where the
            # tool is pointed at rare events; stderr=NaN flags it and
            # n_eff_tail=0 quantifies it (re-tilt toward the threshold).
            out.append({"threshold": float(t), "probability": 0.0,
                        "stderr": float("nan"), "n_eff_tail": 0.0,
                        "method": "importance"})
            continue
        p = float((w * hit).sum() / den)
        r = w * (hit.astype(np.float64) - p) * m
        se = float(np.sqrt((r ** 2).sum()) / den)
        wt = w * hit
        n_eff = float(wt.sum() ** 2 / max((wt ** 2).sum(), 1e-300))
        out.append({"threshold": float(t), "probability": p, "stderr": se,
                    "n_eff_tail": n_eff, "method": "importance"})
    return out


# ------------------------------------------------------- automatic tilting
__all__ += ["shift_from_gradients", "auto_shift"]

# importance channel -> the sensitivity CLI's gradient channel
# (cli/sensitivity.py CHANNELS); only the Gaussian multiplier channels are
# tiltable — pitch/wind offsets have non-Gaussian dispersion laws.
_AUTO_GRAD = {
    "mass": "mass_multiplier",
    "motor_thrust": "thrust_multiplier",
    "motor_flow": "flow_multiplier",
    "density": "density_multiplier",
}


def shift_from_gradients(value, grads, sigmas, threshold,
                         frac: float = 0.75, min_theta: float = 0.05):
    """First-order design-point tilt for P(metric > threshold).

    Linearize metric ~ value + sum_c r_c z_c with r_c = gradient_c *
    sigma_c over the standardized tiltable channels. The most likely point
    on the failure boundary (the design point) is z* = (threshold - value)
    / ||r|| along r/||r||; the classic Gaussian mean-shift proposal puts
    the proposal mean there, scaled by ``frac`` (the module guidance:
    over-tilting blows up the self-normalizing denominator's weight
    variance, so 0.5-0.75 of the boundary is the practical optimum).
    Channels with |theta| < ``min_theta`` are dropped — a near-zero tilt
    buys no tail mass but still adds weight noise.

    Returns ``(shift, info)``: the ``importance_shift`` dict (possibly
    empty when the metric barely responds to any tiltable channel) and a
    JSON-ready diagnostic block. First-order only: for strongly curved
    responses the true design point moves off the linearized one — check
    ``n_eff_tail`` on the run as always.
    """
    if not np.isfinite(value):
        raise ValueError(
            f"nominal metric value is non-finite ({value}); the flight "
            "itself diverges — fix the configuration before tilting"
        )
    resp = {}
    for name in _AUTO_GRAD:
        g = grads.get(name)
        sigma = sigmas.get(name, 0.0)
        if g is None or sigma <= 0.0:
            continue  # untiltable (zero-sigma, e.g. motor_flow on solids)
        r = float(g) * float(sigma)
        if not np.isfinite(r):
            # A NaN gradient would sail through every comparison below
            # (NaN compares False) and surface as a misleading "threshold
            # too close to nominal" — name the real problem instead. The
            # documented NaN-prone regime is a reverse pass through a
            # full flight with a diverging parity-aero lane (mc/robust.py).
            raise ValueError(
                f"non-finite gradient for tiltable channel {name!r} "
                f"(gradient*sigma = {r}); the reverse pass through the "
                "flight is NaN — use a windowed SimConfig (max_time) or "
                "energy_consistent_aero, then retry auto tilting"
            )
        resp[name] = r
    lin = float(np.sqrt(sum(r * r for r in resp.values())))
    info = {
        "metric_nominal": float(value),
        "threshold": float(threshold),
        "sigma_linear": lin,
        "response": resp,
        "frac": float(frac),
    }
    if lin <= 0.0:
        raise ValueError(
            "metric has zero linear response to every tiltable channel "
            f"({tuple(_AUTO_GRAD)}); auto tilting cannot help — tilt by "
            "hand or use GPD extrapolation"
        )
    z_star = (float(threshold) - float(value)) / lin
    info["z_star"] = z_star
    shift = {}
    for name, r in resp.items():
        theta = frac * z_star * r / lin
        if abs(theta) >= min_theta:
            shift[name] = theta
    info["shift"] = dict(shift)
    return shift, info


def auto_shift(scene, ic, cfg, metric, threshold, params=None,
               frac: float = 0.75, min_theta: float = 0.05):
    """Pick ``importance_shift`` for P(metric > threshold) automatically:
    one reverse pass through the differentiable flight gives every
    channel's gradient (``cli.sensitivity.metric_sensitivities``), the
    dispersion laws give the sigmas, and the design-point rule above does
    the rest. The reference has no counterpart at either step (no
    gradients, no importance sampling). Returns ``(shift, info)``.
    """
    # lazy import: the gradient helpers live with the CLI they serve and
    # themselves import from mc — importing at module scope would cycle
    from ..cli.sensitivity import _channel_sigmas, metric_sensitivities
    from .dispersions import UncertaintyParams

    if params is None:
        params = UncertaintyParams()
    value, grads = metric_sensitivities(scene, ic, cfg, metric=metric)
    csig = _channel_sigmas(scene, params)
    g = {name: float(grads[field]) for name, field in _AUTO_GRAD.items()}
    s = {name: float(csig[field]) for name, field in _AUTO_GRAD.items()}
    return shift_from_gradients(value, g, s, threshold,
                                frac=frac, min_theta=min_theta)
