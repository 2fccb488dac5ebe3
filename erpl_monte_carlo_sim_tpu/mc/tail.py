"""Extreme-value tail extrapolation (peaks-over-threshold / GPD).

Plain counting answers P(metric > t) only while lanes actually land past
``t`` (the Wilson CI in ``mc.stats.exceedance`` is honest about running
out); importance sampling (``mc.importance``) reaches deeper but needs a
chosen tilt direction. This module adds the third classical tool: fit a
generalized Pareto distribution to the sample's largest values
(Pickands–Balkema–de Haan: exceedances over a high threshold converge to
GPD for essentially every distribution in practice) and extrapolate the
survival function beyond the data's reach — from a PLAIN run, any
metric, no tilt choice.

Slab/streaming compatibility: ``TailReservoir`` keeps the top-k (and
bottom-k) values seen across slabs — an exact, mergeable, O(k) reduction
— so 100M-lane streaming runs retain enough order statistics to fit a
tail even though their per-lane arrays are never materialized. The
reservoir rides the mid-run checkpoint (``mc.slab_checkpoint``).

Estimation: probability-weighted moments (Hosking & Wallis 1987) — the
closed-form, no-optimizer GPD fit with good small-sample behavior for
|shape| < 1/2 (heavier tails than that are flagged, not hidden).
Uncertainty: bootstrap over the exceedances joint with Jeffreys-Beta
resampling of the threshold exceedance rate, so the CI carries both the
shape/scale and the counting noise.

Measured guidance (NOTES.md tail-estimator study, 8-key paired run at
p = 2e-3): for thresholds plain counting can still reach, GPD fitted to
the same lanes matches counting's RMS error exactly (66% vs 66% at
n=1024) — shape uncertainty at a ~60x extrapolation replaces the
binomial noise one-for-one — and its tighter claimed CI mildly
undercovers (7/8). Use GPD for what counting categorically cannot do:
thresholds BEYOND the deepest observed lane, where counting returns an
exact 0 with a vacuous CI. When a tilt direction is available, prefer
``mc.importance`` (3.4x lower RMS at the same lane count, measured).

Honest limits (documented, enforced where possible):
  * extrapolation VALIDITY rests on the GPD tail approximation at the
    chosen threshold — the ``fit`` block reports threshold, n_tail and
    shape so the regime is visible; vary ``n_tail`` as a sensitivity
    check.
  * results describe the SAMPLED population; on importance-tilted runs
    use ``mc.importance.weighted_tail`` instead (this module refuses).

Reference counterpart: none (the reference reports fixed percentiles,
`monte_carlo.py:444-459`); this exists because range-safety questions
(P(landing beyond the exclusion radius), P(apogee above the ceiling))
live exactly where counting runs out.
"""

from __future__ import annotations

import numpy as np

__all__ = ["TailReservoir", "fit_gpd_pwm", "gpd_tail",
           "tail_from_analysis"]


class TailReservoir:
    """Exact top-k / bottom-k order statistics over a stream of slabs.

    ``add`` folds in one batch (non-finite values dropped — they are the
    outlier filter's problem); ``hi``/``lo`` hold the largest/smallest
    ``k`` values seen so far, ``n`` the total count. Merging two
    reservoirs is ``add`` on either's arrays; the result is independent
    of slab order (exact order statistics, not a sketch).
    """

    def __init__(self, k: int = 4096):
        self.k = int(k)
        self.n = 0
        self.hi = np.empty(0)
        self.lo = np.empty(0)

    def add(self, values) -> None:
        v = np.asarray(values, np.float64).ravel()
        v = v[np.isfinite(v)]
        if v.size == 0:
            return
        self.n += v.size
        hi = np.concatenate([self.hi, v])
        lo = np.concatenate([self.lo, v])
        if hi.size > self.k:
            hi = np.partition(hi, hi.size - self.k)[hi.size - self.k:]
            lo = np.partition(lo, self.k)[:self.k]
        self.hi = np.sort(hi)
        self.lo = np.sort(lo)

    def merge(self, other: "TailReservoir") -> None:
        """Exact merge of another reservoir: each side merges
        independently (the global top-k of a union lies in the union of
        the parts' top-ks), counts add. NOT ``add`` on the other's
        arrays — when a small reservoir holds a value in BOTH sides,
        ``add`` would double-count it."""
        self.n += other.n
        hi = np.concatenate([self.hi, other.hi])
        lo = np.concatenate([self.lo, other.lo])
        self.hi = np.sort(hi)[-min(self.k, hi.size):]
        self.lo = np.sort(lo)[:min(self.k, lo.size)]

    def to_arrays(self, out: dict, prefix: str) -> None:
        """Serialize into ``out`` under ``prefix`` (npz-ready arrays).
        The ONE layout both checkpoint formats use (``mc.checkpoint``,
        ``mc.slab_checkpoint``) — change it here, nowhere else."""
        out[prefix + "hi"] = self.hi
        out[prefix + "lo"] = self.lo
        out[prefix + "nk"] = np.asarray([self.n, self.k], np.int64)

    @classmethod
    def from_arrays(cls, z, prefix: str) -> "TailReservoir":
        """Inverse of ``to_arrays`` (``z``: a loaded npz / mapping)."""
        n_seen, k_keep = (int(x) for x in z[prefix + "nk"])
        r = cls(k_keep)
        r.n = n_seen
        r.hi = np.array(z[prefix + "hi"], np.float64)
        r.lo = np.array(z[prefix + "lo"], np.float64)
        return r


def fit_gpd_pwm(exceedances) -> tuple:
    """(shape xi, scale sigma) of a GPD fitted to positive exceedances by
    probability-weighted moments (Hosking & Wallis 1987, eq. for b0/b1;
    their k is -xi). Survival: P(Y > y) = (1 + xi y / sigma)^(-1/xi),
    exp(-y/sigma) at xi = 0."""
    y = np.sort(np.asarray(exceedances, np.float64))
    n = y.size
    if n < 10:
        raise ValueError(f"need >= 10 exceedances to fit a tail, got {n}")
    # alpha_s = E[X (1 - F(X))^s]; for GPD(k, a): a0 = a/(1+k),
    # a1 = a/(2(2+k)) => k = a0/(a0 - 2 a1) - 2, a = a0 (1+k).
    # The plotting-position estimate of (1 - F) at the i-th ascending
    # order statistic is (n-1-i)/(n-1) — DESCENDING weights.
    a0 = y.mean()
    a1 = (((n - 1.0 - np.arange(n)) / (n - 1.0)) * y).mean()
    denom = a0 - 2.0 * a1
    # Degenerate samples (all exceedances equal, or all mass on the
    # single top order statistic) drive denom -> 0 or sigma <= 0; the
    # raw formulas would return inf/NaN shapes that downstream callers
    # would silently propagate as probability = NaN. Refuse instead
    # (bootstrap refits catch ValueError and record a NaN replicate).
    if not (a0 > 0.0) or abs(denom) < 1e-12 * a0:
        raise ValueError(
            "degenerate exceedances (constant or heavily tied tail) — "
            "the GPD fit is undefined; use counting or change n_tail"
        )
    k = a0 / denom - 2.0  # Hosking's shape (= -xi)
    sigma = a0 * (1.0 + k)
    if not np.isfinite(sigma) or sigma <= 0.0:
        raise ValueError(
            "GPD fit collapsed (non-positive scale) — exceedances are "
            "too degenerate to extrapolate; use counting or change n_tail"
        )
    return float(-k), float(sigma)


def _gpd_sf(y, xi, sigma):
    """GPD survival at exceedance y >= 0 (vectorized, xi -> 0 stable)."""
    y = np.maximum(np.asarray(y, np.float64), 0.0)
    if abs(xi) < 1e-9:
        return np.exp(-y / sigma)
    arg = 1.0 + xi * y / sigma
    if xi < 0.0:
        # bounded upper tail at y = -sigma/xi: zero beyond it
        return np.where(arg > 0.0, np.maximum(arg, 0.0) ** (-1.0 / xi), 0.0)
    return arg ** (-1.0 / xi)


def gpd_tail(values, n_total: int, thresholds, *, side: str = "upper",
             n_tail: int = 1000, n_boot: int = 500, seed: int = 0) -> dict:
    """GPD tail extrapolation from the ``n_tail`` most extreme ``values``.

    ``values``: the sample's extreme order statistics on the queried
    side (a full metric array works too — only the tail is used).
    ``n_total``: the size of the sample they came from (sets the
    threshold exceedance rate p_u = n_tail / n_total).
    Returns ``{"fit": {...}, "exceedance": [{threshold, probability,
    ci95, method}, ...]}`` with probabilities P(X > t) for upper /
    P(X < t) for lower tails; thresholds at or below (above) the fitted
    threshold fall back to counting within the provided values.
    ``n_boot=0`` skips the bootstrap entirely (no ``ci95`` keys) — the
    cheap point-estimate mode for probes that only need the fit.
    """
    if side not in ("upper", "lower"):
        raise ValueError("side must be 'upper' or 'lower'")
    v = np.asarray(values, np.float64).ravel()
    v = v[np.isfinite(v)]
    if side == "lower":
        v = -v
    v = np.sort(v)
    if n_total < v.size:
        raise ValueError("n_total is smaller than the provided values")
    n_tail = int(min(n_tail, v.size - 1))
    if n_tail < 10:
        raise ValueError(
            f"need >= 10 exceedances (have {v.size} values); lower n_tail "
            "or provide more extremes"
        )
    u = v[-(n_tail + 1)]  # threshold: the (n_tail+1)-th largest value
    exc = v[-n_tail:] - u
    p_u = n_tail / float(n_total)
    xi, sigma = fit_gpd_pwm(exc)

    ts = np.atleast_1d(np.asarray(thresholds, np.float64))
    ts_i = -ts if side == "lower" else ts
    # at/below the threshold the empirical count among the retained
    # extremes is exact (they ARE the top of the sample); counting is
    # strictly better there
    count_p = (v.size - np.searchsorted(v, ts_i, side="right")) / float(
        n_total
    )
    p = np.where(ts_i > u, p_u * _gpd_sf(ts_i - u, xi, sigma), count_p)
    # count-based probabilities measure "rank among ALL n_total": exact
    # everywhere when v IS the full sample, otherwise only where the
    # retained top-k window covers the rank
    in_window = (ts_i > v[0]) | (v.size == n_total)

    rng = np.random.default_rng(seed)
    boots = np.empty((n_boot, ts.size))
    for b in range(n_boot):
        yb = rng.choice(exc, size=n_tail, replace=True)
        try:
            xib, sigb = fit_gpd_pwm(yb)
        except ValueError:
            boots[b] = np.nan
            continue
        pub = rng.beta(n_tail + 0.5, n_total - n_tail + 0.5)
        boots[b] = np.where(ts_i > u, pub * _gpd_sf(ts_i - u, xib, sigb),
                            np.nan)
    extr = ts_i > u
    lohi = np.full((2, ts.size), np.nan)
    if n_boot > 0 and extr.any():  # count columns are all-NaN anyway
        lohi[:, extr] = np.nanpercentile(boots[:, extr], [2.5, 97.5],
                                         axis=0)

    out = {
        "fit": {
            "side": side,
            "threshold": float(u if side == "upper" else -u),
            "n_tail": n_tail,
            "n_total": int(n_total),
            "p_threshold": p_u,
            "shape_xi": xi,
            "scale_sigma": sigma,
            # PWM is reliable for |xi| < 0.5; heavier tails need MLE and
            # more data — surfaced, not hidden
            "pwm_regime_ok": bool(abs(xi) < 0.5),
        },
        "exceedance": [],
    }
    for j, t in enumerate(ts):
        extrapolated = bool(ts_i[j] > u)
        row = {
            "threshold": float(t),
            "probability": float(p[j]) if in_window[j] else float("nan"),
            "method": "gpd" if extrapolated else "count",
        }
        if extrapolated and n_boot > 0:
            row["ci95"] = [float(lohi[0, j]), float(lohi[1, j])]
        elif not in_window[j]:
            row["note"] = ("threshold below the retained extremes; use "
                           "mc.exceedance_from_analysis")
        out["exceedance"].append(row)
    return out


def tail_from_analysis(analysis: dict, metric: str, thresholds, *,
                       side: str = "upper", n_tail: int = 1000,
                       n_boot: int = 500, seed: int = 0) -> dict:
    """``gpd_tail`` on a finished analyzer run, whatever its layout:
    per-lane arrays when they exist (single-call via ``summary``, slabbed
    via ``metrics``), the top-k/bottom-k ``tail_reservoirs`` on streaming
    runs. Only VALID lanes enter (tail estimates conditioned on the
    outlier filter, same population as every other stats block)."""
    if analysis.get("importance"):
        raise ValueError(
            "GPD extrapolation on an importance-tilted run would describe "
            "the SHIFTED population; use mc.importance.weighted_tail"
        )
    res = (analysis.get("tail_reservoirs") or {}).get(metric)
    if analysis.get("metrics_is_sample") and res is not None:
        vals = res.hi if side == "upper" else res.lo
        return gpd_tail(vals, res.n, thresholds, side=side, n_tail=n_tail,
                        n_boot=n_boot, seed=seed)
    if analysis.get("summary") is not None:
        if not hasattr(analysis["summary"], metric):
            raise KeyError(f"no per-lane data for metric {metric!r}")
        vals = np.asarray(getattr(analysis["summary"], metric))
    else:
        metrics = analysis.get("metrics") or {}
        if metric not in metrics:
            raise KeyError(f"no per-lane data for metric {metric!r}")
        vals = np.asarray(metrics[metric])
    mask = np.asarray(analysis["valid_mask"]) & np.isfinite(vals)
    return gpd_tail(vals[mask], int(mask.sum()), thresholds, side=side,
                    n_tail=n_tail, n_boot=n_boot, seed=seed)
