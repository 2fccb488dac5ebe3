"""Sequential (run-to-precision) Monte Carlo: stop when the answer is
known well enough.

The reference can only run a FIXED sample count per invocation
(`/root/reference/rocket_simulation/monte_carlo.py:52` — ``n_samples`` is
an input, and picking it is the user's problem: too small and the
percentiles are noise, too large and the pool burns hours). This module
turns the question around: state the precision the decision needs — a
standard error on a headline mean, a confidence-interval half-width on an
exceedance probability, or a go/no-go verdict against a probability limit
— and the analyzer keeps folding in slabs until every criterion is met or
a lane budget runs out.

It composes machinery the slab loop already has: each slab's dispersions
depend only on ``(key, slab_idx, slab)``, so stopping after slab k is
EXACTLY the run that asked for k*slab lanes (pinned by test) — no
estimator changes, no re-weighting, the analysis dict is the ordinary
one plus a ``"sequential"`` block.

Honesty notes, in the docstrings of the criteria they apply to:

* **Optional stopping.** Stopping on a data-dependent rule makes the
  realized coverage of the FINAL interval slightly below nominal (the
  classic sequential-analysis caveat): the run stops precisely when the
  interval looks narrow, which selects for lucky-narrow realizations. At
  slab-sized batches (hundreds+ of lanes per look, a handful of looks)
  the effect is second order; decision rules that must be strictly
  conservative should tighten ``p_limit``/``z`` rather than trust the
  nominal 95% exactly.
* **I.i.d. assumption.** Criterion state treats valid lanes as i.i.d.
  draws. Under ``sampler="sobol"`` or ``antithetic=True`` the true error
  of the accumulated estimate is SMALLER than the i.i.d. formula says
  (negative correlation), so the stop is conservative — it runs longer
  than strictly needed, never shorter.
* **Importance sampling** is rejected: weighted estimators need the
  per-lane weights and their own stderr; IS exists to make n small, so a
  sequential wrapper adds nothing there.
"""

from __future__ import annotations

import numpy as np

from .stats import StreamingStats, _wilson, order_stat_ranks

__all__ = [
    "MeanStderr",
    "QmcMeanStderr",
    "ExceedanceDecision",
    "ExceedanceHalfwidth",
    "QuantileHalfwidth",
    "parse_criterion",
    "HEADLINE_METRICS",
]

HEADLINE_METRICS = ("apogee_altitude", "range", "flight_time", "max_speed")


class _Criterion:
    """Shared shape: fold in one slab's valid-lane metric values, answer
    ``satisfied()``, and report a JSON-ready ``block()``."""

    metric: str

    def update(self, vals_valid: np.ndarray) -> None:
        raise NotImplementedError

    def satisfied(self) -> bool:
        raise NotImplementedError

    def block(self) -> dict:
        raise NotImplementedError


class MeanStderr(_Criterion):
    """Stop when stderr(mean of ``metric``) <= ``target``.

    Population-variance stderr over the valid lanes seen so far (the same
    variance convention as the stats blocks). Needs at least two lanes.
    """

    def __init__(self, metric: str, target: float):
        if target <= 0:
            raise ValueError(f"mean_stderr target must be > 0, got {target}")
        self.metric = metric
        self.target = float(target)
        self.n = 0
        self.s = 0.0
        self.s2 = 0.0

    def update(self, vals_valid: np.ndarray) -> None:
        v = np.asarray(vals_valid, np.float64)
        v = v[np.isfinite(v)]
        self.n += int(v.size)
        self.s += float(v.sum())
        self.s2 += float((v * v).sum())

    def stderr(self) -> float:
        if self.n < 2:
            return float("inf")
        mean = self.s / self.n
        var = max(self.s2 / self.n - mean * mean, 0.0)
        return float(np.sqrt(var / self.n))

    def satisfied(self) -> bool:
        return self.stderr() <= self.target

    def block(self) -> dict:
        return {
            "kind": "mean_stderr",
            "metric": self.metric,
            "target": self.target,
            "n": self.n,
            "mean": (self.s / self.n) if self.n else float("nan"),
            "stderr": self.stderr() if self.n >= 2 else float("nan"),
            "satisfied": bool(self.satisfied()),
        }


class ExceedanceDecision(_Criterion):
    """Stop when P(metric > threshold) is DECIDED against ``p_limit``:
    the Wilson 95% interval lies entirely below it (``"go"``) or entirely
    above it (``"no_go"``). The launch-window rule
    (`cli.launch_window`: go iff Wilson upper bound <= p_limit), made
    sequential — candidates far from the boundary decide in one slab,
    only boundary cases spend the lane budget."""

    def __init__(self, metric: str, threshold: float, p_limit: float):
        if not 0.0 < p_limit < 1.0:
            raise ValueError(f"p_limit must be in (0, 1), got {p_limit}")
        self.metric = metric
        self.threshold = float(threshold)
        self.p_limit = float(p_limit)
        self.n = 0
        self.k = 0

    def update(self, vals_valid: np.ndarray) -> None:
        v = np.asarray(vals_valid, np.float64)
        v = v[np.isfinite(v)]
        self.n += int(v.size)
        self.k += int((v > self.threshold).sum())

    def decision(self):
        if self.n == 0:
            return None
        lo, hi = _wilson(self.k, self.n)
        if hi <= self.p_limit:
            return "go"
        if lo > self.p_limit:
            return "no_go"
        return None

    def satisfied(self) -> bool:
        return self.decision() is not None

    def block(self) -> dict:
        lo, hi = _wilson(self.k, self.n)
        return {
            "kind": "exceedance_decision",
            "metric": self.metric,
            "threshold": self.threshold,
            "p_limit": self.p_limit,
            "n": self.n,
            "n_exceed": self.k,
            "probability": (self.k / self.n) if self.n else float("nan"),
            "ci95": [lo, hi],
            "decision": self.decision(),
            "satisfied": bool(self.satisfied()),
        }


class ExceedanceHalfwidth(_Criterion):
    """Stop when the Wilson 95% interval for P(metric > threshold) has
    half-width <= ``target`` — "know the tail probability to +-x"."""

    def __init__(self, metric: str, threshold: float, target: float):
        if target <= 0:
            raise ValueError(
                f"ci_halfwidth target must be > 0, got {target}"
            )
        self.metric = metric
        self.threshold = float(threshold)
        self.target = float(target)
        self.n = 0
        self.k = 0

    def update(self, vals_valid: np.ndarray) -> None:
        v = np.asarray(vals_valid, np.float64)
        v = v[np.isfinite(v)]
        self.n += int(v.size)
        self.k += int((v > self.threshold).sum())

    def halfwidth(self) -> float:
        if self.n == 0:
            return float("inf")
        lo, hi = _wilson(self.k, self.n)
        return (hi - lo) / 2.0

    def satisfied(self) -> bool:
        return self.halfwidth() <= self.target

    def block(self) -> dict:
        lo, hi = _wilson(self.k, self.n)
        return {
            "kind": "exceedance_halfwidth",
            "metric": self.metric,
            "threshold": self.threshold,
            "target": self.target,
            "n": self.n,
            "n_exceed": self.k,
            "probability": (self.k / self.n) if self.n else float("nan"),
            "ci95": [lo, hi],
            "halfwidth": self.halfwidth() if self.n else float("nan"),
            "satisfied": bool(self.satisfied()),
        }


class QmcMeanStderr(_Criterion):
    """Stop when the RANDOMIZED-QMC stderr of the ``metric`` mean is <=
    ``target`` — the sequential rule that actually exploits
    ``sampler="sobol"``.

    Under the analyzer's slab keying every slab draws its own
    independent Owen scramble, so slab means are i.i.d. unbiased
    replicates of the QMC estimator and their sample spread is a
    statistically valid stderr for the pooled mean — typically far
    smaller than the i.i.d. per-lane formula :class:`MeanStderr` uses
    (which ignores the negative within-slab correlation QMC buys and so
    over-runs by the full QMC gain; see the NOTES.md convergence
    studies). Needs at least ``min_replicates`` slabs before it can
    stop (a 2-replicate variance estimate is noise); the precision a
    single replicate reaches scales with ``lane_slab``, so the knob for
    "more accuracy per look" is the slab size.

    ``run_to_precision`` rejects this criterion unless the analyzer
    sampler is ``"sobol"`` — on prng draws the slab means are plain
    i.i.d. batch means and :class:`MeanStderr` is both valid and
    lane-for-lane tighter (batch-mean stderr wastes the within-slab
    information).
    """

    requires_sobol = True

    def __init__(self, metric: str, target: float, min_replicates: int = 4):
        if target <= 0:
            raise ValueError(
                f"qmc_mean_stderr target must be > 0, got {target}"
            )
        if min_replicates < 2:
            raise ValueError(
                f"min_replicates must be >= 2, got {min_replicates}"
            )
        self.metric = metric
        self.target = float(target)
        self.min_replicates = int(min_replicates)
        self.slab_means: list = []
        self.slab_ns: list = []

    def update(self, vals_valid: np.ndarray) -> None:
        v = np.asarray(vals_valid, np.float64)
        v = v[np.isfinite(v)]
        # an all-invalid slab contributes no replicate (matching the
        # analyzer's qmc_blocks NaN convention)
        if v.size:
            self.slab_means.append(float(v.mean()))
            self.slab_ns.append(int(v.size))

    def mean(self) -> float:
        if not self.slab_means:
            return float("nan")
        # lane-weighted pool == the plain mean over all valid lanes
        m = np.asarray(self.slab_means)
        w = np.asarray(self.slab_ns, np.float64)
        return float((m * w).sum() / w.sum())

    def stderr(self) -> float:
        k = len(self.slab_means)
        if k < self.min_replicates:
            return float("inf")
        m = np.asarray(self.slab_means)
        return float(m.std(ddof=1) / np.sqrt(k))

    def satisfied(self) -> bool:
        return self.stderr() <= self.target

    def block(self) -> dict:
        k = len(self.slab_means)
        return {
            "kind": "qmc_mean_stderr",
            "metric": self.metric,
            "target": self.target,
            "n": int(sum(self.slab_ns)),
            "n_replicates": k,
            "min_replicates": self.min_replicates,
            "mean": self.mean(),
            "stderr": self.stderr() if k >= self.min_replicates
            else float("nan"),
            "satisfied": bool(self.satisfied()),
        }


class QuantileHalfwidth(_Criterion):
    """Stop when the distribution-free 95% CI on the ``percentile``-th
    percentile has half-width <= ``target`` — "know the p99 range to
    +-x m". Ranks come from the binomial order-statistic interval
    (``mc.stats.order_stat_ranks``); while either rank falls outside the
    sample (deep-tail percentile, n still too small to resolve it) the
    half-width reports ``inf`` and the run keeps going — clamping to the
    sample extremes there would declare false precision.

    Values accumulate in a :class:`~.stats.StreamingStats` sketch so a
    long run holds O(max_centroids) state, not O(n); past the exact
    buffer the sketch's rank-error slack WIDENS the interval, so stopping
    stays conservative.
    """

    def __init__(self, metric: str, percentile: float, target: float,
                 max_centroids: int = 8192, exact_threshold: int = 262_144):
        if not 0.0 < percentile < 100.0:
            raise ValueError(
                f"percentile must be in (0, 100), got {percentile}"
            )
        if target <= 0:
            raise ValueError(
                f"ci_halfwidth target must be > 0, got {target}"
            )
        self.metric = metric
        self.percentile = float(percentile)
        self.target = float(target)
        self.stream = StreamingStats(max_centroids, exact_threshold)

    def update(self, vals_valid: np.ndarray) -> None:
        self.stream.add(vals_valid)

    def ci(self) -> list:
        n = self.stream.n
        if n < 2:
            return [float("nan"), float("nan")]
        l, u = order_stat_ranks(n, self.percentile / 100.0)
        if l < 1 or u > n:
            return [-float("inf"), float("inf")]
        return self.stream.percentile_ci([self.percentile])[0]

    def halfwidth(self) -> float:
        lo, hi = self.ci()
        return (hi - lo) / 2.0 if np.isfinite(hi - lo) else float("inf")

    def satisfied(self) -> bool:
        return self.halfwidth() <= self.target

    def block(self) -> dict:
        n = self.stream.n
        est = (self.stream.percentiles([self.percentile])[0] if n
               else float("nan"))
        return {
            "kind": "quantile_halfwidth",
            "metric": self.metric,
            "percentile": self.percentile,
            "target": self.target,
            "n": n,
            "estimate": est,
            "ci95": self.ci(),
            "halfwidth": self.halfwidth(),
            "satisfied": bool(self.satisfied()),
        }


def parse_criterion(spec) -> _Criterion:
    """Build a criterion from a spec dict (specs pass through unchanged
    if already criterion instances):

    * ``{"metric": m, "mean_stderr": x}`` -> :class:`MeanStderr`
    * ``{"metric": m, "qmc_mean_stderr": x}`` -> :class:`QmcMeanStderr`
      (``sampler="sobol"`` runs only)
    * ``{"metric": m, "exceed": t, "p_limit": p}`` ->
      :class:`ExceedanceDecision`
    * ``{"metric": m, "exceed": t, "ci_halfwidth": h}`` ->
      :class:`ExceedanceHalfwidth`
    * ``{"metric": m, "percentile": q, "ci_halfwidth": h}`` ->
      :class:`QuantileHalfwidth`
    """
    if isinstance(spec, _Criterion):
        return spec
    if not isinstance(spec, dict):
        raise TypeError(
            f"criterion must be a dict or Criterion, got {type(spec)}"
        )
    metric = spec.get("metric")
    if metric not in HEADLINE_METRICS:
        raise ValueError(
            f"criterion metric must be one of {HEADLINE_METRICS}, "
            f"got {metric!r}"
        )
    keys = set(spec) - {"metric"}
    if keys == {"mean_stderr"}:
        return MeanStderr(metric, spec["mean_stderr"])
    if keys == {"qmc_mean_stderr"}:
        return QmcMeanStderr(metric, spec["qmc_mean_stderr"])
    if keys == {"exceed", "p_limit"}:
        return ExceedanceDecision(metric, spec["exceed"], spec["p_limit"])
    if keys == {"exceed", "ci_halfwidth"}:
        return ExceedanceHalfwidth(
            metric, spec["exceed"], spec["ci_halfwidth"]
        )
    if keys == {"percentile", "ci_halfwidth"}:
        return QuantileHalfwidth(
            metric, spec["percentile"], spec["ci_halfwidth"]
        )
    raise ValueError(
        "criterion spec must be {metric, mean_stderr}, "
        "{metric, qmc_mean_stderr}, "
        "{metric, exceed, p_limit}, {metric, exceed, ci_halfwidth}, "
        "or {metric, percentile, ci_halfwidth}; "
        f"got keys {sorted(spec)}"
    )
