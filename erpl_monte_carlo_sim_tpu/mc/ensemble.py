"""Post-stratified statistics over a forecast ensemble.

When ``base_wind`` is an ensemble ``wind[K,N,3]`` (mixture-of-forecasts
dispersion — see ``mc.dispersions``), every lane perturbs a uniformly
drawn member. Each member is then a STRATUM with exactly known
probability 1/K, which buys two things the plain mixture stats cannot
give:

* **Per-member diagnostics** — which forecast member drives the apogee
  / range / flight-time spread (and, via :func:`member_exceedance`, the
  range-safety risk). A go/no-go that is marginal over the mixture is
  often clear-go under most members and clear-no-go under one.
* **A post-stratified mixture estimator** — weighting member means by
  the exact 1/K instead of the realized lane share removes the
  member-allocation noise from the headline means:

      mean_ps   = (1/K) * sum_k mean_k
      stderr_ps = sqrt( (1/K^2) * sum_k var_k / n_k )

  (conditional on the realized per-member valid-lane counts ``n_k``;
  population variance within each member, matching the stats blocks).
  When the member means differ, this is strictly tighter than the plain
  mean's stderr — the between-member variance component is paid with
  certainty, not sampled.

Honesty notes: within-member lanes are treated as i.i.d. (the same
caveat as every stderr in this package — under ``sampler="sobol"`` /
``antithetic`` the true error is smaller and the stderr conservative).
A member with zero valid lanes makes the post-stratified mean
undefined (NaN) — the mixture cannot be reweighted to a stratum that
was never observed; per-member rows still report the members that were.

No reference counterpart: the reference holds exactly one forecast
(`/root/reference/rocket_simulation/monte_carlo.py:31-32`).
"""

from __future__ import annotations

import numpy as np

from .stats import _wilson

__all__ = ["EnsembleAccumulator", "member_exceedance", "METRICS"]

METRICS = ("apogee_altitude", "range", "flight_time")


class EnsembleAccumulator:
    """Slab-mergeable per-member moments for the headline metrics.

    O(K) host state: per (member, metric) Welford moments over VALID
    lanes plus per-member drawn/valid lane counts. ``add`` folds in one
    slab; ``block`` renders the analysis/report dict.
    """

    @classmethod
    def from_base_wind(cls, base_wind) -> "EnsembleAccumulator | None":
        """The analyzer's gate, in one place: an accumulator when
        ``base_wind`` carries an ensemble profile (``[K>=2, N, 3]``),
        None otherwise (single forecasts and K=1 "ensembles" get no
        block). Reads only ``.ndim``/``.shape`` — no host copy of the
        table when it lives on device."""
        if base_wind is None:
            return None
        prof = base_wind[1]
        if not hasattr(prof, "ndim"):
            prof = np.asarray(prof)
        if prof.ndim == 3 and prof.shape[0] >= 2:
            return cls(int(prof.shape[0]))
        return None

    def __init__(self, n_members: int):
        if n_members < 2:
            raise ValueError(
                f"ensemble stats need >= 2 members, got {n_members}"
            )
        self.k = int(n_members)
        self.n_drawn = np.zeros(self.k, np.int64)
        self.n_valid = np.zeros(self.k, np.int64)
        self._n = {m: np.zeros(self.k, np.int64) for m in METRICS}
        self._mean = {m: np.zeros(self.k) for m in METRICS}
        self._m2 = {m: np.zeros(self.k) for m in METRICS}

    def add(self, members: np.ndarray, valid: np.ndarray,
            metrics: dict) -> None:
        """Fold in one slab: ``members`` [n] int, ``valid`` [n] bool,
        ``metrics`` {name: [n] float} (the analyzer's slab readbacks)."""
        members = np.asarray(members)
        valid = np.asarray(valid, bool)
        self.n_drawn += np.bincount(members, minlength=self.k)
        self.n_valid += np.bincount(members[valid], minlength=self.k)
        for name in METRICS:
            v = np.asarray(metrics[name], np.float64)
            ok = valid & np.isfinite(v)
            mem = members[ok]
            vv = v[ok]
            nb = np.bincount(mem, minlength=self.k).astype(np.float64)
            sb = np.bincount(mem, weights=vv, minlength=self.k)
            mb = np.divide(sb, nb, out=np.zeros(self.k), where=nb > 0)
            m2b = np.bincount(
                mem, weights=(vv - mb[mem]) ** 2, minlength=self.k
            )
            # Chan/Welford parallel merge per member (f64)
            na = self._n[name].astype(np.float64)
            tot = na + nb
            delta = mb - self._mean[name]
            safe_tot = np.where(tot > 0, tot, 1.0)
            self._mean[name] += np.where(
                tot > 0, delta * nb / safe_tot, 0.0
            )
            self._m2[name] += m2b + np.where(
                tot > 0, delta * delta * na * nb / safe_tot, 0.0
            )
            self._n[name] = tot.astype(np.int64)

    def block(self) -> dict:
        """The ``analysis["ensemble"]`` block."""
        members = []
        for j in range(self.k):
            row = {"member": j, "n_drawn": int(self.n_drawn[j]),
                   "n_valid": int(self.n_valid[j])}
            for name in METRICS:
                n = int(self._n[name][j])
                row[name] = {
                    "n": n,
                    "mean": self._mean[name][j] if n else float("nan"),
                    "std": (float(np.sqrt(self._m2[name][j] / n))
                            if n else float("nan")),
                }
            members.append(row)
        post = {}
        for name in METRICS:
            n = self._n[name].astype(np.float64)
            if (n >= 1).all():
                mean_ps = float(self._mean[name].mean())
                var_k = self._m2[name] / n  # population variance
                with np.errstate(divide="ignore"):
                    se2 = float((var_k / n).sum()) / self.k ** 2
                stderr = float(np.sqrt(se2)) if (n >= 2).all() \
                    else float("nan")
            else:
                mean_ps, stderr = float("nan"), float("nan")
            post[name] = {"mean": mean_ps, "stderr": stderr}
        return {
            "n_members": self.k,
            "members": members,
            "post_stratified": post,
        }


def member_exceedance(analysis: dict, metric: str, threshold: float) -> list:
    """P(metric > threshold | member k), exact with Wilson 95% CI per
    ensemble member, plus the post-stratified mixture probability
    p_ps = (1/K) sum_k p_k with a per-stratum stderr derived from each
    member's Wilson interval half-width (nonzero at p=0/1, where the
    Wald p(1-p)/n term would claim false certainty).

    Needs the per-lane layout (``analysis["wind_members"]`` next to the
    retained metrics — single-call runs and slabbed runs within the
    sample cap); streaming runs past the cap keep only the accumulated
    ``analysis["ensemble"]`` moments, which cannot answer an arbitrary
    threshold after the fact — re-run with the threshold as a
    ``run_to_precision`` criterion instead.
    """
    if analysis.get("importance"):
        # raw counts on a tilted population answer the proposal
        # distribution, not the nominal one — route through
        # mc.importance.weighted_tail per member instead of silently
        # reporting the wrong probabilities
        raise ValueError(
            "importance-sampled run: member_exceedance counts unweighted "
            "lanes; use mc.exceedance_from_analysis (whole mixture) or "
            "weight per member with mc.importance.weighted_tail"
        )
    members = analysis.get("wind_members")
    ens = analysis.get("ensemble")
    if members is None or ens is None:
        raise ValueError(
            "no per-lane ensemble data: run with an ensemble base_wind "
            "and within the metrics sample cap"
        )
    metrics = analysis.get("metrics")
    if metrics is not None and metric in metrics:
        vals = np.asarray(metrics[metric], np.float64)
    elif analysis.get("summary") is not None:
        vals = np.asarray(getattr(analysis["summary"], metric), np.float64)
    else:
        raise KeyError(f"no per-lane data for metric {metric!r}")
    valid = np.asarray(analysis["valid_mask"], bool)[:vals.size]
    members = np.asarray(members)[:vals.size]
    if analysis.get("metrics_is_sample"):
        # capped prefix: an honest per-member answer needs every lane
        raise ValueError(
            "streaming run: per-lane data is a capped sample; "
            "member_exceedance would silently answer on the prefix only"
        )
    k = int(ens["n_members"])
    ok = valid & np.isfinite(vals)
    out = []
    p_sum, se2_sum, defined = 0.0, 0.0, True
    z95 = 1.959963984540054
    for j in range(k):
        sel = ok & (members == j)
        n = int(sel.sum())
        hits = int((vals[sel] > threshold).sum())
        lo, hi = _wilson(hits, n)
        p = hits / n if n else float("nan")
        out.append({"member": j, "n": n, "n_exceed": hits,
                    "probability": p, "ci95": [lo, hi]})
        if n == 0:
            defined = False
        else:
            p_sum += p
            # per-member variance from the Wilson score interval, not the
            # Wald p(1-p)/n: a member with 0 (or n) exceedances would
            # otherwise contribute EXACTLY zero variance and the mixture
            # stderr would claim certainty its own per-member CIs deny
            se2_sum += ((hi - lo) / (2.0 * z95)) ** 2
    post = {
        "probability": p_sum / k if defined else float("nan"),
        "stderr": (float(np.sqrt(se2_sum)) / k) if defined
        else float("nan"),
    }
    return [{"threshold": float(threshold), "members": out,
             "post_stratified": post}]
