"""Monte Carlo checkpoint / resume.

The reference's closest notion of resume is 'every trajectory is a JSON file
and seeds are deterministic' (SURVEY.md §5.4). Here resume is first-class:

  * an analysis' per-lane summaries + masks + dispersion samples round-trip
    through one compressed ``.npz`` (``save_summaries`` / ``load_summaries``),
  * determinism-by-key means any subset of lanes is exactly re-creatable
    from (seed, lane index) — ``MonteCarloAnalyzer.resimulate_trajectories``
    rebuilds full trajectories on demand,
  * sharded runs can checkpoint per-host shards independently (each shard's
    lane indices are global).
"""

from __future__ import annotations

import json

import jax
import numpy as np

from ..engine.rail import RailInfo
from ..engine.simulate import FlightSummary

__all__ = ["save_summaries", "load_summaries"]

_META_KEY = "__meta__"


def save_summaries(path: str, analysis: dict, seed: int | None = None) -> None:
    """Persist the SoA lane results of ``run_monte_carlo`` to one .npz."""
    arrays = {}
    summary = analysis["summary"]
    slabbed = summary is None
    if slabbed:
        # Auto-slabbed analyses keep per-lane headline metrics only (the
        # full SoA is never materialized at 10M+ lanes). Persist those —
        # silently writing an unloadable checkpoint would lose exactly the
        # runs the slab path exists for.
        for name, arr in analysis["metrics"].items():
            arrays["metrics." + name] = np.asarray(arr)
        # streaming runs: persist the top-k/bottom-k order statistics so
        # post-hoc GPD tail queries (mc.tail.tail_from_analysis) work on
        # loaded checkpoints exactly as on the live analysis
        for name, r in (analysis.get("tail_reservoirs") or {}).items():
            r.to_arrays(arrays, f"tail.{name}.")
    else:
        for key_path, leaf in jax.tree_util.tree_flatten_with_path(summary)[0]:
            name = "summary" + jax.tree_util.keystr(key_path)
            arrays[name] = np.asarray(leaf)
        sample = analysis["sample"]
        for key_path, leaf in jax.tree_util.tree_flatten_with_path(sample)[0]:
            arrays["sample" + jax.tree_util.keystr(key_path)] = np.asarray(leaf)
    arrays["valid_mask"] = np.asarray(analysis["valid_mask"])
    arrays["reasons"] = np.asarray(analysis["reasons"])
    if analysis.get("wind_members") is not None:
        # forecast-ensemble member indices (mc.ensemble) — persisted in
        # both layouts so member_exceedance works on loaded checkpoints
        arrays["wind_members"] = np.asarray(analysis["wind_members"])
    meta = {
        # Streaming slabbed runs cap the per-lane arrays at the sample cap;
        # n_total (when present) records the true run size.
        "n_samples": int(analysis.get("n_total",
                                      analysis["valid_mask"].shape[0])),
        "n_valid": int(analysis["n_samples"]),
        "n_outliers": int(analysis["n_outliers"]),
        "metrics_is_sample": bool(analysis.get("metrics_is_sample", False)),
        "seed": seed,
        "slabbed": slabbed,
        "stats": {
            k: analysis[k] for k in ("apogee_altitude", "range", "flight_time")
        },
        # beyond-reference footprint block (JSON-native dict; absent pre-r3)
        "landing_footprint": analysis.get("landing_footprint"),
        # beyond-reference forecast-ensemble block (JSON-native dict)
        "ensemble": analysis.get("ensemble"),
    }
    arrays[_META_KEY] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_summaries(path: str) -> dict:
    """Load a checkpoint: returns a dict with ``summary`` (FlightSummary of
    numpy arrays), ``sample`` arrays, masks, and the saved stats/meta."""
    data = np.load(path)
    meta = json.loads(bytes(data[_META_KEY]).decode())

    if meta.get("slabbed"):
        tails = {}
        for k in data.files:
            if k.startswith("tail.") and k.endswith(".nk"):
                from .tail import TailReservoir

                name = k[len("tail."):-len(".nk")]
                tails[name] = TailReservoir.from_arrays(data, f"tail.{name}.")
        out = {
            "summary": None,
            "metrics": {
                k[len("metrics."):]: data[k]
                for k in data.files if k.startswith("metrics.")
            },
            "tail_reservoirs": tails or None,
            "valid_mask": data["valid_mask"],
            "reasons": data["reasons"],
            # surfaced at top level so post-hoc consumers (e.g.
            # mc.exceedance_from_analysis) see the same layout flags a
            # live analysis carries — a streaming run's checkpointed
            # metrics are a capped prefix, not the full population
            "metrics_is_sample": bool(meta.get("metrics_is_sample", False)),
            "meta": meta,
        }
        _surface_ensemble(out, data, meta)
        return out

    def grab(prefix, template):
        leaves_paths = jax.tree_util.tree_flatten_with_path(template)[0]
        treedef = jax.tree_util.tree_structure(template)
        leaves = [
            data[prefix + jax.tree_util.keystr(p)] for p, _ in leaves_paths
        ]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    # Build templates with the right structure (values replaced on load).
    z = np.zeros(1)
    rail_t = RailInfo(z, z, z, z, z, z, z, z)
    summary_t = FlightSummary(z, z, z, z, z, z, z, z, z, z, rail_t)
    out = {
        "summary": grab("summary", summary_t),
        "valid_mask": data["valid_mask"],
        "reasons": data["reasons"],
        "meta": meta,
    }
    sample_keys = [k for k in data.files if k.startswith("sample")]
    out["sample"] = {k[len("sample."):]: data[k] for k in sample_keys}
    _surface_ensemble(out, data, meta)
    return out


def _surface_ensemble(out: dict, data, meta: dict) -> None:
    """Surface the forecast-ensemble block + member indices at top level
    so ``mc.member_exceedance`` works on a loaded checkpoint exactly as
    on the live analysis (absent pre-r3 checkpoints load unchanged)."""
    if meta.get("ensemble") is not None:
        out["ensemble"] = meta["ensemble"]
    if "wind_members" in data.files:
        out["wind_members"] = data["wind_members"]
