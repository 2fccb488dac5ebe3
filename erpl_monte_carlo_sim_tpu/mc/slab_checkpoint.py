"""Mid-run checkpoint / resume for slabbed Monte Carlo runs.

``mc.checkpoint.save_summaries`` persists a COMPLETED analysis; this
module persists the slab loop's accumulator state MID-RUN so a killed
multi-hour run (100M+ lanes at ~2.4 s/slab) resumes from the last
checkpointed slab instead of restarting. Because every slab's
dispersions derive from ``fold_in(run_key, slab_idx)`` and all
accumulation is deterministic host-side merging, a resumed run produces
BIT-IDENTICAL results to an uninterrupted one (pinned by
``tests/test_slab_checkpoint.py``).

Usage::

    analyzer.run_monte_carlo(ic, n_samples=100_000_000,
                             checkpoint_path="run.ckpt.npz",
                             checkpoint_every=16)

If the process dies, re-running the SAME call resumes; the file is
removed on successful completion. A fingerprint of everything that
shapes per-slab results (scene/ic/params/config pytrees + sampler knobs)
guards against resuming into a different run — mismatches raise instead
of silently mixing two populations.

Reference counterpart: none — its closest notion of resume is "every
trajectory is a JSON file and seeds are deterministic" (SURVEY.md §5.4);
at reference scale (minutes) restarting is fine. This exists because the
TPU rebuild runs 5-6 orders of magnitude more lanes per call.

Format notes: one uncompressed ``.npz`` (state is written every
``checkpoint_every`` slabs — zlib on the ~100 MB worst case would cost a
visible fraction of a slab's sim time), written atomically
(tmp + ``os.replace``) so a crash mid-write never corrupts the previous
checkpoint.
"""

from __future__ import annotations

import hashlib
import json
import os

import jax
import numpy as np

from .cv import CVMoments
from .ensemble import METRICS as _ENS_METRICS
from .ensemble import EnsembleAccumulator
from .stats import FootprintAccumulator, StreamingStats
from .tail import TailReservoir

__all__ = ["run_fingerprint", "save_slab_state", "load_slab_state"]

_VERSION = 4  # v4: forecast-ensemble accumulator + member prefix
_METRIC_KEYS = ("apogee_altitude", "range", "flight_time", "max_speed")
_STREAM_KEYS = ("apogee_altitude", "range", "flight_time")


def run_fingerprint(analyzer, ic, n_samples, slab, seed, base_wind,
                    chunk_steps, limit) -> str:
    """Digest of everything that determines per-slab results and
    accumulator shapes. Two runs with equal fingerprints execute
    identical slab sequences; anything else must refuse to resume."""
    h = hashlib.sha256()

    def tree(t):
        leaves, treedef = jax.tree_util.tree_flatten(t)
        h.update(str(treedef).encode())
        for leaf in leaves:
            arr = np.asarray(leaf)
            h.update(str(arr.dtype).encode())
            h.update(str(arr.shape).encode())
            h.update(np.ascontiguousarray(arr).tobytes())

    tree(analyzer.scene)
    tree(ic)
    tree(base_wind)
    # frozen dataclasses of primitives: repr is a stable total description
    h.update(repr(analyzer.uncertainty_params).encode())
    h.update(repr(analyzer.sim_config).encode())
    h.update(repr(analyzer.bounds).encode())
    h.update(json.dumps([
        _VERSION, int(n_samples), int(slab), int(seed),
        # backend: XLA transcendentals differ ~1e-8 between platforms
        # (CLAUDE.md), so a TPU run resumed on CPU would silently mix two
        # numerically different slab populations — refuse instead
        jax.default_backend(),
        analyzer.sampler, int(analyzer.sobol_scrambles),
        int(analyzer.sobol_wind_modes), bool(analyzer.antithetic),
        list(analyzer.importance_shift),
        bool(analyzer.control_variates), int(analyzer.cv_wind_modes),
        int(analyzer.cv_wind_speed),
        int(analyzer.stats_stream_threshold),
        int(analyzer.metrics_sample_cap),
        int(analyzer.wind_grid_points), float(analyzer.wind_grid_top),
        None if chunk_steps is None else int(chunk_steps),
        int(limit),
    ]).encode())
    return h.hexdigest()


def _pack_stream(s: StreamingStats, out: dict, prefix: str) -> None:
    out[prefix + "moments"] = np.asarray(
        [s.n, s._mean, s._m2, s._min, s._max], np.float64
    )
    if s._exact_parts is not None:
        parts = s._exact_parts
        out[prefix + "exact"] = (
            np.concatenate(parts) if parts else np.empty(0)
        )
        # part boundaries matter for bit-identical resume: at the
        # exact->sketch crossing each part is compressed SEPARATELY, so
        # restoring one concatenated part would build different centroids
        # than the uninterrupted run
        out[prefix + "exact_lens"] = np.asarray(
            [p.size for p in parts], np.int64
        )
    else:
        out[prefix + "cent_v"] = s._cent_v
        out[prefix + "cent_w"] = s._cent_w


def _unpack_stream(z, prefix: str, exact_threshold: int) -> StreamingStats:
    s = StreamingStats(exact_threshold=exact_threshold)
    n, mean, m2, mn, mx = z[prefix + "moments"]
    s.n = int(n)
    s._mean, s._m2 = float(mean), float(m2)
    s._min, s._max = float(mn), float(mx)
    if prefix + "exact" in z:
        lens = z[prefix + "exact_lens"]
        s._exact_parts = (
            list(np.split(z[prefix + "exact"], np.cumsum(lens)[:-1]))
            if lens.size else []
        )
    else:
        s._exact_parts = None
        s._cent_v = z[prefix + "cent_v"]
        s._cent_w = z[prefix + "cent_w"]
    return s


def save_slab_state(path: str, state: dict, fingerprint: str) -> None:
    """Atomically persist the loop state built by ``_run_slabbed``."""
    arrays: dict = {}
    meta = {
        "version": _VERSION,
        "fingerprint": fingerprint,
        "n_done": int(state["n_done"]),
        "slab_idx": int(state["slab_idx"]),
        "n_valid_total": int(state["n_valid_total"]),
        "kept": int(state["kept"]),
        "pranges": state["pranges"],
        "records": state["records"],
        "outlier_records": state["outlier_records"],
        "has_lw": state["lw_parts"] is not None,
        "has_stream": state["stream"] is not None,
        "has_cv": state["cv_acc"] is not None,
        "has_tails": state["tails"] is not None,
        "has_ens": state["ens_acc"] is not None,
        # convergence history: JSON-native rows + the three f64 running
        # sums (floats survive json round-trip exactly: repr-roundtrip)
        "conv_hist": state["conv_hist"],
        "conv_acc": state["conv_acc"],
    }
    for k in _METRIC_KEYS:
        parts = state["metrics"][k]
        arrays["metrics." + k] = (
            np.concatenate(parts) if parts else np.empty(0, np.float32)
        )
    for name in ("valid_parts", "reason_parts", "landing_parts"):
        parts = state[name]
        if parts:
            arrays[name] = np.concatenate(parts)
    for k in _STREAM_KEYS:
        arrays["qmc." + k] = np.asarray(state["qmc_blocks"][k], np.float64)
    if state["lw_parts"] is not None and state["lw_parts"]:
        arrays["lw"] = np.concatenate(
            [np.asarray(p) for p in state["lw_parts"]]
        )
    if state["stream"] is not None:
        for k in _STREAM_KEYS:
            _pack_stream(state["stream"][k], arrays, f"stream.{k}.")
    if state["tails"] is not None:
        for k, r in state["tails"].items():
            r.to_arrays(arrays, f"tail.{k}.")
    fp = state["footprint_acc"]
    arrays["footprint"] = np.asarray(
        [fp.n, fp.mx, fp.my, fp.m2x, fp.m2y, fp.cxy], np.float64
    )
    cv = state["cv_acc"]
    if cv is not None and cv.n > 0:
        arrays["cv.n"] = np.asarray(cv.n)
        for name in ("mz", "mt", "szz", "szt", "stt"):
            arrays["cv." + name] = getattr(cv, name)
    ens = state["ens_acc"]
    if ens is not None:
        arrays["ens.n_drawn"] = ens.n_drawn
        arrays["ens.n_valid"] = ens.n_valid
        for m in _ENS_METRICS:
            arrays[f"ens.n.{m}"] = ens._n[m]
            arrays[f"ens.mean.{m}"] = ens._mean[m]
            arrays[f"ens.m2.{m}"] = ens._m2[m]
        if state["member_parts"]:
            arrays["member_parts"] = np.concatenate(state["member_parts"])
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_slab_state(path: str, fingerprint: str,
                    exact_threshold: int) -> dict | None:
    """Restore the loop state, or None when no checkpoint exists. A
    fingerprint mismatch raises — silently restarting (or worse, resuming
    a DIFFERENT run's accumulators) would corrupt results."""
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        if meta["version"] != _VERSION:
            raise ValueError(
                f"checkpoint {path!r} uses format v{meta['version']}; "
                f"this build writes v{_VERSION} — delete it (or finish "
                "the run with the build that wrote it)"
            )
        if meta["fingerprint"] != fingerprint:
            raise ValueError(
                f"checkpoint {path!r} belongs to a different run "
                "(scene/config/sampling mismatch); delete it or point "
                "checkpoint_path elsewhere to start fresh"
            )
        state = {
            "n_done": meta["n_done"],
            "slab_idx": meta["slab_idx"],
            "n_valid_total": meta["n_valid_total"],
            "kept": meta["kept"],
            "pranges": meta["pranges"],
            "records": meta["records"],
            "outlier_records": meta["outlier_records"],
            "metrics": {
                k: ([z["metrics." + k]] if z["metrics." + k].size else [])
                for k in _METRIC_KEYS
            },
            "qmc_blocks": {
                k: [float(x) for x in z["qmc." + k]] for k in _STREAM_KEYS
            },
            "lw_parts": None,
            "stream": None,
            "cv_acc": None,
            "tails": None,
            "ens_acc": None,
            "member_parts": [],
            "conv_hist": meta["conv_hist"],
            "conv_acc": meta["conv_acc"],
        }
        for name in ("valid_parts", "reason_parts", "landing_parts"):
            state[name] = [z[name]] if name in z else []
        if meta["has_lw"]:
            state["lw_parts"] = [z["lw"]] if "lw" in z else []
        if meta["has_stream"]:
            state["stream"] = {
                k: _unpack_stream(z, f"stream.{k}.", exact_threshold)
                for k in _STREAM_KEYS
            }
        if meta["has_tails"]:
            state["tails"] = {
                k: TailReservoir.from_arrays(z, f"tail.{k}.")
                for k in _STREAM_KEYS
            }
        if meta["has_cv"]:
            cv = CVMoments()
            if "cv.n" in z:
                cv.n = int(z["cv.n"])
                for name in ("mz", "mt", "szz", "szt", "stt"):
                    setattr(cv, name, np.array(z["cv." + name], np.float64))
            state["cv_acc"] = cv
        if meta["has_ens"]:
            ens = EnsembleAccumulator(int(z["ens.n_drawn"].size))
            ens.n_drawn = np.array(z["ens.n_drawn"], np.int64)
            ens.n_valid = np.array(z["ens.n_valid"], np.int64)
            for m in _ENS_METRICS:
                ens._n[m] = np.array(z[f"ens.n.{m}"], np.int64)
                ens._mean[m] = np.array(z[f"ens.mean.{m}"], np.float64)
                ens._m2[m] = np.array(z[f"ens.m2.{m}"], np.float64)
            state["ens_acc"] = ens
            state["member_parts"] = (
                [z["member_parts"]] if "member_parts" in z else []
            )
        fp = FootprintAccumulator()
        n, mx, my, m2x, m2y, cxy = z["footprint"]
        fp.n = int(n)
        fp.mx, fp.my = float(mx), float(my)
        fp.m2x, fp.m2y, fp.cxy = float(m2x), float(m2y), float(cxy)
        state["footprint_acc"] = fp
    return state
