"""Variance-based global sensitivity (mc/sobol_indices.py).

No reference counterpart (`monte_carlo.py:400-473` records observed
parameter ranges, never variance shares); the estimator math is pinned
against models with KNOWN Sobol' indices, and the flight path against
structure/determinism invariants.
"""

import jax
import numpy as np
import pytest

from erpl_monte_carlo_sim_tpu.engine import InitialConditions, SimConfig
from erpl_monte_carlo_sim_tpu.mc import (
    UncertaintyParams,
    active_groups,
    jansen_estimates,
    sobol_indices,
)
from erpl_monte_carlo_sim_tpu.models import (
    liquid_motor,
    nominal_scene,
    solid_motor,
)

RNG = np.random.default_rng(7)


def _pick_freeze(f, za, zb, groups):
    """Evaluate f on A, B and every AB_i (columns of group i from B)."""
    fabs = {}
    for i in groups:
        z = za.copy()
        z[:, i] = zb[:, i]
        fabs[i] = f(z)
    return f(za), f(zb), fabs


def test_jansen_recovers_linear_model():
    """f = 3 z1 + z2: S1 = 9/10, S2 = 1/10, no interactions (T = S)."""
    n = 200_000
    za = RNG.normal(size=(n, 2))
    zb = RNG.normal(size=(n, 2))

    def f(z):
        return 3.0 * z[:, 0] + z[:, 1] + 5.0

    fa, fb, fabs = _pick_freeze(f, za, zb, [0, 1])
    est = jansen_estimates(fa, fb, fabs)
    assert est["groups"][0]["S"] == pytest.approx(0.9, abs=0.01)
    assert est["groups"][1]["S"] == pytest.approx(0.1, abs=0.01)
    assert est["groups"][0]["T"] == pytest.approx(0.9, abs=0.01)
    assert est["groups"][1]["T"] == pytest.approx(0.1, abs=0.01)
    assert est["variance"] == pytest.approx(10.0, rel=0.02)


def test_jansen_recovers_ishigami():
    """Ishigami (a=7, b=0.1): the classic interaction benchmark — x3 has
    ZERO first-order effect but a 0.24 total index (pure interaction with
    x1), exactly the S-vs-T distinction the flight analysis relies on."""
    a, b = 7.0, 0.1
    n = 400_000
    xa = RNG.uniform(-np.pi, np.pi, size=(n, 3))
    xb = RNG.uniform(-np.pi, np.pi, size=(n, 3))

    def f(x):
        return (np.sin(x[:, 0]) + a * np.sin(x[:, 1]) ** 2
                + b * x[:, 2] ** 4 * np.sin(x[:, 0]))

    # analytic values (Saltelli et al.)
    v1 = 0.5 * (1 + b * np.pi**4 / 5) ** 2
    v2 = a**2 / 8
    v13 = b**2 * np.pi**8 * (1 / 18 - 1 / 50)
    v = v1 + v2 + v13
    fa, fb, fabs = _pick_freeze(f, xa, xb, [0, 1, 2])
    est = jansen_estimates(fa, fb, fabs)
    assert est["groups"][0]["S"] == pytest.approx(v1 / v, abs=0.015)
    assert est["groups"][1]["S"] == pytest.approx(v2 / v, abs=0.015)
    assert est["groups"][2]["S"] == pytest.approx(0.0, abs=0.015)
    assert est["groups"][0]["T"] == pytest.approx((v1 + v13) / v, abs=0.015)
    assert est["groups"][1]["T"] == pytest.approx(v2 / v, abs=0.015)
    assert est["groups"][2]["T"] == pytest.approx(v13 / v, abs=0.015)


def test_closed_pair_recovers_ishigami_interaction():
    """The first-order estimator applied to a PAIR swap (AB_{13}) yields
    the closed second-order index (V1+V3+V13)/V; subtracting S1 and S3
    recovers the pure x1-x3 interaction share — the arithmetic
    ``sobol_indices(pairs=...)`` performs on flight metrics."""
    a, b = 7.0, 0.1
    n = 400_000
    xa = RNG.uniform(-np.pi, np.pi, size=(n, 3))
    xb = RNG.uniform(-np.pi, np.pi, size=(n, 3))

    def f(x):
        return (np.sin(x[:, 0]) + a * np.sin(x[:, 1]) ** 2
                + b * x[:, 2] ** 4 * np.sin(x[:, 0]))

    v1 = 0.5 * (1 + b * np.pi**4 / 5) ** 2
    v2 = a**2 / 8
    v13 = b**2 * np.pi**8 * (1 / 18 - 1 / 50)
    v = v1 + v2 + v13
    x13 = xa.copy()
    x13[:, [0, 2]] = xb[:, [0, 2]]
    x12 = xa.copy()
    x12[:, [0, 1]] = xb[:, [0, 1]]
    fa, fb, fabs = _pick_freeze(f, xa, xb, [0, 1, 2])
    fabs[(0, 2)] = f(x13)
    fabs[(0, 1)] = f(x12)
    est = jansen_estimates(fa, fb, fabs)
    closed13 = est["groups"][(0, 2)]["S"]
    assert closed13 == pytest.approx((v1 + v13) / v, abs=0.015)
    inter13 = (closed13 - est["groups"][0]["S"] - est["groups"][2]["S"])
    assert inter13 == pytest.approx(v13 / v, abs=0.02)
    # additive pair: closed = S1 + S2, interaction ~ 0
    inter12 = (est["groups"][(0, 1)]["S"] - est["groups"][0]["S"]
               - est["groups"][1]["S"])
    assert inter12 == pytest.approx(0.0, abs=0.02)


def test_constant_output_attributes_nothing():
    est = jansen_estimates(np.ones(64), np.ones(64),
                           {"g": np.ones(64)})
    assert est["variance"] == 0.0
    assert est["groups"]["g"] == {"S": 0.0, "T": 0.0}


def test_active_groups_skip_inert_channels():
    """Zero-sigma channels (default position sigma is 0) and the solid
    motor's flow multiplier (mdot follows thrust) must be skipped, not
    reported as zero — same inertness logic as cv/importance."""
    liquid = active_groups(nominal_scene(liquid_motor()))
    solid = active_groups(nominal_scene(solid_motor()))
    assert "position" not in liquid
    assert "motor_flow" in liquid
    assert "motor_flow" not in solid
    assert "wind_turbulence" in liquid
    p = UncertaintyParams(initial_position=(1.0, 1.0, 0.0))
    assert "position" in active_groups(nominal_scene(liquid_motor()), p)


def test_flight_indices_structure_and_determinism():
    """Window-regime decomposition: structure, estimator sanity bounds,
    and bit-identical determinism in the seed."""
    scene = nominal_scene(liquid_motor())
    ic = InitialConditions.vertical_launch()
    cfg = SimConfig(max_time=4.0)
    kw = dict(n=192, seed=3, n_boot=50)
    out = sobol_indices(scene, ic, cfg, **kw)
    assert out["n_valid"] > 150
    assert out["n_sims"] == 192 * (2 + len(out["groups"]))
    apo = out["apogee_altitude"]
    assert apo["variance"] > 0.0
    for g in out["groups"]:
        s = apo["first_order"][g]
        t = apo["total_order"][g]
        # estimator noise allows slight excursions outside [0, 1]
        assert -0.15 < s["S"] < 1.15, g
        assert -0.05 < t["T"] < 1.3, g
        assert s["ci95"][0] <= s["S"] <= s["ci95"][1], g
    # thrust must matter for how high the rocket is at cutoff
    assert apo["first_order"]["motor_thrust"]["S"] > 0.05
    again = sobol_indices(scene, ic, cfg, **kw)
    assert again == out  # deterministic in (seed, n, config)


def test_unknown_group_raises():
    scene = nominal_scene(liquid_motor())
    with pytest.raises(ValueError, match="unknown or inert"):
        sobol_indices(scene, InitialConditions.vertical_launch(),
                      SimConfig(max_time=2.0), groups=["bogus"], n=32)


def test_pure_three_way_interaction_recovered():
    """Inclusion-exclusion through the subset machinery: f = x1 + x2*x3
    + x1*x2*x3 on standard normals has S1 = ..., pure (2,3) and pure
    (1,2,3) shares known exactly: V1 = 1, V23 = 1, V123 = 1, V = 3."""
    from erpl_monte_carlo_sim_tpu.mc import pure_interactions

    n = 400_000
    za = RNG.normal(size=(n, 3))
    zb = RNG.normal(size=(n, 3))

    def f(z):
        return (z[:, 0] + z[:, 1] * z[:, 2]
                + z[:, 0] * z[:, 1] * z[:, 2])

    fa, fb, fabs = _pick_freeze(f, za, zb, [0, 1, 2])
    for sub in [(0, 1), (0, 2), (1, 2), (0, 1, 2)]:
        z = za.copy()
        z[:, list(sub)] = zb[:, list(sub)]
        fabs[sub] = f(z)
    est = jansen_estimates(fa, fb, fabs)
    subsets = [(0, 1), (0, 2), (1, 2), (0, 1, 2)]
    pure = pure_interactions(est, subsets)
    # V(f) = 1 (x1) + 1 (x2x3) + 1 (x1x2x3); no other terms
    assert est["groups"][0]["S"] == pytest.approx(1 / 3, abs=0.02)
    assert pure[(1, 2)] == pytest.approx(1 / 3, abs=0.03)
    assert pure[(0, 1, 2)] == pytest.approx(1 / 3, abs=0.04)
    assert pure[(0, 1)] == pytest.approx(0.0, abs=0.03)
    assert pure[(0, 2)] == pytest.approx(0.0, abs=0.03)


def test_select_interaction_pairs_rule():
    """pairs="auto" selection: threshold, top-k cap, stable ordering."""
    from erpl_monte_carlo_sim_tpu.mc import select_interaction_pairs

    gaps = {"a": 0.05, "b": 0.3, "c": 0.12, "d": 0.01}
    assert select_interaction_pairs(gaps) == [("b", "c")]
    # below threshold everywhere: no pairs, no extra sims
    assert select_interaction_pairs({"a": 0.09, "b": 0.0}) == []
    # cap: only the top max_groups by gap, pairs in stable key order
    gaps = {"a": 0.2, "b": 0.5, "c": 0.3, "d": 0.4}
    assert select_interaction_pairs(gaps, max_groups=3) == [
        ("b", "c"), ("b", "d"), ("c", "d")
    ]
    assert select_interaction_pairs(gaps, threshold=0.45) == []
    # determinism in dict order, not value ties
    assert select_interaction_pairs(gaps) == select_interaction_pairs(gaps)


def test_flight_auto_pairs_structure():
    """pairs="auto" runs end-to-end: whatever pairs the gap rule picks
    get second_order blocks; an empty pick omits the block. Deterministic
    like the explicit-pair path."""
    scene = nominal_scene(liquid_motor())
    ic = InitialConditions.vertical_launch()
    cfg = SimConfig(max_time=4.0)
    kw = dict(n=160, seed=9, n_boot=0, pairs="auto")
    out = sobol_indices(scene, ic, cfg, **kw)
    assert isinstance(out["pairs"], list)
    assert out["n_sims"] == 160 * (2 + len(out["groups"])
                                   + len(out["pairs"]))
    for m in ("apogee_altitude", "range", "flight_time"):
        if out["pairs"]:
            assert set(out[m]["second_order"]) == set(out["pairs"])
        else:
            assert "second_order" not in out[m]
    assert sobol_indices(scene, ic, cfg, **kw) == out


def test_flight_pairs_structure_and_validation():
    """pairs= adds one AB_ij matrix per pair: budget accounting, the
    closed/interaction identity, interaction CIs, determinism; bad pairs
    are rejected loudly."""
    scene = nominal_scene(liquid_motor())
    ic = InitialConditions.vertical_launch()
    cfg = SimConfig(max_time=4.0)
    kw = dict(n=160, seed=5, n_boot=40,
              pairs=[("mass", "motor_thrust")])
    out = sobol_indices(scene, ic, cfg, **kw)
    assert out["pairs"] == ["mass*motor_thrust"]
    assert out["n_sims"] == 160 * (2 + len(out["groups"]) + 1)
    blk = out["apogee_altitude"]["second_order"]["mass*motor_thrust"]
    # near-additive window regime: interaction ~ 0, closed ~ S_m + S_t
    apo = out["apogee_altitude"]
    assert blk["interaction"] == pytest.approx(
        blk["closed"] - apo["first_order"]["mass"]["S"]
        - apo["first_order"]["motor_thrust"]["S"], abs=1e-12)
    assert abs(blk["interaction"]) < 0.2
    assert blk["ci95"][0] <= blk["ci95"][1]
    assert sobol_indices(scene, ic, cfg, **kw) == out
    for bad in ([("mass", "mass")], [("mass",)],
                [("mass", "nope")]):
        with pytest.raises(ValueError, match="pair"):
            sobol_indices(scene, ic, cfg, n=32, pairs=bad)
    # a triple needs its pairs requested too (inclusion-exclusion)
    with pytest.raises(ValueError, match="sub-subsets"):
        sobol_indices(scene, ic, cfg, n=32,
                      pairs=[("mass", "motor_thrust", "density")])


def _fake_indices(with_ci=True, with_pairs=False):
    """Hand-built decomposition dict (plot tests need no flight run)."""
    groups = ["mass", "motor_thrust", "wind_turbulence"]
    shares = {"mass": 0.2, "motor_thrust": 0.7, "wind_turbulence": -0.01}
    pair_shares = {"mass*wind_turbulence": 0.11,
                   "motor_thrust*wind_turbulence": -0.02}

    def blk():
        ci = (lambda v, w: [v - w, v + w]) if with_ci else (
            lambda v, w: [None, None])
        out = {
            "mean": 1.0, "variance": 4.0,
            "first_order": {g: {"S": v, "ci95": ci(v, 0.05)}
                            for g, v in shares.items()},
            "total_order": {g: {"T": v + 0.02, "ci95": ci(v + 0.02, 0.07)}
                            for g, v in shares.items()},
            "sum_first_order": sum(shares.values()),
        }
        if with_pairs:
            out["second_order"] = {
                p: {"closed": v + 0.3, "interaction": v,
                    "ci95": ci(v, 0.06)}
                for p, v in pair_shares.items()
            }
        return out

    return {"n": 64, "n_valid": 60, "n_sims": 320, "groups": groups,
            "pairs": list(pair_shares) if with_pairs else [],
            "apogee_altitude": blk(), "range": blk(), "flight_time": blk()}


def test_plot_sobol_indices(tmp_path):
    import os

    from erpl_monte_carlo_sim_tpu.reporting import plot_sobol_indices

    path = plot_sobol_indices(_fake_indices(), str(tmp_path))
    assert path.endswith("sobol_indices.png")
    assert os.path.getsize(path) > 10_000
    # n_boot=0 decompositions ([None, None] CIs) plot without error bars
    path2 = plot_sobol_indices(_fake_indices(with_ci=False), str(tmp_path))
    assert os.path.getsize(path2) > 10_000
    # pairs= decompositions add interaction rows (with and without CIs)
    path3 = plot_sobol_indices(_fake_indices(with_pairs=True),
                               str(tmp_path))
    assert os.path.getsize(path3) > 10_000
    path4 = plot_sobol_indices(
        _fake_indices(with_ci=False, with_pairs=True), str(tmp_path))
    assert os.path.getsize(path4) > 10_000
    # no groups / no metrics: nothing to draw
    assert plot_sobol_indices({"groups": [], "n": 0}) is None


def test_sensitivity_cli_sobol_mode(capsys):
    """--sobol routes the sensitivity CLI to the variance decomposition
    and prints the same dict it returns."""
    import json

    from erpl_monte_carlo_sim_tpu.cli import sensitivity

    out = sensitivity.main(["3.0", "--sobol", "96"])
    assert out["n"] == 96
    assert set(out["groups"]) <= set(
        active_groups(nominal_scene(liquid_motor()))
    )
    assert "apogee_altitude" in out
    printed = json.loads(capsys.readouterr().out)
    assert printed["groups"] == out["groups"]
    assert printed["n_valid"] == out["n_valid"]
