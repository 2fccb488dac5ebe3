"""Design optimization under dispersion (mc/robust.py).

No reference counterpart (`find_max_apogee.py` only scans saved samples
post-hoc). Pins: the SAA objective is deterministic and finite; the
risk-lambda arithmetic; loud rejection of dispersed design leaves; the
dispersed gradient against finite differences of the SAME objective
(slow); and the CLI routing.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from erpl_monte_carlo_sim_tpu.engine import InitialConditions, SimConfig
from erpl_monte_carlo_sim_tpu.mc import (
    dispersed_objective_and_grad,
    optimize_robust,
)
from erpl_monte_carlo_sim_tpu.models import liquid_motor, nominal_scene

SCENE = nominal_scene(liquid_motor())
IC = InitialConditions.vertical_launch()
CFG = SimConfig(max_time=2.0)
KW = dict(wrt="rocket.fin_span", n_lanes=8, seed=3)


def test_objective_deterministic_and_risk_identity():
    obj, grad, diag = dispersed_objective_and_grad(SCENE, IC, CFG, **KW)
    assert jnp.isfinite(obj) and jnp.isfinite(grad)
    assert diag["mean"] == pytest.approx(float(obj))
    assert diag["std"] == 0.0  # not computed on the lam=0 path
    obj2, grad2, diag2 = dispersed_objective_and_grad(SCENE, IC, CFG, **KW)
    assert float(obj2) == float(obj) and float(grad2) == float(grad)
    # objective = mean - lam * std, same lanes (SAA: same seed)
    lam = 0.7
    obj_l, _, diag_l = dispersed_objective_and_grad(
        SCENE, IC, CFG, risk_lambda=lam, **KW
    )
    assert diag_l["mean"] == pytest.approx(diag["mean"], rel=1e-6)
    assert diag_l["std"] > 0.0
    assert float(obj_l) == pytest.approx(
        diag_l["mean"] - lam * diag_l["std"], rel=1e-6
    )


def test_dispersed_leaf_and_bad_metric_rejected():
    with pytest.raises(ValueError, match="DISPERSED"):
        dispersed_objective_and_grad(
            SCENE, IC, CFG, wrt="motor.thrust_scale", n_lanes=4
        )
    with pytest.raises(ValueError, match="metric"):
        dispersed_objective_and_grad(
            SCENE, IC, CFG, wrt="rocket.fin_span", metric="bogus",
            n_lanes=4,
        )


def test_design_writes_refresh_derived_geometry():
    """Design writes recompute reference area + Barrowman CP in-trace
    (create() freezes them in Python), so geometry gradients carry the
    CP-travel / stability channel."""
    import jax

    from erpl_monte_carlo_sim_tpu.engine.diff import _scene_accessors
    from erpl_monte_carlo_sim_tpu.models.rocket import (
        barrowman_cp,
        barrowman_cp_traced,
        refresh_derived,
    )

    r = SCENE.rocket
    # traced twin agrees with the config-time Python value
    assert float(barrowman_cp_traced(r)) == pytest.approx(
        barrowman_cp(r), rel=1e-6)
    assert float(jnp.asarray(refresh_derived(r).cp_location)
                 ) == pytest.approx(float(jnp.asarray(r.cp_location)),
                                    rel=1e-6)
    # CP genuinely moves with fin span (aft with bigger fins)
    dcp = jax.grad(lambda v: barrowman_cp_traced(r.replace(fin_span=v)))(
        jnp.asarray(0.2))
    assert float(dcp) > 0.0
    # the accessor write carries the refresh: written scene's CP differs
    # from the frozen one when the span changes
    _, write = _scene_accessors("rocket.fin_span")
    s2 = write(SCENE, jnp.asarray(0.3))
    assert float(jnp.asarray(s2.rocket.cp_location)) > float(
        jnp.asarray(SCENE.rocket.cp_location))
    assert float(jnp.asarray(s2.rocket.reference_area)) == pytest.approx(
        float(jnp.asarray(SCENE.rocket.reference_area)))


@pytest.mark.slow
def test_dispersed_gradient_matches_fd():
    """The reverse-pass gradient of the dispersed mean agrees with the
    central finite difference of the same fixed-lane objective."""
    v0 = float(jnp.asarray(SCENE.rocket.fin_span))
    obj, grad, _ = dispersed_objective_and_grad(SCENE, IC, CFG, value=v0,
                                                **KW)
    h = 2e-3 * v0
    op, _, _ = dispersed_objective_and_grad(SCENE, IC, CFG, value=v0 + h,
                                            **KW)
    om, _, _ = dispersed_objective_and_grad(SCENE, IC, CFG, value=v0 - h,
                                            **KW)
    fd = (float(op) - float(om)) / (2 * h)
    assert float(grad) == pytest.approx(fd, rel=5e-2, abs=1e-4)


@pytest.mark.slow
def test_optimize_robust_ascends_and_cli_routes(capsys):
    """A few fixed-magnitude steps on a risk-neutral fin-span ascent move
    the objective in the gradient direction; the CLI --robust flag routes
    here with --lam parsed."""
    hist = optimize_robust(SCENE, IC, CFG, steps=3, **KW)
    assert len(hist) == 3
    v0, o0, g0, m0, s0 = hist[0]
    v1, o1, _, _, _ = hist[1]
    assert v1 == pytest.approx(v0 + 0.02 * v0 * (1 if g0 > 0 else -1))
    # SAA objective is deterministic, so the step direction must pay off
    assert (o1 - o0) * (1 if g0 > 0 else -1) >= 0 or abs(o1 - o0) < 1e-3
    assert m0 == pytest.approx(o0)

    from erpl_monte_carlo_sim_tpu.cli import optimize_apogee

    out = optimize_apogee.main(
        ["rocket.fin_span", "1", "--robust", "8", "--lam", "0.5",
         "--max-time", "2.0"]
    )
    assert len(out) == 1
    _, obj, _, mean, std = out[0]
    assert obj == pytest.approx(mean - 0.5 * std, rel=1e-6)
    assert "objective=" in capsys.readouterr().out


def test_derived_field_write_sticks_and_grads():
    """Writing a DERIVED rocket field (cp_location, reference_area,
    reference_diameter) must stick — regression: the unconditional
    refresh_derived() in the accessor write recomputed these from the
    primaries, silently zeroing their gradients."""
    from erpl_monte_carlo_sim_tpu.engine.diff import _scene_accessors

    for field in ("cp_location", "reference_area", "reference_diameter"):
        read, write = _scene_accessors(f"rocket.{field}")
        v0 = float(read(SCENE))
        s2 = write(SCENE, jnp.asarray(v0 + 0.125))
        assert float(read(s2)) == pytest.approx(v0 + 0.125), field


def test_finless_design_gradient_finite():
    """fin_span == 0 keeps the Barrowman CP gradient finite (double-where
    guard on the d/(2s) division) and the primal pinned to the Python
    version's length/2 limit."""
    import jax
    import numpy as np

    from erpl_monte_carlo_sim_tpu.models.rocket import barrowman_cp_traced

    r = SCENE.rocket
    cp0, dcp0 = jax.value_and_grad(
        lambda v: barrowman_cp_traced(r.replace(fin_span=v))
    )(jnp.asarray(0.0))
    # the Python barrowman_cp raises ZeroDivisionError here; the traced
    # twin defines the degenerate value as the length/2 fallback
    assert float(cp0) == pytest.approx(float(jnp.asarray(r.length)) / 2.0)
    assert np.isfinite(float(dcp0))


def test_line_search_ascent_shared_stepper():
    """Both optimizers ride engine.diff.line_search_ascent: Armijo
    backtracking with step growth/contraction — it must CONVERGE to a
    stationary point (not walk a fixed grid), respect bounds, and report
    why it stopped."""
    from erpl_monte_carlo_sim_tpu.engine.diff import line_search_ascent

    # maximize -(v-1)^2 from v=4
    def evaluate(v):
        f = -((v - 1.0) ** 2)
        g = -2.0 * (v - 1.0)
        return (v, f, g), f, g

    hist = line_search_ascent(evaluate, 4.0, steps=64, lr=1.0)
    assert hist.info["converged"], hist.info
    assert hist.info["reason"] in ("grad_tol", "step_tol")
    # the round-3 sign_ascent with lr=1.0 could only land on integers;
    # the line search must localize the optimum to the step tolerance
    assert hist.info["value"] == pytest.approx(1.0, abs=0.02)
    assert len(hist) == hist.info["n_evals"] <= 64
    # default initial step is 2% of |v0|
    evals = []

    def spy(v):
        evals.append(v)
        return evaluate(v)

    line_search_ascent(spy, 4.0, steps=2)
    assert evals[1] == pytest.approx(4.0 - 0.08)
    # bounds: gradient points below lo -> converges AT the bound
    hist = line_search_ascent(evaluate, 4.0, steps=64, lr=1.0,
                              bounds=(2.5, 10.0))
    assert hist.info["converged"] and hist.info["reason"] == "bound"
    assert hist.info["value"] == 2.5
    # a non-finite trial objective backtracks instead of stepping into it
    def cliff(v):
        f = float("nan") if v > 4.5 else -((v - 5.0) ** 2)
        return (v, f), f, -2.0 * (v - 5.0)

    hist = line_search_ascent(cliff, 4.0, steps=64, lr=1.0)
    assert hist.info["converged"]
    assert 4.0 <= hist.info["value"] <= 4.5
    assert np.isfinite(hist.info["objective"])
    # steps=0 evaluates nothing (cheap CLI arg-parsing tests rely on this)
    assert line_search_ascent(evaluate, 4.0, steps=0) == []


def test_optimize_apogee_cli_argparse():
    """Flags parse cleanly in any order and bad values fail with a clean
    argparse error — regression: hand-rolled parsing crashed with
    ValueError/IndexError on flag-before-positional or trailing flags."""
    from erpl_monte_carlo_sim_tpu.cli import optimize_apogee

    # steps=0: parses + routes without compiling anything
    assert optimize_apogee.main(["rocket.fin_span", "0"]) == []
    assert optimize_apogee.main(
        ["--lam", "1.0", "rocket.fin_span", "0"]) == []
    assert optimize_apogee.main(
        ["rocket.fin_span", "0", "--metric", "range", "--max-time", "2"]
    ) == []
    assert optimize_apogee.main(
        ["rocket.fin_span", "0", "0.01", "--robust", "8"]) == []
    with pytest.raises(SystemExit):
        optimize_apogee.main(["rocket.fin_span", "not-an-int"])
    with pytest.raises(SystemExit):
        optimize_apogee.main(["rocket.fin_span", "0", "--lam"])


def test_line_search_nonfinite_start_refuses_convergence():
    """A diverged starting point (NaN objective/gradient) must NOT be
    reported as converged — the r4 pre-fix loop shrank the step below tol
    and declared step_tol convergence around a point it never evaluated
    finite."""
    from erpl_monte_carlo_sim_tpu.engine.diff import line_search_ascent

    def bad(v):
        return (v, float("nan")), float("nan"), float("nan")

    hist = line_search_ascent(bad, 1.0, steps=16, lr=0.1)
    assert not hist.info["converged"]
    assert hist.info["reason"] == "nonfinite_start"
    assert hist.info["n_evals"] == 1
