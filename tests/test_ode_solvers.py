"""ODE solver extensions: sway time grid, midpoint method."""

import numpy as np
import jax.numpy as jnp

from audio_calm_tpu.ops.ode import make_time_grid, ode_solve


def test_uniform_grid_matches_reference_steps():
    g = np.asarray(make_time_grid(4))
    np.testing.assert_allclose(g, [0, 0.25, 0.5, 0.75, 1.0], atol=1e-7)


def test_sway_grid_monotone_and_frontloaded():
    g = np.asarray(make_time_grid(16, "sway", sway_coef=-1.0))
    assert g[0] == 0.0 and abs(g[-1] - 1.0) < 1e-6
    assert (np.diff(g) > 0).all()
    # negative coef front-loads: first half of the steps covers < 0.3 of t
    assert g[8] < 0.3


def test_midpoint_more_accurate_than_euler():
    # dx/dt = -2x, x(0)=1 -> x(1) = exp(-2)
    def head(cond, x, t, ctx, cm, xm):
        return -2.0 * x

    x0 = jnp.ones((1, 1, 1))
    cond = jnp.zeros((1, 1, 1))
    exact = np.exp(-2.0)
    for steps in (8,):
        xe = float(ode_solve(head, cond, x0, steps, method="euler")[0, 0, 0])
        xm = float(ode_solve(head, cond, x0, steps, method="midpoint")[0, 0, 0])
        assert abs(xm - exact) < abs(xe - exact) / 5


def test_sway_solver_runs_with_cfg():
    def head(cond, x, t, ctx, cm, xm):
        return cond - x

    cond = jnp.ones((2, 4, 3))
    x0 = jnp.zeros((2, 4, 3))
    out = ode_solve(head, cond, x0, 10, cfg_scale=2.0,
                    time_schedule="sway")
    assert np.isfinite(np.asarray(out)).all()
    # pulls x toward the condition
    assert float(jnp.mean(out)) > 0.5
