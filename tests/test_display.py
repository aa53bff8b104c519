"""Visualization layer (reference: GepettoDisplay/MeshcatDisplay/
CallbackDisplay, bindings/python/crocoddyl/__init__.py:64-355)."""

import os

import numpy as np
import jax.numpy as jnp

from crocoddyl_tpu.dynamics import robots
from crocoddyl_tpu.io.display import (DisplayLog, animate_matplotlib,
                                      export_html, skeleton)

FEET = ["LF_FOOT", "RF_FOOT", "LH_FOOT", "RH_FOOT"]


def _traj(n=5):
    m = robots.quadruped()
    q0 = robots.quadruped_standing_q(m)
    x0 = jnp.concatenate([q0, jnp.zeros(m.nv)])
    # small joint oscillation so frames move
    xs = jnp.stack([x0.at[7:-m.nv].add(0.05 * np.sin(0.3 * t))
                    for t in range(n)])
    return m, xs


def test_skeleton_shapes_and_ground_contact():
    m, xs = _traj()
    joints, frames, parents = skeleton(m, xs, FEET)
    assert joints.shape == (5, m.njoints, 3)
    assert frames.shape == (5, 4, 3)
    assert parents.shape == (m.njoints,)
    # standing pose: feet near the ground, base above them
    assert np.all(frames[0, :, 2] < joints[0, 0, 2])


def test_export_html(tmp_path):
    m, xs = _traj()
    path = export_html(m, xs, str(tmp_path / "gait.html"), FEET, dt=0.01)
    html = open(path).read()
    assert "crocoddyl_tpu trajectory player" in html
    assert '"bones"' in html and '"joints"' in html
    # data embedded, no external resources
    assert "http" not in html.split("<script>")[1]


def test_animate_gif(tmp_path):
    m, xs = _traj(4)
    path = animate_matplotlib(m, xs, str(tmp_path / "gait.gif"), FEET, fps=5)
    assert os.path.getsize(path) > 1000


def test_display_log(tmp_path):
    m, xs = _traj(3)
    log = DisplayLog(m, FEET)
    for x in np.asarray(xs):
        log.push(x)
    path = log.render(str(tmp_path / "mpc.html"), dt=0.02)
    assert os.path.exists(path)


def test_iter_callback_and_callback_display(tmp_path):
    """During-solve hook (CallbackDisplay analogue): the jitted solver
    invokes the Python callback every iteration via jax.debug.callback."""
    import crocoddyl_tpu as ct
    from crocoddyl_tpu.core.action import replicate_model
    from crocoddyl_tpu.core.problem import ShootingProblem
    from crocoddyl_tpu.io.display import CallbackDisplay
    from crocoddyl_tpu.models.unicycle import UnicycleModel
    import jax.numpy as jnp

    calls = []
    m = UnicycleModel()
    prob = ShootingProblem(x0=jnp.asarray([-1., -1., 1.]),
                           running=replicate_model(m, 20), terminal=m)
    sol = ct.solve(prob, settings=ct.SolverSettings(
        maxiter=50,
        iter_callback=lambda it, cost, xs: calls.append(int(it))))
    assert bool(sol.converged)
    assert len(calls) == int(sol.iter)

    rm = robots.quadruped()
    q0 = robots.quadruped_standing_q(rm)
    x = np.concatenate([np.asarray(q0), np.zeros(rm.nv)])
    cd = CallbackDisplay(rm, every=2)
    for it in range(4):
        cd(it, 1.0, np.tile(x, (3, 1)))
    assert len(cd.snapshots) == 2
    outs = cd.render(str(tmp_path / "cb"))
    assert len(outs) == 2
    html = open(outs[0]).read()
    assert "widths" in html    # synthesized link geometry payload
