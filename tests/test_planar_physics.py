"""Parity tests: planar_physics vs host MuJoCo (the ground truth it replaces).

The JAX engine must reproduce `mujoco.mj_step` on HalfCheetah-v5 — the env
the reference evaluates against by stepping host MuJoCo per action
(reference scripts/evaluate.py:240). Smooth dynamics are exact by
construction (autodiff of the same Lagrangian); the constraint solve
converges to MuJoCo's Newton solution as PGS iterations grow.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

mujoco = pytest.importorskip("mujoco")
gym = pytest.importorskip("gymnasium")

from dadiff_tpu.envs.planar_physics import (  # noqa: E402
    PlanarPhysics,
    extract_planar_model,
)


@pytest.fixture(autouse=True)
def _x64():
    """Parity tolerances assume float64 (the TPU serving path runs f32;
    these tests pin the MATH against MuJoCo's f64 reference)."""
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def hc():
    env = gym.make("HalfCheetah-v5")
    m = env.unwrapped.model
    d = mujoco.MjData(m)
    pm = extract_planar_model("HalfCheetah-v5")
    yield env, m, d, pm
    env.close()


def _mj_step(m, d, qpos, qvel, ctrl, n=1):
    d.qpos[:] = qpos
    d.qvel[:] = qvel
    d.ctrl[:] = ctrl
    for _ in range(n):
        mujoco.mj_step(m, d)
    return d.qpos.copy(), d.qvel.copy()


def test_extract_planar_model_structure(hc):
    _, m, _, pm = hc
    assert pm.nv == 9 and pm.nu == 6 and pm.nb == 7
    assert pm.timestep == pytest.approx(0.01)
    # both capsule ends of all 8 body capsules are contact candidates
    assert len(pm.con_body) == 16
    np.testing.assert_allclose(pm.gear, [120, 90, 60, 120, 60, 30])


def test_mass_matrix_and_bias_match_mujoco(hc):
    _, m, d, pm = hc
    phys = PlanarPhysics(pm)
    rng = np.random.RandomState(0)
    for _ in range(3):
        qpos = rng.randn(9) * 0.3
        qvel = rng.randn(9)
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        mujoco.mj_forward(m, d)
        Mfull = np.zeros((9, 9))
        mujoco.mj_fullM(m, d, Mfull)
        Mjax = np.asarray(phys.mass_matrix(jnp.asarray(qpos)))
        np.testing.assert_allclose(Mjax, Mfull, atol=1e-12)
        bias = np.asarray(phys.bias_forces(jnp.asarray(qpos), jnp.asarray(qvel)))
        np.testing.assert_allclose(bias, d.qfrc_bias, atol=1e-10)


def test_airborne_step_exact(hc):
    """No contact, random ctrl: one full step matches to machine precision
    (validates actuation, springs, implicit damping, Euler integration)."""
    _, m, d, pm = hc
    phys = PlanarPhysics(pm)
    step = jax.jit(phys.step)
    rng = np.random.RandomState(1)
    for _ in range(3):
        qpos = rng.randn(9) * 0.1
        qpos[1] = 2.0  # high above ground
        qpos[3:] = np.clip(qpos[3:], -0.3, 0.3)  # inside joint limits
        qvel = rng.randn(9) * 0.5
        ctrl = rng.uniform(-1, 1, 6)
        qp_mj, qv_mj = _mj_step(m, d, qpos, qvel, ctrl)
        qp_j, qv_j = step(jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl))
        np.testing.assert_allclose(np.asarray(qp_j), qp_mj, atol=1e-12)
        np.testing.assert_allclose(np.asarray(qv_j), qv_mj, atol=1e-10)


def test_joint_limit_step_exact(hc):
    _, m, d, pm = hc
    phys = PlanarPhysics(pm, solver_iters=100)
    step = jax.jit(phys.step)
    rng = np.random.RandomState(2)
    qpos = np.zeros(9)
    qpos[1] = 2.0
    qpos[3] = -0.6  # bthigh beyond its lower limit (-0.52)
    qvel = rng.randn(9) * 0.5
    qp_mj, qv_mj = _mj_step(m, d, qpos, qvel, np.zeros(6))
    qp_j, qv_j = step(jnp.asarray(qpos), jnp.asarray(qvel), jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(qv_j), qv_mj, atol=1e-10)


def test_contact_step_matches_newton_solution(hc):
    """Grounded, actuated: PGS at high iteration count converges to
    MuJoCo's Newton solution (impedance, R, pyramid rows all exact)."""
    env, m, d, pm = hc
    phys = PlanarPhysics(pm, solver_iters=400)
    step = jax.jit(phys.step)
    env.reset(seed=0)
    qpos = env.unwrapped.data.qpos.copy()
    qvel = env.unwrapped.data.qvel.copy()
    rng = np.random.RandomState(1)
    ctrl = rng.uniform(-1, 1, 6)
    qp_mj, qv_mj = _mj_step(m, d, qpos, qvel, ctrl)
    qp_j, qv_j = step(jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl))
    np.testing.assert_allclose(np.asarray(qv_j), qv_mj, atol=1e-9)


def test_parallel_solver_matches_pgs(hc):
    """solver='jacobi' (preconditioned FISTA — the wide-batch MPPI path)
    agrees with the sequential PGS solve on a grounded actuated step."""
    env, m, d, pm = hc
    ref = PlanarPhysics(pm, solver_iters=400, solver="pgs")
    par = PlanarPhysics(pm, solver_iters=300, solver="jacobi")
    env.reset(seed=0)
    qpos = jnp.asarray(env.unwrapped.data.qpos.copy())
    qvel = jnp.asarray(env.unwrapped.data.qvel.copy())
    ctrl = jnp.asarray(np.random.RandomState(1).uniform(-1, 1, 6))
    qp_r, qv_r = jax.jit(ref.step)(qpos, qvel, ctrl)
    qp_p, qv_p = jax.jit(par.step)(qpos, qvel, ctrl)
    np.testing.assert_allclose(np.asarray(qv_p), np.asarray(qv_r), atol=1e-5)
    with pytest.raises(ValueError):
        PlanarPhysics(pm, solver="newton")


def test_running_rollout_teacher_forced_error(hc):
    """Contact-rich random-action rollout: per-env-step (5 substeps)
    teacher-forced error stays tiny (p50 at solver tolerance)."""
    env, m, d, pm = hc
    phys = PlanarPhysics(pm, solver_iters=150)
    estep = jax.jit(lambda qp, qv, c: phys.env_step(qp, qv, c, 5))
    env.reset(seed=0)
    qpos = env.unwrapped.data.qpos.copy()
    qvel = env.unwrapped.data.qvel.copy()
    rng = np.random.RandomState(3)
    errs = []
    for _ in range(40):
        ctrl = np.clip(rng.randn(6) * 0.5, -1, 1)
        qp_mj, qv_mj = _mj_step(m, d, qpos, qvel, ctrl, n=5)
        qp_j, qv_j = estep(jnp.asarray(qpos), jnp.asarray(qvel),
                           jnp.asarray(ctrl))
        errs.append(np.abs(qv_mj - np.asarray(qv_j)).max())
        qpos, qvel = qp_mj, qv_mj
    errs = np.array(errs)
    assert np.percentile(errs, 50) < 1e-6
    assert errs.max() < 5e-2
