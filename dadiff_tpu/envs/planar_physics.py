"""True-physics planar MuJoCo dynamics in JAX (TPU-resident locomotion).

The locomotion environments the reference targets (HalfCheetah / Hopper /
Walker2d; reference scripts/evaluate.py:240 steps host MuJoCo per action)
are all PLANAR kinematic trees: slide-x + slide-z + hinge-y root followed
by hinge-y leg joints, capsule geoms contacting a ground plane. MJX is
absent from this image, so this module re-derives the same dynamics
TPU-natively instead of translating MuJoCo's C pipeline:

* **Model parameters come from the real mjModel** (masses, inertias, joint
  anchors, capsule endpoints, solref/solimp, gears) — extracted once on the
  host at construction into a frozen pytree. Nothing is hand-tuned.
* **Smooth dynamics are derived by autodiff**, not transcribed: planar
  forward kinematics -> COM positions/angles; the mass matrix is assembled
  from autodiff body Jacobians (M = sum m J_c^T J_c + I J_th^T J_th +
  armature), Coriolis terms from dM/dq (Christoffel), gravity from the
  potential's gradient. At 9 DoF the (nv,nv,nv) tensor is trivially small
  and XLA fuses the whole step into one kernel.
* **Contacts and joint limits use MuJoCo's soft-constraint model**: per-row
  impedance d(r) from solimp, reference acceleration from solref
  (b = 2/(dmax*tc), k = 1/(dmax^2 tc^2 zeta^2)), diagonal regularizer
  R = (1/d - 1) diag(A), pyramidal friction cone, and a fixed-iteration
  projected Gauss-Seidel solve of the dual QP — a compiler-friendly
  stand-in for MuJoCo's Newton solver (same convex problem, simpler
  solver; fixed shapes and trip counts so the whole thing jits).
* **Integration is MuJoCo Euler**: implicit joint damping via
  (M + h*diag(damping)), then semi-implicit position update.

Accuracy is *measured*, not assumed: tests pin one-step parity against
host `mujoco.mj_step` on random states, and scripts/physics_bound.py runs
the same K-step return-error protocol as the learned-surrogate bound
(docs/surrogate_protocol.md) so the two on-device backends are judged by
one yardstick.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Model description (host-extracted, static)
# ---------------------------------------------------------------------------

SLIDE_X, SLIDE_Z, HINGE_Y = 0, 1, 2


class PlanarModel(NamedTuple):
    """Static planar rigid-body model (one kinematic chain per field row).

    Bodies are indexed 1..nb (0 = world); arrays below drop the world row.
    All geometry is in the xz-plane; rotations are about +y.
    """

    # tree / joints ------------------------------------------------------
    parent: np.ndarray        # (nb,) parent body index (0-based incl. world)
    body_pos: np.ndarray      # (nb, 2) body frame offset in parent frame
    dof_body: np.ndarray      # (nv,) body each dof belongs to (1-based)
    dof_type: np.ndarray      # (nv,) SLIDE_X / SLIDE_Z / HINGE_Y
    dof_anchor: np.ndarray    # (nv, 2) hinge anchor in body frame
    dof_sign: np.ndarray      # (nv,) +1/-1: joint axis sign (e.g. -y hinges)
    dof_ref: np.ndarray       # (nv,) joint reference (qpos0): disp = q - ref
    # inertial -----------------------------------------------------------
    mass: np.ndarray          # (nb,)
    inertia_y: np.ndarray     # (nb,) rotational inertia about +y through COM
    ipos: np.ndarray          # (nb, 2) COM offset in body frame
    armature: np.ndarray      # (nv,)
    # passive ------------------------------------------------------------
    damping: np.ndarray       # (nv,)
    stiffness: np.ndarray     # (nv,)
    springref: np.ndarray     # (nv,)
    # limits -------------------------------------------------------------
    jnt_limited: np.ndarray   # (nv,) bool
    jnt_range: np.ndarray     # (nv, 2)
    limit_solref: np.ndarray  # (nv, 2)
    limit_solimp: np.ndarray  # (nv, 5)
    # actuation ----------------------------------------------------------
    act_dof: np.ndarray       # (nu,) dof driven by each actuator
    gear: np.ndarray          # (nu,)
    ctrl_range: np.ndarray    # (nu, 2)
    # contact geometry: candidate sphere ends of capsules ----------------
    con_body: np.ndarray      # (nc,) body of each contact sphere (1-based)
    con_pos: np.ndarray       # (nc, 2) sphere center in body frame
    con_radius: np.ndarray    # (nc,)
    con_friction: np.ndarray  # (nc,) tangential friction coefficient
    con_solref: np.ndarray    # (nc, 2)
    con_solimp: np.ndarray    # (nc, 5)
    con_invweight: np.ndarray  # (nc,) body_invweight0 trans sum of the pair
    con_margin: np.ndarray    # (nc,) includemargin = sum margins - gaps
    dof_invweight: np.ndarray  # (nv,) dof_invweight0 (for limit rows)
    impratio: float
    # integration --------------------------------------------------------
    timestep: float
    gravity: float            # signed z acceleration (-9.81)
    integrator: str           # 'euler' (implicit damping) or 'rk4'
    nv: int
    nu: int
    nb: int


def _quat_rot(quat: np.ndarray) -> np.ndarray:
    w, x, y, z = quat
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def extract_planar_model(
    env_name: str,
    contact_geoms: Optional[Tuple[str, ...]] = None,
) -> PlanarModel:
    """Build a PlanarModel from the real gymnasium/MuJoCo model (host-only).

    Verifies the model is actually planar (slide-x/slide-z/hinge-y joints
    only, no body quaternions off the xz-plane) and raises otherwise.

    ``contact_geoms``: optional geom-name whitelist for the contact
    candidate set — e.g. ``("bfoot", "ffoot", "bshin", "fshin")`` for a
    cheaper SEARCH model (MPPI rollouts) that only collides the parts
    that touch ground during locomotion. Default: every colliding geom
    (the exact model).
    """
    import gymnasium as gym
    import mujoco

    env = gym.make(env_name)
    m = env.unwrapped.model
    env.close()

    nv, nu, nb = int(m.nv), int(m.nu), int(m.nbody) - 1
    if int(m.nq) != nv:
        raise ValueError(f"{env_name}: nq != nv — not a planar slide/hinge tree")

    dof_type = np.zeros(nv, np.int32)
    dof_body = np.zeros(nv, np.int32)
    dof_anchor = np.zeros((nv, 2), np.float64)
    dof_sign = np.ones(nv, np.float64)
    dof_ref = np.zeros(nv, np.float64)
    for j in range(m.njnt):
        jtype, axis = int(m.jnt_type[j]), m.jnt_axis[j]
        dof = int(m.jnt_dofadr[j])
        dof_body[dof] = int(m.jnt_bodyid[j])
        dof_anchor[dof] = m.jnt_pos[j][[0, 2]]
        dof_ref[dof] = m.qpos0[int(m.jnt_qposadr[j])]
        if jtype == mujoco.mjtJoint.mjJNT_SLIDE and abs(axis[0]) > 0.99:
            dof_type[dof] = SLIDE_X
            dof_sign[dof] = np.sign(axis[0])
        elif jtype == mujoco.mjtJoint.mjJNT_SLIDE and abs(axis[2]) > 0.99:
            dof_type[dof] = SLIDE_Z
            dof_sign[dof] = np.sign(axis[2])
        elif jtype == mujoco.mjtJoint.mjJNT_HINGE and abs(axis[1]) > 0.99:
            dof_type[dof] = HINGE_Y
            dof_sign[dof] = np.sign(axis[1])
        else:
            raise ValueError(f"{env_name}: joint {j} is not planar")

    body_pos = np.zeros((nb, 2))
    mass = np.zeros(nb)
    inertia_y = np.zeros(nb)
    ipos = np.zeros((nb, 2))
    parent = np.zeros(nb, np.int32)
    for b in range(1, m.nbody):
        if np.abs(m.body_quat[b] - np.array([1, 0, 0, 0])).max() > 1e-12:
            raise ValueError(f"{env_name}: body {b} has a fixed rotation "
                             "(unsupported in the planar extractor)")
        parent[b - 1] = int(m.body_parentid[b])
        body_pos[b - 1] = m.body_pos[b][[0, 2]]
        mass[b - 1] = m.body_mass[b]
        ipos[b - 1] = m.body_ipos[b][[0, 2]]
        # Iyy about COM in the world y direction: rotate the principal
        # inertia into the body frame and take the (y,y) component —
        # invariant under planar (y-axis) motion.
        R = _quat_rot(m.body_iquat[b])
        I_world = R @ np.diag(m.body_inertia[b]) @ R.T
        inertia_y[b - 1] = I_world[1, 1]

    act_dof = np.zeros(nu, np.int32)
    gear = np.zeros(nu)
    for u in range(nu):
        jid = int(m.actuator_trnid[u][0])
        act_dof[u] = int(m.jnt_dofadr[jid])
        gear[u] = m.actuator_gear[u][0]

    # contact candidates: both end-spheres of every capsule that can
    # collide with the floor plane (sphere geoms contribute one candidate)
    con_body, con_pos, con_radius = [], [], []
    con_friction, con_solref, con_solimp = [], [], []
    con_invweight, con_margin = [], []
    floor = None
    for g in range(m.ngeom):
        if int(m.geom_type[g]) == mujoco.mjtGeom.mjGEOM_PLANE:
            floor = g
    for g in range(m.ngeom):
        gtype = int(m.geom_type[g])
        b = int(m.geom_bodyid[g])
        if b == 0 or floor is None:
            continue
        if contact_geoms is not None:
            gname = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_GEOM, g)
            if gname not in contact_geoms:
                continue
        can_collide = (m.geom_contype[g] & m.geom_conaffinity[floor]) or \
                      (m.geom_contype[floor] & m.geom_conaffinity[g])
        if not can_collide:
            continue
        # mixed contact params exactly as MuJoCo combines geom pairs
        # (mj_contactParam in engine_collision_driver.c): friction = max;
        # unequal geom priority takes the higher-priority geom's params
        # verbatim; equal priority takes the solmix-weighted mean of
        # solimp and of standard (positive-timeconst) solref, with
        # direct/negative solref falling back to the elementwise min.
        # For the shipped envs (geom and floor share defaults) this
        # reduces to the params themselves — pinned by the MuJoCo
        # parity tests in tests/test_planar_physics.py.
        p_g, p_f = int(m.geom_priority[g]), int(m.geom_priority[floor])
        if p_g != p_f:
            hi = g if p_g > p_f else floor
            fric = m.geom_friction[hi][0]
            solref = np.array(m.geom_solref[hi], dtype=np.float64)
            solimp = np.array(m.geom_solimp[hi], dtype=np.float64)
        else:
            fric = max(m.geom_friction[g][0], m.geom_friction[floor][0])
            s1 = float(m.geom_solmix[g])
            s2 = float(m.geom_solmix[floor])
            if s1 >= mujoco.mjMINVAL and s2 >= mujoco.mjMINVAL:
                mix = s1 / (s1 + s2)
            elif s1 < mujoco.mjMINVAL and s2 < mujoco.mjMINVAL:
                mix = 0.5
            else:
                mix = 0.0 if s1 < mujoco.mjMINVAL else 1.0
            if m.geom_solref[g][0] > 0 and m.geom_solref[floor][0] > 0:
                solref = mix * m.geom_solref[g] \
                    + (1.0 - mix) * m.geom_solref[floor]
            else:
                solref = np.minimum(m.geom_solref[g], m.geom_solref[floor])
            solimp = mix * m.geom_solimp[g] \
                + (1.0 - mix) * m.geom_solimp[floor]
        R = _quat_rot(m.geom_quat[g])
        center = m.geom_pos[g][[0, 2]]
        if gtype == mujoco.mjtGeom.mjGEOM_CAPSULE:
            half = m.geom_size[g][1]
            axis = (R @ np.array([0.0, 0.0, 1.0]))[[0, 2]]
            ends = [center + half * axis, center - half * axis]
        elif gtype == mujoco.mjtGeom.mjGEOM_SPHERE:
            ends = [center]
        else:
            continue
        invw = (m.body_invweight0[b][0]
                + m.body_invweight0[m.geom_bodyid[floor]][0])
        # includemargin = (margin1 + margin2) - (gap1 + gap2); contacts
        # activate at dist < includemargin and every position term uses
        # dist - includemargin (verified against mjData.efc_pos/aref)
        incmargin = (m.geom_margin[g] + m.geom_margin[floor]
                     - m.geom_gap[g] - m.geom_gap[floor])
        for e in ends:
            con_body.append(b)
            con_pos.append(e)
            con_radius.append(m.geom_size[g][0])
            con_friction.append(fric)
            con_solref.append(solref)
            con_solimp.append(solimp)
            con_invweight.append(invw)
            con_margin.append(incmargin)

    integ = {0: "euler", 1: "rk4"}.get(int(m.opt.integrator))
    if integ is None:
        raise ValueError(f"{env_name}: unsupported integrator "
                         f"{int(m.opt.integrator)}")

    return PlanarModel(
        parent=parent,
        body_pos=body_pos,
        dof_body=dof_body,
        dof_type=dof_type,
        dof_anchor=dof_anchor,
        dof_sign=dof_sign,
        dof_ref=dof_ref,
        mass=mass,
        inertia_y=inertia_y,
        ipos=ipos,
        armature=np.asarray(m.dof_armature, np.float64).copy(),
        damping=np.asarray(m.dof_damping, np.float64).copy(),
        stiffness=np.array([m.jnt_stiffness[m.dof_jntid[d]] for d in range(nv)]),
        springref=np.array([m.qpos_spring[m.jnt_qposadr[m.dof_jntid[d]]]
                            for d in range(nv)]),
        jnt_limited=np.array([bool(m.jnt_limited[m.dof_jntid[d]])
                              for d in range(nv)]),
        jnt_range=np.array([m.jnt_range[m.dof_jntid[d]] for d in range(nv)]),
        limit_solref=np.array([m.jnt_solref[m.dof_jntid[d]] for d in range(nv)]),
        limit_solimp=np.array([m.jnt_solimp[m.dof_jntid[d]] for d in range(nv)]),
        act_dof=act_dof,
        gear=gear,
        ctrl_range=np.asarray(m.actuator_ctrlrange, np.float64).copy(),
        con_body=np.asarray(con_body, np.int32),
        con_pos=np.asarray(con_pos, np.float64),
        con_radius=np.asarray(con_radius, np.float64),
        con_friction=np.asarray(con_friction, np.float64),
        con_solref=np.asarray(con_solref, np.float64),
        con_solimp=np.asarray(con_solimp, np.float64),
        con_invweight=np.asarray(con_invweight, np.float64),
        con_margin=np.asarray(con_margin, np.float64),
        dof_invweight=np.asarray(m.dof_invweight0, np.float64).copy(),
        impratio=float(m.opt.impratio),
        integrator=integ,
        timestep=float(m.opt.timestep),
        gravity=float(m.opt.gravity[2]),
        nv=nv, nu=nu, nb=nb,
    )


# ---------------------------------------------------------------------------
# JAX dynamics
# ---------------------------------------------------------------------------


class PlanarPhysics:
    """Jittable planar dynamics with MuJoCo semantics.

    ``step(qpos, qvel, ctrl)`` advances one MuJoCo timestep (not one env
    step — compose ``frame_skip`` steps for the gym action repeat).
    All methods are pure and jit/vmap-friendly; dtype is float64 under
    ``jax.enable_x64`` and float32 otherwise (TPU path).
    """

    def __init__(self, model: PlanarModel, solver_iters: int = 30,
                 solver: str = "pgs", pyramid_edges: int = 4):
        """solver: 'pgs' (Gauss-Seidel; matches MuJoCo's Newton solution
        at high iteration counts, sequential over rows) or 'jacobi'
        (fully parallel — one masked matvec per iteration; measured
        machine-precision agreement with PGS at 150 iters on rollout
        frames. Use for wide-batch rollouts, e.g. MPPI candidates, where
        PGS's sequential row chain would dominate TPU latency)."""
        if solver not in ("pgs", "jacobi"):
            raise ValueError(f"unknown solver {solver!r}")
        if pyramid_edges not in (2, 4):
            raise ValueError("pyramid_edges must be 2 (cheap search model "
                             "— drops the degenerate y-tangent rows) or 4 "
                             "(MuJoCo-exact)")
        self.m = model
        self.solver_iters = solver_iters
        self.solver = solver
        self.pyramid_edges = pyramid_edges
        # pre-split dof list per body for the FK walk (static python)
        self._body_dofs = [
            [d for d in range(model.nv) if model.dof_body[d] == b + 1]
            for b in range(model.nb)
        ]

    # -- kinematics ------------------------------------------------------

    def _poses(self, qpos):
        """World pose (px, pz, th) of every body, plus world COM points."""
        m = self.m
        poses = [None] * m.nb  # (pos(2,), th)
        for b in range(m.nb):
            pb = int(m.parent[b])
            if pb == 0:
                pos = jnp.asarray(m.body_pos[b], qpos.dtype)
                th = jnp.asarray(0.0, qpos.dtype)
            else:
                ppos, pth = poses[pb - 1]
                c, s = jnp.cos(pth), jnp.sin(pth)
                off = jnp.asarray(m.body_pos[b], qpos.dtype)
                pos = ppos + jnp.stack(
                    [c * off[0] + s * off[1], -s * off[0] + c * off[1]]
                )
                th = pth
            # apply this body's joints in dof order (MuJoCo composes the
            # joint transforms after the fixed body offset); dof_sign
            # folds joint axes like (0,-1,0) into the canonical frame and
            # dof_ref is the joint's qpos0 reference (disp = q - ref)
            for d in self._body_dofs[b]:
                q = (qpos[d] - float(m.dof_ref[d])) * float(m.dof_sign[d])
                t = int(m.dof_type[d])
                if t == SLIDE_X:
                    c, s = jnp.cos(th), jnp.sin(th)
                    pos = pos + jnp.stack([c * q, -s * q])
                elif t == SLIDE_Z:
                    c, s = jnp.cos(th), jnp.sin(th)
                    pos = pos + jnp.stack([s * q, c * q])
                else:  # HINGE_Y: rotate the body frame about the anchor
                    anchor = jnp.asarray(m.dof_anchor[d], qpos.dtype)
                    c, s = jnp.cos(th), jnp.sin(th)
                    aw = pos + jnp.stack(
                        [c * anchor[0] + s * anchor[1],
                         -s * anchor[0] + c * anchor[1]]
                    )
                    th = th + q
                    c2, s2 = jnp.cos(th), jnp.sin(th)
                    pos = aw - jnp.stack(
                        [c2 * anchor[0] + s2 * anchor[1],
                         -s2 * anchor[0] + c2 * anchor[1]]
                    )
            poses[b] = (pos, th)
        return poses

    def _coms_and_angles(self, qpos):
        m = self.m
        poses = self._poses(qpos)
        coms, angles = [], []
        for b in range(m.nb):
            pos, th = poses[b]
            c, s = jnp.cos(th), jnp.sin(th)
            ip = jnp.asarray(m.ipos[b], qpos.dtype)
            coms.append(pos + jnp.stack(
                [c * ip[0] + s * ip[1], -s * ip[0] + c * ip[1]]
            ))
            angles.append(th)
        return jnp.stack(coms), jnp.stack(angles)

    def contact_points(self, qpos):
        """World (x, z) of every candidate contact sphere center. (nc, 2)"""
        return self._contact_kinematics(qpos)[0]

    def _contact_kinematics(self, qpos):
        """(centers (nc,2), body angle per contact (nc,)) — differentiable.

        The constraint Jacobian must be taken at the contact POINT (center
        - radius ẑ) as a material point of the body: its tangential
        velocity picks up an ω×r term, J_t = J_center_x - radius * J_θ.
        """
        m = self.m
        poses = self._poses(qpos)
        pts, angs = [], []
        for i in range(len(m.con_body)):
            pos, th = poses[int(m.con_body[i]) - 1]
            c, s = jnp.cos(th), jnp.sin(th)
            cp = jnp.asarray(m.con_pos[i], qpos.dtype)
            pts.append(pos + jnp.stack(
                [c * cp[0] + s * cp[1], -s * cp[0] + c * cp[1]]
            ))
            angs.append(th)
        return jnp.stack(pts), jnp.stack(angs)

    # -- smooth dynamics -------------------------------------------------

    def mass_matrix(self, qpos):
        m = self.m

        def coms_flat(q):
            coms, angles = self._coms_and_angles(q)
            return coms, angles

        Jc, Jth = jax.jacfwd(coms_flat)(qpos)  # (nb,2,nv), (nb,nv)
        mass = jnp.asarray(m.mass, qpos.dtype)
        iner = jnp.asarray(m.inertia_y, qpos.dtype)
        M = (jnp.einsum("b,biv,biw->vw", mass, Jc, Jc)
             + jnp.einsum("b,bv,bw->vw", iner, Jth, Jth))
        return M + jnp.diag(jnp.asarray(m.armature, qpos.dtype))

    def _potential(self, qpos):
        coms, _ = self._coms_and_angles(qpos)
        mass = jnp.asarray(self.m.mass, qpos.dtype)
        return -self.m.gravity * jnp.sum(mass * coms[:, 1])

    def bias_forces(self, qpos, qvel):
        """Coriolis/centrifugal + gravity:  c(q, v) with  M qacc + c = tau.

        c = Ṁv − ½ ∂(vᵀMv)/∂q + ∂V/∂q, with Ṁv as a single JVP in the
        direction of qvel and the quadratic term as one reverse pass —
        O(1) mass-matrix builds instead of the nv-fold jacfwd of the
        full dM/dq tensor (same math; the op-count matters because the
        whole step sits inside wide-batch vmapped rollouts)."""
        _, mdot_v = jax.jvp(
            lambda q: self.mass_matrix(q) @ qvel, (qpos,), (qvel,)
        )
        dT = jax.grad(lambda q: 0.5 * qvel @ self.mass_matrix(q) @ qvel)(
            qpos
        )
        return mdot_v - dT + jax.grad(self._potential)(qpos)

    def _actuation(self, ctrl, dtype):
        m = self.m
        lo = jnp.asarray(m.ctrl_range[:, 0], dtype)
        hi = jnp.asarray(m.ctrl_range[:, 1], dtype)
        c = jnp.clip(ctrl, lo, hi)
        tau = jnp.zeros(m.nv, dtype)
        return tau.at[jnp.asarray(m.act_dof)].add(
            jnp.asarray(m.gear, dtype) * c
        )

    # -- constraints -----------------------------------------------------

    @staticmethod
    def _impedance(solimp, violation):
        """MuJoCo position-dependent impedance d(r) (docs: Solver params)."""
        d0, dw, width, mid, power = (solimp[..., 0], solimp[..., 1],
                                     solimp[..., 2], solimp[..., 3],
                                     solimp[..., 4])
        # MuJoCo clamps impedance endpoints to [mjMINIMP, mjMAXIMP]
        # (verified against mjData.efc_KBIP: d = d0' + y*(dmax'-d0') with
        # d0' = clip(d0, 1e-4, 0.9999))
        d0 = jnp.clip(d0, 1e-4, 0.9999)
        dw = jnp.clip(dw, 1e-4, 0.9999)
        x = jnp.clip(jnp.abs(violation) / jnp.maximum(width, 1e-12), 0.0, 1.0)
        # sigmoid: y(x) with y(0)=0, y(1)=1, split at `mid` with exponent
        lo = (x / jnp.maximum(mid, 1e-12)) ** power * mid
        hi = 1.0 - ((1.0 - x) / jnp.maximum(1.0 - mid, 1e-12)) ** power \
            * (1.0 - mid)
        y = jnp.where(x < mid, lo, hi)
        return d0 + y * (dw - d0)

    @staticmethod
    def _kb(solref, solimp_d):
        """Stiffness/damping of the reference acceleration from solref."""
        tc, zeta = solref[..., 0], solref[..., 1]
        dmax = jnp.maximum(solimp_d, 1e-8)
        b = 2.0 / (dmax * jnp.maximum(tc, 1e-8))
        k = 1.0 / (dmax * dmax * jnp.maximum(tc, 1e-8) ** 2
                   * jnp.maximum(zeta, 1e-8) ** 2)
        return k, b

    def _constraint_rows(self, qpos, qvel):
        """Assemble soft-constraint rows (fixed shapes, inactive = masked).

        Returns (J, aref, R, active): rows are the 2*(condim-1) pyramid
        edges per contact (the planar y-tangent edges degenerate to pure
        normal rows but still carry normal force, exactly as MuJoCo emits
        them) plus one-sided joint-limit rows. R is MuJoCo's diagonal
        regularizer: contacts use the precomputed translational
        body_invweight0 pair sum scaled by 2*mu^2*(1+mu^2)/impratio
        (fitted exactly against mjData.efc_R on probe models); limits use
        dof_invweight0.
        """
        m = self.m
        dtype = qpos.dtype
        rows_J, rows_aref, rows_R, rows_active = [], [], [], []

        # contacts ------------------------------------------------------
        nc = len(m.con_body)
        if nc:
            (pts, _), (Jp, Jang) = (
                self._contact_kinematics(qpos),
                jax.jacfwd(self._contact_kinematics)(qpos),
            )                                         # (nc,2),(nc,2,nv),(nc,nv)
            radius = jnp.asarray(m.con_radius, dtype)
            margin = jnp.asarray(m.con_margin, dtype)
            geom_dist = pts[:, 1] - radius            # geometric gap
            # row position = dist - includemargin; active while negative
            dist = geom_dist - margin
            viol = jnp.maximum(-dist, 0.0)
            d_imp = self._impedance(jnp.asarray(m.con_solimp, dtype), viol)
            k, b = self._kb(jnp.asarray(m.con_solref, dtype),
                            jnp.asarray(m.con_solimp[:, 1], dtype))
            active = dist < 0.0
            mu = jnp.asarray(m.con_friction, dtype)
            d_eff = jnp.clip(d_imp, 1e-6, 1.0 - 1e-6)
            R_con = ((1.0 - d_eff) / d_eff
                     * jnp.asarray(m.con_invweight, dtype)
                     * 2.0 * mu * mu * (1.0 + mu * mu) / m.impratio)
            Jn = Jp[:, 1, :]                          # normal = +z
            # MuJoCo places the contact point midway through the
            # penetration (geometric, not margin-adjusted): material-point
            # offset below the sphere center is -(radius + dist/2),
            # which feeds the ω×r tangent term
            r_off = radius + jnp.minimum(geom_dist, 0.0) / 2.0
            Jt = Jp[:, 0, :] - r_off[:, None] * Jang
            # pyramid edges n ± mu*t_x, then the two degenerate y-tangent
            # edges (zero planar motion -> pure normal rows; dropped in
            # the 2-edge search model — they only add normal capacity).
            # aref = -b*vel - k*imp*pos with pos = dist, per row velocity.
            edges = [Jn + mu[:, None] * Jt, Jn - mu[:, None] * Jt]
            if self.pyramid_edges == 4:
                edges += [Jn, Jn]
            for Je in edges:
                ve = Je @ qvel
                rows_J.append(Je)
                rows_aref.append(-b * ve - k * d_imp * dist)
                rows_R.append(R_con)
                rows_active.append(active)

        # joint limits --------------------------------------------------
        lim_dofs = [d for d in range(m.nv) if m.jnt_limited[d]]
        if lim_dofs:
            idx = jnp.asarray(lim_dofs)
            lo = jnp.asarray(m.jnt_range[lim_dofs, 0], dtype)
            hi = jnp.asarray(m.jnt_range[lim_dofs, 1], dtype)
            solref = jnp.asarray(m.limit_solref[lim_dofs], dtype)
            solimp = jnp.asarray(m.limit_solimp[lim_dofs], dtype)
            invw = jnp.asarray(m.dof_invweight[lim_dofs], dtype)
            q = qpos[idx]
            for side in (0, 1):
                # side 0: q > lo  (J = +e), side 1: q < hi  (J = -e)
                dist = jnp.where(side == 0, q - lo, hi - q)
                viol = jnp.maximum(-dist, 0.0)
                d_imp = self._impedance(solimp, viol)
                k, b = self._kb(solref, solimp[:, 1])
                d_eff = jnp.clip(d_imp, 1e-6, 1.0 - 1e-6)
                sign = 1.0 if side == 0 else -1.0
                J = jnp.zeros((len(lim_dofs), m.nv), dtype)
                J = J.at[jnp.arange(len(lim_dofs)), idx].set(sign)
                ve = J @ qvel
                rows_J.append(J)
                rows_aref.append(-b * ve - k * d_imp * dist)
                rows_R.append((1.0 - d_eff) / d_eff * invw)
                rows_active.append(dist < 0.0)

        if not rows_J:
            return None
        J = jnp.concatenate(rows_J, axis=0)
        aref = jnp.concatenate(rows_aref, axis=0)
        R = jnp.concatenate(rows_R, axis=0)
        active = jnp.concatenate(rows_active, axis=0)
        return J, aref, R, active

    # -- forward + integrate --------------------------------------------

    def _forward(self, qpos, qvel, ctrl):
        """Constrained forward dynamics: returns (qacc, M, qfrc_smooth,
        qfrc_constraint) — the full MuJoCo forward() pipeline."""
        m = self.m
        dtype = qpos.dtype

        M = self.mass_matrix(qpos)
        bias = self.bias_forces(qpos, qvel)
        damping = jnp.asarray(m.damping, dtype)
        stiff = jnp.asarray(m.stiffness, dtype)
        sref = jnp.asarray(m.springref, dtype)
        passive = -stiff * (qpos - sref) - damping * qvel
        tau = self._actuation(ctrl, dtype)
        qfrc_smooth = tau + passive - bias
        qacc_smooth = jax.scipy.linalg.solve(
            M, qfrc_smooth, assume_a="pos"
        )

        rows = self._constraint_rows(qpos, qvel)
        if rows is None:
            qacc = qacc_smooth
            qfrc_con = jnp.zeros_like(qvel)
        else:
            J, aref, R, active = rows
            Minv_Jt = jax.scipy.linalg.solve(M, J.T, assume_a="pos")
            A = J @ Minv_Jt                       # (nr, nr)
            b_vec = J @ qacc_smooth - aref
            mask = active.astype(dtype)
            # min 1/2 f^T (A+R) f + f^T b,  f >= 0, masked rows
            AR = A + jnp.diag(R)
            diag = jnp.clip(jnp.diag(AR), 1e-10, None)
            f0 = jnp.zeros(J.shape[0], dtype)

            if self.solver == "pgs":
                def pgs_iter(f, _):
                    def row_update(i, f):
                        g = AR[i] @ f + b_vec[i]
                        fi = jnp.maximum(f[i] - g / diag[i], 0.0) * mask[i]
                        return f.at[i].set(fi)
                    f = jax.lax.fori_loop(0, f.shape[0], row_update, f)
                    return f, None

                f, _ = jax.lax.scan(
                    pgs_iter, f0, None, length=self.solver_iters
                )
            else:
                # 'jacobi': parallel solve — diagonally-preconditioned
                # FISTA (accelerated projected gradient). Pure per-row
                # Jacobi diverges when A is not diagonally dominant
                # (multiple coupled contacts); preconditioning by
                # D^{-1/2} normalizes the diagonal and the Gershgorin
                # step on the scaled matrix guarantees convergence, with
                # Nesterov momentum recovering most of Gauss-Seidel's
                # rate. One masked matvec per iteration, no row chain.
                dhalf = jnp.sqrt(diag)
                At = AR / (dhalf[:, None] * dhalf[None, :])
                bt = b_vec / dhalf
                At_m = At * mask[:, None] * mask[None, :]
                alpha = 1.0 / jnp.maximum(
                    jnp.max(jnp.sum(jnp.abs(At_m), axis=1)), 1.0
                )

                def fista_iter(carry, k):
                    ft, ft_prev = carry
                    beta = k / (k + 3.0)
                    y = ft + beta * (ft - ft_prev)
                    g = At @ y + bt
                    ft_new = jnp.maximum(y - alpha * g, 0.0) * mask
                    return (ft_new, ft), None

                (ft, _), _ = jax.lax.scan(
                    fista_iter, (f0, f0),
                    jnp.arange(self.solver_iters, dtype=dtype),
                )
                f = ft / dhalf
            qfrc_con = J.T @ f
            qacc = qacc_smooth + Minv_Jt @ f

        return qacc, M, qfrc_smooth, qfrc_con

    def step(self, qpos, qvel, ctrl):
        """One MuJoCo timestep with the model's own integrator."""
        if self.m.integrator == "rk4":
            return self._step_rk4(qpos, qvel, ctrl)
        return self._step_euler(qpos, qvel, ctrl)

    def _step_euler(self, qpos, qvel, ctrl):
        """MuJoCo Euler: implicit joint damping —
        (M + h D) v+ = M v + h (qfrc_smooth_nodamp + qfrc_constraint),
        where qfrc_smooth_nodamp re-adds the explicit damping force."""
        m = self.m
        dtype = qpos.dtype
        h = jnp.asarray(m.timestep, dtype)
        damping = jnp.asarray(m.damping, dtype)

        _, M, qfrc_smooth, qfrc_con = self._forward(qpos, qvel, ctrl)
        qfrc_total = qfrc_smooth + qfrc_con + damping * qvel
        MhD = M + h * jnp.diag(damping)
        qvel_new = jax.scipy.linalg.solve(
            MhD, M @ qvel + h * qfrc_total, assume_a="pos"
        )
        qpos_new = qpos + h * qvel_new
        return qpos_new, qvel_new

    def _step_rk4(self, qpos, qvel, ctrl):
        """MuJoCo mj_RungeKutta (N=4): classic RK4 on (qpos, qvel) with a
        full constrained forward() per stage; damping stays explicit."""
        m = self.m
        dtype = qpos.dtype
        h = jnp.asarray(m.timestep, dtype)
        A = ((0.5, 0.0, 0.0), (0.0, 0.5, 0.0), (0.0, 0.0, 1.0))
        B = (1.0 / 6.0, 1.0 / 3.0, 1.0 / 3.0, 1.0 / 6.0)

        kv = [qvel]
        ka = [self._forward(qpos, qvel, ctrl)[0]]
        for i in range(3):
            dq = sum(A[i][j] * kv[j] for j in range(len(kv)))
            dv = sum(A[i][j] * ka[j] for j in range(len(ka)))
            qi = qpos + h * dq
            vi = qvel + h * dv
            kv.append(vi)
            ka.append(self._forward(qi, vi, ctrl)[0])

        qpos_new = qpos + h * sum(b * k for b, k in zip(B, kv))
        qvel_new = qvel + h * sum(b * k for b, k in zip(B, ka))
        return qpos_new, qvel_new

    def env_step(self, qpos, qvel, ctrl, frame_skip: int):
        """Gym-style step: ``frame_skip`` physics steps with held control."""
        def body(carry, _):
            qp, qv = carry
            qp, qv = self.step(qp, qv, ctrl)
            return (qp, qv), None
        (qpos, qvel), _ = jax.lax.scan(
            body, (qpos, qvel), None, length=frame_skip
        )
        return qpos, qvel
