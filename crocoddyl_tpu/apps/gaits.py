"""Locomotion problem factories (quadruped + biped gaits).

TPU-native re-design of the reference's gait factories
(bindings/python/crocoddyl/utils/quadruped.py:25-522 —
SimpleQuadrupedalGaitProblem: CoM / walking / trotting / pacing / bounding /
jumping — and utils/biped.py:6-278 — SimpleBipedGaitProblem: walking /
jumping), with the same contact recipes, cost items and weights.

Design: the reference builds a Python list of heterogeneous per-knot action
models.  Here every knot of a problem shares ONE pytree structure — a
:class:`~crocoddyl_tpu.models.multibody.nodes.RigidBodyNode` with the full
maximal contact set and cost stack — and per-knot differences (contact
activity, task references, weights, dt) are array leaves.  ``stack_models``
stacks the T knots into a single leading-T-axis model, so one jitted FDDP
program covers the entire gait schedule, and the per-node evaluation vmaps
over T (the OpenMP-loop analogue, shooting.hxx:143-178).

Foot-switch knots use the reference's pseudo-impulse recipe by default (dt=0
node with high-weight foot-track + foot-velocity costs, quadruped.py:456-521);
``pseudo_impulse=False`` switches to TRUE ImpulseNode knots
(quadruped.py:523-554 createImpulseModel) via the segmented-problem API:
consecutive runs of same-type nodes are stacked into segments and the
ShootingProblem evaluates them as consecutive vmaps/scans.

CoP support costs (the fork's thesis contribution,
RH5/utils/walkProblem.py:393-398: CostModelContactCoPPosition with a [0,∞)
quadratic barrier, weight 1e3 per supporting foot) are enabled by setting
``cop_box = (length, width)`` on a 6D-contact factory (biped).
"""

from __future__ import annotations

from itertools import groupby
from typing import List, Optional, Sequence

import numpy as np

import jax.numpy as jnp

from ..core.action import stack_models
from ..core.problem import ShootingProblem
from ..dynamics import algorithms as algo
from ..dynamics.model import RobotModel
from ..dynamics.states import StateMultibody
from ..models.multibody.activations import (
    ActivationQuad, ActivationQuadraticBarrier, ActivationWeightedQuad,
)
from ..models.multibody.actuations import FloatingBaseActuation
from ..models.multibody.contacts import Contact3D, Contact6D, ContactSet
from ..models.multibody.costs import (
    CostCoM, CostContactCoP, CostContactFrictionCone, CostControl,
    CostFramePlacement, CostFrameTranslation, CostFrameVelocity, CostState,
)
from ..models.multibody.frames import cop_support, friction_cone
from ..models.multibody.nodes import CostStack, ImpulseNode, RigidBodyNode


def _fk_positions(model: RobotModel, q, fids):
    """Build-time world positions of frames (numpy out)."""
    oMi, _ = algo.forward_kinematics(model, jnp.asarray(q))
    return [np.array(algo.frame_placement(model, oMi, f).p) for f in fids]


class _LocomotionFactory:
    """Shared machinery: per-knot specs → uniform RigidBodyNodes → stacked
    ShootingProblem."""

    #: Baumgarte (Kp, Kv) — quadruped.py:429 uses (0, 50); biped.py:185 (0, 0)
    contact_gains = (0.0, 50.0)
    contact_dim = 3          # 3 = point contact, 6 = placement contact
    w_com = 1e6
    w_foot_track = 1e6       # swing tracking (running knots)
    w_foot_track_switch = 1e7
    w_impulse_vel = 1e6
    w_friction = 1e1
    w_state_reg = 1e1
    w_ctrl = 1e-1
    w_ctrl_switch = 1e-3
    w_state_bounds = 0.0     # quadruped.py:446 uses 1e3; biped has none
    w_cop = 1e3              # RH5/utils/walkProblem.py:393-398
    cop_box = None           # (length, width) → enable CoP costs (6D only)

    def __init__(self, model: RobotModel, foot_names: Sequence[str],
                 mu: float = 0.7, default_q=None):
        self.model = model
        self.state = StateMultibody(model=model)
        self.feet = [model.frame_id(n) for n in foot_names]
        self.nfeet = len(self.feet)
        self.mu = mu
        self.cone = friction_cone((0., 0., 1.), mu, nf=4, inner_appr=False)
        nv = model.nv
        q0 = np.asarray(default_q if default_q is not None
                        else model.neutral())
        self.default_state = np.concatenate([q0, np.zeros(nv)])
        self.first_step = True
        self._default_foot_pos = _fk_positions(model, q0, self.feet)

    # ------------------------------------------------------------------
    # state weights (quadruped.py:440-443 running / :505-507 switch; biped
    # overrides below)
    def _state_weights_running(self):
        nv = self.model.nv
        return np.array([0.] * 3 + [500.] * 3 + [0.01] * (nv - 6)
                        + [10.] * 6 + [1.] * (nv - 6))

    def _state_weights_switch(self):
        nv = self.model.nv
        return np.array([0.] * 3 + [500.] * 3 + [0.01] * (nv - 6)
                        + [10.] * nv)

    def _state_bounds(self):
        """Tangent-space barrier bounds from model limits (quadruped.py:444-448;
        free-flyer dims unbounded per multibody.hxx:25-35)."""
        m = self.model
        nv = m.nv
        inf = np.inf
        q_lb = np.concatenate([[-inf] * 6, np.asarray(m.q_lb)[7:]])
        q_ub = np.concatenate([[inf] * 6, np.asarray(m.q_ub)[7:]])
        v_l = np.asarray(m.v_limit)
        return (np.concatenate([q_lb, -v_l]), np.concatenate([q_ub, v_l]))

    # ------------------------------------------------------------------
    def _make_contact(self, fid, foot_pos0):
        if self.contact_dim == 3:
            return Contact3D(fid=fid, pref=jnp.zeros(3),
                             gains=jnp.asarray(self.contact_gains),
                             active=jnp.asarray(1.0))
        return Contact6D(fid=fid, ref_R=jnp.eye(3),
                         ref_p=jnp.asarray(foot_pos0),
                         gains=jnp.asarray(self.contact_gains),
                         active=jnp.asarray(1.0))

    def _make_foot_track_cost(self, fid, ref, w, active):
        if self.contact_dim == 3:
            return CostFrameTranslation(
                fid=fid, pref=jnp.asarray(ref), activation=ActivationQuad(),
                weight=jnp.asarray(w), active=jnp.asarray(active))
        return CostFramePlacement(
            fid=fid, ref_R=jnp.eye(3), ref_p=jnp.asarray(ref),
            activation=ActivationQuad(), weight=jnp.asarray(w),
            active=jnp.asarray(active))

    def _make_node(self, dt, support, com_task=None, foot_tasks=None,
                   switch=False):
        """One knot (quadruped.py:407-461 createSwingFootModel /
        :463-521 createPseudoImpulseModel).

        :param support: iterable of foot indices (0..nfeet-1) in contact
        :param com_task: (3,) CoM target or None
        :param foot_tasks: dict foot_idx → (3,) target or None
        :param switch: pseudo-impulse knot (dt=0, boosted weights)
        """
        foot_tasks = foot_tasks or {}
        support = set(support)
        st = self.state
        nu = self.model.nv - 6

        contacts = []
        cone_costs = []
        cop_costs = []
        track_costs = []
        vel_costs = []
        foot_pos0 = self._default_foot_pos
        for i, fid in enumerate(self.feet):
            c = self._make_contact(fid, foot_pos0[i])
            contacts.append(c.replace(active=jnp.asarray(
                1.0 if i in support else 0.0)))
            cone_costs.append(CostContactFrictionCone(
                contact_idx=i, cone=self.cone,
                activation=ActivationQuadraticBarrier(lb=self.cone.lb,
                                                      ub=self.cone.ub),
                weight=jnp.asarray(self.w_friction),
                active=jnp.asarray(1.0 if i in support else 0.0)))
            if self.cop_box is not None and self.contact_dim == 6:
                # CoP-inside-support barrier A·f ≥ 0 (the thesis cost;
                # contact-cop-position.hxx:47-88 + walkProblem.py:393-398)
                sup = cop_support(*self.cop_box)
                cop_costs.append(CostContactCoP(
                    contact_idx=i, support=sup,
                    activation=ActivationQuadraticBarrier(
                        lb=jnp.zeros(4), ub=jnp.full((4,), np.inf)),
                    weight=jnp.asarray(self.w_cop),
                    active=jnp.asarray(1.0 if i in support else 0.0)))
            tracked = i in foot_tasks
            ref = foot_tasks.get(i, np.zeros(3))
            w_track = self.w_foot_track_switch if switch else self.w_foot_track
            track_costs.append(self._make_foot_track_cost(
                fid, ref, w_track, 1.0 if tracked else 0.0))
            vel_costs.append(CostFrameVelocity(
                fid=fid, vref=jnp.zeros(6), activation=ActivationQuad(),
                weight=jnp.asarray(self.w_impulse_vel),
                active=jnp.asarray(1.0 if (switch and tracked) else 0.0)))

        sw = (self._state_weights_switch() if switch
              else self._state_weights_running())
        items = [
            CostCoM(cref=jnp.asarray(com_task if com_task is not None
                                     else np.zeros(3)),
                    activation=ActivationQuad(),
                    weight=jnp.asarray(self.w_com),
                    active=jnp.asarray(1.0 if com_task is not None else 0.0)),
            *track_costs, *vel_costs, *cone_costs, *cop_costs,
            CostState(xref=jnp.asarray(self.default_state),
                      activation=ActivationWeightedQuad(
                          weights=jnp.asarray(sw ** 2)),
                      weight=jnp.asarray(self.w_state_reg),
                      active=jnp.asarray(1.0)),
            CostControl(uref=jnp.zeros(nu), activation=ActivationQuad(),
                        weight=jnp.asarray(
                            self.w_ctrl_switch if switch else self.w_ctrl),
                        active=jnp.asarray(1.0)),
        ]
        if self.w_state_bounds > 0.0:
            lb, ub = self._state_bounds()
            nq = self.model.nq
            items.append(CostState(
                xref=jnp.asarray(np.concatenate(
                    [np.asarray(self.model.neutral()),
                     np.zeros(self.model.nv)])),
                activation=ActivationQuadraticBarrier(lb=jnp.asarray(lb),
                                                      ub=jnp.asarray(ub)),
                weight=jnp.asarray(self.w_state_bounds),
                active=jnp.asarray(1.0)))

        return RigidBodyNode(
            state_=st,
            actuation=FloatingBaseActuation(nv=self.model.nv),
            costs=CostStack(items=tuple(items)),
            contacts=ContactSet(contacts=tuple(contacts)),
            dt=jnp.asarray(float(dt)))

    # ------------------------------------------------------------------
    def _make_impulse_node(self, support, foot_tasks):
        """TRUE impulse switch knot (quadruped.py:523-554 createImpulseModel):
        ImpulseFwdDynamics over the landing feet, foot-track w=1e7 on the
        swing feet + switch-weight state regularization."""
        foot_tasks = foot_tasks or {}
        support = set(support)
        st = self.state
        nu = self.model.nv - 6
        impulses = []
        track_costs = []
        for i, fid in enumerate(self.feet):
            c = self._make_contact(fid, self._default_foot_pos[i])
            impulses.append(c.replace(active=jnp.asarray(
                1.0 if i in support else 0.0)))
            tracked = i in foot_tasks
            ref = foot_tasks.get(i, np.zeros(3))
            track_costs.append(self._make_foot_track_cost(
                fid, ref, self.w_foot_track_switch, 1.0 if tracked else 0.0))
        sw = self._state_weights_switch()
        items = (*track_costs,
                 CostState(xref=jnp.asarray(self.default_state),
                           activation=ActivationWeightedQuad(
                               weights=jnp.asarray(sw ** 2)),
                           weight=jnp.asarray(self.w_state_reg),
                           active=jnp.asarray(1.0)))
        return ImpulseNode(state_=st, impulses=ContactSet(
            contacts=tuple(impulses)), costs=CostStack(items=items),
            nu_=nu, r_coeff=jnp.zeros(()))

    # ------------------------------------------------------------------
    def _footstep_models(self, com_pos0, feet_pos0, step_length, step_height,
                         dt, num_knots, support, swing,
                         pseudo_impulse=True) -> List:
        """Swing-phase knots + foot switch (quadruped.py:359-405
        createFootstepModels; identical in biped.py).  The switch knot is a
        pseudo-impulse (dt=0, boosted weights) by default, or a true
        ImpulseNode with ``pseudo_impulse=False``."""
        num_legs = len(support) + len(swing)
        com_pct = float(len(swing)) / num_legs
        models = []
        ph_knots = num_knots / 2.0
        last_tasks = {}
        for k in range(num_knots):
            tasks = {}
            for i, p in zip(swing, feet_pos0):
                if k < ph_knots:
                    dp = np.array([step_length * (k + 1) / num_knots, 0.,
                                   step_height * k / ph_knots])
                elif k == ph_knots:
                    dp = np.array([step_length * (k + 1) / num_knots, 0.,
                                   step_height])
                else:
                    dp = np.array([step_length * (k + 1) / num_knots, 0.,
                                   step_height * (1 - (k - ph_knots) / ph_knots)])
                tasks[i] = p + dp
            com_task = (np.array([step_length * (k + 1) / num_knots, 0., 0.])
                        * com_pct + com_pos0)
            models.append(self._make_node(dt, support, com_task=com_task,
                                          foot_tasks=tasks))
            last_tasks = tasks
        if pseudo_impulse:
            models.append(self._make_node(0.0, support, foot_tasks=last_tasks,
                                          switch=True))
        else:
            # landing feet join the support set at the impact
            land = set(support) | set(swing)
            models.append(self._make_impulse_node(land, last_tasks))
        com_pos0 += np.array([step_length * com_pct, 0., 0.])
        for p in feet_pos0:
            p += np.array([step_length, 0., 0.])
        return models

    def _problem(self, x0, models) -> ShootingProblem:
        """Stack the per-knot model list; heterogeneous node types become
        consecutive same-type segments (core/problem.py)."""
        segments = tuple(
            stack_models(list(grp))
            for _, grp in groupby(models, key=type))
        running = segments[0] if len(segments) == 1 else segments
        return ShootingProblem(x0=jnp.asarray(x0), running=running,
                               terminal=models[-1])

    def _com_ref(self, q0):
        pos = _fk_positions(self.model, q0, self.feet)
        com_ref = np.mean(pos, axis=0)
        com_ref[2] = float(algo.center_of_mass(self.model, jnp.asarray(q0))[2])
        return com_ref, pos

    # ------------------------------------------------------------------
    def com_problem(self, x0, com_go_to: float, dt: float, num_knots: int,
                    forward_back: bool = True) -> ShootingProblem:
        """CoM shift task (quadruped.py:25-73 createCoMProblem /
        createCoMGoalProblem)."""
        x0 = np.asarray(x0)
        q0 = x0[:self.model.nq]
        com0 = np.asarray(algo.center_of_mass(self.model, jnp.asarray(q0)))
        allfeet = range(self.nfeet)
        models = [self._make_node(dt, allfeet) for _ in range(num_knots)]
        models.append(self._make_node(
            dt, allfeet, com_task=com0 + np.array([com_go_to, 0., 0.])))
        if forward_back:
            models += [self._make_node(dt, allfeet) for _ in range(num_knots)]
            models.append(self._make_node(
                dt, allfeet, com_task=com0 + np.array([-com_go_to, 0., 0.])))
        return self._problem(x0, models)

    def jumping_problem(self, x0, jump_height: float, jump_length,
                        dt: float, ground_knots: int,
                        flying_knots: int) -> ShootingProblem:
        """Jump: takeoff → flight → pseudo-impulse landing → landed
        (quadruped.py:304-357 createJumpingProblem; biped.py:67-116)."""
        x0 = np.asarray(x0)
        q0 = x0[:self.model.nq]
        com_ref, pos = self._com_ref(q0)
        jump_length = np.asarray(jump_length, float)
        df = jump_length[2] - pos[0][2]
        pos = [np.array([p[0], p[1], 0.0]) for p in pos]
        allfeet = list(range(self.nfeet))

        models = [self._make_node(dt, allfeet) for _ in range(ground_knots)]
        for k in range(flying_knots):
            ct = (np.array([jump_length[0], jump_length[1],
                            jump_length[2] + jump_height])
                  * (k + 1) / flying_knots + com_ref)
            models.append(self._make_node(dt, [], com_task=ct))
        models += [self._make_node(dt, []) for _ in range(flying_knots)]
        foot_tasks = {i: pos[i] + jump_length for i in allfeet}
        models.append(self._make_node(0.0, allfeet, foot_tasks=foot_tasks,
                                      switch=True))
        f0 = jump_length.copy()
        f0[2] = df
        models += [self._make_node(dt, allfeet, com_task=com_ref + f0)
                   for _ in range(ground_knots)]
        return self._problem(x0, models)


class QuadrupedGaitFactory(_LocomotionFactory):
    """SimpleQuadrupedalGaitProblem (quadruped.py:25-522): feet order must be
    (LF, RF, LH, RH)."""

    contact_dim = 3
    contact_gains = (0.0, 50.0)
    w_state_bounds = 1e3

    def walking_problem(self, x0, step_length, step_height, dt,
                        step_knots, support_knots,
                        pseudo_impulse=True) -> ShootingProblem:
        """One walking cycle: 2×[double support + 2 footsteps]
        (quadruped.py:111-160); footfall order RH, RF, LH, LF."""
        x0 = np.asarray(x0)
        com_ref, (lf, rf, lh, rh) = self._com_ref(x0[:self.model.nq])
        LF, RF, LH, RH = 0, 1, 2, 3
        first = 0.5 if self.first_step else 1.0
        self.first_step = False
        allfeet = range(self.nfeet)
        models = [self._make_node(dt, allfeet) for _ in range(support_knots)]
        models += self._footstep_models(com_ref, [rh], first * step_length,
                                        step_height, dt, step_knots,
                                        [LF, RF, LH], [RH], pseudo_impulse)
        models += self._footstep_models(com_ref, [rf], first * step_length,
                                        step_height, dt, step_knots,
                                        [LF, LH, RH], [RF], pseudo_impulse)
        models += [self._make_node(dt, allfeet) for _ in range(support_knots)]
        models += self._footstep_models(com_ref, [lh], step_length,
                                        step_height, dt, step_knots,
                                        [LF, RF, RH], [LH], pseudo_impulse)
        models += self._footstep_models(com_ref, [lf], step_length,
                                        step_height, dt, step_knots,
                                        [RF, LH, RH], [LF], pseudo_impulse)
        return self._problem(x0, models)

    def trotting_problem(self, x0, step_length, step_height, dt,
                         step_knots, support_knots) -> ShootingProblem:
        """Diagonal pairs (quadruped.py:162-208)."""
        x0 = np.asarray(x0)
        com_ref, (lf, rf, lh, rh) = self._com_ref(x0[:self.model.nq])
        LF, RF, LH, RH = 0, 1, 2, 3
        first = 0.5 if self.first_step else 1.0
        self.first_step = False
        allfeet = range(self.nfeet)
        models = [self._make_node(dt, allfeet) for _ in range(support_knots)]
        models += self._footstep_models(com_ref, [rf, lh],
                                        first * step_length, step_height, dt,
                                        step_knots, [LF, RH], [RF, LH])
        models += [self._make_node(dt, allfeet) for _ in range(support_knots)]
        models += self._footstep_models(com_ref, [lf, rh], step_length,
                                        step_height, dt, step_knots,
                                        [RF, LH], [LF, RH])
        return self._problem(x0, models)

    def pacing_problem(self, x0, step_length, step_height, dt,
                       step_knots, support_knots) -> ShootingProblem:
        """Lateral pairs (quadruped.py:210-259)."""
        x0 = np.asarray(x0)
        com_ref, (lf, rf, lh, rh) = self._com_ref(x0[:self.model.nq])
        LF, RF, LH, RH = 0, 1, 2, 3
        first = 0.5 if self.first_step else 1.0
        self.first_step = False
        allfeet = range(self.nfeet)
        models = [self._make_node(dt, allfeet) for _ in range(support_knots)]
        models += self._footstep_models(com_ref, [rf, rh],
                                        first * step_length, step_height, dt,
                                        step_knots, [LF, LH], [RF, RH])
        models += [self._make_node(dt, allfeet) for _ in range(support_knots)]
        models += self._footstep_models(com_ref, [lf, lh], step_length,
                                        step_height, dt, step_knots,
                                        [RF, RH], [LF, LH])
        return self._problem(x0, models)

    def bounding_problem(self, x0, step_length, step_height, dt,
                         step_knots, support_knots) -> ShootingProblem:
        """Front/hind pairs (quadruped.py:261-302)."""
        x0 = np.asarray(x0)
        com_ref, (lf, rf, lh, rh) = self._com_ref(x0[:self.model.nq])
        LF, RF, LH, RH = 0, 1, 2, 3
        allfeet = range(self.nfeet)
        models = [self._make_node(dt, allfeet) for _ in range(support_knots)]
        models += self._footstep_models(com_ref, [lf, rf], step_length,
                                        step_height, dt, step_knots,
                                        [LH, RH], [LF, RF])
        models += [self._make_node(dt, allfeet) for _ in range(support_knots)]
        models += self._footstep_models(com_ref, [lh, rh], step_length,
                                        step_height, dt, step_knots,
                                        [LF, RF], [LH, RH])
        return self._problem(x0, models)


class BipedGaitFactory(_LocomotionFactory):
    """SimpleBipedGaitProblem (biped.py:6-278): feet order (right, left),
    6D sole contacts with zero Baumgarte gains, placement foot tasks."""

    contact_dim = 6
    contact_gains = (0.0, 0.0)
    w_foot_track_switch = 1e8
    w_state_bounds = 0.0

    def _state_weights_switch(self):
        nv = self.model.nv
        # biped.py:264 — same structure as running weights
        return np.array([0.] * 3 + [500.] * 3 + [0.01] * (nv - 6)
                        + [10.] * nv)

    def _state_weights_running(self):
        nv = self.model.nv
        # biped.py:204
        return np.array([0.] * 3 + [500.] * 3 + [0.01] * (nv - 6)
                        + [10.] * nv)

    def walking_problem(self, x0, step_length, step_height, dt,
                        step_knots, support_knots,
                        pseudo_impulse=True) -> ShootingProblem:
        """biped.py:25-65: [double support + right step + double support +
        left step]."""
        x0 = np.asarray(x0)
        com_ref, (rf, lf) = self._com_ref(x0[:self.model.nq])
        R, L = 0, 1
        first = 0.5 if self.first_step else 1.0
        self.first_step = False
        both = (R, L)
        models = [self._make_node(dt, both) for _ in range(support_knots)]
        models += self._footstep_models(com_ref, [rf], first * step_length,
                                        step_height, dt, step_knots, [L], [R],
                                        pseudo_impulse)
        models += [self._make_node(dt, both) for _ in range(support_knots)]
        models += self._footstep_models(com_ref, [lf], step_length,
                                        step_height, dt, step_knots, [R], [L],
                                        pseudo_impulse)
        return self._problem(x0, models)

    # ------------------------------------------------------------------
    # RH5 thesis problem variants (RH5/utils/walkProblem.py)
    # ------------------------------------------------------------------
    def squat_problem(self, x0, height_change, num_knots, dt,
                      recovery_knots: int = 20) -> ShootingProblem:
        """RH5 squat (walkProblem.py:193-221 createSquatProblem): the CoM
        descends ``height_change`` over the first half of the horizon,
        returns over the second half, then holds ``recovery_knots`` knots
        at the reference so the final CoM equals it."""
        x0 = np.asarray(x0)
        com_ref, _ = self._com_ref(x0[:self.model.nq])
        both = (0, 1)
        models = []
        ph = num_knots / 2
        for k in range(num_knots):
            if k < ph:
                dz = -height_change * (k + 1) / ph
            elif k == ph:
                dz = -height_change
            else:
                dz = -height_change * (1 - (k - ph) / ph)
            models.append(self._make_node(
                dt, both, com_task=com_ref + np.array([0.0, 0.0, dz])))
        models += [self._make_node(dt, both, com_task=com_ref)
                   for _ in range(recovery_knots)]
        return self._problem(x0, models)

    def balancing_problem(self, x0, support_knots, shift_knots,
                          balance_knots, dt,
                          lift=(0.0, -0.05, 0.05),
                          pseudo_impulse: bool = True) -> ShootingProblem:
        """RH5 single-leg balancing (walkProblem.py:223-281
        createBalancingProblem): shift the CoM over the left foot, raise
        the right foot along ``lift`` and bring it back, replant (impulse
        or pseudo-impulse), shift the CoM back, then stabilize on the
        default pose."""
        R, L = 0, 1
        x0 = np.asarray(x0)
        com_ref, (rf, lf) = self._com_ref(x0[:self.model.nq])
        both = (R, L)
        models = [self._make_node(dt, both) for _ in range(support_knots)]
        com_y = lf[1] - com_ref[1]
        for k in range(shift_knots):
            com_task = com_ref + np.array(
                [0.0, com_y * (k + 1) / shift_knots, 0.0])
            models.append(self._make_node(dt, both, com_task=com_task))
        com_over_lf = np.array([com_ref[0], lf[1], com_ref[2]])
        lift = np.asarray(lift, np.float64)
        ph = balance_knots / 2
        for k in range(balance_knots):
            if k < ph:
                ft = rf + lift * ((k + 1) / ph)
            elif k == ph:
                ft = rf + lift
            else:
                ft = rf + lift * (1 - (k - ph) / ph)
            models.append(self._make_node(dt, (L,), com_task=com_over_lf,
                                          foot_tasks={R: ft}))
        if pseudo_impulse:
            models.append(self._make_node(0.0, both, foot_tasks={R: rf},
                                          switch=True))
        else:
            models.append(self._make_impulse_node(both, {R: rf}))
        for k in range(shift_knots):
            com_task = com_ref + np.array(
                [0.0, com_y * (1 - k / shift_knots), 0.0])
            models.append(self._make_node(dt, both, com_task=com_task))
        models += [self._make_node(dt, both, com_task=com_ref)
                   for _ in range(support_knots)]
        return self._problem(x0, models)
