"""The discrete multibody step: dynamics + smooth contact -> DiscreteSystem.

TPU-native equivalent of Drake's discrete MultibodyPlant update
(``CalcForcedDiscreteVariableUpdate`` with TAMSI/SAP contact, reference
ilqr.py:228 and SURVEY.md D2):

    v' solves  M(q)(v' - v) = dt * (B u - bias(q, v) + Jc^T f_c(phi', vc'))
    q' = q (+) dt * N(q) v'

Contact forces are evaluated *implicitly* in the new velocity (predicted
penetration phi' = phi - dt*vn(v'), contact-point velocity vc' = Jc v'),
via a fixed number of Newton iterations with an autodiff Jacobian —
a smooth, unrolled, differentiable analog of Drake's TAMSI solve that
keeps stiff hydroelastic-style contact stable at dt ~ 1e-2.  The whole
step is a pure function: jit/vmap/jacfwd-compatible.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from drake_ddp_tpu.contact.forces import (
    ContactForceParams,
    contact_forces,
    contact_forces_implicit,
    stiction_schedule,
)
from drake_ddp_tpu.contact.geometry import ContactModel, narrowphase
from drake_ddp_tpu.dynamics.base import DiscreteSystem
from drake_ddp_tpu.multibody.algorithms import (
    dynamics_terms,
    integrate_positions,
)
from drake_ddp_tpu.multibody.model import MultibodyModel, ancestor_dof_mask
from drake_ddp_tpu.utils.linalg import solve_small, solve_spd


def _contact_jacobians(model, kin, cm: ContactModel, body_a, body_b, points):
    """Relative contact-point Jacobians Jc: (NC, 3, nv), rows of body A
    minus body B (world = zero)."""
    anc_np = ancestor_dof_mask(model)
    nv = model.nv
    dtype = points.dtype

    def one(body, p_w):
        if body < 0:
            return jnp.zeros((3, nv), dtype)
        anc = jnp.asarray(anc_np[body], dtype)
        lever = p_w[None, :] - kin.dof_origin_w
        lin = (
            kin.dof_is_ang[:, None] * jnp.cross(kin.dof_axis_w, lever)
            + kin.dof_is_lin[:, None] * kin.dof_axis_w
        )
        return (lin * anc[:, None]).T

    rows = []
    for i, (ba, bb) in enumerate(zip(body_a, body_b)):
        rows.append(one(ba, points[i]) - one(bb, points[i]))
    return jnp.stack(rows)


def multibody_step(
    model: MultibodyModel,
    contact: Optional[ContactModel],
    dt: float,
    x: jax.Array,
    u: jax.Array,
    contact_iters: int = 2,
    force_params: ContactForceParams = ContactForceParams(),
) -> jax.Array:
    """One discrete step x' = f(x, u).  x = [q; v]."""
    nq, nv = model.nq, model.nv
    q, v = x[:nq], x[nq:]
    dyn = dynamics_terms(model, q, v)
    B = jnp.asarray(model.actuation_matrix(), x.dtype)
    tau = B @ u - dyn.bias

    if contact is None or contact.num_contacts == 0:
        v_next = v + dt * solve_spd(dyn.M, tau)
    else:
        kin = dyn.kin
        sph_body = jnp.asarray(contact.sph_body, jnp.int32)
        centers = kin.p[sph_body] + jnp.einsum(
            "cij,cj->ci", kin.R[sph_body], contact.sph_offset
        )
        phi, normal, point, body_a, body_b, K, K1, d, mu = narrowphase(
            contact, centers, body_R=kin.R, body_p=kin.p)
        Jc = _contact_jacobians(model, kin, contact, body_a, body_b, point)

        def residual_p(vp, params):
            v_rel = jnp.einsum("cin,n->ci", Jc, vp)
            vn = jnp.einsum("ci,ci->c", v_rel, normal)
            phi_pred = phi - dt * vn
            f = contact_forces(phi_pred, normal, v_rel, K, d, mu,
                               params, K1=K1)
            tau_c = jnp.einsum("cin,ci->n", Jc, f)
            return dyn.M @ (vp - v) - dt * (tau + tau_c)

        def residual(vp):
            return residual_p(vp, force_params)

        if contact_iters == 0:
            # explicit contact evaluation at (q, v)
            v_rel = jnp.einsum("cin,n->ci", Jc, v)
            f = contact_forces(phi, normal, v_rel, K, d, mu, force_params,
                               K1=K1)
            tau_c = jnp.einsum("cin,ci->n", Jc, f)
            v_next = v + dt * solve_spd(dyn.M, tau + tau_c)
        else:
            # Newton from a contact-free predictor; derivatives via the
            # implicit function theorem (lax.custom_root) rather than by
            # differentiating through the iterations — in f32 the
            # unrolled-tangent path loses ~1% of the Jacobian through the
            # stiff contact solve, which is enough to wreck iLQR descent
            # directions (and IFT halves the trace: no second-order
            # nesting under the solver's jacfwd).
            def newton_jac(vp, params=force_params):
                # Exact dresidual/dvp = M - dt * Jc' D Jc with the
                # closed-form force Jacobian D — jacfwd of the residual
                # re-traces the force path nv-wide per Newton iteration,
                # which dominates the rollout scan's per-step latency.
                v_rel = jnp.einsum("cin,n->ci", Jc, vp)
                _, D = contact_forces_implicit(
                    phi, normal, v_rel, K, d, mu, dt, params, K1=K1)
                # Two-stage contraction: E = D Jc per contact (tiny), then
                # one well-shaped (nv, 3NC) @ (3NC, nv) matmul.  The fused
                # triple einsum lowers to a ~3x-more-FLOPs dot with heavy
                # layout copies on TPU (profiled: dominant rollout cost).
                E = jnp.einsum("cij,cjm->cim", D, Jc)
                nc = E.shape[0]
                Jf = Jc.reshape(3 * nc, -1)
                Ef = E.reshape(3 * nc, -1)
                return dyn.M - dt * Jf.T @ Ef

            def newton(res_fn, v0):
                # Damped Newton with stiction-regularization CONTINUATION
                # (see forces.stiction_schedule): early iterations solve
                # a softened friction model (stiction_vel inflated 4x per
                # remaining iteration), annealing to the true width —
                # the softened curve has no stiction knife-edge, so the
                # iterate is guided into the basin without the tangential
                # ping-pong that full Newton on the stiff curve produces
                # (a light body held by several stiff contacts, e.g. a
                # tilted box settling).  The schedule is STATIC (a python
                # float per iteration): the map stays a fixed composition
                # of smooth functions, so the scalar / lane-major /
                # Pallas twins track each other at ulp level (any
                # state-dependent step gate steep enough to resolve the
                # stiction-vel scale was measured to amplify backend ulp
                # differences into percent-level rollout divergence).
                # A full step can still overshoot through the stiff
                # normal-force profile during fast impacts (fn ~ K phi^2
                # with K ~ 1e5) and inject energy; fall back to a half
                # step whenever the full step's residual grew.
                vp = v0
                for it, vs_eff in enumerate(
                        stiction_schedule(force_params.stiction_vel,
                                          contact_iters)):
                    p_it = force_params._replace(stiction_vel=vs_eff)
                    r = residual_p(vp, p_it)
                    dv = solve_small(newton_jac(vp, p_it), r)
                    vp1 = vp - dv
                    r1 = residual_p(vp1, p_it)
                    # damp only on CLEAR overshoot (4x residual-norm^2,
                    # i.e. the norm doubled): impacts blow the residual
                    # up by orders of magnitude, while a knife-edge
                    # threshold flips on f32 reassociation noise between
                    # the scalar and lane-major step implementations.
                    grew = jnp.sum(r1 * r1) > 4.0 * jnp.sum(r * r)
                    vp = jnp.where(grew, vp - 0.5 * dv, vp1)
                return vp

            def tangent_solve(g, y):
                J = jax.jacfwd(g)(jnp.zeros_like(y))
                return solve_small(J, y)

            v_pred = v + dt * solve_spd(dyn.M, tau)
            v_next = jax.lax.custom_root(
                residual, v_pred, newton, tangent_solve)

    q_next = integrate_positions(model, q, v_next, dt)
    return jnp.concatenate([q_next, v_next])


def make_multibody_system(
    model: MultibodyModel,
    contact: Optional[ContactModel],
    dt: float,
    contact_iters: int = 2,
    force_params: ContactForceParams = ContactForceParams(),
) -> DiscreteSystem:
    """Bundle a model + contact scene into the solver's DiscreteSystem
    (the role of building a Drake diagram with an exported actuation
    port, e.g. cart_pole_with_wall.py:135-139)."""

    def step(params, x, u):
        mdl, cm = params
        return multibody_step(
            mdl, cm, dt, x, u,
            contact_iters=contact_iters, force_params=force_params,
        )

    from drake_ddp_tpu.multibody.lanestep import make_lane_step

    lane = make_lane_step(model, contact, dt,
                          contact_iters=contact_iters,
                          force_params=force_params)
    # record the build options so ops/megastep.py can rebuild the same
    # step body inside a Pallas kernel
    lane.contact_iters = contact_iters
    lane.force_params = force_params

    # structured-IFT derivative kernel (multibody/lanejac.py) — only the
    # implicit contact path has the IFT Jacobian; the explicit
    # contact_iters == 0 step keeps the jacfwd fallback
    lane_jac = None
    lane_jac_root = None
    has_contact = contact is not None and contact.num_contacts > 0
    if not has_contact or contact_iters >= 1:
        from drake_ddp_tpu.multibody.lanejac import make_lane_jac

        lane_jac = make_lane_jac(model, contact, dt,
                                 contact_iters=contact_iters,
                                 force_params=force_params)
        # root-seeded twin: skips the jac's internal Newton by reusing
        # the rollout's converged next state (see lanejac root_seed)
        lane_jac_root = make_lane_jac(model, contact, dt,
                                      contact_iters=contact_iters,
                                      force_params=force_params,
                                      root_seed=True)
    return DiscreteSystem(
        step_fn=step,
        params=(model, contact),
        n=model.nq + model.nv,
        m=model.nu,
        dt=dt,
        lane_step_fn=lane,
        lane_jac_fn=lane_jac,
        lane_jac_root_fn=lane_jac_root,
    )
