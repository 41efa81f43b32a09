"""Articulated rigid-body algorithms, world-frame Jacobian formulation.

TPU-native replacement for Drake's C++ multibody dynamics (SURVEY.md D2).
Design notes:

- Loops run over *bodies* (static topology, <= ~20 bodies) and are
  unrolled at trace time into straight-line VPU code; per-v-dof work is
  vectorized.  No 6x6 spatial-transform algebra — everything is
  3-vectors, 3x3 rotations, and cross products, which XLA fuses well.
- The mass matrix is assembled as M = sum_b J_b^T I_b J_b from body
  Jacobians (kinetic-energy form — equivalent to CRBA at these sizes and
  reuses the Jacobians needed for contact).
- The velocity-product + gravity bias comes from world-frame
  Newton-Euler with qddot = 0 (the classic RNEA trick), again via the
  Jacobians.
- Everything is a pure function of (model, q, v) and differentiates with
  jax.jacfwd — this is what replaces Drake's AutoDiffXd dynamics
  (reference ilqr.py:233-272).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from drake_ddp_tpu.multibody.model import (
    FIXED,
    FREE,
    PRISMATIC,
    REVOLUTE,
    MultibodyModel,
    _NV,
    ancestor_dof_mask,
)
from drake_ddp_tpu.utils.spatial import axis_angle_rot, hat, quat_to_rot


class Kinematics(NamedTuple):
    """World-frame kinematics of every body."""

    R: jax.Array       # (nb, 3, 3) body orientation
    p: jax.Array       # (nb, 3)    body-frame origin position
    # per-v-dof data for Jacobian assembly:
    dof_axis_w: jax.Array    # (nv, 3) world axis (ang dofs & prismatic) / basis
    dof_origin_w: jax.Array  # (nv, 3) world point the dof rotates about
    dof_is_ang: jax.Array    # (nv,)   1.0 for angular dofs (revolute, base w)
    dof_is_lin: jax.Array    # (nv,)   1.0 for linear dofs (prismatic, base v)


def forward_kinematics(model: MultibodyModel, q: jax.Array) -> Kinematics:
    """Compute world poses of all bodies and per-dof Jacobian data."""
    nb, nv = model.nb, model.nv
    dtype = q.dtype
    Rs, ps = [], []
    dof_axis = [None] * nv
    dof_origin = [None] * nv
    dof_is_ang = np.zeros(nv)
    dof_is_lin = np.zeros(nv)
    eye = jnp.eye(3, dtype=dtype)

    for b in range(nb):
        par = model.parent[b]
        Rp = eye if par < 0 else Rs[par]
        pp = jnp.zeros(3, dtype) if par < 0 else ps[par]
        jt = model.joint_type[b]
        qs, vs = model.q_start[b], model.v_start[b]
        # frame of the joint (fixed in parent)
        R_J = Rp @ model.X_PJ_rot[b]
        p_J = pp + Rp @ model.X_PJ_pos[b]
        if jt == FREE:
            quat = q[qs:qs + 4]
            R_b = R_J @ quat_to_rot(quat)
            p_b = p_J + Rp @ q[qs + 4:qs + 7]
            for k in range(3):
                dof_axis[vs + k] = eye[k]          # world-frame w basis
                dof_origin[vs + k] = p_b
                dof_is_ang[vs + k] = 1.0
                dof_axis[vs + 3 + k] = eye[k]      # world-frame v basis
                dof_origin[vs + 3 + k] = p_b
                dof_is_lin[vs + 3 + k] = 1.0
        elif jt == REVOLUTE:
            R_b = R_J @ axis_angle_rot(model.axis[b], q[qs])
            p_b = p_J
            dof_axis[vs] = R_b @ model.axis[b]
            dof_origin[vs] = p_b
            dof_is_ang[vs] = 1.0
        elif jt == PRISMATIC:
            R_b = R_J
            p_b = p_J + R_J @ (model.axis[b] * q[qs])
            dof_axis[vs] = R_b @ model.axis[b]
            dof_origin[vs] = p_b
            dof_is_lin[vs] = 1.0
        else:  # FIXED
            R_b = R_J
            p_b = p_J
        Rs.append(R_b)
        ps.append(p_b)

    return Kinematics(
        R=jnp.stack(Rs),
        p=jnp.stack(ps),
        dof_axis_w=jnp.stack(dof_axis) if nv else jnp.zeros((0, 3), dtype),
        dof_origin_w=jnp.stack(dof_origin) if nv else jnp.zeros((0, 3), dtype),
        dof_is_ang=jnp.asarray(dof_is_ang, dtype),
        dof_is_lin=jnp.asarray(dof_is_lin, dtype),
    )


def point_jacobian(
    model: MultibodyModel,
    kin: Kinematics,
    body: jax.Array | int,
    p_w: jax.Array,
    anc_mask: jax.Array,
) -> jax.Array:
    """Translational Jacobian (3, nv) of a world point attached to a body.

    ``anc_mask`` is the (nv,) row of :func:`ancestor_dof_mask` for the
    body (dynamic indexing allowed, so contact points can choose bodies
    at trace time)."""
    lever = p_w[None, :] - kin.dof_origin_w          # (nv, 3)
    lin = (
        kin.dof_is_ang[:, None] * jnp.cross(kin.dof_axis_w, lever)
        + kin.dof_is_lin[:, None] * kin.dof_axis_w
    )
    return (lin * anc_mask[:, None]).T               # (3, nv)


def _body_jacobians(model, kin, anc_mask, points):
    """J_ang (nb, 3, nv) and J_lin at given per-body points (nb, 3, nv)."""
    ang = kin.dof_is_ang[:, None] * kin.dof_axis_w       # (nv, 3)
    lever = points[:, None, :] - kin.dof_origin_w[None]  # (nb, nv, 3)
    lin = (
        kin.dof_is_ang[None, :, None] * jnp.cross(kin.dof_axis_w[None], lever)
        + kin.dof_is_lin[None, :, None] * kin.dof_axis_w[None]
    )
    J_ang = (ang[None] * anc_mask[:, :, None]).swapaxes(-1, -2)  # (nb,3,nv)
    J_lin = (lin * anc_mask[:, :, None]).swapaxes(-1, -2)        # (nb,3,nv)
    return J_ang, J_lin


def mass_matrix(model: MultibodyModel, kin: Kinematics) -> jax.Array:
    """M(q) (nv, nv): sum of J^T I J over bodies (kinetic-energy form)."""
    anc = jnp.asarray(ancestor_dof_mask(model), kin.p.dtype)
    com_w = kin.p + jnp.einsum("bij,bj->bi", kin.R, model.com)
    J_ang, J_com = _body_jacobians(model, kin, anc, com_w)
    I_w = jnp.einsum("bij,bjk,blk->bil", kin.R, model.inertia, kin.R)
    M = jnp.einsum("bim,bij,bjn->mn", J_ang, I_w, J_ang) + jnp.einsum(
        "bim,b,bin->mn", J_com, model.mass, J_com
    )
    return M + jnp.diag(model.armature)


class Dynamics(NamedTuple):
    kin: Kinematics
    M: jax.Array        # (nv, nv)
    bias: jax.Array     # (nv,) C(q,v)v - tau_g(q) + damping v
    w: jax.Array        # (nb, 3) body angular velocities (world)
    v_origin: jax.Array # (nb, 3) body-origin velocities (world)


def dynamics_terms(model: MultibodyModel, q: jax.Array, v: jax.Array) -> Dynamics:
    """Everything the integrator needs: M, bias, body velocities."""
    kin = forward_kinematics(model, q)
    nb = model.nb
    dtype = q.dtype
    anc_np = ancestor_dof_mask(model)
    anc = jnp.asarray(anc_np, dtype)

    com_w = kin.p + jnp.einsum("bij,bj->bi", kin.R, model.com)
    J_ang, J_com = _body_jacobians(model, kin, anc, com_w)

    # Body velocities straight from Jacobians.
    w = J_ang @ v                      # (nb, 3)
    v_com = J_com @ v                  # (nb, 3)
    J_ang_o, J_lin_o = _body_jacobians(model, kin, anc, kin.p)
    v_origin = J_lin_o @ v

    # Mass matrix (incl. reflected rotor inertia on the diagonal).
    I_w = jnp.einsum("bij,bjk,blk->bil", kin.R, model.inertia, kin.R)
    M = jnp.einsum("bim,bij,bjn->mn", J_ang, I_w, J_ang) + jnp.einsum(
        "bim,b,bin->mn", J_com, model.mass, J_com
    ) + jnp.diag(model.armature)

    # Velocity-product accelerations with qddot = 0 (world frame).
    # Angular: alpha_b = sum_{ang dofs k in anc(b)} v_k * (w_parent(k) x a_k)
    # where w_parent(k) is the angular velocity of the dof's parent body.
    vdof_parent_w = []
    for b in range(nb):
        par = model.parent[b]
        wp = jnp.zeros(3, dtype) if par < 0 else w[par]
        for _ in range(_NV[model.joint_type[b]]):
            vdof_parent_w.append(wp)
    wp_dof = jnp.stack(vdof_parent_w) if model.nv else jnp.zeros((0, 3), dtype)
    alpha_term = (
        v[:, None]
        * kin.dof_is_ang[:, None]
        * jnp.cross(wp_dof, kin.dof_axis_w)
    )  # (nv, 3)
    alpha = jnp.einsum("bk,ki->bi", anc, alpha_term)  # (nb, 3)

    # Origin accelerations by forward recursion (qddot = 0).
    a_o = [None] * nb
    for b in range(nb):
        par = model.parent[b]
        jt = model.joint_type[b]
        if par < 0:
            if jt == FREE:
                a_o[b] = jnp.zeros(3, dtype)
            else:
                a_o[b] = jnp.zeros(3, dtype)
        else:
            r = kin.p[b] - kin.p[par]
            a = a_o[par] + jnp.cross(alpha[par], r) + jnp.cross(
                w[par], jnp.cross(w[par], r)
            )
            if jt == PRISMATIC:
                vs = model.v_start[b]
                a = a + 2.0 * jnp.cross(w[par], kin.dof_axis_w[vs] * v[vs])
            a_o[b] = a
    a_o = jnp.stack(a_o)

    c_w = com_w - kin.p
    a_com = (
        a_o
        + jnp.cross(alpha, c_w)
        + jnp.cross(w, jnp.cross(w, c_w))
    )

    # Newton-Euler wrenches (world, at com) for the vp accelerations and
    # gravity; project through the Jacobians.
    F = model.mass[:, None] * (a_com - model.gravity[None, :])
    T = jnp.einsum("bij,bj->bi", I_w, alpha) + jnp.cross(
        w, jnp.einsum("bij,bj->bi", I_w, w)
    )
    bias = jnp.einsum("bim,bi->m", J_ang, T) + jnp.einsum("bim,bi->m", J_com, F)
    bias = bias + model.damping * v

    return Dynamics(kin=kin, M=M, bias=bias, w=w, v_origin=v_origin)


def gravity_compensation(model: MultibodyModel, q: jax.Array) -> jax.Array:
    """Actuator torques that hold the configuration statically: the
    reference's gravity-compensation initial guess
    (kinova_gen3.py:268-275, u = MakeActuationMatrix().T @
    (-CalcGravityGeneralizedForces)).  Equals bias(q, 0) at the actuated
    v-dofs."""
    bias = dynamics_terms(model, q, jnp.zeros(model.nv, q.dtype)).bias
    return bias[jnp.asarray(model.actuated_vdof)]


def integrate_positions(model: MultibodyModel, q: jax.Array, v_next: jax.Array, dt) -> jax.Array:
    """Semi-implicit position update q' = q (+) dt * N(q) v'  (Drake's
    discrete-update convention: positions advance with the new
    velocities)."""
    from drake_ddp_tpu.utils.spatial import quat_integrate

    parts = []
    for b in range(model.nb):
        jt = model.joint_type[b]
        qs, vs = model.q_start[b], model.v_start[b]
        if jt == FREE:
            quat = q[qs:qs + 4]
            w_w = v_next[vs:vs + 3]
            pos = q[qs + 4:qs + 7]
            parts.append(quat_integrate(quat, w_w, dt))
            parts.append(pos + dt * v_next[vs + 3:vs + 6])
        elif jt in (REVOLUTE, PRISMATIC):
            parts.append(q[qs:qs + 1] + dt * v_next[vs:vs + 1])
        # FIXED contributes nothing
    return jnp.concatenate(parts) if parts else q
