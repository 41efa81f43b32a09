"""Lane-major (batch-last) multibody step for TPU throughput.

The per-scenario step in :mod:`multibody.plant` is written for one
scenario and batched with ``jax.vmap``, which places the batch dimension
*first*: intermediate arrays look like ``(B, nb, 3)`` / ``(B, nv, 3)``
with tiny trailing dimensions.  TPU vector registers tile the last two
dims as (8 sublanes, 128 lanes), so a trailing dim of 3 or 18 wastes
most of every register — measured on the flagship benchmark the rollout
is *batch-throughput-bound* at a few GFLOP/s (~0.01% of peak), with the
device trace dominated by layout-shuffle copies and DMA slice traffic.

This module re-derives the same step with the batch as the TRAILING
dimension: every scalar in the scalar program becomes a ``(B,)`` lane
vector, vectors are ``(3, B)``, matrices ``(n, n, B)``.  All contractions
are written as explicit sums of elementwise products over tiny *static*
dims (no ``einsum``/``dot_general``, no gathers — static unrolls only) so
the whole step body is also valid inside a Pallas TPU kernel
(ops/megastep.py wraps it in one VMEM-resident kernel).  The math is
identical to plant.multibody_step (same hydroelastic-style forces,
same Newton-with-analytic-Jacobian implicit solve) and is pinned to it
by tests/test_lanestep.py.

Forward-rollout use only: the linesearch rollout is never differentiated
(reference ilqr.py:274-337 computes no gradients there), so the Newton
iteration here is plain unrolled iteration — solver derivatives keep
using the per-scenario step's lax.custom_root IFT path.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from drake_ddp_tpu.contact.forces import (ContactForceParams,
                                           stiction_schedule)
from drake_ddp_tpu.contact.geometry import ContactModel
from drake_ddp_tpu.multibody.model import (
    FIXED,
    FREE,
    PRISMATIC,
    REVOLUTE,
    MultibodyModel,
    _NV,
    ancestor_dof_mask,
)


# ---------------------------------------------------------------------------
# lane-major helpers.  Convention: trailing dim is the batch B.  Every
# contraction is an unrolled sum of elementwise products (VPU code).
# ---------------------------------------------------------------------------


def _cross_T(a, b):
    """Cross product of (3, B) lane vectors."""
    return jnp.stack([
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ])


def _cross_mid_T(a, b, axis_len=3):
    """Cross product along axis 1 of (..., 3, B)-shaped stacks where the
    cross axis is the SECOND-to-last-but-one; a and b are (K, 3, B)."""
    return jnp.stack([
        a[:, 1] * b[:, 2] - a[:, 2] * b[:, 1],
        a[:, 2] * b[:, 0] - a[:, 0] * b[:, 2],
        a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0],
    ], axis=1)


def quat_to_rot_T(q):
    """(4, B) wxyz quaternion -> (3, 3, B) rotation."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack([
        jnp.stack([ww + xx - yy - zz, 2 * (xy - wz), 2 * (xz + wy)]),
        jnp.stack([2 * (xy + wz), ww - xx + yy - zz, 2 * (yz - wx)]),
        jnp.stack([2 * (xz - wy), 2 * (yz + wx), ww - xx - yy + zz]),
    ])


def quat_mul_T(a, b):
    """(4, B) x (4, B) quaternion product."""
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ])


def _axis_angle_rot_T(axis, angle):
    """Constant (3,) axis, (B,) angle -> (3, 3, B) Rodrigues rotation."""
    ax = np.asarray(axis, np.float64)
    K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]])
    K2 = K @ K
    s, c = jnp.sin(angle), jnp.cos(angle)
    dt = angle.dtype
    eye3 = np.eye(3, dtype=dt)[:, :, None]
    Kc = np.asarray(K, dt)[:, :, None]
    K2c = np.asarray(K2, dt)[:, :, None]
    return eye3 + s[None, None, :] * Kc + (1.0 - c)[None, None, :] * K2c


def _mm_T(A, B):
    """(3,3,B) @ (3,3,B)."""
    return sum(A[:, j][:, None] * B[j][None] for j in range(3))


def _mc_T(A, C):
    """(3,3,B) @ constant (3,3)."""
    C = np.asarray(C)
    return sum(A[:, j][:, None] * np.asarray(C[j], A.dtype)[None, :, None]
               for j in range(3))


def _mv_T(A, v):
    """(3,3,B) @ (3,B)."""
    return sum(A[:, j] * v[j][None] for j in range(3))


def _outer_sum(a, b, chunk=8):
    """sum_k outer(a[k], b[k]): a (K, n, B), b (K, m, B) -> (n, m, B).
    Chunked so the (chunk, n, m, B) intermediate stays VMEM-sized."""
    K = a.shape[0]
    out = None
    for k0 in range(0, K, chunk):
        aa, bb = a[k0:k0 + chunk], b[k0:k0 + chunk]
        t = jnp.sum(aa[:, :, None] * bb[:, None], axis=0)
        out = t if out is None else out + t
    return out


def solve_spd_T(A, b):
    """Cholesky solve, lane-major: A (n, n, B) SPD, b (n, B).

    The factor is kept as a list of column lane-vectors (no in-place
    array updates — scatters don't lower inside Pallas kernels)."""
    n = A.shape[0]
    idx = np.arange(n)
    cols = []  # cols[j] (n, B): column j of L (zero above the diagonal)
    for j in range(n):
        if j:
            s = A[:, j] - sum(cols[k] * cols[k][j][None] for k in range(j))
        else:
            s = A[:, j]
        d = jnp.sqrt(s[j])
        cols.append(jnp.where((idx >= j)[:, None], s / d, jnp.zeros_like(s)))
    ys = []
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - cols[k][i] * ys[k]     # L[i, k]
        ys.append(s / cols[i][i])          # / L[i, i]
    xs = [None] * n
    for i in reversed(range(n)):
        s = ys[i]
        for k in range(i + 1, n):
            s = s - cols[i][k] * xs[k]     # L[k, i]
        xs[i] = s / cols[i][i]
    return jnp.stack(xs)


def solve_small_T(A, b):
    """Gauss-Jordan (no pivoting), lane-major: A (n, n, B), b (n, B).
    For diagonally dominant systems (the contact Newton matrix)."""
    n = A.shape[0]
    Ab = jnp.concatenate([A, b[:, None]], axis=1)      # (n, n+1, B)
    eye = np.eye(n)
    for k in range(n):
        pivot_row = Ab[k]                              # (n+1, B)
        pivot = Ab[k][k]                               # (B,)
        factor = Ab[:, k] / pivot                      # (n, B)
        factor = factor - factor * np.asarray(eye[k], A.dtype)[:, None]
        Ab = Ab - factor[:, None, :] * pivot_row[None]
    diag = jnp.stack([Ab[i][i] for i in range(n)])     # (n, B)
    return Ab[:, n] / diag


# ---------------------------------------------------------------------------
# kinematics / dynamics terms, lane-major (mirrors multibody/algorithms.py)
# ---------------------------------------------------------------------------


def _fk_T(model: MultibodyModel, q):
    """q (nq, B) -> per-body R (nb,3,3,B), p (nb,3,B) and per-dof data."""
    nb, nv = model.nb, model.nv
    B = q.shape[-1]
    dtype = q.dtype
    Rs, ps = [], []
    dof_axis = [None] * nv
    dof_origin = [None] * nv
    dof_is_ang = np.zeros(nv)
    dof_is_lin = np.zeros(nv)
    eye_T = np.broadcast_to(np.eye(3, dtype=dtype)[:, :, None], (3, 3, B))
    zero3 = np.zeros((3, B), dtype)
    X_rot = np.asarray(model.X_PJ_rot)
    X_pos = np.asarray(model.X_PJ_pos)
    axes = np.asarray(model.axis)

    for b in range(nb):
        par = model.parent[b]
        Rp = eye_T if par < 0 else Rs[par]
        pp = zero3 if par < 0 else ps[par]
        jt = model.joint_type[b]
        qs, vs = model.q_start[b], model.v_start[b]
        R_J = _mc_T(Rp, X_rot[b])
        p_J = pp + _mv_T(Rp, np.broadcast_to(
            np.asarray(X_pos[b], dtype)[:, None], (3, B)))
        if jt == FREE:
            R_b = _mm_T(R_J, quat_to_rot_T(q[qs:qs + 4]))
            p_b = p_J + _mv_T(Rp, q[qs + 4:qs + 7])
            eye3 = np.eye(3)
            for k in range(3):
                ek = np.broadcast_to(
                    np.asarray(eye3[k], dtype)[:, None], (3, B))
                dof_axis[vs + k] = ek
                dof_origin[vs + k] = p_b
                dof_is_ang[vs + k] = 1.0
                dof_axis[vs + 3 + k] = ek
                dof_origin[vs + 3 + k] = p_b
                dof_is_lin[vs + 3 + k] = 1.0
        elif jt == REVOLUTE:
            R_b = _mm_T(R_J, _axis_angle_rot_T(axes[b], q[qs]))
            p_b = p_J
            dof_axis[vs] = _mv_T(R_b, np.broadcast_to(
                np.asarray(axes[b], dtype)[:, None], (3, B)))
            dof_origin[vs] = p_b
            dof_is_ang[vs] = 1.0
        elif jt == PRISMATIC:
            R_b = R_J
            ax_w = _mv_T(R_J, np.broadcast_to(
                np.asarray(axes[b], dtype)[:, None], (3, B)))
            p_b = p_J + ax_w * q[qs][None, :]
            dof_axis[vs] = ax_w
            dof_origin[vs] = p_b
            dof_is_lin[vs] = 1.0
        else:  # FIXED
            R_b = R_J
            p_b = p_J
        Rs.append(R_b)
        ps.append(p_b)

    R = jnp.stack(Rs)                                   # (nb, 3, 3, B)
    p = jnp.stack(ps)                                   # (nb, 3, B)
    dof_axis_w = (jnp.stack(dof_axis) if nv
                  else jnp.zeros((0, 3, B), dtype))     # (nv, 3, B)
    dof_origin_w = (jnp.stack(dof_origin) if nv
                    else jnp.zeros((0, 3, B), dtype))
    return (R, p, dof_axis_w, dof_origin_w,
            np.asarray(dof_is_ang, dtype), np.asarray(dof_is_lin, dtype))


def _body_jacobians_T(kinT, anc, points):
    """J_ang, J_lin at per-body points: (nb, 3, nv, B)."""
    R, p, dof_axis_w, dof_origin_w, is_ang, is_lin = kinT
    ang = is_ang[:, None, None] * dof_axis_w            # (nv, 3, B)
    lever = points[:, None] - dof_origin_w[None]        # (nb, nv, 3, B)
    ax = dof_axis_w[None]                               # (1, nv, 3, B)
    crs = jnp.stack([
        ax[:, :, 1] * lever[:, :, 2] - ax[:, :, 2] * lever[:, :, 1],
        ax[:, :, 2] * lever[:, :, 0] - ax[:, :, 0] * lever[:, :, 2],
        ax[:, :, 0] * lever[:, :, 1] - ax[:, :, 1] * lever[:, :, 0],
    ], axis=2)                                          # (nb, nv, 3, B)
    lin = (is_ang[None, :, None, None] * crs
           + is_lin[None, :, None, None] * dof_axis_w[None])
    J_ang = (ang[None] * anc[:, :, None, None]).swapaxes(1, 2)  # (nb,3,nv,B)
    J_lin = (lin * anc[:, :, None, None]).swapaxes(1, 2)
    return J_ang, J_lin


def _kin_mass_T(model: MultibodyModel, q):
    """q-only dynamics terms: kinematics, world inertias, mass matrix.

    Split out of the full bias computation so the solver's derivative
    path (multibody/lanejac.py) can propagate v-tangents through
    ``_bias_T`` alone — forward kinematics and M depend only on q.
    """
    dtype = q.dtype
    kinT = _fk_T(model, q)
    R, p, dof_axis_w, dof_origin_w, is_ang, is_lin = kinT
    anc = np.asarray(ancestor_dof_mask(model), dtype)

    com = np.asarray(model.com)                         # (nb, 3)
    com_w = p + sum(R[:, :, j] * np.asarray(com[:, j], dtype)[:, None, None]
                    for j in range(3))
    J_ang, J_com = _body_jacobians_T(kinT, anc, com_w)

    inertia = np.asarray(model.inertia)                 # (nb, 3, 3)
    mass = np.asarray(model.mass)                       # (nb,)
    # I_w = R I R': two unrolled 3x3 stages
    RI = sum(R[:, :, j][:, :, None]
             * np.asarray(inertia[:, j], dtype)[:, None, :, None]
             for j in range(3))                         # (nb, 3, 3, B)
    I_w = sum(RI[:, :, k][:, :, None] * R[:, :, k][:, None]
              for k in range(3))

    # M = sum_b J_ang' I_w J_ang + m J_com' J_com + diag(armature)
    W = sum(I_w[:, :, j][:, :, None] * J_ang[:, j][:, None]
            for j in range(3))
    nb = model.nb
    nbv = nb * 3
    Ja_f = J_ang.reshape(nbv, model.nv, q.shape[-1])
    W_f = W.reshape(nbv, model.nv, q.shape[-1])
    Jc_f = J_com.reshape(nbv, model.nv, q.shape[-1])
    mass3 = np.asarray(np.repeat(mass, 3), dtype)[:, None, None]
    M = (_outer_sum(Ja_f, W_f)
         + _outer_sum(Jc_f, mass3 * Jc_f)
         + np.asarray(np.diag(np.asarray(model.armature)),
                      dtype)[:, :, None])
    return kinT, M, (J_ang, J_com, I_w, com_w), anc


def _bias_T(model: MultibodyModel, kinT, J_ang, J_com, I_w, com_w, v):
    """v-dependent bias forces given precomputed q-only terms."""
    nb = model.nb
    R, p, dof_axis_w, dof_origin_w, is_ang, is_lin = kinT
    dtype = v.dtype
    B = v.shape[-1]
    anc = np.asarray(ancestor_dof_mask(model), dtype)
    mass = np.asarray(model.mass)

    w = jnp.sum(J_ang * v[None, None], axis=2)          # (nb, 3, B)

    # velocity-product accelerations with qddot = 0 (world frame)
    wp_dof = []
    for b in range(nb):
        par = model.parent[b]
        wp = np.zeros((3, B), dtype) if par < 0 else w[par]
        for _ in range(_NV[model.joint_type[b]]):
            wp_dof.append(wp)
    wp_dof = (jnp.stack(wp_dof) if model.nv
              else np.zeros((0, 3, B), dtype))           # (nv, 3, B)
    crs = _cross_mid_T(wp_dof, dof_axis_w)               # (nv, 3, B)
    alpha_term = v[:, None, :] * is_ang[:, None, None] * crs
    alpha = jnp.sum(anc[:, :, None, None] * alpha_term[None], axis=1)

    a_o = [None] * nb
    for b in range(nb):
        par = model.parent[b]
        jt = model.joint_type[b]
        if par < 0:
            a_o[b] = np.zeros((3, B), dtype)
        else:
            r = p[b] - p[par]
            a = (a_o[par] + _cross_T(alpha[par], r)
                 + _cross_T(w[par], _cross_T(w[par], r)))
            if jt == PRISMATIC:
                vs = model.v_start[b]
                a = a + 2.0 * _cross_T(w[par], dof_axis_w[vs] * v[vs][None])
            a_o[b] = a
    a_o = jnp.stack(a_o)                                 # (nb, 3, B)

    c_w = com_w - p
    a_com = (a_o + _cross_mid_T(alpha, c_w)
             + _cross_mid_T(w, _cross_mid_T(w, c_w)))

    gravity = np.asarray(model.gravity)
    F = (np.asarray(mass, dtype)[:, None, None]
         * (a_com - np.asarray(gravity, dtype)[None, :, None]))
    Iw_w = sum(I_w[:, :, j] * w[:, j][:, None] for j in range(3))
    T = (sum(I_w[:, :, j] * alpha[:, j][:, None] for j in range(3))
         + _cross_mid_T(w, Iw_w))
    bias = (jnp.sum(J_ang * T[:, :, None], axis=(0, 1))
            + jnp.sum(J_com * F[:, :, None], axis=(0, 1)))
    bias = bias + np.asarray(model.damping, dtype)[:, None] * v
    return bias


def _dynamics_terms_T(model: MultibodyModel, q, v):
    """Lane-major mirror of algorithms.dynamics_terms."""
    kinT, M, (J_ang, J_com, I_w, com_w), anc = _kin_mass_T(model, q)
    bias = _bias_T(model, kinT, J_ang, J_com, I_w, com_w, v)
    return kinT, M, bias, anc


def _integrate_positions_T(model: MultibodyModel, q, v_next, dt):
    parts = []
    for b in range(model.nb):
        jt = model.joint_type[b]
        qs, vs = model.q_start[b], model.v_start[b]
        if jt == FREE:
            quat = q[qs:qs + 4]                          # (4, B)
            w_w = v_next[vs:vs + 3]
            wq = jnp.concatenate([jnp.zeros_like(w_w[:1]), w_w])
            qdot = 0.5 * quat_mul_T(wq, quat)
            q_new = quat + dt * qdot
            q_new = q_new / jnp.sqrt(jnp.sum(q_new * q_new, 0))[None]
            parts.append(q_new)
            parts.append(q[qs + 4:qs + 7] + dt * v_next[vs + 3:vs + 6])
        elif jt in (REVOLUTE, PRISMATIC):
            parts.append(q[qs:qs + 1] + dt * v_next[vs:vs + 1])
    return jnp.concatenate(parts) if parts else q


# ---------------------------------------------------------------------------
# contact, lane-major (mirrors contact/geometry.narrowphase + forces)
# ---------------------------------------------------------------------------


def _narrowphase_T(cm: ContactModel, centers, box_R_w=None, box_p_w=None):
    """centers (ns, 3, B) -> phi (NC,B), normal (NC,3,B), point (NC,3,B),
    static body index lists, K/d/mu (NC,) numpy constants, and K1 —
    None, or an (NC, B) traced array of linear foundation stiffnesses
    when the model has box-face (bh) pairs.

    ``box_R_w``/``box_p_w``: per-box world poses — numpy constants for
    world-fixed boxes, traced (3,3,B)/(3,B) lane arrays for body-attached
    boxes (computed in :func:`_contact_primal_T`)."""
    phis, normals, points = [], [], []
    body_a, body_b = [], []
    Ks, ds, mus = [], [], []
    dtype = centers.dtype

    def pick(arr, idx):
        # static gather: unrolled slices (Pallas-compatible)
        return jnp.stack([arr[i] for i in idx])

    if cm.pair_sh_s:
        s = list(cm.pair_sh_s)
        h = list(cm.pair_sh_h)
        c = pick(centers, s)                            # (c, 3, B)
        n = np.asarray(cm.hs_normal)[h]                 # (c, 3) const
        r = np.asarray(cm.sph_radius)[s]
        off = np.asarray(cm.hs_offset)[h]
        n_c = np.asarray(n, dtype)
        dist = jnp.sum(c * n_c[:, :, None], axis=1) - np.asarray(
            off, dtype)[:, None]
        phi = np.asarray(r, dtype)[:, None] - dist
        phis.append(phi)
        n_T = jnp.broadcast_to(jnp.asarray(n_c)[:, :, None], c.shape)
        normals.append(n_T)
        points.append(c - (dist - 0.5 * phi)[:, None] * n_T)
        body_a += [cm.sph_body[i] for i in cm.pair_sh_s]
        body_b += [-1] * len(cm.pair_sh_s)
        Ks.append(np.asarray(cm.sh_K)); ds.append(np.asarray(cm.sh_d))
        mus.append(np.asarray(cm.sh_mu))

    if cm.pair_sb_s:
        # per-pair unroll so each box's pose may be a numpy constant
        # (world box) or a traced lane array (body-attached box)
        for si, bi in zip(cm.pair_sb_s, cm.pair_sb_b):
            c = centers[si]                             # (3, B)
            Rw, pw = box_R_w[bi], box_p_w[bi]
            static_box = isinstance(Rw, np.ndarray)
            if static_box:
                Rw = np.asarray(Rw, dtype)
                d0 = c - np.asarray(pw, dtype)[:, None]
                local = jnp.stack([
                    sum(float(Rw[k, j]) * d0[k] for k in range(3))
                    for j in range(3)])                 # R^T d0, (3, B)
            else:
                d0 = c - pw
                local = jnp.stack([
                    sum(Rw[k, j] * d0[k] for k in range(3))
                    for j in range(3)])
            half = np.asarray(cm.box_half, dtype)[bi][:, None]  # (3, 1)
            clamped = jnp.clip(local, -half, half)
            delta = local - clamped
            dist_out = jnp.sqrt(jnp.sum(delta * delta, 0))      # (B,)
            inside_gap = half - jnp.abs(local)
            min_gap = jnp.min(inside_gap, axis=0)
            inside = dist_out < 1e-9
            # inner-face normal without argmin/gather: one-hot of the
            # min gap, ties broken toward the first axis (x, y, z)
            is_min = (inside_gap <= min_gap[None]).astype(dtype)
            w0 = is_min[0]
            w1 = is_min[1] * (1.0 - w0)
            w2 = is_min[2] * (1.0 - w0) * (1.0 - w1)
            one_hot = jnp.stack([w0, w1, w2])
            sign = jnp.sign(jnp.sum(one_hot * local, axis=0))
            n_local_in = one_hot * sign[None]
            n_local_out = delta / jnp.maximum(dist_out, 1e-9)[None]
            n_local = jnp.where(inside[None], n_local_in, n_local_out)
            sd = jnp.where(inside, -min_gap, dist_out)
            r = float(np.asarray(cm.sph_radius)[si])
            phi = r - sd
            if static_box:
                n_w = jnp.stack([
                    sum(float(Rw[a, j]) * n_local[j] for j in range(3))
                    for a in range(3)])
            else:
                n_w = jnp.stack([
                    sum(Rw[a, j] * n_local[j] for j in range(3))
                    for a in range(3)])
            p_w = c - (sd - 0.5 * phi)[None] * n_w
            phis.append(phi[None]); normals.append(n_w[None])
            points.append(p_w[None])
            body_a.append(cm.sph_body[si])
            body_b.append(cm.box_body[bi])
        Ks.append(np.asarray(cm.sb_K)); ds.append(np.asarray(cm.sb_d))
        mus.append(np.asarray(cm.sb_mu))

    if cm.pair_ss_a:
        a = list(cm.pair_ss_a)
        bb = list(cm.pair_ss_b)
        ca, cb = pick(centers, a), pick(centers, bb)
        ra = np.asarray(cm.sph_radius)[a]
        rb = np.asarray(cm.sph_radius)[bb]
        dvec = ca - cb
        dist = jnp.sqrt(jnp.sum(dvec * dvec, 1))
        n = dvec / jnp.maximum(dist, 1e-9)[:, None]
        phi = np.asarray(ra + rb, dtype)[:, None] - dist
        pnt = cb + (np.asarray(rb, dtype)[:, None] - 0.5 * phi)[:, None] * n
        phis.append(phi); normals.append(n); points.append(pnt)
        body_a += [cm.sph_body[i] for i in cm.pair_ss_a]
        body_b += [cm.sph_body[i] for i in cm.pair_ss_b]
        Ks.append(np.asarray(cm.ss_K)); ds.append(np.asarray(cm.ss_d))
        mus.append(np.asarray(cm.ss_mu))

    if cm.pair_sw_s:
        s = list(cm.pair_sw_s)
        w_idx = list(cm.pair_sw_w)
        ca = pick(centers, s)                           # (c, 3, B)
        cw = np.asarray(cm.ws_pos, dtype)[w_idx]        # (c, 3) const
        ra = np.asarray(cm.sph_radius)[s]
        rw = np.asarray(cm.ws_radius)[w_idx]
        dvec = ca - cw[:, :, None]
        dist = jnp.sqrt(jnp.sum(dvec * dvec, 1))
        n = dvec / jnp.maximum(dist, 1e-9)[:, None]
        phi = np.asarray(ra + rw, dtype)[:, None] - dist
        pnt = cw[:, :, None] + (np.asarray(rw, dtype)[:, None]
                                - 0.5 * phi)[:, None] * n
        phis.append(phi); normals.append(n); points.append(pnt)
        body_a += [cm.sph_body[i] for i in cm.pair_sw_s]
        body_b += [-1] * len(cm.pair_sw_s)
        Ks.append(np.asarray(cm.sw_K)); ds.append(np.asarray(cm.sw_d))
        mus.append(np.asarray(cm.sw_mu))

    n_quad = sum(p.shape[0] for p in phis)              # quadratic-law rows
    K1_rows = []
    if cm.pair_bh_b:
        # box face vs halfspace: 8 corner point-contacts per pair with a
        # LINEAR foundation stiffness K1 = g_eff * A_proj(R)/4 (see
        # contact/geometry.narrowphase bh section for the derivation)
        signs = [(sx, sy, sz) for sx in (-1, 1) for sy in (-1, 1)
                 for sz in (-1, 1)]
        for pi, (bi, hi) in enumerate(zip(cm.pair_bh_b, cm.pair_bh_h)):
            Rw, pw = box_R_w[bi], box_p_w[bi]           # traced (3,3,B)/(3,B)
            n_h = np.asarray(cm.hs_normal, dtype)[hi]   # (3,) const
            off_h = float(np.asarray(cm.hs_offset)[hi])
            half = np.asarray(cm.box_half)[bi]
            g = float(np.asarray(cm.bh_g)[pi])
            # silhouette area projected along the plane normal
            nb_ax = [jnp.abs(sum(float(n_h[a]) * Rw[a, j]
                                 for a in range(3))) for j in range(3)]
            hx, hy, hz = float(half[0]), float(half[1]), float(half[2])
            a_proj = 4.0 * (hy * hz * nb_ax[0] + hx * hz * nb_ax[1]
                            + hx * hy * nb_ax[2])       # (B,)
            K1_pair = g * a_proj / 4.0
            for s8 in signs:
                loc = np.array(s8, float) * np.asarray(half, float)
                corner = pw + jnp.stack([
                    sum(Rw[a, k] * float(loc[k]) for k in range(3))
                    for a in range(3)])                  # (3, B)
                phi = off_h - sum(float(n_h[a]) * corner[a]
                                  for a in range(3))     # (B,)
                phis.append(phi[None])
                normals.append(jnp.broadcast_to(
                    jnp.asarray(n_h)[None, :, None], (1, 3) + phi.shape))
                points.append(corner[None])
                body_a.append(cm.box_body[bi])
                body_b.append(-1)
                K1_rows.append(K1_pair[None])
        Ks.append(np.zeros(8 * len(cm.pair_bh_b)))
        ds.append(np.repeat(np.asarray(cm.bh_d), 8))
        mus.append(np.repeat(np.asarray(cm.bh_mu), 8))

    if getattr(cm, "pair_bs_b", ()):
        # box face vs body sphere: bh's corner quadrature on a
        # spherical "ground" (see geometry.narrowphase bs section)
        signs = [(sx, sy, sz) for sx in (-1, 1) for sy in (-1, 1)
                 for sz in (-1, 1)]
        for pi, (bi, si) in enumerate(zip(cm.pair_bs_b, cm.pair_bs_s)):
            Rw, pw = box_R_w[bi], box_p_w[bi]           # traced
            half = np.asarray(cm.box_half)[bi]
            c = centers[si]                             # (3, B)
            r = float(np.asarray(cm.sph_radius)[si])
            g = float(np.asarray(cm.bs_g)[pi])
            dirv = [c[a] - pw[a] for a in range(3)]
            dn = jnp.sqrt(sum(v * v for v in dirv) + 1e-18)
            nbar = [v / dn for v in dirv]
            nb_ax = [jnp.abs(sum(nbar[a] * Rw[a, j] for a in range(3)))
                     for j in range(3)]
            hx, hy, hz = float(half[0]), float(half[1]), float(half[2])
            a_proj = 4.0 * (hy * hz * nb_ax[0] + hx * hz * nb_ax[1]
                            + hx * hy * nb_ax[2])       # (B,)
            K1_pair = g * a_proj / 4.0
            for s8 in signs:
                loc = np.array(s8, float) * np.asarray(half, float)
                corner = pw + jnp.stack([
                    sum(Rw[a, k] * float(loc[k]) for k in range(3))
                    for a in range(3)])                  # (3, B)
                delta = corner - c
                dist = jnp.sqrt(jnp.sum(delta * delta, axis=0) + 1e-18)
                phi = r - dist                           # (B,)
                nrm = delta / dist[None]
                phis.append(phi[None])
                normals.append(nrm[None])
                points.append(corner[None])
                body_a.append(cm.box_body[bi])
                body_b.append(cm.sph_body[si])
                K1_rows.append(K1_pair[None])
        Ks.append(np.zeros(8 * len(cm.pair_bs_b)))
        ds.append(np.repeat(np.asarray(cm.bs_d), 8))
        mus.append(np.repeat(np.asarray(cm.bs_mu), 8))

    K = np.concatenate(Ks)
    d = np.concatenate(ds)
    mu = np.concatenate(mus)
    phi_all = jnp.concatenate(phis)
    K1 = None
    if K1_rows:
        K1 = jnp.concatenate(
            [jnp.zeros((n_quad,) + phi_all.shape[1:], dtype)] + K1_rows)
    return (phi_all, jnp.concatenate(normals), jnp.concatenate(points),
            tuple(body_a), tuple(body_b), K, d, mu, K1)


def _contact_jacobians_T(model, kinT, anc_np, body_a, body_b, points):
    """Relative contact-point Jacobians (NC, 3, nv, B)."""
    R, p, dof_axis_w, dof_origin_w, is_ang, is_lin = kinT
    nv = model.nv
    dtype = points.dtype
    B = points.shape[-1]

    def one(body, p_w):
        if body < 0:
            return np.zeros((3, nv, B), dtype)
        anc = np.asarray(anc_np[body], dtype)           # (nv,)
        lever = p_w[None] - dof_origin_w                # (nv, 3, B)
        crs = _cross_mid_T(dof_axis_w, lever)
        lin = (is_ang[:, None, None] * crs
               + is_lin[:, None, None] * dof_axis_w)
        return (lin * anc[:, None, None]).swapaxes(0, 1)  # (3, nv, B)

    rows = []
    for i, (ba, bb) in enumerate(zip(body_a, body_b)):
        rows.append(one(ba, points[i]) - one(bb, points[i]))
    return jnp.stack(rows)                               # (NC, 3, nv, B)


def _contact_forces_T(phi, normal, v_rel, K, d, mu, params, K1=None):
    """contact/forces.contact_forces with trailing batch.
    phi (NC,B), normal (NC,3,B), v_rel (NC,3,B); K/d/mu (NC,) numpy;
    K1 (NC,B) traced linear foundation stiffness, or None."""
    dtype = phi.dtype
    Kc = np.asarray(K, dtype)[:, None]
    dc = np.asarray(d, dtype)[:, None]
    muc = np.asarray(mu, dtype)[:, None]
    w = params.smooth_width
    phi_s = jax.nn.softplus(phi / w) * w
    vn = jnp.sum(v_rel * normal, 1)                      # (NC, B)
    fn = params.force_scale * Kc * phi_s * phi_s
    if K1 is not None:
        fn = fn + K1 * phi_s
    x = 1.0 - dc * vn
    eps = 1e-3
    fn = fn * (0.5 * (x + jnp.sqrt(x * x + eps * eps)))
    vt = v_rel - vn[:, None] * normal
    vt_norm = jnp.sqrt(jnp.sum(vt * vt, 1) + params.stiction_vel ** 2)
    ft = -(muc * fn / vt_norm)[:, None] * vt
    return fn[:, None] * normal + ft


def _contact_force_pred_T(phi, normal, v_rel, K, d, mu, dt, params,
                          K1=None):
    """Force-only twin of :func:`_contact_forces_implicit_T` (same f, no
    Jacobian D) — used where only the force is needed so traced jaxprs
    (Pallas kernels, JVPs) don't carry dead D code."""
    dtype = phi.dtype
    Kc = np.asarray(K, dtype)[:, None]
    dc = np.asarray(d, dtype)[:, None]
    muc = np.asarray(mu, dtype)[:, None]
    w = params.smooth_width
    vs = params.stiction_vel
    s = params.force_scale
    vn = jnp.sum(v_rel * normal, 1)                      # (NC, B)
    z = (phi - dt * vn) / w
    phi_s = jax.nn.softplus(z) * w
    fn0 = s * Kc * phi_s * phi_s
    if K1 is not None:
        fn0 = fn0 + K1 * phi_s
    eps = 1e-3
    xx = 1.0 - dc * vn
    rt = jnp.sqrt(xx * xx + eps * eps)
    hc = 0.5 * (xx + rt)
    fn = fn0 * hc
    vt = v_rel - vn[:, None] * normal
    sigma = jnp.sqrt(jnp.sum(vt * vt, 1) + vs * vs)
    mu_over = muc * fn / sigma
    return fn[:, None] * normal - mu_over[:, None] * vt


def _contact_forces_implicit_T(phi, normal, v_rel, K, d, mu, dt, params,
                               K1=None):
    """forces.contact_forces_implicit with trailing batch: returns
    f (NC,3,B) and D = df/dv_rel (NC,3,3,B)."""
    dtype = phi.dtype
    Kc = np.asarray(K, dtype)[:, None]
    dc = np.asarray(d, dtype)[:, None]
    muc = np.asarray(mu, dtype)[:, None]
    w = params.smooth_width
    vs = params.stiction_vel
    s = params.force_scale
    vn = jnp.sum(v_rel * normal, 1)                      # (NC, B)
    z = (phi - dt * vn) / w
    phi_s = jax.nn.softplus(z) * w
    sig = jax.nn.sigmoid(z)
    fn0 = s * Kc * phi_s * phi_s
    dfn0 = 2.0 * s * Kc * phi_s
    if K1 is not None:
        fn0 = fn0 + K1 * phi_s
        dfn0 = dfn0 + K1
    eps = 1e-3
    xx = 1.0 - dc * vn
    rt = jnp.sqrt(xx * xx + eps * eps)
    hc = 0.5 * (xx + rt)
    dhc = 0.5 * (1.0 + xx / rt)
    fn = fn0 * hc
    vt = v_rel - vn[:, None] * normal
    sigma = jnp.sqrt(jnp.sum(vt * vt, 1) + vs * vs)
    mu_over = muc * fn / sigma
    f = fn[:, None] * normal - mu_over[:, None] * vt

    b = -(dfn0 * sig * dt * hc + fn0 * dhc * dc)     # (NC, B)
    vt_unit = vt / sigma[:, None]
    P = (np.eye(3, dtype=dtype)[None, :, :, None]
         - normal[:, :, None] * normal[:, None])         # (NC, 3, 3, B)
    D = (
        (normal - muc[:, None] * vt_unit)[:, :, None]
        * (b[:, None] * normal)[:, None]
        - mu_over[:, None, None] * P
        + (mu_over / (sigma * sigma))[:, None, None]
        * (vt[:, :, None] * vt[:, None])
    )
    return f, D


def _contact_primal_T(model, contact: ContactModel, kinT):
    """Sphere centers -> narrowphase -> contact Jacobians, lane-major.

    Returns (phi, normal, point, body_a, body_b, K, d, mu, K1, Jc) —
    shared between the step (below) and the derivative path (lanejac.py).
    K1 is None unless the model has box-face pairs."""
    anc_np = ancestor_dof_mask(model)
    R, p = kinT[0], kinT[1]
    off = np.asarray(contact.sph_offset)                 # (ns, 3)
    if contact.sph_body:
        centers = jnp.stack([
            p[bi] + sum(R[bi, :, j] * float(off[ci, j]) for j in range(3))
            for ci, bi in enumerate(contact.sph_body)
        ])                                               # (ns, 3, B)
    else:
        centers = jnp.zeros((0, 3) + p.shape[2:], p.dtype)
    # per-box world poses: numpy constants for world boxes, traced lane
    # arrays for body-attached boxes
    box_R_w, box_p_w = [], []
    box_rot = np.asarray(contact.box_rot)
    box_pos = np.asarray(contact.box_pos)
    for i, bb in enumerate(contact.box_body):
        if bb < 0:
            box_R_w.append(box_rot[i])
            box_p_w.append(box_pos[i])
        else:
            Rb = R[bb]                                   # (3, 3, B)
            Rw = jnp.stack([jnp.stack([
                sum(Rb[a, k] * float(box_rot[i][k, c]) for k in range(3))
                for c in range(3)]) for a in range(3)])
            pw = p[bb] + jnp.stack([
                sum(Rb[a, k] * float(box_pos[i][k]) for k in range(3))
                for a in range(3)])
            box_R_w.append(Rw)
            box_p_w.append(pw)
    phi, normal, point, body_a, body_b, K, d, mu, K1 = _narrowphase_T(
        contact, centers, box_R_w, box_p_w)
    Jc = _contact_jacobians_T(model, kinT, anc_np, body_a, body_b, point)
    return phi, normal, point, body_a, body_b, K, d, mu, K1, Jc


# ---------------------------------------------------------------------------
# the step
# ---------------------------------------------------------------------------


def make_lane_step(
    model: MultibodyModel,
    contact: Optional[ContactModel],
    dt: float,
    contact_iters: int = 2,
    force_params: ContactForceParams = ContactForceParams(),
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Build step_T(x_T, u_T) -> x_next_T with x_T (n, B), u_T (m, B):
    the lane-major twin of plant.multibody_step."""
    nq, nv = model.nq, model.nv
    B_act = model.actuation_matrix()                     # (nv, nu)

    def step_T(x, u):
        q, v = x[:nq], x[nq:]
        dtype = x.dtype
        kinT, M, bias, anc = _dynamics_terms_T(model, q, v)
        Bc = np.asarray(B_act, dtype)
        tau = (jnp.sum(Bc[:, :, None] * u[None], axis=1)
               if model.nu else jnp.zeros_like(bias)) - bias

        if contact is None or contact.num_contacts == 0:
            v_next = v + dt * solve_spd_T(M, tau)
        else:
            (phi, normal, point, body_a, body_b, K, d, mu, K1,
             Jc) = _contact_primal_T(model, contact, kinT)
            nc = Jc.shape[0]
            Jf = Jc.reshape(3 * nc, nv, -1)

            if contact_iters == 0:
                v_rel = jnp.sum(Jc * v[None, None], axis=2)
                f = _contact_forces_T(
                    phi, normal, v_rel, K, d, mu, force_params, K1=K1)
                tau_c = jnp.sum(Jc * f[:, :, None], axis=(0, 1))
                v_next = v + dt * solve_spd_T(M, tau + tau_c)
            else:
                def residual_T(vp, params):
                    v_rel = jnp.sum(Jc * vp[None, None], axis=2)
                    f, D = _contact_forces_implicit_T(
                        phi, normal, v_rel, K, d, mu, dt, params,
                        K1=K1)
                    tau_c = jnp.sum(Jc * f[:, :, None], axis=(0, 1))
                    res = jnp.sum(M * (vp - v)[None], axis=1) - dt * (
                        tau + tau_c)
                    return res, D

                vp = v + dt * solve_spd_T(M, tau)        # contact-free predictor
                # stiction-regularization continuation + damped Newton
                # (see plant.py / forces.stiction_schedule): per-lane
                # half step if the full step's residual grew (impact
                # overshoot)
                for vs_eff in stiction_schedule(
                        force_params.stiction_vel, contact_iters):
                    p_it = force_params._replace(stiction_vel=vs_eff)
                    res, D = residual_T(vp, p_it)
                    # G = M - dt Jc' D Jc via E = D Jc (unrolled) and a
                    # chunked sum of outer products
                    E = sum(D[:, :, j][:, :, None] * Jc[:, j][:, None]
                            for j in range(3))
                    Ef = E.reshape(3 * nc, nv, -1)
                    G = M - dt * _outer_sum(Jf, Ef)
                    dv = solve_small_T(G, res)
                    vp1 = vp - dv
                    r1, _ = residual_T(vp1, p_it)
                    grew = (jnp.sum(r1 * r1, axis=0)
                            > 4.0 * jnp.sum(res * res, axis=0))  # (B,)
                    vp = jnp.where(grew[None], vp - 0.5 * dv, vp1)
                v_next = vp

        q_next = _integrate_positions_T(model, q, v_next, dt)
        return jnp.concatenate([q_next, v_next])

    return step_T


def lane_step_from_scalar(step: Callable) -> Callable:
    """Generic lane-major wrapper for non-multibody systems: vmap the
    per-scenario step over a trailing batch axis (no layout win, but the
    batched solver can then drive any DiscreteSystem)."""
    return jax.vmap(step, in_axes=-1, out_axes=-1)
