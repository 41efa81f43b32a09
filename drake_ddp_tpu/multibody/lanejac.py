"""Lane-major structured-IFT dynamics Jacobians (fx, fu) for the solver.

TPU-native replacement for the derivative hot loop (reference
ilqr.py:233-272 ``_calc_dynamics_partials``: AutoDiffXd carrying
(n+m)-wide dual numbers through the full contact dynamics; README.md:51
calls this "the bottleneck for all these tasks").  The round-1 path was
``jax.jacfwd`` through the per-scenario step (multibody/plant.py) batched
with vmap — correct, but batch-first and pushing all n+m tangent
directions through the entire step.

This module exploits the step's *structure* instead.  The discrete step
solves, implicitly in v',

    res(v'; q, v, u) = M(q)(v' - v) - dt (B u - bias(q, v) + Jc(q)' f(v')) = 0
    q' = q (+) dt N(q) v'

so by the implicit function theorem

    dv' = -G^{-1} (dres/dq dq + dres/dv dv + dres/du du),
    G   = dres/dv' = M - dt Jc' D Jc   (already assembled by Newton)

and the three tangent groups cost very differently:

- **u-directions (m of them): free.**  dres/du = -dt B, a constant —
  fu's velocity block is just ``dt G^{-1} B``.
- **v-directions (nv): cheap.**  q-only terms (forward kinematics, M,
  contact geometry, Jc) are constants — tangents only propagate through
  the velocity-product bias term (``lanestep._bias_T``).
- **q-directions (nq): the expensive group** — full tangent propagation
  through FK / mass matrix / narrowphase / contact Jacobians / one force
  evaluation, but NOT through the Newton iterations (primal only).

Everything is lane-major (trailing batch axis, see lanestep.py) and the
tangent groups are evaluated with ``jax.vmap``-over-``jax.jvp`` so the
primal is computed once per group.  Equivalence with the per-scenario
``jax.jacfwd`` path (plant.py lax.custom_root IFT) is pinned by
tests/test_lanejac.py.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from drake_ddp_tpu.contact.forces import ContactForceParams
from drake_ddp_tpu.contact.geometry import ContactModel
from drake_ddp_tpu.multibody.lanestep import (
    _bias_T,
    _contact_force_pred_T,
    _contact_forces_implicit_T,
    _contact_primal_T,
    _integrate_positions_T,
    _kin_mass_T,
    _outer_sum,
    solve_small_T,
    solve_spd_T,
)
from drake_ddp_tpu.contact.forces import stiction_schedule
from drake_ddp_tpu.multibody.model import MultibodyModel


def _eye_bcast(n, like):
    """(n, n, L) broadcast identity — ablation stand-in for inv_small_T."""
    return jnp.broadcast_to(
        np.eye(n, dtype=np.float32)[:, :, None], (n, n, like.shape[-1])
    ).astype(like.dtype)


def inv_small_T(A):
    """Gauss-Jordan inverse (no pivoting), lane-major: (n, n, B) -> same.

    For the diagonally dominant contact Newton matrix G — the same
    assumption as lanestep.solve_small_T.  Written as unrolled
    elementwise row ops (Pallas/Mosaic-compatible, no scatters)."""
    n = A.shape[0]
    eye = np.eye(n)
    aug = jnp.broadcast_to(np.asarray(eye, A.dtype)[:, :, None],
                           A.shape)
    Ab = jnp.concatenate([A, aug], axis=1)               # (n, 2n, B)
    for k in range(n):
        pivot_row = Ab[k]                                # (2n, B)
        pivot = Ab[k][k]                                 # (B,)
        factor = Ab[:, k] / pivot                        # (n, B)
        factor = factor - factor * np.asarray(eye[k], A.dtype)[:, None]
        Ab = Ab - factor[:, None, :] * pivot_row[None]
    diag = jnp.stack([Ab[i][i] for i in range(n)])       # (n, B)
    return Ab[:, n:] / diag[:, None]


def make_lane_jac(
    model: MultibodyModel,
    contact: Optional[ContactModel],
    dt: float,
    contact_iters: int = 2,
    force_params: ContactForceParams = ContactForceParams(),
    _ablate_groups: tuple = (),
    q_mode: str = "vmap",
    q_group: int = 1,
    root_seed: bool = False,
    refine_iters: int = 0,
) -> Callable[..., tuple[jax.Array, jax.Array]]:
    """Build ``jac_T(x_L, u_L) -> (fx_L, fu_L)`` with x_L (n, L), u_L
    (m, L); fx_L (n, n, L), fu_L (n, m, L) — the per-lane step Jacobians
    d x'/d x and d x'/d u of plant.multibody_step.

    Requires the implicit contact path (``contact_iters >= 1``) or a
    contact-free model; the explicit ``contact_iters == 0`` step has a
    different (non-IFT) Jacobian and keeps the jacfwd fallback.

    ``_ablate_groups``: perf-probe hook (tools/probe_jac_split.py) —
    subset of {"q", "v"}; a named tangent group is replaced by zeros so
    XLA dead-codes its JVP, isolating its cost.  NEVER set in
    production paths.

    ``q_mode``: how the nq expensive q-tangent directions are evaluated.
    "vmap" (default, the XLA lane path) materializes all nq tangent
    copies of the kinematics/narrowphase intermediates at once — fine
    for XLA's HBM, but a VMEM blow-up inside the Pallas mega-jac kernel
    (~19 live copies of the (NC, 3, nv, L) contact-Jacobian tangents at
    flagship sizes; measured: Mosaic compilation dies, round-4 bench
    fell back).  "loop" linearizes the residual ONCE (primal
    intermediates computed and held once) and walks the directions with
    ``lax.fori_loop``, so only one direction's tangent intermediates
    are live at a time — the form ops/megajac.py compiles.

    ``q_group`` (loop mode only): tangent directions per loop iteration
    (a small inner vmap).  One direction's ops are (<=8, L)-shaped —
    poor VPU sublane utilization at L=128 — so grouping a few
    directions per iteration recovers throughput at g x the VMEM of a
    single direction.  nq is padded to a multiple of g with zero
    directions.

    ``root_seed``: the solver already HAS the converged next state from
    the accepted rollout — so re-running the full contact_iters
    stiction-continuation Newton inside the jac is pure waste.  With
    root_seed the returned function takes a third argument
    ``x_next (n, L)`` (the rollout's step output at the same point) and
    linearizes THERE.  ``refine_iters`` extra damped polish steps at
    the final stiction width are available but default to 0: the step
    map's actual output is the schedule's last iterate, and the
    linearization point must match it — measured on gait rollouts,
    refine=0 agrees with the cold-Newton jac to ~6e-5 relative (twin
    noise), while polish steps move the point toward the fully
    converged final-width root and introduce ~0.8% fx deviation (the
    same deviation a 16-iteration cold schedule does NOT show).  From
    an inconsistent tape (the padding tail of a first-iteration policy
    warm start) the jac linearizes at the tape's x_{t+1} — degraded
    but bounded, and only reachable through the Levenberg retry path.
    """
    nq, nv, nu = model.nq, model.nv, model.nu
    n = nq + nv
    B_np = np.asarray(model.actuation_matrix())          # (nv, nu)
    has_contact = contact is not None and contact.num_contacts > 0
    if has_contact and contact_iters < 1:
        raise ValueError(
            "lane_jac needs the implicit contact step (contact_iters >= 1)")

    def jac_T(x: jax.Array, u: jax.Array, x_next=None):
        dtype = x.dtype
        L = x.shape[-1]
        q, v = x[:nq], x[nq:]
        vp_seed = None if x_next is None else x_next[nq:]

        # ---------------- primal (shared by every tangent group) -------
        kinT, M, (J_ang, J_com, I_w, com_w), _ = _kin_mass_T(model, q)
        bias = _bias_T(model, kinT, J_ang, J_com, I_w, com_w, v)
        Bc = np.asarray(B_np, dtype)
        tau = (jnp.sum(Bc[:, :, None] * u[None], axis=1)
               if nu else jnp.zeros_like(bias)) - bias

        if has_contact:
            (phi, normal, point, body_a, body_b, Kp, dp, mup, K1p,
             Jc) = _contact_primal_T(model, contact, kinT)
            nc = Jc.shape[0]
            Jf = Jc.reshape(3 * nc, nv, L)

            def residual_T(vp, params=force_params):
                v_rel = jnp.sum(Jc * vp[None, None], axis=2)
                f, D = _contact_forces_implicit_T(
                    phi, normal, v_rel, Kp, dp, mup, dt, params,
                    K1=K1p)
                tau_c = jnp.sum(Jc * f[:, :, None], axis=(0, 1))
                res = jnp.sum(M * (vp - v)[None], axis=1) - dt * (
                    tau + tau_c)
                return res, D

            def newton_mat(D):
                E = sum(D[:, :, j][:, :, None] * Jc[:, j][:, None]
                        for j in range(3))
                return M - dt * _outer_sum(Jf, E.reshape(3 * nc, nv, L))

            # same continuation damped Newton as lanestep.make_lane_step
            # (primal only; see forces.stiction_schedule).  root_seed:
            # start from the rollout's converged root and polish at the
            # final width only (the IFT needs the root, not the path).
            if vp_seed is not None:
                vp = vp_seed
                schedule = [force_params.stiction_vel] * refine_iters
            else:
                vp = v + dt * solve_spd_T(M, tau)
                schedule = stiction_schedule(force_params.stiction_vel,
                                             contact_iters)
            for vs_eff in schedule:
                p_it = force_params._replace(stiction_vel=vs_eff)
                res, D = residual_T(vp, p_it)
                G = newton_mat(D)
                dv = solve_small_T(G, res)
                vp1 = vp - dv
                r1, _ = residual_T(vp1, p_it)
                grew = (jnp.sum(r1 * r1, axis=0)
                        > 4.0 * jnp.sum(res * res, axis=0))
                vp = jnp.where(grew[None], vp - 0.5 * dv, vp1)
            # G evaluated at the converged root (the IFT linearization
            # point — reference analog: plant.py lax.custom_root
            # tangent_solve)
            _, D = residual_T(vp)
            G = newton_mat(D)
            Ginv = (_eye_bcast(nv, G) if "inv" in _ablate_groups
                    else inv_small_T(G))
        else:
            vp = (vp_seed if vp_seed is not None
                  else v + dt * solve_spd_T(M, tau))
            Ginv = (_eye_bcast(nv, M) if "inv" in _ablate_groups
                    else inv_small_T(M))

        # ---------------- q-tangents (nq full directions) ---------------
        # d res/dq with (v, u, vp) fixed; constant-in-q terms are dropped
        # (their primal value is never used, only the tangent).
        def res_of_q(qq):
            kin2, M2, (Ja2, Jo2, Iw2, cw2), _ = _kin_mass_T(model, qq)
            bias2 = _bias_T(model, kin2, Ja2, Jo2, Iw2, cw2, v)
            acc = jnp.sum(M2 * (vp - v)[None], axis=1)
            out = acc + dt * bias2
            if has_contact:
                # K1 is orientation-dependent (box silhouette area), so
                # the q-tangent must flow through the recomputed K1_2
                (phi2, normal2, _pt2, _ba, _bb, _K2, _d2, _m2, K1_2,
                 Jc2) = _contact_primal_T(model, contact, kin2)
                v_rel2 = jnp.sum(Jc2 * vp[None, None], axis=2)
                f2 = _contact_force_pred_T(
                    phi2, normal2, v_rel2, Kp, dp, mup, dt, force_params,
                    K1=K1_2)
                tau_c2 = jnp.sum(Jc2 * f2[:, :, None], axis=(0, 1))
                out = out - dt * tau_c2
            return out

        def one_q(e):
            dq = jnp.broadcast_to(e[:, None], (nq, L))
            return jax.jvp(res_of_q, (q,), (dq,))[1]     # (nv, L)

        if "q" in _ablate_groups:
            dres_q = jnp.zeros((nq, nv, L), dtype)
        elif q_mode == "loop":
            # primal once, then q_group tangent directions live at a
            # time.  Mosaic has no dynamic_slice/dynamic_update_slice
            # lowering, so the one-hot directions and the row-block
            # write both go through iota-mask selects (elementwise).
            g = max(1, int(q_group))
            ng = -(-nq // g)                             # ceil
            _, res_q_lin = jax.linearize(res_of_q, q)
            # direction d = k*g + j as a (g, nq, 1) one-hot vs iota
            col_g = jax.lax.broadcasted_iota(jnp.int32, (g, nq, 1), 0)
            col_q = jax.lax.broadcasted_iota(jnp.int32, (g, nq, 1), 1)
            blk4 = jax.lax.broadcasted_iota(jnp.int32, (ng, 1, 1, 1), 0)
            vlin = jax.vmap(res_q_lin)

            def q_body(k, acc4):
                d = k * g + col_g                        # (g, nq, 1)
                dq = jnp.broadcast_to(
                    (col_q == d).astype(dtype), (g, nq, L))
                t = vlin(dq)                             # (g, nv, L)
                return jnp.where(blk4 == k,
                                 t[None].astype(dtype), acc4)

            acc4 = jax.lax.fori_loop(
                0, ng, q_body, jnp.zeros((ng, g, nv, L), dtype))
            dres_q = acc4.reshape(ng * g, nv, L)[:nq]
        else:
            dres_q = jax.vmap(one_q)(
                jnp.eye(nq, dtype=dtype))                # (nq, nv, L)

        # ---------------- v-tangents (nv cheap directions) --------------
        # only -M dv + dt d bias/dv dv survives; kinematics are constants
        def res_of_v(vv):
            bias2 = _bias_T(model, kinT, J_ang, J_com, I_w, com_w, vv)
            return dt * bias2 - jnp.sum(M * vv[None], axis=1)

        def one_v(e):
            dv = jnp.broadcast_to(e[:, None], (nv, L))
            return jax.jvp(res_of_v, (v,), (dv,))[1]

        if "v" in _ablate_groups:
            dres_v = jnp.zeros((nv, nv, L), dtype)
        else:
            dres_v = jax.vmap(one_v)(
                jnp.eye(nv, dtype=dtype))                # (nv, nv, L)

        # ---------------- assemble dv' = -G^{-1} dres -------------------
        dres_x = jnp.concatenate([dres_q, dres_v], axis=0)   # (n, nv, L)
        if "asm" in _ablate_groups:
            dvp_x = jnp.zeros((n, nv, L), dtype)
        else:
            # unrolled elementwise contraction (Mosaic-safe subset, runs
            # inside ops/megajac.py); an MXU einsum form was measured
            # NOT faster in the XLA path (tools/probe_jac_split.py —
            # the XLA jac is movement-bound across the whole program,
            # not compute-bound in this contraction)
            # Ginv[:, j][None], NOT Ginv[None, :, j]: int+newaxis
            # indexing lowers as a >2D gather, which Mosaic rejects
            # when this body runs inside ops/megajac.py (CLAUDE.md)
            dvp_x = -sum(Ginv[:, j][None] * dres_x[:, j][:, None]
                         for j in range(nv))                 # (n, nv, L)
        if nu:
            # u-directions: dres/du = -dt B  =>  dv' = dt G^{-1} B
            dvp_u = dt * sum(
                Ginv[:, j][None] * np.asarray(B_np[j], dtype)[:, None, None]
                for j in range(nv))                          # (nu, nv, L)
            dvp_all = jnp.concatenate([dvp_x, dvp_u], axis=0)
        else:
            dvp_all = dvp_x                                  # (n+m, nv, L)

        # ---------------- q' tangents through the integrator ------------
        def int_fn(qq, vv):
            return _integrate_positions_T(model, qq, vv, dt)

        def one_int(dq_e, dv_e):
            return jax.jvp(int_fn, (q, vp), (dq_e, dv_e))[1]

        ndir = n + nu
        dq_in = jnp.concatenate([
            jnp.broadcast_to(jnp.eye(nq, dtype=dtype)[:, :, None],
                             (nq, nq, L)),
            jnp.zeros((ndir - nq, nq, L), dtype),
        ], axis=0)
        if "int" in _ablate_groups:
            dqn_all = jnp.zeros((ndir, nq, L), dtype)
        else:
            dqn_all = jax.vmap(one_int)(dq_in, dvp_all)      # (ndir, nq, L)

        dx_all = jnp.concatenate([dqn_all, dvp_all], axis=1)  # (ndir, n, L)
        fx = jnp.moveaxis(dx_all[:n], 0, 1)                  # (n, n, L)
        fu = jnp.moveaxis(dx_all[n:], 0, 1)                  # (n, nu, L)
        return fx, fu

    if root_seed:
        return lambda x, u, x_next: jac_T(x, u, x_next)
    return lambda x, u: jac_T(x, u)
