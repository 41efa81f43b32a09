"""Independent plain-NumPy float64 mirrors of the framework's *physics
specification* — written from first principles (Lagrangian mechanics,
Newton-Euler, the documented contact force law), NOT from the JAX code.

Role (BASELINE.md parity evidence): pydrake cannot run in this
environment (no installs, zero egress), so the reference's Drake physics
cannot be executed for golden numbers.  The next-best parity evidence is
an independent re-derivation of the same specification:

- the discrete step spec is Drake's discrete MultibodyPlant update
  (reference ilqr.py:228): M(q)(v'-v) = dt (B u - bias + Jc' f(v')),
  q' = q (+) dt N(q) v', contact implicit in v';
- the contact force law spec is contact/forces.py's docstring
  (fn = 2 K phi_s^2 with K = pi r g_eff, softplus-smoothed penetration
  predicted at v', Hunt-Crossley factor, regularized Coulomb friction);
- sphere-halfspace / sphere-box narrowphase per contact/geometry.py's
  documented signed-distance conventions.

Everything here is hand-rolled: Lagrangian cart-pole mass matrix,
quaternion kinematics from the standard formulas, FD Newton Jacobians
(the JAX side uses analytic ones), np.linalg solves.  Agreement between
this mirror and the JAX f64 path validates BOTH independent
implementations of the shared spec.
"""

from __future__ import annotations

import numpy as np

GRAVITY = 9.81


# ---------------------------------------------------------------------------
# contact force law (spec: contact/forces.py module docstring)
# ---------------------------------------------------------------------------

def softplus(z):
    # overflow-safe log(1 + e^z)
    return np.logaddexp(0.0, z)


def contact_force_np(phi, normal, v_rel, K, d, mu, dt,
                     smooth_width=3e-3, stiction_vel=1e-3,
                     force_scale=2.0, relu_eps=1e-3, K1=0.0):
    """Force on body A for one contact, implicit penetration prediction
    phi' = phi - dt * (n . v_rel).  ``K1``: linear elastic-foundation
    stiffness for flat-face corner contacts (pressure g*phi over a
    constant tributary area, unlike spheres whose patch grows with
    phi — spec: contact/forces.py)."""
    vn = float(np.dot(v_rel, normal))
    phi_s = softplus((phi - dt * vn) / smooth_width) * smooth_width
    fn = force_scale * K * phi_s * phi_s + K1 * phi_s
    x = 1.0 - d * vn
    fn *= 0.5 * (x + np.sqrt(x * x + relu_eps * relu_eps))  # smooth relu
    vt = v_rel - vn * normal
    sigma = np.sqrt(float(np.dot(vt, vt)) + stiction_vel * stiction_vel)
    return fn * normal - (mu * fn / sigma) * vt


def series_K(E_a, l_a, E_b, l_b, r_patch):
    """K = pi * r * g_eff, g = E/l series-combined (rigid = inf)."""
    g_a = np.inf if np.isinf(E_a) else E_a / l_a
    g_b = np.inf if np.isinf(E_b) else E_b / l_b
    if np.isinf(g_a) and np.isinf(g_b):
        g = 1e10
    elif np.isinf(g_a):
        g = g_b
    elif np.isinf(g_b):
        g = g_a
    else:
        g = g_a * g_b / (g_a + g_b)
    return np.pi * r_patch * g


def implicit_contact_solve(M, v, tau, contacts, dt, iters, **force_kw):
    """Damped-Newton solve of M(v'-v) = dt (tau + sum Jc' f(v')) with a
    finite-difference residual Jacobian (independent of the JAX path's
    analytic one).

    contacts: list of (phi, normal (3,), Jc (3, nv), K, d, mu) or the
    7-tuple form with a trailing K1 (linear foundation stiffness).
    Newton rule per spec (forces.stiction_schedule): stiction-
    regularization continuation — iteration k solves the model with
    stiction_vel inflated to min(max(vs, 0.05), vs * 4^(iters-1-k)),
    annealing to the true width on the final iteration; full step
    unless the residual norm grows by more than 2x, then half step.
    """
    nv = len(v)
    vs = force_kw.get("stiction_vel", 1e-3)

    def residual(vp, vs_eff):
        kw = dict(force_kw, stiction_vel=vs_eff)
        tau_c = np.zeros(nv)
        for con in contacts:
            (phi, n, Jc, K, d, mu), K1 = con[:6], (con[6] if len(con) > 6
                                                  else 0.0)
            f = contact_force_np(phi, n, Jc @ vp, K, d, mu, dt, K1=K1,
                                 **kw)
            tau_c += Jc.T @ f
        return M @ (vp - v) - dt * (tau + tau_c)

    vp = v + dt * np.linalg.solve(M, tau)     # contact-free predictor
    h = 1e-7
    for it in range(iters):
        vs_eff = min(max(vs, 5e-2), vs * 4.0 ** (iters - 1 - it))
        r0 = residual(vp, vs_eff)
        G = np.zeros((nv, nv))
        for j in range(nv):
            e = np.zeros(nv)
            e[j] = h
            G[:, j] = (residual(vp + e, vs_eff)
                       - residual(vp - e, vs_eff)) / (2 * h)
        dv = np.linalg.solve(G, r0)
        r1 = residual(vp - dv, vs_eff)
        if np.dot(r1, r1) > 4.0 * np.dot(r0, r0):
            vp = vp - 0.5 * dv
        else:
            vp = vp - dv
    return vp


# ---------------------------------------------------------------------------
# cart-pole with wall (reference cart_pole_with_wall.py) — Lagrangian
# ---------------------------------------------------------------------------

class WallCartPole:
    """Hand-derived cart-pole (cart mc, point-mass pole mp at length l,
    theta from hanging-down, tip x = x + l sin th) with a compliant ball
    tip against a rigid wall box at x = wall_x."""

    def __init__(self, mc=10.0, mp=1.0, l=0.5, radius=0.05,
                 modulus=2e6, dissipation=0.0, mu=1.0,
                 wall_x=-0.5, wall_half=(0.05, 0.5, 1.0),
                 dt=1e-2, contact_iters=8):
        self.mc, self.mp, self.l, self.r = mc, mp, l, radius
        self.dt, self.iters = dt, contact_iters
        self.wall_x = np.array([wall_x, 0.0, 0.0])
        self.wall_half = np.asarray(wall_half, float)
        # compliant sphere (g = E/r) vs rigid box: g_eff = E/r
        self.K = series_K(modulus, radius, np.inf, min(wall_half), radius)
        self.d = 2.0 * dissipation
        self.mu = 2.0 * mu * mu / (mu + mu)

    def tip(self, x, th):
        return np.array([x + self.l * np.sin(th), 0.0,
                         -self.l * np.cos(th)])

    def tip_jac(self, th):
        """d tip / d (x, th): (3, 2)."""
        return np.array([
            [1.0, self.l * np.cos(th)],
            [0.0, 0.0],
            [0.0, self.l * np.sin(th)],
        ])

    def step(self, state, u):
        x, th, xd, thd = [float(s) for s in state]
        mc, mp, l = self.mc, self.mp, self.l
        c, s = np.cos(th), np.sin(th)
        M = np.array([[mc + mp, mp * l * c],
                      [mp * l * c, mp * l * l]])
        # Euler-Lagrange bias (Coriolis + gravity), moved to the RHS as
        # tau = B u - bias
        bias = np.array([-mp * l * s * thd * thd,
                         mp * GRAVITY * l * s])
        tau = np.array([float(u[0]), 0.0]) - bias

        # narrowphase: sphere center = tip, vs world box (outside face)
        cen = self.tip(x, th)
        local = cen - self.wall_x
        clamped = np.clip(local, -self.wall_half, self.wall_half)
        delta = local - clamped
        dist = np.linalg.norm(delta)
        if dist > 1e-12:
            n = delta / dist
            sd = dist
        else:                       # center inside the box: nearest face
            gap = self.wall_half - np.abs(local)
            ax = int(np.argmin(gap))
            n = np.zeros(3)
            n[ax] = np.sign(local[ax]) if local[ax] != 0 else 1.0
            sd = -float(gap[ax])
        phi = self.r - sd
        Jc = self.tip_jac(th)       # world velocity of the tip
        contacts = [(phi, n, Jc, self.K, self.d, self.mu)]
        v = np.array([xd, thd])
        vp = implicit_contact_solve(M, v, tau, contacts, self.dt,
                                    self.iters)
        xn = x + self.dt * vp[0]
        thn = th + self.dt * vp[1]
        return np.array([xn, thn, vp[0], vp[1]])


# ---------------------------------------------------------------------------
# free rigid body (tumbling brick) on compliant ground — Newton-Euler
# ---------------------------------------------------------------------------

def quat_to_R(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ])


def hat(r):
    return np.array([[0, -r[2], r[1]], [r[2], 0, -r[0]], [-r[1], r[0], 0.0]])


class FreeBodyOnGround:
    """One free rigid body (quaternion base, q = [quat wxyz, pos],
    v = [omega_world, v_world]) with a collision sphere at the body
    origin, on a compliant ground halfspace z >= 0.

    Newton-Euler from scratch: M = blockdiag(R I R', m I3),
    bias = [w x (I_w w), -m g_vec]."""

    def __init__(self, mass, inertia_body, radius, modulus=5e6,
                 dissipation=5.0, mu=0.5, ground_depth=0.5,
                 dt=1e-2, contact_iters=8, smooth_width=1e-3):
        self.m = mass
        self.I = np.asarray(inertia_body, float)
        self.r = radius
        self.dt, self.iters = dt, contact_iters
        self.K = series_K(modulus, radius, modulus, ground_depth, radius)
        self.d = 2.0 * dissipation
        self.mu = 2.0 * mu * mu / (mu + mu)
        self.smooth_width = smooth_width

    def step(self, state, u=None):
        q, pos = state[:4], state[4:7]
        w, vl = state[7:10], state[10:13]
        R = quat_to_R(q)
        Iw = R @ self.I @ R.T
        M = np.zeros((6, 6))
        M[:3, :3] = Iw
        M[3:, 3:] = self.m * np.eye(3)
        g_vec = np.array([0.0, 0.0, -GRAVITY])
        bias = np.concatenate([np.cross(w, Iw @ w), -self.m * g_vec])
        tau = -bias

        # sphere center = body origin; ground plane z = 0, normal +z
        n = np.array([0.0, 0.0, 1.0])
        sd = float(pos[2])                       # center-to-plane distance
        phi = self.r - sd
        p = pos - (sd - 0.5 * phi) * n           # contact point
        lever = p - pos
        Jc = np.hstack([-hat(lever), np.eye(3)])  # v_pt = w x lever + v
        contacts = [(phi, n, Jc, self.K, self.d, self.mu)]
        v = np.concatenate([w, vl])
        vp = implicit_contact_solve(M, v, tau, contacts, self.dt,
                                    self.iters,
                                    smooth_width=self.smooth_width)
        wq = np.concatenate([[0.0], vp[:3]])
        qn = q + self.dt * 0.5 * quat_mul(wq, q)
        qn = qn / np.linalg.norm(qn)
        posn = pos + self.dt * vp[3:]
        return np.concatenate([qn, posn, vp])


# ---------------------------------------------------------------------------
# floating-base kinematic tree on compliant ground (mini-cheetah class) —
# D'Alembert virtual work with finite-difference Jacobians
# ---------------------------------------------------------------------------

def rodrigues(axis, angle):
    K = hat(axis)
    return (np.eye(3) + np.sin(angle) * K
            + (1.0 - np.cos(angle)) * (K @ K))


class FloatingTreeMirror:
    """Independent f64 mirror of a floating-base rigid-body tree with
    sphere/box ground contacts — the flagship (mini-cheetah) step class.

    Method is deliberately DIFFERENT from the JAX implementation
    (Jacobian-form CRBA + world-frame Newton-Euler bias + analytic
    contact Jacobians): here everything derives from D'Alembert's
    principle with body velocity maps S obtained by CENTRAL FINITE
    DIFFERENCES of an independently written forward kinematics:

        M(q)    = sum_b m_b S_c^T S_c + S_w^T I_w S_w  (+ armature)
        h(q, v) = sum_b m_b S_c^T (dS_c/dt v)
                  + S_w^T (I_w (dS_w/dt v) + w x I_w w)
        M v' - M v = dt (B u + tau_gravity - h - damping v + Jc^T f(v'))
        q' = q (+) dt N(q) v'   (quaternion: world-frame rate formula)

    with dS/dt by FD along the flow q + delta N(q) v.  Shared with the
    JAX code: ONLY the numeric model/contact tables (the problem
    definition: joint origins/axes, inertias, sphere radii, combined
    material constants) and the documented force-law spec.

    Joint conventions are URDF's: child frame = parent * X_PJ *
    Rot(axis, q_j); floating base = X_PJ * quat, world-frame
    angular/linear velocity dofs.
    """

    FREE, REVOLUTE, PRISMATIC, FIXED = 0, 1, 2, 3

    def __init__(self, topo, data, contact_tables, dt=4e-3,
                 contact_iters=8, smooth_width=1e-3, stiction_vel=1e-3):
        self.t = topo          # parent, joint_type, q_start, v_start, nq, nv
        self.d = data          # X_PJ_rot/pos, axis, mass, com, inertia,
        #                        damping, armature, gravity, B (nv, nu)
        self.c = contact_tables
        self.dt, self.iters = dt, contact_iters
        self.force_kw = dict(smooth_width=smooth_width,
                             stiction_vel=stiction_vel)
        self.nb = len(topo["parent"])
        self.nq, self.nv = topo["nq"], topo["nv"]

    # -- forward kinematics (independent implementation) ------------------
    def fk(self, q):
        t, d = self.t, self.d
        Rs, ps = [], []
        for b in range(self.nb):
            par = t["parent"][b]
            Rp = np.eye(3) if par < 0 else Rs[par]
            pp = np.zeros(3) if par < 0 else ps[par]
            RJ = Rp @ d["X_PJ_rot"][b]
            pJ = pp + Rp @ d["X_PJ_pos"][b]
            jt = t["joint_type"][b]
            qs = t["q_start"][b]
            if jt == self.FREE:
                quat = np.asarray(q[qs:qs + 4], float)
                quat = quat / np.linalg.norm(quat)
                Rb = RJ @ quat_to_R(quat)
                pb = pJ + Rp @ q[qs + 4:qs + 7]
            elif jt == self.REVOLUTE:
                Rb = RJ @ rodrigues(d["axis"][b], float(q[qs]))
                pb = pJ
            elif jt == self.PRISMATIC:
                Rb = RJ
                pb = pJ + RJ @ (d["axis"][b] * float(q[qs]))
            else:
                Rb, pb = RJ, pJ
            Rs.append(Rb)
            ps.append(pb)
        return Rs, ps

    def qdot(self, q, v):
        """N(q) v: position-coordinate rates from generalized velocity."""
        t = self.t
        qd = np.zeros(self.nq)
        for b in range(self.nb):
            jt = t["joint_type"][b]
            qs, vs = t["q_start"][b], t["v_start"][b]
            if jt == self.FREE:
                quat = q[qs:qs + 4]
                w = v[vs:vs + 3]
                qd[qs:qs + 4] = 0.5 * quat_mul(
                    np.concatenate([[0.0], w]), quat)
                qd[qs + 4:qs + 7] = v[vs + 3:vs + 6]
            elif jt in (self.REVOLUTE, self.PRISMATIC):
                qd[qs] = v[vs]
        return qd

    def body_jacs(self, q, h=1e-6):
        """S_w (nb, 3, nv) and S_c (nb, 3, nv): world angular / com
        velocity maps, by central FD of fk along each dof's flow."""
        nb, nv = self.nb, self.nv
        R0, _ = self.fk(q)
        S_w = np.zeros((nb, 3, nv))
        S_c = np.zeros((nb, 3, nv))
        com = self.d["com"]
        for k in range(nv):
            e = np.zeros(nv)
            e[k] = 1.0
            qd = self.qdot(q, e)
            Rp, pp = self.fk(q + h * qd)
            Rm, pm = self.fk(q - h * qd)
            for b in range(nb):
                dR = (Rp[b] - Rm[b]) / (2 * h)
                W = dR @ R0[b].T
                S_w[b, :, k] = [W[2, 1], W[0, 2], W[1, 0]]
                dcom = ((pp[b] + Rp[b] @ com[b])
                        - (pm[b] + Rm[b] @ com[b])) / (2 * h)
                S_c[b, :, k] = dcom
        return S_w, S_c

    def point_jac(self, q, body, p_w, h=1e-6):
        """(3, nv) world-velocity map of a point rigidly on ``body``."""
        R0, p0 = self.fk(q)
        loc = R0[body].T @ (p_w - p0[body])
        J = np.zeros((3, self.nv))
        for k in range(self.nv):
            e = np.zeros(self.nv)
            e[k] = 1.0
            qd = self.qdot(q, e)
            Rp, pp = self.fk(q + h * qd)
            Rm, pm = self.fk(q - h * qd)
            J[:, k] = ((pp[body] + Rp[body] @ loc)
                       - (pm[body] + Rm[body] @ loc)) / (2 * h)
        return J

    # -- narrowphase (spec: contact/geometry.py) --------------------------
    def contacts(self, q):
        c = self.c
        Rs, ps = self.fk(q)
        out = []   # (phi, n, Jc, K, d, mu, K1)

        def rel_jac(body_a, body_b, point):
            J = self.point_jac(q, body_a, point)
            if body_b >= 0:
                J = J - self.point_jac(q, body_b, point)
            return J

        centers = [ps[b] + Rs[b] @ off
                   for b, off in zip(c["sph_body"], c["sph_offset"])]
        for s, hgeom, K, dd, mu in zip(c["pair_sh_s"], c["pair_sh_h"],
                                       c["sh_K"], c["sh_d"], c["sh_mu"]):
            n = c["hs_normal"][hgeom]
            dist = float(centers[s] @ n) - c["hs_offset"][hgeom]
            phi = c["sph_radius"][s] - dist
            p = centers[s] - (dist - 0.5 * phi) * n
            out.append((phi, n, rel_jac(c["sph_body"][s], -1, p),
                        K, dd, mu, 0.0))
        for a, b, K, dd, mu in zip(c.get("pair_ss_a", ()),
                                   c.get("pair_ss_b", ()),
                                   c.get("ss_K", ()), c.get("ss_d", ()),
                                   c.get("ss_mu", ())):
            dvec = centers[a] - centers[b]
            dist = np.linalg.norm(dvec)
            n = dvec / max(dist, 1e-9)
            phi = (c["sph_radius"][a] + c["sph_radius"][b]) - dist
            p = centers[b] + (c["sph_radius"][b] - 0.5 * phi) * n
            out.append((phi, n,
                        rel_jac(c["sph_body"][a], c["sph_body"][b], p),
                        K, dd, mu, 0.0))
        for s, bx, K, dd, mu in zip(c["pair_sb_s"], c["pair_sb_b"],
                                    c["sb_K"], c["sb_d"], c["sb_mu"]):
            bb = c["box_body"][bx]
            Rw = Rs[bb] @ c["box_rot"][bx]
            pw = ps[bb] + Rs[bb] @ c["box_pos"][bx]
            local = Rw.T @ (centers[s] - pw)
            half = c["box_half"][bx]
            clamped = np.clip(local, -half, half)
            delta = local - clamped
            dist = np.linalg.norm(delta)
            if dist > 1e-9:
                n_l = delta / dist
                sd = dist
            else:
                gap = half - np.abs(local)
                ax = int(np.argmin(gap))
                n_l = np.zeros(3)
                n_l[ax] = np.sign(local[ax]) or 1.0
                sd = -float(gap[ax])
            phi = c["sph_radius"][s] - sd
            n = Rw @ n_l
            p = centers[s] - (sd - 0.5 * phi) * n
            out.append((phi, n, rel_jac(c["sph_body"][s], bb, p),
                        K, dd, mu, 0.0))
        for bx, s, g, dd, mu in zip(c.get("pair_bs_b", ()),
                                    c.get("pair_bs_s", ()),
                                    c.get("bs_g", ()), c.get("bs_d", ()),
                                    c.get("bs_mu", ())):
            # box face vs body sphere: corner quadrature on a spherical
            # "ground" (spec: contact/geometry.py bs section)
            bb = c["box_body"][bx]
            Rw = Rs[bb] @ c["box_rot"][bx]
            pw = ps[bb] + Rs[bb] @ c["box_pos"][bx]
            half = c["box_half"][bx]
            cen = centers[s]
            r = c["sph_radius"][s]
            dirv = cen - pw
            nbar = dirv / max(np.linalg.norm(dirv), 1e-9)
            nb_ax = np.abs(nbar @ Rw)
            a_proj = 4.0 * (half[1] * half[2] * nb_ax[0]
                            + half[0] * half[2] * nb_ax[1]
                            + half[0] * half[1] * nb_ax[2])
            K1 = g * a_proj / 4.0
            for sx in (-1, 1):
                for sy in (-1, 1):
                    for sz in (-1, 1):
                        corner = pw + Rw @ (np.array([sx, sy, sz]) * half)
                        delta = corner - cen
                        dist = np.linalg.norm(delta)
                        phi = r - dist
                        n = delta / max(dist, 1e-9)
                        out.append((phi, n,
                                    rel_jac(bb, c["sph_body"][s], corner),
                                    0.0, dd, mu, K1))
        for bx, hgeom, g, dd, mu in zip(c["pair_bh_b"], c["pair_bh_h"],
                                        c["bh_g"], c["bh_d"], c["bh_mu"]):
            bb = c["box_body"][bx]
            Rw = Rs[bb] @ c["box_rot"][bx]
            pw = ps[bb] + Rs[bb] @ c["box_pos"][bx]
            half = c["box_half"][bx]
            n = c["hs_normal"][hgeom]
            off = c["hs_offset"][hgeom]
            nb_ax = np.abs(n @ Rw)
            a_proj = 4.0 * (half[1] * half[2] * nb_ax[0]
                            + half[0] * half[2] * nb_ax[1]
                            + half[0] * half[1] * nb_ax[2])
            K1 = g * a_proj / 4.0
            for sx in (-1, 1):
                for sy in (-1, 1):
                    for sz in (-1, 1):
                        corner = pw + Rw @ (np.array([sx, sy, sz]) * half)
                        phi = off - float(corner @ n)
                        out.append((phi, n, rel_jac(bb, -1, corner),
                                    0.0, dd, mu, K1))
        return out

    # -- one discrete step ------------------------------------------------
    def step(self, state, u):
        q = np.asarray(state[:self.nq], float)
        v = np.asarray(state[self.nq:], float)
        d = self.d
        Rs, _ = self.fk(q)
        S_w, S_c = self.body_jacs(q)
        dflow = 5e-4                     # outer FD step along the flow
        qd = self.qdot(q, v)
        Swp, Scp = self.body_jacs(q + dflow * qd)
        Swm, Scm = self.body_jacs(q - dflow * qd)
        dS_w = (Swp - Swm) / (2 * dflow)
        dS_c = (Scp - Scm) / (2 * dflow)

        M = np.diag(np.asarray(d["armature"], float))
        h_vec = np.zeros(self.nv)
        tau_g = np.zeros(self.nv)
        gvec = d["gravity"]
        for b in range(self.nb):
            m = d["mass"][b]
            Iw = Rs[b] @ d["inertia"][b] @ Rs[b].T
            M += m * S_c[b].T @ S_c[b] + S_w[b].T @ Iw @ S_w[b]
            w = S_w[b] @ v
            h_vec += (m * S_c[b].T @ (dS_c[b] @ v)
                      + S_w[b].T @ (Iw @ (dS_w[b] @ v)
                                    + np.cross(w, Iw @ w)))
            tau_g += m * S_c[b].T @ gvec
        tau = (d["B"] @ np.asarray(u, float) + tau_g - h_vec
               - np.asarray(d["damping"], float) * v)

        vp = implicit_contact_solve(M, v, tau, self.contacts(q),
                                    self.dt, self.iters, **self.force_kw)

        t = self.t
        qn = q.copy()
        for b in range(self.nb):
            jt = t["joint_type"][b]
            qs, vs = t["q_start"][b], t["v_start"][b]
            if jt == self.FREE:
                quat = q[qs:qs + 4]
                w = vp[vs:vs + 3]
                quat_n = quat + self.dt * 0.5 * quat_mul(
                    np.concatenate([[0.0], w]), quat)
                qn[qs:qs + 4] = quat_n / np.linalg.norm(quat_n)
                qn[qs + 4:qs + 7] = q[qs + 4:qs + 7] + self.dt * vp[vs + 3:vs + 6]
            elif jt in (self.REVOLUTE, self.PRISMATIC):
                qn[qs] = q[qs] + self.dt * vp[vs]
        return np.concatenate([qn, vp])
