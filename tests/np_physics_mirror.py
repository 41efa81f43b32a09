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
                     force_scale=2.0, relu_eps=1e-3):
    """Force on body A for one contact, implicit penetration prediction
    phi' = phi - dt * (n . v_rel)."""
    vn = float(np.dot(v_rel, normal))
    phi_s = softplus((phi - dt * vn) / smooth_width) * smooth_width
    fn = force_scale * K * phi_s * phi_s
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

    contacts: list of (phi, normal (3,), Jc (3, nv), K, d, mu).
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
        for (phi, n, Jc, K, d, mu) in contacts:
            f = contact_force_np(phi, n, Jc @ vp, K, d, mu, dt, **kw)
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
