"""Smooth hydroelastic-style contact force law.

Replaces Drake's hydroelastic pressure-field integration (SURVEY.md D3)
with a closed-form, everywhere-smooth force on each candidate contact —
the property iLQR actually needs (the reference's paper point is that
hydroelastic contact yields smooth dynamics an optimizer can
differentiate through; we re-derive the same *magnitude* of force in
closed form):

- each geometry carries a pressure field rising linearly from its
  surface with gradient g = E / l, where l is the field's depth scale
  (a compliant sphere's field peaks E at its center -> l = radius; a
  compliant box peaks at its mid-plane -> l = half-thickness, e.g. the
  reference's Box(25,25,1) ground -> l = 0.5, mini_cheetah.py:98-101);
- two fields in contact meet where pressures are equal: series-combined
  gradient g_eff = g_a g_b / (g_a + g_b) (rigid -> g = inf passes the
  other through);
- integrating p = g_eff * depth over the circular patch of a sphere of
  radius r penetrating by phi (area ~ 2 pi r phi) gives the resultant
    fn = K * phi^2,   K = pi * r * g_eff
  up to an O(1) shape constant ``force_scale``.  K is precomputed per
  candidate pair at scene-build time (geometry.py).
- penetration is smoothed with a softplus of width ``smooth_width`` so a
  small gradient exists slightly before touchdown (gives the optimizer a
  'force at a distance' signal to discover contact sequences).
- Hunt-Crossley dissipation factor (1 - d * vn)+, smoothed.
- regularized Coulomb friction: -mu*fn * vt / sqrt(|vt|^2 + vs^2).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ContactForceParams(NamedTuple):
    """smooth_width controls the optimizability/physicality trade-off:
    wider = more force-at-a-distance signal for the optimizer to discover
    contact sequences (3e-3 lets iLQR find the cart-pole wall bounce in
    16 iterations where 1e-3 strands it in a no-bounce local optimum),
    narrower = crisper contact."""

    smooth_width: float = 3e-3      # [m] softplus width for penetration
    stiction_vel: float = 1e-3      # [m/s] friction regularization
    force_scale: float = 2.0        # O(1) patch-shape constant: fn =
                                    # force_scale * K * phi^2, K = pi r g


def smooth_penetration(phi: jax.Array, width: float) -> jax.Array:
    """softplus(phi/width)*width: ~phi when deep, smooth near 0."""
    return jax.nn.softplus(phi / width) * width


def smooth_relu(x: jax.Array, eps: float = 1e-3) -> jax.Array:
    return 0.5 * (x + jnp.sqrt(x * x + eps * eps))


def contact_forces_implicit(
    phi: jax.Array,      # (NC,) penetration at q (positive = contact)
    normal: jax.Array,   # (NC, 3) unit normal
    v_rel: jax.Array,    # (NC, 3) candidate contact-point velocity
    K: jax.Array,        # (NC,)
    d: jax.Array,        # (NC,)
    mu: jax.Array,       # (NC,)
    dt: float,
    params: ContactForceParams = ContactForceParams(),
    K1: jax.Array = None,  # (NC,) linear foundation stiffness (box faces)
):
    """Force with implicitly-predicted penetration phi' = phi - dt*(n.v),
    plus its exact Jacobian D = df/dv_rel (NC, 3, 3).

    This is the analytic derivative of ``contact_forces(phi - dt*vn, ...)``
    w.r.t. v_rel, used by the Newton contact solve in multibody/plant.py.
    An analytic D keeps the rollout scan's trace small: jacfwd of the
    residual re-traces the whole force path with nv-wide tangents at
    every Newton iteration of every timestep, and the rollout's per-step
    latency is the throughput wall of the batched MPC benchmark.

    Derivation (per contact, sigma = sqrt(|vt|^2 + vs^2), P = I - n n',
    b = dfn/dvn):
        D = (n - mu vt/sigma) b n' - (mu fn/sigma) P + (mu fn/sigma^3) vt vt'
    """
    w = params.smooth_width
    vs = params.stiction_vel
    s = params.force_scale
    vn = jnp.einsum("ci,ci->c", v_rel, normal)
    z = (phi - dt * vn) / w
    phi_s = jax.nn.softplus(z) * w
    sig = jax.nn.sigmoid(z)
    fn0 = s * K * phi_s * phi_s
    dfn0 = 2.0 * s * K * phi_s       # dfn0/dphi_s
    if K1 is not None:
        # linear elastic-foundation term: flat faces on compliant ground
        # carry pressure g*phi over a constant patch area (geometry.py bh
        # pairs), unlike spheres whose patch grows with phi
        fn0 = fn0 + K1 * phi_s
        dfn0 = dfn0 + K1
    eps = 1e-3  # smooth_relu default width
    xx = 1.0 - d * vn
    rt = jnp.sqrt(xx * xx + eps * eps)
    hc = 0.5 * (xx + rt)          # smooth_relu(1 - d vn)
    dhc = 0.5 * (1.0 + xx / rt)   # its derivative w.r.t. (1 - d vn)
    fn = fn0 * hc
    vt = v_rel - vn[:, None] * normal
    sigma = jnp.sqrt(jnp.einsum("ci,ci->c", vt, vt) + vs * vs)
    mu_over = mu * fn / sigma
    f = fn[:, None] * normal - mu_over[:, None] * vt

    b = -(dfn0 * sig * dt * hc + fn0 * dhc * d)
    vt_unit = vt / sigma[:, None]
    eye = jnp.eye(3, dtype=v_rel.dtype)
    P = eye[None] - normal[:, :, None] * normal[:, None, :]
    D = (
        (normal - mu[:, None] * vt_unit)[:, :, None]
        * (b[:, None] * normal)[:, None, :]
        - mu_over[:, None, None] * P
        + (mu_over / (sigma * sigma))[:, None, None]
        * (vt[:, :, None] * vt[:, None, :])
    )
    return f, D


def stiction_schedule(stiction_vel: float, contact_iters: int,
                      anneal: float = 4.0, vs_max: float = 5e-2):
    """Per-iteration friction-regularization widths for the implicit
    contact Newton solve: a CONTINUATION (homotopy) schedule annealing
    from a softened curve down to the true ``stiction_vel`` —
    [min(vs_max, vs * anneal^(n-1)), ..., vs * anneal, vs].

    Why: the regularized Coulomb force is extremely stiff inside
    |vt| < stiction_vel (slope ~ mu*fn/vs); full Newton steps on that
    curve overshoot the force reversal and ping-pong, so a light body
    held by several stiff contacts never converges (a tilted box
    settling on the ground gains energy).  Drake's TAMSI limits
    per-iteration tangential changes for this reason (Castro et al.
    2019).  Step-limiting rules were tried here first and REJECTED:
    any gate steep enough to resolve the stiction-vel-scale geometry
    amplifies f32 backend ulps (XLA vs Mosaic vs scalar) into
    percent-level rollout divergence between the twin step
    implementations, and blanket growth caps stall the solve under
    hard squeeze (kinova gripper pinning the ball: the root has
    ~0.2 m/s slip; a capped Newton never reached it, forces stayed
    tiny, and the ball sank 5 cm into the ground —
    tools/probe_kinova.py).  The continuation schedule instead softens
    the CURVE, not the step: early iterations see a wide, gentle
    friction profile whose Newton steps are well-behaved and guide the
    iterate into the basin; later iterations refine at progressively
    sharper widths; the final iteration solves the TRUE model, so the
    root (and the IFT derivatives evaluated there) are unchanged.  The
    schedule is static — the step map stays a fixed composition of
    smooth functions with no state-dependent gates, which is what keeps
    the scalar / lane-major / Pallas twins pinned to ~1e-5.
    """
    vs = float(stiction_vel)
    return [min(max(vs, vs_max), vs * anneal ** (contact_iters - 1 - it))
            for it in range(contact_iters)]


def contact_forces(
    phi: jax.Array,      # (NC,) penetration (positive = contact)
    normal: jax.Array,   # (NC, 3) unit normal (force on body A along +n)
    v_rel: jax.Array,    # (NC, 3) velocity of A's contact point rel. B
    K: jax.Array,        # (NC,) combined stiffness pi*r*g_eff [N/m^2]
    d: jax.Array,        # (NC,) combined Hunt-Crossley dissipation
    mu: jax.Array,       # (NC,) combined friction
    params: ContactForceParams = ContactForceParams(),
    K1: jax.Array = None,  # (NC,) linear foundation stiffness (box faces)
) -> jax.Array:
    """World-frame force on body A at each candidate contact: (NC, 3)."""
    phi_s = smooth_penetration(phi, params.smooth_width)
    vn = jnp.einsum("ci,ci->c", v_rel, normal)      # separation rate > 0
    fn = params.force_scale * K * phi_s * phi_s
    if K1 is not None:
        fn = fn + K1 * phi_s
    fn = fn * smooth_relu(1.0 - d * vn)
    vt = v_rel - vn[:, None] * normal
    vt_norm = jnp.sqrt(jnp.einsum("ci,ci->c", vt, vt) + params.stiction_vel**2)
    ft = -(mu * fn / vt_norm)[:, None] * vt
    return fn[:, None] * normal + ft
