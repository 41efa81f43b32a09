"""Collision geometry: host-side scene description -> flat contact arrays.

TPU-native replacement for Drake's SceneGraph + hydroelastic engine
(SURVEY.md D3).  Design: every *body-attached* collision geometry is
decomposed into spheres (a sphere is itself; cylinders become a line of
spheres; boxes become corner spheres) so that all narrowphase tests are
sphere-vs-{halfspace, world box, sphere} — closed-form signed distances
that vectorize trivially.  World-fixed geometries (ground planes, walls)
stay analytic.

Pair enumeration and collision filtering (Drake's
CollisionFilterDeclaration, kinova_gen3.py:127-154) happen on the host at
model-build time; the device sees fixed-size arrays.
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SPHERE = "sphere"
BOX = "box"
CYLINDER = "cylinder"
CAPSULE = "capsule"
HALFSPACE = "halfspace"


@dataclasses.dataclass(frozen=True)
class ContactProps:
    """Hydroelastic-style material properties (per geometry).

    Mirrors the knobs the reference sets via Drake proximity properties
    (cart_pole_with_wall.py:46-49, kinova_gen3.py:91-96,
    mini_cheetah.py:78-80 and the drake: URDF tags):
        modulus: hydroelastic modulus E [Pa]; np.inf = rigid.
        dissipation: Hunt-Crossley dissipation [s/m].
        mu_static / mu_dynamic: Coulomb friction coefficients.
        resolution_hint: kept for parity (unused by the smooth model).
    """

    modulus: float = 5e6
    dissipation: float = 0.0
    mu_static: float = 0.6
    mu_dynamic: float = 0.5
    resolution_hint: float = 0.05


@dataclasses.dataclass(frozen=True)
class CollisionGeometry:
    """One collision geometry, attached to a body or the world (body=-1)."""

    body: int
    kind: str                      # sphere | box | cylinder | halfspace
    pos: np.ndarray                # offset in body frame (world frame if body=-1)
    rot: np.ndarray                # 3x3 orientation in body frame
    size: np.ndarray               # sphere: [r]; box: [hx,hy,hz] (half);
                                   # cylinder: [r, half_length] (axis=z);
                                   # halfspace: unused (normal = rot @ z)
    props: ContactProps = ContactProps()
    name: str = ""


class GeometrySet:
    """Host-side scene: add geometries, filter pairs, build device arrays."""

    def __init__(self):
        self.geoms: List[CollisionGeometry] = []
        self._filtered: List[Tuple[int, int]] = []   # excluded geometry pairs
        self._filtered_bodies: List[Tuple[int, int]] = []

    def add(self, geom: CollisionGeometry) -> int:
        self.geoms.append(geom)
        return len(self.geoms) - 1

    def exclude_pair(self, gi: int, gj: int):
        self._filtered.append((min(gi, gj), max(gi, gj)))

    def exclude_body_pair(self, bi: int, bj: int):
        """Collision filter between two bodies (Drake ExcludeBetween)."""
        self._filtered_bodies.append((min(bi, bj), max(bi, bj)))


def _decompose_to_spheres(g: CollisionGeometry):
    """Approximate a body-attached geometry by spheres in the body frame.

    Returns list of (offset (3,), radius, pressure_length).  The pressure
    length l is the depth scale of the geometry's hydroelastic field
    (forces.py): its own radius for a sphere/cylinder, min half-extent
    for a box.  Cylinder: spheres of the cylinder radius along the axis;
    box: 8 corner spheres of radius min(half)/2 inset so they inscribe
    the box faces approximately.
    """
    if g.kind == SPHERE:
        return [(g.pos, float(g.size[0]), float(g.size[0]))]
    if g.kind == CYLINDER:
        r, hl = float(g.size[0]), float(g.size[1])
        n = max(2, int(np.ceil(2 * hl / max(r, 1e-6))) + 1)
        n = min(n, 6)
        zs = np.linspace(-max(hl - r, 0.0), max(hl - r, 0.0), n)
        axis = g.rot @ np.array([0.0, 0.0, 1.0])
        return [(g.pos + z * axis, r, r) for z in zs]
    if g.kind == CAPSULE:
        # A capsule IS a sphere-swept segment: endpoint spheres are exact
        # at the caps; intermediates cover the cylindrical side.
        r, hl = float(g.size[0]), float(g.size[1])
        n = min(max(2, int(np.ceil(2 * hl / max(r, 1e-6))) + 1), 6)
        zs = np.linspace(-hl, hl, n)
        axis = g.rot @ np.array([0.0, 0.0, 1.0])
        return [(g.pos + z * axis, r, r) for z in zs]
    raise ValueError(f"cannot decompose {g.kind} attached to a body")


class ContactModel(NamedTuple):
    """Flat device-side contact arrays (all leading dims static).

    Spheres (body-attached): ns entries.  World primitives: halfspaces
    (nh) and boxes (nb_box).  Candidate pairs are precomputed index
    arrays; per-pair stiffness K = pi * r * g_eff with series-combined
    pressure gradients g = E/l (rigid = inf passes the other through) —
    see forces.py for the derivation.
    """

    # body spheres
    sph_body: Tuple[int, ...]      # static, len ns
    sph_offset: jax.Array          # (ns, 3) body frame
    sph_radius: jax.Array          # (ns,)
    # world halfspaces: x . normal >= offset is outside
    hs_normal: jax.Array           # (nh, 3)
    hs_offset: jax.Array           # (nh,)
    # boxes: world-fixed (box_body = -1, pose in world frame) or
    # body-attached (pose in the body frame)
    box_body: Tuple[int, ...]      # static, len nbx
    box_rot: jax.Array             # (nbx, 3, 3)
    box_pos: jax.Array             # (nbx, 3)
    box_half: jax.Array            # (nbx, 3)
    # world spheres (fixed obstacles)
    ws_pos: jax.Array              # (nws, 3)
    ws_radius: jax.Array           # (nws,)
    # pairs: sphere-halfspace
    pair_sh_s: Tuple[int, ...]
    pair_sh_h: Tuple[int, ...]
    sh_K: jax.Array
    sh_d: jax.Array
    sh_mu: jax.Array
    # pairs: sphere-box
    pair_sb_s: Tuple[int, ...]
    pair_sb_b: Tuple[int, ...]
    sb_K: jax.Array
    sb_d: jax.Array
    sb_mu: jax.Array
    # pairs: sphere-sphere
    pair_ss_a: Tuple[int, ...]
    pair_ss_b: Tuple[int, ...]
    ss_K: jax.Array
    ss_d: jax.Array
    ss_mu: jax.Array
    # pairs: body sphere vs world sphere
    pair_sw_s: Tuple[int, ...]
    pair_sw_w: Tuple[int, ...]
    sw_K: jax.Array
    sw_d: jax.Array
    sw_mu: jax.Array
    # pairs: body box face vs world halfspace (8 corner contacts per pair;
    # elastic-foundation LINEAR law, see narrowphase)
    pair_bh_b: Tuple[int, ...]
    pair_bh_h: Tuple[int, ...]
    bh_g: jax.Array                # series-combined pressure gradient
    bh_d: jax.Array
    bh_mu: jax.Array
    # pairs: box face vs BODY SPHERE (8 corner contacts per pair;
    # elastic-foundation LINEAR law) — the opt-in pad-face patch model
    # for finger-pad-on-ball contacts, replacing the single
    # closest-point sb contact when
    # build_contact_model(box_face_quadrature=True).  Same construction
    # as bh: corner quadrature of the pressure field with tributary
    # area A_proj(R)/4, softplus killing far-side corners.
    pair_bs_b: Tuple[int, ...] = ()
    pair_bs_s: Tuple[int, ...] = ()
    bs_g: jax.Array = None
    bs_d: jax.Array = None
    bs_mu: jax.Array = None

    @property
    def num_contacts(self) -> int:
        return (len(self.pair_sh_s) + len(self.pair_sb_s)
                + len(self.pair_ss_a) + len(self.pair_sw_s)
                + 8 * len(self.pair_bh_b) + 8 * len(self.pair_bs_b))

    @property
    def lane_kernel_supported(self) -> bool:
        """The lane-major / Pallas contact twins
        (multibody/lanestep._narrowphase_T) cover every pair type this
        model can hold (sh, sb incl. body boxes, ss, sw, bh, bs)."""
        return True


def _combine(pa: ContactProps, la: float, pb: ContactProps, lb: float,
             r_patch: float):
    """Per-pair force constants (forces.py law): series-combined pressure
    gradients g = E/l -> K = pi * r_patch * g_eff, plus Drake's
    dissipation-sum and harmonic-friction rules."""
    ga = np.inf if np.isinf(pa.modulus) else pa.modulus / max(la, 1e-9)
    gb = np.inf if np.isinf(pb.modulus) else pb.modulus / max(lb, 1e-9)
    if np.isinf(ga) and np.isinf(gb):
        g = 1e10  # rigid-rigid: huge but finite (Drake would reject)
    elif np.isinf(ga):
        g = gb
    elif np.isinf(gb):
        g = ga
    else:
        g = ga * gb / (ga + gb)
    K = np.pi * r_patch * g
    d = pa.dissipation + pb.dissipation
    # Drake's CoulombFriction combination rule: 2 mu_a mu_b / (mu_a + mu_b)
    ma, mb = max(pa.mu_dynamic, 1e-8), max(pb.mu_dynamic, 1e-8)
    mu = 2.0 * ma * mb / (ma + mb)
    return K, d, mu


HALFSPACE_PRESSURE_DEPTH = 0.5
"""Default pressure-field depth scale of a compliant world halfspace [m]
(the reference grounds are Box(25,25,1) -> mid-plane depth 0.5,
mini_cheetah.py:98-101, kinova_gen3.py:163-166).  Override per geometry
by putting the depth in the halfspace's size[0]."""


def _series_gradient(pa: ContactProps, la: float, pb: ContactProps, lb: float):
    """Series-combined pressure gradient (no patch factor) + d/mu rules."""
    ga = np.inf if np.isinf(pa.modulus) else pa.modulus / max(la, 1e-9)
    gb = np.inf if np.isinf(pb.modulus) else pb.modulus / max(lb, 1e-9)
    if np.isinf(ga) and np.isinf(gb):
        g = 1e10
    elif np.isinf(ga):
        g = gb
    elif np.isinf(gb):
        g = ga
    else:
        g = ga * gb / (ga + gb)
    d = pa.dissipation + pb.dissipation
    ma, mb = max(pa.mu_dynamic, 1e-8), max(pb.mu_dynamic, 1e-8)
    mu = 2.0 * ma * mb / (ma + mb)
    return g, d, mu


def build_contact_model(gs: GeometrySet, dtype=jnp.float32,
                        box_face_quadrature: bool = False,
                        ) -> Optional[ContactModel]:
    """Decompose, enumerate filtered candidate pairs, build arrays.

    ``box_face_quadrature``: route body-box-vs-sphere candidates to the
    8-corner elastic-foundation patch model (bs pairs) instead of the
    single closest-point contact (sb pairs) — Drake-style pressure
    integration over the pad face for finger-pad contacts.  Default off
    (the calibrated point model; flipping changes force distribution
    and therefore recorded goldens)."""
    spheres = []      # (body, offset, radius, props, src_geom_idx, ell)
    halfspaces = []   # (normal, offset, props, src, ell)
    boxes = []        # (body, rot, pos, half, props, src, ell)
    wspheres = []     # (pos, radius, props, src)
    for gi, g in enumerate(gs.geoms):
        if g.body < 0:
            if g.kind == HALFSPACE:
                n = g.rot @ np.array([0.0, 0.0, 1.0])
                ell = float(g.size[0]) if float(g.size[0]) > 0 else \
                    HALFSPACE_PRESSURE_DEPTH
                halfspaces.append((n, float(n @ g.pos), g.props, gi, ell))
            elif g.kind == BOX:
                boxes.append((-1, g.rot, g.pos, g.size.astype(float),
                              g.props, gi, float(np.min(g.size))))
            elif g.kind == SPHERE:
                wspheres.append((np.asarray(g.pos, float),
                                 float(g.size[0]), g.props, gi))
            else:
                raise ValueError(f"unsupported world geometry {g.kind}")
        elif g.kind == BOX:
            # Body-attached boxes stay analytic: face contact vs halfspaces
            # (bh pairs) and closest-point contact vs spheres (sb pairs) —
            # a flat face resting on compliant ground carries the full
            # elastic-foundation load (reference kinova_gen3.py:156-206).
            boxes.append((g.body, g.rot, g.pos, g.size.astype(float),
                          g.props, gi, float(np.min(g.size))))
        else:
            for off, r, ell in _decompose_to_spheres(g):
                spheres.append((g.body, np.asarray(off, float), float(r),
                                g.props, gi, ell))

    filt = set(gs._filtered)
    bfilt = set(gs._filtered_bodies)

    def filtered(src_i, src_j, body_i, body_j):
        key = (min(src_i, src_j), max(src_i, src_j))
        bkey = (min(body_i, body_j), max(body_i, body_j))
        return key in filt or bkey in bfilt

    pair_sh, pair_sb, pair_ss, pair_sw, pair_bh = [], [], [], [], []
    pair_bs = []
    for si, (b, off, r, props, src, ell) in enumerate(spheres):
        for hi, (n, o, hprops, hsrc, hell) in enumerate(halfspaces):
            if not filtered(src, hsrc, b, -1):
                pair_sh.append((si, hi, *_combine(props, ell, hprops, hell, r)))
        for bi, (bbody, R, p, half, bprops, bsrc, bell) in enumerate(boxes):
            if bbody != b and not filtered(src, bsrc, b, bbody):
                if box_face_quadrature and bbody >= 0:
                    pair_bs.append((bi, si, *_series_gradient(
                        bprops, bell, props, ell)))
                else:
                    pair_sb.append((si, bi, *_combine(props, ell, bprops,
                                                      bell, r)))
        for wi, (wp, wr, wprops, wsrc) in enumerate(wspheres):
            if not filtered(src, wsrc, b, -1):
                r_eff = r * wr / (r + wr)
                pair_sw.append((si, wi, *_combine(props, ell, wprops, wr, r_eff)))
    for si in range(len(spheres)):
        for sj in range(si + 1, len(spheres)):
            bi, bj = spheres[si][0], spheres[sj][0]
            if bi == bj:
                continue
            if filtered(spheres[si][4], spheres[sj][4], bi, bj):
                continue
            ra, rb = spheres[si][2], spheres[sj][2]
            r_eff = ra * rb / (ra + rb)   # Hertz effective radius
            pair_ss.append((si, sj, *_combine(
                spheres[si][3], spheres[si][5],
                spheres[sj][3], spheres[sj][5], r_eff)))
    for bi, (bbody, R, p, half, bprops, bsrc, bell) in enumerate(boxes):
        if bbody < 0:
            continue
        for hi, (n, o, hprops, hsrc, hell) in enumerate(halfspaces):
            if not filtered(bsrc, hsrc, bbody, -1):
                pair_bh.append((bi, hi, *_series_gradient(
                    bprops, bell, hprops, hell)))

    if not (pair_sh or pair_sb or pair_ss or pair_sw or pair_bh
            or pair_bs):
        return None

    def arr(x, d=dtype):
        return jnp.asarray(np.asarray(x, float), d)

    return ContactModel(
        sph_body=tuple(s[0] for s in spheres),
        sph_offset=arr([s[1] for s in spheres]) if spheres else jnp.zeros((0, 3), dtype),
        sph_radius=arr([s[2] for s in spheres]) if spheres else jnp.zeros((0,), dtype),
        hs_normal=arr([h[0] for h in halfspaces]) if halfspaces else jnp.zeros((0, 3), dtype),
        hs_offset=arr([h[1] for h in halfspaces]) if halfspaces else jnp.zeros((0,), dtype),
        box_body=tuple(b[0] for b in boxes),
        box_rot=arr([b[1] for b in boxes]) if boxes else jnp.zeros((0, 3, 3), dtype),
        box_pos=arr([b[2] for b in boxes]) if boxes else jnp.zeros((0, 3), dtype),
        box_half=arr([b[3] for b in boxes]) if boxes else jnp.zeros((0, 3), dtype),
        ws_pos=arr([w[0] for w in wspheres]) if wspheres else jnp.zeros((0, 3), dtype),
        ws_radius=arr([w[1] for w in wspheres]) if wspheres else jnp.zeros((0,), dtype),
        pair_sh_s=tuple(p[0] for p in pair_sh),
        pair_sh_h=tuple(p[1] for p in pair_sh),
        sh_K=arr([p[2] for p in pair_sh]),
        sh_d=arr([p[3] for p in pair_sh]),
        sh_mu=arr([p[4] for p in pair_sh]),
        pair_sb_s=tuple(p[0] for p in pair_sb),
        pair_sb_b=tuple(p[1] for p in pair_sb),
        sb_K=arr([p[2] for p in pair_sb]),
        sb_d=arr([p[3] for p in pair_sb]),
        sb_mu=arr([p[4] for p in pair_sb]),
        pair_ss_a=tuple(p[0] for p in pair_ss),
        pair_ss_b=tuple(p[1] for p in pair_ss),
        ss_K=arr([p[2] for p in pair_ss]),
        ss_d=arr([p[3] for p in pair_ss]),
        ss_mu=arr([p[4] for p in pair_ss]),
        pair_sw_s=tuple(p[0] for p in pair_sw),
        pair_sw_w=tuple(p[1] for p in pair_sw),
        sw_K=arr([p[2] for p in pair_sw]),
        sw_d=arr([p[3] for p in pair_sw]),
        sw_mu=arr([p[4] for p in pair_sw]),
        pair_bh_b=tuple(p[0] for p in pair_bh),
        pair_bh_h=tuple(p[1] for p in pair_bh),
        bh_g=arr([p[2] for p in pair_bh]),
        bh_d=arr([p[3] for p in pair_bh]),
        bh_mu=arr([p[4] for p in pair_bh]),
        pair_bs_b=tuple(p[0] for p in pair_bs),
        pair_bs_s=tuple(p[1] for p in pair_bs),
        bs_g=arr([p[2] for p in pair_bs]),
        bs_d=arr([p[3] for p in pair_bs]),
        bs_mu=arr([p[4] for p in pair_bs]),
    )


def narrowphase(cm: ContactModel, sph_center_w: jax.Array,
                body_R: Optional[jax.Array] = None,
                body_p: Optional[jax.Array] = None):
    """Signed distances for all candidate pairs.

    Args:
        cm: contact model.
        sph_center_w: (ns, 3) world centers of all body spheres.
        body_R: (nb, 3, 3) world rotations of all bodies — required when
            the model has body-attached boxes.
        body_p: (nb, 3) world positions of all bodies.
    Returns:
        phi: (NC,) penetration depth (positive = overlapping),
        normal: (NC, 3) unit normal pointing from geometry B into body A
            (force on A acts along +normal),
        point: (NC, 3) world contact point,
        body_a: tuple of body indices (sphere/box owner),
        body_b: tuple (-1 for world geometry, else sphere/box owner),
        K: (NC,) quadratic stiffness pi*r*g_eff (0 for face contacts),
        K1: (NC,) linear elastic-foundation stiffness g_eff*A_trib
            (0 for sphere contacts, whose patch area grows with phi),
        d, mu: (NC,) combined per-pair dissipation / friction (forces.py).
    """
    phis, normals, points = [], [], []
    body_a: List[int] = []
    body_b: List[int] = []
    Ks, K1s, ds, mus = [], [], [], []
    dtype = sph_center_w.dtype

    # world poses of all boxes (static boxes are constants)
    if any(b >= 0 for b in cm.box_body):
        box_R_w = jnp.stack([
            body_R[b] @ cm.box_rot[i] if b >= 0 else cm.box_rot[i]
            for i, b in enumerate(cm.box_body)])
        box_p_w = jnp.stack([
            body_p[b] + body_R[b] @ cm.box_pos[i] if b >= 0 else cm.box_pos[i]
            for i, b in enumerate(cm.box_body)])
    else:
        box_R_w, box_p_w = cm.box_rot, cm.box_pos

    if cm.pair_sh_s:
        s = jnp.asarray(cm.pair_sh_s)
        h = jnp.asarray(cm.pair_sh_h)
        c = sph_center_w[s]
        n = cm.hs_normal[h]
        r = cm.sph_radius[s]
        dist = jnp.einsum("ci,ci->c", c, n) - cm.hs_offset[h]
        phi = r - dist
        phis.append(phi)
        normals.append(n)
        points.append(c - (dist - 0.5 * phi)[:, None] * n)
        body_a += [cm.sph_body[i] for i in cm.pair_sh_s]
        body_b += [-1] * len(cm.pair_sh_s)
        Ks.append(cm.sh_K); ds.append(cm.sh_d); mus.append(cm.sh_mu)
        K1s.append(jnp.zeros_like(cm.sh_K))

    if cm.pair_sb_s:
        s = jnp.asarray(cm.pair_sb_s)
        b = jnp.asarray(cm.pair_sb_b)
        c = sph_center_w[s]
        R = box_R_w[b]
        local = jnp.einsum("cji,cj->ci", R, c - box_p_w[b])
        half = cm.box_half[b]
        clamped = jnp.clip(local, -half, half)
        # outside: vector from closest surface point to center
        delta = local - clamped
        dist_out = jnp.linalg.norm(delta, axis=-1)
        # inside: distance to the nearest face (negative signed distance)
        inside_gap = half - jnp.abs(local)           # (c,3) >= 0 inside
        min_gap = jnp.min(inside_gap, axis=-1)
        inside = dist_out < 1e-9
        # normal: outside = delta/dist; inside = axis of smallest gap
        axis_idx = jnp.argmin(inside_gap, axis=-1)
        sign = jnp.sign(jnp.take_along_axis(local, axis_idx[:, None], -1))[:, 0]
        n_local_in = jax.nn.one_hot(axis_idx, 3, dtype=c.dtype) * sign[:, None]
        n_local_out = delta / jnp.maximum(dist_out, 1e-9)[:, None]
        n_local = jnp.where(inside[:, None], n_local_in, n_local_out)
        sd = jnp.where(inside, -min_gap, dist_out)   # signed distance center->box
        r = cm.sph_radius[s]
        phi = r - sd
        n_w = jnp.einsum("cij,cj->ci", R, n_local)
        p_w = c - (sd - 0.5 * phi)[:, None] * n_w
        phis.append(phi)
        normals.append(n_w)
        points.append(p_w)
        body_a += [cm.sph_body[i] for i in cm.pair_sb_s]
        body_b += [cm.box_body[i] for i in cm.pair_sb_b]
        Ks.append(cm.sb_K); ds.append(cm.sb_d); mus.append(cm.sb_mu)
        K1s.append(jnp.zeros_like(cm.sb_K))

    if cm.pair_ss_a:
        a = jnp.asarray(cm.pair_ss_a)
        bb = jnp.asarray(cm.pair_ss_b)
        ca, cb = sph_center_w[a], sph_center_w[bb]
        ra, rb = cm.sph_radius[a], cm.sph_radius[bb]
        dvec = ca - cb
        dist = jnp.linalg.norm(dvec, axis=-1)
        n = dvec / jnp.maximum(dist, 1e-9)[:, None]
        phi = (ra + rb) - dist
        p = cb + (rb - 0.5 * phi)[:, None] * n
        phis.append(phi)
        normals.append(n)
        points.append(p)
        body_a += [cm.sph_body[i] for i in cm.pair_ss_a]
        body_b += [cm.sph_body[i] for i in cm.pair_ss_b]
        Ks.append(cm.ss_K); ds.append(cm.ss_d); mus.append(cm.ss_mu)
        K1s.append(jnp.zeros_like(cm.ss_K))

    if cm.pair_sw_s:
        s = jnp.asarray(cm.pair_sw_s)
        w = jnp.asarray(cm.pair_sw_w)
        ca, cw = sph_center_w[s], cm.ws_pos[w]
        ra, rw = cm.sph_radius[s], cm.ws_radius[w]
        dvec = ca - cw
        dist = jnp.linalg.norm(dvec, axis=-1)
        n = dvec / jnp.maximum(dist, 1e-9)[:, None]
        phi = (ra + rw) - dist
        p = cw + (rw - 0.5 * phi)[:, None] * n
        phis.append(phi)
        normals.append(n)
        points.append(p)
        body_a += [cm.sph_body[i] for i in cm.pair_sw_s]
        body_b += [-1] * len(cm.pair_sw_s)
        Ks.append(cm.sw_K); ds.append(cm.sw_d); mus.append(cm.sw_mu)
        K1s.append(jnp.zeros_like(cm.sw_K))

    if cm.pair_bh_b:
        # Box face vs halfspace: 8 corner point-contacts per pair.  The
        # hydroelastic pressure over the submerged face is linear in
        # position, so a corner quadrature with tributary area
        # A_proj(R)/4 integrates it exactly for a fully-contacting face
        # (A_proj = the box silhouette area projected on the plane; the
        # /4 normalizes the flat-resting case where 4 corners carry the
        # load — deep full submersion, where all 8 would, is outside the
        # model's regime).  Corner penetrations of the far face sit a
        # box-thickness above the plane, so their softplus force vanishes
        # smoothly — no face-selection branch, fully differentiable.
        b = jnp.asarray(cm.pair_bh_b)
        h = jnp.asarray(cm.pair_bh_h)
        Rw = box_R_w[b]                               # (c, 3, 3)
        pw = box_p_w[b]
        half = cm.box_half[b]                         # (c, 3)
        n = cm.hs_normal[h]                           # (c, 3)
        off = cm.hs_offset[h]
        signs = jnp.asarray(np.array(
            [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
             for sz in (-1, 1)], np.float32), dtype)  # (8, 3)
        corners_l = signs[None] * half[:, None]       # (c, 8, 3)
        corners_w = pw[:, None] + jnp.einsum("cij,ckj->cki", Rw, corners_l)
        phi = off[:, None] - jnp.einsum("cki,ci->ck", corners_w, n)  # (c, 8)
        # silhouette area of the box projected along the plane normal
        hx, hy, hz = half[:, 0], half[:, 1], half[:, 2]
        nb_ax = jnp.abs(jnp.einsum("ci,cij->cj", n, Rw))  # |n . box axes|
        a_proj = 4.0 * (hy * hz * nb_ax[:, 0] + hx * hz * nb_ax[:, 1]
                        + hx * hy * nb_ax[:, 2])
        K1 = (cm.bh_g * a_proj / 4.0)[:, None].repeat(8, 1)
        nc8 = 8 * len(cm.pair_bh_b)
        phis.append(phi.reshape(nc8))
        normals.append(jnp.repeat(n, 8, axis=0))
        points.append(corners_w.reshape(nc8, 3))
        body_a += [cm.box_body[i] for i in cm.pair_bh_b for _ in range(8)]
        body_b += [-1] * nc8
        Ks.append(jnp.zeros(nc8, dtype))
        K1s.append(K1.reshape(nc8))
        ds.append(jnp.repeat(cm.bh_d, 8))
        mus.append(jnp.repeat(cm.bh_mu, 8))

    if cm.pair_bs_b:
        # Box face vs body sphere: the bh corner quadrature transplanted
        # to a spherical "ground": phi = r_s - |corner - c| (corner
        # inside the sphere = penetration), normal = (corner - c)/|..|
        # (the sphere pushes the box radially outward), tributary area =
        # the box silhouette projected along the box->sphere direction
        # / 4.  Far-side corners sit ~2 half-thicknesses further out, so
        # their softplus force vanishes smoothly — no face selection.
        b = jnp.asarray(cm.pair_bs_b)
        s = jnp.asarray(cm.pair_bs_s)
        Rw = box_R_w[b]
        pw = box_p_w[b]
        half = cm.box_half[b]
        c = sph_center_w[s]
        r = cm.sph_radius[s]
        dirv = c - pw
        nbar = dirv / jnp.maximum(
            jnp.linalg.norm(dirv, axis=-1), 1e-9)[:, None]
        nb_ax = jnp.abs(jnp.einsum("ci,cij->cj", nbar, Rw))
        hx, hy, hz = half[:, 0], half[:, 1], half[:, 2]
        a_proj = 4.0 * (hy * hz * nb_ax[:, 0] + hx * hz * nb_ax[:, 1]
                        + hx * hy * nb_ax[:, 2])
        K1 = (cm.bs_g * a_proj / 4.0)[:, None].repeat(8, 1)
        signs = jnp.asarray(np.array(
            [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
             for sz in (-1, 1)], np.float32), dtype)
        corners_l = signs[None] * half[:, None]
        corners_w = pw[:, None] + jnp.einsum("cij,ckj->cki", Rw, corners_l)
        delta = corners_w - c[:, None]
        dist = jnp.linalg.norm(delta, axis=-1)          # (c, 8)
        nrm = delta / jnp.maximum(dist, 1e-9)[..., None]
        phi = r[:, None] - dist
        nc8 = 8 * len(cm.pair_bs_b)
        phis.append(phi.reshape(nc8))
        normals.append(nrm.reshape(nc8, 3))
        points.append(corners_w.reshape(nc8, 3))
        body_a += [cm.box_body[i] for i in cm.pair_bs_b for _ in range(8)]
        body_b += [cm.sph_body[i] for i in cm.pair_bs_s for _ in range(8)]
        Ks.append(jnp.zeros(nc8, dtype))
        K1s.append(K1.reshape(nc8))
        ds.append(jnp.repeat(cm.bs_d, 8))
        mus.append(jnp.repeat(cm.bs_mu, 8))

    return (
        jnp.concatenate(phis),
        jnp.concatenate(normals),
        jnp.concatenate(points),
        tuple(body_a),
        tuple(body_b),
        jnp.concatenate(Ks),
        jnp.concatenate(K1s),
        jnp.concatenate(ds),
        jnp.concatenate(mus),
    )
