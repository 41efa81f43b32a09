"""IO layer tests: URDF parsing, embedded model data, mesh spheres,
solution persistence (SURVEY.md §7 step 6; reference D5 + C1o)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from drake_ddp_tpu.contact.geometry import GeometrySet, build_contact_model
from drake_ddp_tpu.io.mesh import approximate_spheres
from drake_ddp_tpu.io.solution import load_solution, policy, save_solution
from drake_ddp_tpu.io.urdf import add_urdf, parse_urdf
from drake_ddp_tpu.models import (
    gripper_static,
    kinova_gen3,
    mini_cheetah,
    panda_fr3,
)
from drake_ddp_tpu.multibody.algorithms import dynamics_terms
from drake_ddp_tpu.multibody.model import ModelBuilder

REFERENCE = "/root/reference/models"

PENDULUM_URDF = """
<robot name="pend">
  <link name="base"/>
  <link name="arm">
    <inertial>
      <mass value="2.0"/>
      <origin xyz="0 0 -0.5" rpy="0 0 0"/>
      <inertia ixx="0.1" iyy="0.1" izz="0.01" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision>
      <geometry><sphere radius="0.05"/></geometry>
      <origin xyz="0 0 -1.0"/>
      <drake:proximity_properties>
        <drake:compliant_hydroelastic/>
        <drake:hydroelastic_modulus value="1e5"/>
        <drake:hunt_crossley_dissipation value="1.5"/>
      </drake:proximity_properties>
    </collision>
  </link>
  <joint name="shoulder" type="revolute">
    <parent link="base"/>
    <child link="arm"/>
    <origin xyz="0 0 1.0" rpy="0 0 0"/>
    <axis xyz="0 1 0"/>
    <dynamics damping="0.1"/>
  </joint>
  <transmission name="t1">
    <joint name="shoulder"/>
    <actuator name="a1">
      <drake:gear_ratio value="10.0"/>
      <drake:rotor_inertia value="0.001"/>
    </actuator>
  </transmission>
</robot>
"""


def test_parse_inline_urdf():
    r = parse_urdf(PENDULUM_URDF)
    assert r.root == "base"
    assert len(r.joints) == 1
    j = r.joints[0]
    assert j.actuated and j.damping == 0.1
    assert j.armature == pytest.approx(100 * 0.001)
    link = r.links["arm"]
    assert link.mass == 2.0
    assert np.allclose(link.com, [0, 0, -0.5])
    (c,) = link.collisions
    assert c.kind == "sphere" and c.props.modulus == 1e5
    assert c.props.dissipation == 1.5


def test_add_urdf_builds_model():
    mb = ModelBuilder()
    gs = GeometrySet()
    idx = add_urdf(mb, gs, parse_urdf(PENDULUM_URDF), floating=False)
    m = mb.finalize()
    assert m.nq == 1 and m.nv == 1 and m.nu == 1
    assert float(m.armature[0]) == pytest.approx(0.1)
    assert float(m.damping[0]) == pytest.approx(0.1)
    # sphere collision attached to the arm body
    assert len(gs.geoms) == 1 and gs.geoms[0].body == idx["arm"]
    # armature contributes to the mass matrix diagonal
    dyn = dynamics_terms(m, jnp.zeros(1), jnp.zeros(1))
    # point mass at 0.5 m: I = m l^2 + Ic_yy + armature
    assert float(dyn.M[0, 0]) == pytest.approx(2.0 * 0.25 + 0.1 + 0.1, rel=1e-5)


def test_inertia_rotated_into_link_frame():
    urdf = """
    <robot name="r"><link name="a">
      <inertial>
        <mass value="1.0"/>
        <origin xyz="0 0 0" rpy="0 0 1.5707963267948966"/>
        <inertia ixx="1.0" iyy="2.0" izz="3.0" ixy="0" ixz="0" iyz="0"/>
      </inertial>
    </link></robot>
    """
    r = parse_urdf(urdf)
    I = r.links["a"].inertia
    # 90 deg yaw swaps xx and yy
    assert np.allclose(np.diag(I), [2.0, 1.0, 3.0], atol=1e-9)


@pytest.mark.parametrize(
    "loader,floating,nq,nv,nu",
    [
        (mini_cheetah, True, 19, 18, 12),
        (kinova_gen3, False, 7, 7, 7),
        (panda_fr3, False, 7, 7, 7),
        (gripper_static, False, 0, 0, 0),
    ],
)
def test_embedded_models_dims(loader, floating, nq, nv, nu):
    """Per-example problem sizes match SURVEY.md §2.2."""
    mb = ModelBuilder()
    gs = GeometrySet()
    add_urdf(mb, gs, loader(), floating=floating)
    m = mb.finalize()
    assert (m.nq, m.nv, m.nu) == (nq, nv, nu)


def test_embedded_models_match_live_parse():
    """Embedded data modules agree with a live parse of the reference
    URDFs (provenance check; skipped when the reference isn't mounted)."""
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference models not available")
    pairs = [
        (mini_cheetah(), f"{REFERENCE}/mini_cheetah/mini_cheetah_mesh.urdf"),
        (kinova_gen3(), f"{REFERENCE}/kinova_gen3/urdf/GEN3_URDF_V12.urdf"),
        (panda_fr3(), f"{REFERENCE}/panda_fr3/urdf/panda_fr3.urdf"),
    ]
    for embedded, path in pairs:
        live = parse_urdf(path)
        assert set(embedded.links) == set(live.links)
        for name, l in live.links.items():
            e = embedded.links[name]
            assert e.mass == pytest.approx(l.mass, rel=1e-9)
            assert np.allclose(e.com, l.com)
            assert np.allclose(e.inertia, l.inertia)
        assert len(embedded.joints) == len(live.joints)
        for ej, lj in zip(embedded.joints, live.joints):
            assert ej.name == lj.name and ej.type == lj.type
            assert np.allclose(ej.origin_pos, lj.origin_pos)
            assert np.allclose(ej.axis, lj.axis)
            assert ej.actuated == lj.actuated
            assert ej.armature == pytest.approx(lj.armature)


def test_mini_cheetah_mass():
    """Total quadruped mass: 3.3 body + 4 legs x (0.54+0.634+0.064), toe
    links massless (mini_cheetah_mesh.urdf inertial tags)."""
    mb = ModelBuilder()
    add_urdf(mb, None, mini_cheetah(), floating=True)
    m = mb.finalize()
    total = float(jnp.sum(m.mass))
    assert total == pytest.approx(3.3 + 4 * (0.54 + 0.634 + 0.064),
                                  rel=1e-3)


def test_mesh_sphere_approx_covers_cloud():
    rng = np.random.default_rng(0)
    # elongated cloud along x
    verts = rng.normal(size=(500, 3)) * np.array([0.5, 0.05, 0.05])
    spheres = approximate_spheres(verts, max_spheres=4)
    assert 1 <= len(spheres) <= 4
    # every vertex inside at least one sphere (with tolerance)
    d = np.stack([
        np.linalg.norm(verts - c, axis=1) - r for c, r in spheres
    ])
    assert (d.min(axis=0) < 1e-6).all()
    # spheres are tighter than one big bounding sphere when elongated
    assert len(spheres) > 1
    assert max(r for _, r in spheres) < 1.0


def test_solution_roundtrip(tmp_path):
    n, m, N = 4, 2, 10
    rng = np.random.default_rng(1)
    x = rng.normal(size=(n, N))
    u = rng.normal(size=(m, N - 1))
    K = rng.normal(size=(m, n, N - 1))
    f = str(tmp_path / "sol.npz")
    save_solution(f, 0.01, x, u, K)
    sol = load_solution(f)
    # reference layout: t (N-1,), x_bar (n, N-1) last step dropped
    assert sol["t"].shape == (N - 1,)
    assert np.allclose(sol["t"][1] - sol["t"][0], 0.01)
    assert np.allclose(sol["x_bar"], x[:, :-1])
    assert np.allclose(sol["u_bar"], u)
    assert np.allclose(sol["K"], K)
    act = policy(sol)
    i = 3
    xq = rng.normal(size=n)
    assert np.allclose(act(i, xq),
                       u[:, i] - K[:, :, i] @ (xq - x[:, i]))


def test_collision_filters_applied():
    """Adjacent bodies and URDF filter groups produce no candidate
    pairs."""
    mb = ModelBuilder()
    gs = GeometrySet()
    add_urdf(mb, gs, kinova_gen3(), floating=False)
    mb.finalize()
    cm = build_contact_model(gs)
    if cm is None:
        return  # everything filtered: fine
    # no sphere-sphere pair between the same or adjacent bodies
    for a, b in zip(cm.pair_ss_a, cm.pair_ss_b):
        assert cm.sph_body[a] != cm.sph_body[b]


def test_urdf_capsule_parsing():
    """<capsule> and <drake:capsule> parse to capsule collisions whose
    sphere decomposition has exact endpoint caps."""
    from drake_ddp_tpu.io.urdf import parse_urdf
    from drake_ddp_tpu.contact.geometry import _decompose_to_spheres

    urdf = """
    <robot name="cap">
      <link name="base">
        <inertial><mass value="1.0"/>
          <inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/>
        </inertial>
        <collision><geometry><capsule radius="0.02" length="0.2"/></geometry></collision>
        <collision><geometry><drake:capsule radius="0.03" length="0.1"/></geometry></collision>
      </link>
    </robot>
    """
    r = parse_urdf(urdf)
    kinds = [(c.kind, tuple(c.size)) for c in r.links["base"].collisions]
    assert kinds == [("capsule", (0.02, 0.1)), ("capsule", (0.03, 0.05))]
