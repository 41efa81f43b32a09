"""Multibody model description: a static kinematic tree + numeric pytree.

TPU-native replacement for Drake's ``MultibodyPlant`` model data
(reference SURVEY.md D2): topology (parents, joint types, index layouts)
is static Python data baked into the compiled program; inertial/geometric
numbers are JAX arrays (differentiable, batchable).

Conventions (matching Drake so reference example states transfer 1:1):
- bodies are topologically sorted, body 0's parent is the world (-1);
- generalized positions q: for a floating body, [qw qx qy qz, px py pz]
  (quaternion first, Drake order, e.g. mini_cheetah.py:41-46); revolute/
  prismatic joints contribute one q each, in body order;
- generalized velocities v: floating body contributes
  [wx wy wz, vx vy vz] — world-frame angular velocity then world-frame
  translational velocity of the body origin; 1-dof joints one v each;
- URDF child-link frames coincide with their joint frames.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Joint type codes (static)
FREE = 0
REVOLUTE = 1
PRISMATIC = 2
FIXED = 3

_NQ = {FREE: 7, REVOLUTE: 1, PRISMATIC: 1, FIXED: 0}
_NV = {FREE: 6, REVOLUTE: 1, PRISMATIC: 1, FIXED: 0}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MultibodyModel:
    """A rigid-body tree.  Static fields describe topology; array fields
    are per-body numeric data (a pytree, so the model itself can be
    vmapped/differentiated for e.g. system identification)."""

    # --- static topology (hashable, part of the jit cache key) ---
    parent: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    joint_type: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    q_start: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    v_start: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    nq: int = dataclasses.field(metadata=dict(static=True))
    nv: int = dataclasses.field(metadata=dict(static=True))
    nu: int = dataclasses.field(metadata=dict(static=True))
    # v-dof index actuated by each control input (length nu)
    actuated_vdof: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    body_names: Tuple[str, ...] = dataclasses.field(metadata=dict(static=True))

    # --- numeric data (pytree leaves) ---
    X_PJ_rot: jax.Array  # (nb, 3, 3) child-joint frame rotation in parent frame
    X_PJ_pos: jax.Array  # (nb, 3)    child-joint frame origin in parent frame
    axis: jax.Array      # (nb, 3)    joint axis in child frame (unit)
    mass: jax.Array      # (nb,)
    com: jax.Array       # (nb, 3)    center of mass in body frame
    inertia: jax.Array   # (nb, 3, 3) rotational inertia about com, body frame
    damping: jax.Array   # (nv,)      per-v-dof viscous damping
    armature: jax.Array  # (nv,)      reflected rotor inertia added to M's
                         #            diagonal (Drake drake:gear_ratio^2 *
                         #            drake:rotor_inertia, panda_fr3.urdf)
    gravity: jax.Array   # (3,)       world gravity vector (e.g. [0,0,-9.81])

    @property
    def nb(self) -> int:
        return len(self.parent)

    def default_q(self) -> np.ndarray:
        q = np.zeros(self.nq)
        for b, jt in enumerate(self.joint_type):
            if jt == FREE:
                q[self.q_start[b]] = 1.0  # identity quaternion (w first)
        return q

    def actuation_matrix(self) -> np.ndarray:
        """B (nv, nu): tau = B @ u (Drake MakeActuationMatrix analog)."""
        B = np.zeros((self.nv, self.nu))
        for i, vd in enumerate(self.actuated_vdof):
            B[vd, i] = 1.0
        return B


class ModelBuilder:
    """Host-side incremental tree builder (replaces Drake's plant-building
    API surface used by the examples: AddRigidBody/WeldFrames/...)."""

    def __init__(self, gravity=(0.0, 0.0, -9.81)):
        self._bodies = []
        self._gravity = np.asarray(gravity, np.float64)

    def add_body(
        self,
        name: str,
        parent: int,
        joint_type: int,
        X_PJ_rot=None,
        X_PJ_pos=None,
        axis=(0.0, 0.0, 1.0),
        mass: float = 0.0,
        com=(0.0, 0.0, 0.0),
        inertia=None,
        damping: float = 0.0,
        armature: float = 0.0,
        actuated: bool = False,
    ) -> int:
        """Add a body connected to ``parent`` (-1 = world).  Returns index."""
        assert parent < len(self._bodies)
        self._bodies.append(
            dict(
                name=name,
                parent=parent,
                joint_type=joint_type,
                X_PJ_rot=np.eye(3) if X_PJ_rot is None else np.asarray(X_PJ_rot, np.float64),
                X_PJ_pos=np.zeros(3) if X_PJ_pos is None else np.asarray(X_PJ_pos, np.float64),
                axis=np.asarray(axis, np.float64),
                mass=float(mass),
                com=np.asarray(com, np.float64),
                inertia=np.zeros((3, 3)) if inertia is None else np.asarray(inertia, np.float64),
                damping=float(damping),
                armature=float(armature),
                actuated=actuated,
            )
        )
        return len(self._bodies) - 1

    def finalize(self, dtype=jnp.float32) -> MultibodyModel:
        bodies = self._bodies
        nb = len(bodies)
        parent = tuple(b["parent"] for b in bodies)
        joint_type = tuple(b["joint_type"] for b in bodies)
        q_start, v_start = [], []
        nq = nv = 0
        for b in bodies:
            q_start.append(nq)
            v_start.append(nv)
            nq += _NQ[b["joint_type"]]
            nv += _NV[b["joint_type"]]
        actuated_vdof = tuple(
            v_start[i]
            for i, b in enumerate(bodies)
            if b["actuated"] and _NV[b["joint_type"]] == 1
        )
        damping = np.zeros(nv)
        armature = np.zeros(nv)
        for i, b in enumerate(bodies):
            if _NV[b["joint_type"]] == 1:
                damping[v_start[i]] = b["damping"]
                armature[v_start[i]] = b["armature"]
        return MultibodyModel(
            parent=parent,
            joint_type=joint_type,
            q_start=tuple(q_start),
            v_start=tuple(v_start),
            nq=nq,
            nv=nv,
            nu=len(actuated_vdof),
            actuated_vdof=actuated_vdof,
            body_names=tuple(b["name"] for b in bodies),
            X_PJ_rot=jnp.asarray(np.stack([b["X_PJ_rot"] for b in bodies]), dtype),
            X_PJ_pos=jnp.asarray(np.stack([b["X_PJ_pos"] for b in bodies]), dtype),
            axis=jnp.asarray(np.stack([b["axis"] for b in bodies]), dtype),
            mass=jnp.asarray(np.array([b["mass"] for b in bodies]), dtype),
            com=jnp.asarray(np.stack([b["com"] for b in bodies]), dtype),
            inertia=jnp.asarray(np.stack([b["inertia"] for b in bodies]), dtype),
            damping=jnp.asarray(damping, dtype),
            armature=jnp.asarray(armature, dtype),
            gravity=jnp.asarray(self._gravity, dtype),
        )


def ancestor_dof_mask(model: MultibodyModel) -> np.ndarray:
    """(nb, nv) static 0/1 mask: mask[b, k] = 1 iff v-dof k is on the path
    from the world to body b (used to build geometric Jacobians)."""
    nb, nv = model.nb, model.nv
    mask = np.zeros((nb, nv))
    for b in range(nb):
        i = b
        while i >= 0:
            s, n = model.v_start[i], _NV[model.joint_type[i]]
            mask[b, s:s + n] = 1.0
            i = model.parent[i]
    return mask


def vdof_body(model: MultibodyModel) -> np.ndarray:
    """(nv,) body index owning each v-dof."""
    out = np.zeros(model.nv, np.int64)
    for b in range(model.nb):
        s, n = model.v_start[b], _NV[model.joint_type[b]]
        out[s:s + n] = b
    return out
