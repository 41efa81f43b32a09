from drake_ddp_tpu.multibody.model import (
    FIXED,
    FREE,
    PRISMATIC,
    REVOLUTE,
    ModelBuilder,
    MultibodyModel,
)
from drake_ddp_tpu.multibody.algorithms import (
    dynamics_terms,
    forward_kinematics,
    integrate_positions,
    mass_matrix,
)
from drake_ddp_tpu.multibody.plant import make_multibody_system, multibody_step

__all__ = [
    "FIXED",
    "FREE",
    "PRISMATIC",
    "REVOLUTE",
    "ModelBuilder",
    "MultibodyModel",
    "dynamics_terms",
    "forward_kinematics",
    "integrate_positions",
    "mass_matrix",
    "make_multibody_system",
    "multibody_step",
]
