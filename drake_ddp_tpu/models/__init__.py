"""Embedded robot models (reference models/ directory, SURVEY.md C10).

Robot model data is shipped as generated Python data modules
(tools/gen_model_data.py) rather than URDF/OBJ assets: numeric kinematic /
inertial / collision data in the framework's own schema, with meshes
pre-approximated to collision spheres.  ``io.urdf.parse_urdf`` remains the
loader for user-supplied URDF files.
"""

from drake_ddp_tpu.models.registry import (
    gripper_articulated,
    gripper_static,
    kinova_gen3,
    mini_cheetah,
    panda_fr3,
    robot_from_data,
)

__all__ = [
    "gripper_articulated",
    "gripper_static",
    "kinova_gen3",
    "mini_cheetah",
    "panda_fr3",
    "robot_from_data",
]
