"""Host-side IO: URDF/SDF model loading, OBJ meshes, solution persistence.

Replaces the reference's use of Drake's Parser (SURVEY.md D5) and the
solver's npz persistence (reference ilqr.py:712-733).  Everything here
runs on the host at model-build time; the device only ever sees the
resulting static pytrees.
"""

from drake_ddp_tpu.io.mesh import approximate_spheres, load_obj_vertices
from drake_ddp_tpu.io.solution import load_solution, save_solution
from drake_ddp_tpu.io.urdf import UrdfRobot, add_urdf, parse_urdf

__all__ = [
    "UrdfRobot",
    "add_urdf",
    "approximate_spheres",
    "load_obj_vertices",
    "load_solution",
    "parse_urdf",
    "save_solution",
]
