"""Native meshproc library vs the Python reference implementation."""

import os

import numpy as np
import pytest

from drake_ddp_tpu.io.mesh import approximate_spheres, load_obj_vertices
from drake_ddp_tpu.native import load_meshproc, sphere_cover

OBJ = "/root/reference/models/kinova_gen3/meshes/base_link_simple.obj"


def test_native_builds_and_loads():
    lib = load_meshproc()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    assert hasattr(lib, "meshproc_sphere_cover")


def test_native_matches_python_reference():
    if load_meshproc() is None:
        pytest.skip("no C++ toolchain available")
    if not os.path.exists(OBJ):
        pytest.skip("reference meshes not available")
    native = sphere_cover(OBJ, 1.0, 4)
    assert native is not None
    verts = load_obj_vertices(OBJ)
    python = approximate_spheres(verts, 4)
    assert len(native) == len(python)
    for (cn, rn), (cp, rp) in zip(native, python):
        # same algorithm; axis sign may differ from eigh vs power
        # iteration, so compare as sets of spheres
        pass
    pc = sorted((tuple(np.round(c, 6)), round(r, 6)) for c, r in python)
    nc = sorted((tuple(np.round(c, 6)), round(r, 6)) for c, r in native)
    for (cp, rp), (cn, rn) in zip(pc, nc):
        assert rp == pytest.approx(rn, rel=1e-3)
        assert np.allclose(cp, cn, atol=1e-3)
    # every vertex covered
    for c, r in native:
        pass
    d = np.stack([np.linalg.norm(verts - c, axis=1) - r for c, r in native])
    assert (d.min(axis=0) < 1e-6).all()


def test_native_missing_file_returns_none():
    if load_meshproc() is None:
        pytest.skip("no C++ toolchain available")
    assert sphere_cover("/nonexistent/file.obj") is None
