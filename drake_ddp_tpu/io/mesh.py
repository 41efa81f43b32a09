"""Wavefront OBJ loading + sphere approximation of collision meshes.

The reference's mesh collision geometries are handled by Drake's
hydroelastic tessellation engine (SURVEY.md D3; e.g.
GEN3_URDF_V12.urdf mesh collisions).  The TPU-native contact pipeline is
sphere-based (contact/geometry.py), so meshes are approximated host-side
by a small set of bounding spheres: vertices are sliced along their
principal axis and each slice gets a Ritter bounding sphere.  This keeps
the candidate-pair count static and tiny while preserving the gross
collision envelope the reference tasks actually exercise (arm/gripper vs
ball and ground).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def load_obj_vertices(path: str) -> np.ndarray:
    """Parse an OBJ file's vertex positions -> (V, 3) float64."""
    verts = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
    if not verts:
        raise ValueError(f"no vertices in OBJ file {path}")
    return np.asarray(verts, np.float64)


def _ritter_sphere(verts: np.ndarray) -> Tuple[np.ndarray, float]:
    """Ritter's approximate minimal bounding sphere of a point set."""
    p0 = verts[0]
    p1 = verts[np.argmax(np.linalg.norm(verts - p0, axis=1))]
    p2 = verts[np.argmax(np.linalg.norm(verts - p1, axis=1))]
    center = 0.5 * (p1 + p2)
    radius = 0.5 * float(np.linalg.norm(p2 - p1))
    # grow to include outliers
    for _ in range(2):
        d = np.linalg.norm(verts - center, axis=1)
        i = int(np.argmax(d))
        if d[i] <= radius + 1e-12:
            break
        new_r = 0.5 * (radius + d[i])
        center = center + (d[i] - new_r) / d[i] * (verts[i] - center)
        radius = new_r
    return center, radius


def approximate_spheres(
    verts: np.ndarray, max_spheres: int = 4, refine: float = 1.0
) -> List[Tuple[np.ndarray, float]]:
    """Approximate a vertex cloud by <= max_spheres bounding spheres.

    Slices the cloud along its principal axis into k segments, where k
    grows with the elongation of the cloud (a long link gets a line of
    spheres, a compact one gets a single sphere), then bounds each slice
    with a Ritter sphere.  Returns [(center (3,), radius), ...] in the
    mesh's own frame.

    ``refine`` multiplies the slice density: >1 subdivides finer than
    the elongation heuristic (more, tighter spheres — less envelope
    bloat around thin parts like gripper fingers, at the cost of more
    contact pairs).  The per-slice Ritter radius still covers the full
    cross-section, so the approximation stays conservative (bounding).
    """
    mean = verts.mean(axis=0)
    centered = verts - mean
    # principal axis via the covariance's leading eigenvector
    cov = centered.T @ centered / max(len(verts), 1)
    w, V = np.linalg.eigh(cov)
    axis = V[:, -1]
    t = centered @ axis
    extent = float(t.max() - t.min())
    # cross-sectional scale: rms distance from the axis
    radial = centered - t[:, None] * axis[None, :]
    cross = 2.0 * float(np.sqrt((radial ** 2).sum(axis=1).mean()) + 1e-9)
    k = int(np.clip(np.ceil(refine * extent / max(cross, 1e-6)),
                    1, max_spheres))
    if k == 1:
        c, r = _ritter_sphere(verts)
        return [(c, r)]
    edges = np.linspace(t.min() - 1e-9, t.max() + 1e-9, k + 1)
    out = []
    for i in range(k):
        sel = (t >= edges[i]) & (t <= edges[i + 1])
        if sel.sum() < 2:
            continue
        c, r = _ritter_sphere(verts[sel])
        out.append((c, r))
    return out or [_ritter_sphere(verts)]
