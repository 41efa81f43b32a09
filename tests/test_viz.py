"""Visualization export (SURVEY.md D7 parity): scene playback frames and
the self-contained HTML player."""

import os

import numpy as np

from drake_ddp_tpu.viz import export_html, scene_frames


def _wall_system():
    from drake_ddp_tpu.examples import cart_pole_with_wall as ex
    sys = ex.build_system(ex.Config())
    return sys


def test_scene_frames_shapes():
    sys = _wall_system()
    model, cm = sys.params
    T = 5
    states = np.zeros((T, model.nq + model.nv), np.float32)
    states[:, 1] = np.pi  # pole down... (theta)
    sc = scene_frames(model, cm, states)
    S = len(cm.sph_body)
    assert sc["centers"].shape == (T, S, 3)
    assert len(sc["radii"]) == S
    assert np.isfinite(sc["centers"]).all()
    # reference layout (n, T) also accepted
    sc2 = scene_frames(model, cm, states.T)
    assert np.allclose(sc2["centers"], sc["centers"])


def test_export_html(tmp_path):
    sys = _wall_system()
    model, cm = sys.params
    states = np.zeros((4, model.nq + model.nv), np.float32)
    path = export_html(str(tmp_path / "play.html"), model, cm, states,
                       dt=0.01, playback_rate=0.2)
    assert os.path.exists(path)
    html = open(path).read()
    assert "<canvas" in html and "playback" in html
    assert "radii" in html  # embedded data
    assert len(html) > 1000
