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


def test_mpc_stream_export(tmp_path):
    """MPCStream stitches resolves like the reference's states array and
    exports a ghost-overlay player."""
    from drake_ddp_tpu.viz import MPCStream

    sys = _wall_system()
    model, cm = sys.params
    n = model.nq + model.nv
    N, rs = 6, 2
    stream = MPCStream(replan_steps=rs)
    rng = np.random.default_rng(0)
    resolves = [0.1 * rng.normal(size=(n, N)).astype(np.float32)
                for _ in range(3)]
    for x in resolves:
        stream.record(x)
    stitched = stream.executed(n)
    assert stitched.shape == (rs * 2 + N, n)
    np.testing.assert_allclose(stitched[:rs], resolves[0].T[:rs])
    np.testing.assert_allclose(stitched[rs:2 * rs], resolves[1].T[:rs])
    np.testing.assert_allclose(stitched[2 * rs:], resolves[2].T)
    path = stream.export_html(str(tmp_path / "stream.html"), model, cm,
                              dt=0.01)
    html = open(path).read()
    assert "ghosts" in html and "resolve" in html
    assert len(html) > 1000


def test_contact_force_frames_and_arrows(tmp_path):
    """Contact-force display (reference cart_pole_with_wall.py:118
    ConnectContactResultsToDrakeVisualizer): a pole tip pressed into the
    wall produces a force pushing it back (+x, wall at -x), embedded in
    the HTML as arrow data."""
    from drake_ddp_tpu.viz import contact_force_frames, export_html

    sys = _wall_system()
    model, cm = sys.params
    n = model.nq + model.nv
    T = 3
    states = np.zeros((T, n), np.float32)
    # swing the pole into the wall: tip x = x + 0.5 sin(th); wall face
    # at -0.45, tip radius 0.05 -> contact at tip x <= -0.4
    states[:, 0] = 0.0
    states[:, 1] = -0.95  # theta from hanging-down
    ff = contact_force_frames(model, cm, states, dt=sys.dt)
    NC = ff["forces"].shape[1]
    assert ff["points"].shape == (T, NC, 3)
    mags = np.linalg.norm(ff["forces"], axis=2)
    assert mags.max() > 1.0, mags.max()       # real contact force
    # the wall pushes the tip back toward +x
    strongest = np.unravel_index(np.argmax(mags), mags.shape)
    assert ff["forces"][strongest][0] > 0.0

    path = export_html(str(tmp_path / "forces.html"), model, cm, states,
                       dt=sys.dt, show_forces=True)
    html = open(path).read()
    assert "fpoints" in html and "toggle contact forces" in html


def test_mpc_stream_live_mode(tmp_path):
    """Live (during-solve) viewing: with live_path set, every record()
    republishes an auto-reloading player file — the reference's
    per-resolve live-viewer role (mini_cheetah.py:208-213)."""
    from drake_ddp_tpu.viz import MPCStream

    sys = _wall_system()
    model, cm = sys.params
    n = model.nq + model.nv
    path = tmp_path / "live.html"
    stream = MPCStream(replan_steps=2, live_path=str(path), model=model,
                       contact=cm, dt=0.01)
    rng = np.random.default_rng(1)
    stream.record(0.1 * rng.normal(size=(n, 6)).astype(np.float32))
    html = open(path).read()
    assert 'http-equiv="refresh"' in html
    size1 = len(html)
    stream.record(0.1 * rng.normal(size=(n, 6)).astype(np.float32))
    assert len(open(path).read()) > size1      # republished with 2 ghosts
