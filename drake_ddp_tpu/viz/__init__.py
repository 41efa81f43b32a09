"""Host-side visualization & trajectory export (SURVEY.md D7).

The reference publishes to an external Meldis/Meshcat process over
LCM/websockets (DrakeVisualizer, reference pendulum.py:61-62,
kinova_gen3.py:223-231) — strictly off the optimization hot path.  The
TPU-native equivalents here are likewise host-side and offline:

- :func:`scene_frames`: forward-kinematics playback of a state
  trajectory into per-frame collision-sphere positions;
- :func:`export_html`: a self-contained interactive HTML player (no
  external assets — works in any browser, survives zero-egress
  environments);
- :func:`animate_matplotlib`: a matplotlib animation for quick looks
  and for saving mp4/gif;
- :class:`MPCStream`: per-resolve MPC trajectory recorder + ghost-overlay
  player (the reference's live per-resolve publishing,
  mini_cheetah.py:208-213, re-done as offline streaming).
"""

from drake_ddp_tpu.viz.playback import (
    animate_matplotlib,
    contact_force_frames,
    export_html,
    scene_frames,
)
from drake_ddp_tpu.viz.stream import MPCStream

__all__ = ["MPCStream", "animate_matplotlib", "contact_force_frames",
           "export_html", "scene_frames"]
