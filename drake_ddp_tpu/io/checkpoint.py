"""Checkpoint/resume for long batched runs (SURVEY.md §5).

The reference's only persistence is the per-solve npz policy export
(ilqr.py:712-733 — covered by io/solution.py).  Batched MPC campaigns
(thousands of scenarios x hundreds of resolves) additionally need
mid-run checkpointing so a preempted pod job resumes instead of
restarting; the checkpoint is the exact MPC chain state: each
scenario's problem pytree (x0 / x_nom / warm-start tape) plus progress
counters.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from drake_ddp_tpu.solver.ilqr import ILQRProblem


def save_mpc_checkpoint(path: str, prob: ILQRProblem,
                        resolves_done: int,
                        extra: Optional[dict] = None) -> None:
    """Write the batched MPC chain state to one npz archive."""
    # Optional fields left at their None default (e.g. the policy
    # warm-start tapes K_init / x_ref_init) are omitted: np.asarray(None)
    # is an object array, which np.load(allow_pickle=False) rejects.
    # load_mpc_checkpoint lets the NamedTuple defaults refill them.
    payload = {f"prob_{k}": np.asarray(v)
               for k, v in prob._asdict().items() if v is not None}
    payload["resolves_done"] = np.asarray(resolves_done)
    # same None rule for extras: an object array saves fine but the
    # checkpoint then fails at np.load(allow_pickle=False)
    for k, v in (extra or {}).items():
        if v is not None:
            payload[f"extra_{k}"] = np.asarray(v)
    np.savez(path, **payload)


def load_mpc_checkpoint(path: str) -> Tuple[ILQRProblem, int, dict]:
    """Load a checkpoint: (problem pytree, resolves_done, extras)."""
    data = np.load(path)
    prob = ILQRProblem(**{
        k[len("prob_"):]: data[k] for k in data.files
        if k.startswith("prob_")
    })
    extras = {k[len("extra_"):]: data[k] for k in data.files
              if k.startswith("extra_")}
    return prob, int(data["resolves_done"]), extras
