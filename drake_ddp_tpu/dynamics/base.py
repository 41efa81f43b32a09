"""The universal dynamics contract: a pure discrete-time step function.

This replaces the reference's Drake systems framework (System / Diagram /
Context / input-port plumbing — reference ilqr.py:37-48, 208-231).  On TPU
there is no mutable context: state threads explicitly through a pure
function, which makes the dynamics trivially jit-able, vmap-able over
scenario batches, and differentiable with ``jax.jacfwd``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

# A step function maps (params, x, u) -> x_next. `params` is an arbitrary
# pytree of static model data (masses, inertias, contact parameters, ...).
StepFn = Callable[[Any, jax.Array, jax.Array], jax.Array]


@dataclasses.dataclass(frozen=True)
class DiscreteSystem:
    """A discrete-time dynamical system ``x_{t+1} = f(x_t, u_t)``.

    Equivalent in role to a Drake discrete System handed to the reference
    solver (ilqr.py:21-48), but purely functional: ``step_fn`` must be a
    pure JAX-traceable function of ``(params, x, u)``.

    Attributes:
        step_fn: pure function (params, x, u) -> x_next.
        params:  pytree of model parameters, passed through to step_fn.
        n:       state dimension.
        m:       control dimension.
        dt:      the discrete timestep (seconds), used for cost scaling and
                 solution export (reference ilqr.py:725).
    """

    step_fn: StepFn = dataclasses.field(metadata={"static": True})
    params: Any
    n: int
    m: int
    dt: float
    # Optional lane-major (batch-last) twin of step_fn for throughput-
    # critical batched rollouts: (x_T (n, B), u_T (m, B)) -> (n, B).
    # See multibody/lanestep.py; None = derive via vmap when needed.
    lane_step_fn: Any = dataclasses.field(
        default=None, metadata={"static": True})
    # Optional lane-major Jacobian kernel for the solver's derivative
    # hot loop: (x_T (n, L), u_T (m, L)) -> (fx (n, n, L), fu (n, m, L)).
    # See multibody/lanejac.py; None = jax.jacfwd through step_fn.
    lane_jac_fn: Any = dataclasses.field(
        default=None, metadata={"static": True})
    # Optional root-seeded twin of lane_jac_fn:
    # (x_T (n, L), u_T (m, L), x_next_T (n, L)) -> (fx, fu).  Skips the
    # jac's internal contact Newton by seeding with the rollout's
    # already-converged next state (IFT differentiates the root, not
    # the iteration map).  See multibody/lanejac.py root_seed.
    lane_jac_root_fn: Any = dataclasses.field(
        default=None, metadata={"static": True})

    def step(self, x: jax.Array, u: jax.Array) -> jax.Array:
        """Compute x_next = f(x, u)."""
        return self.step_fn(self.params, x, u)

    def bound_step(self) -> Callable[[jax.Array, jax.Array], jax.Array]:
        """Return ``f(x, u)`` with params bound (for jacfwd / scan)."""
        params = self.params
        step_fn = self.step_fn
        return lambda x, u: step_fn(params, x, u)

    def linearize(self, x: jax.Array, u: jax.Array):
        """Dynamics Jacobians ``fx = df/dx, fu = df/du`` at one point.

        TPU-native replacement for Drake's AutoDiffXd pipeline
        (reference ilqr.py:233-272): forward-mode JAX autodiff through the
        full step (including any contact solve), compiled by XLA.
        """
        return jax.jacfwd(self.bound_step(), argnums=(0, 1))(x, u)

    def rollout(self, x0: jax.Array, u_traj: jax.Array) -> jax.Array:
        """Roll out an open-loop control tape. u_traj: (N-1, m) -> (N, n)."""
        f = self.bound_step()

        def body(x, u):
            x_next = f(x, u)
            return x_next, x_next

        _, xs = jax.lax.scan(body, x0, u_traj)
        return jnp.concatenate([x0[None], xs], axis=0)
