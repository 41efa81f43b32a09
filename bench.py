#!/usr/bin/env python
"""Benchmark harness: batched MPC solves/s/chip on real TPU hardware.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The headline metric (BASELINE.json) is batched receding-horizon MPC
solves/s/chip on the flagship (mini-cheetah-class) task; until the
multibody contact stack lands, the flagship here is the hardest task the
framework currently runs end-to-end.  ``vs_baseline`` is value / 1000 —
the fraction of the north-star target (>=1000 batched 100-resolve
mini-cheetah-class MPC solves/s on a v5e pod slice, BASELINE.json:5).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from drake_ddp_tpu.dynamics.analytic import cart_pole_system
    from drake_ddp_tpu.solver.ilqr import ILQRConfig, ILQRProblem, solve_ilqr

    # Flagship currently: cart-pole swing-up (reference cart_pole.py:21-46
    # problem setup), batched over perturbed initial states.
    dt = 1e-2
    N = 100
    batch = 256
    sys = cart_pole_system(dt=dt)

    Q = dt * np.diag([0.1, 1.0, 0.01, 0.01])
    R = dt * 0.001 * np.eye(1)
    Qf = np.diag([200.0, 200.0, 10.0, 10.0])

    def make_prob(seed):
        key = jax.random.PRNGKey(seed)
        x0 = jnp.zeros((batch, 4), jnp.float32).at[:, 1].set(
            jnp.pi + 0.3 * jax.random.normal(key, (batch,))
        )
        return ILQRProblem(
            x0=x0,
            x_nom=jnp.tile(jnp.array([0.0, jnp.pi, 0.0, 0.0], jnp.float32), (batch, 1)),
            Q=jnp.tile(jnp.asarray(Q, jnp.float32), (batch, 1, 1)),
            R=jnp.tile(jnp.asarray(R, jnp.float32), (batch, 1, 1)),
            Qf=jnp.tile(jnp.asarray(Qf, jnp.float32), (batch, 1, 1)),
            u_init=jnp.zeros((batch, N - 1, 1), jnp.float32),
        )

    cfg = ILQRConfig(num_steps=N, delta=1e-2, beta=0.5, max_iters=30)
    solve = jax.jit(jax.vmap(lambda p: solve_ilqr(sys, cfg, p)))

    # Warmup/compile.  NOTE: inputs must differ between reps and results
    # must be forced with np.asarray — the axon tunnel result-caches
    # identical executions and block_until_ready may not block.
    sol = solve(make_prob(1000))
    np.asarray(sol.cost)

    reps = 2
    st = time.perf_counter()
    for r in range(reps):
        sol = solve(make_prob(r))
        np.asarray(sol.cost)
    elapsed = (time.perf_counter() - st) / reps

    solves_per_s = batch / elapsed
    converged = float(jnp.mean(~sol.diverged))
    result = {
        "metric": "batched iLQR MPC solves/s/chip (cart-pole swing-up, N=100)",
        "value": round(solves_per_s, 3),
        "unit": "solves/s/chip",
        "vs_baseline": round(solves_per_s / 1000.0, 4),
        "detail": {
            "batch": batch,
            "horizon": N,
            "seconds_per_batch": round(elapsed, 4),
            "converged_fraction": converged,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
