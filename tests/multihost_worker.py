"""Worker for tests/test_multihost.py: one process of a 2-process
cart-pole batched-MPC run over the (host, device) mesh.

Run as: python tests/multihost_worker.py <process_id> <num_processes> <port>
Prints one line ``RESULT <mean_cost> <num_diverged> <total_iterations>``.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from drake_ddp_tpu.parallel import multihost

multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=nproc, process_id=pid)

import jax.numpy as jnp

from drake_ddp_tpu.dynamics.analytic import cart_pole_system
from drake_ddp_tpu.mpc.driver import MPCConfig
from drake_ddp_tpu.parallel.sharding import batched_mpc
from drake_ddp_tpu.solver.ilqr import ILQRConfig, ILQRProblem

assert jax.process_count() == nproc, jax.process_count()
mesh = multihost.host_device_mesh()
assert mesh.devices.shape == (nproc, 4)

N = 10
local_batch = 8
sys_cp = cart_pole_system(dt=1e-2)
cfg = ILQRConfig(num_steps=N, max_iters=3, beta=0.5)

# every process contributes its own scenarios (deterministic per rank)
rng = np.random.default_rng(100 + pid)
x0 = np.zeros((local_batch, 4), np.float32)
x0[:, 1] = np.pi + 0.2 * rng.standard_normal(local_batch)
tile = lambda a: np.tile(np.asarray(a, np.float32), (local_batch, 1, 1))
probs_local = ILQRProblem(
    x0=x0,
    x_nom=np.tile(np.array([0, np.pi, 0, 0], np.float32),
                  (local_batch, 1)),
    Q=tile(0.01 * np.eye(4)),
    R=tile(0.001 * np.eye(1)),
    Qf=tile(10 * np.eye(4)),
    u_init=np.zeros((local_batch, N - 1, 1), np.float32),
)
probs = multihost.process_local_problem(mesh, probs_local)

res, stats = batched_mpc(sys_cp, cfg, probs,
                         MPCConfig(num_resolves=2, replan_steps=2),
                         mesh=mesh)
# stats are psum-reduced across BOTH mesh axes (the host axis crosses
# process boundaries = DCN), so every process prints identical numbers
print(f"RESULT {float(stats.mean_cost):.6f} {int(stats.num_diverged)} "
      f"{int(stats.total_iterations)}", flush=True)
