#!/usr/bin/env python
"""Benchmark: batched 100-resolve mini-cheetah MPC runs/s/chip.

The BASELINE.json headline metric: batched receding-horizon MPC on the
flagship task (mini cheetah, n = 37, m = 12, N = 50, hydroelastic-style
ground contact, moving target), 100 resolves per run (README.md:61),
scenarios batched on-chip.  Target: >= 1000 such runs/s on a v5e pod
slice (BASELINE.json:5) == ~3.9 runs/s/chip on a 256-chip slice;
``vs_baseline`` reports the fraction of that per-chip share.

Prints ONE JSON line.
"""

import json
import time

import numpy as np

BATCH = 256
# max_iters=8 (round-4 sweep): the batched while_loop runs until every
# lane converges, so some lane nearly always rides the cap and
# per-resolve wall time ~ max_iters.  12 -> 8 measured +30% throughput
# at ~0.5% healthy-fraction cost (2.84 runs/s, 98.8% healthy over 71
# resolves); mi=10 splits the difference (tools/probe_cfg_sweep.py).
MAX_ITERS = 8
RESOLVE_CHUNK = 5       # resolves per device call (long single executions
NUM_CHUNKS = 20         # can trip the axon tunnel's watchdog); 20 x 5 =
                        # all 100 resolves of the README.md:61 run are
                        # MEASURED, not extrapolated
JAC_CHUNK = 8


def _check_device_reachable(timeout_s: float = 150.0):
    """Fail fast with a clear message when the TPU tunnel is down.

    A dead axon tunnel makes ``jax.devices()`` block forever inside
    backend init (no timeout surface in-process), so probe it in a
    child process first.
    """
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        if r.returncode == 0:
            return
        msg = r.stderr.decode(errors="replace")[-500:]
    except subprocess.TimeoutExpired:
        msg = f"device enumeration hung > {timeout_s:.0f} s"
    print("bench: TPU backend unreachable (axon tunnel down?): " + msg,
          file=sys.stderr, flush=True)
    sys.exit(3)


def main():
    _check_device_reachable()
    import jax

    # persistent compilation cache: the solver compile is ~4 min through
    # the axon tunnel; repeat bench runs (driver rounds) reuse it
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    import jax.numpy as jnp

    from drake_ddp_tpu.examples import mini_cheetah as mc
    from drake_ddp_tpu.solver import batched
    from drake_ddp_tpu.mpc.driver import (MPCConfig, _shift_tape,
                                          mpc_solve_batched,
                                          shift_warm_start_batched)
    from drake_ddp_tpu.solver import keypoints as kp
    from drake_ddp_tpu.solver.ilqr import ILQRConfig, ILQRProblem

    # contact_iters=8: the implicit Newton must RESOLVE high-velocity
    # foot impacts or the prediction tail accumulates leg-velocity
    # spikes (16 -> 59 -> 457 rad/s, nearly free in the reference's
    # 0.01 leg-velocity weight) until a resolve converges to a garbage
    # optimum and the chain dies.  Round-4 attribution: the cascade is
    # ALGORITHMIC, not f32 (CPU f64 chains at ci=6 blow up at resolve
    # ~24; at ci=8 they run clean — tools/probe_fall_cpu64.py), and on
    # TPU ci=8 cut 72-resolve divergence 16% -> 1% at the same
    # wall-clock (the extra Newton work is offset by eliminated
    # failure-grind; tools/probe_cfg_sweep.py).  This is also the
    # Drake-parity direction: TAMSI iterates its implicit solve to
    # convergence.
    cfg = mc.Config(contact_iters=8)
    system, _ = mc.build_system(cfg)
    N = int(cfg.T / cfg.dt)
    Q, R, Qf = mc.costs(cfg)
    x0, x_nom = mc.initial_and_target(cfg)
    rs = cfg.replan_steps

    # setInterval-8 keypoint interpolation (the reference's own speedup,
    # README.md:69-97): halves derivative cost; walking-chain quality
    # verified equal to denser schedules at the stable-gait config.
    derivs = kp.DerivsInterpolation("setInterval", minN=8,
                                    max_keypoints=8, jac_chunk=JAC_CHUNK)
    # ls_expected_floor=delta: skip linesearch candidates whose predicted
    # decrease can't reach the convergence threshold (measured: converging
    # lanes otherwise grind 5-7 extra rollout rounds accepting f32-noise
    # steps at eps ~1e-5; see ILQRConfig docstring).
    # cost_ceiling: healthy resolve costs are ~1-50 at this config; a
    # candidate above 1e4 is an exploded prediction and must never become
    # the incumbent (accepting one feeds garbage gains to the next warm
    # start and poisons the chain — tools/probe_fall.py dissection).
    # ls_parallel=2 / eps_min (round-4 sweep): accepts concentrate
    # in the first rollout round (86% measured), so halving the
    # candidate width cuts most forward-pass compute.  eps_min=1e-3
    # (round-5 sweep): with the derivative phase collapsed to ~10% the
    # linesearch ladder became the dominant per-iteration cost, and
    # truncating it at 1e-3 instead of 1e-4 cut another ~25% of wall
    # time at EQUAL chain health over 299 resolves (dead 1.95% both,
    # fewer dead lanes on the 72-resolve sweep; LONGCHAIN artifacts) —
    # the [1e-4, 1e-3) accepts were failure-grind, not progress.
    scfg = ILQRConfig(num_steps=N, delta=cfg.delta, beta=cfg.beta,
                      max_iters=MAX_ITERS, derivs=derivs, ls_parallel=2,
                      eps_min=1e-3, parallel_backward=False,
                      ls_expected_floor=cfg.delta, cost_ceiling=1e4)
    # policy_warm_start: seed each resolve with the previous solution's
    # LQR policy — the open-loop tape replay diverges exponentially over
    # the horizon tail through stiff contact (MPCConfig docstring).
    # freeze_diverged: a dead lane re-diverging every resolve costs the
    # whole batch ~11 iterations of max-depth Levenberg retries per
    # resolve (measured 3x whole-bench slowdown); latch it and report the
    # dead fraction honestly instead.
    # Chain-health policy (TPU round-4 dissection, tools/probe_death.py
    # + probe_rescue.py).  Measured: p(fail | prev fail) = 0.9986 — a
    # failed lane's coasted seed never heals by itself — while failed
    # lanes' handoff states carried median max joint velocity 241 rad/s
    # (healthy: 5), i.e. the corruption enters when a resolve CONVERGES
    # to a garbage optimum (healthy p90 cost 5.7, garbage 500+) and its
    # blown-up trajectory is accepted for the handoff.  So:
    # - resolve_cost_ceiling=1e3: treat garbage-converged optima as
    #   failures BEFORE their trajectory poisons the handoff (cold entry
    #   solves cost ~44; healthy resolves ~1-10; recovering rescues
    #   300-900 — a tighter 150 ceiling flagged those as failures and
    #   latched lanes that were healing, measured 0.70 runs/s dead 39%),
    # - rescue_u=U_STAND: re-seed a failed lane's next solve with the
    #   safe standing tape (measured: rescues 48% even from corrupt
    #   states; from a clean coasted handoff it should do far better),
    # - freeze_after=3: latch only lanes that fail 3 resolves in a row
    #   (i.e. rescue had 2 shots and the coast tape 1).
    mpcc = MPCConfig(num_resolves=RESOLVE_CHUNK, replan_steps=rs,
                     policy_warm_start=True, freeze_diverged=True,
                     freeze_after=3, resolve_cost_ceiling=1e3)
    rescue_u = jnp.tile(jnp.asarray(mc.U_STAND, jnp.float32), (N - 1, 1))
    shift = jnp.zeros(37, jnp.float32).at[4].set(
        cfg.target_vel * cfg.dt * rs)

    def make_prob(seed):
        key = jax.random.PRNGKey(seed)
        x0b = jnp.tile(jnp.asarray(x0, jnp.float32), (BATCH, 1))
        x0b = x0b.at[:, 19:].add(
            0.05 * jax.random.normal(key, (BATCH, 18)))
        tile = lambda a: jnp.tile(jnp.asarray(a, jnp.float32),
                                  (BATCH, 1, 1))
        return ILQRProblem(
            x0=x0b,
            x_nom=jnp.tile(jnp.asarray(x_nom, jnp.float32), (BATCH, 1)),
            Q=tile(cfg.dt * Q), R=tile(cfg.dt * R), Qf=tile(Qf),
            u_init=jnp.tile(jnp.asarray(mc.U_STAND, jnp.float32),
                            (BATCH, N - 1, 1)),
            # K_init/x_ref_init/frozen MUST be arrays from the start:
            # the chunk loop fills them after chunk 0, and a None ->
            # array pytree change would recompile the whole program
            # INSIDE the timed loop (a ~4 min hidden cost inside
            # BENCH_r03's measurement).  Zero gains around x0 == the
            # open-loop u_init seed, so chunk-0 semantics are unchanged.
            K_init=jnp.zeros((BATCH, N - 1, 12, 37), jnp.float32),
            x_ref_init=jnp.tile(x0b[:, None], (1, N, 1)),
            frozen=jnp.zeros((BATCH,), bool),
        )

    # natively-batched solver: linesearch rollouts run through the
    # Pallas mega-step kernel (ops/megastep.py) — measured ~4x faster
    # than jax.vmap(mpc_solve) at this batch on v5e
    fn = jax.jit(lambda p, c0: mpc_solve_batched(system, scfg, p, mpcc,
                                                 shift, consec0=c0,
                                                 rescue_u=rescue_u))
    vshift = jax.jit(lambda u: shift_warm_start_batched(u, rs))

    # Warmup/compile.  NOTE: inputs must differ between reps and results
    # must be forced with np.asarray — the axon tunnel result-caches
    # identical executions and block_until_ready may not block.
    import sys
    print("bench: compiling...", file=sys.stderr, flush=True)
    consec = jnp.zeros(BATCH, jnp.int32)
    res = fn(make_prob(1000), consec)
    np.asarray(res.costs)
    print("bench: warm, measuring...", file=sys.stderr, flush=True)

    # One 100-resolve MPC run per scenario, chained across NUM_CHUNKS
    # device calls: each chunk continues from the previous final state
    # with the reference's warm-start shift (mini_cheetah.py:193-198).
    # Solve accounting: every chunk performs 1 + RESOLVE_CHUNK solves
    # (mpc_solve_batched's initial solve + its scan resolves), and the
    # inter-chunk handoff advances the chain by replan_steps exactly like
    # an intra-chunk resolve — chunk boundaries are invisible to the
    # physics.  The chain is therefore one continuous
    # (NUM_CHUNKS*(RESOLVE_CHUNK+1) - 1)-resolve MPC run per lane; a
    # "run" in the metric is the README.md:61 unit of 100 resolves.
    prob = make_prob(0)
    st = time.perf_counter()
    diverged = 0.0
    for c in range(NUM_CHUNKS):
        res = fn(prob, consec)
        prob = prob._replace(
            x0=res.final_x[:, rs],
            u_init=vshift(res.final_u),
            x_nom=prob.x_nom + shift[None, :] * RESOLVE_CHUNK,
            # the policy handoff across the chunk boundary (the shifted
            # final gains + state reference of the last resolve)
            K_init=_shift_tape(res.final_K, rs, time_axis=1),
            x_ref_init=_shift_tape(res.final_x, rs, time_axis=1),
            # dead-lane latch + consecutive-failure count across the
            # chunk boundary (MPCConfig.freeze_after grace)
            frozen=res.dead,
        )
        consec = res.consec
        d = float(np.asarray(jnp.mean(res.diverged)))
        diverged += d
        # per-chunk divergence on stderr: distinguishes chains that fall
        # and stay down (fraction ramps with chunk index) from uniform
        # transient linesearch failures
        print(f"bench: chunk {c} diverged {d:.4f}", file=sys.stderr,
              flush=True)
    np.asarray(res.costs)
    elapsed = time.perf_counter() - st
    # physical quality at chain end.  dead = lanes whose chain diverged
    # at some resolve and was latched (freeze_diverged); a dead lane
    # coasts on its last-good policy, so its base height stays nominal —
    # alive_and_upright counts only lanes that BOTH never died AND are
    # standing (base height above half the ~0.29 m standing height).
    dead = np.asarray(res.dead)
    z_ok = np.asarray(prob.x0[:, 6] > 0.15)
    upright = float(np.mean(~dead & z_ok))
    # physical-state sanity: healthy walking lanes carry max joint
    # velocity ~5 rad/s; a corrupt handoff carries hundreds
    # (tools/probe_rescue.py) — base z alone misses that
    maxv = np.abs(np.asarray(prob.x0[:, 19:])).max(axis=1)
    healthy = float(np.mean(~dead & z_ok & (maxv < 50.0)))

    total_resolves = (RESOLVE_CHUNK + 1) * NUM_CHUNKS - 1
    resolves_per_s = BATCH * total_resolves / elapsed
    # all resolves of the continuous chain are measured end to end;
    # normalize to the README.md:61 run unit of 100 resolves
    runs_per_s = resolves_per_s / 100.0
    per_chip_target = 1000.0 / 256.0     # v5e-256 pod slice share
    result = {
        "metric": "batched 100-resolve mini-cheetah MPC runs/s/chip",
        "value": round(runs_per_s, 4),
        "unit": "runs/s/chip",
        "vs_baseline": round(runs_per_s / per_chip_target, 4),
        "detail": {
            "batch": BATCH,
            "horizon": N,
            "resolves_measured": total_resolves,
            "run_unit_resolves": 100,
            "max_iters": MAX_ITERS,
            "contact_iters": 8,
            "ls_parallel": 2,
            "eps_min": 1e-3,
            "keypoint_interval": 8,
            "seconds_total": round(elapsed, 2),
            "resolves_per_s_per_chip": round(resolves_per_s, 1),
            "mean_diverged_fraction": round(diverged / NUM_CHUNKS, 4),
            "dead_fraction_final": round(float(dead.mean()), 4),
            "alive_and_upright_final": round(upright, 4),
            "alive_upright_sane_v_final": round(healthy, 4),
            "device": str(jax.devices()[0]),
            # which rollout kernel the batched solver actually selected
            # (the 'auto' path preflight-compiles the fused Pallas kernel
            # and degrades on failure instead of crashing the bench)
            "rollout_kernel": batched.KERNEL_SELECTION["rollout"],
            "kernel_fallback_reason":
                batched.KERNEL_SELECTION["fallback_reason"],
            "deriv_kernel": batched.KERNEL_SELECTION["derivs"],
            "deriv_root": batched.KERNEL_SELECTION["derivs_root"],
            "deriv_fallback_reason":
                batched.KERNEL_SELECTION["derivs_fallback_reason"],
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
