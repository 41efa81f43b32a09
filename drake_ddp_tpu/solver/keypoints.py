"""Keypoint-scheduled dynamics derivatives with linear interpolation.

TPU-native re-design of the reference's derivative-interpolation subsystem
(reference ilqr.py:380-621 and utils_derivs_interpolation.py:1-14, from the
Russell/Papallas/Dogar ICRA'23 key-point paper).  The reference builds
Python lists of keypoint indices and calls an AutoDiff dynamics step
one-timestep-at-a-time; here keypoints are a boolean *mask* over the
horizon, exact Jacobians are one batched ``jax.jacfwd`` call (gathered to a
static keypoint budget when sparse evaluation pays off), and interpolation
is a vectorized prev/next-keypoint blend.  Everything jits and vmaps.

Methods (semantics matched to the reference):
- ``setInterval``   — reference ilqr.py:417-432
- ``adaptiveJerk``  — reference ilqr.py:434-486
- ``iterativeError``— reference ilqr.py:488-593

``iterativeError`` in the reference lazily evaluates Jacobians at dyadic
bisection points.  XLA needs static shapes, so the TPU-native analog
(:func:`_iterative_error_sparse`, used when ``max_keypoints`` is set)
evaluates the dyadic tree level by level with a static per-level lane
cap: total evaluated lanes <= max(3, max_keypoints), segments the budget
cannot check are accepted as-is.  With an ample budget the keypoint set
equals the reference's exactly; without ``max_keypoints`` the dense
fallback computes the full stack once and replays the bisection on it
(parity, no savings).

``adaptiveJerk``'s counter logic guarantees keypoint spacing >= minN, so
``T // minN + 2`` is a *sufficient* static budget — it is derived
automatically when ``max_keypoints`` is unset, giving the method its
compute savings with zero quality loss.
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

SET_INTERVAL = "setInterval"
ADAPTIVE_JERK = "adaptiveJerk"
ITERATIVE_ERROR = "iterativeError"
_METHODS = (SET_INTERVAL, ADAPTIVE_JERK, ITERATIVE_ERROR)


class DerivsInterpolation(NamedTuple):
    """Derivative-interpolation config (utils_derivs_interpolation.py:3-9).

    Attributes:
        keypoint_method: one of 'setInterval', 'adaptiveJerk',
            'iterativeError'.
        minN: minimum interval between keypoints.
        maxN: maximum interval between keypoints (adaptiveJerk only).
        jerk_threshold: jerk magnitude that triggers a keypoint
            (adaptiveJerk only).
        iterative_error_threshold: mean-squared fx interpolation error that
            triggers subdivision (iterativeError only).
        max_keypoints: static budget for the sparse gather evaluation path.
            None means evaluate densely (gather skipped).  Must upper-bound
            the true keypoint count; excess slots are wasted work only.
        jac_chunk: evaluate exact Jacobians at most this many timesteps at
            a time (lax.map batching) — bounds the JVP temporary memory
            for large scenario batches; None = whole horizon at once.
    """

    keypoint_method: str = SET_INTERVAL
    minN: int = 1
    maxN: int = 0
    jerk_threshold: float = 0.0
    iterative_error_threshold: float = 0.0
    max_keypoints: Optional[int] = None
    jac_chunk: Optional[int] = None

    def validate(self) -> "DerivsInterpolation":
        if self.keypoint_method not in _METHODS:
            # reference ilqr.py:403-404
            raise ValueError(
                f"unknown interpolation method {self.keypoint_method!r}"
            )
        return self


BASELINE = DerivsInterpolation(SET_INTERVAL, 1, 0, 0.0, 0.0)


def is_baseline(cfg: DerivsInterpolation) -> bool:
    """True for the dense setInterval-1 case (reference ilqr.py:96-98,414)."""
    return cfg.keypoint_method == SET_INTERVAL and cfg.minN == 1


# ---------------------------------------------------------------------------
# Keypoint masks.  A mask has shape (N-1,) over timesteps 0..N-2 and is True
# where an exact Jacobian is evaluated.
# ---------------------------------------------------------------------------


def set_interval_mask(N: int, minN: int) -> np.ndarray:
    """Static mask for the setInterval method (reference ilqr.py:417-432).

    The reference takes ``arange(0, N-1, minN)`` and *replaces* its last
    element with N-2 if it isn't already (so the previous last keypoint is
    dropped, not kept).
    """
    pts = np.arange(0, N - 1, minN)
    if pts[-1] != N - 2:
        pts = pts.copy()
        pts[-1] = N - 2
    mask = np.zeros(N - 1, dtype=bool)
    mask[pts] = True
    return mask


def _force_last_keypoint(mask: jax.Array, N: int) -> jax.Array:
    """If the last True isn't at N-2, move it there (reference ilqr.py:465)."""
    idx = jnp.arange(N - 1)
    last_true = jnp.max(jnp.where(mask, idx, -1))
    needs_move = last_true != (N - 2)
    mask = mask & ~(needs_move & (idx == last_true))
    return mask.at[N - 2].set(True)


def jerk_profile(x: jax.Array, N: int, n: int) -> jax.Array:
    """Second finite difference of the velocity trace (ilqr.py:470-486).

    x: (N, n) state trajectory; velocities are the trailing n/2 entries.
    Returns (N-3, dof) jerk profile.
    """
    dof = n // 2
    vel = x[:, n - dof:]  # (N, dof) — trailing half of the state
    return vel[2:N - 1] - 2.0 * vel[1:N - 2] + vel[0:N - 3]


def adaptive_jerk_mask(cfg: DerivsInterpolation, x: jax.Array, N: int, n: int) -> jax.Array:
    """Mask for the adaptiveJerk method (reference ilqr.py:434-468).

    Replays the reference's counter logic as a scan: starting from keypoint
    0, a timestep t becomes a keypoint when the counter reaches minN and
    any DOF's jerk exceeds the threshold, or unconditionally at maxN.
    """
    jerk = jerk_profile(x, N, n)  # (N-3, dof)
    exceeds = jnp.any(jerk > cfg.jerk_threshold, axis=-1)  # (N-3,)

    def body(counter, exceed_t):
        counter = counter + 1
        hit_jerk = (counter >= cfg.minN) & exceed_t
        counter = jnp.where(hit_jerk, 0, counter)
        hit_max = counter >= cfg.maxN
        counter = jnp.where(hit_max, 0, counter)
        return counter, hit_jerk | hit_max

    _, hits = jax.lax.scan(body, jnp.asarray(0, jnp.int32), exceeds)
    mask = jnp.zeros(N - 1, dtype=bool).at[0].set(True)
    mask = mask.at[0:N - 3].set(mask[0:N - 3] | hits)
    return _force_last_keypoint(mask, N)


def _dyadic_depth(N: int, minN: int) -> int:
    """Max bisection depth for segments of [0, N-2] wider than minN."""
    depth = 0
    width = N - 2
    while width > max(minN, 1):
        width = (width + 1) // 2
        depth += 1
    return depth + 1


def _adaptive_jerk_budget(cfg: DerivsInterpolation, N: int) -> int:
    """Sufficient static keypoint budget for any adaptiveJerk mask.

    The scan counter resets on every hit, so consecutive hits are at least
    ``min(minN, maxN)`` steps apart (``maxN <= 0`` degenerates to a hit at
    every step); with keypoint 0 and the forced last keypoint the count is
    bounded by ``(N-3)//spacing + 3``.  Evaluating at this static budget
    loses nothing vs dense evaluation — excess lanes are never read.
    """
    spacing = max(1, min(cfg.minN, cfg.maxN)) if cfg.maxN > 0 else 1
    return min(N - 1, (N - 3) // spacing + 3)


def _dyadic_tree(N: int, minN: int):
    """Static dyadic bisection tree over [0, N-2].

    Returns a list of levels, each ``(starts, ends, mids, wide)`` numpy
    arrays of length 2**level.  Which segments are *active* is dynamic
    (depends on the Jacobian error test), but the candidate index tree is a
    pure function of (N, minN) — the structure XLA needs to be static.
    """
    levels = []
    starts = np.array([0], np.int32)
    ends = np.array([N - 2], np.int32)
    for _ in range(_dyadic_depth(N, minN)):
        mids = (starts + ends) // 2
        wide = (ends - starts) > minN
        levels.append((starts, ends, mids, wide))
        starts = np.concatenate([starts, mids])
        ends = np.concatenate([mids, ends])
    return levels


def _level_caps(levels, budget: int) -> list[int]:
    """Static per-level lane caps: 3 lanes for the root (s, m, e), then at
    most ``2**level`` per level until the budget is spent."""
    caps = [3]
    rem = max(0, budget - 3)
    for level in levels[1:]:
        cap = min(len(level[0]), int(np.sum(level[3])), rem)
        caps.append(cap)
        rem -= cap
    return caps


def iterative_error_mask(
    cfg: DerivsInterpolation, fx_full: jax.Array, N: int
) -> jax.Array:
    """Mask for the iterativeError method (reference ilqr.py:488-593).

    Replays the reference's adaptive bisection of [0, N-2] on a precomputed
    Jacobian stack ``fx_full`` (N-1, n, n): a segment (s, e) with
    ``e - s > minN`` marks s, m=(s+e)//2, e as evaluated; if the linear
    midpoint estimate (fx[s]+fx[e])/2 differs from fx[m] by more than the
    threshold (mean over 2n of the squared entry differences,
    ilqr.py:583-588), both halves are checked recursively.

    The recursion touches only dyadic indices, so it is replayed level by
    level with static depth; the result is exactly the reference's
    ``deriv_calculated_at_index`` set.
    """
    n = fx_full.shape[-1]
    depth = _dyadic_depth(N, cfg.minN)
    # Level l has at most 2^l segments; process levels with padded arrays.
    starts = jnp.zeros((1,), jnp.int32)
    ends = jnp.full((1,), N - 2, jnp.int32)
    active = jnp.ones((1,), bool)
    visited = jnp.zeros((N - 1,), bool)

    for _ in range(depth):
        mids = (starts + ends) // 2
        wide = (ends - starts) > cfg.minN
        check = active & wide
        # Mark s, m, e as evaluated for every checked segment.
        visited = visited.at[starts].max(check)
        visited = visited.at[mids].max(check)
        visited = visited.at[ends].max(check)
        fx_s = fx_full[starts]
        fx_e = fx_full[ends]
        fx_m = fx_full[mids]
        err = jnp.sum((0.5 * (fx_s + fx_e) - fx_m) ** 2, axis=(-2, -1)) / (2 * n)
        bad = check & (err > cfg.iterative_error_threshold)
        # Children for the next level.
        starts = jnp.concatenate([starts, mids])
        ends = jnp.concatenate([mids, ends])
        active = jnp.concatenate([bad, bad])

    return visited


# ---------------------------------------------------------------------------
# Interpolation between keypoints (reference ilqr.py:596-621).
# ---------------------------------------------------------------------------


def _prev_next_keypoint(mask: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-timestep indices of the surrounding keypoints.

    prev[t] = largest keypoint <= t, next[t] = smallest keypoint >= t+1
    (clamped to the last keypoint).  Assumes mask[0] is True.
    """
    T = mask.shape[0]
    idx = jnp.arange(T)
    prev = jax.lax.associative_scan(jnp.maximum, jnp.where(mask, idx, -1))
    nxt_rev = jax.lax.associative_scan(
        jnp.minimum, jnp.where(mask, idx, T)[::-1]
    )[::-1]
    last = jnp.max(jnp.where(mask, idx, -1))
    nxt = jnp.minimum(jnp.maximum(nxt_rev, prev), last)
    return prev, nxt


def interpolate_stack(mask: jax.Array, vals: jax.Array) -> jax.Array:
    """Linearly interpolate a (T, ...) stack between masked keypoints.

    Matches reference ilqr.py:596-621: for consecutive keypoints s < e and
    s <= t < e, out[t] = vals[s] + (vals[e] - vals[s]) * (t - s) / (e - s);
    out[t] = vals[t] exactly at keypoints.
    """
    T = vals.shape[0]
    prev, nxt = _prev_next_keypoint(mask)
    t = jnp.arange(T)
    denom = jnp.maximum(nxt - prev, 1)
    w = ((t - prev) / denom).astype(vals.dtype)
    w = jnp.where(mask, 0.0, w)  # exact at keypoints
    shape_w = (T,) + (1,) * (vals.ndim - 1)
    w = w.reshape(shape_w)
    return vals[prev] * (1.0 - w) + vals[nxt] * w


# ---------------------------------------------------------------------------
# Top-level derivative computation (reference ilqr.py:380-415).
# ---------------------------------------------------------------------------


def _dense_jacobians(step: Callable, x: jax.Array, u: jax.Array,
                     chunk: Optional[int] = None):
    """Batched fx, fu over the whole horizon: one compiled jacfwd.

    Replaces the reference's per-timestep AutoDiffXd evaluation
    (ilqr.py:409-411 -> 233-272).  ``chunk`` bounds how many timesteps
    are differentiated at once: the JVP temporaries of a contact step
    scale as horizon x tangents x bodies and are heavily tile-padded
    ((..., 3, nv) blocks), so the unchunked form OOMs large scenario
    batches (measured 22.8 GiB HBM at batch 256, mini-cheetah N=50).
    """
    jac = jax.jacfwd(step, argnums=(0, 1))
    if chunk is None or chunk >= x.shape[0] - 1:
        return jax.vmap(jac)(x[:-1], u)
    return jax.lax.map(lambda xu: jac(*xu), (x[:-1], u), batch_size=chunk)


def _sparse_jacobians(
    step: Callable, x: jax.Array, u: jax.Array, mask: jax.Array, budget: int,
    chunk: Optional[int] = None,
):
    """Evaluate Jacobians only at (up to ``budget``) keypoints via gather.

    Keypoint indices are packed to the front of a static-size index vector
    (stable argsort on the negated mask), Jacobians are computed for that
    fixed-size batch, and scattered back to the horizon.  Non-keypoint
    slots hold stale/duplicate values that interpolation never reads.
    """
    T = mask.shape[0]
    budget = min(budget, T)
    order = jnp.argsort(~mask, stable=True)[:budget]
    jac = jax.jacfwd(step, argnums=(0, 1))
    if chunk is None or chunk >= budget:
        fx_k, fu_k = jax.vmap(jac)(x[order], u[order])
    else:
        fx_k, fu_k = jax.lax.map(lambda xu: jac(*xu), (x[order], u[order]),
                                 batch_size=chunk)
    n, m = fx_k.shape[-1], fu_k.shape[-1]
    fx = jnp.zeros((T, n, n), fx_k.dtype).at[order].set(fx_k)
    fu = jnp.zeros((T, n, m), fu_k.dtype).at[order].set(fu_k)
    return fx, fu


def _iterative_error_sparse(
    step: Callable, cfg: DerivsInterpolation, x: jax.Array, u: jax.Array,
    budget: int, chunk: Optional[int] = None,
):
    """Budgeted lazy evaluation for iterativeError (reference ilqr.py:488-593).

    The TPU-native analog of the reference's lazy dyadic bisection: the
    candidate index tree is static (:func:`_dyadic_tree`), so each level
    evaluates Jacobians only at the mids of active segments — packed to a
    static per-level lane cap — instead of computing the dense stack.
    Total evaluated lanes <= max(3, budget); active segments beyond a
    level's cap are accepted as-is (their span is interpolated).  With an
    ample budget the visited set equals the reference's exactly.
    """
    N, n = x.shape
    m = u.shape[-1]
    T = N - 1
    dtype = x.dtype
    thr = cfg.iterative_error_threshold
    levels = _dyadic_tree(N, cfg.minN)
    caps = _level_caps(levels, max(3, int(budget)))

    jac = jax.jacfwd(step, argnums=(0, 1))

    def eval_at(idx):
        """Jacobians at gathered indices; idx == T lanes are wasted work
        whose scatters drop (out of bounds, mode='drop')."""
        xg = x[jnp.minimum(idx, T - 1)]
        ug = u[jnp.minimum(idx, T - 1)]
        if chunk is None or chunk >= idx.shape[0]:
            return jax.vmap(jac)(xg, ug)
        return jax.lax.map(lambda xu: jac(*xu), (xg, ug), batch_size=chunk)

    fx_buf = jnp.zeros((T, n, n), dtype)
    fu_buf = jnp.zeros((T, n, m), dtype)
    visited = jnp.zeros((T,), bool)

    # Root level: s, m, e are static and always evaluated (the tree is only
    # entered when the root segment is wide — callers guard the degenerate
    # case, where the dense fallback reproduces the reference's empty set).
    s0, e0, m0 = 0, N - 2, (N - 2) // 2
    idx0 = jnp.asarray(np.array([s0, m0, e0], np.int32))
    fx_k, fu_k = eval_at(idx0)
    fx_buf = fx_buf.at[idx0].set(fx_k)
    fu_buf = fu_buf.at[idx0].set(fu_k)
    visited = visited.at[idx0].set(True)
    err0 = jnp.sum((0.5 * (fx_buf[s0] + fx_buf[e0]) - fx_buf[m0]) ** 2) / (2 * n)
    bad0 = err0 > thr
    active = jnp.stack([bad0, bad0])

    for (starts, ends, mids, wide), cap in zip(levels[1:], caps[1:]):
        if cap == 0:
            break
        want = active & jnp.asarray(wide)
        order = jnp.argsort(~want, stable=True)[:cap]
        checked = want[order]
        # Invalid lanes scatter out of bounds and drop.
        idx = jnp.where(checked, jnp.asarray(mids)[order], T)
        fx_k, fu_k = eval_at(idx)
        fx_buf = fx_buf.at[idx].set(fx_k, mode="drop")
        fu_buf = fu_buf.at[idx].set(fu_k, mode="drop")
        visited = visited.at[idx].set(True, mode="drop")
        # Endpoints were evaluated at the parent level (active implies the
        # parent was checked, and child endpoints are the parent's s/m/e).
        s_l = jnp.asarray(starts)[order]
        e_l = jnp.asarray(ends)[order]
        m_l = jnp.asarray(mids)[order]
        err = jnp.sum(
            (0.5 * (fx_buf[s_l] + fx_buf[e_l]) - fx_buf[m_l]) ** 2,
            axis=(-2, -1),
        ) / (2 * n)
        bad = jnp.zeros(len(starts), bool).at[order].set(checked & (err > thr))
        active = jnp.concatenate([bad, bad])

    fx = interpolate_stack(visited, fx_buf)
    fu = interpolate_stack(visited, fu_buf)
    percent = 100.0 * jnp.sum(visited) / T
    return fx, fu, percent.astype(dtype)


def compute_derivatives_batched(
    jac_T: Callable,
    cfg: DerivsInterpolation,
    x: jax.Array,
    u: jax.Array,
    root: bool = False,
):
    """Batched derivative computation through a lane-major Jacobian kernel.

    The natively-batched solver's twin of :func:`compute_derivatives`:
    instead of vmapping ``jax.jacfwd`` over scenarios, every (scenario,
    keypoint) work item becomes one *lane* of a single call to ``jac_T``
    (a structured-IFT kernel, see multibody/lanejac.py) — the layout that
    TPU vector units tile efficiently.

    Args:
        jac_T: lane-major Jacobian kernel
            (x (n, L), u (m, L)) -> (fx (n, n, L), fu (n, m, L)); with
            ``root=True`` a root-seeded kernel taking a third
            x_next (n, L) argument (lanejac root_seed: the trajectory's
            own next state skips the jac's internal contact Newton).
        cfg: interpolation config (validated).
        x: (B, N, n) trajectories.
        u: (B, N-1, m) control tapes.
    Returns:
        fx (B, N-1, n, n), fu (B, N-1, n, m), percent (B,).
    """
    B, N, n = x.shape
    m = u.shape[-1]
    T = N - 1
    dtype = x.dtype
    xn = x[:, 1:]                      # (B, T, n) next states, t -> t+1

    def at_indices(x_k, u_k, xn_k=None):
        """Jacobians at gathered keypoints: x_k (B, K, n) -> (B, K, n, n)."""
        K = x_k.shape[1]
        lane = lambda a, d: a.reshape(B * K, d).T
        if root:
            fx_L, fu_L = jac_T(lane(x_k, n), lane(u_k, m), lane(xn_k, n))
        else:
            fx_L, fu_L = jac_T(lane(x_k, n), lane(u_k, m))
        fx_k = jnp.moveaxis(fx_L.reshape(n, n, B, K), (2, 3), (0, 1))
        fu_k = jnp.moveaxis(fu_L.reshape(n, m, B, K), (2, 3), (0, 1))
        return fx_k, fu_k

    def dense():
        return at_indices(x[:, :-1], u, xn)

    if is_baseline(cfg):
        fx, fu = dense()
        return fx, fu, jnp.full((B,), 100.0, dtype)

    interp = jax.vmap(interpolate_stack)

    if cfg.keypoint_method == SET_INTERVAL:
        mask_np = set_interval_mask(N, cfg.minN)
        idx = np.nonzero(mask_np)[0]
        fx_k, fu_k = at_indices(x[:, idx], u[:, idx], xn[:, idx])
        # static schedule -> interpolate DIRECTLY from the compact
        # (B, K, ...) keypoint stack with trace-time prev/next/weights.
        # The general path (scatter into a dense zero stack + masked
        # associative-scan prev/next) costs several extra HBM passes
        # over the (B, T, n, n) stack — measured ~2/3 of the whole
        # derivative phase at the flagship bench shapes (PERF.md r5).
        t_np = np.arange(T)
        prev_k = np.searchsorted(idx, t_np, side="right") - 1
        next_k = np.minimum(np.searchsorted(idx, t_np, side="left"),
                            len(idx) - 1)
        s_, e_ = idx[prev_k], idx[next_k]
        w_np = np.where(mask_np, 0.0,
                        (t_np - s_) / np.maximum(e_ - s_, 1))
        w = jnp.asarray(w_np, dtype)[None, :, None, None]
        fx = fx_k[:, prev_k] * (1.0 - w) + fx_k[:, next_k] * w
        fu = fu_k[:, prev_k] * (1.0 - w) + fu_k[:, next_k] * w
        pct = jnp.full((B,), 100.0 * len(idx) / T, dtype)
        return fx, fu, pct
    elif cfg.keypoint_method == ADAPTIVE_JERK:
        masks = jax.vmap(lambda xt: adaptive_jerk_mask(cfg, xt, N, n))(x)
        budget = (int(cfg.max_keypoints) if cfg.max_keypoints is not None
                  else _adaptive_jerk_budget(cfg, N))
        budget = min(budget, T)
        order = jax.vmap(
            lambda mk: jnp.argsort(~mk, stable=True)[:budget])(masks)
        take = lambda a, o: jnp.take_along_axis(
            a, o.reshape(B, budget, *(1,) * (a.ndim - 2)), axis=1)
        fx_k, fu_k = at_indices(take(x[:, :-1], order), take(u, order),
                                take(xn, order))
        scat = jax.vmap(lambda z, o, fk: z.at[o].set(fk))
        fx = scat(jnp.zeros((B, T, n, n), dtype), order, fx_k)
        fu = scat(jnp.zeros((B, T, n, m), dtype), order, fu_k)
        pct = (100.0 * jnp.sum(masks, axis=1) / T).astype(dtype)
    else:  # ITERATIVE_ERROR
        if cfg.max_keypoints is not None and (N - 2) > cfg.minN:
            return _iterative_error_sparse_batched(
                at_indices, cfg, x, u, cfg.max_keypoints)
        # (at_indices closes over root/xn, so the sparse path above and
        # the dense fallback below both inherit root seeding)
        # Dense fallback: full stack, then replay the bisection on it.
        fx, fu = dense()
        masks = jax.vmap(lambda f: iterative_error_mask(cfg, f, N))(fx)
        pct = (100.0 * jnp.sum(masks, axis=1) / T).astype(dtype)

    return interp(masks, fx), interp(masks, fu), pct


def _iterative_error_sparse_batched(
    at_indices: Callable, cfg: DerivsInterpolation,
    x: jax.Array, u: jax.Array, budget: int,
):
    """Batched twin of :func:`_iterative_error_sparse`.

    Every (scenario, candidate-mid) pair at a tree level becomes one lane
    of a single ``at_indices`` call, so the lane-major Jacobian kernel sees
    B*cap lanes per level instead of B*(N-1) dense lanes.
    """
    B, N, n = x.shape
    m = u.shape[-1]
    T = N - 1
    dtype = x.dtype
    thr = cfg.iterative_error_threshold
    levels = _dyadic_tree(N, cfg.minN)
    caps = _level_caps(levels, max(3, int(budget)))

    fx_buf = jnp.zeros((B, T, n, n), dtype)
    fu_buf = jnp.zeros((B, T, n, m), dtype)
    visited = jnp.zeros((B, T), bool)
    scat = jax.vmap(lambda z, o, v: z.at[o].set(v, mode="drop"))
    gat = lambda buf, ii: jnp.take_along_axis(
        buf, ii.reshape(B, -1, 1, 1), axis=1)

    s0, e0, m0 = 0, N - 2, (N - 2) // 2
    idx0 = np.array([s0, m0, e0], np.int32)
    fx_k, fu_k = at_indices(x[:, idx0], u[:, idx0], x[:, idx0 + 1])
    fx_buf = fx_buf.at[:, idx0].set(fx_k)
    fu_buf = fu_buf.at[:, idx0].set(fu_k)
    visited = visited.at[:, idx0].set(True)
    err0 = jnp.sum(
        (0.5 * (fx_buf[:, s0] + fx_buf[:, e0]) - fx_buf[:, m0]) ** 2,
        axis=(-2, -1)) / (2 * n)
    bad0 = err0 > thr
    active = jnp.stack([bad0, bad0], axis=1)  # (B, 2)

    for (starts, ends, mids, wide), cap in zip(levels[1:], caps[1:]):
        if cap == 0:
            break
        want = active & jnp.asarray(wide)[None]  # (B, L)
        order = jnp.argsort(~want, axis=1, stable=True)[:, :cap]  # (B, cap)
        checked = jnp.take_along_axis(want, order, axis=1)
        idx = jnp.where(checked, jnp.asarray(mids)[order], T)
        idx_c = jnp.minimum(idx, T - 1)[..., None]
        fx_k, fu_k = at_indices(
            jnp.take_along_axis(x[:, :T], idx_c, axis=1),
            jnp.take_along_axis(u, idx_c, axis=1),
            jnp.take_along_axis(x[:, 1:], idx_c, axis=1))
        fx_buf = scat(fx_buf, idx, fx_k)
        fu_buf = scat(fu_buf, idx, fu_k)
        visited = scat(visited, idx, jnp.ones_like(checked))
        s_l = jnp.asarray(starts)[order]
        e_l = jnp.asarray(ends)[order]
        m_l = jnp.asarray(mids)[order]
        err = jnp.sum(
            (0.5 * (gat(fx_buf, s_l) + gat(fx_buf, e_l)) - gat(fx_buf, m_l))
            ** 2, axis=(-2, -1)) / (2 * n)
        bad_lane = checked & (err > thr)
        bad = jax.vmap(lambda o, v: jnp.zeros(len(starts), bool).at[o].set(v))(
            order, bad_lane)
        active = jnp.concatenate([bad, bad], axis=1)

    interp = jax.vmap(interpolate_stack)
    pct = (100.0 * jnp.sum(visited, axis=1) / T).astype(dtype)
    return interp(visited, fx_buf), interp(visited, fu_buf), pct


def compute_derivatives(
    step: Callable,
    cfg: DerivsInterpolation,
    x: jax.Array,
    u: jax.Array,
):
    """Compute (fx, fu, percentage_derivs) for a trajectory.

    Mirrors reference ``_get_derivatives`` (ilqr.py:380-415): choose
    keypoints by the configured method, evaluate exact Jacobians there,
    linearly interpolate in between, and report the percentage of
    timesteps with exact derivatives.

    Args:
        step: pure dynamics function (x, u) -> x_next.
        cfg: interpolation config (validated).
        x: (N, n) trajectory.
        u: (N-1, m) control tape.
    Returns:
        fx: (N-1, n, n), fu: (N-1, n, m), percent: scalar in [0, 100].
    """
    N = x.shape[0]

    if is_baseline(cfg):
        fx, fu = _dense_jacobians(step, x, u, cfg.jac_chunk)
        return fx, fu, jnp.asarray(100.0, x.dtype)

    if cfg.keypoint_method == SET_INTERVAL:
        mask = jnp.asarray(set_interval_mask(N, cfg.minN))
    elif cfg.keypoint_method == ADAPTIVE_JERK:
        mask = adaptive_jerk_mask(cfg, x, N, x.shape[1])
    elif cfg.keypoint_method == ITERATIVE_ERROR:
        if cfg.max_keypoints is not None and (N - 2) > cfg.minN:
            return _iterative_error_sparse(step, cfg, x, u,
                                           cfg.max_keypoints, cfg.jac_chunk)
        fx_full, fu_full = _dense_jacobians(step, x, u, cfg.jac_chunk)
        mask = iterative_error_mask(cfg, fx_full, N)
        fx = interpolate_stack(mask, fx_full)
        fu = interpolate_stack(mask, fu_full)
        percent = 100.0 * jnp.sum(mask) / (N - 1)
        return fx, fu, percent.astype(x.dtype)
    else:  # pragma: no cover — guarded by validate()
        raise ValueError(cfg.keypoint_method)

    if cfg.max_keypoints is not None:
        budget = cfg.max_keypoints
    elif cfg.keypoint_method == SET_INTERVAL:
        # Static mask: budget is exactly the keypoint count.
        budget = int(set_interval_mask(N, cfg.minN).sum())
    else:
        # adaptiveJerk: spacing >= min(minN, maxN) makes this sufficient.
        budget = _adaptive_jerk_budget(cfg, N)
    fx, fu = _sparse_jacobians(step, x, u, mask, budget, cfg.jac_chunk)

    fx = interpolate_stack(mask, fx)
    fu = interpolate_stack(mask, fu)
    percent = 100.0 * jnp.sum(mask) / (N - 1)
    return fx, fu, percent.astype(x.dtype)
