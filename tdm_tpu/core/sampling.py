"""Unified few-step trajectory sampler as a single `lax.scan`.

Generalizes the two sampling cores of the reference —
`generate_new` (`src/models.py:20-62`: fixed grid, deterministic re-noise with
the *predicted* ε, optional CFG, optional trajectory capture) and
`Predictor.predict` (`src/predictor.py:30-74`: t ← t - t//steps decrement,
CFG on the score, returns (score, x₀)) — into one scan-based sampler
parameterized by (timestep grid, cfg scale, trajectory capture).

The denoiser is abstracted as a pure function

    denoise_fn(x, t, cond) -> model_output            # ε, v, or flow velocity

where `cond` is an arbitrary pytree of conditioning (text embeddings + mask
for PixArt; pooled+sequence embeddings for SD3; ...). Model-specific quirks —
e.g. PixArt's learned-variance channel split `chunk(2, dim=1)[0]`
(`src/models.py:40`, `src/predictor.py:35,40`) — live inside the model
wrapper, not here.

Everything (CFG mix, x₀ projection, deterministic DDIM-style re-noise) stays
inside the scan so the whole K-NFE rollout compiles to one XLA program with
no host round-trips (SURVEY.md §7 design stance).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from tdm_tpu.core import schedules as sched

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray, Any], jnp.ndarray]


class Trajectory(NamedTuple):
    """Rollout capture (the `return_mid=True` path of `src/models.py:60-62`).

    states[k] is the noisy sample *entering* step k (so states[0] is pure
    noise at t = grid[0]); states[K] is the final x₀ estimate. x0s[k] is the
    x₀ estimate produced at step k. Noise level of states[k] is grid[k]
    (and ≈0 for states[K]).
    """

    final: jnp.ndarray  # [B, ...]  final x₀ estimate
    states: jnp.ndarray  # [K+1, B, ...]
    x0s: jnp.ndarray  # [K, B, ...]
    noise_preds: jnp.ndarray  # [K, B, ...]  (CFG-mixed) ε estimates per step


def cfg_mix(cond_out: jnp.ndarray, uncond_out: jnp.ndarray, scale) -> jnp.ndarray:
    """Classifier-free guidance: u + w·(c - u) (reference `src/predictor.py:42`,
    `src/models.py:45`)."""
    return uncond_out + scale * (cond_out - uncond_out)


def sample_fewstep(
    denoise_fn: DenoiseFn,
    schedule: sched.NoiseSchedule,
    noise: jnp.ndarray,
    cond: Any,
    *,
    timestep_grid: jnp.ndarray,
    uncond: Any = None,
    cfg: float | None = None,
    return_trajectory: bool = False,
) -> jnp.ndarray | Trajectory:
    """Deterministic K-step sampling from pure noise.

    Per step k at t = grid[k] (reference `src/models.py:36-58`):
      1. out = denoise_fn(x, t, cond); with CFG: mix with the uncond branch.
      2. x₀ = predicted_origin(out, t, x)
      3. re-noise deterministically to the next level with the *predicted* ε
         (not fresh noise — this is what makes the trajectory deterministic):
         x ← α(t_{k+1})·x₀ + σ(t_{k+1})·ε̂. After the last step, return x₀.

    Args:
      timestep_grid: int32 [K] descending timesteps (see
        `schedules.fewstep_grid` / `grid_from_list`).
      cfg: CFG scale; None disables the uncond pass entirely (the student
        rollout in training runs CFG-off, `src/main.py:465`).
      return_trajectory: capture per-step states for the TDM train step
        (`return_mid` in the reference).
    """
    k_steps = int(timestep_grid.shape[0])
    # Next noise level after each step; the level after the last step is 0
    # (the final x₀ is returned before any re-noise, matching the reference
    # where the last add_noise result is discarded, `src/models.py:58-63`).
    next_grid = jnp.concatenate(
        [timestep_grid[1:], jnp.zeros((1,), dtype=timestep_grid.dtype)]
    )
    batched_t = noise.ndim > 0

    def step(x, scan_in):
        t, t_next = scan_in
        t_b = jnp.broadcast_to(t, (x.shape[0],)) if batched_t else t
        out = denoise_fn(x, t_b, cond)
        if cfg is not None:
            out_u = denoise_fn(x, t_b, uncond)
            out = cfg_mix(out, out_u, cfg)
        x0 = sched.predicted_origin(schedule, out, t_b, x)
        eps = sched.predicted_noise(schedule, out, t_b, x)
        t_next_b = jnp.broadcast_to(t_next, (x.shape[0],)) if batched_t else t_next
        x_next = sched.add_noise(schedule, x0, eps, t_next_b)
        return x_next, (x, x0, eps)

    final_state, (states, x0s, noise_preds) = jax.lax.scan(
        step, noise, (timestep_grid, next_grid), length=k_steps
    )
    final = x0s[-1]
    if not return_trajectory:
        return final
    # states entering each step, plus the final x₀ appended (the reference
    # appends `latent` to noisy_imgs_list after the loop, `src/models.py:59`).
    states_full = jnp.concatenate([states, final[None]], axis=0)
    return Trajectory(
        final=final, states=states_full, x0s=x0s, noise_preds=noise_preds
    )


def predict_x0(
    denoise_fn: DenoiseFn,
    schedule: sched.NoiseSchedule,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    cond: Any,
    *,
    uncond: Any = None,
    cfg: float | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Single-step x₀ prediction with optional CFG on the raw model output.

    The steps=1 path of `Predictor.predict` (`src/predictor.py:30-74`).
    Returns (x₀ under CFG-mixed output, x₀ under the cond-only output) —
    the (cond, no-cfg) pair the training loop needs for the teacher target
    (SURVEY.md §2 defect 3: the reference's `return_double` arity is fixed
    here by always returning both).
    """
    out_c = denoise_fn(x_t, t, cond)
    if cfg is None:
        x0 = sched.predicted_origin(schedule, out_c, t, x_t)
        return x0, x0
    out_u = denoise_fn(x_t, t, uncond)
    mixed = cfg_mix(out_c, out_u, cfg)
    x0_cfg = sched.predicted_origin(schedule, mixed, t, x_t)
    x0_nocfg = sched.predicted_origin(schedule, out_c, t, x_t)
    return x0_cfg, x0_nocfg


def gather_trajectory_states(
    traj: Trajectory, timestep_grid: jnp.ndarray, seg: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample gather of a trajectory point by segment index.

    Fixes SURVEY.md §2 defect 2 (the reference indexes a Python list with a
    batched tensor, `src/main.py:473,479`): `traj.states` is stacked
    [K+1, B, ...]; this gathers states[seg[b], b] for each sample b and
    returns (state, its noise level). `seg` ∈ [0, K]: seg=k selects the
    state *entering* step k (level grid[k]); seg=K selects the final x₀
    (level 0).
    """
    k_steps = int(timestep_grid.shape[0])
    levels = jnp.concatenate(
        [timestep_grid, jnp.zeros((1,), dtype=timestep_grid.dtype)]
    )
    state = jnp.take_along_axis(
        traj.states,
        seg.reshape((1, -1) + (1,) * (traj.states.ndim - 2)),
        axis=0,
    )[0]
    return state, jnp.take(levels, jnp.clip(seg, 0, k_steps))
