"""Validation imaging — fixed-seed side-by-side grids during training.

Rebuilds `src/training.py`:
  * `save_validation_images` (`:107-121`): 4-step and 1-step student
    rollouts on FIXED (prompts, noise), TAESD decode
    (`latents / scaling_factor`), image grids to output_dir every 50 steps
    (cadence `src/main.py:541-549`).
  * `log_validation` (`:23-104`): student (4-step, cfg 1) vs teacher
    (multi-step, cfg 7) comparison from the same seed — here both run
    through our samplers instead of a diffusers pipeline.

The de-facto test strategy of the reference is exactly these grids
(SURVEY.md §4 'visual/empirical verification'); keeping them deterministic
(fixed PRNG key 42, `src/training.py:44`) makes them regression artifacts.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tdm_tpu.core import sampling, schedules as sched


def make_grid(images: np.ndarray, *, cols: Optional[int] = None) -> np.ndarray:
    """[N, H, W, 3] floats in [0,1] → one [GH, GW, 3] uint8 grid (the
    torchvision `save_image` layout)."""
    n, h, w, c = images.shape
    cols = cols or int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    grid = np.zeros((rows * h, cols * w, c), np.float32)
    for i in range(n):
        r, col = divmod(i, cols)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = images[i]
    return (np.clip(grid, 0, 1) * 255).astype(np.uint8)


def save_png(path: str, array: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(array).save(path)


def save_video_gif(path: str, frames: np.ndarray, *, fps: int = 8) -> None:
    """[F, H, W, 3] floats in [0,1] (or uint8) → animated GIF — the
    `export_to_video(..., fps=8)` of the CogVideoX recipe
    (reference `README.md:135`) without an ffmpeg dependency."""
    from PIL import Image

    if frames.dtype != np.uint8:
        frames = (np.clip(frames, 0, 1) * 255).astype(np.uint8)
    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(
        path, save_all=True, append_images=imgs[1:],
        duration=int(1000 / fps), loop=0,
    )


def save_validation_images(
    denoise_fn,
    params: Any,
    schedule: sched.NoiseSchedule,
    cond: Any,
    fixed_noise: jnp.ndarray,
    decode_fn,
    *,
    output_dir: str,
    step: int,
    total_steps: int = 900,
    steps_list: tuple = (4, 1),
    prefix: str = "validation",
    write: bool = True,
) -> dict[int, np.ndarray]:
    """K-step rollouts on fixed (cond, noise) → decoded grids on disk.
    Returns {K: grid array} so trackers can log them too.

    denoise_fn(params, x, t, cond) is the training-step contract;
    decode_fn(latents) → [B, 3, H, W]-ish in [0,1]. `write=False` skips the
    PNG dump (multi-host: every process computes — the gathers are
    collective — but only rank 0 writes, `src/training.py:118-121`)."""
    if write:
        os.makedirs(output_dir, exist_ok=True)
    grids: dict[int, np.ndarray] = {}
    for k in steps_list:
        grid_t = sched.fewstep_grid(total_steps, k)
        latents = sampling.sample_fewstep(
            lambda x, t, c: denoise_fn(params, x, t, c),
            schedule, fixed_noise, cond, timestep_grid=grid_t,
        )
        decoded = np.asarray(decode_fn(latents), np.float32)
        imgs = np.clip(np.transpose(decoded, (0, 2, 3, 1)), 0, 1)
        grid = make_grid(imgs)
        if write:
            save_png(
                os.path.join(output_dir, f"{prefix}_step{step}_{k}nfe.png"),
                grid,
            )
        grids[k] = grid
    return grids


def log_validation(
    denoise_fn,
    student_params: Any,
    teacher_params: Any,
    schedule: sched.NoiseSchedule,
    cond: Any,
    uncond: Any,
    decode_fn,
    *,
    output_dir: str,
    step: int,
    sample_shape: tuple,
    student_steps: int = 4,
    teacher_steps: int = 28,
    teacher_cfg: float = 7.0,
    total_steps: int = 900,
    seed: int = 42,
) -> dict[str, np.ndarray]:
    """Student (K-step, cfg 1) vs teacher (multi-step, cfg 7) from the same
    fixed seed (the `log_validation` comparison, `src/training.py:64-83`)."""
    batch = jax.tree.leaves(cond)[0].shape[0]
    noise = jax.random.normal(
        jax.random.PRNGKey(seed), (batch, *sample_shape), jnp.float32
    )
    out: dict[str, np.ndarray] = {}
    runs = {
        "student": dict(params=student_params, steps=student_steps, cfg=None),
        "teacher": dict(params=teacher_params, steps=teacher_steps, cfg=teacher_cfg),
    }
    os.makedirs(output_dir, exist_ok=True)
    for name, r in runs.items():
        grid_t = sched.fewstep_grid(total_steps, r["steps"])
        latents = sampling.sample_fewstep(
            lambda x, t, c: denoise_fn(r["params"], x, t, c),
            schedule, noise, cond, timestep_grid=grid_t,
            uncond=uncond if r["cfg"] else None, cfg=r["cfg"],
        )
        decoded = np.asarray(decode_fn(latents), np.float32)
        imgs = np.clip(np.transpose(decoded, (0, 2, 3, 1)), 0, 1)
        grid = make_grid(imgs)
        save_png(os.path.join(output_dir, f"compare_step{step}_{name}.png"), grid)
        out[name] = grid
    return out
