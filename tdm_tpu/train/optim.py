"""Optimizers, LR schedules, and EMA — optax equivalents of the reference's
torch/bitsandbytes stack.

Reference surface being replaced:
  * AdamW / bitsandbytes AdamW8bit (`src/main.py:206-224`)
  * `get_scheduler` with constant / linear / cosine / cosine_with_restarts /
    polynomial + warmup (`src/main.py:313-318`, `src/args.py:161-172`);
    the training recipe uses cosine_with_restarts + 50 warmup steps
    (`README.md:171-172`)
  * grad clip 1.0 (`src/main.py:537`, `src/args.py:214`)
  * EMA via diffusers `EMAModel` (`src/main.py:188-189,325-326,553-554`)
  * `--scale_lr` (`src/main.py:200-203`)

8-bit Adam: on TPU the equivalent memory saving is bf16 second moments
(`mu_dtype`/`nu_dtype` below) — blockwise-int8 state quantization is a
possible later upgrade but bf16 moments already halve optimizer HBM.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax


def make_lr_schedule(
    name: str,
    base_lr: float,
    *,
    warmup_steps: int = 0,
    total_steps: int = 10000,
    num_cycles: float = 1.0,
    power: float = 1.0,
) -> optax.Schedule:
    """HF `get_scheduler`-compatible LR schedules (names per
    `src/args.py:161-167`)."""

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.where(
            warmup_steps > 0, step / jnp.maximum(warmup_steps, 1), 1.0
        )
        progress = (step - warmup_steps) / jnp.maximum(
            total_steps - warmup_steps, 1
        )
        progress = jnp.clip(progress, 0.0, 1.0)
        if name == "constant":
            decay = 1.0
        elif name == "constant_with_warmup":
            decay = 1.0
        elif name == "linear":
            decay = 1.0 - progress
        elif name == "cosine":
            decay = 0.5 * (1.0 + jnp.cos(math.pi * num_cycles * 2.0 * progress))
        elif name == "cosine_with_restarts":
            # hard restarts: decay 1→0 within each of `num_cycles` cycles
            cycle_pos = (progress * num_cycles) % 1.0
            decay = jnp.where(
                progress >= 1.0, 0.0, 0.5 * (1.0 + jnp.cos(math.pi * cycle_pos))
            )
        elif name == "polynomial":
            decay = (1.0 - progress) ** power
        else:
            raise ValueError(f"unknown lr schedule {name!r}")
        return base_lr * jnp.minimum(warm, 1.0) * decay

    return sched


def make_optimizer(
    lr: optax.Schedule | float,
    *,
    betas: tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
    max_grad_norm: Optional[float] = 1.0,
    low_precision_moments: bool = False,
) -> optax.GradientTransformation:
    """clip(1.0) → AdamW, the reference's update rule (`src/main.py:206-224,
    537`). `low_precision_moments` stores both Adam moments in bf16 — the
    TPU stand-in for bitsandbytes' 8-bit state."""
    adam = optax.adamw(
        lr,
        b1=betas[0],
        b2=betas[1],
        eps=eps,
        weight_decay=weight_decay,
        mu_dtype=jnp.bfloat16 if low_precision_moments else None,
    )
    if max_grad_norm is None:
        return adam
    return optax.chain(optax.clip_by_global_norm(max_grad_norm), adam)


def ema_update(ema_params: Any, new_params: Any, decay: float) -> Any:
    """Polyak average (diffusers EMAModel equivalent): e ← d·e + (1-d)·p."""
    return jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p.astype(e.dtype),
        ema_params,
        new_params,
    )


def global_norm(tree: Any) -> jnp.ndarray:
    return optax.global_norm(tree)
