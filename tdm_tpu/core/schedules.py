"""Diffusion noise schedules as precomputed JAX tables + pure schedule math.

TPU-native replacement for the scheduler *objects* the reference pulls from
diffusers and for its in-repo schedule math:

  * DDPMScheduler (linear β ∈ [1e-4, 0.02], 1000 steps, ε-prediction) and the
    fp16 ᾱ-derived α/σ tables — reference `src/main.py:132-139`.
  * `predicted_origin` / `extract_into_tensor` / `append_dims` / `compute_snr`
    — reference `src/utils.py:21-73`.
  * `Predictor.add_noise` (inter-timestep noise transport) and
    `Predictor.obtain_mixed_noise` — reference `src/predictor.py:76-97`.
  * The flow-matching sigma schedule with `flow_shift` used by the SD3 recipe
    (Sana scheduler config, `README.md:54-56`).

Design stance (SURVEY.md §7): schedulers are NOT stateful classes — they are a
small pytree of precomputed tables (`NoiseSchedule`) plus pure functions, so
every consumer (the few-step sampler, the DPM-Solver loop, the TDM train step)
can inline them into a single jitted program with no host round-trips.

Conventions:
  * `t` is an integer timestep index array, any leading shape (usually [B] or
    scalar); tables are indexed with `jnp.take` and broadcast against the
    sample by appending singleton dims (reference `src/utils.py:70-73`).
  * Tables are stored fp32 for accuracy; callers cast results as needed
    (the reference keeps them fp16 on device — on TPU, fp32 tables + bf16
    compute is both faster and more accurate).
  * Forward process: x_t = α(t)·x₀ + σ(t)·ε, with α = sqrt(ᾱ), σ = sqrt(1-ᾱ)
    for DDPM-style schedules, and α = 1-σ̂, σ = σ̂ for flow-matching.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import struct

# Prediction-type enums (static ints so lax control flow is never needed —
# the type is a compile-time constant on the schedule pytree).
EPSILON = "epsilon"
V_PREDICTION = "v_prediction"
FLOW = "flow"  # model predicts velocity v = ε - x₀ (rectified flow / SD3)


@struct.dataclass
class NoiseSchedule:
    """Precomputed α/σ tables for a diffusion (or flow) forward process.

    alphas[t] and sigmas[t] are the coefficients of x₀ and ε in the forward
    process at integer train-timestep t ∈ [0, num_train_timesteps).
    """

    alphas: jnp.ndarray  # [T] fp32, ᾱ^0.5 (DDPM) or 1-σ̂ (flow)
    sigmas: jnp.ndarray  # [T] fp32, (1-ᾱ)^0.5 (DDPM) or σ̂ (flow)
    num_train_timesteps: int = struct.field(pytree_node=False, default=1000)
    prediction_type: str = struct.field(pytree_node=False, default=EPSILON)

    @property
    def alphas_cumprod(self) -> jnp.ndarray:
        """ᾱ table (only meaningful for DDPM-style schedules)."""
        return self.alphas**2


def _broadcast(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather table[t] and append singleton dims up to `ndim`.

    Vectorized equivalent of reference `extract_into_tensor`
    (`src/utils.py:70-73`) — works for scalar or batched `t` and any sample
    rank (images [B,C,H,W], videos [B,C,F,H,W], latents of any layout).
    """
    t = jnp.asarray(t)
    vals = jnp.take(table, t, axis=0)
    return vals.reshape(vals.shape + (1,) * (ndim - vals.ndim))


# ---------------------------------------------------------------------------
# Schedule constructors
# ---------------------------------------------------------------------------


def ddpm_linear(
    num_train_timesteps: int = 1000,
    beta_start: float = 1e-4,
    beta_end: float = 0.02,
    prediction_type: str = EPSILON,
) -> NoiseSchedule:
    """Linear-β DDPM schedule — the reference training schedule.

    Matches DDPMScheduler(beta_start=0.0001, beta_end=0.02, beta_schedule=
    'linear', num_train_timesteps=1000) in reference `src/main.py:132-134`
    and the derived α/σ tables at `src/main.py:136-139`.
    """
    betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    return _from_betas(betas, num_train_timesteps, prediction_type)


def ddpm_scaled_linear(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    prediction_type: str = EPSILON,
) -> NoiseSchedule:
    """Scaled-linear ("sqrt-linear") β schedule — SD1.x / SD2.x family.

    β_t = linspace(√β₀, √β₁)² . Needed for the Dreamshaper/SD1.5 recipe
    (reference `README.md:95-107`): the SD1.5 scheduler config uses
    beta_schedule='scaled_linear', β ∈ [0.00085, 0.012].
    """
    betas = (
        np.linspace(
            beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64
        )
        ** 2
    )
    return _from_betas(betas, num_train_timesteps, prediction_type)


def _from_betas(
    betas: np.ndarray, num_train_timesteps: int, prediction_type: str
) -> NoiseSchedule:
    # Tables are built host-side in float64 (cumprod of ~1000 terms loses
    # several digits in fp32) and stored fp32 on device.
    alphas_cumprod = np.cumprod(1.0 - betas)
    return NoiseSchedule(
        alphas=jnp.asarray(np.sqrt(alphas_cumprod), jnp.float32),
        sigmas=jnp.asarray(np.sqrt(1.0 - alphas_cumprod), jnp.float32),
        num_train_timesteps=num_train_timesteps,
        prediction_type=prediction_type,
    )


def cogvideox(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    snr_shift_scale: float = 3.0,
    rescale_zero_terminal_snr: bool = True,
) -> NoiseSchedule:
    """CogVideoX's training schedule: scaled-linear β, v-prediction, SNR
    shift ᾱ ← ᾱ/(s − (s−1)ᾱ), and zero-terminal-SNR rescale (the config of
    the CogVideoXPipeline scheduler the reference's video recipe runs,
    `README.md:116-138`)."""
    betas = (
        np.linspace(
            beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64
        )
        ** 2
    )
    ac = np.cumprod(1.0 - betas)
    ac = ac / (snr_shift_scale - (snr_shift_scale - 1.0) * ac)
    sqrt_ac = np.sqrt(ac)
    if rescale_zero_terminal_snr:
        # shift+scale so the final step is exactly SNR 0 (pure noise) while
        # step 0 keeps its original value
        a0, aT = sqrt_ac[0], sqrt_ac[-1]
        sqrt_ac = (sqrt_ac - aT) * a0 / (a0 - aT)
    return NoiseSchedule(
        alphas=jnp.asarray(sqrt_ac, jnp.float32),
        sigmas=jnp.asarray(np.sqrt(1.0 - sqrt_ac**2), jnp.float32),
        num_train_timesteps=num_train_timesteps,
        prediction_type=V_PREDICTION,
    )


def shift_sigma(sigma: jnp.ndarray, shift: float) -> jnp.ndarray:
    """Resolution/flow shift: σ̂ = s·σ / (1 + (s-1)·σ).

    The `flow_shift` knob of the SD3 recipe (reference `README.md:54-56`,
    shift ∈ [1, 6]); identity at s=1.
    """
    return shift * sigma / (1.0 + (shift - 1.0) * sigma)


def flow_match(
    num_train_timesteps: int = 1000,
    shift: float = 1.0,
    prediction_type: str = FLOW,
) -> NoiseSchedule:
    """Rectified-flow schedule (SD3 / Sana): x_t = (1-σ̂)x₀ + σ̂ε.

    σ(t) = (t+1)/T, optionally time-shifted by `shift` (the Sana/SD3
    `flow_shift`). t = T-1 is (almost) pure noise, t = 0 is near-clean.
    The model predicts velocity v = ε - x₀ (`FLOW` prediction type).
    """
    sigma = np.arange(1, num_train_timesteps + 1, dtype=np.float64) / float(
        num_train_timesteps
    )
    sigma = shift * sigma / (1.0 + (shift - 1.0) * sigma)
    return NoiseSchedule(
        alphas=jnp.asarray(1.0 - sigma, jnp.float32),
        sigmas=jnp.asarray(sigma, jnp.float32),
        num_train_timesteps=num_train_timesteps,
        prediction_type=prediction_type,
    )


# ---------------------------------------------------------------------------
# Pure schedule math
# ---------------------------------------------------------------------------


def native_target(
    schedule: NoiseSchedule,
    x0: jnp.ndarray,
    eps: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """The denoising-score-matching regression target in the schedule's
    NATIVE parameterization, given the clean sample and the true noise:

      epsilon:       ε
      v_prediction:  v = α·ε − σ·x₀
      flow:          v = ε − x₀

    Finite everywhere — including the terminal timestep of zero-terminal-
    SNR schedules (CogVideoX), where α = 0 makes any ε-space x₀ recovery
    divide by zero. This is exactly why those models train in v space; the
    TDM step's critic DSM loss uses this so the whole step stays in the
    model's native output space (train/tdm.py)."""
    if schedule.prediction_type == EPSILON:
        return eps
    a, s = alpha_sigma(schedule, t, x0.ndim)
    x0f, ef = x0.astype(jnp.float32), eps.astype(jnp.float32)
    if schedule.prediction_type == V_PREDICTION:
        return a * ef - s * x0f
    if schedule.prediction_type == FLOW:
        return ef - x0f
    raise ValueError(f"unknown prediction_type {schedule.prediction_type!r}")


def alpha_sigma(
    schedule: NoiseSchedule, t: jnp.ndarray, ndim: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(α(t), σ(t)) broadcast to rank-`ndim` sample shape."""
    return (
        _broadcast(schedule.alphas, t, ndim),
        _broadcast(schedule.sigmas, t, ndim),
    )


def add_noise(
    schedule: NoiseSchedule,
    x0: jnp.ndarray,
    noise: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """Forward process x_t = α(t)x₀ + σ(t)ε.

    Replaces `DDPMScheduler.add_noise` as used in reference
    `src/models.py:58` and `src/predictor.py:58,70`.
    """
    a, s = alpha_sigma(schedule, t, x0.ndim)
    return (a * x0 + s * noise).astype(x0.dtype)


def predicted_origin(
    schedule: NoiseSchedule,
    model_output: jnp.ndarray,
    t: jnp.ndarray,
    sample: jnp.ndarray,
) -> jnp.ndarray:
    """x₀ estimate from the model output at timestep t.

    Reference `src/utils.py:47-59`, extended with the FLOW branch (needed by
    SD3/CogVideoX-style rectified-flow denoisers):
      epsilon:       x₀ = (x_t - σε̂)/α
      v_prediction:  x₀ = αx_t - σv̂
      flow:          x₀ = x_t - σv̂      (v = ε - x₀, α = 1-σ)
    """
    a, s = alpha_sigma(schedule, t, sample.ndim)
    if schedule.prediction_type == EPSILON:
        x0 = (sample - s * model_output) / a
    elif schedule.prediction_type == V_PREDICTION:
        x0 = a * sample - s * model_output
    elif schedule.prediction_type == FLOW:
        x0 = sample - s * model_output
    else:
        raise ValueError(f"unknown prediction_type {schedule.prediction_type!r}")
    return x0.astype(sample.dtype)


def predicted_noise(
    schedule: NoiseSchedule,
    model_output: jnp.ndarray,
    t: jnp.ndarray,
    sample: jnp.ndarray,
) -> jnp.ndarray:
    """ε estimate from the model output at timestep t (dual of
    `predicted_origin`; used to re-noise deterministically when the model
    does not natively predict ε)."""
    a, s = alpha_sigma(schedule, t, sample.ndim)
    if schedule.prediction_type == EPSILON:
        eps = model_output
    elif schedule.prediction_type == V_PREDICTION:
        eps = s * sample + a * model_output
    elif schedule.prediction_type == FLOW:
        # x_t = (1-σ)x₀ + σε and v = ε - x₀  ⇒  ε = x_t + (1-σ)v
        eps = sample + a * model_output
    else:
        raise ValueError(f"unknown prediction_type {schedule.prediction_type!r}")
    return jnp.asarray(eps, dtype=sample.dtype)


def transport(
    schedule: NoiseSchedule,
    x_t1: jnp.ndarray,
    noise: jnp.ndarray,
    t1: jnp.ndarray,
    t2: jnp.ndarray,
) -> jnp.ndarray:
    """Inter-timestep noise transport: move x_{t1} to noise level t2 ≥ t1
    with fresh noise ε, preserving the marginal forward process:

        x_{t2} = (α₂/α₁)·x_{t1} + sqrt(σ₂² - (α₂/α₁)²σ₁²)·ε

    Reference `Predictor.add_noise` (`src/predictor.py:76-85`). The variance
    is clamped at 0: the reference NaNs when t2 < t1 (SURVEY.md §2 defect 6);
    callers must still sample t2 ≥ t1, but a clamp keeps bf16 rounding at
    t2 ≈ t1 finite.
    """
    ndim = x_t1.ndim
    a1, s1 = alpha_sigma(schedule, t1, ndim)
    a2, s2 = alpha_sigma(schedule, t2, ndim)
    ratio = a2 / a1
    var = jnp.maximum(s2**2 - (ratio * s1) ** 2, 0.0)
    return (ratio * x_t1 + jnp.sqrt(var) * noise).astype(x_t1.dtype)


def mixed_noise(
    schedule: NoiseSchedule,
    model_noise: jnp.ndarray,
    noise: jnp.ndarray,
    t1: jnp.ndarray,
    t2: jnp.ndarray,
) -> jnp.ndarray:
    """The effective total noise after `transport`.

    If x_{t1} = α₁x₀ + σ₁ε_model and x_{t2} = transport(x_{t1}, ε_fresh),
    then x_{t2} = α₂x₀ + σ₂ε_mix with

        ε_mix = ((α₂/α₁)σ₁·ε_model + sqrt(σ₂² - (α₂/α₁)²σ₁²)·ε_fresh) / σ₂

    Reference `Predictor.obtain_mixed_noise` (`src/predictor.py:87-97`).
    This is the denoising target for the fake-score critic (the critic is
    trained with a standard DSM loss on transported student samples).
    """
    ndim = model_noise.ndim
    a1, s1 = alpha_sigma(schedule, t1, ndim)
    a2, s2 = alpha_sigma(schedule, t2, ndim)
    ratio = a2 / a1
    var = jnp.maximum(s2**2 - (ratio * s1) ** 2, 0.0)
    return ((ratio * s1 * model_noise + jnp.sqrt(var) * noise) / s2).astype(
        model_noise.dtype
    )


def snr(schedule: NoiseSchedule, t: jnp.ndarray) -> jnp.ndarray:
    """Signal-to-noise ratio (α/σ)² at timestep t.

    Reference `compute_snr` (`src/utils.py:21-44`); returns shape of `t`.
    """
    a = jnp.take(schedule.alphas, jnp.asarray(t), axis=0)
    s = jnp.take(schedule.sigmas, jnp.asarray(t), axis=0)
    return (a / s) ** 2


def fewstep_grid(
    total_steps: int, num_steps: int, schedule_len: int | None = None
) -> jnp.ndarray:
    """The reference's default K-step timestep grid.

    t_k = (total_steps - 1) - k·(total_steps // K), k = 0..K-1 — the
    decrement rule of `generate_new` (reference `src/models.py:28,57`:
    T starts at total_steps-1, steps down by total_steps//K). For
    total_steps=900, K=4 (the training recipe): [899, 674, 449, 224].
    """
    start = total_steps - 1
    step = total_steps // num_steps
    grid = start - step * jnp.arange(num_steps, dtype=jnp.int32)
    return jnp.maximum(grid, 0)


def grid_from_list(timesteps: Sequence[int]) -> jnp.ndarray:
    """Custom timestep grid (the `mid_points` path of `src/models.py:54-56`),
    e.g. CogVideoX's trained grid [999, 856, 665, 399] (`README.md:129`)."""
    return jnp.asarray(list(timesteps), dtype=jnp.int32)
