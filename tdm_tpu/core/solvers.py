"""DPM-Solver++ (2M) multistep sampler as one fused `lax.scan`.

TPU-native replacement for diffusers' `DPMSolverMultistepScheduler`, which is
the sampler the released TDM checkpoints run on:
  * SD3: Sana-1600M scheduler config with flow sigmas and `flow_shift` ∈ [1,6]
    (reference `README.md:54-56,69`),
  * Dreamshaper/SD1.5: the SD1.5 scheduler config (`README.md:97`),
  * CogVideoX: the stock pipeline scheduler (`README.md:116-138`).

Unlike the stateful diffusers class (set_timesteps → per-step `step()` calls
with Python-side order bookkeeping), everything here is precomputed into a
`SolverGrid` pytree and the whole K-NFE loop — denoiser forward, CFG mix,
x₀ projection, 2nd-order multistep update — compiles into a single jitted
scan with no host round-trips (BASELINE.json north star: "multistep update
plus the flow-shift timestep schedule fuse into a single on-device 4-NFE
sampling loop").

Algorithm: DPM-Solver++(2M) [Lu et al. 2022, arXiv:2211.01095], data-space
formulation, with `lower_order_final` (first-order on the first and last
step), matching the diffusers defaults used by all three recipes.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from tdm_tpu.core import schedules as sched
from tdm_tpu.core.sampling import cfg_mix

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray, Any], jnp.ndarray]


@struct.dataclass
class SolverGrid:
    """Precomputed inference grid for a K-step DPM-Solver++ run.

    model_t[i] is the timestep fed to the denoiser at step i (float — flow
    models take continuous timesteps; integer-table models get it rounded by
    their wrapper). alphas/sigmas[i] are the forward-process coefficients at
    step i, with index K holding the terminal level (α=1, σ=0).
    """

    model_t: jnp.ndarray  # [K] fp32
    alphas: jnp.ndarray  # [K+1] fp32
    sigmas: jnp.ndarray  # [K+1] fp32
    prediction_type: str = struct.field(pytree_node=False, default=sched.EPSILON)

    @property
    def num_steps(self) -> int:
        return self.model_t.shape[0]


def flow_grid(
    num_steps: int,
    *,
    num_train_timesteps: int = 1000,
    flow_shift: float = 3.0,
) -> SolverGrid:
    """Inference grid for rectified-flow models (SD3 path).

    σ_i = flow-shifted linspace from ~1 down to ~0 over K steps; model
    timesteps are σ·num_train_timesteps (continuous), matching the Sana
    scheduler config + `flow_shift` knob of `README.md:54-56`.
    """
    alphas_lin = np.linspace(1.0, 1.0 / num_train_timesteps, num_steps + 1)
    sigma = 1.0 - alphas_lin  # ascending 0 → ~1
    sigma = flow_shift * sigma / (1.0 + (flow_shift - 1.0) * sigma)
    sigma = sigma[::-1][:-1]  # descending, K values (drop the 0)
    model_t = sigma * num_train_timesteps
    sigmas = np.concatenate([sigma, [0.0]])
    alphas = 1.0 - sigmas
    return SolverGrid(
        model_t=jnp.asarray(model_t, jnp.float32),
        alphas=jnp.asarray(alphas, jnp.float32),
        sigmas=jnp.asarray(sigmas, jnp.float32),
        prediction_type=sched.FLOW,
    )


def ddpm_grid(
    schedule: sched.NoiseSchedule,
    num_steps: int,
    *,
    timestep_spacing: str = "linspace",
    steps_offset: int = 0,
) -> SolverGrid:
    """Inference grid over a discrete DDPM schedule (SD1.5 / PixArt path).

    Picks K integer timesteps from the train schedule (descending) and reads
    α/σ from the tables; terminal level is (α=1, σ=0).
    """
    t_max = schedule.num_train_timesteps
    if timestep_spacing == "linspace":
        ts = np.linspace(0, t_max - 1, num_steps + 1).round()[::-1][:-1]
    elif timestep_spacing == "leading":
        # diffusers 'leading' (the SD1.5 scheduler convention): step_ratio
        # = T // K, grid = arange(K)·ratio reversed, + steps_offset
        step = t_max // num_steps
        ts = (np.arange(0, num_steps) * step).round()[::-1] + steps_offset
    elif timestep_spacing == "trailing":
        ts = np.arange(t_max, 0, -t_max / num_steps).round() - 1
    else:
        raise ValueError(f"unknown timestep_spacing {timestep_spacing!r}")
    ts = jnp.asarray(ts, jnp.int32)
    a = jnp.take(schedule.alphas, ts)
    s = jnp.take(schedule.sigmas, ts)
    return SolverGrid(
        model_t=ts.astype(jnp.float32),
        alphas=jnp.concatenate([a, jnp.ones((1,), jnp.float32)]),
        sigmas=jnp.concatenate([s, jnp.zeros((1,), jnp.float32)]),
        prediction_type=schedule.prediction_type,
    )


def _to_x0(
    grid: SolverGrid, model_output: jnp.ndarray, i: jnp.ndarray, sample: jnp.ndarray
) -> jnp.ndarray:
    """x₀ projection at inference-grid index i (data-prediction form)."""
    ndim = sample.ndim
    a = jnp.take(grid.alphas, i).reshape((1,) * ndim)
    s = jnp.take(grid.sigmas, i).reshape((1,) * ndim)
    if grid.prediction_type == sched.EPSILON:
        return (sample - s * model_output) / a
    if grid.prediction_type == sched.V_PREDICTION:
        return a * sample - s * model_output
    if grid.prediction_type == sched.FLOW:
        return sample - s * model_output
    raise ValueError(f"unknown prediction_type {grid.prediction_type!r}")


def sample_lcm(
    denoise_fn: DenoiseFn,
    grid: SolverGrid,
    noise: jnp.ndarray,
    cond: Any,
    *,
    rng: jax.Array | None = None,
    uncond: Any = None,
    cfg: float | None = None,
) -> jnp.ndarray:
    """LCM multistep sampling as one scan — diffusers `LCMScheduler`, the
    reference's validation sampler (`src/training.py:37,61`).

    Per step i: x₀ = project(model output); if not last step, re-noise to
    level i+1 with FRESH noise (x ← α_{i+1}x₀ + σ_{i+1}ε, the stochastic
    LCM step — unlike the deterministic TDM rollout which reuses the
    predicted ε, `core/sampling.py`). Last step returns x₀."""
    k_steps = grid.num_steps
    rng = jax.random.PRNGKey(0) if rng is None else rng
    step_keys = jax.random.split(rng, k_steps)

    def step(x, scan_in):
        i, key = scan_in
        t = jnp.take(grid.model_t, i)
        t_b = jnp.broadcast_to(t, (x.shape[0],))
        out = denoise_fn(x, t_b, cond)
        if cfg is not None:
            out = cfg_mix(out, denoise_fn(x, t_b, uncond), cfg)
        x0 = _to_x0(grid, out.astype(jnp.float32), i, x.astype(jnp.float32))
        ndim = x.ndim
        a_next = jnp.take(grid.alphas, i + 1).reshape((1,) * ndim)
        s_next = jnp.take(grid.sigmas, i + 1).reshape((1,) * ndim)
        eps = jax.random.normal(key, x.shape, jnp.float32)
        x_next = a_next * x0 + s_next * eps  # σ_K = 0 ⇒ final step = x₀
        return x_next.astype(x.dtype), None

    x_final, _ = jax.lax.scan(
        step, noise, (jnp.arange(k_steps), step_keys)
    )
    return x_final


def sample_unipc(
    denoise_fn: DenoiseFn,
    grid: SolverGrid,
    noise: jnp.ndarray,
    cond: Any,
    *,
    uncond: Any = None,
    cfg: float | None = None,
    solver_order: int = 2,
    solver_type: str = "bh2",
    corrector: bool = True,
) -> jnp.ndarray:
    """UniPC multistep sampling as one fused scan — the TPU-native analog of
    diffusers' `UniPCMultistepScheduler` [Zhao et al. 2023, arXiv:2302.04867],
    data-prediction form with the `bh2` B(h) and `lower_order_final`
    defaults. A solver-zoo extension beyond the reference's DPM-Solver /
    LCM surface (`/root/reference/README.md:54-56`, `src/training.py:37`):
    same K NFE as `sample_dpm_solver`, but each step's fresh model output
    first CORRECTS the current sample (UniC) before driving the next
    prediction (UniP) — one effective order higher for free.

    Identities worth knowing (tested): with `corrector=False`, UniP-2(bh2)
    reduces exactly to DPM-Solver++(2M), since the order-2 predictor uses
    the same rho = 1/2 update. All per-step coefficients derive from
    λ = log(α/σ); the terminal σ=0 step degenerates to the exact x₀ landing
    through the same clamped-λ limit the DPM path uses.
    """
    if solver_order not in (1, 2):
        raise ValueError(f"solver_order must be 1 or 2, got {solver_order}")
    if solver_type not in ("bh1", "bh2"):
        raise ValueError(f"unknown solver_type {solver_type!r} (bh1|bh2)")
    k_steps = grid.num_steps
    lam = jnp.log(jnp.maximum(grid.alphas, 1e-20)) - jnp.log(
        jnp.maximum(grid.sigmas, 1e-20)
    )
    compute_dtype = noise.dtype

    def coeffs(h):
        """(h_phi_1, B_h, b1, b2) of one λ-interval h>0 (data-pred form)."""
        hh = -h
        h_phi_1 = jnp.expm1(hh)
        b_h = h_phi_1 if solver_type == "bh2" else hh
        h_phi_k1 = h_phi_1 / hh - 1.0
        b1 = h_phi_k1 / b_h
        b2 = 2.0 * (h_phi_k1 / hh - 0.5) / b_h
        return h_phi_1, b_h, b1, b2

    def step(carry, i):
        x, x_last, m1, m2 = carry
        t = jnp.take(grid.model_t, i)
        t_b = jnp.broadcast_to(t, (x.shape[0],))
        out = denoise_fn(x, t_b, cond)
        if cfg is not None:
            out = cfg_mix(out, denoise_fn(x, t_b, uncond), cfg)
        m_t = _to_x0(grid, out.astype(jnp.float32), i, x.astype(jnp.float32))

        ndim = x.ndim
        xf = x.astype(jnp.float32)

        # ---- UniC: correct the level-i sample using its own model output
        # (the move λ_{i-1} → λ_i, re-weighted with m_t in the history) ----
        if corrector:
            im1 = jnp.maximum(i - 1, 0)
            h_c = jnp.take(lam, i) - jnp.take(lam, im1)
            h_c = jnp.where(i >= 1, h_c, 1.0)  # keep coeffs finite at i=0
            h_phi_1c, b_hc, b1c, b2c = coeffs(h_c)
            s_prev = jnp.take(grid.sigmas, im1).reshape((1,) * ndim)
            s_cur = jnp.take(grid.sigmas, i).reshape((1,) * ndim)
            a_cur = jnp.take(grid.alphas, i).reshape((1,) * ndim)
            base = (s_cur / jnp.maximum(s_prev, 1e-20)) * x_last - (
                a_cur * h_phi_1c
            ) * m1
            d1_t = m_t - m1
            # order-2 corrector needs the i-2 history point
            use2 = jnp.logical_and(i >= 2, solver_order >= 2)
            im2 = jnp.maximum(i - 2, 0)
            r0 = (jnp.take(lam, im2) - jnp.take(lam, im1)) / h_c
            r0 = jnp.where(use2, r0, -1.0)  # guarded; branch discarded o.w.
            d1_0 = (m2 - m1) / r0
            det = jnp.maximum(jnp.abs(1.0 - r0), 1e-20) * jnp.sign(1.0 - r0)
            rho0 = (b1c - b2c) / det
            rho1_2 = (b2c - r0 * b1c) / det
            corr2 = rho0 * d1_0 + rho1_2 * d1_t
            corr1 = 0.5 * d1_t
            corr = jnp.where(use2, corr2, corr1)
            x_corr = base - a_cur * b_hc * corr
            xf = jnp.where(i >= 1, x_corr, xf)

        # ---- UniP: predict level i+1 from the corrected level-i sample ----
        h = jnp.take(lam, i + 1) - jnp.take(lam, i)
        h_phi_1, b_h, _, _ = coeffs(h)
        s_i = jnp.take(grid.sigmas, i).reshape((1,) * ndim)
        s_n = jnp.take(grid.sigmas, i + 1).reshape((1,) * ndim)
        a_n = jnp.take(grid.alphas, i + 1).reshape((1,) * ndim)
        base_p = (s_n / jnp.maximum(s_i, 1e-20)) * xf - (a_n * h_phi_1) * m_t
        first_order = (i == 0) | (i == k_steps - 1) | (solver_order == 1)
        im1 = jnp.maximum(i - 1, 0)
        r0p = (jnp.take(lam, im1) - jnp.take(lam, i)) / h
        r0p = jnp.where(first_order, -1.0, r0p)
        d1_0p = (m1 - m_t) / r0p
        # rho_p = 1/2 at order 2 (the diffusers special case — and exactly
        # what makes corrector-off UniP-2(bh2) coincide with DPM++ 2M)
        x_next = base_p - jnp.where(
            first_order, 0.0, a_n * b_h * 0.5
        ) * d1_0p
        return (x_next.astype(compute_dtype), xf.astype(compute_dtype),
                m_t, m1), None

    zero = jnp.zeros_like(noise, dtype=jnp.float32)
    (x_final, _, _, _), _ = jax.lax.scan(
        step, (noise, noise, zero, zero), jnp.arange(k_steps)
    )
    return x_final


def sample_dpm_solver(
    denoise_fn: DenoiseFn,
    grid: SolverGrid,
    noise: jnp.ndarray,
    cond: Any,
    *,
    uncond: Any = None,
    cfg: float | None = None,
) -> jnp.ndarray:
    """Run the full K-NFE DPM-Solver++(2M) loop as one scan.

    Update from level i to i+1 (λ = log(α/σ), h = λ_{i+1} - λ_i):
      1st order:  x ← (σ_{i+1}/σ_i)·x - α_{i+1}·(e^{-h}-1)·x₀_i
      2M:         D = (1 + 1/(2r))·x₀_i - 1/(2r)·x₀_{i-1},  r = h_{i-1}/h
                  x ← (σ_{i+1}/σ_i)·x - α_{i+1}·(e^{-h}-1)·D
    First and last steps are first-order (multistep warmup +
    `lower_order_final`, the diffusers default for small K).

    `cfg=None` skips the uncond branch entirely — the TDM student runs at
    guidance_scale 1.0 (`README.md:61,101,120`), so the compiled program
    contains exactly K denoiser calls (4 NFE).
    """
    k_steps = grid.num_steps
    # log-SNR; terminal σ=0 ⇒ λ=+inf: the e^{-h}-1 → -1 limit is handled
    # naturally since exp(-inf)=0 and the σ_{i+1}/σ_i factor is 0.
    lam = jnp.log(jnp.maximum(grid.alphas, 1e-20)) - jnp.log(
        jnp.maximum(grid.sigmas, 1e-20)
    )
    compute_dtype = noise.dtype

    def step(carry, i):
        x, prev_x0 = carry
        t = jnp.take(grid.model_t, i)
        t_b = jnp.broadcast_to(t, (x.shape[0],))
        out = denoise_fn(x, t_b, cond)
        if cfg is not None:
            out = cfg_mix(out, denoise_fn(x, t_b, uncond), cfg)
        x0 = _to_x0(grid, out.astype(jnp.float32), i, x.astype(jnp.float32))

        ndim = x.ndim
        s_cur = jnp.take(grid.sigmas, i).reshape((1,) * ndim)
        s_next = jnp.take(grid.sigmas, i + 1).reshape((1,) * ndim)
        a_next = jnp.take(grid.alphas, i + 1).reshape((1,) * ndim)
        h = jnp.take(lam, i + 1) - jnp.take(lam, i)
        h_prev = jnp.take(lam, i) - jnp.take(lam, jnp.maximum(i - 1, 0))
        phi = jnp.expm1(-h)

        first_order = (i == 0) | (i == k_steps - 1)
        # Guard r on first-order steps where h_prev = 0 (the 2M branch is
        # discarded there, but inf/nan must not enter the jnp.where).
        r = jnp.where(first_order, 1.0, h_prev / h)
        d_2m = (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * prev_x0
        d = jnp.where(first_order, x0, d_2m)
        x_next = (s_next / jnp.maximum(s_cur, 1e-20)) * x.astype(
            jnp.float32
        ) - a_next * phi * d
        # Final step lands exactly on x₀ (σ_K = 0 ⇒ ratio 0, a·phi = -1).
        return (x_next.astype(compute_dtype), x0), None

    (x_final, _), _ = jax.lax.scan(
        step,
        (noise, jnp.zeros_like(noise, dtype=jnp.float32)),
        jnp.arange(k_steps),
    )
    return x_final
