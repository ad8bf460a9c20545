"""Tests for the unified few-step sampler (tdm_tpu.core.sampling).

Uses analytic denoisers (models that know the true x₀ of a point-mass data
distribution) so correctness is exact, not statistical.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tdm_tpu.core import sampling, schedules as sched

SHAPE = (2, 4, 8, 8)


def exact_eps_denoiser(x0_true):
    """ε̂(x,t) = (x - α·x₀)/σ — exact for a point mass at x0_true."""

    def fn(x, t, cond):
        a, s = sched.alpha_sigma(DDPM, t, x.ndim)
        return (x - a * x0_true) / s

    return fn


DDPM = sched.ddpm_linear()


def test_exact_denoiser_recovers_x0():
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, SHAPE)
    noise = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
    grid = sched.fewstep_grid(900, 4)
    out = sampling.sample_fewstep(
        exact_eps_denoiser(x0), DDPM, noise, None, timestep_grid=grid
    )
    np.testing.assert_allclose(out, x0, atol=1e-3)


def test_trajectory_shapes_and_states():
    x0 = jnp.zeros(SHAPE)
    noise = jax.random.normal(jax.random.PRNGKey(2), SHAPE)
    grid = sched.fewstep_grid(900, 4)
    traj = sampling.sample_fewstep(
        exact_eps_denoiser(x0),
        DDPM,
        noise,
        None,
        timestep_grid=grid,
        return_trajectory=True,
    )
    assert traj.states.shape == (5,) + SHAPE
    assert traj.x0s.shape == (4,) + SHAPE
    assert traj.noise_preds.shape == (4,) + SHAPE
    # states[0] is the input noise; final == x0s[-1]
    np.testing.assert_allclose(traj.states[0], noise)
    np.testing.assert_allclose(traj.final, traj.x0s[-1])
    # with an exact denoiser, every intermediate state sits exactly on the
    # forward process at its grid level: x_k = α(t_k)x₀ + σ(t_k)ε̂
    for k in range(1, 4):
        a, s = sched.alpha_sigma(DDPM, grid[k], 4)
        expected = a * x0 + s * traj.noise_preds[k - 1]
        np.testing.assert_allclose(traj.states[k], expected, atol=1e-4)


def test_cfg_mixing():
    """With cfg, output uses u + w(c-u) of the two branches
    (reference src/predictor.py:42)."""
    eps_c = jnp.full(SHAPE, 0.5)
    eps_u = jnp.full(SHAPE, -0.5)

    def fn(x, t, cond):
        return eps_c if cond == "c" else eps_u

    grid = jnp.array([899], dtype=jnp.int32)
    noise = jnp.zeros(SHAPE)
    out = sampling.sample_fewstep(
        fn, DDPM, noise, "c", uncond="u", cfg=4.5, timestep_grid=grid
    )
    mixed = eps_u + 4.5 * (eps_c - eps_u)
    a, s = sched.alpha_sigma(DDPM, grid[0], 4)
    np.testing.assert_allclose(out, (noise - s * mixed) / a, atol=1e-4)


def test_predict_x0_pair():
    x0 = jax.random.normal(jax.random.PRNGKey(3), SHAPE)
    eps = jax.random.normal(jax.random.PRNGKey(4), SHAPE)
    t = jnp.array([450, 450])
    x_t = sched.add_noise(DDPM, x0, eps, t)

    def fn(x, tt, cond):
        # cond branch exact, uncond branch biased
        return eps if cond == "c" else eps + 1.0

    x0_cfg, x0_nocfg = sampling.predict_x0(
        fn, DDPM, x_t, t, "c", uncond="u", cfg=2.0
    )
    np.testing.assert_allclose(x0_nocfg, x0, atol=1e-3)
    # cfg=2 ⇒ mixed ε = (ε+1) + 2(ε - (ε+1)) = ε - 1
    a, s = sched.alpha_sigma(DDPM, t, 4)
    np.testing.assert_allclose(x0_cfg, (x_t - s * (eps - 1.0)) / a, atol=1e-3)


def test_gather_trajectory_states():
    x0 = jnp.zeros(SHAPE)
    noise = jax.random.normal(jax.random.PRNGKey(5), SHAPE)
    grid = sched.fewstep_grid(900, 4)
    traj = sampling.sample_fewstep(
        exact_eps_denoiser(x0),
        DDPM,
        noise,
        None,
        timestep_grid=grid,
        return_trajectory=True,
    )
    seg = jnp.array([0, 3])
    state, level = sampling.gather_trajectory_states(traj, grid, seg)
    np.testing.assert_allclose(state[0], traj.states[0][0])
    np.testing.assert_allclose(state[1], traj.states[3][1])
    np.testing.assert_array_equal(level, [899, 224])
    # seg = K selects the final x₀ at level 0
    state4, level4 = sampling.gather_trajectory_states(
        traj, grid, jnp.array([4, 4])
    )
    np.testing.assert_allclose(state4[0], traj.final[0])
    np.testing.assert_array_equal(level4, [0, 0])


def test_sampler_is_jittable_and_deterministic():
    x0 = jax.random.normal(jax.random.PRNGKey(6), SHAPE)
    grid = sched.fewstep_grid(1000, 4)
    f = jax.jit(
        lambda n: sampling.sample_fewstep(
            exact_eps_denoiser(x0), DDPM, n, None, timestep_grid=grid
        )
    )
    noise = jax.random.normal(jax.random.PRNGKey(7), SHAPE)
    np.testing.assert_allclose(f(noise), f(noise))
