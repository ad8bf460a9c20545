"""Unit tests for tdm_tpu.core.schedules — analytic identities.

The reference has no tests; its schedule math (src/utils.py, src/predictor.py)
is verified here against closed-form identities of the forward process instead
of recorded goldens (diffusers is not available in this environment).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdm_tpu.core import schedules as sched


@pytest.fixture(scope="module")
def ddpm():
    return sched.ddpm_linear()


def test_ddpm_linear_tables_match_manual(ddpm):
    betas = np.linspace(1e-4, 0.02, 1000)
    ac = np.cumprod(1.0 - betas)
    np.testing.assert_allclose(ddpm.alphas, np.sqrt(ac), rtol=1e-5)
    np.testing.assert_allclose(ddpm.sigmas, np.sqrt(1 - ac), rtol=1e-5)
    # unit-variance preserving: α² + σ² = 1
    np.testing.assert_allclose(ddpm.alphas**2 + ddpm.sigmas**2, 1.0, atol=1e-6)


def test_scaled_linear_matches_sd15_config():
    s = sched.ddpm_scaled_linear()
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
    ac = np.cumprod(1.0 - betas)
    np.testing.assert_allclose(s.alphas, np.sqrt(ac), rtol=1e-5)


def test_flow_match_shift():
    s = sched.flow_match(shift=3.0)
    # σ(T-1) shifted stays in (0,1], monotone increasing in t
    assert float(s.sigmas[-1]) == pytest.approx(1.0)
    assert np.all(np.diff(np.asarray(s.sigmas)) > 0)
    np.testing.assert_allclose(s.alphas + s.sigmas, 1.0, atol=1e-6)
    # identity at shift=1: σ = (t+1)/T
    s1 = sched.flow_match(shift=1.0)
    np.testing.assert_allclose(s1.sigmas, (np.arange(1000) + 1) / 1000, atol=1e-6)


@pytest.mark.parametrize("ptype", [sched.EPSILON, sched.V_PREDICTION, sched.FLOW])
def test_predicted_origin_roundtrip(ptype):
    """add_noise then predicted_origin recovers x₀ for every prediction type."""
    if ptype == sched.FLOW:
        s = sched.flow_match(shift=2.0)
    else:
        s = sched.ddpm_linear(prediction_type=ptype)
    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    x0 = jax.random.normal(k1, (3, 4, 8, 8))
    eps = jax.random.normal(k2, (3, 4, 8, 8))
    t = jnp.array([100, 500, 899])
    x_t = sched.add_noise(s, x0, eps, t)
    a, sg = sched.alpha_sigma(s, t, 4)
    if ptype == sched.EPSILON:
        out = eps
    elif ptype == sched.V_PREDICTION:
        out = a * eps - sg * x0
    else:  # flow velocity
        out = eps - x0
    np.testing.assert_allclose(
        sched.predicted_origin(s, out, t, x_t), x0, atol=2e-4
    )
    # predicted_noise is the dual
    np.testing.assert_allclose(
        sched.predicted_noise(s, out, t, x_t), eps, atol=2e-4
    )


def test_transport_consistency(ddpm):
    """transport + mixed_noise satisfy x_{t2} = α₂x₀ + σ₂·ε_mix exactly
    (reference Predictor.add_noise/obtain_mixed_noise, src/predictor.py:76-97)."""
    rng = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(rng, 3)
    x0 = jax.random.normal(k1, (2, 4, 8, 8))
    e1 = jax.random.normal(k2, (2, 4, 8, 8))
    e2 = jax.random.normal(k3, (2, 4, 8, 8))
    t1 = jnp.array([225, 450])
    t2 = jnp.array([400, 800])
    x_t1 = sched.add_noise(ddpm, x0, e1, t1)
    x_t2 = sched.transport(ddpm, x_t1, e2, t1, t2)
    e_mix = sched.mixed_noise(ddpm, e1, e2, t1, t2)
    np.testing.assert_allclose(
        x_t2, sched.add_noise(ddpm, x0, e_mix, t2), atol=1e-4
    )
    # ε_mix combines two unit gaussians with total coefficient 1
    a1, s1 = sched.alpha_sigma(ddpm, t1, 1)
    a2, s2 = sched.alpha_sigma(ddpm, t2, 1)
    c1 = (a2 / a1) * s1 / s2
    c2 = jnp.sqrt(jnp.maximum(s2**2 - (a2 / a1 * s1) ** 2, 0)) / s2
    np.testing.assert_allclose(c1**2 + c2**2, 1.0, atol=1e-5)


def test_transport_clamps_negative_variance(ddpm):
    """t2 < t1 must not NaN (SURVEY.md §2 defect 6 in the reference)."""
    x = jnp.ones((1, 4, 8, 8))
    out = sched.transport(
        ddpm, x, jnp.ones_like(x), jnp.array([800]), jnp.array([100])
    )
    assert bool(jnp.all(jnp.isfinite(out)))


def test_snr_monotone(ddpm):
    t = jnp.arange(1000)
    s = sched.snr(ddpm, t)
    assert np.all(np.diff(np.asarray(s)) < 0)
    # spot value: snr = ᾱ/(1-ᾱ)
    ac = float(ddpm.alphas[500] ** 2)
    assert float(s[500]) == pytest.approx(ac / (1 - ac), rel=1e-4)


def test_fewstep_grid_matches_reference_recipe():
    # total_steps=900, K=4 (the training recipe): [899, 674, 449, 224]
    np.testing.assert_array_equal(sched.fewstep_grid(900, 4), [899, 674, 449, 224])
    np.testing.assert_array_equal(
        sched.fewstep_grid(1000, 4), [999, 749, 499, 249]
    )
    # CogVideoX trained grid via explicit list (README.md:129)
    np.testing.assert_array_equal(
        sched.grid_from_list([999, 856, 665, 399]), [999, 856, 665, 399]
    )


def test_broadcast_scalar_and_batched(ddpm):
    x = jnp.zeros((2, 4, 8, 8))
    n = jnp.ones_like(x)
    batched = sched.add_noise(ddpm, x, n, jnp.array([500, 500]))
    scalar = sched.add_noise(ddpm, x, n, jnp.asarray(500))
    np.testing.assert_allclose(batched, scalar)
    # video-rank samples broadcast too
    v = jnp.zeros((2, 4, 3, 8, 8))
    out = sched.add_noise(ddpm, v, jnp.ones_like(v), jnp.array([10, 20]))
    assert out.shape == v.shape
