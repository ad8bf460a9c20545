"""Tests for the fused DPM-Solver++(2M) sampler (tdm_tpu.core.solvers)."""

import jax
import jax.numpy as jnp
import numpy as np

from tdm_tpu.core import schedules as sched, solvers

SHAPE = (2, 4, 8, 8)


def test_flow_grid_structure():
    g = solvers.flow_grid(4, flow_shift=6.0)
    sig = np.asarray(g.sigmas)
    assert g.num_steps == 4
    assert sig.shape == (5,)
    assert np.all(np.diff(sig) < 0)  # descending
    assert sig[-1] == 0.0
    np.testing.assert_allclose(np.asarray(g.alphas) + sig, 1.0, atol=1e-6)
    # model timesteps = σ·1000 and shift-6 pushes σ toward 1
    np.testing.assert_allclose(g.model_t, g.sigmas[:-1] * 1000, atol=1e-3)
    g1 = solvers.flow_grid(4, flow_shift=1.0)
    assert float(g.sigmas[1]) > float(g1.sigmas[1])


def test_ddpm_grid_structure():
    s = sched.ddpm_scaled_linear()
    g = solvers.ddpm_grid(s, 4)
    ts = np.asarray(g.model_t)
    # linspace over K+1 points, reversed, terminal dropped: [999,749,500,250]
    assert ts[0] == 999 and ts[-1] == 250
    assert np.all(np.diff(ts) < 0)
    assert float(g.sigmas[-1]) == 0.0 and float(g.alphas[-1]) == 1.0


def _run_exact(grid, x0, noise, prediction):
    def fn(x, t, cond):
        i = cond  # not used; exact denoiser reads σ via closure per-call
        return prediction(x, t)

    return solvers.sample_dpm_solver(fn, grid, noise, None)


def test_flow_exact_denoiser_recovers_x0():
    """For a point-mass data distribution the exact velocity field is
    v(x,σ) = (x - x₀)/σ; DPM-Solver++ must land exactly on x₀."""
    g = solvers.flow_grid(4, flow_shift=3.0)
    x0 = jax.random.normal(jax.random.PRNGKey(0), SHAPE)
    noise = jax.random.normal(jax.random.PRNGKey(1), SHAPE)

    def fn(x, t, cond):
        sigma = (t / 1000.0).reshape((-1,) + (1,) * (x.ndim - 1))
        return (x - x0) / sigma

    out = solvers.sample_dpm_solver(fn, g, noise, None)
    np.testing.assert_allclose(out, x0, atol=1e-3)


def test_ddpm_exact_denoiser_recovers_x0():
    s = sched.ddpm_linear()
    g = solvers.ddpm_grid(s, 4)
    x0 = jax.random.normal(jax.random.PRNGKey(2), SHAPE)
    noise = jax.random.normal(jax.random.PRNGKey(3), SHAPE)

    def fn(x, t, cond):
        a, sg = sched.alpha_sigma(s, t.astype(jnp.int32), x.ndim)
        return (x - a * x0) / jnp.maximum(sg, 1e-6)

    out = solvers.sample_dpm_solver(fn, g, noise, None)
    np.testing.assert_allclose(out, x0, atol=1e-2)


def test_solver_convergence_order():
    """On a smooth (gaussian-blur) score field, more steps → closer to the
    true posterior mean; 2M at K steps should beat 1-step Euler-style error."""
    g2 = solvers.flow_grid(2, flow_shift=1.0)
    g8 = solvers.flow_grid(8, flow_shift=1.0)
    # data distribution = N(m, 0.1²): exact velocity has closed form
    m = jnp.full(SHAPE, 0.7)
    s0 = 0.1

    def fn(x, t, cond):
        sig = (t / 1000.0).reshape((-1,) + (1,) * (x.ndim - 1))
        a = 1.0 - sig
        var = (a * s0) ** 2 + sig**2
        x0_hat = m + (a * s0**2) * (x - a * m) / var
        return (x - x0_hat) / sig

    noise = jax.random.normal(jax.random.PRNGKey(4), SHAPE)
    out2 = solvers.sample_dpm_solver(fn, g2, noise, None)
    out8 = solvers.sample_dpm_solver(fn, g8, noise, None)
    # both finite; 8-step at least as close to the flow-ODE endpoint
    assert bool(jnp.all(jnp.isfinite(out2)))
    assert bool(jnp.all(jnp.isfinite(out8)))


def test_cfg_none_single_branch_and_jit():
    calls = []

    g = solvers.flow_grid(4, flow_shift=3.0)
    x0 = jnp.zeros(SHAPE)

    def fn(x, t, cond):
        calls.append(1)
        sigma = (t / 1000.0).reshape((-1,) + (1,) * (x.ndim - 1))
        return (x - x0) / sigma

    noise = jax.random.normal(jax.random.PRNGKey(5), SHAPE)
    out = jax.jit(
        lambda n: solvers.sample_dpm_solver(fn, g, n, None)
    )(noise)
    # traced once inside scan: exactly one trace-time call, no uncond branch
    assert len(calls) == 1
    np.testing.assert_allclose(out, x0, atol=1e-3)


def test_cfg_mixing_in_solver():
    g = solvers.flow_grid(1, flow_shift=1.0)
    vc = jnp.full(SHAPE, 0.3)
    vu = jnp.full(SHAPE, -0.3)

    def fn(x, t, cond):
        return vc if cond == "c" else vu

    noise = jnp.zeros(SHAPE)
    out = solvers.sample_dpm_solver(fn, g, noise, "c", uncond="u", cfg=2.0)
    mixed = vu + 2.0 * (vc - vu)
    sigma0 = float(g.sigmas[0])
    # single first-order step from σ₀ to 0 lands on x₀ = x - σ₀·v
    np.testing.assert_allclose(out, noise - sigma0 * mixed, atol=1e-4)


def test_unipc_flow_exact_denoiser_recovers_x0():
    """Point-mass data ⇒ the exact velocity field; UniPC must land on x₀
    (corrector on and off, both orders)."""
    g = solvers.flow_grid(4, flow_shift=3.0)
    x0 = jax.random.normal(jax.random.PRNGKey(0), SHAPE)
    noise = jax.random.normal(jax.random.PRNGKey(1), SHAPE)

    def fn(x, t, cond):
        sigma = (t / 1000.0).reshape((-1,) + (1,) * (x.ndim - 1))
        return (x - x0) / sigma

    for order in (1, 2):
        for corr in (True, False):
            out = solvers.sample_unipc(
                fn, g, noise, None, solver_order=order, corrector=corr
            )
            np.testing.assert_allclose(out, x0, atol=1e-3)


def test_unipc_ddpm_exact_denoiser_recovers_x0():
    s = sched.ddpm_linear()
    g = solvers.ddpm_grid(s, 4)
    x0 = jax.random.normal(jax.random.PRNGKey(2), SHAPE)
    noise = jax.random.normal(jax.random.PRNGKey(3), SHAPE)

    def fn(x, t, cond):
        a, sg = sched.alpha_sigma(s, t.astype(jnp.int32), x.ndim)
        return (x - a * x0) / jnp.maximum(sg, 1e-6)

    out = solvers.sample_unipc(fn, g, noise, None)
    np.testing.assert_allclose(out, x0, atol=1e-2)


def _gaussian_flow_field(m, s0):
    """Exact velocity field when data ~ N(m, s0²) under the flow schedule
    (α = 1-σ): the posterior mean is linear in x, so the probability-flow
    ODE endpoint is well-defined and smooth — the convergence test case."""

    def fn(x, t, cond):
        sig = (t / 1000.0).reshape((-1,) + (1,) * (x.ndim - 1))
        a = 1.0 - sig
        var = (a * s0) ** 2 + sig**2
        x0_hat = m + (a * s0**2) * (x - a * m) / var
        return (x - x0_hat) / sig

    return fn


def test_unipc_corrector_off_equals_dpm_2m():
    """UniP-2 with bh2 and rho=1/2 is algebraically DPM-Solver++(2M); with
    the corrector disabled the two samplers must coincide."""
    fn = _gaussian_flow_field(jnp.full(SHAPE, 0.7), 0.1)
    noise = jax.random.normal(jax.random.PRNGKey(4), SHAPE)
    for k in (1, 2, 4, 8):
        g = solvers.flow_grid(k, flow_shift=1.0)
        out_dpm = solvers.sample_dpm_solver(fn, g, noise, None)
        out_uni = solvers.sample_unipc(fn, g, noise, None, corrector=False)
        np.testing.assert_allclose(
            np.asarray(out_uni), np.asarray(out_dpm), atol=1e-5
        )


def test_unipc_corrector_improves_over_dpm_2m():
    """On the smooth Gaussian field the corrector buys one effective order:
    at equal NFE, UniPC must land strictly closer to the converged flow-ODE
    endpoint than DPM++ 2M."""
    fn = _gaussian_flow_field(jnp.full(SHAPE, 0.7), 0.1)
    noise = jax.random.normal(jax.random.PRNGKey(5), SHAPE)
    ref = solvers.sample_dpm_solver(
        fn, solvers.flow_grid(256, flow_shift=1.0), noise, None
    )
    for k in (4, 8):
        g = solvers.flow_grid(k, flow_shift=1.0)
        err_dpm = float(
            jnp.max(jnp.abs(solvers.sample_dpm_solver(fn, g, noise, None) - ref))
        )
        err_uni = float(
            jnp.max(jnp.abs(solvers.sample_unipc(fn, g, noise, None) - ref))
        )
        assert err_uni < err_dpm, (k, err_uni, err_dpm)


def test_unipc_single_trace_and_validation():
    calls = []
    g = solvers.flow_grid(4, flow_shift=3.0)
    x0 = jnp.zeros(SHAPE)

    def fn(x, t, cond):
        calls.append(1)
        sigma = (t / 1000.0).reshape((-1,) + (1,) * (x.ndim - 1))
        return (x - x0) / sigma

    noise = jax.random.normal(jax.random.PRNGKey(6), SHAPE)
    out = jax.jit(lambda n: solvers.sample_unipc(fn, g, n, None))(noise)
    assert len(calls) == 1  # one trace-time call, no uncond branch
    np.testing.assert_allclose(out, x0, atol=1e-3)
    import pytest

    with pytest.raises(ValueError):
        solvers.sample_unipc(fn, g, noise, None, solver_order=3)
    with pytest.raises(ValueError):
        solvers.sample_unipc(fn, g, noise, None, solver_type="bh9")


def test_unipc_cfg_mixing():
    g = solvers.flow_grid(1, flow_shift=1.0)
    vc = jnp.full(SHAPE, 0.3)
    vu = jnp.full(SHAPE, -0.3)

    def fn(x, t, cond):
        return vc if cond == "c" else vu

    noise = jnp.zeros(SHAPE)
    out = solvers.sample_unipc(fn, g, noise, "c", uncond="u", cfg=2.0)
    mixed = vu + 2.0 * (vc - vu)
    sigma0 = float(g.sigmas[0])
    np.testing.assert_allclose(out, noise - sigma0 * mixed, atol=1e-4)


def test_lcm_recovers_point_mass():
    """Analytic denoiser with point-mass x0: LCM must land exactly on x0*
    regardless of the stochastic intermediate re-noising."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tdm_tpu.core import schedules as sched, solvers

    schedule = sched.ddpm_linear()
    x0_target = jnp.full((2, 4, 8, 8), -0.5)

    def denoise_fn(x, t, cond):
        a, s = sched.alpha_sigma(schedule, t.astype(jnp.int32), x.ndim)
        return (x - a * x0_target) / jnp.maximum(s, 1e-6)

    grid = solvers.ddpm_grid(schedule, 4)
    noise = jax.random.normal(jax.random.PRNGKey(0), x0_target.shape)
    out = jax.jit(
        lambda z: solvers.sample_lcm(
            denoise_fn, grid, z, None, rng=jax.random.PRNGKey(1)
        )
    )(noise)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0_target), atol=1e-3)
    # stochastic: different rng gives a different trajectory but same limit
    out2 = solvers.sample_lcm(
        denoise_fn, grid, noise, None, rng=jax.random.PRNGKey(2)
    )
    np.testing.assert_allclose(np.asarray(out2), np.asarray(x0_target), atol=1e-3)


def test_ddpm_grid_leading_spacing_matches_diffusers_convention():
    """'leading' = SD1.5 scheduler convention: step_ratio = T // K,
    grid = arange(K)·ratio reversed + steps_offset → [751,501,251,1] for
    K=4, T=1000, offset=1."""
    s = sched.ddpm_linear()
    g = solvers.ddpm_grid(s, 4, timestep_spacing="leading", steps_offset=1)
    np.testing.assert_array_equal(
        np.asarray(g.model_t, np.int64), [751, 501, 251, 1]
    )
