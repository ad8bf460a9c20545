"""SD3 MMDiT: shapes, conditioning, solver integration (flow sampling)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdm_tpu.core import solvers
from tdm_tpu.models import mmdit_sd3


@pytest.fixture(scope="module")
def tiny():
    cfg = mmdit_sd3.MMDiTConfig.tiny()
    model = mmdit_sd3.SD3Transformer2D(cfg=cfg)
    latent = jnp.zeros((2, 16, 8, 8))
    t = jnp.array([999.0, 500.0])
    ctx = jnp.zeros((2, 6, cfg.context_dim))
    pooled = jnp.zeros((2, cfg.pooled_dim))
    params = model.init(jax.random.PRNGKey(0), latent, t, ctx, pooled)["params"]
    return cfg, model, params


def test_shapes(tiny):
    cfg, model, params = tiny
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 6, cfg.context_dim))
    pooled = jax.random.normal(jax.random.PRNGKey(3), (2, cfg.pooled_dim))
    out = model.apply({"params": params}, x, jnp.array([800.0, 100.0]), ctx, pooled)
    assert out.shape == (2, 16, 8, 8)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_conditioning_channels(tiny):
    """timestep, context tokens, and pooled embedding each reach the output."""
    cfg, model, params = tiny
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(5), (1, 6, cfg.context_dim))
    pooled = jax.random.normal(jax.random.PRNGKey(6), (1, cfg.pooled_dim))
    base = model.apply({"params": params}, x, jnp.array([500.0]), ctx, pooled)
    for variant in [
        model.apply({"params": params}, x, jnp.array([900.0]), ctx, pooled),
        model.apply({"params": params}, x, jnp.array([500.0]), ctx * 2, pooled),
        model.apply({"params": params}, x, jnp.array([500.0]), ctx, pooled * 2),
    ]:
        assert float(jnp.abs(base - variant).max()) > 1e-6


def test_4nfe_flow_sampling(tiny):
    """End-to-end: MMDiT inside the fused DPM-Solver++ flow loop — the
    TDM-SD3 inference recipe shape (README.md:48-67, 4 steps, cfg 1)."""
    cfg, model, params = tiny
    ctx = jax.random.normal(jax.random.PRNGKey(7), (2, 6, cfg.context_dim))
    pooled = jax.random.normal(jax.random.PRNGKey(8), (2, cfg.pooled_dim))
    grid = solvers.flow_grid(4, flow_shift=6.0)
    fn = mmdit_sd3.make_denoise_fn(model, params)

    @jax.jit
    def sample(noise):
        return solvers.sample_dpm_solver(fn, grid, noise, (ctx, pooled))

    noise = jax.random.normal(jax.random.PRNGKey(9), (2, 16, 8, 8))
    out = sample(noise)
    assert out.shape == (2, 16, 8, 8)
    assert bool(jnp.all(jnp.isfinite(out)))
    np.testing.assert_allclose(sample(noise), out)  # deterministic


def test_gradients_flow(tiny):
    cfg, model, params = tiny
    x = jax.random.normal(jax.random.PRNGKey(10), (1, 16, 8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(11), (1, 6, cfg.context_dim))
    pooled = jax.random.normal(jax.random.PRNGKey(12), (1, cfg.pooled_dim))

    def loss(p):
        return jnp.mean(
            model.apply({"params": p}, x, jnp.array([500.0]), ctx, pooled) ** 2
        )

    grads = jax.grad(loss)(params)
    # the final (context_pre_only) block's add_q_proj is dead by design:
    # its context-attention rows are discarded (HF SD3 computes them too)
    last = f"blocks_{cfg.num_layers - 1}"
    zero = [
        jax.tree_util.keystr(path)
        for path, g in jax.tree_util.tree_leaves_with_path(grads)
        if float(jnp.abs(g).max()) == 0.0
        and f"'{last}'" + "]['add_q_proj']" not in jax.tree_util.keystr(path)
    ]
    assert zero == [], f"dead params: {zero}"
