"""PixArt-α DiT: shapes, jit, conditioning behavior, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdm_tpu.core import sampling, schedules as sched
from tdm_tpu.models import pixart


@pytest.fixture(scope="module")
def tiny():
    cfg = pixart.PixArtConfig.tiny()
    model = pixart.PixArtTransformer2D(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    latent = jnp.zeros((2, 4, 16, 16))
    t = jnp.array([500.0, 100.0])
    text = jnp.zeros((2, 8, cfg.caption_dim))
    mask = jnp.ones((2, 8), jnp.int32)
    params = model.init(rng, latent, t, text, mask)["params"]
    return cfg, model, params


def test_output_shape_and_eps_split(tiny):
    cfg, model, params = tiny
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16, 16))
    t = jnp.array([899.0, 224.0])
    text = jax.random.normal(jax.random.PRNGKey(2), (2, 8, cfg.caption_dim))
    mask = jnp.ones((2, 8), jnp.int32)
    out = model.apply({"params": params}, x, t, text, mask)
    assert out.shape == (2, 8, 16, 16)  # ε + learned variance
    eps = pixart.epsilon(out)
    assert eps.shape == (2, 4, 16, 16)
    np.testing.assert_allclose(eps, out[:, :4])
    assert bool(jnp.all(jnp.isfinite(out)))


def test_timestep_and_text_conditioning_change_output(tiny):
    cfg, model, params = tiny
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 16, 16))
    text = jax.random.normal(jax.random.PRNGKey(4), (1, 8, cfg.caption_dim))
    mask = jnp.ones((1, 8), jnp.int32)
    o1 = model.apply({"params": params}, x, jnp.array([100.0]), text, mask)
    o2 = model.apply({"params": params}, x, jnp.array([800.0]), text, mask)
    assert float(jnp.abs(o1 - o2).max()) > 1e-6
    o3 = model.apply({"params": params}, x, jnp.array([100.0]), text * 2, mask)
    assert float(jnp.abs(o1 - o3).max()) > 1e-6


def test_text_mask_hides_padding(tiny):
    cfg, model, params = tiny
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 16, 16))
    text = jax.random.normal(jax.random.PRNGKey(6), (1, 8, cfg.caption_dim))
    mask = jnp.array([[1, 1, 1, 1, 0, 0, 0, 0]], jnp.int32)
    o1 = model.apply({"params": params}, x, jnp.array([500.0]), text, mask)
    # scrambling masked positions must not change the output
    text2 = text.at[:, 4:].set(jax.random.normal(jax.random.PRNGKey(7), (1, 4, cfg.caption_dim)))
    o2 = model.apply({"params": params}, x, jnp.array([500.0]), text2, mask)
    np.testing.assert_allclose(o1, o2, atol=1e-5)


def test_jit_and_sampler_integration(tiny):
    cfg, model, params = tiny
    text = jax.random.normal(jax.random.PRNGKey(8), (2, 8, cfg.caption_dim))
    mask = jnp.ones((2, 8), jnp.int32)
    ddpm = sched.ddpm_linear()
    grid = sched.fewstep_grid(900, 4)
    fn = pixart.make_denoise_fn(model, params)

    @jax.jit
    def rollout(noise):
        return sampling.sample_fewstep(
            fn, ddpm, noise, (text, mask), timestep_grid=grid, return_trajectory=True
        )

    noise = jax.random.normal(jax.random.PRNGKey(9), (2, 4, 16, 16))
    traj = rollout(noise)
    assert traj.final.shape == (2, 4, 16, 16)
    assert traj.states.shape == (5, 2, 4, 16, 16)
    assert bool(jnp.all(jnp.isfinite(traj.final)))


def test_gradients_flow_to_all_params(tiny):
    cfg, model, params = tiny
    x = jax.random.normal(jax.random.PRNGKey(10), (1, 4, 16, 16))
    text = jax.random.normal(jax.random.PRNGKey(11), (1, 8, cfg.caption_dim))
    mask = jnp.ones((1, 8), jnp.int32)

    def loss(p):
        out = model.apply({"params": p}, x, jnp.array([500.0]), text, mask)
        return jnp.mean(pixart.epsilon(out) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves_with_path(grads)
    zero = [
        jax.tree_util.keystr(path)
        for path, g in leaves
        if float(jnp.abs(g).max()) == 0.0
    ]
    assert zero == [], f"dead params: {zero}"
