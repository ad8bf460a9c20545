"""SD1.5 UNet tests: shapes, skip bookkeeping, conditioning sensitivity,
jit + grad (the Dreamshaper recipe's denoiser, reference `README.md:90-107`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdm_tpu.models import unet_sd15


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = unet_sd15.UNetConfig.tiny()
    model = unet_sd15.UNet2DCondition(cfg=cfg)
    b, size, seq = 2, 16, 6
    latent = jax.random.normal(jax.random.PRNGKey(0), (b, 4, size, size))
    t = jnp.array([10.0, 500.0])
    context = jax.random.normal(jax.random.PRNGKey(1), (b, seq, cfg.context_dim))
    mask = jnp.ones((b, seq), jnp.int32)
    params = model.init(jax.random.PRNGKey(2), latent, t, context, mask)["params"]
    return model, params, (latent, t, context, mask)


def test_shapes_and_finiteness(tiny_unet):
    model, params, (latent, t, context, mask) = tiny_unet
    out = jax.jit(lambda *a: model.apply({"params": params}, *a))(
        latent, t, context, mask
    )
    assert out.shape == latent.shape
    assert np.isfinite(np.asarray(out)).all()


def test_conditioning_matters(tiny_unet):
    model, params, (latent, t, context, mask) = tiny_unet
    out1 = model.apply({"params": params}, latent, t, context, mask)
    out2 = model.apply({"params": params}, latent, t, context * 0.0, mask)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    # timestep matters too
    out3 = model.apply({"params": params}, latent, t + 300.0, context, mask)
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_context_mask_drops_padding(tiny_unet):
    """Masked-out context tokens must not influence the output (ragged-key
    correctness of the cross-attention path)."""
    model, params, (latent, t, context, _) = tiny_unet
    mask = jnp.array([[1, 1, 1, 0, 0, 0]] * 2, jnp.int32)
    out1 = model.apply({"params": params}, latent, t, context, mask)
    garbage = context.at[:, 3:].set(1e3)
    out2 = model.apply({"params": params}, latent, t, garbage, mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)


def test_grads_flow(tiny_unet):
    model, params, (latent, t, context, mask) = tiny_unet

    def loss(p):
        out = model.apply({"params": p}, latent, t, context, mask)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    grads = jax.grad(loss)(params)
    norms = [float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) > len(norms) * 0.9  # no dead subtrees


def test_odd_resolution_rejected(tiny_unet):
    """Resolutions not divisible by the downsample factor should fail
    loudly at trace time (static-shape discipline), not mis-shape."""
    model, params, (_, t, context, mask) = tiny_unet
    bad = jnp.zeros((2, 4, 15, 15))
    with pytest.raises(Exception):
        model.apply({"params": params}, bad, t, context, mask)


def test_remat_preserves_params_forward_and_grads():
    """cfg.remat (the --gradient_checkpointing wiring for the sd15 family)
    must be a pure memory/compute trade: identical param tree (converted
    checkpoints and LoRA key maps stay valid), identical forward, and
    matching gradients."""
    import dataclasses

    import jax

    cfg = unet_sd15.UNetConfig.tiny()
    cfg_r = dataclasses.replace(cfg, remat=True)
    m = unet_sd15.UNet2DCondition(cfg=cfg)
    mr = unet_sd15.UNet2DCondition(cfg=cfg_r)
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 16))
    t = jnp.full((1,), 500.0)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 6, cfg.context_dim))
    mask = jnp.ones((1, 6), jnp.int32)
    params = m.init(jax.random.PRNGKey(2), lat, t, ctx, mask)["params"]
    params_r = mr.init(jax.random.PRNGKey(2), lat, t, ctx, mask)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(params_r)

    out = m.apply({"params": params}, lat, t, ctx, mask)
    out_r = mr.apply({"params": params}, lat, t, ctx, mask)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_r), atol=1e-5
    )

    def loss(mod):
        return lambda p: jnp.sum(
            jnp.square(mod.apply({"params": p}, lat, t, ctx, mask))
        )

    g = jax.grad(loss(m))(params)
    g_r = jax.grad(loss(mr))(params)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-3
        )
