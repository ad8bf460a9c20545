"""CogVideoX 3D-DiT tests: shapes, text/time sensitivity, RoPE variant,
grads (the video recipe's denoiser, reference `README.md:114-138`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdm_tpu.models import cogvideox


def _setup(use_rotary: bool):
    cfg = cogvideox.CogVideoXConfig.tiny(use_rotary=use_rotary)
    model = cogvideox.CogVideoXTransformer3D(cfg=cfg)
    b = 2
    latent = jax.random.normal(
        jax.random.PRNGKey(0),
        (b, 16, cfg.sample_frames, cfg.sample_h, cfg.sample_w),
    )
    t = jnp.array([100.0, 900.0])
    text = jax.random.normal(jax.random.PRNGKey(1), (b, cfg.max_text_len, cfg.text_dim))
    params = model.init(jax.random.PRNGKey(2), latent, t, text)["params"]
    return model, params, (latent, t, text)


@pytest.mark.parametrize("use_rotary", [False, True])
def test_shapes_and_finiteness(use_rotary):
    model, params, (latent, t, text) = _setup(use_rotary)
    out = jax.jit(lambda *a: model.apply({"params": params}, *a))(latent, t, text)
    assert out.shape == latent.shape
    assert np.isfinite(np.asarray(out)).all()


def test_conditioning_and_time_matter():
    model, params, (latent, t, text) = _setup(False)
    out1 = model.apply({"params": params}, latent, t, text)
    out2 = model.apply({"params": params}, latent, t, text * 0.0)
    out3 = model.apply({"params": params}, latent, t + 500.0, text)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_rope_tables_shape_and_identity_for_text():
    cos, sin = cogvideox.rope_3d(16, 3, 4, 4)
    assert cos.shape == (3 * 4 * 4, 16) and sin.shape == cos.shape
    # position (0,0,0) has angle 0 everywhere → identity rotation
    np.testing.assert_allclose(cos[0], 1.0)
    np.testing.assert_allclose(sin[0], 0.0)
    # norms preserved by rotation: cos²+sin² = 1
    np.testing.assert_allclose(cos**2 + sin**2, 1.0, atol=1e-6)


def test_temporal_positions_distinguished():
    """Identical frames must produce different outputs per frame (position
    information flows — learned pos-embed variant)."""
    model, params, (latent, t, text) = _setup(False)
    same = jnp.broadcast_to(latent[:, :, :1], latent.shape)
    out = model.apply({"params": params}, same, t, text)
    assert not np.allclose(
        np.asarray(out[:, :, 0]), np.asarray(out[:, :, 1]), atol=1e-5
    )


def test_grads_flow():
    model, params, (latent, t, text) = _setup(False)

    def loss(p):
        return jnp.mean(
            model.apply({"params": p}, latent, t, text).astype(jnp.float32) ** 2
        )

    grads = jax.grad(loss)(params)
    norms = [float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) > len(norms) * 0.9
