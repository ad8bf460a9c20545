"""VAE family: TAESD round-trip shapes, KL decoder, tiled-decode blending."""

import jax
import jax.numpy as jnp
import numpy as np

from tdm_tpu.models import vae


def test_taesd_decode_shape():
    cfg = vae.TAESDConfig()
    dec = vae.TAESDDecoder(cfg)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
    params = dec.init(jax.random.PRNGKey(1), z)["params"]
    img = dec.apply({"params": params}, z)
    assert img.shape == (2, 3, 64, 64)  # 8× upsampling
    assert bool(jnp.all(jnp.isfinite(img)))


def test_taesd3_sixteen_channels():
    cfg = vae.TAESDConfig.taesd3()
    assert cfg.latent_channels == 16
    dec = vae.TAESDDecoder(cfg)
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 4, 4))
    params = dec.init(jax.random.PRNGKey(3), z)["params"]
    assert dec.apply({"params": params}, z).shape == (1, 3, 32, 32)


def test_taesd_encoder_roundtrip_shapes():
    cfg = vae.TAESDConfig()
    enc = vae.TAESDEncoder(cfg)
    img = jax.random.uniform(jax.random.PRNGKey(4), (1, 3, 64, 64))
    params = enc.init(jax.random.PRNGKey(5), img)["params"]
    z = enc.apply({"params": params}, img)
    assert z.shape == (1, 4, 8, 8)


def test_kl_decoder_tiny():
    cfg = vae.KLVAEConfig.tiny()
    dec = vae.KLDecoder(cfg)
    z = jax.random.normal(jax.random.PRNGKey(6), (1, 4, 8, 8))
    params = dec.init(jax.random.PRNGKey(7), z)["params"]
    img = dec.apply({"params": params}, z)
    # 2 width-blocks → one 2× upsample → spatial factor 2
    assert img.shape == (1, 3, 16, 16)
    assert bool(jnp.all(jnp.isfinite(img)))


def test_kl_encoder_tiny():
    cfg = vae.KLVAEConfig.tiny()
    enc = vae.KLEncoder(cfg)
    img = jax.random.normal(jax.random.PRNGKey(8), (1, 3, 16, 16))
    params = enc.init(jax.random.PRNGKey(9), img)["params"]
    mean, logvar = enc.apply({"params": params}, img)
    assert mean.shape == (1, 4, 8, 8) and logvar.shape == (1, 4, 8, 8)


def test_unscale_latents_matches_reference_semantics():
    z = jnp.ones((1, 4, 2, 2)) * 0.36430
    out = vae.unscale_latents(z, 0.18215)
    np.testing.assert_allclose(out, 2.0, rtol=1e-5)
    out3 = vae.unscale_latents(z, 1.5305, 0.0609)
    np.testing.assert_allclose(out3, 0.36430 / 1.5305 + 0.0609, rtol=1e-5)


def test_tiled_decode_matches_full():
    """Tiled decode with a linear decode_fn must equal untiled decode
    up to blending arithmetic (exact for a conv-free upsampler)."""
    f = 2

    def decode_fn(z):  # latent → 2× nearest upsample, channel-summed
        b, c, h, w = z.shape
        img = jnp.repeat(jnp.repeat(z[:, :3], f, axis=2), f, axis=3)
        return img

    z = jax.random.normal(jax.random.PRNGKey(10), (1, 4, 32, 48))
    full = decode_fn(z)
    tiled = vae.tiled_decode(decode_fn, z, tile=16, overlap=4, spatial_factor=f)
    np.testing.assert_allclose(tiled, full, atol=1e-5)


def test_tiled_decode_small_input_passthrough():
    def decode_fn(z):
        return jnp.repeat(jnp.repeat(z[:, :3], 2, axis=2), 2, axis=3)

    z = jax.random.normal(jax.random.PRNGKey(11), (1, 4, 8, 8))
    np.testing.assert_allclose(
        vae.tiled_decode(decode_fn, z, tile=16, overlap=4, spatial_factor=2),
        decode_fn(z),
    )
