"""CogVideoX 3D causal VAE tests: shape arithmetic, temporal causality
(the property that makes frame-sliced decode exact), tiled-decode parity
(the `enable_tiling()` replacement, reference `README.md:117-118`)."""

import jax
import numpy as np
import pytest

from tdm_tpu.models import vae3d


@pytest.fixture(scope="module")
def dec():
    cfg = vae3d.VAE3DConfig.tiny()
    model = vae3d.VAE3DDecoder(cfg=cfg)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.latent_channels, 5, 6, 6))
    params = model.init(jax.random.PRNGKey(1), z)["params"]
    return cfg, model, params, z


def test_decode_shape(dec):
    cfg, model, params, z = dec
    out = jax.jit(lambda z: model.apply({"params": params}, z))(z)
    f_out = (z.shape[2] - 1) * cfg.temporal_factor + 1
    assert out.shape == (
        1, 3, f_out, z.shape[3] * cfg.spatial_factor, z.shape[4] * cfg.spatial_factor
    )
    assert np.isfinite(np.asarray(out)).all()


def test_temporal_causality(dec):
    """Perturbing latent frame k must leave output frames < k·tf unchanged —
    the invariant that makes sliced decoding exact."""
    cfg, model, params, z = dec
    out1 = model.apply({"params": params}, z)
    z2 = z.at[:, :, 3:].add(10.0)
    out2 = model.apply({"params": params}, z2)
    # latent frames 0-2 cover output frames 0..(2·tf) inclusive... be
    # conservative: frames strictly before (3-1)·tf+1 depend only on z[:3]
    safe = (3 - 1) * cfg.temporal_factor + 1
    np.testing.assert_allclose(
        np.asarray(out1[:, :, :safe]), np.asarray(out2[:, :, :safe]), atol=1e-5
    )
    # and later frames DO change
    assert not np.allclose(np.asarray(out1[:, :, -1]), np.asarray(out2[:, :, -1]))


def test_tiled_decode_matches_full(dec):
    cfg, model, params, _ = dec
    z = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.latent_channels, 3, 24, 24))
    decode = lambda zz: model.apply({"params": params}, zz)
    full = decode(z)
    tiled = vae3d.decode_tiled(
        decode, z, tile=16, overlap=8, spatial_factor=cfg.spatial_factor
    )
    assert tiled.shape == full.shape
    # tiled decode is approximate at seams (conv halo — true of diffusers'
    # enable_tiling too); demand close agreement in the bulk and bounded
    # deviation at seams
    # note: the tiny decoder's receptive field (~21 latent px) exceeds the
    # 16px test tile, so even tile interiors deviate ~0.02-0.04 here; with
    # production tiles (64+) the interior is exact to conv-halo precision
    diff = np.abs(np.asarray(tiled) - np.asarray(full))
    assert np.median(diff) < 5e-2
    assert np.quantile(diff, 0.99) < 0.5
    assert np.isfinite(np.asarray(tiled)).all()


def test_streaming_decode_exact(dec):
    """Conv-cache streaming decode must EXACTLY reproduce the monolithic
    decode (the reference's enable_slicing analog, README.md:117-118) —
    causality + carried k_t−1 contexts make chunking lossless, unlike the
    spatially tiled path's conv-halo seams. Tolerance 1e-5: the chunked
    programs are separate XLA compilations, so conv reductions reassociate
    (measured max|d| ~2e-6 fp32); anything above that is a semantic
    boundary error (a wrong cache shifts whole frames, |d| ~O(1))."""
    cfg, model, params, z = dec  # z: 5 latent frames
    full = np.asarray(model.apply({"params": params}, z))
    for chunk in (1, 2, 3):
        out = np.asarray(vae3d.decode_streaming(model, params, z, chunk=chunk))
        assert out.shape == full.shape
        np.testing.assert_allclose(
            out, full, atol=1e-5, rtol=1e-5,
            err_msg=f"streaming decode (chunk={chunk}) diverged",
        )


def test_streaming_decode_single_chunk_fast_path(dec):
    """f <= chunk falls back to the plain decode."""
    cfg, model, params, z = dec
    full = np.asarray(model.apply({"params": params}, z))
    out = np.asarray(vae3d.decode_streaming(model, params, z, chunk=16))
    np.testing.assert_allclose(out, full, atol=0, rtol=0)


def test_encoder_roundtrip_shapes():
    cfg = vae3d.VAE3DConfig.tiny()
    enc = vae3d.VAE3DEncoder(cfg=cfg)
    video = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 5, 8, 8))
    params = enc.init(jax.random.PRNGKey(4), video)["params"]
    mean, logvar = enc.apply({"params": params}, video)
    f_lat = 1 + (video.shape[2] - 1) // cfg.temporal_factor
    assert mean.shape == (
        1, cfg.latent_channels, f_lat,
        video.shape[3] // cfg.spatial_factor, video.shape[4] // cfg.spatial_factor,
    )
    assert logvar.shape == mean.shape
    assert np.isfinite(np.asarray(mean)).all()
