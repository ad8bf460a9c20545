"""Unit surface of the training family registry (train/families.py):
bundle geometry, cond construction (incl. the SD3 pooled path), and the
ε-space denoise contract — fast checks complementing the CLI e2e tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdm_tpu.train import families


@pytest.mark.parametrize("name", families.FAMILIES)
def test_bundle_geometry_and_init(name):
    b = families.build(name, tiny=True)
    assert b.name == name
    params = b.init_params(jax.random.PRNGKey(0))
    assert jax.tree.leaves(params), "empty param tree"
    # latent rank: image families 3-D (C,H,W), video 4-D (C,F,H,W)
    assert len(b.sample_shape) == (4 if name == "cogvideox" else 3)
    assert b.sample_shape[0] == b.latent_channels


@pytest.mark.parametrize("name", families.FAMILIES)
def test_denoise_fn_is_epsilon_shaped(name):
    """denoise_fn returns ε̂ with the latent's shape for every family —
    the contract the TDM step relies on (train/tdm.py)."""
    b = families.build(name, tiny=True)
    params = b.init_params(jax.random.PRNGKey(0))
    bs = 2
    x = jax.random.normal(jax.random.PRNGKey(1), (bs, *b.sample_shape))
    t = jnp.full((bs,), 500.0)
    text = jax.random.normal(
        jax.random.PRNGKey(2), (bs, b.seq_len, b.embed_dim)
    )
    mask = jnp.ones((bs, b.seq_len), jnp.int32)
    eps = b.denoise_fn(params, x, t, b.cond_of(text, mask))
    assert eps.shape == x.shape
    assert bool(jnp.isfinite(eps).all())


def test_sd3_cond_pooled_fold_vs_explicit():
    b = families.build("sd3", tiny=True)
    bs = 2
    text = jax.random.normal(jax.random.PRNGKey(0), (bs, 4, b.embed_dim))
    mask = jnp.ones((bs, 4), jnp.int32)
    ctx, folded = b.cond_of(text, mask)
    assert np.asarray(ctx).shape == (bs, 4, b.embed_dim)
    # fold is deterministic per (text, mask)
    _, folded2 = b.cond_of(text, mask)
    np.testing.assert_array_equal(np.asarray(folded), np.asarray(folded2))
    # an explicit pooled vector (cache path) wins over the fold
    pooled = jax.random.normal(
        jax.random.PRNGKey(1), np.asarray(folded).shape
    )
    _, used = b.cond_of(text, mask, pooled)
    np.testing.assert_array_equal(np.asarray(used), np.asarray(pooled))
    assert not np.allclose(np.asarray(used), np.asarray(folded))


def test_cogvideox_cond_zeroes_padded_rows():
    b = families.build("cogvideox", tiny=True)
    text = jnp.ones((1, b.seq_len, b.embed_dim))
    mask = jnp.zeros((1, b.seq_len), jnp.int32).at[0, 0].set(1)
    cond = b.cond_of(text, mask)
    assert float(cond[0, 0].sum()) > 0
    assert float(jnp.abs(cond[0, 1:]).sum()) == 0.0


def test_resolution_sets_latent_size():
    b = families.build("sd3", resolution=512)
    assert b.sample_shape == (16, 64, 64)
    b = families.build("pixart", resolution=1024)
    assert b.sample_shape[1:] == (128, 128)


def test_unknown_family_raises():
    with pytest.raises(ValueError, match="model_family"):
        families.build("sdxl")
