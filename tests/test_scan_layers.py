"""Scan-over-layers equivalence: the scanned PixArt (stacked params, one
compiled block body — the TPU big-model layout) must produce bit-identical
outputs to the unrolled model given the same weights, and remat must not
change values."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tdm_tpu.io.convert import stack_layers
from tdm_tpu.models import pixart


def test_scan_matches_unrolled():
    cfg_unrolled = dataclasses.replace(
        pixart.PixArtConfig.tiny(), scan_layers=False, num_layers=3
    )
    cfg_scan = dataclasses.replace(cfg_unrolled, scan_layers=True)
    m_u = pixart.PixArtTransformer2D(cfg=cfg_unrolled)
    m_s = pixart.PixArtTransformer2D(cfg=cfg_scan)

    b, seq = 2, 8
    lat = jax.random.normal(jax.random.PRNGKey(0), (b, 4, 16, 16))
    t = jnp.array([100.0, 800.0])
    text = jax.random.normal(jax.random.PRNGKey(1), (b, seq, cfg_scan.caption_dim))
    mask = jnp.ones((b, seq), jnp.int32)

    p_u = m_u.init(jax.random.PRNGKey(2), lat, t, text, mask)["params"]
    # stack the unrolled per-layer trees into the scanned layout
    p_s = stack_layers(jax.tree.map(np.asarray, p_u))

    out_u = m_u.apply({"params": p_u}, lat, t, text, mask)
    out_s = m_s.apply({"params": p_s}, lat, t, text, mask)
    np.testing.assert_allclose(
        np.asarray(out_u), np.asarray(out_s), atol=1e-5, rtol=1e-5
    )


def test_remat_matches():
    cfg = dataclasses.replace(pixart.PixArtConfig.tiny(), num_layers=2)
    cfg_r = dataclasses.replace(cfg, remat=True)
    m = pixart.PixArtTransformer2D(cfg=cfg)
    m_r = pixart.PixArtTransformer2D(cfg=cfg_r)
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 16))
    t = jnp.zeros((1,))
    text = jnp.zeros((1, 8, cfg.caption_dim))
    mask = jnp.ones((1, 8), jnp.int32)
    params = m.init(jax.random.PRNGKey(1), lat, t, text, mask)["params"]

    def loss(mod, p):
        return jnp.mean(
            mod.apply({"params": p}, lat, t, text, mask).astype(jnp.float32) ** 2
        )

    g = jax.grad(lambda p: loss(m, p))(params)
    g_r = jax.grad(lambda p: loss(m_r, p))(params)
    for x, y in zip(jax.tree.leaves(g), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_lora_on_scanned_kernels(tmp_path):
    """LoRA init/merge/save/load round-trips through the stacked layout and
    per-layer kohya keys."""
    from tdm_tpu.lora import LoRA, init_lora, load_lora, merge, save_kohya

    cfg = pixart.PixArtConfig.tiny()
    assert cfg.scan_layers
    m = pixart.PixArtTransformer2D(cfg=cfg)
    lat = jnp.zeros((1, 4, 16, 16))
    text = jnp.zeros((1, 8, cfg.caption_dim))
    mask = jnp.ones((1, 8), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), lat, jnp.zeros((1,)), text, mask)[
        "params"
    ]
    kernel = params["blocks"]["attn1"]["to_q"]["kernel"]
    assert kernel.ndim == 3  # [L, in, out]

    rng = jax.random.PRNGKey(1)
    lora = init_lora(params, rng, rank=2)
    entry = lora.params["blocks"]["attn1"]["to_q"]
    assert entry["a"].shape == (cfg.num_layers, kernel.shape[1], 2)
    lora = LoRA(
        params=jax.tree.map(
            lambda x: x + 0.05 * jax.random.normal(rng, x.shape), lora.params
        ),
        alpha=lora.alpha,
    )
    merged = merge(params, lora, 0.5)
    out0 = m.apply({"params": params}, lat, jnp.zeros((1,)), text, mask)
    out1 = m.apply({"params": merged}, lat, jnp.zeros((1,)), text, mask)
    assert not np.allclose(np.asarray(out0), np.asarray(out1))

    f = str(tmp_path / "stacked.safetensors")
    save_kohya(lora, f, dtype=np.float32)
    # per-layer keys on disk (torch-ecosystem interchange)
    from safetensors.numpy import load_file

    keys = load_file(f).keys()
    assert any("blocks_0_attn1_to_q" in k for k in keys)
    assert any(f"blocks_{cfg.num_layers - 1}_attn1_to_q" in k for k in keys)

    back = load_lora(f, params=params)
    m2 = merge(params, back, 0.5)
    for x, y in zip(jax.tree.leaves(merged), jax.tree.leaves(m2)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)
