"""CogVideoX sequence parallelism: frame-sharded forward on the virtual
mesh must match the monolithic model exactly.

The SURVEY §5 long-context extension: video tokens are frame-major, so
sharding F over the 'sp' mesh axis shards the token rows contiguously; the
per-block joint attention becomes ring attention over the video K/V shards
with the replicated text block attended once as a prefix
(`ops/ring_attention.prefix_kv`). Reference memory-scaling surface:
`/root/reference/README.md:114-138` (49-frame recipe with VAE
tiling/slicing); SP goes past what one chip's HBM holds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tdm_tpu.models import cogvideox as cog


def _models(n_sp, use_rotary):
    import dataclasses

    base = cog.CogVideoXConfig.tiny(use_rotary=use_rotary)
    # video-shaped: F=8 latent frames over the sp axis, 4x4 token grid
    base = dataclasses.replace(base, sample_frames=8)
    mono = cog.CogVideoXTransformer3D(cfg=base)
    sp_cfg = dataclasses.replace(base, sequence_parallel_axis="sp")
    spm = cog.CogVideoXTransformer3D(cfg=sp_cfg)
    return base, mono, spm


@pytest.mark.parametrize("use_rotary", [False, True])
@pytest.mark.parametrize("n_sp", [4, 8])
def test_sp_forward_matches_monolithic(n_sp, use_rotary):
    cfg, mono, spm = _models(n_sp, use_rotary)
    b, f, h, w = 2, cfg.sample_frames, cfg.sample_h, cfg.sample_w
    latent = jax.random.normal(
        jax.random.PRNGKey(0), (b, cfg.in_channels, f, h, w)
    )
    t = jnp.array([500.0, 100.0])
    text = jax.random.normal(
        jax.random.PRNGKey(1), (b, cfg.max_text_len, cfg.text_dim)
    )
    params = mono.init(jax.random.PRNGKey(2), latent, t, text)["params"]
    ref = mono.apply({"params": params}, latent, t, text)

    mesh = Mesh(np.asarray(jax.devices()[:n_sp]), ("sp",))
    fn = cog.sequence_parallel_apply(spm, mesh)
    out = jax.jit(fn)(params, latent, t, text)
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5
    )


def test_sp_with_data_axis_and_gradients():
    """('data','sp') mesh: batch AND frames sharded; gradients through the
    ring path match the monolithic model (training viability)."""
    cfg, mono, spm = _models(2, use_rotary=False)
    b, f, h, w = 2, cfg.sample_frames, cfg.sample_h, cfg.sample_w
    latent = jax.random.normal(
        jax.random.PRNGKey(3), (b, cfg.in_channels, f, h, w)
    )
    t = jnp.array([700.0, 50.0])
    text = jax.random.normal(
        jax.random.PRNGKey(4), (b, cfg.max_text_len, cfg.text_dim)
    )
    params = mono.init(jax.random.PRNGKey(5), latent, t, text)["params"]

    mesh = Mesh(
        np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "sp")
    )
    fn = cog.sequence_parallel_apply(spm, mesh, data_axis="data")

    g = jax.random.normal(jax.random.PRNGKey(6), latent.shape)

    def loss_sp(p):
        return jnp.sum(fn(p, latent, t, text) * g)

    def loss_mono(p):
        return jnp.sum(mono.apply({"params": p}, latent, t, text) * g)

    gs = jax.jit(jax.grad(loss_sp))(params)
    gm = jax.grad(loss_mono)(params)
    flat_s = jax.tree_util.tree_leaves_with_path(gs)
    flat_m = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gm)}
    for key, vs in flat_s:
        vm = flat_m[jax.tree_util.keystr(key)]
        np.testing.assert_allclose(
            np.asarray(vs), np.asarray(vm), atol=2e-4, rtol=2e-4,
            err_msg=jax.tree_util.keystr(key),
        )


def test_sp_tp_composition_matches_monolithic():
    """sp+tp on one ('data','sp','tp') mesh: frames manual-sharded over
    'sp' (ring attention), projections GSPMD-sharded over the AUTO 'tp'
    axis via the megatron rule — both at once, exact vs monolithic. The
    sp/tp pipeline knobs stay mutually exclusive; THIS mesh shape is the
    supported composition route (pipelines/cogvideox.py __call__)."""
    import dataclasses

    from tdm_tpu.parallel.tp import TP_AXIS, tp_shardings

    base = dataclasses.replace(
        cog.CogVideoXConfig.tiny(), sample_frames=4
    )
    mono = cog.CogVideoXTransformer3D(cfg=base)
    spm = cog.CogVideoXTransformer3D(
        cfg=dataclasses.replace(base, sequence_parallel_axis="sp")
    )
    b = 2
    latent = jax.random.normal(
        jax.random.PRNGKey(0),
        (b, base.in_channels, 4, base.sample_h, base.sample_w),
    )
    t = jnp.full((b,), 500.0)
    text = jax.random.normal(
        jax.random.PRNGKey(1), (b, base.max_text_len, base.text_dim)
    )
    params = mono.init(jax.random.PRNGKey(2), latent, t, text)["params"]
    ref = mono.apply({"params": params}, latent, t, text)

    mesh = Mesh(
        np.asarray(jax.devices()).reshape(b, 2, 2), ("data", "sp", "tp")
    )
    fn = cog.sequence_parallel_apply(spm, mesh, data_axis="data")
    shardings = tp_shardings(params, mesh)
    n_sharded = sum(
        any(a == TP_AXIS for a in s.spec) for s in jax.tree.leaves(shardings)
    )
    assert n_sharded >= 10, f"tp rule sharded only {n_sharded} leaves"
    out = jax.jit(fn)(jax.device_put(params, shardings), latent, t, text)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5
    )
