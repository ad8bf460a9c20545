"""ops/quant: dynamic int8 matmul accuracy, the Dense interceptor's gating
rules, and the pipeline-level `pipe.quant = 'int8'` switch."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdm_tpu.ops import quant


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)


def test_int8_dot_accuracy():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (64, 256), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(rng, 1), (256, 128), jnp.float32)
    ref = x @ w
    out = quant.int8_dot(x, w)
    assert out.dtype == x.dtype
    assert _cos(out, ref) > 0.9995
    # per-element error bounded by the quantization step sizes
    err = np.abs(np.asarray(out) - np.asarray(ref))
    assert err.max() < 0.05 * np.abs(np.asarray(ref)).max() + 0.5


def test_int8_dot_outlier_rows_keep_own_scale():
    """Per-row activation scales: one huge row must not destroy the
    precision of the others (the failure mode of a single global scale)."""
    x = jnp.ones((4, 512), jnp.float32) * 0.01
    x = x.at[0].mul(1e4)
    w = jax.random.normal(jax.random.PRNGKey(2), (512, 512), jnp.float32)
    ref = x @ w
    out = quant.int8_dot(x, w)
    for i in range(4):
        assert _cos(out[i], ref[i]) > 0.999, i


def test_int8_dot_zero_input_is_zero():
    x = jnp.zeros((8, 512), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(3), (512, 512), jnp.float32)
    np.testing.assert_array_equal(np.asarray(quant.int8_dot(x, w)), 0.0)


class _Wide(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Dense(512, name="wide")(x)


def test_interceptor_reroutes_large_dense(monkeypatch):
    monkeypatch.setattr(quant, "WIDE_DIM", 512)
    m = _Wide()
    x = jax.random.normal(jax.random.PRNGKey(4), (300, 512), jnp.float32)
    p = m.init(jax.random.PRNGKey(5), x)
    ref = m.apply(p, x)
    with quant.quantize_int8():
        out = m.apply(p, x)
    assert not np.array_equal(np.asarray(out), np.asarray(ref))  # rerouted
    assert _cos(out, ref) > 0.999  # ...but numerically faithful


def test_interceptor_gates_small_layers(monkeypatch):
    """Below the token/width thresholds nn.Dense stays bit-exact (the
    per-sample modulation/timestep MLPs carry ~0 FLOPs but the largest
    relative quantization error; square hidden×hidden linears measured
    slower under dynamic quant than bf16)."""
    monkeypatch.setattr(quant, "WIDE_DIM", 512)
    m = _Wide()
    x_few = jax.random.normal(jax.random.PRNGKey(6), (4, 512), jnp.float32)
    p = m.init(jax.random.PRNGKey(7), x_few)
    with quant.quantize_int8():
        out = m.apply(p, x_few)  # 4 tokens < MIN_TOKENS
    np.testing.assert_array_equal(np.asarray(out), np.asarray(m.apply(p, x_few)))

    monkeypatch.setattr(quant, "WIDE_DIM", 4096)
    x = jax.random.normal(jax.random.PRNGKey(10), (300, 512), jnp.float32)
    p2 = m.init(jax.random.PRNGKey(11), x)
    with quant.quantize_int8():
        out = m.apply(p2, x)  # 512 wide < WIDE_DIM: stays bf16
    np.testing.assert_array_equal(np.asarray(out), np.asarray(m.apply(p2, x)))

    class Narrow(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(16, name="narrow")(x)

    n = Narrow()
    x = jax.random.normal(jax.random.PRNGKey(8), (300, 16), jnp.float32)
    pn = n.init(jax.random.PRNGKey(9), x)
    with quant.quantize_int8():
        out = n.apply(pn, x)  # 16 < MIN_DIM
    np.testing.assert_array_equal(np.asarray(out), np.asarray(n.apply(pn, x)))


def test_quant_scope_validates_mode():
    with pytest.raises(ValueError, match="int8"):
        quant.quant_scope("fp4")
    with quant.quant_scope(None):
        pass  # no-op


def test_pipeline_quant_switch(monkeypatch, tmp_path):
    """pipe.quant = 'int8': images stay close to the bf16 path, both
    variants live in the jit cache side by side, and resetting to None
    reproduces the exact baseline."""
    from tdm_tpu.models import pixart
    from tdm_tpu.pipelines import PixArtPipeline

    monkeypatch.setattr(quant, "MIN_TOKENS", 1)
    monkeypatch.setattr(quant, "MIN_DIM", 1)
    monkeypatch.setattr(quant, "WIDE_DIM", 1)

    cfg = pixart.PixArtConfig.tiny()
    model = pixart.PixArtTransformer2D(cfg=cfg)
    lat = jnp.zeros((1, 4, 16, 16))
    text = jnp.zeros((1, 8, cfg.caption_dim))
    mask = jnp.ones((1, 8), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), lat, jnp.zeros((1,)), text, mask
    )["params"]
    pipe = PixArtPipeline(model, params)
    emb = (
        jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.caption_dim)),
        mask,
    )
    kw = dict(
        prompt_embeds=emb, num_inference_steps=2, height=128, width=128,
        seed=42, output_type="latent",
    )
    base = np.asarray(pipe(**kw).latents)
    pipe.quant = "int8"
    q = np.asarray(pipe(**kw).latents)
    assert not np.array_equal(q, base)
    assert _cos(q, base) > 0.99
    pipe.quant = None
    again = np.asarray(pipe(**kw).latents)
    np.testing.assert_array_equal(again, base)


def test_int8_sampler_matches_bf16_within_tolerance(monkeypatch):
    """End-to-end quality evidence for the int8 serving mode: the full
    4-NFE PixArt rollout under `quantize_int8()` must stay close to the
    exact sampler (same noise/params/grid). Gates opened so the tiny
    model's Dense layers quantize — the error bound here is what the
    README's int8 throughput claims lean on."""
    import jax
    import jax.numpy as jnp

    from tdm_tpu.core import sampling, schedules as sched
    from tdm_tpu.models import pixart
    from tdm_tpu.ops import quant

    monkeypatch.setattr(quant, "MIN_TOKENS", 1)
    monkeypatch.setattr(quant, "MIN_DIM", 1)
    monkeypatch.setattr(quant, "WIDE_DIM", 1)

    cfg = pixart.PixArtConfig.tiny()
    model = pixart.PixArtTransformer2D(cfg=cfg)
    b, s = 2, 8
    lat = jnp.zeros((b, cfg.in_channels, cfg.sample_size, cfg.sample_size))
    text = jax.random.normal(jax.random.PRNGKey(0), (b, s, cfg.caption_dim))
    mask = jnp.ones((b, s), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(1), lat, jnp.zeros((b,)), text, mask
    )["params"]
    schedule = sched.ddpm_linear()
    grid = sched.fewstep_grid(1000, 4)

    def run(quantized: bool):
        def fn(x, t, cond):
            te, m = cond
            return pixart.epsilon(model.apply({"params": params}, x, t, te, m))

        def sample():
            return sampling.sample_fewstep(
                fn, schedule,
                jax.random.normal(jax.random.PRNGKey(2), lat.shape),
                (text, mask), timestep_grid=grid,
            )

        if quantized:
            with quant.quantize_int8():
                return jax.jit(sample)()
        return jax.jit(sample)()

    exact = run(False)
    q = run(True)
    assert bool(jnp.isfinite(q).all())
    rel = float(
        jnp.linalg.norm(q - exact) / jnp.maximum(jnp.linalg.norm(exact), 1e-6)
    )
    # dynamic per-row/col int8 across 4 chained denoiser forwards: a few
    # percent relative drift is the expected envelope; a broken scale or
    # transposed quantization axis lands orders of magnitude above this
    assert rel < 0.15, f"int8 sampler diverged: rel err {rel:.3f}"


def test_int8_under_tp():
    """int8_dot with a tp-sharded weight (column- AND row-parallel) matches
    the unsharded int8 result: the absmax scale reductions trace on GLOBAL
    shapes, so GSPMD lowers them to all-reduce-max collectives — same
    scales, same quantized values, only float-reassociation drift. This is
    what makes quant='int8' + tensor_parallel_mesh (and --quant_forwards
    + --tp) composable."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    x = jax.random.normal(jax.random.PRNGKey(0), (16, 512))
    w = jax.random.normal(jax.random.PRNGKey(1), (512, 256))
    ref = quant.int8_dot(x, w)

    mesh = Mesh(np.array(jax.devices()), ("tp",))
    for spec in (P(None, "tp"), P("tp", None)):  # column- / row-parallel
        ws = jax.device_put(w, NamedSharding(mesh, spec))
        xs = jax.device_put(x, NamedSharding(mesh, P()))
        out = jax.jit(quant.int8_dot)(xs, ws)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
        )
