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


@pytest.mark.parametrize("name", families.FAMILIES)
def test_bundle_schedule_is_native(name):
    """Each bundle carries its schedule's NATIVE prediction type and a
    denoise_fn returning the raw model output — all conversions happen
    inside the prediction-type-aware step. (Regression: an ε-converted
    contract double-converted inside the step — sd3 recovered x₀=0.174
    instead of 0.7 — and was singular at CogVideoX's zero-terminal-SNR
    top timestep.)"""
    from tdm_tpu.core import schedules as sched

    b = families.build(name, tiny=True)
    expected = {
        "pixart": sched.EPSILON,
        "sd15": sched.EPSILON,
        "sd3": sched.FLOW,
        "cogvideox": sched.V_PREDICTION,
    }[name]
    assert b.schedule.prediction_type == expected


@pytest.mark.parametrize(
    "native_fn", ["ddpm_linear", "flow_match", "cogvideox"],
    ids=["eps", "flow", "v_pred"],
)
def test_native_target_is_the_dsm_fixed_point(native_fn):
    """native_target(schedule, x0, ε, t) is exactly the output a PERFECT
    model produces at x_t = add_noise(x0, ε, t): predicted_origin of it
    recovers x0 and predicted_noise recovers ε — including at the terminal
    timestep of the zero-terminal-SNR CogVideoX schedule, where ε-space
    recovery divides by α = 0."""
    from tdm_tpu.core import schedules as sched

    native = getattr(sched, native_fn)()
    x0 = jnp.full((2, 1, 4, 4), 0.7)
    eps = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    t = jnp.array([500, native.num_train_timesteps - 1])  # incl. terminal
    x_t = sched.add_noise(native, x0, eps, t)
    out = sched.native_target(native, x0, eps, t)
    got_x0 = sched.predicted_origin(native, out, t, x_t)
    np.testing.assert_allclose(np.asarray(got_x0), np.asarray(x0), atol=1e-4)
    if native_fn != "cogvideox":
        # ε recovery (v-pred terminal row is α=0: ε enters x_t directly,
        # fine; for DDPM/flow also check the noise round-trip)
        got_eps = sched.predicted_noise(native, out, t, x_t)
        np.testing.assert_allclose(
            np.asarray(got_eps), np.asarray(eps), atol=1e-4
        )
    else:
        # zero-terminal row: α=0 ⇒ x_t = ε and the native v target stays
        # finite where the ε-space x₀ formula is 0/0
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_allclose(
            np.asarray(x_t[1]), np.asarray(eps[1]), atol=1e-5
        )


def test_instruct_mode_rejects_non_epsilon_schedules():
    """The demo's 'instruct' term is ε/DDPM transport math
    (src/predictor.py:76-97) — undefined for flow / zero-terminal-SNR
    schedules; build_train_step must refuse rather than NaN."""
    from tdm_tpu.core import schedules as sched
    from tdm_tpu.train import optim as topt, tdm

    tx = topt.make_optimizer(1e-3)
    with pytest.raises(ValueError, match="instruct"):
        tdm.build_train_step(
            lambda p, x, t, c: x,
            {"w": jnp.zeros(2)},
            sched.cogvideox(),
            tdm.TDMConfig(loss_mode="instruct"),
            tx, tx, sample_shape=(1, 4, 4),
        )


def test_mixed_precision_maps_to_compute_dtype():
    """--mixed_precision drives the denoiser's compute dtype (reference
    src/main.py:330-338): full-size bf16 default, 'no' → f32, fp16 →
    error pointing at bf16; tiny smoke configs stay f32 (CPU harness)."""
    b16 = families.build("pixart", tiny=False, mixed_precision="bf16")
    assert b16.model.cfg.dtype == jnp.bfloat16
    f32 = families.build("pixart", tiny=False, mixed_precision="no")
    assert f32.model.cfg.dtype == jnp.float32
    tiny = families.build("pixart", tiny=True, mixed_precision="bf16")
    assert tiny.model.cfg.dtype == jnp.float32
    with pytest.raises(ValueError, match="bf16"):
        families.build("pixart", tiny=False, mixed_precision="fp16")
    # the dtype actually changes activations, not just config metadata
    params = tiny.init_params(jax.random.PRNGKey(0))
    sd3_no = families.build("sd3", tiny=False, mixed_precision="no")
    sd3_b16 = families.build("sd3", tiny=False, mixed_precision="bf16")
    assert sd3_no.model.cfg.dtype != sd3_b16.model.cfg.dtype
    del params


def test_sd3_pooled_standin_guard():
    """A full-size sd3 bundle REFUSES to fabricate pooled conditioning
    unless --allow_pooled_standin; tiny smoke mode is always allowed;
    real pooled vectors pass through untouched (SD3's triple-encoder
    conditioning, reference README.md:48)."""
    text = jnp.zeros((2, 8, 16))
    mask = jnp.ones((2, 8), jnp.int32)

    full = families.build("sd3", tiny=False)
    with pytest.raises(ValueError, match="allow_pooled_standin"):
        full.cond_of(text, mask, None)

    opted = families.build("sd3", tiny=False, allow_pooled_standin=True)
    ctx, pooled = opted.cond_of(text, mask, None)
    assert pooled.shape == (2, opted.model.cfg.pooled_dim)

    tiny = families.build("sd3", tiny=True)
    ctx, pooled = tiny.cond_of(text, mask, None)
    assert pooled.shape == (2, tiny.model.cfg.pooled_dim)

    real = jnp.ones((2, full.model.cfg.pooled_dim))
    ctx, pooled = full.cond_of(text, mask, real)
    np.testing.assert_array_equal(np.asarray(pooled), np.asarray(real))
