"""Golden regression fixtures: fixed (params-seed, noise, embedding) tuples
whose 4-NFE sampler outputs are committed as .npz fixtures — any kernel,
schedule, or solver change that shifts outputs numerically fails here.

This is the reproducibility contract of the reference's fixed-seed
validation methodology (`/root/reference/src/training.py:44,107-121`, seeds
pinned in `README.md:57,98,133`) turned into an automated test (the
reference only eyeballs grids; SURVEY.md §4).

Regenerate after an INTENTIONAL numeric change with:
    TDM_REGEN_GOLDEN=1 python -m pytest tests/test_golden_grids.py
and commit the updated fixtures with a note saying why they moved.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdm_tpu.core import sampling, schedules as sched, solvers

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
REGEN = os.environ.get("TDM_REGEN_GOLDEN", "") == "1"
# same-platform fp32 runs are deterministic; the tolerance absorbs only
# XLA-version-level reassociation, far below any semantic change
ATOL = 5e-4


def _check(name: str, latents: np.ndarray):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if REGEN:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, latents=latents.astype(np.float32))
        pytest.skip(f"regenerated {path}")
    assert os.path.exists(path), (
        f"missing fixture {path} — run with TDM_REGEN_GOLDEN=1 once"
    )
    ref = np.load(path)["latents"]
    assert ref.shape == latents.shape
    np.testing.assert_allclose(
        latents, ref, atol=ATOL, rtol=ATOL,
        err_msg=f"{name}: sampler output drifted from committed golden — "
        f"if the change is intentional, regenerate with TDM_REGEN_GOLDEN=1",
    )


def test_golden_pixart_fewstep():
    """Tiny PixArt, 4-NFE deterministic rollout (generate_new semantics,
    reference src/models.py:20-62)."""
    from tdm_tpu.models import pixart

    cfg = pixart.PixArtConfig.tiny()
    model = pixart.PixArtTransformer2D(cfg=cfg)
    b, seq = 2, 8
    noise = jax.random.normal(jax.random.PRNGKey(42), (b, 4, 16, 16))
    text = jax.random.normal(jax.random.PRNGKey(43), (b, seq, cfg.caption_dim)) * 0.1
    mask = jnp.ones((b, seq), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(7), noise, jnp.zeros((b,)), text, mask
    )["params"]

    def fn(x, t, cond):
        te, m = cond
        return pixart.epsilon(model.apply({"params": params}, x, t, te, m))

    latents = sampling.sample_fewstep(
        fn, sched.ddpm_linear(), noise, (text, mask),
        timestep_grid=sched.fewstep_grid(900, 4),
    )
    _check("pixart_tiny_4nfe", np.asarray(latents, np.float32))


def test_golden_sd3_dpm_solver():
    """Tiny SD3 MMDiT through DPM-Solver++(2M) on the flow grid with the
    recipe's flow_shift=6 (reference README.md:54-56)."""
    from tdm_tpu.models import mmdit_sd3

    cfg = mmdit_sd3.MMDiTConfig.tiny()
    model = mmdit_sd3.SD3Transformer2D(cfg=cfg)
    b = 2
    noise = jax.random.normal(
        jax.random.PRNGKey(8888),
        (b, cfg.in_channels, cfg.sample_size, cfg.sample_size),
    )
    ctx = jax.random.normal(jax.random.PRNGKey(44), (b, 6, cfg.context_dim)) * 0.1
    pooled = jax.random.normal(jax.random.PRNGKey(45), (b, cfg.pooled_dim)) * 0.1
    params = model.init(
        jax.random.PRNGKey(9), noise, jnp.zeros((b,)), ctx, pooled
    )["params"]
    fn = mmdit_sd3.make_denoise_fn(model, params)
    latents = solvers.sample_dpm_solver(
        fn, solvers.flow_grid(4, flow_shift=6.0), noise, (ctx, pooled)
    )
    _check("sd3_tiny_4nfe_dpm", np.asarray(latents, np.float32))


def test_golden_sd3_unipc():
    """Same tiny SD3 tuple through the UniPC predictor–corrector
    (solver='unipc') — pins the corrector's numerics, which no analytic
    test covers once the denoiser is a real network."""
    from tdm_tpu.models import mmdit_sd3

    cfg = mmdit_sd3.MMDiTConfig.tiny()
    model = mmdit_sd3.SD3Transformer2D(cfg=cfg)
    b = 2
    noise = jax.random.normal(
        jax.random.PRNGKey(8888),
        (b, cfg.in_channels, cfg.sample_size, cfg.sample_size),
    )
    ctx = jax.random.normal(jax.random.PRNGKey(44), (b, 6, cfg.context_dim)) * 0.1
    pooled = jax.random.normal(jax.random.PRNGKey(45), (b, cfg.pooled_dim)) * 0.1
    params = model.init(
        jax.random.PRNGKey(9), noise, jnp.zeros((b,)), ctx, pooled
    )["params"]
    fn = mmdit_sd3.make_denoise_fn(model, params)
    latents = solvers.sample_unipc(
        fn, solvers.flow_grid(4, flow_shift=6.0), noise, (ctx, pooled)
    )
    # the corrector must actually bite: unipc != dpm on the same tuple
    dpm = solvers.sample_dpm_solver(
        fn, solvers.flow_grid(4, flow_shift=6.0), noise, (ctx, pooled)
    )
    assert not np.allclose(np.asarray(latents), np.asarray(dpm), atol=1e-4)
    _check("sd3_tiny_4nfe_unipc", np.asarray(latents, np.float32))


def test_golden_cogvideox_fewstep():
    """Tiny CogVideoX on the released checkpoints' trained grid
    t=[999,856,665,399] (reference README.md:129)."""
    from tdm_tpu.models import cogvideox as cog
    from tdm_tpu.pipelines.cogvideox import TDM_TRAINED_GRID

    cfg = cog.CogVideoXConfig.tiny()
    model = cog.CogVideoXTransformer3D(cfg=cfg)
    b = 1
    noise = jax.random.normal(
        jax.random.PRNGKey(8888),
        (b, cfg.in_channels, cfg.sample_frames, cfg.sample_h, cfg.sample_w),
    )
    text = jax.random.normal(
        jax.random.PRNGKey(46), (b, cfg.max_text_len, cfg.text_dim)
    ) * 0.1
    params = model.init(
        jax.random.PRNGKey(10), noise, jnp.zeros((b,)), text
    )["params"]
    fn = cog.make_denoise_fn(model, params)
    latents = sampling.sample_fewstep(
        fn, sched.cogvideox(), noise, text,
        timestep_grid=sched.grid_from_list(list(TDM_TRAINED_GRID)),
    )
    _check("cogvideox_tiny_4nfe", np.asarray(latents, np.float32))


def test_golden_taesd_decode():
    """Tiny TAESD decoder on a fixed latent: pins the VAE conv/norm path
    (the reference decodes every validation grid through TAESD,
    src/training.py:113-116)."""
    from tdm_tpu.models import vae as vae_lib

    cfg = vae_lib.TAESDConfig(
        latent_channels=4, width=16, num_stages=2, blocks_per_stage=1
    )
    dec = vae_lib.TAESDDecoder(cfg=cfg)
    z = jax.random.normal(jax.random.PRNGKey(47), (1, 4, 8, 8))
    params = dec.init(jax.random.PRNGKey(11), z)["params"]
    img = dec.apply({"params": params}, z / cfg.scaling_factor)
    _check("taesd_tiny_decode", np.asarray(img, np.float32))


# --- int8 path -------------------------------------------------------------
# Quant regressions previously could only trip the 15% latent bound in
# test_quant.py; these fixtures pin the int8 rollout numerics themselves.
# Tolerance is looser than bf16: int8 rounding sits on half-integer edges,
# so platform-level fp reassociation in the scale computation can flip a
# quantized lane by 1 — but any semantic change (scale formula, gate set,
# accumulation dtype) moves outputs far beyond this band.
ATOL_INT8 = 5e-3


def _quant_tiny_gates(monkeypatch):
    """Lower the interceptor's size floors so the tiny configs' Dense
    layers reroute (production floors target full-size shapes)."""
    from tdm_tpu.ops import quant

    monkeypatch.setattr(quant, "MIN_TOKENS", 1)
    monkeypatch.setattr(quant, "MIN_DIM", 1)
    monkeypatch.setattr(quant, "WIDE_DIM", 1)


def _check_int8(name: str, latents: np.ndarray):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if REGEN:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, latents=latents.astype(np.float32))
        pytest.skip(f"regenerated {path}")
    assert os.path.exists(path), (
        f"missing fixture {path} — run with TDM_REGEN_GOLDEN=1 once"
    )
    ref = np.load(path)["latents"]
    assert ref.shape == latents.shape
    np.testing.assert_allclose(
        latents, ref, atol=ATOL_INT8, rtol=ATOL_INT8,
        err_msg=f"{name}: int8 sampler output drifted from committed golden",
    )


def test_golden_pixart_fewstep_int8(monkeypatch):
    """Same rollout as test_golden_pixart_fewstep under quantize_int8 —
    pins the dynamic-int8 numerics (ops/quant.py) with a committed fixture.
    Also asserts the interceptor actually engaged (output must differ from
    the bf16 fixture) so a gate regression can't silently no-op this test."""
    from tdm_tpu.models import pixart
    from tdm_tpu.ops import quant

    _quant_tiny_gates(monkeypatch)
    cfg = pixart.PixArtConfig.tiny()
    model = pixart.PixArtTransformer2D(cfg=cfg)
    b, seq = 2, 8
    noise = jax.random.normal(jax.random.PRNGKey(42), (b, 4, 16, 16))
    text = jax.random.normal(jax.random.PRNGKey(43), (b, seq, cfg.caption_dim)) * 0.1
    mask = jnp.ones((b, seq), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(7), noise, jnp.zeros((b,)), text, mask
    )["params"]

    def fn(x, t, cond):
        te, m = cond
        return pixart.epsilon(model.apply({"params": params}, x, t, te, m))

    with quant.quantize_int8():
        latents = np.asarray(
            sampling.sample_fewstep(
                fn, sched.ddpm_linear(), noise, (text, mask),
                timestep_grid=sched.fewstep_grid(900, 4),
            ),
            np.float32,
        )
    bf16_ref = np.load(os.path.join(GOLDEN_DIR, "pixart_tiny_4nfe.npz"))["latents"]
    assert np.abs(latents - bf16_ref).max() > ATOL, (
        "int8 rollout is bit-identical to bf16 — the quant interceptor "
        "did not engage (gate regression?)"
    )
    _check_int8("pixart_tiny_4nfe_int8", latents)


def test_golden_sd3_dpm_solver_int8(monkeypatch):
    """Tiny SD3 DPM-Solver rollout under quantize_int8 (same inputs as the
    bf16 golden)."""
    from tdm_tpu.models import mmdit_sd3
    from tdm_tpu.ops import quant

    _quant_tiny_gates(monkeypatch)
    cfg = mmdit_sd3.MMDiTConfig.tiny()
    model = mmdit_sd3.SD3Transformer2D(cfg=cfg)
    b = 2
    noise = jax.random.normal(
        jax.random.PRNGKey(8888),
        (b, cfg.in_channels, cfg.sample_size, cfg.sample_size),
    )
    ctx = jax.random.normal(jax.random.PRNGKey(44), (b, 6, cfg.context_dim)) * 0.1
    pooled = jax.random.normal(jax.random.PRNGKey(45), (b, cfg.pooled_dim)) * 0.1
    params = model.init(
        jax.random.PRNGKey(9), noise, jnp.zeros((b,)), ctx, pooled
    )["params"]
    fn = mmdit_sd3.make_denoise_fn(model, params)
    with quant.quantize_int8():
        latents = np.asarray(
            solvers.sample_dpm_solver(
                fn, solvers.flow_grid(4, flow_shift=6.0), noise, (ctx, pooled)
            ),
            np.float32,
        )
    bf16_ref = np.load(os.path.join(GOLDEN_DIR, "sd3_tiny_4nfe_dpm.npz"))["latents"]
    assert np.abs(latents - bf16_ref).max() > ATOL
    _check_int8("sd3_tiny_4nfe_dpm_int8", latents)


def test_golden_sd15_dpm_solver():
    """Tiny SD1.5 UNet through DPM-Solver++(2M) on the scaled-linear DDPM
    grid — the Dreamshaper recipe's sampler (reference README.md:95-107,
    seed 317, 4 steps, cfg 1). Completes golden coverage of all four
    denoiser families."""
    from tdm_tpu.models import unet_sd15

    cfg = unet_sd15.UNetConfig.tiny()
    model = unet_sd15.UNet2DCondition(cfg=cfg)
    b = 2
    noise = jax.random.normal(jax.random.PRNGKey(317), (b, 4, 16, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(46), (b, 6, cfg.context_dim)) * 0.1
    mask = jnp.ones((b, 6), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(11), noise, jnp.zeros((b,)), ctx, mask
    )["params"]
    fn = unet_sd15.make_denoise_fn(model, params)
    schedule = sched.ddpm_scaled_linear()
    latents = solvers.sample_dpm_solver(
        fn, solvers.ddpm_grid(schedule, 4), noise, (ctx, mask)
    )
    _check("sd15_tiny_4nfe_dpm", np.asarray(latents, np.float32))
