"""Pipeline API tests — the §3.4 call contract on tiny models: prompt
encoding, CFG on/off, LoRA verbs (load / set_adapters scale), determinism
under fixed seed, decode plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdm_tpu.lora import LoRA, init_lora, save_kohya
from tdm_tpu.models import (
    cogvideox as cog,
    mmdit_sd3,
    pixart,
    t5 as t5_mod,
    unet_sd15,
    vae as vae_lib,
    vae3d,
)
from tdm_tpu.pipelines import (
    CogVideoXPipeline,
    PipelineOutput,
    PixArtPipeline,
    SD3Pipeline,
    SD15Pipeline,
)


class FakeTokenizer:
    """Deterministic stand-in: hashes words to ids (tests only)."""

    def __init__(self, vocab=90, eos=95):
        self.vocab, self.eos = vocab, eos

    def __call__(self, texts, max_length):
        ids = np.zeros((len(texts), max_length), np.int32)
        mask = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            toks = [hash(w) % self.vocab for w in t.split()][: max_length - 1]
            ids[i, : len(toks)] = toks
            ids[i, len(toks)] = self.eos
            mask[i, : len(toks) + 1] = 1
        return ids, mask


@pytest.fixture(scope="module")
def pixart_pipe():
    cfg = pixart.PixArtConfig.tiny()
    model = pixart.PixArtTransformer2D(cfg=cfg)
    lat = jnp.zeros((1, 4, 16, 16))
    text = jnp.zeros((1, 8, cfg.caption_dim))
    mask = jnp.ones((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), lat, jnp.zeros((1,)), text, mask)[
        "params"
    ]
    tcfg = t5_mod.T5Config.tiny()  # d_model 32 == tiny caption_dim
    enc = t5_mod.T5Encoder(cfg=tcfg)
    tparams = enc.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32), mask
    )["params"]
    vcfg = vae_lib.TAESDConfig(width=8, num_stages=1, blocks_per_stage=1)
    dec = vae_lib.TAESDDecoder(cfg=vcfg)
    vparams = dec.init(jax.random.PRNGKey(2), lat)["params"]
    return PixArtPipeline(
        model, params,
        vae_decoder=dec, vae_params=vparams,
        text_encoder=enc, text_encoder_params=tparams,
        tokenizer=FakeTokenizer(vocab=120), max_text_len=8,
    )


def test_pixart_call_contract(pixart_pipe):
    out = pixart_pipe(
        ["a cat"], num_inference_steps=4, height=128, width=128, seed=42
    )
    # 16×16 latent → TAESD(1 stage ×2) → 32×32 image… height/8=16, ×2 = 32
    assert out.images.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out.images)).all()
    assert float(out.images.min()) >= 0.0 and float(out.images.max()) <= 1.0
    # determinism under fixed seed
    out2 = pixart_pipe(
        ["a cat"], num_inference_steps=4, height=128, width=128, seed=42
    )
    np.testing.assert_array_equal(np.asarray(out.images), np.asarray(out2.images))
    # different seed → different image
    out3 = pixart_pipe(
        ["a cat"], num_inference_steps=4, height=128, width=128, seed=7
    )
    assert not np.allclose(np.asarray(out.images), np.asarray(out3.images))


def test_pixart_cfg_changes_output(pixart_pipe):
    a = pixart_pipe(["a cat"], guidance_scale=1.0, height=128, width=128, seed=1)
    b = pixart_pipe(
        ["a cat"], negative_prompt=["ugly"], guidance_scale=4.5,
        height=128, width=128, seed=1,
    )
    assert not np.allclose(np.asarray(a.images), np.asarray(b.images))


def test_num_images_per_prompt(pixart_pipe):
    """diffusers' num_images_per_prompt (reference README.md:103): N
    images per prompt in repeat_interleave order — pipe([A,B], n=2) with
    pinned latents must equal pipe([A,A,B,B], n=1) on the same latents."""
    noise = jax.random.normal(jax.random.PRNGKey(5), (4, 4, 16, 16), jnp.bfloat16)
    multi = pixart_pipe(
        ["a cat", "a dog"], num_images_per_prompt=2,
        height=128, width=128, latents=noise,
    )
    assert multi.images.shape == (4, 32, 32, 3)
    manual = pixart_pipe(
        ["a cat", "a cat", "a dog", "a dog"],
        height=128, width=128, latents=noise,
    )
    np.testing.assert_array_equal(
        np.asarray(multi.images), np.asarray(manual.images)
    )
    # distinct noise rows → the two images of one prompt differ
    assert not np.allclose(
        np.asarray(multi.images[0]), np.asarray(multi.images[1])
    )
    with pytest.raises(ValueError, match="num_images_per_prompt"):
        pixart_pipe(["a cat"], num_images_per_prompt=0, height=128, width=128)


def test_negative_prompt_batch_mismatch_is_loud(pixart_pipe):
    """diffusers check_inputs parity: a negative_prompt list that doesn't
    match the prompt batch raises a clear ValueError at the Python
    boundary, not an XLA shape error inside the jitted sampler."""
    with pytest.raises(ValueError, match="negative_prompt"):
        pixart_pipe(
            ["a cat", "a dog"], negative_prompt=["ugly"],
            guidance_scale=4.5, height=128, width=128,
        )


def test_lora_verbs(pixart_pipe, tmp_path):
    base = pixart_pipe(["a cat"], height=128, width=128, seed=3)
    rng = jax.random.PRNGKey(9)
    lora = init_lora(pixart_pipe.base_params, rng, rank=2)
    lora = LoRA(
        params=jax.tree.map(
            lambda x: x + 0.1 * jax.random.normal(rng, x.shape), lora.params
        ),
        alpha=lora.alpha,
    )
    f = str(tmp_path / "l.safetensors")
    save_kohya(lora, f, dtype=np.float32)

    pixart_pipe.load_lora_weights(f, adapter_name="tdm")
    with_lora = pixart_pipe(["a cat"], height=128, width=128, seed=3)
    assert not np.allclose(np.asarray(base.images), np.asarray(with_lora.images))

    # scale 0 == adapter off (the teacher-baseline trick, README.md:69-71)
    pixart_pipe.set_adapters(["tdm"], [0.0])
    off = pixart_pipe(["a cat"], height=128, width=128, seed=3)
    np.testing.assert_allclose(
        np.asarray(base.images), np.asarray(off.images), atol=1e-6
    )
    pixart_pipe.set_adapters(["tdm"], [0.0])  # leave pristine for other tests


def test_sd15_pipeline_latent_path():
    cfg = unet_sd15.UNetConfig.tiny()
    model = unet_sd15.UNet2DCondition(cfg=cfg)
    lat = jnp.zeros((1, 4, 16, 16))
    ctx = jnp.zeros((1, 6, cfg.context_dim))
    params = model.init(
        jax.random.PRNGKey(0), lat, jnp.zeros((1,)), ctx, jnp.ones((1, 6), jnp.int32)
    )["params"]
    pipe = SD15Pipeline(model, params)
    embeds = (
        jax.random.normal(jax.random.PRNGKey(1), (1, 6, cfg.context_dim)),
        jnp.ones((1, 6), jnp.int32),
    )
    out = pipe(
        prompt_embeds=embeds, num_inference_steps=4, height=128, width=128,
        seed=317, output_type="latent",
    )
    assert out.latents.shape == (1, 4, 16, 16)
    assert np.isfinite(np.asarray(out.latents, dtype=np.float32)).all()


def test_sd3_pipeline_flow_shift_knob():
    cfg = mmdit_sd3.MMDiTConfig.tiny()
    model = mmdit_sd3.SD3Transformer2D(cfg=cfg)
    lat = jnp.zeros((1, 16, 8, 8))
    ctx = jnp.zeros((1, 6, cfg.context_dim))
    pooled = jnp.zeros((1, cfg.pooled_dim))
    params = model.init(
        jax.random.PRNGKey(0), lat, jnp.zeros((1,)), ctx, pooled
    )["params"]
    pipe = SD3Pipeline(model, params)
    embeds = (
        jax.random.normal(jax.random.PRNGKey(1), (1, 6, cfg.context_dim)),
        jax.random.normal(jax.random.PRNGKey(2), (1, cfg.pooled_dim)),
    )
    kw = dict(
        prompt_embeds=embeds, num_inference_steps=4, height=64, width=64,
        seed=8888, output_type="latent",
    )
    a = pipe(flow_shift=1.0, **kw)
    b = pipe(flow_shift=6.0, **kw)
    assert a.latents.shape == (1, 16, 8, 8)
    assert not np.allclose(
        np.asarray(a.latents, dtype=np.float32),
        np.asarray(b.latents, dtype=np.float32),
    )


def test_sd3_pipeline_unipc_solver_knob():
    """`solver="unipc"` compiles its own sampler and produces a finite,
    dpm-distinct latent (the corrector re-weights every step K>1)."""
    cfg = mmdit_sd3.MMDiTConfig.tiny()
    model = mmdit_sd3.SD3Transformer2D(cfg=cfg)
    lat = jnp.zeros((1, 16, 8, 8))
    ctx = jnp.zeros((1, 6, cfg.context_dim))
    pooled = jnp.zeros((1, cfg.pooled_dim))
    params = model.init(
        jax.random.PRNGKey(0), lat, jnp.zeros((1,)), ctx, pooled
    )["params"]
    pipe = SD3Pipeline(model, params)
    embeds = (
        jax.random.normal(jax.random.PRNGKey(1), (1, 6, cfg.context_dim)),
        jax.random.normal(jax.random.PRNGKey(2), (1, cfg.pooled_dim)),
    )
    kw = dict(
        prompt_embeds=embeds, num_inference_steps=4, height=64, width=64,
        seed=8888, output_type="latent",
    )
    a = pipe(solver="dpm", **kw)
    b = pipe(solver="unipc", **kw)
    assert np.isfinite(np.asarray(b.latents, dtype=np.float32)).all()
    assert not np.allclose(
        np.asarray(a.latents, dtype=np.float32),
        np.asarray(b.latents, dtype=np.float32),
    )
    with pytest.raises(ValueError):
        pipe(solver="euler", **kw)


def test_cogvideox_pipeline_video_decode():
    cfg = cog.CogVideoXConfig.tiny()
    model = cog.CogVideoXTransformer3D(cfg=cfg)
    vcfg = vae3d.VAE3DConfig.tiny()
    dec = vae3d.VAE3DDecoder(cfg=vcfg)
    lat = jnp.zeros((1, 16, cfg.sample_frames, cfg.sample_h, cfg.sample_w))
    text = jnp.zeros((1, cfg.max_text_len, cfg.text_dim))
    params = model.init(jax.random.PRNGKey(0), lat, jnp.zeros((1,)), text)["params"]
    vparams = dec.init(jax.random.PRNGKey(1), lat)["params"]
    pipe = CogVideoXPipeline(
        model, params, vae_decoder=dec, vae_params=vparams, vae_cfg=vcfg,
        vae_tile=8, vae_tile_overlap=2,
    )
    num_frames = 1 + (cfg.sample_frames - 1) * vcfg.temporal_factor
    out = pipe(
        prompt_embeds=jax.random.normal(
            jax.random.PRNGKey(3), (1, cfg.max_text_len, cfg.text_dim)
        ),
        num_inference_steps=4,
        num_frames=num_frames,
        height=cfg.sample_h * vcfg.spatial_factor,
        width=cfg.sample_w * vcfg.spatial_factor,
        seed=8888,
    )
    assert out.images.shape == (
        1, num_frames,
        cfg.sample_h * vcfg.spatial_factor, cfg.sample_w * vcfg.spatial_factor, 3,
    )
    assert np.isfinite(np.asarray(out.images)).all()
    # diffusers accessor: pipe(...).frames[0] (reference README.md:133-135)
    assert out.frames is out.images
    with pytest.raises(AttributeError, match="video outputs"):
        PipelineOutput(images=jnp.zeros((1, 8, 8, 3))).frames

    # enable_slicing analog: the conv-cache temporal streaming decode must
    # reproduce the monolithic-decode pipeline output exactly (same seed →
    # same latents; decode path differs only in chunking)
    pipe_stream = CogVideoXPipeline(
        model, params, vae_decoder=dec, vae_params=vparams, vae_cfg=vcfg,
        vae_tile=8, vae_tile_overlap=2, vae_temporal_chunk=2,
    )
    out_s = pipe_stream(
        prompt_embeds=jax.random.normal(
            jax.random.PRNGKey(3), (1, cfg.max_text_len, cfg.text_dim)
        ),
        num_inference_steps=4,
        num_frames=num_frames,
        height=cfg.sample_h * vcfg.spatial_factor,
        width=cfg.sample_w * vcfg.spatial_factor,
        seed=8888,
    )
    np.testing.assert_allclose(
        np.asarray(out_s.images), np.asarray(out.images), atol=1e-5, rtol=1e-5
    )


def test_cogvideox_negative_prompt_text_path():
    """With encoders attached and cfg>1, `negative_prompt` text is ENCODED
    (diffusers CogVideoXPipeline semantics), not replaced by a zero
    embedding — so two different negative prompts give different videos
    and num_videos_per_prompt fans the batch out."""
    cfg = cog.CogVideoXConfig.tiny()
    model = cog.CogVideoXTransformer3D(cfg=cfg)
    lat = jnp.zeros((1, 16, cfg.sample_frames, cfg.sample_h, cfg.sample_w))
    text = jnp.zeros((1, cfg.max_text_len, cfg.text_dim))
    params = model.init(jax.random.PRNGKey(0), lat, jnp.zeros((1,)), text)[
        "params"
    ]
    tcfg = t5_mod.T5Config.tiny()
    enc = t5_mod.T5Encoder(cfg=tcfg)
    mask = jnp.ones((1, cfg.max_text_len), jnp.int32)
    tparams = enc.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, cfg.max_text_len), jnp.int32), mask,
    )["params"]
    assert tcfg.d_model == cfg.text_dim  # tiny configs line up
    pipe = CogVideoXPipeline(
        model, params,
        text_encoder=enc, text_encoder_params=tparams,
        tokenizer=FakeTokenizer(vocab=120),
    )
    num_frames = 1 + (cfg.sample_frames - 1) * pipe.vae_cfg.temporal_factor
    kw = dict(
        num_inference_steps=2, guidance_scale=4.0, num_frames=num_frames,
        height=cfg.sample_h * pipe.vae_cfg.spatial_factor,
        width=cfg.sample_w * pipe.vae_cfg.spatial_factor,
        seed=8888, output_type="latent",
    )
    a = pipe(["a panda plays guitar"], **kw)
    b = pipe(["a panda plays guitar"], negative_prompt=["blurry ugly"], **kw)
    assert not np.allclose(
        np.asarray(a.latents, np.float32), np.asarray(b.latents, np.float32)
    )
    multi = pipe(["a panda plays guitar"], num_videos_per_prompt=2, **kw)
    assert multi.latents.shape[0] == 2


def test_cogvideox_pipeline_sequence_parallel_matches_monolithic():
    """Pipeline-level SP (sequence_parallel_mesh): latents match the
    monolithic pipeline bit-for-bit-ish on the same seed — the user-facing
    beyond-one-chip video path."""
    import dataclasses

    from jax.sharding import Mesh

    base = dataclasses.replace(cog.CogVideoXConfig.tiny(), sample_frames=8)
    vcfg = vae3d.VAE3DConfig.tiny()
    num_frames = 1 + (8 - 1) * vcfg.temporal_factor
    mono = cog.CogVideoXTransformer3D(cfg=base)
    lat = jnp.zeros((1, 16, 8, base.sample_h, base.sample_w))
    text = jnp.zeros((1, base.max_text_len, base.text_dim))
    params = mono.init(jax.random.PRNGKey(0), lat, jnp.zeros((1,)), text)["params"]
    embeds = jax.random.normal(
        jax.random.PRNGKey(3), (1, base.max_text_len, base.text_dim)
    )
    kw = dict(
        prompt_embeds=embeds, num_inference_steps=4, num_frames=num_frames,
        height=base.sample_h * vcfg.spatial_factor,
        width=base.sample_w * vcfg.spatial_factor,
        seed=8888, output_type="latent",
    )
    ref = CogVideoXPipeline(mono, params, vae_cfg=vcfg)(**kw).latents

    sp_cfg = dataclasses.replace(base, sequence_parallel_axis="sp")
    spm = cog.CogVideoXTransformer3D(cfg=sp_cfg)

    # sp+tp composition: ONE ('data','sp','tp') mesh as the sp mesh —
    # frames manual over 'sp', projections auto-sharded over 'tp'
    # (pipelines/cogvideox.py places params with the megatron rule)
    mesh3 = Mesh(
        np.asarray(jax.devices()).reshape(1, 4, 2), ("data", "sp", "tp")
    )
    out3 = CogVideoXPipeline(
        spm, params, vae_cfg=vcfg, sequence_parallel_mesh=mesh3
    )(**kw).latents
    # bf16 sampler: tp repartitions the projections' reductions, so allow
    # the same bf16 1-ULP envelope as the dp/tp serving tests (observed
    # max relative drift 0.6% ≈ bf16 eps; the f32 apply-level composition
    # test in test_cogvideox_sp.py pins exactness at 3e-5)
    np.testing.assert_allclose(
        np.asarray(out3, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.1,
    )

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
    out = CogVideoXPipeline(
        spm, params, vae_cfg=vcfg, sequence_parallel_mesh=mesh
    )(**kw).latents
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-5, rtol=3e-5,
    )

    # mismatched knobs fail loudly
    import pytest
    with pytest.raises(ValueError, match="sequence_parallel"):
        CogVideoXPipeline(spm, params, vae_cfg=vcfg)
    with pytest.raises(ValueError, match="sequence_parallel"):
        CogVideoXPipeline(mono, params, vae_cfg=vcfg, sequence_parallel_mesh=mesh)
    # SP and DP meshes are mutually exclusive on one pipeline
    sp_pipe = CogVideoXPipeline(
        spm, params, vae_cfg=vcfg, sequence_parallel_mesh=mesh
    )
    sp_pipe.data_parallel_mesh = mesh
    with pytest.raises(ValueError, match="mutually"):
        sp_pipe(**kw)
    sp_pipe.data_parallel_mesh = None
    sp_pipe.tensor_parallel_mesh = mesh
    with pytest.raises(ValueError, match="mutually"):
        sp_pipe(**kw)


def test_data_parallel_mesh_matches_single_device(pixart_pipe):
    """`pipe.data_parallel_mesh`: batch sharded over the 8-device 'data'
    axis, params replicated — the reference's DP (src/main.py:321-323) on
    the serving side. Latents must match the single-device run exactly
    (same program, SPMD layout)."""
    import jax

    from jax.sharding import Mesh

    prompts = ["a cat", "a dog"] * 4  # batch 8 over 8 devices
    ref = pixart_pipe(
        prompts, num_inference_steps=4, height=128, width=128, seed=3,
        output_type="latent",
    )
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))
    pixart_pipe.data_parallel_mesh = mesh
    try:
        dp = pixart_pipe(
            prompts, num_inference_steps=4, height=128, width=128, seed=3,
            output_type="latent",
        )
        # bf16 latents: SPMD partitioning reorders a few fusions, so allow
        # 1-ULP bf16 drift (observed: 3/8192 elements, ≤1 ULP)
        np.testing.assert_allclose(
            np.asarray(dp.latents, np.float32),
            np.asarray(ref.latents, np.float32),
            rtol=0.05, atol=0.1,
        )
        # indivisible batch → loud error naming the constraint
        with pytest.raises(ValueError, match="does not divide"):
            pixart_pipe(
                prompts[:3], num_inference_steps=4, height=128, width=128,
                seed=3, output_type="latent",
            )
        # reassigning the mesh takes effect on the NEXT call (the wrapper
        # reads the live attribute — regression: a cached closure kept the
        # old mesh)
        mesh4 = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("data",))
        pixart_pipe.data_parallel_mesh = mesh4
        dp4 = pixart_pipe(
            prompts, num_inference_steps=4, height=128, width=128, seed=3,
            output_type="latent",
        )
        assert dp4.latents.sharding.mesh.devices.size == 4
    finally:
        pixart_pipe.data_parallel_mesh = None


def test_tensor_parallel_mesh_matches_single_device(pixart_pipe):
    """`pipe.tensor_parallel_mesh`: attention/FF projections megatron-
    sharded over 'tp' (parallel/tp.py), batch over 'data' — the latency-
    scaling extension the reference lacks (DDP+ZeRO-3 only,
    src/main.py:141-160). Latents must match the single-device run."""
    import jax
    from jax.sharding import Mesh

    prompts = ["a cat", "a dog"]
    kw = dict(
        num_inference_steps=4, height=128, width=128, seed=3,
        output_type="latent",
    )
    ref = pixart_pipe(prompts, **kw)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "tp"))
    pixart_pipe.tensor_parallel_mesh = mesh
    try:
        out = pixart_pipe(prompts, **kw)
        np.testing.assert_allclose(
            np.asarray(out.latents, np.float32),
            np.asarray(ref.latents, np.float32),
            rtol=0.05, atol=0.1,  # bf16 1-ULP envelope, as the DP test
        )
        # dp and tp knobs are mutually exclusive (tp mesh carries 'data');
        # the conflict surfaces AT ASSIGNMENT, not one call later
        with pytest.raises(ValueError, match="mutually"):
            pixart_pipe.data_parallel_mesh = Mesh(
                np.asarray(jax.devices()[:4]).reshape(4), ("data",)
            )
        # int8 dynamic-quant composes with tp: global-shape tracing lowers
        # the absmax scales to collectives — must MATCH the single-device
        # int8 run, not merely stay finite
        pixart_pipe.tensor_parallel_mesh = None
        pixart_pipe.quant = "int8"
        ref_i8 = pixart_pipe(prompts, **kw)
        pixart_pipe.tensor_parallel_mesh = mesh
        out_i8 = pixart_pipe(prompts, **kw)
        np.testing.assert_allclose(
            np.asarray(out_i8.latents, np.float32),
            np.asarray(ref_i8.latents, np.float32),
            rtol=0.05, atol=0.1,
        )
    finally:
        pixart_pipe.quant = None
        pixart_pipe.data_parallel_mesh = None
        pixart_pipe.tensor_parallel_mesh = None
