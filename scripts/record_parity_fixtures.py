#!/usr/bin/env python
"""Record HF-reference parity fixtures for tdm_tpu (run OFF-TPU, on any
machine with torch + diffusers installed).

The reference binds the released HF checkpoints verbatim
(`/root/reference/src/main.py:160-176`; recipes `README.md:45-57,95-98,
114-138`). tdm_tpu's converters are strict and structurally tested, and the
block semantics are torch-replica-tested in-image
(tests/test_torch_block_parity.py) — but activation-level parity against
the REAL diffusers modules needs diffusers, which the TPU build image does
not ship. This script is the capture side: run it where diffusers exists,
commit the resulting npz/json files under tests/fixtures/, and
tests/test_parity_fixtures.py activates automatically.

Modes
-----
1. Tiny-model activation fixtures (self-contained: weights + inputs +
   per-block activations + final output in one npz):

       python scripts/record_parity_fixtures.py --capture pixart --tiny
       python scripts/record_parity_fixtures.py --capture sd3 --tiny
       ... (sd15_unet, cogvideox, klvae, taesd)

2. Real-checkpoint fixtures (inputs + activations only; the test loads
   weights from the checkpoint dir given via TDM_PARITY_WEIGHTS_DIR):

       python scripts/record_parity_fixtures.py --capture sd3 \
           --repo stabilityai/stable-diffusion-3-medium-diffusers

3. Safetensors manifests from a real checkout (header-only, NO torch or
   diffusers needed — works in any python):

       python scripts/record_parity_fixtures.py --manifest path/to.safetensors \
           --family sd3 --out tests/fixtures/manifests/sd3_medium.json

4. Regenerate the committed expected manifests from the in-repo generators
   (no external deps; used to keep tests/fixtures/manifests in sync):

       python scripts/record_parity_fixtures.py --write-expected-manifests

Fixture npz layout (consumed by tests/test_parity_fixtures.py):
    family           0-d str       converter family name
    config_json      0-d str       json of the diffusers config subset
    tiny             0-d bool      weights included?
    in/<name>        arrays        model inputs (numpy, torch layout)
    sd/<key>         arrays        state dict (tiny mode only)
    act/block_<i>    arrays        output of transformer_blocks[i] (image
                                   stream for MMDiT; hidden stream for UNet
                                   fixtures this is the down/mid/up feature)
    act_ctx/block_<i> arrays       context-stream output where dual-stream
    out/final        array         full model output
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

SEED = 1234


# ---------------------------------------------------------------------------
# Mode 3/4: manifests (no torch needed)
# ---------------------------------------------------------------------------


def write_expected_manifests(outdir: str) -> None:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tdm_tpu.io import manifest

    os.makedirs(outdir, exist_ok=True)
    targets = {
        "pixart_xl2_512.json": ("pixart", None),
        "sd3_medium.json": ("sd3", None),
        "sd15_unet.json": ("unet_sd15", None),
        "cogvideox_2b_transformer.json": ("cogvideox", None),
        "sd15_klvae.json": ("klvae", None),
        "cogvideox_vae_decoder.json": ("vae3d_decoder", None),
        "taesd.json": ("taesd", None),
        "taesd3.json": ("taesd3", None),
    }
    for fname, (family, cfg) in targets.items():
        m = manifest.expected_manifest(family, cfg)
        manifest.save_manifest(m, os.path.join(outdir, fname))
        print(f"wrote {fname}: {len(m)} keys")


def capture_manifest(path: str, out: str) -> None:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tdm_tpu.io import manifest

    m = manifest.read_safetensors_manifest(path)
    manifest.save_manifest(m, out)
    print(f"wrote {out}: {len(m)} keys from {path}")


# ---------------------------------------------------------------------------
# Modes 1/2: activation capture (torch + diffusers required)
# ---------------------------------------------------------------------------


def _rng():
    return np.random.default_rng(SEED)


def _save_npz(out_path, family, config, inputs, acts, acts_ctx, final, sd):
    payload = {
        "family": np.array(family),
        "config_json": np.array(json.dumps(config)),
        "tiny": np.array(sd is not None),
        "out/final": final,
    }
    for k, v in inputs.items():
        payload[f"in/{k}"] = v
    for i, a in enumerate(acts):
        payload[f"act/block_{i}"] = a
    for i, a in enumerate(acts_ctx):
        if a is not None:
            payload[f"act_ctx/block_{i}"] = a
    if sd is not None:
        for k, v in sd.items():
            payload[f"sd/{k}"] = v
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez_compressed(out_path, **payload)
    print(f"wrote {out_path} ({len(payload)} entries)")


def _hook_blocks(blocks, acts, acts_ctx):
    import torch

    handles = []

    def mk(i):
        def hook(_mod, _inp, out):
            if isinstance(out, tuple):
                # diffusers JointTransformerBlock returns (ctx, x) or
                # (x, ctx) depending on version — store both, the test
                # matches by shape
                a = [o for o in out if isinstance(o, torch.Tensor)]
                acts[i] = a[-1].detach().float().cpu().numpy()
                acts_ctx[i] = (
                    a[0].detach().float().cpu().numpy() if len(a) > 1 else None
                )
            else:
                acts[i] = out.detach().float().cpu().numpy()
                acts_ctx[i] = None

        return hook

    for i, b in enumerate(blocks):
        handles.append(b.register_forward_hook(mk(i)))
    return handles


def _state_dict_np(model):
    return {k: v.detach().float().cpu().numpy() for k, v in
            model.state_dict().items()}


def capture_pixart(args):
    import torch
    from diffusers import Transformer2DModel

    if args.tiny:
        model = Transformer2DModel(
            num_attention_heads=2, attention_head_dim=16, in_channels=4,
            out_channels=8, num_layers=2, sample_size=16, patch_size=2,
            cross_attention_dim=32, caption_channels=32,
            activation_fn="gelu-approximate", norm_type="ada_norm_single",
            attention_bias=True, norm_elementwise_affine=False,
            norm_eps=1e-6,
        )
        cfg = dict(sample_size=16, num_layers=2, num_heads=2, head_dim=16,
                   caption_dim=32)
        h = w = 16
        text_len = 8
    else:
        model = Transformer2DModel.from_pretrained(
            args.repo or "PixArt-alpha/PixArt-XL-2-512x512",
            subfolder="transformer", torch_dtype=torch.float32,
        )
        cfg = dict(sample_size=64, num_layers=28, num_heads=16, head_dim=72,
                   caption_dim=4096)
        h = w = 64
        text_len = 120
    model.eval()
    r = _rng()
    lat = r.standard_normal((2, 4, h, w)).astype(np.float32)
    t = np.array([999.0, 500.0], np.float32)
    text = r.standard_normal((2, text_len, cfg["caption_dim"])).astype(np.float32)
    acts = [None] * len(model.transformer_blocks)
    acts_ctx = [None] * len(model.transformer_blocks)
    handles = _hook_blocks(model.transformer_blocks, acts, acts_ctx)
    with torch.no_grad():
        out = model(
            torch.from_numpy(lat),
            encoder_hidden_states=torch.from_numpy(text),
            timestep=torch.from_numpy(t),
            added_cond_kwargs={"resolution": None, "aspect_ratio": None},
        ).sample
    for hd in handles:
        hd.remove()
    _save_npz(
        args.out, "pixart", cfg,
        {"latent": lat, "t": t, "text": text},
        acts, acts_ctx, out.float().numpy(),
        _state_dict_np(model) if args.tiny else None,
    )


def capture_sd3(args):
    import torch
    from diffusers import SD3Transformer2DModel

    if args.tiny:
        model = SD3Transformer2DModel(
            sample_size=8, patch_size=2, in_channels=16, out_channels=16,
            num_layers=2, attention_head_dim=16, num_attention_heads=2,
            joint_attention_dim=48, caption_projection_dim=32,
            pooled_projection_dim=24, pos_embed_max_size=16,
        )
        cfg = dict(sample_size=8, num_layers=2, num_heads=2, head_dim=16,
                   context_dim=48, pooled_dim=24, pos_embed_max_size=16)
        h = w = 8
        text_len = 6
    else:
        model = SD3Transformer2DModel.from_pretrained(
            args.repo or "stabilityai/stable-diffusion-3-medium-diffusers",
            subfolder="transformer", torch_dtype=torch.float32,
        )
        cfg = dict(sample_size=128, num_layers=24, num_heads=24, head_dim=64,
                   context_dim=4096, pooled_dim=2048, pos_embed_max_size=192)
        h = w = 128
        text_len = 333
    model.eval()
    r = _rng()
    lat = r.standard_normal((2, 16, h, w)).astype(np.float32)
    t = np.array([999.0, 500.0], np.float32)
    ctx = r.standard_normal((2, text_len, cfg["context_dim"])).astype(np.float32)
    pooled = r.standard_normal((2, cfg["pooled_dim"])).astype(np.float32)
    acts = [None] * len(model.transformer_blocks)
    acts_ctx = [None] * len(model.transformer_blocks)
    handles = _hook_blocks(model.transformer_blocks, acts, acts_ctx)
    with torch.no_grad():
        out = model(
            torch.from_numpy(lat),
            encoder_hidden_states=torch.from_numpy(ctx),
            pooled_projections=torch.from_numpy(pooled),
            timestep=torch.from_numpy(t),
        ).sample
    for hd in handles:
        hd.remove()
    _save_npz(
        args.out, "sd3", cfg,
        {"latent": lat, "t": t, "context": ctx, "pooled": pooled},
        acts, acts_ctx, out.float().numpy(),
        _state_dict_np(model) if args.tiny else None,
    )


def capture_sd15_unet(args):
    import torch
    from diffusers import UNet2DConditionModel

    if args.tiny:
        model = UNet2DConditionModel(
            sample_size=16, in_channels=4, out_channels=4,
            block_out_channels=(32, 64), layers_per_block=1,
            cross_attention_dim=32, attention_head_dim=16, norm_num_groups=8,
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        )
        cfg = dict(block_widths=[32, 64], layers_per_block=1, context_dim=32,
                   norm_groups=8)
        text_len = 6
    else:
        model = UNet2DConditionModel.from_pretrained(
            args.repo or "runwayml/stable-diffusion-v1-5",
            subfolder="unet", torch_dtype=torch.float32,
        )
        cfg = dict(block_widths=[320, 640, 1280, 1280], layers_per_block=2,
                   context_dim=768, norm_groups=32)
        text_len = 77
    model.eval()
    r = _rng()
    lat = r.standard_normal((2, 4, 16, 16)).astype(np.float32)
    t = np.array([999.0, 500.0], np.float32)
    ctx = r.standard_normal((2, text_len, cfg["context_dim"])).astype(np.float32)
    blocks = list(model.down_blocks) + [model.mid_block] + list(model.up_blocks)
    acts = [None] * len(blocks)
    acts_ctx = [None] * len(blocks)
    handles = _hook_blocks(blocks, acts, acts_ctx)
    with torch.no_grad():
        out = model(
            torch.from_numpy(lat), torch.from_numpy(t),
            encoder_hidden_states=torch.from_numpy(ctx),
        ).sample
    for hd in handles:
        hd.remove()
    # down blocks return (hidden, res_tuple): keep hidden only
    _save_npz(
        args.out, "unet_sd15", cfg,
        {"latent": lat, "t": t, "context": ctx},
        acts, acts_ctx, out.float().numpy(),
        _state_dict_np(model) if args.tiny else None,
    )


def capture_cogvideox(args):
    import torch
    from diffusers import CogVideoXTransformer3DModel

    if args.tiny:
        model = CogVideoXTransformer3DModel(
            num_attention_heads=2, attention_head_dim=16, in_channels=16,
            out_channels=16, num_layers=2, text_embed_dim=32,
            time_embed_dim=64, sample_height=8, sample_width=8,
            sample_frames=9, max_text_seq_length=8,
            use_rotary_positional_embeddings=False,
        )
        cfg = dict(num_layers=2, num_heads=2, head_dim=16, text_dim=32,
                   time_embed_dim=64, sample_h=8, sample_w=8,
                   sample_frames=3, max_text_len=8, use_rotary=False)
        f, hh, ww, text_len = 3, 8, 8, 8
    else:
        model = CogVideoXTransformer3DModel.from_pretrained(
            args.repo or "THUDM/CogVideoX-2b",
            subfolder="transformer", torch_dtype=torch.float32,
        )
        cfg = dict(num_layers=30, num_heads=30, head_dim=64, text_dim=4096,
                   time_embed_dim=512, sample_h=60, sample_w=90,
                   sample_frames=13, max_text_len=226, use_rotary=False)
        f, hh, ww, text_len = 13, 60, 90, 226
    model.eval()
    r = _rng()
    # diffusers takes [B, F, C, H, W]
    lat_bfchw = r.standard_normal((1, f, 16, hh, ww)).astype(np.float32)
    t = np.array([999.0], np.float32)
    text = r.standard_normal((1, text_len, cfg["text_dim"])).astype(np.float32)
    acts = [None] * len(model.transformer_blocks)
    acts_ctx = [None] * len(model.transformer_blocks)
    handles = _hook_blocks(model.transformer_blocks, acts, acts_ctx)
    with torch.no_grad():
        out = model(
            torch.from_numpy(lat_bfchw),
            encoder_hidden_states=torch.from_numpy(text),
            timestep=torch.from_numpy(t).long(),
        ).sample
    for hd in handles:
        hd.remove()
    _save_npz(
        args.out, "cogvideox", cfg,
        {"latent_bfchw": lat_bfchw, "t": t, "text": text},
        acts, acts_ctx, out.float().numpy(),
        _state_dict_np(model) if args.tiny else None,
    )


def capture_klvae(args):
    import torch
    from diffusers import AutoencoderKL

    if args.tiny:
        model = AutoencoderKL(
            block_out_channels=(8, 16), layers_per_block=2,
            norm_num_groups=4, latent_channels=4,
            down_block_types=("DownEncoderBlock2D",) * 2,
            up_block_types=("UpDecoderBlock2D",) * 2,
        )
        cfg = dict(block_widths=[8, 16], layers_per_block=2, norm_groups=4,
                   latent_channels=4)
    else:
        model = AutoencoderKL.from_pretrained(
            args.repo or "runwayml/stable-diffusion-v1-5",
            subfolder="vae", torch_dtype=torch.float32,
        )
        cfg = dict(block_widths=[128, 256, 512, 512], layers_per_block=2,
                   norm_groups=32, latent_channels=4)
    model.eval()
    r = _rng()
    z = r.standard_normal((1, cfg["latent_channels"], 8, 8)).astype(np.float32)
    img = r.standard_normal((1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        dec = model.decode(torch.from_numpy(z)).sample
        enc = model.encode(torch.from_numpy(img)).latent_dist.mean
    _save_npz(
        args.out, "klvae", cfg,
        {"z": z, "img": img, "enc_mean": enc.float().numpy()},
        [], [], dec.float().numpy(),
        _state_dict_np(model) if args.tiny else None,
    )


def capture_taesd(args):
    import torch
    from diffusers import AutoencoderTiny

    repo = args.repo or "madebyollin/taesd"
    model = AutoencoderTiny.from_pretrained(repo, torch_dtype=torch.float32)
    lc = model.config.latent_channels if hasattr(model.config, "latent_channels") else 4
    cfg = dict(latent_channels=int(lc), width=64, num_stages=3,
               blocks_per_stage=3)
    model.eval()
    r = _rng()
    z = r.standard_normal((1, cfg["latent_channels"], 8, 8)).astype(np.float32)
    img = r.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        dec = model.decoder(torch.from_numpy(z))
        enc = model.encoder(torch.from_numpy(img))
    _save_npz(
        args.out, "taesd3" if lc == 16 else "taesd", cfg,
        {"z": z, "img": img, "enc": enc.float().numpy()},
        [], [], dec.float().numpy(),
        _state_dict_np(model),
    )


def capture_recipe_sd3(args):
    """Reproduction fixture for the flagship TDM-SD3-LoRA recipe
    (`/root/reference/README.md:44-85`): fixed prompts + seed 8888, 4-step
    DPM-Solver flow_shift=6, LoRA scale 0.125. Records the conditioning,
    the INITIAL latents (so the JAX replay does not need to match torch's
    RNG), and the final latents + decoded images. The consuming test
    (tests/test_recipe_replay.py) replays through the tdm_tpu SD3 pipeline
    with the converted transformer + LoRA and asserts agreement."""
    import torch
    from diffusers import StableDiffusion3Pipeline

    repo = args.repo or "stabilityai/stable-diffusion-3-medium-diffusers"
    pipe = StableDiffusion3Pipeline.from_pretrained(
        repo, torch_dtype=torch.float32
    )
    if args.lora:
        pipe.load_lora_weights(args.lora)
    prompts = [
        "a photo of a cat",
        "an astronaut riding a horse on the moon",
    ]
    g = torch.Generator().manual_seed(8888)
    with torch.no_grad():
        pe, npe, pool, npool = pipe.encode_prompt(
            prompt=prompts, prompt_2=prompts, prompt_3=prompts,
            negative_prompt=[""] * len(prompts),
        )[:4]
        lat_shape = (
            len(prompts), pipe.transformer.config.in_channels,
            1024 // 8, 1024 // 8,
        )
        latents = torch.randn(lat_shape, generator=g, dtype=torch.float32)
        out = pipe(
            prompt_embeds=pe, pooled_prompt_embeds=pool,
            negative_prompt_embeds=npe,
            negative_pooled_prompt_embeds=npool,
            num_inference_steps=4, guidance_scale=1.0,
            latents=latents.clone(), output_type="latent",
        ).images
        images = pipe.vae.decode(
            out / pipe.vae.config.scaling_factor
            + pipe.vae.config.shift_factor
        ).sample
    _save_npz(
        args.out or "tests/fixtures/parity/sd3_recipe.npz",
        "sd3_recipe",
        dict(
            repo=repo, lora=args.lora or "", seed=8888, steps=4,
            guidance=1.0, lora_scale=0.125, prompts=prompts,
        ),
        {
            "prompt_embeds": pe.float().numpy(),
            "pooled": pool.float().numpy(),
            "latents_init": latents.float().numpy(),
        },
        [], [],
        out.float().numpy(),
        None,
    )


CAPTURES = {
    "pixart": capture_pixart,
    "sd3": capture_sd3,
    "sd15_unet": capture_sd15_unet,
    "cogvideox": capture_cogvideox,
    "klvae": capture_klvae,
    "taesd": capture_taesd,
    "sd3_recipe": capture_recipe_sd3,
}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--capture", choices=sorted(CAPTURES),
                    help="record an activation fixture for this family")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny random-weight model (self-contained fixture)")
    ap.add_argument("--repo", help="HF repo id or local checkout path")
    ap.add_argument("--lora", help="TDM LoRA repo/path for --capture "
                                   "sd3_recipe (README.md:48)")
    ap.add_argument("--manifest",
                    help="capture a key/shape manifest from this "
                         ".safetensors file or shard dir (no torch needed)")
    ap.add_argument("--family", help="family name for --manifest output")
    ap.add_argument("--out", help="output path (.npz for captures, .json "
                                  "for manifests)")
    ap.add_argument("--write-expected-manifests", action="store_true",
                    help="regenerate tests/fixtures/manifests/*.json from "
                         "the in-repo generators")
    args = ap.parse_args(argv)

    repo_root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    if args.write_expected_manifests:
        write_expected_manifests(
            args.out or os.path.join(repo_root, "tests/fixtures/manifests")
        )
        return
    if args.manifest:
        if not args.out:
            ap.error("--manifest needs --out file.json")
        capture_manifest(args.manifest, args.out)
        return
    if args.capture:
        if not args.out:
            size = "tiny" if args.tiny else "real"
            args.out = os.path.join(
                repo_root, "tests/fixtures/parity",
                f"{args.capture}_{size}.npz",
            )
        CAPTURES[args.capture](args)
        return
    ap.error("pick a mode: --capture / --manifest / --write-expected-manifests")


if __name__ == "__main__":
    main()
