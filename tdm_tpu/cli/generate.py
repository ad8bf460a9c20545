"""Few-step inference CLI — the README recipes (§3.4) as one command.

    python -m tdm_tpu.cli.generate \\
        --model <pipeline-dir | diffusers-dir | org/name> \\
        --prompt "a cat" --num_inference_steps 4 --seed 8888 \\
        --lora tdm_lora.safetensors --lora_scale 0.125 \\
        --output out/cat.png

Covers the reference's three inference recipes with their exact knobs:
SD3 (`/root/reference/README.md:48-67`: LoRA scale 0.125, flow_shift 1-6,
guidance_scale 1.0, seed 8888), Dreamshaper/SD1.5 (`README.md:95-107`,
seed 317), CogVideoX (`README.md:116-138`: 49 frames, 4 steps, GIF export
at fps 8). Prompt conditioning comes from the pipeline's attached text
encoders when present, else from an offline T5 embedding cache built with
`python -m tdm_tpu.cli.build_cache` (training is prompt-only, so embeddings
precompute — SURVEY.md §2 text-encoder row).
"""

from __future__ import annotations

import argparse
import inspect
import json
import os
import sys
from typing import Optional


def parse_args(argv: Optional[list[str]] = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True,
                   help="pipeline dir, diffusers checkpoint dir, or repo id")
    p.add_argument("--prompt", nargs="+", required=True)
    p.add_argument("--negative_prompt", nargs="+", default=None)
    p.add_argument("--num_inference_steps", type=int, default=4)
    p.add_argument("--num_images_per_prompt", type=int, default=1,
                   help="N outputs per prompt in one batched call "
                        "(reference README.md:103; videos per prompt on "
                        "the video pipeline)")
    p.add_argument("--guidance_scale", type=float, default=1.0)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--num_frames", type=int, default=None,
                   help="video pipelines only (CogVideoX: 49)")
    p.add_argument("--fps", type=int, default=8, help="GIF export rate")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--lora", default=None,
                   help="kohya/diffusers LoRA safetensors to load")
    p.add_argument("--lora_scale", type=float, default=1.0,
                   help="adapter scale (TDM releases use 0.125)")
    p.add_argument("--solver", default=None,
                   choices=(None, "dpm", "unipc", "fewstep"),
                   help="sampler: dpm (DPM-Solver++ 2M, default), unipc "
                        "(UniPC predictor-corrector — one order higher at "
                        "the same NFE), fewstep (PixArt TDM grid)")
    p.add_argument("--flow_shift", type=float, default=None,
                   help="SD3 DPM-Solver sigma shift (recipe: 1-6)")
    p.add_argument("--embedding_cache", default=None,
                   help="offline T5 cache (.npz from cli/build_cache) used "
                        "when the pipeline has no text encoders attached")
    p.add_argument("--output", default="out.png",
                   help="output file (single prompt) or directory")
    p.add_argument("--output_type", default=None,
                   choices=(None, "image", "video", "latent"))
    p.add_argument("--tp", type=int, default=0,
                   help="tensor-parallel serving over N local devices "
                        "(megatron-sharded projections, parallel/tp.py; "
                        "0 = off). Scales latency even at batch 1")
    p.add_argument("--quant", default=None, choices=(None, "int8"),
                   help="dynamic int8 MXU matmuls for the big Dense layers "
                        "(~1.7x on v5e; ops/quant.py)")
    p.add_argument("--revision", default=None)
    p.add_argument("--model_config", default=None,
                   help="JSON dict of config overrides for diffusers-layout "
                        'checkpoints, e.g. \'{"attn_impl": "xla"}\'')
    p.add_argument("--compilation_cache", default="auto",
                   help="persistent XLA compile cache dir so repeat "
                        "invocations skip the cold compile; 'auto' = "
                        "~/.cache/tdm_tpu/xla, 'off' disables")
    return p.parse_args(argv)


def _cached_embeds(cache, cache_path: str, prompts: list[str]):
    """(embeds [B,L,D], masks [B,L], pooled [B,P] | None) looked up by
    exact prompt text."""
    import numpy as np

    idx = []
    for pr in prompts:
        try:
            idx.append(cache.prompts.index(pr))
        except ValueError:
            raise SystemExit(
                f"prompt {pr!r} is not in the embedding cache "
                f"({cache_path}); rebuild it with cli/build_cache"
            )
    sel = np.asarray(idx)
    pooled = (
        cache.pooled[sel].astype(np.float32)
        if cache.pooled is not None
        else None
    )
    return (
        cache.embeds[sel].astype(np.float32),
        cache.masks[sel].astype(np.int32),
        pooled,
    )


def run_pipeline(
    pipe,
    prompts: list[str],
    neg_prompts: Optional[list[str]],
    call: dict,
    *,
    embedding_cache: Optional[str] = None,
):
    """prompts → PipelineOutput, resolving conditioning from the pipeline's
    attached text encoders or, failing that, an offline embedding cache
    (cli/build_cache). `call` holds pipeline kwargs (steps, cfg, seed, ...);
    keys the pipeline doesn't accept are dropped. Shared by the generate and
    evaluate CLIs."""
    import numpy as np

    accepted = inspect.signature(type(pipe).__call__).parameters
    call = {k: v for k, v in call.items() if k in accepted}
    has_encoders = bool(
        getattr(pipe, "text_encoder", None)
        or getattr(pipe, "text_encoders", None)
    )
    if has_encoders:
        if neg_prompts is not None:
            if "negative_prompt" not in accepted:
                raise SystemExit(
                    f"{type(pipe).__name__} does not take a negative prompt"
                )
            call["negative_prompt"] = neg_prompts
        return pipe(prompts, **call)
    if not embedding_cache:
        raise SystemExit(
            "this pipeline has no text encoders attached — pass "
            "--embedding_cache (built with cli/build_cache) or load a "
            "pipeline dir that bundles encoders"
        )

    from tdm_tpu.data.prompts import EmbeddingCache, pack_family_cond

    cache = EmbeddingCache.load(embedding_cache)
    fam = getattr(pipe, "family", "")

    def pack(e, m, p):
        # the single family-cond definition lives in data/prompts.py
        return pack_family_cond(fam, e, m, p, error=SystemExit)

    embeds, masks, pooled = _cached_embeds(cache, embedding_cache, prompts)
    negative = None
    if neg_prompts is not None:
        negative = pack(*_cached_embeds(cache, embedding_cache, neg_prompts))
    elif call.get("guidance_scale", 1.0) != 1.0 and cache.uncond_embed is not None:
        # CFG with no explicit negative: the cache's empty-prompt
        # embedding (what the reference precomputes, src/main.py:416-431)
        ue = np.broadcast_to(
            cache.uncond_embed[None], embeds.shape
        ).astype(np.float32)
        um = np.broadcast_to(
            cache.uncond_mask[None], masks.shape
        ).astype(np.int32)
        up = None
        if pooled is not None:
            up = (
                np.broadcast_to(
                    cache.uncond_pooled[None], pooled.shape
                ).astype(np.float32)
                if cache.uncond_pooled is not None
                else np.zeros_like(pooled)
            )
        negative = pack(ue, um, up)
    if negative is not None:
        if "negative_embeds" not in accepted:
            raise SystemExit(
                f"{type(pipe).__name__} does not take negative embeds"
            )
        call["negative_embeds"] = negative
    return pipe(prompt_embeds=pack(embeds, masks, pooled), **call)


def main(argv: Optional[list[str]] = None) -> None:
    args = parse_args(argv)
    import numpy as np

    from tdm_tpu.utils.config import apply_platform_env

    apply_platform_env()

    from tdm_tpu.pipelines import from_pretrained
    from tdm_tpu.train import validation
    from tdm_tpu.utils.config import enable_compilation_cache

    if args.compilation_cache != "off":
        enable_compilation_cache(
            None if args.compilation_cache == "auto" else args.compilation_cache
        )

    kwargs = {}
    if args.model_config:
        kwargs["model_config"] = json.loads(args.model_config)
    pipe = from_pretrained(args.model, revision=args.revision, **kwargs)

    if args.lora:
        # README.md:49-50: load_lora_weights(...) + set_adapters(['tdm'],[s])
        pipe.load_lora_weights(args.lora, adapter_name="tdm")
        pipe.set_adapters(["tdm"], [args.lora_scale])
    if args.quant:
        pipe.quant = args.quant
    if args.tp and args.tp > 1:
        import jax

        from tdm_tpu.parallel.tp import make_tp_mesh

        n_dev = len(jax.devices())
        if args.tp > n_dev:
            raise SystemExit(
                f"--tp {args.tp}: only {n_dev} local devices"
            )
        # latency mode: the first N devices form a (1, N) ('data','tp')
        # mesh — batch replicated, projections sharded. For batch
        # throughput use pipe.data_parallel_mesh via the python API.
        mesh = make_tp_mesh(1, args.tp, devices=jax.devices()[: args.tp])
        from tdm_tpu.parallel.tp import TP_AXIS, tp_shardings

        n_sharded = sum(
            any(a == TP_AXIS for a in s.spec)
            for s in jax.tree.leaves(tp_shardings(pipe.params, mesh))
        )
        if n_sharded == 0:
            raise SystemExit(
                f"--tp {args.tp} shards nothing: no attention/FF projection "
                f"dim is divisible by {args.tp} — the run would be "
                "replicated with zero speedup. Pick a divisor of the "
                "model's head and FF dims"
            )
        pipe.tensor_parallel_mesh = mesh

    call = dict(
        num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale,
        seed=args.seed,
    )
    for k in ("height", "width", "num_frames", "flow_shift", "output_type"):
        v = getattr(args, k)
        if v is not None:
            call[k] = v
    if args.num_images_per_prompt != 1:
        # image pipelines take num_images_per_prompt, the video pipeline
        # num_videos_per_prompt — run_pipeline keeps the accepted key.
        # Loud, not a silent drop, when the pipeline takes neither
        # (same contract as --solver below).
        accepted = inspect.signature(type(pipe).__call__).parameters
        if (
            "num_images_per_prompt" not in accepted
            and "num_videos_per_prompt" not in accepted
        ):
            raise SystemExit(
                f"{type(pipe).__name__} has no --num_images_per_prompt knob"
            )
        call["num_images_per_prompt"] = args.num_images_per_prompt
        call["num_videos_per_prompt"] = args.num_images_per_prompt
    if args.solver is not None:
        # loud, not a silent drop: the video recipe samples on its trained
        # fewstep grid and takes no solver knob (reference README.md:129)
        if "solver" not in inspect.signature(type(pipe).__call__).parameters:
            raise SystemExit(
                f"{type(pipe).__name__} has no --solver knob"
            )
        call["solver"] = args.solver
    prompts = list(args.prompt)
    neg_prompts = (
        list(args.negative_prompt) if args.negative_prompt is not None
        else None
    )
    out = run_pipeline(
        pipe, prompts, neg_prompts, call,
        embedding_cache=args.embedding_cache,
    )

    imgs = np.asarray(out.images if out.images is not None else out.latents)
    if call.get("output_type") == "latent":
        path = args.output if args.output.endswith(".npy") else (
            args.output + ".npy"
        )
        # bf16 latents are not a portable npy dtype — store fp32
        np.save(path, np.asarray(imgs, np.float32))
        print(f"wrote {path} {imgs.shape}")
        return
    is_video = imgs.ndim == 5  # [B, F, H, W, 3]
    n_out = imgs.shape[0]  # len(prompts) × num_images_per_prompt
    ext = ".gif" if is_video else ".png"
    if n_out == 1 and args.output.lower().endswith((".png", ".gif")):
        targets = [args.output]
    else:
        os.makedirs(args.output, exist_ok=True)
        targets = [
            os.path.join(args.output, f"{i:03d}{ext}")
            for i in range(n_out)
        ]
    for i, path in enumerate(targets):
        if is_video:
            validation.save_video_gif(path, imgs[i], fps=args.fps)
        else:
            validation.save_png(
                path, (np.clip(imgs[i], 0, 1) * 255).astype(np.uint8)
            )
        print(f"wrote {path}")


if __name__ == "__main__":
    main(sys.argv[1:])
