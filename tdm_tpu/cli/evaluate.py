"""CLIP-score evaluation CLI — automated student-vs-teacher quality.

    python -m tdm_tpu.cli.evaluate \\
        --model <pipeline-dir> --clip_model <clip-vit-large-patch14 dir> \\
        --prompt "a cat" "a dog" --num_inference_steps 4 --seed 8888 \\
        --compare_teacher --teacher_steps 28 --teacher_guidance 7.0

Generates images for each prompt with the few-step student settings
(README recipes: 4 NFE, cfg 1, LoRA scale 0.125) and scores each
(prompt, image) pair with CLIPScore (eval/clip_score.py). With
`--compare_teacher` it re-runs the SAME prompts and seed in teacher mode
(adapters off, many steps, high cfg — the reference's own baseline
protocol, `/root/reference/README.md:69-81`) and reports the score delta.
This turns the reference's human-eval-only verification
(`/root/reference/README.md:17-27`) into a tracked number.

Prints one JSON object; `--output` also writes it (and `--save_images` the
grids) to disk.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional


def parse_args(argv: Optional[list[str]] = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True,
                   help="pipeline dir, diffusers checkpoint dir, or repo id")
    p.add_argument("--clip_model", required=True,
                   help="HF CLIPModel dir (e.g. clip-vit-large-patch14) for "
                        "the scoring towers")
    p.add_argument("--prompt", nargs="+", default=None)
    p.add_argument("--prompts_file", default=None,
                   help="newline-separated prompts (overrides --prompt)")
    p.add_argument("--negative_prompt", nargs="+", default=None)
    p.add_argument("--num_inference_steps", type=int, default=4)
    p.add_argument("--guidance_scale", type=float, default=1.0)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--seed", type=int, default=8888)
    p.add_argument("--lora", default=None)
    p.add_argument("--lora_scale", type=float, default=0.125)
    p.add_argument("--flow_shift", type=float, default=None)
    p.add_argument("--embedding_cache", default=None)
    p.add_argument("--quant", default=None, choices=(None, "int8"))
    p.add_argument("--compare_teacher", action="store_true",
                   help="also score teacher-mode generations (adapters off, "
                        "--teacher_steps/--teacher_guidance) on the same "
                        "prompts and seed")
    p.add_argument("--teacher_steps", type=int, default=28)
    p.add_argument("--teacher_guidance", type=float, default=7.0)
    p.add_argument("--output", default=None, help="write the JSON here too")
    p.add_argument("--save_images", default=None,
                   help="directory for the scored PNGs")
    return p.parse_args(argv)


def _score_run(pipe, scorer, prompts, neg, call, cache, tag, save_dir):
    import numpy as np

    from tdm_tpu.cli.generate import run_pipeline
    from tdm_tpu.train import validation

    out = run_pipeline(pipe, prompts, neg, dict(call), embedding_cache=cache)
    if out.images is None:
        raise SystemExit(
            "CLIP score needs decoded images, but this pipeline has no VAE "
            "decoder attached (it returned raw latents) — load a pipeline "
            "dir that bundles VAE params"
        )
    imgs = np.asarray(out.images)
    if imgs.ndim == 5:  # video [B,F,H,W,3]: score the middle frame
        imgs = imgs[:, imgs.shape[1] // 2]
    scores = scorer.score(imgs, prompts)
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        for i, pr in enumerate(prompts):
            path = os.path.join(save_dir, f"{tag}_{i:03d}.png")
            validation.save_png(
                path, (np.clip(imgs[i], 0, 1) * 255).astype(np.uint8)
            )
    return scores


def main(argv: Optional[list[str]] = None) -> None:
    args = parse_args(argv)

    from tdm_tpu.utils.config import apply_platform_env

    apply_platform_env()

    from tdm_tpu.eval import CLIPScorer
    from tdm_tpu.pipelines import from_pretrained

    if args.prompts_file:
        with open(args.prompts_file) as f:
            prompts = [ln.strip() for ln in f if ln.strip()]
    elif args.prompt:
        prompts = list(args.prompt)
    else:
        raise SystemExit("pass --prompt or --prompts_file")
    neg = list(args.negative_prompt) if args.negative_prompt else None

    scorer = CLIPScorer.from_pretrained(args.clip_model)
    if scorer.tokenizer is None:
        raise SystemExit(
            f"{args.clip_model} has no tokenizer files — CLIP score needs "
            "text embeddings for the evaluated prompts"
        )

    pipe = from_pretrained(args.model)
    if args.lora:
        pipe.load_lora_weights(args.lora, adapter_name="tdm")
        pipe.set_adapters(["tdm"], [args.lora_scale])
    if args.quant:
        pipe.quant = args.quant

    call = dict(
        num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale,
        seed=args.seed,
    )
    for k in ("height", "width", "flow_shift"):
        v = getattr(args, k)
        if v is not None:
            call[k] = v

    student = _score_run(
        pipe, scorer, prompts, neg, call, args.embedding_cache,
        "student", args.save_images,
    )
    result = {
        "prompts": prompts,
        "student": {
            "steps": args.num_inference_steps,
            "guidance_scale": args.guidance_scale,
            "clip_scores": [round(float(s), 4) for s in student],
            "clip_score_mean": round(float(student.mean()), 4),
        },
    }

    if args.compare_teacher:
        # teacher baseline: adapters off, many-step high-cfg sampling —
        # the reference's protocol (README.md:69-81: scale 0, 28 steps,
        # cfg 7); same prompts + seed isolate the sampling regime
        if args.lora:
            pipe.set_adapters(["tdm"], [0.0])
        tcall = dict(call)
        tcall["num_inference_steps"] = args.teacher_steps
        tcall["guidance_scale"] = args.teacher_guidance
        teacher = _score_run(
            pipe, scorer, prompts, neg, tcall, args.embedding_cache,
            "teacher", args.save_images,
        )
        if args.lora:
            pipe.set_adapters(["tdm"], [args.lora_scale])
        result["teacher"] = {
            "steps": args.teacher_steps,
            "guidance_scale": args.teacher_guidance,
            "clip_scores": [round(float(s), 4) for s in teacher],
            "clip_score_mean": round(float(teacher.mean()), 4),
        }
        result["student_minus_teacher"] = round(
            float(student.mean() - teacher.mean()), 4
        )

    text = json.dumps(result)
    print(text)
    if args.output:
        with open(args.output, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
