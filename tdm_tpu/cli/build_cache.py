"""Build an offline text-embedding cache for image-free TDM training.

T5 path (PixArt, the reference's encoder — `src/main.py:160-165`):

    python -m tdm_tpu.cli.build_cache \
        --prompts prompts.jsonl --caption_column prompt \
        --t5 /ckpts/t5-xxl            # HF dir: safetensors + tokenizer \
        --out cache.npz --max_length 120

Pipeline path (any family; SD3 caches carry the pooled CLIP-L/G vector
the MMDiT needs as its second conditioning input):

    python -m tdm_tpu.cli.build_cache \
        --prompts prompts.jsonl --pipeline /ckpts/sd3-medium --family sd3 \
        --out cache.npz

The cache streams at train time via TDM_EMBEDDING_CACHE (see cli/train_tdm),
keeping the frozen encoders out of training HBM entirely — the TPU-preferred
replacement for the reference's per-step no-grad T5 forward (`src/main.py:458-461`).
"""

from __future__ import annotations

import argparse
import sys


def _build_via_pipeline(args, prompt_list):
    """Encode with a pipeline's own `encode_prompt` (the same code path
    inference uses), so the cache matches serving-time conditioning exactly.
    Return arities per family: pixart/sd15 → (embeds, mask); sd3 →
    (context, pooled); cogvideox → embeds."""
    import numpy as np

    from tdm_tpu.data import prompts as data_prompts
    from tdm_tpu.pipelines import loading

    pipe = loading.from_pretrained(args.pipeline)
    # derive the family from the loaded pipeline itself; an explicit
    # --family must agree (a wrong one would mis-unpack encode_prompt's
    # return — e.g. caching an SD3 pooled vector as the attention mask)
    fam = getattr(pipe, "family", None) or args.family
    if args.family and fam != args.family:
        raise SystemExit(
            f"--family {args.family} does not match the loaded pipeline "
            f"(family {fam!r}); drop the flag or fix it"
        )
    if fam is None:
        raise SystemExit(
            "could not derive the pipeline family; pass --family"
        )

    def enc(chunk: list[str]):
        out = pipe.encode_prompt(chunk)
        if fam == "sd3":
            ctx, pooled = out
            ctx = np.asarray(ctx, np.float16)
            return ctx, np.ones(ctx.shape[:2], np.int64), np.asarray(
                pooled, np.float16
            )
        if fam == "cogvideox":
            e = np.asarray(out, np.float16)
            return e, np.ones(e.shape[:2], np.int64), None
        e, m = out
        return np.asarray(e, np.float16), np.asarray(m), None

    bs = args.batch_size
    embeds, masks, pooled = data_prompts.chunked_encode(prompt_list, enc, bs)
    u_e, u_m, u_p = enc([""] * bs)
    val_prompts = list(args.validation_prompts or [])
    v_e = v_m = v_p = None
    if val_prompts:
        v_e, v_m, v_p = data_prompts.chunked_encode(val_prompts, enc, bs)
    cache = data_prompts.EmbeddingCache(
        embeds, masks, list(prompt_list),
        uncond_embed=u_e[0], uncond_mask=u_m[0],
        pooled=pooled,
        uncond_pooled=u_p[0] if u_p is not None else None,
        val_prompts=val_prompts, val_embeds=v_e, val_masks=v_m,
        val_pooled=v_p,
    )
    cache.save(args.out)
    extra = "" if cache.pooled is None else (
        f", pooled {cache.pooled.shape}"
    )
    print(f"wrote {args.out}: {len(cache.prompts)} prompts, "
          f"embeds {cache.embeds.shape}{extra}")


def main(argv=None) -> None:
    import jax
    import jax.numpy as jnp

    from tdm_tpu.data import prompts as data_prompts, tokenizer as tok_lib
    from tdm_tpu.io import convert
    from tdm_tpu.models import t5 as t5_mod
    from tdm_tpu.utils.config import apply_platform_env

    apply_platform_env()

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--prompts", required=True,
                   help=".txt / .jsonl / HF dataset name")
    p.add_argument("--caption_column", default="prompt")
    p.add_argument("--t5", default=None,
                   help="local HF T5 checkpoint dir (weights + tokenizer)")
    p.add_argument("--pipeline", default=None,
                   help="pipeline checkpoint dir — encode with the "
                        "family's own encode_prompt (SD3: stores pooled)")
    p.add_argument("--family", default=None,
                   choices=("pixart", "sd15", "sd3", "cogvideox"),
                   help="pipeline family for --pipeline mode (derived "
                        "from the pipeline itself when omitted)")
    p.add_argument("--out", required=True, help="output .npz cache path")
    p.add_argument("--validation_prompts", nargs="*", default=[
        # the train CLI's fixed grid prompts (src/main.py:424-429) — always
        # embedded under dedicated keys so validation grids render the SAME
        # prompts every cadence; override to match a custom
        # --validation_prompts training run
        "a photo of a cat", "a photo of a dog",
        "a photo of a panda", "a photo of a pikachu",
    ])
    p.add_argument("--dataset_config_name", default=None,
                   help="HF dataset config for --prompts dataset names")
    p.add_argument("--max_length", type=int, default=120)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--d_model", type=int, default=4096)
    p.add_argument("--num_layers", type=int, default=24)
    p.add_argument("--num_heads", type=int, default=64)
    p.add_argument("--d_ff", type=int, default=10240)
    args = p.parse_args(argv)
    if (args.t5 is None) == (args.pipeline is None):
        p.error("exactly one of --t5 / --pipeline is required")

    prompt_list = data_prompts.load_prompts(
        args.prompts, caption_column=args.caption_column,
        max_samples=args.max_samples,
        dataset_config_name=args.dataset_config_name,
    )
    if args.pipeline is not None:
        _build_via_pipeline(args, prompt_list)
        return
    tokenizer = tok_lib.HFTokenizer(args.t5)
    sd = convert.load_torch_state_dict(args.t5)
    params = convert.to_jax(convert.t5_encoder_params(sd), dtype=jnp.bfloat16)
    cfg = t5_mod.T5Config(
        d_model=args.d_model, num_layers=args.num_layers,
        num_heads=args.num_heads, d_ff=args.d_ff,
        d_kv=args.d_model // args.num_heads,
    )
    encoder = t5_mod.T5Encoder(cfg=cfg)

    @jax.jit
    def encode(params, ids, mask):
        return encoder.apply({"params": params}, ids, mask)

    cache = data_prompts.EmbeddingCache.build(
        prompt_list, tokenizer,
        lambda ids, mask: encode(params, jnp.asarray(ids), jnp.asarray(mask)),
        max_length=args.max_length, batch_size=args.batch_size,
        val_prompts=args.validation_prompts,
    )
    cache.save(args.out)
    print(f"wrote {args.out}: {len(cache.prompts)} prompts, "
          f"embeds {cache.embeds.shape}")


if __name__ == "__main__":
    main(sys.argv[1:])
