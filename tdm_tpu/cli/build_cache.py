"""Build an offline T5-embedding cache for image-free TDM training.

    python -m tdm_tpu.cli.build_cache \
        --prompts prompts.jsonl --caption_column prompt \
        --t5 /ckpts/t5-xxl            # HF dir: safetensors + tokenizer \
        --out cache.npz --max_length 120

The cache streams at train time via TDM_EMBEDDING_CACHE (see cli/train_tdm),
keeping the frozen 4.7B T5 out of training HBM entirely — the TPU-preferred
replacement for the reference's per-step no-grad T5 forward (`src/main.py:458-461`).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> None:
    import jax
    import jax.numpy as jnp

    from tdm_tpu.data import prompts as data_prompts, tokenizer as tok_lib
    from tdm_tpu.io import convert
    from tdm_tpu.models import t5 as t5_mod

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--prompts", required=True,
                   help=".txt / .jsonl / HF dataset name")
    p.add_argument("--caption_column", default="prompt")
    p.add_argument("--t5", required=True,
                   help="local HF T5 checkpoint dir (weights + tokenizer)")
    p.add_argument("--out", required=True, help="output .npz cache path")
    p.add_argument("--max_length", type=int, default=120)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--d_model", type=int, default=4096)
    p.add_argument("--num_layers", type=int, default=24)
    p.add_argument("--num_heads", type=int, default=64)
    p.add_argument("--d_ff", type=int, default=10240)
    args = p.parse_args(argv)

    prompt_list = data_prompts.load_prompts(
        args.prompts, caption_column=args.caption_column,
        max_samples=args.max_samples,
    )
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
    )
    cache.save(args.out)
    print(f"wrote {args.out}: {len(cache.prompts)} prompts, "
          f"embeds {cache.embeds.shape}")


if __name__ == "__main__":
    main(sys.argv[1:])
