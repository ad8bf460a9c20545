"""Checkpoint conversion CLI: HF-layout safetensors → tdm_tpu param file.

    python -m tdm_tpu.cli.convert_checkpoint \
        --family pixart --src /path/to/transformer/ --dst pixart.tdm.safetensors

Replaces the reference's implicit `from_pretrained` downloads+conversions
(`src/main.py:160-176`, `README.md:44-48`) with an explicit offline step;
the output loads with `tdm_tpu.io.params.load_params` and drops straight
into the pipelines / train CLI.
"""

from __future__ import annotations

import argparse
import sys

FAMILIES = {
    "pixart": "pixart_params",
    "sd3": "sd3_params",
    "unet_sd15": "unet_sd15_params",
    "klvae": "klvae_params",
    "taesd": "taesd_params",
    "cogvideox": "cogvideox_params",
    "t5": "t5_encoder_params",
    "clip": "clip_text_params",
}


def main(argv=None) -> None:
    from tdm_tpu.io import convert, params as params_io

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--family", required=True, choices=sorted(FAMILIES))
    p.add_argument("--src", required=True,
                   help="safetensors file or HF checkpoint directory")
    p.add_argument("--dst", required=True, help="output .safetensors path")
    p.add_argument("--dtype", default=None,
                   help="cast float weights (e.g. float16, bfloat16→float32 "
                        "is done at load)")
    p.add_argument("--no_scan", action="store_true",
                   help="keep per-layer (unrolled) layout instead of the "
                        "scan-stacked default")
    p.add_argument("--reverse", action="store_true",
                   help="tdm_tpu param file → diffusers/torch state-dict "
                        "safetensors (full-weight students back into the "
                        "torch ecosystem; families: "
                        f"{sorted(convert.TO_TORCH)})")
    args = p.parse_args(argv)
    import numpy as np

    dtype = np.dtype(args.dtype) if args.dtype else None
    if args.reverse:
        inv = convert.TO_TORCH.get(args.family)
        if inv is None:
            p.error(
                f"--reverse supports {sorted(convert.TO_TORCH)} (LoRA "
                "artifacts interchange via lora/io.py save_kohya instead)"
            )
        from safetensors.numpy import save_file

        sd = inv(params_io.load_params(args.src, to_jnp=False))
        if dtype is not None:
            sd = {
                k: v.astype(dtype) if np.issubdtype(v.dtype, np.floating) else v
                for k, v in sd.items()
            }
        save_file(sd, args.dst)
        n = sum(v.size for v in sd.values())
        print(f"wrote {args.dst}: {n/1e6:.1f}M params "
              f"({args.family}, torch layout)")
        return

    sd = convert.load_torch_state_dict(args.src)
    fn = getattr(convert, FAMILIES[args.family])
    import inspect

    kwargs = {}
    if "scan_layers" in inspect.signature(fn).parameters:
        kwargs["scan_layers"] = not args.no_scan
    tree = fn(sd, **kwargs)
    params_io.save_params(tree, args.dst, dtype=dtype)
    n = sum(np.asarray(x).size for x in _leaves(tree))
    print(f"wrote {args.dst}: {n/1e6:.1f}M params ({args.family})")


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main(sys.argv[1:])
