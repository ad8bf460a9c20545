"""Checkpoint conversion CLI: HF-layout safetensors → tdm_tpu param file.

    python -m tdm_tpu.cli.convert_checkpoint \
        --family pixart --src /path/to/transformer/ --dst pixart.tdm.safetensors

Replaces the reference's implicit `from_pretrained` downloads+conversions
(`src/main.py:160-176`, `README.md:44-48`) with an explicit offline step;
the output loads with `tdm_tpu.io.params.load_params` and drops straight
into the pipelines / train CLI.

Dry-check a checkpoint BEFORE converting (header-only — validates the full
key/shape inventory against the converter's expectation in seconds, no
weights read):

    python -m tdm_tpu.cli.convert_checkpoint \
        --family sd3 --check-manifest /path/to/model.safetensors
    python -m tdm_tpu.cli.convert_checkpoint \
        --family sd3 --check-manifest captured_manifest.json
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
    "vae3d": "vae3d_decoder_params",
    "t5": "t5_encoder_params",
    "clip": "clip_text_params",
}

# --check-manifest names (io/manifest.py); taesd3 / vae3d_decoder exist only
# as manifest inventories (converted via 'taesd' / 'vae3d' above)
_CHECK_FAMILIES = ("taesd3", "vae3d_decoder")


def main(argv=None) -> None:
    from tdm_tpu.io import convert, params as params_io

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--family", required=True,
                   choices=sorted(list(FAMILIES) + list(_CHECK_FAMILIES)))
    p.add_argument("--src",
                   help="safetensors file or HF checkpoint directory")
    p.add_argument("--dst", help="output .safetensors path")
    p.add_argument("--check-manifest", metavar="PATH",
                   help="validate a checkpoint's key/shape inventory "
                        "(safetensors file/dir, header-only, or a captured "
                        "manifest .json) against the converter's "
                        "expectation; exits 1 with a report on mismatch")
    p.add_argument("--strip-prefix", default=None,
                   help="with --check-manifest: strip this key prefix "
                        "(e.g. 'transformer.') before comparing")
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

    if args.check_manifest:
        from tdm_tpu.io import manifest

        fam = {"vae3d": "vae3d_decoder"}.get(args.family, args.family)
        if fam not in manifest.MANIFEST_FAMILIES:
            p.error(
                f"--check-manifest supports {sorted(manifest.MANIFEST_FAMILIES)}"
            )
        actual = manifest.load_manifest(args.check_manifest)
        problems = manifest.check_manifest(
            fam, actual, strip_prefix=args.strip_prefix
        )
        if problems:
            print(f"{args.check_manifest}: {len(problems)} problem(s) vs "
                  f"the {args.family} converter's expectation:")
            for line in problems[:50]:
                print(f"  {line}")
            if len(problems) > 50:
                print(f"  ... and {len(problems) - 50} more")
            raise SystemExit(1)
        print(f"{args.check_manifest}: OK — {len(actual)} keys match the "
              f"{args.family} inventory")
        return
    if not args.src or not args.dst:
        p.error("--src and --dst are required (unless --check-manifest)")
    if args.family not in FAMILIES:
        p.error(
            f"family {args.family!r} is check-manifest-only; convert with "
            f"{'taesd' if args.family == 'taesd3' else 'vae3d'}"
        )

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
