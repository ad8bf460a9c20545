"""Checkpoint key/shape manifests — fail on a bad checkpoint in seconds.

The reference's first contact with a checkpoint is a multi-GB download into
`from_pretrained` (`/root/reference/src/main.py:160-176`); a key-layout
mismatch surfaces only after the full load. Here the expected inventory of
every converter family is generated from the model config, so a checkpoint
can be validated from its safetensors HEADER alone (the header is JSON —
no weights read, no torch needed):

    tdm-convert --family sd3 --check-manifest model.safetensors
    tdm-convert --family sd3 --check-manifest manifest.json

`scripts/record_parity_fixtures.py --manifest` captures the same JSON from
a real checkout on any machine. NOTE: the committed
`tests/fixtures/manifests/` files are currently GENERATOR OUTPUT
(regenerated via `--write-expected-manifests`) — a regression pin on this
module, not yet independent evidence against the released checkpoints
(README.md:45-57, 95-98, 114-138). Replace them with `--manifest` captures
from real safetensors headers the first time a diffusers-equipped machine
is available (tests/fixtures/parity/README.md documents the procedure);
until then a generator misconception shared with the converters would not
be caught here (it IS caught at block level by
tests/test_torch_block_parity.py).

The inventories are the single source of truth for the HF key surface:
tests build synthetic state dicts FROM them and push those through the
strict converters into the Flax models (tests/test_manifest.py), closing
the loop manifest ↔ converter ↔ model structurally.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

__all__ = [
    "expected_manifest",
    "read_safetensors_manifest",
    "check_manifest",
    "save_manifest",
    "load_manifest",
    "MANIFEST_FAMILIES",
]


class _Shapes(dict):
    """{torch key: shape tuple} builder with the common HF layer idioms."""

    def lin(self, name: str, din: int, dout: int, bias: bool = True) -> None:
        self[f"{name}.weight"] = (dout, din)
        if bias:
            self[f"{name}.bias"] = (dout,)

    def conv(self, name: str, cin: int, cout: int, k: int = 3,
             bias: bool = True) -> None:
        self[f"{name}.weight"] = (cout, cin, k, k)
        if bias:
            self[f"{name}.bias"] = (cout,)

    def conv3d(self, name: str, cin: int, cout: int, kt: int = 3,
               ks: int = 3) -> None:
        self[f"{name}.weight"] = (cout, cin, kt, ks, ks)
        self[f"{name}.bias"] = (cout,)

    def norm(self, name: str, dim: int) -> None:
        self[f"{name}.weight"] = (dim,)
        self[f"{name}.bias"] = (dim,)


# ---------------------------------------------------------------------------
# Per-family inventories (mirror io/convert.py's consumption exactly; the
# loop is closed by tests/test_manifest.py which feeds these through the
# strict converters into the models)
# ---------------------------------------------------------------------------


def _pixart(cfg) -> _Shapes:
    """PixArt-alpha/PixArt-XL-2-512x512 transformer (convert.pixart_params)."""
    s = _Shapes()
    d, p = cfg.hidden, cfg.patch_size
    s.conv("pos_embed.proj", cfg.in_channels, d, k=p)
    s.lin("adaln_single.emb.timestep_embedder.linear_1", 256, d)
    s.lin("adaln_single.emb.timestep_embedder.linear_2", d, d)
    s.lin("adaln_single.linear", d, 6 * d)
    s.lin("caption_projection.linear_1", cfg.caption_dim, d)
    s.lin("caption_projection.linear_2", d, d)
    for i in range(cfg.num_layers):
        b = f"transformer_blocks.{i}"
        s[f"{b}.scale_shift_table"] = (6, d)
        for attn in ("attn1", "attn2"):
            for pnm in ("to_q", "to_k", "to_v"):
                s.lin(f"{b}.{attn}.{pnm}", d, d)
            s.lin(f"{b}.{attn}.to_out.0", d, d)
        s.lin(f"{b}.ff.net.0.proj", d, cfg.mlp_ratio * d)
        s.lin(f"{b}.ff.net.2", cfg.mlp_ratio * d, d)
    s["scale_shift_table"] = (2, d)
    s.lin("proj_out", d, p * p * cfg.out_channels)
    return s


def _sd3(cfg) -> _Shapes:
    """stabilityai SD3/SD3.5 MMDiT (convert.sd3_params); qk_norm and
    dual_attention_layers follow the config preset."""
    s = _Shapes()
    d = cfg.hidden
    s.conv("pos_embed.proj", cfg.in_channels, d, k=cfg.patch_size)
    for name, din in (("timestep_embedder", 256),
                      ("text_embedder", cfg.pooled_dim)):
        s.lin(f"time_text_embed.{name}.linear_1", din, d)
        s.lin(f"time_text_embed.{name}.linear_2", d, d)
    s.lin("context_embedder", cfg.context_dim, d)
    dual = set(cfg.dual_attention_layers)
    for i in range(cfg.num_layers):
        b = f"transformer_blocks.{i}"
        last = i == cfg.num_layers - 1
        s.lin(f"{b}.norm1.linear", d, (9 if i in dual else 6) * d)
        s.lin(f"{b}.norm1_context.linear", d, (2 if last else 6) * d)
        for p in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                  "add_v_proj"):
            s.lin(f"{b}.attn.{p}", d, d)
        s.lin(f"{b}.attn.to_out.0", d, d)
        if cfg.qk_norm == "rms":
            s[f"{b}.attn.norm_q.weight"] = (cfg.head_dim,)
            s[f"{b}.attn.norm_k.weight"] = (cfg.head_dim,)
        if not last:
            s.lin(f"{b}.attn.to_add_out", d, d)
        if i in dual:
            for p in ("to_q", "to_k", "to_v"):
                s.lin(f"{b}.attn2.{p}", d, d)
            s.lin(f"{b}.attn2.to_out.0", d, d)
            if cfg.qk_norm == "rms":
                s[f"{b}.attn2.norm_q.weight"] = (cfg.head_dim,)
                s[f"{b}.attn2.norm_k.weight"] = (cfg.head_dim,)
        s.lin(f"{b}.ff.net.0.proj", d, 4 * d)
        s.lin(f"{b}.ff.net.2", 4 * d, d)
        if not last:
            s.lin(f"{b}.ff_context.net.0.proj", d, 4 * d)
            s.lin(f"{b}.ff_context.net.2", 4 * d, d)
    s.lin("norm_out.linear", d, 2 * d)
    s.lin("proj_out", d, cfg.patch_size**2 * cfg.out_channels)
    return s


def _unet_sd15(cfg) -> _Shapes:
    """runwayml SD1.5 UNet2DConditionModel (convert.unet_sd15_params)."""
    s = _Shapes()
    widths = list(cfg.block_widths)
    n_stages = len(widths)
    lpb = cfg.layers_per_block
    temb = widths[0] * 4

    def resnet(name, cin, cout):
        s.norm(f"{name}.norm1", cin)
        s.conv(f"{name}.conv1", cin, cout)
        s.lin(f"{name}.time_emb_proj", temb, cout)
        s.norm(f"{name}.norm2", cout)
        s.conv(f"{name}.conv2", cout, cout)
        if cin != cout:
            s.conv(f"{name}.conv_shortcut", cin, cout, k=1)

    def spatial(name, w):
        s.norm(f"{name}.norm", w)
        s.conv(f"{name}.proj_in", w, w, k=1)
        s.conv(f"{name}.proj_out", w, w, k=1)
        t = f"{name}.transformer_blocks.0"
        for j in (1, 2, 3):
            s.norm(f"{t}.norm{j}", w)
        for attn, ctx in (("attn1", w), ("attn2", cfg.context_dim)):
            s.lin(f"{t}.{attn}.to_q", w, w, bias=False)
            s.lin(f"{t}.{attn}.to_k", ctx, w, bias=False)
            s.lin(f"{t}.{attn}.to_v", ctx, w, bias=False)
            s.lin(f"{t}.{attn}.to_out.0", w, w)
        s.lin(f"{t}.ff.net.0.proj", w, 8 * w)
        s.lin(f"{t}.ff.net.2", 4 * w, w)

    s.conv("conv_in", cfg.in_channels, widths[0])
    s.lin("time_embedding.linear_1", widths[0], temb)
    s.lin("time_embedding.linear_2", temb, temb)
    ch = widths[0]
    for i, w in enumerate(widths):
        has_attn = i < n_stages - 1
        for j in range(lpb):
            resnet(f"down_blocks.{i}.resnets.{j}", ch, w)
            ch = w
            if has_attn:
                spatial(f"down_blocks.{i}.attentions.{j}", w)
        if i < n_stages - 1:
            s.conv(f"down_blocks.{i}.downsamplers.0.conv", w, w)
    resnet("mid_block.resnets.0", widths[-1], widths[-1])
    spatial("mid_block.attentions.0", widths[-1])
    resnet("mid_block.resnets.1", widths[-1], widths[-1])
    skips = [widths[0]]
    for i, w in enumerate(widths):
        skips.extend([w] * lpb)
        if i < n_stages - 1:
            skips.append(w)
    ch = widths[-1]
    for i, w in enumerate(reversed(widths)):
        stage = n_stages - 1 - i
        has_attn = stage < n_stages - 1
        for j in range(lpb + 1):
            skip = skips.pop()
            resnet(f"up_blocks.{i}.resnets.{j}", ch + skip, w)
            ch = w
            if has_attn:
                spatial(f"up_blocks.{i}.attentions.{j}", w)
        if stage > 0:
            s.conv(f"up_blocks.{i}.upsamplers.0.conv", w, w)
    s.norm("conv_norm_out", widths[0])
    s.conv("conv_out", widths[0], cfg.out_channels)
    return s


def _klvae(cfg) -> _Shapes:
    """SD1.5/SD3 AutoencoderKL, encoder + decoder (convert.klvae_params)."""
    s = _Shapes()
    widths = list(cfg.block_widths)
    n_stages = len(widths)
    lpb = cfg.layers_per_block

    def resnet(name, cin, cout):
        s.norm(f"{name}.norm1", cin)
        s.conv(f"{name}.conv1", cin, cout)
        s.norm(f"{name}.norm2", cout)
        s.conv(f"{name}.conv2", cout, cout)
        if cin != cout:
            s.conv(f"{name}.conv_shortcut", cin, cout, k=1)

    def midattn(name, w):
        s.norm(f"{name}.group_norm", w)
        for p in ("to_q", "to_k", "to_v"):
            s.lin(f"{name}.{p}", w, w)
        s.lin(f"{name}.to_out.0", w, w)

    s.conv("decoder.conv_in", cfg.latent_channels, widths[-1])
    resnet("decoder.mid_block.resnets.0", widths[-1], widths[-1])
    midattn("decoder.mid_block.attentions.0", widths[-1])
    resnet("decoder.mid_block.resnets.1", widths[-1], widths[-1])
    ch = widths[-1]
    for i, w in enumerate(reversed(widths)):
        for j in range(lpb + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", ch, w)
            ch = w
        if i < n_stages - 1:
            s.conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", w, w)
    s.norm("decoder.conv_norm_out", widths[0])
    s.conv("decoder.conv_out", widths[0], cfg.image_channels)
    s.conv("post_quant_conv", cfg.latent_channels, cfg.latent_channels, k=1)
    s.conv("encoder.conv_in", cfg.image_channels, widths[0])
    ch = widths[0]
    for i, w in enumerate(widths):
        for j in range(lpb):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", ch, w)
            ch = w
        if i < n_stages - 1:
            s.conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", w, w)
    resnet("encoder.mid_block.resnets.0", widths[-1], widths[-1])
    midattn("encoder.mid_block.attentions.0", widths[-1])
    resnet("encoder.mid_block.resnets.1", widths[-1], widths[-1])
    s.norm("encoder.conv_norm_out", widths[-1])
    s.conv("encoder.conv_out", widths[-1], 2 * cfg.latent_channels)
    s.conv("quant_conv", 2 * cfg.latent_channels, 2 * cfg.latent_channels, k=1)
    return s


def _cogvideox(cfg) -> _Shapes:
    """THUDM/CogVideoX-2b transformer (convert.cogvideox_params)."""
    s = _Shapes()
    d = cfg.hidden
    s.conv("patch_embed.proj", cfg.in_channels, d, k=cfg.patch_size)
    s.lin("patch_embed.text_proj", cfg.text_dim, d)
    s.lin("time_embedding.linear_1", d, cfg.time_embed_dim)
    s.lin("time_embedding.linear_2", cfg.time_embed_dim, cfg.time_embed_dim)
    for i in range(cfg.num_layers):
        b = f"transformer_blocks.{i}"
        for norm in ("norm1", "norm2"):
            s.lin(f"{b}.{norm}.linear", cfg.time_embed_dim, 6 * d)
            s.norm(f"{b}.{norm}.norm", d)
        for p in ("to_q", "to_k", "to_v"):
            s.lin(f"{b}.attn1.{p}", d, d)
        s.norm(f"{b}.attn1.norm_q", cfg.head_dim)
        s.norm(f"{b}.attn1.norm_k", cfg.head_dim)
        s.lin(f"{b}.attn1.to_out.0", d, d)
        s.lin(f"{b}.ff.net.0.proj", d, 4 * d)
        s.lin(f"{b}.ff.net.2", 4 * d, d)
    s.norm("norm_final", d)
    s.lin("norm_out.linear", cfg.time_embed_dim, 2 * d)
    s.norm("norm_out.norm", d)
    s.lin("proj_out", d, cfg.patch_size**2 * cfg.out_channels)
    return s


def _vae3d_decoder(cfg) -> _Shapes:
    """CogVideoX causal-3D VAE, decoder side (convert.vae3d_decoder_params)."""
    s = _Shapes()
    widths = list(cfg.block_widths)
    n_stages = len(widths)
    lpb = cfg.layers_per_block

    def cconv(name, cin, cout, kt=3, ks=3):
        # CogVideoXCausalConv3d wraps nn.Conv3d as `.conv`
        s.conv3d(f"{name}.conv", cin, cout, kt=kt, ks=ks)

    def resnet(name, cin, cout):
        s.norm(f"{name}.norm1", cin)
        cconv(f"{name}.conv1", cin, cout)
        s.norm(f"{name}.norm2", cout)
        cconv(f"{name}.conv2", cout, cout)
        if cin != cout:
            cconv(f"{name}.conv_shortcut", cin, cout, kt=1, ks=1)

    cconv("decoder.conv_in", cfg.latent_channels, widths[-1])
    resnet("decoder.mid_block.resnets.0", widths[-1], widths[-1])
    resnet("decoder.mid_block.resnets.1", widths[-1], widths[-1])
    ch = widths[-1]
    for i, w in enumerate(reversed(widths)):
        for j in range(lpb + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", ch, w)
            ch = w
        if i < n_stages - 1:
            s.conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", w, w)
    s.norm("decoder.norm_out", widths[0])
    cconv("decoder.conv_out", widths[0], cfg.image_channels)
    return s


def _taesd(cfg) -> _Shapes:
    """madebyollin/taesd + TAESD3 AutoencoderTiny (convert.taesd_params):
    positional nn.Sequential keys; stage convs are bias-free."""
    s = _Shapes()
    w = cfg.width

    def blk(name, cin, cout):
        s.conv(f"{name}.conv.0", cin, cout)
        s.conv(f"{name}.conv.2", cout, cout)
        s.conv(f"{name}.conv.4", cout, cout)
        if cin != cout:
            s.conv(f"{name}.skip", cin, cout, k=1, bias=False)

    idx = 0
    s.conv(f"decoder.layers.{idx}", cfg.latent_channels, w)
    idx += 2  # + ReLU
    for _stage in range(cfg.num_stages):
        for _b in range(cfg.blocks_per_stage):
            blk(f"decoder.layers.{idx}", w, w)
            idx += 1
        idx += 1  # nn.Upsample
        s.conv(f"decoder.layers.{idx}", w, w, bias=False)
        idx += 1
    blk(f"decoder.layers.{idx}", w, w)
    idx += 1
    s.conv(f"decoder.layers.{idx}", w, cfg.image_channels)
    idx = 0
    s.conv(f"encoder.layers.{idx}", cfg.image_channels, w)
    idx += 1
    blk(f"encoder.layers.{idx}", w, w)
    idx += 1
    for _stage in range(cfg.num_stages):
        s.conv(f"encoder.layers.{idx}", w, w, bias=False)
        idx += 1
        for _b in range(cfg.blocks_per_stage):
            blk(f"encoder.layers.{idx}", w, w)
            idx += 1
    s.conv(f"encoder.layers.{idx}", w, cfg.latent_channels)
    return s


def _default_cfg(family: str):
    if family == "pixart":
        from tdm_tpu.models.pixart import PixArtConfig

        return PixArtConfig()
    if family == "sd3":
        from tdm_tpu.models.mmdit_sd3 import MMDiTConfig

        return MMDiTConfig()
    if family == "unet_sd15":
        from tdm_tpu.models.unet_sd15 import UNetConfig

        return UNetConfig()
    if family == "klvae":
        from tdm_tpu.models.vae import KLVAEConfig

        return KLVAEConfig()
    if family == "cogvideox":
        from tdm_tpu.models.cogvideox import CogVideoXConfig

        return CogVideoXConfig()
    if family == "vae3d_decoder":
        from tdm_tpu.models.vae3d import VAE3DConfig

        return VAE3DConfig()
    if family == "taesd":
        from tdm_tpu.models.vae import TAESDConfig

        return TAESDConfig()
    if family == "taesd3":
        from tdm_tpu.models.vae import TAESDConfig

        return TAESDConfig.taesd3()
    raise ValueError(f"unknown manifest family {family!r}")


_BUILDERS = {
    "pixart": _pixart,
    "sd3": _sd3,
    "unet_sd15": _unet_sd15,
    "klvae": _klvae,
    "cogvideox": _cogvideox,
    "vae3d_decoder": _vae3d_decoder,
    "taesd": _taesd,
    "taesd3": _taesd,
}

MANIFEST_FAMILIES = tuple(_BUILDERS)

# Checkpoint keys the converters intentionally skip (mirrors the
# @_strict_converter ignore patterns + non-persistent buffers some dumps
# still serialize).
_IGNORED_PREFIXES = {
    "sd3": ("pos_embed.pos_embed",),
    "taesd": ("latent_magnitude", "latent_shift"),
    "taesd3": ("latent_magnitude", "latent_shift"),
    "vae3d_decoder": ("encoder.", "quant_conv.", "post_quant_conv."),
    "pixart": (
        "adaln_single.emb.resolution_embedder.",
        "adaln_single.emb.aspect_ratio_embedder.",
        "caption_projection.y_embedding",
    ),
    "cogvideox": ("patch_embed.pos_embedding",),
}


def expected_manifest(family: str, cfg=None) -> dict[str, tuple[int, ...]]:
    """The exact {torch key: shape} inventory the family's converter
    consumes, generated from the model config (defaults to the real
    recipe config)."""
    if family not in _BUILDERS:
        raise ValueError(
            f"unknown manifest family {family!r}; known: {MANIFEST_FAMILIES}"
        )
    return dict(_BUILDERS[family](cfg if cfg is not None else _default_cfg(family)))


def read_safetensors_manifest(path: str) -> dict[str, tuple[int, ...]]:
    """{key: shape} from safetensors HEADERS only (the first 8 bytes are a
    LE length, then JSON — no tensor data is read). `path` may be one
    .safetensors file or a directory of shards."""
    files = []
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".safetensors")
        )
        if not files:
            raise FileNotFoundError(f"no .safetensors files under {path}")
    else:
        files = [path]
    out: dict[str, tuple[int, ...]] = {}
    for f in files:
        with open(f, "rb") as fh:
            n = int.from_bytes(fh.read(8), "little")
            header = json.loads(fh.read(n))
        for k, v in header.items():
            if k == "__metadata__":
                continue
            out[k] = tuple(v["shape"])
    return out


def save_manifest(manifest: dict[str, tuple[int, ...]], path: str) -> None:
    with open(path, "w") as f:
        json.dump(
            {k: list(v) for k, v in sorted(manifest.items())}, f, indent=0
        )
        f.write("\n")


def load_manifest(path: str) -> dict[str, tuple[int, ...]]:
    """Load a manifest from JSON ({key: shape-list}) or from a safetensors
    file/dir (header-only)."""
    if path.endswith(".json"):
        with open(path) as f:
            return {k: tuple(v) for k, v in json.load(f).items()}
    return read_safetensors_manifest(path)


def check_manifest(
    family: str,
    actual: dict[str, tuple[int, ...]],
    cfg=None,
    *,
    strip_prefix: Optional[str] = None,
) -> list[str]:
    """Compare a checkpoint's key/shape inventory against the converter's
    expectation. Returns a list of human-readable problems ([] = clean).

    strip_prefix: some dumps nest the model under e.g. 'transformer.' or
    'model.' — pass it to normalize before comparing."""
    if strip_prefix:
        actual = {
            k[len(strip_prefix):]: v
            for k, v in actual.items()
            if k.startswith(strip_prefix)
        }
    expected = expected_manifest(family, cfg)
    ignored = _IGNORED_PREFIXES.get(family, ())
    actual = {
        k: tuple(v)
        for k, v in actual.items()
        if not any(k.startswith(p) for p in ignored)
    }
    problems = []
    missing = sorted(set(expected) - set(actual))
    extra = sorted(set(actual) - set(expected))
    for k in missing:
        problems.append(f"missing key: {k} (expected shape {expected[k]})")
    for k in extra:
        problems.append(f"unexpected key: {k} shape {actual[k]}")
    for k in sorted(set(expected) & set(actual)):
        if tuple(expected[k]) != tuple(actual[k]):
            problems.append(
                f"shape mismatch: {k} expected {tuple(expected[k])} got "
                f"{tuple(actual[k])}"
            )
    return problems


def synthetic_state_dict(
    family: str, cfg=None, *, seed: int = 0, scale: float = 0.02
) -> dict[str, Any]:
    """Random state dict with the family's exact key/shape inventory —
    for structural tests and converter dry-runs."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return {
        k: rng.standard_normal(shape).astype(np.float32) * scale
        if shape else np.float32(rng.standard_normal() * scale)
        for k, shape in expected_manifest(family, cfg).items()
    }
