"""`from_pretrained` — pipeline assembly from a directory or hub repo id.

The reference's primary verb (`StableDiffusion3Pipeline.from_pretrained`,
`DiffusionPipeline.from_pretrained`, §3.4) materialized for TWO layouts:

1. Our artifact layout (written by `save_pretrained` / the train CLI):

    my_pipe/
      pipeline.json               {"family": "pixart", "model": {...},
                                   "vae": {...}}   (config overrides)
      transformer.safetensors     denoiser params (io/params format, i.e.
                                  converted via cli/convert_checkpoint)
      vae_decoder.safetensors     optional decoder params
      text_encoder.safetensors    optional (T5/CLIP) params
      tokenizer/                  optional HF tokenizer dir

2. A stock **diffusers checkpoint** (`model_index.json` + `transformer/`
   or `unet/` + `vae/` subfolders): the `_class_name` picks the family,
   each subfolder's `config.json` maps onto our Flax config, and the
   torch state dicts run through `io/convert`'s strict converters on the
   fly — `from_pretrained("PixArt-alpha/PixArt-XL-2-512x512")` works
   exactly like the reference's call (`/root/reference/src/main.py:160-176`)
   once the repo is in the local HF hub cache (io/hub.resolve_pretrained).

`save_pretrained(pipe_dir, ...)` writes layout 1 from live params, so train
CLI outputs round-trip into pipelines with two lines.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

from tdm_tpu.io import params as params_io

FAMILIES = ("pixart", "sd3", "sd15", "cogvideox")


def save_pretrained(
    path: str,
    *,
    family: str,
    transformer_params: Any,
    model_config: Optional[dict] = None,
    vae_params: Any = None,
    vae_config: Optional[dict] = None,
    text_encoder_params: Any = None,
    text_encoder_config: Optional[dict] = None,
    tokenizer_dir: Optional[str] = None,
) -> None:
    """`text_encoder_config` describes how to rebuild the bundled encoder:
    {"family": "t5"|"clip", "config": {<T5Config/CLIPTextConfig kwargs>},
     "tokenizer": {"kind": "hf"} | {"kind": "hash", "vocab_size": N}}.
    `tokenizer_dir` copies an HF tokenizer folder into `<path>/tokenizer`."""
    if family not in FAMILIES:
        raise ValueError(f"unknown family {family!r} (one of {FAMILIES})")
    os.makedirs(path, exist_ok=True)
    meta = {"family": family, "model": model_config or {}, "vae": vae_config or {}}
    if text_encoder_config is not None:
        meta["text_encoder"] = text_encoder_config
    with open(os.path.join(path, "pipeline.json"), "w") as f:
        json.dump(meta, f, indent=1)
    params_io.save_params(
        transformer_params, os.path.join(path, "transformer.safetensors")
    )
    if vae_params is not None:
        params_io.save_params(
            vae_params, os.path.join(path, "vae_decoder.safetensors")
        )
    if text_encoder_params is not None:
        params_io.save_params(
            text_encoder_params, os.path.join(path, "text_encoder.safetensors")
        )
    if tokenizer_dir is not None:
        import shutil

        dst = os.path.join(path, "tokenizer")
        if os.path.abspath(tokenizer_dir) != os.path.abspath(dst):
            shutil.copytree(tokenizer_dir, dst, dirs_exist_ok=True)


def _fix(conf: dict) -> dict:
    """JSON config → dataclass kwargs (dtype strings → jnp dtypes, lists →
    tuples: JSON has no tuples and no config field is a genuine list)."""
    import jax.numpy as jnp

    out = {
        k: tuple(v) if isinstance(v, list) else v for k, v in conf.items()
    }
    if isinstance(out.get("dtype"), str):
        out["dtype"] = jnp.dtype(out["dtype"]).type
    return out


def config_dict(cfg) -> dict:
    """Model/VAE config dataclass → the JSON-safe dict `_fix` re-reads
    (dtype → name string, tuples → lists)."""
    import jax.numpy as jnp

    out = {}
    for f in dataclasses.fields(cfg):
        v = getattr(cfg, f.name)
        if f.name == "dtype":
            v = jnp.dtype(v).name
        elif isinstance(v, tuple):
            v = list(v)
        out[f.name] = v
    return out


def from_pretrained(
    path: str,
    *,
    revision: Optional[str] = None,
    cache_dir: Optional[str] = None,
    **kwargs,
):
    """Assemble the right pipeline class from a local pipeline directory, a
    diffusers checkpoint directory, or an `org/name` hub repo id (resolved
    against the local HF hub cache — io/hub). Extra kwargs pass through to
    the pipeline constructor (e.g. flow_shift)."""
    from tdm_tpu.io import hub

    path = hub.resolve_pretrained(path, revision=revision, cache_dir=cache_dir)
    if not os.path.exists(os.path.join(path, "pipeline.json")):
        if os.path.exists(os.path.join(path, "model_index.json")):
            # model_config= overrides fields the diffusers config does not
            # carry (e.g. {"attn_impl": "xla", "remat": True})
            return _from_diffusers(path, **kwargs)
        raise FileNotFoundError(
            f"{path!r} has neither pipeline.json (tdm_tpu layout) nor "
            "model_index.json (diffusers layout)"
        )
    with open(os.path.join(path, "pipeline.json")) as f:
        meta = json.load(f)
    family = meta["family"]
    tparams = params_io.load_params(
        os.path.join(path, "transformer.safetensors")
    )
    vae_file = os.path.join(path, "vae_decoder.safetensors")
    vparams = params_io.load_params(vae_file) if os.path.exists(vae_file) else None
    mconf = _fix(meta.get("model", {}))
    vconf = _fix(meta.get("vae", {}))
    kwargs = {**_load_bundled_text_encoder(path, meta, family), **kwargs}

    if family == "pixart":
        from tdm_tpu.models import pixart, vae as vae_lib
        from tdm_tpu.pipelines.pixart import PixArtPipeline

        cfg = dataclasses.replace(pixart.PixArtConfig(), **mconf)
        vcfg = dataclasses.replace(vae_lib.TAESDConfig(), **vconf)
        return PixArtPipeline(
            pixart.PixArtTransformer2D(cfg=cfg), tparams,
            vae_decoder=vae_lib.TAESDDecoder(cfg=vcfg) if vparams else None,
            vae_params=vparams, vae_scaling=vcfg.scaling_factor, **kwargs,
        )
    if family == "sd3":
        from tdm_tpu.models import mmdit_sd3, vae as vae_lib
        from tdm_tpu.pipelines.sd3 import SD3Pipeline

        cfg = dataclasses.replace(mmdit_sd3.MMDiTConfig(), **mconf)
        vcfg = dataclasses.replace(vae_lib.TAESDConfig.taesd3(), **vconf)
        return SD3Pipeline(
            mmdit_sd3.SD3Transformer2D(cfg=cfg), tparams,
            vae_decoder=vae_lib.TAESDDecoder(cfg=vcfg) if vparams else None,
            vae_params=vparams, vae_scaling=vcfg.scaling_factor,
            vae_shift=vcfg.shift_factor, **kwargs,
        )
    if family == "sd15":
        from tdm_tpu.models import unet_sd15, vae as vae_lib
        from tdm_tpu.pipelines.sd15 import SD15Pipeline

        cfg = dataclasses.replace(unet_sd15.UNetConfig(), **mconf)
        vcfg = dataclasses.replace(vae_lib.KLVAEConfig(), **vconf)
        return SD15Pipeline(
            unet_sd15.UNet2DCondition(cfg=cfg), tparams,
            vae_decoder=vae_lib.KLDecoder(cfg=vcfg) if vparams else None,
            vae_params=vparams, vae_scaling=vcfg.scaling_factor, **kwargs,
        )
    if family == "cogvideox":
        from tdm_tpu.models import cogvideox as cog, vae3d
        from tdm_tpu.pipelines.cogvideox import CogVideoXPipeline

        cfg = dataclasses.replace(cog.CogVideoXConfig(), **mconf)
        vcfg = dataclasses.replace(vae3d.VAE3DConfig(), **vconf)
        return CogVideoXPipeline(
            cog.CogVideoXTransformer3D(cfg=cfg), tparams,
            vae_decoder=vae3d.VAE3DDecoder(cfg=vcfg) if vparams else None,
            vae_params=vparams, vae_cfg=vcfg, **kwargs,
        )
    raise ValueError(f"unknown family {family!r}")


def _load_bundled_text_encoder(path: str, meta: dict, family: str) -> dict:
    """Rebuild a bundled single text encoder (layout-1 `text_encoder` meta
    block + text_encoder.safetensors + tokenizer/) into the pipeline kwargs
    {text_encoder, text_encoder_params, tokenizer}. SD3's triple-encoder
    stack is not bundled this way — its pipelines take `text_encoders=`
    directly (pipelines/sd3.py) or precomputed prompt_embeds."""
    spec = meta.get("text_encoder")
    enc_file = os.path.join(path, "text_encoder.safetensors")
    if not spec or not os.path.exists(enc_file) or family == "sd3":
        return {}
    enc_family = spec.get("family", "t5")
    conf = _fix(spec.get("config", {}))
    if enc_family == "t5":
        from tdm_tpu.models import t5

        encoder = t5.T5Encoder(cfg=t5.T5Config(**conf))
    elif enc_family == "clip":
        from tdm_tpu.models import clip as clip_mod

        encoder = clip_mod.CLIPTextEncoder(cfg=clip_mod.CLIPTextConfig(**conf))
    else:
        raise ValueError(f"unknown text-encoder family {enc_family!r}")
    tok_spec = spec.get("tokenizer", {"kind": "hf"})
    tok_dir = os.path.join(path, "tokenizer")
    if tok_spec.get("kind") == "hash":
        from tdm_tpu.data.tokenizer import HashTokenizer

        tokenizer = HashTokenizer(
            vocab_size=tok_spec.get("vocab_size", 30000),
            eos_id=tok_spec.get("eos_id"),
        )
    elif os.path.isdir(tok_dir):
        from tdm_tpu.data.tokenizer import HFTokenizer

        tokenizer = HFTokenizer(tok_dir)
    else:
        tokenizer = None  # encoder still usable via encode with own ids
    return {
        "text_encoder": encoder,
        "text_encoder_params": params_io.load_params(enc_file),
        "tokenizer": tokenizer,
    }


# ---------------------------------------------------------------------------
# diffusers checkpoint layout (model_index.json + subfolders)
# ---------------------------------------------------------------------------

# ordered: 'StableDiffusion3*' must match before 'StableDiffusion*'
_DIFFUSERS_FAMILIES = (
    ("StableDiffusion3", "sd3"),
    ("PixArt", "pixart"),
    ("CogVideoX", "cogvideox"),
    ("StableDiffusion", "sd15"),
    ("LatentConsistency", "sd15"),  # Dreamshaper-LCM style SD1.5 derivative
)


def _family_from_class(class_name: str) -> str:
    for prefix, family in _DIFFUSERS_FAMILIES:
        if class_name.startswith(prefix):
            return family
    raise ValueError(
        f"unsupported diffusers pipeline class {class_name!r} "
        f"(supported families: {FAMILIES})"
    )


def _subconfig(path: str, subfolder: str) -> dict:
    with open(os.path.join(path, subfolder, "config.json")) as f:
        return json.load(f)


def _mapped(hf: dict, mapping: dict[str, str]) -> dict:
    """Pick the intersection of a diffusers config with our dataclass
    fields, renaming keys; absent keys keep our defaults."""
    return {ours: hf[theirs] for theirs, ours in mapping.items() if theirs in hf}


def _pixart_config(hf: dict):
    from tdm_tpu.models import pixart

    kw = _mapped(hf, {
        "sample_size": "sample_size", "patch_size": "patch_size",
        "in_channels": "in_channels", "out_channels": "out_channels",
        "num_layers": "num_layers", "num_attention_heads": "num_heads",
        "attention_head_dim": "head_dim", "caption_channels": "caption_dim",
    })
    return dataclasses.replace(pixart.PixArtConfig(), **kw)


def _sd3_config(hf: dict):
    from tdm_tpu.models import mmdit_sd3

    kw = _mapped(hf, {
        "sample_size": "sample_size", "patch_size": "patch_size",
        "in_channels": "in_channels", "out_channels": "out_channels",
        "num_layers": "num_layers", "num_attention_heads": "num_heads",
        "attention_head_dim": "head_dim",
        "joint_attention_dim": "context_dim",
        "pooled_projection_dim": "pooled_dim",
        "pos_embed_max_size": "pos_embed_max_size",
    })
    if hf.get("qk_norm") == "rms_norm":
        kw["qk_norm"] = "rms"
    if hf.get("dual_attention_layers"):
        kw["dual_attention_layers"] = tuple(hf["dual_attention_layers"])
    return dataclasses.replace(mmdit_sd3.MMDiTConfig(), **kw)


def _unet_config(hf: dict):
    from tdm_tpu.models import unet_sd15

    kw = _mapped(hf, {
        "in_channels": "in_channels", "out_channels": "out_channels",
        "layers_per_block": "layers_per_block",
        "cross_attention_dim": "context_dim",
        "norm_num_groups": "norm_groups",
    })
    if "block_out_channels" in hf:
        kw["block_widths"] = tuple(hf["block_out_channels"])
    # SD1.5's `attention_head_dim: 8` is (historically) the HEAD COUNT —
    # diffusers' UNet treats the int form as heads (their config quirk)
    heads = hf.get("attention_head_dim")
    if isinstance(heads, int):
        kw["num_heads"] = heads
    return dataclasses.replace(unet_sd15.UNetConfig(), **kw)


def _cogvideox_config(hf: dict):
    from tdm_tpu.models import cogvideox as cog

    kw = _mapped(hf, {
        "in_channels": "in_channels", "out_channels": "out_channels",
        "patch_size": "patch_size", "num_layers": "num_layers",
        "num_attention_heads": "num_heads", "attention_head_dim": "head_dim",
        "text_embed_dim": "text_dim", "time_embed_dim": "time_embed_dim",
        "max_text_seq_length": "max_text_len",
        "sample_height": "sample_h", "sample_width": "sample_w",
        "use_rotary_positional_embeddings": "use_rotary",
    })
    if "sample_frames" in hf:  # HF counts PIXEL frames; we hold latent frames
        tcr = hf.get("temporal_compression_ratio", 4)
        kw["sample_frames"] = (hf["sample_frames"] - 1) // tcr + 1
    return dataclasses.replace(cog.CogVideoXConfig(), **kw)


def _t5_config_from_hf(hf: dict, common: dict):
    from tdm_tpu.models import t5

    kw = _mapped(hf, {
        "vocab_size": "vocab_size", "d_model": "d_model", "d_kv": "d_kv",
        "num_heads": "num_heads", "d_ff": "d_ff", "num_layers": "num_layers",
        "relative_attention_num_buckets": "rel_buckets",
        "relative_attention_max_distance": "rel_max_distance",
    })
    return t5.T5Config(**{**kw, **common})


def _clip_config_from_hf(hf: dict, common: dict):
    from tdm_tpu.models import clip as clip_mod

    kw = _mapped(hf, {
        "vocab_size": "vocab_size", "hidden_size": "hidden",
        "num_attention_heads": "num_heads", "num_hidden_layers": "num_layers",
        "max_position_embeddings": "max_positions",
        "eos_token_id": "eos_token_id", "hidden_act": "activation",
    })
    if "intermediate_size" in hf and "hidden_size" in hf:
        kw["mlp_ratio"] = hf["intermediate_size"] // hf["hidden_size"]
    # the projection head exists only on the *WithProjection variant (SD3's
    # pooled path); plain CLIPTextModel (SD1.5) pools the final hidden state
    archs = hf.get("architectures") or []
    if any("WithProjection" in a for a in archs):
        kw["projection_dim"] = hf.get("projection_dim")
    return clip_mod.CLIPTextConfig(**{**kw, **common})


def _load_diffusers_text_encoders(path: str, family: str, common: dict) -> dict:
    """text_encoder*/ + tokenizer*/ subfolders → pipeline conditioning
    kwargs. Missing subfolders are skipped (the prompt_embeds path always
    works); present ones convert strictly. `common` forwards dtype/attn_impl
    overrides to the encoder configs. Reference: the pipelines bind their
    encoders inside from_pretrained (src/main.py:160-165, README.md:48)."""
    from tdm_tpu.io import convert

    def load_one(sub: str, kind: str):
        conf_file = os.path.join(path, sub, "config.json")
        if not os.path.exists(conf_file):
            return None
        hf = _subconfig(path, sub)
        sd = convert.load_torch_state_dict(os.path.join(path, sub))
        if kind == "t5":
            from tdm_tpu.models import t5

            model = t5.T5Encoder(cfg=_t5_config_from_hf(hf, common))
            params = convert.to_jax(convert.t5_encoder_params(sd))
        else:
            from tdm_tpu.models import clip as clip_mod

            model = clip_mod.CLIPTextEncoder(
                cfg=_clip_config_from_hf(hf, common)
            )
            params = convert.to_jax(convert.clip_text_params(sd))
        return model, params

    def load_tok(sub: str):
        d = os.path.join(path, sub)
        if not os.path.isdir(d):
            return None
        from tdm_tpu.data.tokenizer import HFTokenizer

        return HFTokenizer(d)

    if family == "sd3":
        # triple-encoder stack: CLIP-L, CLIP-G (penultimate+pooled), T5
        pairs = {
            "clip_l": load_one("text_encoder", "clip"),
            "clip_g": load_one("text_encoder_2", "clip"),
            "t5": load_one("text_encoder_3", "t5"),
        }
        if any(v is None for v in pairs.values()):
            return {}
        toks = {
            "clip_l": load_tok("tokenizer"),
            "clip_g": load_tok("tokenizer_2"),
            "t5": load_tok("tokenizer_3"),
        }
        kw = {"text_encoders": pairs}
        if all(v is not None for v in toks.values()):
            kw["tokenizers"] = toks
        return kw
    kind = "clip" if family == "sd15" else "t5"
    pair = load_one("text_encoder", kind)
    if pair is None:
        return {}
    kw = {"text_encoder": pair[0], "text_encoder_params": pair[1]}
    tok = load_tok("tokenizer")
    if tok is not None:
        kw["tokenizer"] = tok
    return kw


def _load_diffusers_vae(path: str):
    """vae/ subfolder → (decoder_module, params, extra pipeline kwargs).
    Returns (None, None, {}) when absent or an unsupported class."""
    from tdm_tpu.io import convert

    conf_file = os.path.join(path, "vae", "config.json")
    if not os.path.exists(conf_file):
        return None, None, {}
    hf = _subconfig(path, "vae")
    cls = hf.get("_class_name", "")
    sd = convert.load_torch_state_dict(os.path.join(path, "vae"))
    if cls == "AutoencoderKLCogVideoX":
        from tdm_tpu.models import vae3d

        kw = _mapped(hf, {
            "latent_channels": "latent_channels",
            "layers_per_block": "layers_per_block",
            "norm_num_groups": "norm_groups",
            "scaling_factor": "scaling_factor",
            "temporal_compression_ratio": "temporal_factor",
        })
        if "block_out_channels" in hf:
            kw["block_widths"] = tuple(hf["block_out_channels"])
        vcfg = dataclasses.replace(vae3d.VAE3DConfig(), **kw)
        tree = convert.to_jax(convert.vae3d_decoder_params(
            sd, layers_per_block=vcfg.layers_per_block,
            n_stages=len(vcfg.block_widths),
        ))
        return vae3d.VAE3DDecoder(cfg=vcfg), tree, {"vae_cfg": vcfg}
    if cls == "AutoencoderTiny":
        from tdm_tpu.models import vae as vae_lib

        kw = _mapped(hf, {
            "latent_channels": "latent_channels",
            "scaling_factor": "scaling_factor",
            "shift_factor": "shift_factor",
        })
        if kw.get("shift_factor") is None:
            kw.pop("shift_factor", None)
        # TAESD stage topology from the HF AutoencoderTiny fields:
        # num_decoder_blocks [3,3,3,1] = 3 upsampling stages of 3 blocks +
        # the final pre-conv_out block
        if hf.get("decoder_block_out_channels"):
            kw["width"] = hf["decoder_block_out_channels"][0]
        if hf.get("num_decoder_blocks"):
            nb = hf["num_decoder_blocks"]
            kw["num_stages"] = len(nb) - 1
            kw["blocks_per_stage"] = nb[0]
        vcfg = dataclasses.replace(vae_lib.TAESDConfig(), **kw)
        tree = convert.to_jax(convert.taesd_params(
            sd, num_stages=vcfg.num_stages,
            blocks_per_stage=vcfg.blocks_per_stage,
        )["decoder"])
        return (
            vae_lib.TAESDDecoder(cfg=vcfg), tree,
            {"vae_scaling": vcfg.scaling_factor, "vae_range": "unit"},
        )
    if cls == "AutoencoderKL":
        from tdm_tpu.models import vae as vae_lib

        kw = _mapped(hf, {
            "latent_channels": "latent_channels",
            "layers_per_block": "layers_per_block",
            "norm_num_groups": "norm_groups",
            "scaling_factor": "scaling_factor",
            "shift_factor": "shift_factor",
        })
        if kw.get("shift_factor") is None:
            kw.pop("shift_factor", None)
        if "block_out_channels" in hf:
            kw["block_widths"] = tuple(hf["block_out_channels"])
        vcfg = dataclasses.replace(vae_lib.KLVAEConfig(), **kw)
        tree = convert.to_jax(convert.klvae_params(
            sd, layers_per_block=vcfg.layers_per_block,
            n_stages=len(vcfg.block_widths),
        )["decoder"])
        return (
            vae_lib.KLDecoder(cfg=vcfg), tree,
            {"vae_scaling": vcfg.scaling_factor, "vae_range": "pm1"},
        )
    return None, None, {}


def _from_diffusers(path: str, model_config: Optional[dict] = None, **kwargs):
    """Assemble a pipeline directly from a diffusers checkpoint directory:
    config.json → Flax config, torch safetensors → strict converters. The
    reference's `from_pretrained` download+bind step
    (/root/reference/src/main.py:160-176), minus the network.
    `model_config` overrides derived config fields (same dict form as the
    pipeline.json 'model' block, e.g. {"attn_impl": "xla", "remat": True})."""
    from tdm_tpu.io import convert

    with open(os.path.join(path, "model_index.json")) as f:
        index = json.load(f)
    family = _family_from_class(index.get("_class_name", ""))

    sub = "unet" if family == "sd15" else "transformer"
    hf = _subconfig(path, sub)
    sd = convert.load_torch_state_dict(os.path.join(path, sub))
    override = _fix(model_config or {})
    common = {
        k: override[k] for k in ("dtype", "attn_impl") if k in override
    }
    vae_dec, vae_params, vae_kw = _load_diffusers_vae(path)
    vae_kw = {
        **_load_diffusers_text_encoders(path, family, common), **vae_kw
    }
    vae_kw.update(kwargs)  # explicit kwargs win over derived settings

    if family == "pixart":
        from tdm_tpu.models import pixart
        from tdm_tpu.pipelines.pixart import PixArtPipeline

        cfg = dataclasses.replace(_pixart_config(hf), **override)
        tparams = convert.to_jax(convert.pixart_params(sd))
        return PixArtPipeline(
            pixart.PixArtTransformer2D(cfg=cfg), tparams,
            vae_decoder=vae_dec, vae_params=vae_params, **vae_kw,
        )
    if family == "sd3":
        from tdm_tpu.models import mmdit_sd3
        from tdm_tpu.pipelines.sd3 import SD3Pipeline

        cfg = dataclasses.replace(_sd3_config(hf), **override)
        tparams = convert.to_jax(convert.sd3_params(sd))
        vae_kw.setdefault(
            "vae_shift",
            vae_dec.cfg.shift_factor if vae_dec is not None else 0.0,
        )
        return SD3Pipeline(
            mmdit_sd3.SD3Transformer2D(cfg=cfg), tparams,
            vae_decoder=vae_dec, vae_params=vae_params, **vae_kw,
        )
    if family == "sd15":
        from tdm_tpu.models import unet_sd15
        from tdm_tpu.pipelines.sd15 import SD15Pipeline

        cfg = dataclasses.replace(_unet_config(hf), **override)
        tparams = convert.to_jax(convert.unet_sd15_params(
            sd, layers_per_block=cfg.layers_per_block,
            n_stages=len(cfg.block_widths),
        ))
        return SD15Pipeline(
            unet_sd15.UNet2DCondition(cfg=cfg), tparams,
            vae_decoder=vae_dec, vae_params=vae_params, **vae_kw,
        )
    if family == "cogvideox":
        from tdm_tpu.models import cogvideox as cog
        from tdm_tpu.pipelines.cogvideox import CogVideoXPipeline

        cfg = dataclasses.replace(_cogvideox_config(hf), **override)
        tparams = convert.to_jax(convert.cogvideox_params(sd))
        return CogVideoXPipeline(
            cog.CogVideoXTransformer3D(cfg=cfg), tparams,
            vae_decoder=vae_dec, vae_params=vae_params, **vae_kw,
        )
    raise AssertionError(f"unhandled family {family!r}")
