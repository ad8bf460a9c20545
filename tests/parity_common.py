"""Shared parity-fixture consumption logic.

Importable WITHOUT any fixtures present (unlike test_parity_fixtures.py,
which module-skips when tests/fixtures/parity/ is empty), so the schema
plumbing can be exercised on synthetic stand-ins
(tests/test_parity_plumbing.py) and real fixtures activate the full checks
the moment they are committed. `check_fixture(path)` runs the per-family
activation comparison for one npz recorded by
scripts/record_parity_fixtures.py.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdm_tpu.io import convert

# deep stacks accumulate float error; tiny 2-layer fixtures stay tight
_TINY_TOL = dict(atol=5e-4, rtol=5e-4)
_REAL_TOL = dict(atol=5e-3, rtol=5e-3)


def _load(path):
    z = np.load(path, allow_pickle=False)
    family = str(z["family"])
    cfg = json.loads(str(z["config_json"]))
    tiny = bool(z["tiny"])
    groups = {"in": {}, "sd": {}, "act": {}, "act_ctx": {}}
    final = z["out/final"]
    for k in z.files:
        if "/" not in k:
            continue
        g, name = k.split("/", 1)
        if g in groups:
            groups[g][name] = z[k]
    return family, cfg, tiny, groups, final


def _state_dict(path, tiny, sd_group):
    if tiny:
        return dict(sd_group)
    wdir = os.environ.get("TDM_PARITY_WEIGHTS_DIR")
    if not wdir:
        pytest.skip("real-checkpoint fixture needs TDM_PARITY_WEIGHTS_DIR")
    return convert.load_torch_state_dict(wdir)


def _acts_sorted(acts):
    return [acts[k] for k in sorted(acts, key=lambda s: int(s.split("_")[-1]))]


def _per_block(intermediates, prefix, n, pick=None):
    """Pull blocks_{i} __call__ outputs out of a Flax intermediates tree."""
    out = []
    for i in range(n):
        v = intermediates[f"{prefix}{i}"]["__call__"][0]
        out.append(pick(v) if pick else v)
    return out


def check_fixture(path):
    family, cfg, tiny, g, final = _load(path)
    tol = _TINY_TOL if tiny else _REAL_TOL
    sd = _state_dict(path, tiny, g["sd"])

    if family == "pixart":
        from tdm_tpu.models import pixart

        mcfg = pixart.PixArtConfig(
            sample_size=cfg["sample_size"], num_layers=cfg["num_layers"],
            num_heads=cfg["num_heads"], head_dim=cfg["head_dim"],
            caption_dim=cfg["caption_dim"], dtype=jnp.float32,
            attn_impl="xla", scan_layers=False,
        )
        tree = convert.to_jax(convert.pixart_params(sd, scan_layers=False))
        model = pixart.PixArtTransformer2D(cfg=mcfg)
        out, state = model.apply(
            {"params": tree}, jnp.asarray(g["in"]["latent"]),
            jnp.asarray(g["in"]["t"]), jnp.asarray(g["in"]["text"]), None,
            capture_intermediates=lambda mdl, _m: isinstance(
                mdl, pixart.PixArtBlock
            ),
            mutable=["intermediates"],
        )
        ours = _per_block(
            state["intermediates"], "blocks_", mcfg.num_layers
        )
        theirs = _acts_sorted(g["act"])
        for i, (a, b) in enumerate(zip(ours, theirs)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), b, err_msg=f"block {i}", **tol
            )
        np.testing.assert_allclose(np.asarray(out, np.float32), final, **tol)

    elif family == "sd3":
        from tdm_tpu.models import mmdit_sd3

        mcfg = mmdit_sd3.MMDiTConfig(
            sample_size=cfg["sample_size"], num_layers=cfg["num_layers"],
            num_heads=cfg["num_heads"], head_dim=cfg["head_dim"],
            context_dim=cfg["context_dim"], pooled_dim=cfg["pooled_dim"],
            pos_embed_max_size=cfg["pos_embed_max_size"],
            dtype=jnp.float32, attn_impl="xla", scan_layers=False,
        )
        tree = convert.to_jax(convert.sd3_params(sd, scan_layers=False))
        model = mmdit_sd3.SD3Transformer2D(cfg=mcfg)
        out, state = model.apply(
            {"params": tree}, jnp.asarray(g["in"]["latent"]),
            jnp.asarray(g["in"]["t"]), jnp.asarray(g["in"]["context"]),
            jnp.asarray(g["in"]["pooled"]),
            capture_intermediates=lambda mdl, _m: isinstance(
                mdl, mmdit_sd3.JointBlock
            ),
            mutable=["intermediates"],
        )
        s_img = (cfg["sample_size"] // 2) ** 2
        for i in range(mcfg.num_layers):
            v = state["intermediates"][f"blocks_{i}"]["__call__"][0]
            x_ours = np.asarray(v[0] if isinstance(v, tuple) else v, np.float32)
            # torch hook stored tensors by position; match by token count
            cands = [g["act"].get(f"block_{i}"), g["act_ctx"].get(f"block_{i}")]
            x_theirs = next(
                c for c in cands if c is not None and c.shape[1] == s_img
            )
            np.testing.assert_allclose(
                x_ours, x_theirs, err_msg=f"block {i} image stream", **tol
            )
        np.testing.assert_allclose(np.asarray(out, np.float32), final, **tol)

    elif family == "cogvideox":
        from tdm_tpu.models import cogvideox as cog

        mcfg = cog.CogVideoXConfig(
            num_layers=cfg["num_layers"], num_heads=cfg["num_heads"],
            head_dim=cfg["head_dim"], text_dim=cfg["text_dim"],
            time_embed_dim=cfg["time_embed_dim"],
            max_text_len=cfg["max_text_len"],
            sample_frames=cfg["sample_frames"], sample_h=cfg["sample_h"],
            sample_w=cfg["sample_w"], use_rotary=cfg["use_rotary"],
            dtype=jnp.float32, attn_impl="xla", scan_layers=False,
        )
        tree = convert.to_jax(convert.cogvideox_params(sd, scan_layers=False))
        model = cog.CogVideoXTransformer3D(cfg=mcfg)
        lat = np.transpose(g["in"]["latent_bfchw"], (0, 2, 1, 3, 4))
        out, state = model.apply(
            {"params": tree}, jnp.asarray(lat), jnp.asarray(g["in"]["t"]),
            jnp.asarray(g["in"]["text"]),
            capture_intermediates=lambda mdl, _m: isinstance(
                mdl, cog.CogVideoXBlock
            ),
            mutable=["intermediates"],
        )
        s_vid = lat.shape[2] * (lat.shape[3] // 2) * (lat.shape[4] // 2)
        for i in range(mcfg.num_layers):
            v = state["intermediates"][f"blocks_{i}"]["__call__"][0]
            x_ours = np.asarray(v[0] if isinstance(v, tuple) else v, np.float32)
            cands = [g["act"].get(f"block_{i}"), g["act_ctx"].get(f"block_{i}")]
            x_theirs = next(
                c for c in cands if c is not None and c.shape[1] == s_vid
            )
            np.testing.assert_allclose(
                x_ours, x_theirs, err_msg=f"block {i} video stream", **tol
            )
        np.testing.assert_allclose(np.asarray(out, np.float32), final, **tol)

    elif family == "unet_sd15":
        from tdm_tpu.models import unet_sd15

        mcfg = unet_sd15.UNetConfig(
            block_widths=tuple(cfg["block_widths"]),
            layers_per_block=cfg["layers_per_block"],
            context_dim=cfg["context_dim"], norm_groups=cfg["norm_groups"],
            dtype=jnp.float32, attn_impl="xla",
        )
        tree = convert.to_jax(
            convert.unet_sd15_params(
                sd, layers_per_block=mcfg.layers_per_block,
                n_stages=len(mcfg.block_widths),
            )
        )
        model = unet_sd15.UNet2DCondition(cfg=mcfg)
        out = model.apply(
            {"params": tree}, jnp.asarray(g["in"]["latent"]),
            jnp.asarray(g["in"]["t"]), jnp.asarray(g["in"]["context"]),
            jnp.ones(g["in"]["context"].shape[:2], jnp.int32),
        )
        np.testing.assert_allclose(np.asarray(out, np.float32), final, **tol)

    elif family == "klvae":
        from tdm_tpu.models import vae as vae_lib

        mcfg = vae_lib.KLVAEConfig(
            block_widths=tuple(cfg["block_widths"]),
            layers_per_block=cfg["layers_per_block"],
            norm_groups=cfg["norm_groups"],
            latent_channels=cfg["latent_channels"],
        )
        tree = convert.to_jax(
            convert.klvae_params(
                sd, layers_per_block=mcfg.layers_per_block,
                n_stages=len(mcfg.block_widths),
            )
        )
        dec = vae_lib.KLDecoder(cfg=mcfg)
        # fixture decode goes through post_quant_conv like
        # AutoencoderKL.decode; our decoder applies it when present
        out = dec.apply({"params": tree["decoder"]}, jnp.asarray(g["in"]["z"]))
        np.testing.assert_allclose(np.asarray(out, np.float32), final, **tol)
        enc = vae_lib.KLEncoder(cfg=mcfg)
        mean = enc.apply(
            {"params": tree["encoder"]}, jnp.asarray(g["in"]["img"])
        )
        theirs = g["in"]["enc_mean"]
        np.testing.assert_allclose(
            np.asarray(mean, np.float32)[:, : theirs.shape[1]], theirs, **tol
        )

    elif family in ("taesd", "taesd3"):
        from tdm_tpu.models import vae as vae_lib

        mcfg = vae_lib.TAESDConfig(
            latent_channels=cfg["latent_channels"], width=cfg["width"],
            num_stages=cfg["num_stages"],
            blocks_per_stage=cfg["blocks_per_stage"],
        )
        tree = convert.to_jax(
            convert.taesd_params(
                sd, num_stages=mcfg.num_stages,
                blocks_per_stage=mcfg.blocks_per_stage,
            )
        )
        dec = vae_lib.TAESDDecoder(cfg=mcfg)
        out = dec.apply({"params": tree["decoder"]}, jnp.asarray(g["in"]["z"]))
        np.testing.assert_allclose(np.asarray(out, np.float32), final, **tol)
        enc = vae_lib.TAESDEncoder(cfg=mcfg)
        lat = enc.apply({"params": tree["encoder"]}, jnp.asarray(g["in"]["img"]))
        np.testing.assert_allclose(
            np.asarray(lat, np.float32), g["in"]["enc"], **tol
        )

    else:
        pytest.fail(f"unknown fixture family {family!r} in {path}")
