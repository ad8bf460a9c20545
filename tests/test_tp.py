"""Tensor parallelism (parallel/tp.py): megatron-style column/row sharding
via GSPMD must reproduce the unsharded forward and gradients exactly (up to
float reassociation of the partitioned contractions).

The reference has no TP (DDP + ZeRO-3 only, /root/reference/src/main.py:141-160);
this is the TPU-native latency-scaling extension, so the contract is defined
here: same numbers, params actually sharded, no model-code changes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdm_tpu.models.pixart import PixArtConfig, PixArtTransformer2D
from tdm_tpu.parallel.tp import (
    TP_AXIS,
    make_tp_mesh,
    shard_params_tp,
    tp_shardings,
    tp_spec,
)


def _tiny_model_and_inputs():
    cfg = PixArtConfig.tiny()
    model = PixArtTransformer2D(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 4, 16, 16), jnp.float32)
    t = jnp.array([10, 500], jnp.int32)
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32), jnp.float32)
    mask = jnp.ones((2, 8), jnp.float32)
    params = model.init(jax.random.PRNGKey(2), x, t, y, mask)
    return model, params, (x, t, y, mask)


def test_tp_spec_rule():
    # column-parallel: q/k/v and ff up-projection shard the OUT dim
    assert tp_spec(("params", "blocks", "attn1", "to_q", "kernel"), (2, 32, 32), 4) == (
        None, None, TP_AXIS,
    )
    assert tp_spec(("params", "blocks", "ff", "proj_in", "kernel"), (2, 32, 128), 4) == (
        None, None, TP_AXIS,
    )
    assert tp_spec(("params", "blocks", "attn1", "to_q", "bias"), (2, 32), 4) == (
        None, TP_AXIS,
    )
    # row-parallel: out-projections shard the IN dim, bias replicated
    assert tp_spec(("params", "blocks", "attn1", "to_out", "kernel"), (2, 32, 32), 4) == (
        None, TP_AXIS, None,
    )
    assert tp_spec(("params", "blocks", "ff", "proj_out", "kernel"), (2, 128, 32), 4) == (
        None, TP_AXIS, None,
    )
    assert tp_spec(("params", "blocks", "ff", "proj_out", "bias"), (2, 32), 4) == ()
    # the MODEL-level output head and patch embed stay replicated
    assert tp_spec(("params", "proj_out", "kernel"), (32, 32), 4) == ()
    assert tp_spec(("params", "pos_embed", "proj", "kernel"), (2, 2, 4, 32), 4) == ()
    # SD3 joint-stream projections
    assert tp_spec(("params", "blocks", "add_q_proj", "kernel"), (2, 32, 32), 4) == (
        None, None, TP_AXIS,
    )
    assert tp_spec(("params", "blocks", "to_add_out", "kernel"), (2, 32, 32), 4) == (
        None, TP_AXIS, None,
    )
    # non-divisible dims degrade to replicated, never error
    assert tp_spec(("params", "blocks", "attn1", "to_q", "kernel"), (2, 32, 30), 4) == ()


def test_tp_forward_and_grad_parity():
    model, params, (x, t, y, mask) = _tiny_model_and_inputs()
    ref_out = model.apply(params, x, t, y, mask)

    mesh = make_tp_mesh(2, 4)
    shardings = tp_shardings(params, mesh)
    # the rule must actually shard the attention/ff projections
    n_sharded = sum(
        s.spec != () and any(a == TP_AXIS for a in s.spec)
        for s in jax.tree.leaves(
            shardings, is_leaf=lambda l: isinstance(l, jax.sharding.NamedSharding)
        )
    )
    assert n_sharded >= 10, f"tp rule sharded only {n_sharded} leaves"

    # committed sharded inputs carry the mesh — no context manager needed
    p_tp = shard_params_tp(params, mesh)
    out = jax.jit(model.apply)(p_tp, x, t, y, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-5)

    def loss(p):
        return jnp.mean(model.apply(p, x, t, y, mask) ** 2)

    g_ref = jax.grad(loss)(params)
    g_tp = jax.jit(jax.grad(loss))(p_tp)
    # gradients come back sharded exactly like the params
    q_grad = g_tp["params"]["blocks"]["attn1"]["to_q"]["kernel"]
    assert any(a == TP_AXIS for a in q_grad.sharding.spec)
    flat_ref = jax.tree.leaves(g_ref)
    flat_tp = jax.tree.leaves(g_tp)
    for a, b in zip(flat_ref, flat_tp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-5)


def test_tp_mesh_shape_validation():
    with pytest.raises(AssertionError):
        make_tp_mesh(3, 3)


def test_tp_fsdp_spec_rule():
    from tdm_tpu.parallel.tp import tp_fsdp_spec

    # tp kernel with ZeRO-3 layered on the remaining (largest) dim
    assert tp_fsdp_spec(
        ("params", "blocks", "attn1", "to_q", "kernel"), (2, 512, 512), 4, 2
    ) == (None, "fsdp", "tp")
    # non-tp leaf falls back to the shape-based fsdp rule
    spec = tp_fsdp_spec(
        ("params", "proj_out", "kernel"), (1024, 1024), 4, 2
    )
    assert "fsdp" in tuple(spec) and "tp" not in tuple(spec)
    # SHARED adaLN modulation heads stay REPLICATED (their fsdp-sharded
    # gradient forces a GSPMD full-remat reshard of a per-sample cotangent
    # every step — see parallel/tp.py _MODULATION_HEADS)...
    assert tp_fsdp_spec(
        ("params", "t_block", "kernel"), (1024, 1024), 4, 2
    ) == ()
    assert tp_fsdp_spec(
        ("params", "norm_out", "linear", "kernel"), (1024, 2048), 4, 2
    ) == ()
    # ...but the PER-BLOCK modulation linears keep ZeRO-3 sharding — they
    # are ~30% of SD3/CogVideoX params (tests/test_hbm_audit.py)
    assert "fsdp" in tuple(tp_fsdp_spec(
        ("params", "blocks", "norm1", "linear", "kernel"),
        (24, 1536, 9216), 1, 2,
    ))
    # small leaves stay replicated; blockwise-int8 moment shapes (which
    # break the name rule's divisibility) degrade gracefully
    assert tp_fsdp_spec(("params", "norm", "scale"), (64,), 4, 2) == ()


def test_train_cli_tp(tmp_path, monkeypatch):
    """`tdm-train --tp 2`: the CLI wires the ('data','fsdp','tp') mesh,
    combined-rule state placement, collective validation resharding, and
    the replicate-gather artifact export end to end."""
    import json
    import os

    monkeypatch.setenv("TDM_TINY_MODEL", "1")
    monkeypatch.delenv("TDM_EMBEDDING_CACHE", raising=False)
    monkeypatch.delenv("TDM_TAESD_DIR", raising=False)

    from tdm_tpu.cli import train_tdm

    out = str(tmp_path / "tp_run")
    train_tdm.main([
        "--output_dir", out,
        "--train_data_dir", "",
        "--dataset_name", "unused",
        "--train_batch_size", "1",
        "--max_train_steps", "2",
        "--checkpointing_steps", "2",
        "--tp", "2",
        "--fsdp", "2",
        # int8 no-grad forwards compose with tp (global-shape tracing →
        # collective absmax scales; test_quant.py::test_int8_under_tp)
        "--quant_forwards",
        "--learning_rate", "1e-4",
        "--seed", "0",
    ])
    out_dir = f"{out}_cfg4.5_steps900"
    metrics_file = os.path.join(out_dir, "logs", "metrics.jsonl")
    with open(metrics_file) as f:
        rows = [json.loads(line) for line in f]
    assert rows and all(abs(r["loss_student"]) < 1e6 for r in rows)
    assert os.path.exists(os.path.join(out_dir, "student.safetensors"))

    # indivisible fsdp x tp fails loudly
    with pytest.raises(ValueError, match="does not divide"):
        train_tdm.main([
            "--output_dir", str(tmp_path / "bad"),
            "--train_data_dir", "",
            "--dataset_name", "unused",
            "--tp", "3",
            "--fsdp", "3",
            "--max_train_steps", "1",
        ])


def test_tdm_train_step_on_3axis_mesh():
    """One full TDM step on ('data','fsdp','tp') = {2,2,2}: the training
    analog of megatron tp composed with ZeRO-3 and DP. Finite losses, and
    the attention kernels' state stays tp-sharded after the update."""
    import jax.sharding as jsh

    from tdm_tpu.core import schedules as sched
    from tdm_tpu.models import pixart
    from tdm_tpu.parallel.tp import make_train_mesh, tp_fsdp_shardings
    from tdm_tpu.train import optim as topt, tdm

    cfg = PixArtConfig.tiny()
    model = PixArtTransformer2D(cfg)
    latent = jnp.zeros((2, 4, 16, 16))
    t = jnp.array([500.0, 100.0])
    text = jnp.zeros((2, 8, cfg.caption_dim))
    mask = jnp.ones((2, 8), jnp.int32)
    teacher = model.init(jax.random.PRNGKey(0), latent, t, text, mask)[
        "params"
    ]

    def denoise_fn(params, x, t, cond):
        te, m = cond
        return pixart.epsilon(model.apply({"params": params}, x, t, te, m))

    config = tdm.TDMConfig(total_steps=900, num_steps=4, cfg=4.5)
    tx_s = topt.make_optimizer(1e-4)
    tx_c = topt.make_optimizer(1e-4)
    step = tdm.build_train_step(
        denoise_fn, teacher, sched.ddpm_linear(), config, tx_s, tx_c,
        sample_shape=(4, 16, 16),
    )
    state = tdm.init_state(teacher, teacher, tx_s, tx_c, use_ema=True)

    mesh = make_train_mesh(2, 2, 2)
    state = jax.device_put(
        state, tp_fsdp_shardings(state, mesh, min_size=2**10)
    )
    teacher_sh = jax.device_put(
        teacher, tp_fsdp_shardings(teacher, mesh, min_size=2**10)
    )
    bsh = jsh.NamedSharding(mesh, jsh.PartitionSpec("data"))
    b = 4
    text = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (b, 8, cfg.caption_dim)),
        bsh,
    )
    mask = jax.device_put(jnp.ones((b, 8), jnp.int32), bsh)
    cond = (text, mask)
    uncond = (jax.device_put(jnp.zeros_like(text), bsh), mask)

    new_state, metrics = jax.jit(step)(
        state, jax.random.PRNGKey(2), cond, uncond, teacher_sh
    )
    assert bool(jnp.isfinite(metrics.loss_student))
    assert bool(jnp.isfinite(metrics.loss_critic))
    q = new_state.student["blocks"]["attn1"]["to_q"]["kernel"]
    assert any(a == TP_AXIS for a in q.sharding.spec)


def test_tp_forward_parity_unet():
    """The name-driven rule reaches the SD15 UNet's transformer blocks
    (to_q/.../ff) while its conv stacks and the 1x1 spatial-transformer
    proj_in/proj_out (non-ff parents) stay replicated."""
    from tdm_tpu.models import unet_sd15

    cfg = unet_sd15.UNetConfig.tiny()
    model = unet_sd15.UNet2DCondition(cfg)
    lat = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16))
    t = jnp.array([10.0, 500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 6, cfg.context_dim))
    mask = jnp.ones((2, 6), jnp.int32)
    params = model.init(jax.random.PRNGKey(2), lat, t, ctx, mask)
    ref = model.apply(params, lat, t, ctx, mask)

    mesh = make_tp_mesh(2, 4)
    shardings = tp_shardings(params, mesh)
    n_sharded = sum(
        any(a == TP_AXIS for a in s.spec) for s in jax.tree.leaves(shardings)
    )
    assert n_sharded >= 6, f"tp rule sharded only {n_sharded} UNet leaves"
    out = jax.jit(model.apply)(
        jax.device_put(params, shardings), lat, t, ctx, mask
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_activation_constrain_helper():
    """parallel/mesh.py constrain(): resolves axis names against the
    activation_sharding() mesh, drops absent/non-dividing axes, and is a
    no-op outside the context — the guard rails that make it safe to call
    unconditionally inside model code."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from tdm_tpu.parallel import mesh as pmesh

    x = jnp.ones((4, 6, 8))
    # outside the context: identity (same object, no constraint inserted)
    assert pmesh.constrain(x, pmesh.BATCH, None, None) is x

    devs = np.array(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("data", "fsdp", "tp"))
    with pmesh.activation_sharding(mesh):
        out = jax.jit(
            lambda v: pmesh.constrain(v, pmesh.BATCH, "tp", None)
        )(x)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
        # non-dividing dims degrade to None instead of erroring:
        # dim0=5 does not divide data·fsdp=4 (dropped); dim1=6 divides
        # tp=2 (kept) — the call must still succeed and preserve values
        y = jnp.ones((5, 6))
        out2 = jax.jit(
            lambda v: pmesh.constrain(v, pmesh.BATCH, "tp")
        )(y)
        np.testing.assert_array_equal(np.asarray(out2), np.asarray(y))
        # unknown axis names are ignored, not an error
        out3 = pmesh.constrain(x, "nonexistent_axis", None, None)
        np.testing.assert_array_equal(np.asarray(out3), np.asarray(x))
    # context restored
    assert pmesh.constrain(x, pmesh.BATCH, None, None) is x
