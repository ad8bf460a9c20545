"""Pipeline parallelism (parallel/pp.py): the GPipe microbatch schedule
over the scan-stacked `blocks` layer axis must reproduce the plain
scan-over-layers forward exactly (up to float reassociation) — forward AND
gradients — on the 8-virtual-device CPU mesh, alone and combined with data
parallelism. Beyond-reference extension (the reference's distributed story
stops at DDP+ZeRO-3, /root/reference/src/main.py:141-160,321-323)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from tdm_tpu.models import pixart
from tdm_tpu.parallel import pp as pp_lib


@pytest.fixture(scope="module")
def setup():
    cfg = dataclasses.replace(pixart.PixArtConfig.tiny(), num_layers=4)
    model = pixart.PixArtTransformer2D(cfg=cfg)
    b = 8
    latent = jax.random.normal(jax.random.PRNGKey(0), (b, 4, 16, 16))
    t = jnp.linspace(10.0, 900.0, b)
    text = jax.random.normal(jax.random.PRNGKey(1), (b, 8, cfg.caption_dim))
    mask = np.ones((b, 8), np.int32)
    mask[1, 5:] = 0  # ragged cross-attention mask
    mask[3, 2:] = 0
    mask = jnp.asarray(mask)
    params = model.init(jax.random.PRNGKey(2), latent, t, text, mask)[
        "params"
    ]
    ref = model.apply({"params": params}, latent, t, text, mask)
    return model, params, (latent, t, text, mask), ref


def _pp_mesh(n_pp, n_data=None):
    devs = jax.devices()
    if n_data:
        return Mesh(
            np.array(devs[: n_data * n_pp]).reshape(n_data, n_pp),
            ("data", "pp"),
        )
    return Mesh(np.array(devs[:n_pp]).reshape(n_pp), ("pp",))


def test_pp_forward_matches_plain(setup):
    model, params, inputs, ref = setup
    fwd = pixart.make_pp_forward(model, _pp_mesh(4), num_microbatches=4)
    out = jax.jit(fwd)(params, *inputs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_pp_microbatch_count_one_and_many(setup):
    """The schedule is M-invariant: M=1 (no pipelining inside a shard,
    pure layer sharding) and M=8 (fully unrolled microbatches) both
    reproduce the reference."""
    model, params, inputs, ref = setup
    mesh = _pp_mesh(4)
    for m in (1, 8):
        out = jax.jit(
            pixart.make_pp_forward(model, mesh, num_microbatches=m)
        )(params, *inputs)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5,
            err_msg=f"num_microbatches={m}",
        )


def test_pp_gradients_match_plain(setup):
    """Differentiating through the pipeline (ppermute rotation, bubble
    masking, masked psum broadcast) must give the plain forward's grads —
    the property that makes PP usable for TDM training."""
    model, params, inputs, ref = setup
    fwd = pixart.make_pp_forward(model, _pp_mesh(4), num_microbatches=2)

    def loss_pp(p):
        return jnp.mean(fwd(p, *inputs) ** 2)

    def loss_ref(p):
        return jnp.mean(model.apply({"params": p}, *inputs) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(params)
    g_ref = jax.jit(jax.grad(loss_ref))(params)
    flat_pp = jax.tree_util.tree_leaves_with_path(g_pp)
    flat_ref = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(g_ref)
    )
    # floor the per-leaf scale at 1e-3 of the global grad magnitude:
    # attention to_k biases have mathematically ZERO gradient (softmax is
    # invariant to the per-query constant q·b they add to every logit), so
    # their reference grads are pure float noise ~1e-10 and a purely
    # per-leaf relative check divides noise by noise.
    gmax = max(
        float(jnp.max(jnp.abs(v))) for v in flat_ref.values()
    )
    for path, a in flat_pp:
        b = flat_ref[jax.tree_util.keystr(path)]
        scale = float(jnp.max(jnp.abs(b))) + 1e-3 * gmax
        err = float(jnp.max(jnp.abs(a - b))) / scale
        assert err < 2e-4, f"{jax.tree_util.keystr(path)}: rel err {err}"


def test_pp_combined_with_data_parallelism(setup):
    model, params, inputs, ref = setup
    fwd = pixart.make_pp_forward(
        model, _pp_mesh(4, n_data=2), num_microbatches=2, data_axis="data"
    )
    out = jax.jit(fwd)(params, *inputs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_pp_param_shardings_place_blocks_only(setup):
    model, params, inputs, _ = setup
    mesh = _pp_mesh(4)
    sh = pp_lib.pp_param_shardings(params, mesh)
    assert sh["blocks"]["attn1"]["to_q"]["kernel"].spec == P("pp")
    assert sh["proj_out"]["kernel"].spec == P()
    # placed params still work through the pipelined forward
    placed = jax.device_put(params, sh)
    fwd = pixart.make_pp_forward(model, mesh, num_microbatches=4)
    out = jax.jit(fwd)(placed, *inputs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(setup[3]), atol=2e-5, rtol=2e-5
    )


def test_pp_composes_with_fsdp(setup):
    """PP × FSDP on a ('data','pp','fsdp') mesh: stacked block leaves shard
    layer-axis over 'pp' AND their largest remaining dim over 'fsdp'
    (pp_fsdp_shardings); the fsdp axis stays AUTOMATIC in the pp
    shard_map, so GSPMD inserts the ZeRO-3 gathers inside each stage.
    Forward and grads must still match the plain forward."""
    model, params, inputs, ref = setup
    devs = jax.devices()
    mesh = Mesh(
        np.array(devs).reshape(2, 2, 2), ("data", "pp", "fsdp")
    )
    sh = pp_lib.pp_fsdp_shardings(params, mesh, min_size=2**4)
    # the rule actually engages: a block kernel shards over both axes
    assert sh["blocks"]["ff"]["proj_in"]["kernel"].spec[0] == "pp"
    assert "fsdp" in jax.tree_util.tree_flatten(
        tuple(sh["blocks"]["ff"]["proj_in"]["kernel"].spec)
    )[0]
    placed = jax.device_put(params, sh)
    fwd = pixart.make_pp_forward(
        model, mesh, num_microbatches=2, data_axis="data"
    )
    out = jax.jit(fwd)(placed, *inputs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )

    def loss_pp(p):
        return jnp.mean(fwd(p, *inputs) ** 2)

    def loss_ref(p):
        return jnp.mean(model.apply({"params": p}, *inputs) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(placed)
    g_ref = jax.jit(jax.grad(loss_ref))(params)
    flat_ref = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(g_ref)
    )
    gmax = max(float(jnp.max(jnp.abs(v))) for v in flat_ref.values())
    for path, a in jax.tree_util.tree_leaves_with_path(g_pp):
        b = flat_ref[jax.tree_util.keystr(path)]
        scale = float(jnp.max(jnp.abs(b))) + 1e-3 * gmax
        err = float(jnp.max(jnp.abs(np.asarray(a) - np.asarray(b)))) / scale
        assert err < 2e-4, f"{jax.tree_util.keystr(path)}: rel err {err}"


@pytest.fixture(scope="module", params=[False, True], ids=["sincos", "rope"])
def cog_setup(request):
    """Tiny CogVideoX (both position variants — RoPE rides the schedule's
    batch-independent `static` slot) + its monolithic reference output."""
    from tdm_tpu.models import cogvideox as cog

    cfg = dataclasses.replace(
        cog.CogVideoXConfig.tiny(use_rotary=request.param), num_layers=4
    )
    model = cog.CogVideoXTransformer3D(cfg=cfg)
    b = 8
    latent = jax.random.normal(
        jax.random.PRNGKey(0),
        (b, cfg.in_channels, cfg.sample_frames, cfg.sample_h, cfg.sample_w),
    )
    t = jnp.linspace(10.0, 900.0, b)
    text = jax.random.normal(
        jax.random.PRNGKey(1), (b, cfg.max_text_len, cfg.text_dim)
    )
    params = model.init(jax.random.PRNGKey(2), latent, t, text)["params"]
    ref = model.apply({"params": params}, latent, t, text)
    return cog, model, params, (latent, t, text), ref


def test_pp_cogvideox_forward_matches_plain(cog_setup):
    cog, model, params, inputs, ref = cog_setup
    fwd = cog.make_pp_forward(model, _pp_mesh(4), num_microbatches=2)
    out = jax.jit(fwd)(params, *inputs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5
    )


def test_pp_cogvideox_gradients_match_plain(cog_setup):
    cog, model, params, inputs, ref = cog_setup
    fwd = cog.make_pp_forward(model, _pp_mesh(4), num_microbatches=2)

    def loss_pp(p):
        return jnp.mean(fwd(p, *inputs) ** 2)

    def loss_ref(p):
        return jnp.mean(model.apply({"params": p}, *inputs) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(params)
    g_ref = jax.jit(jax.grad(loss_ref))(params)
    flat_ref = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(g_ref)
    )
    gmax = max(float(jnp.max(jnp.abs(v))) for v in flat_ref.values())
    for path, a in jax.tree_util.tree_leaves_with_path(g_pp):
        b = flat_ref[jax.tree_util.keystr(path)]
        scale = float(jnp.max(jnp.abs(b))) + 1e-3 * gmax
        err = float(jnp.max(jnp.abs(a - b))) / scale
        assert err < 2e-4, f"{jax.tree_util.keystr(path)}: rel err {err}"


def test_pp_cogvideox_rejects_sp_combination():
    from tdm_tpu.models import cogvideox as cog

    cfg = dataclasses.replace(
        cog.CogVideoXConfig.tiny(), sequence_parallel_axis="sp"
    )
    with pytest.raises(ValueError, match="sequence_parallel_axis"):
        cog.make_pp_forward(
            cog.CogVideoXTransformer3D(cfg=cfg), _pp_mesh(4)
        )


def test_train_cli_pipeline_parallel(tmp_path, monkeypatch):
    """`--pp 2` trains the tiny PixArt end to end through the CLI: the
    ('data','pp') mesh, pp_param_shardings placement of the full TrainState
    (student/critic/EMA/optimizer + teacher), the pipelined denoise_fn
    inside the jitted TDM step, checkpointing, and final artifacts."""
    import json
    import os

    monkeypatch.setenv("TDM_TINY_MODEL", "1")
    monkeypatch.delenv("TDM_EMBEDDING_CACHE", raising=False)
    monkeypatch.delenv("TDM_TAESD_DIR", raising=False)

    from tdm_tpu.cli import train_tdm

    out = str(tmp_path / "run")
    argv = [
        "--output_dir", out,
        "--train_data_dir", "",
        "--dataset_name", "unused",
        "--train_batch_size", "2",
        "--max_train_steps", "2",
        "--checkpointing_steps", "2",
        "--learning_rate", "1e-4",
        "--cfg", "4.5",
        "--total_steps", "900",
        "--seed", "0",
        "--pp", "2",
    ]
    train_tdm.main(argv)

    out_dir = f"{out}_cfg4.5_steps900"
    metrics_file = os.path.join(out_dir, "logs", "metrics.jsonl")
    with open(metrics_file) as f:
        rows = [json.loads(line) for line in f]
    assert rows and all(abs(r["loss_student"]) < 1e6 for r in rows)
    assert os.path.exists(
        os.path.join(out_dir, "student.safetensors")
    )


def test_train_cli_pp_with_fsdp_and_tp(tmp_path, monkeypatch):
    """`--pp 2 --fsdp 2 --tp 2` — the full composition matrix in ONE
    jitted TDM step on the ('data','pp','fsdp','tp') 1×2×2×2 mesh: layer
    stack GPipe-pipelined over 'pp' (manual), per-stage slices
    megatron-sharded over 'tp' and ZeRO-3-sharded over 'fsdp' (both
    automatic — GSPMD inserts the psums/gathers), batch rows over
    data × fsdp."""
    import json
    import os

    monkeypatch.setenv("TDM_TINY_MODEL", "1")
    monkeypatch.delenv("TDM_EMBEDDING_CACHE", raising=False)
    monkeypatch.delenv("TDM_TAESD_DIR", raising=False)

    from tdm_tpu.cli import train_tdm

    out = str(tmp_path / "run_ppfsdptp")
    train_tdm.main([
        "--output_dir", out,
        "--train_data_dir", "",
        "--dataset_name", "unused",
        "--train_batch_size", "2",
        "--max_train_steps", "1",
        "--checkpointing_steps", "5",
        "--learning_rate", "1e-4",
        "--seed", "0",
        "--pp", "2",
        "--fsdp", "2",
        "--tp", "2",
    ])
    out_dir = f"{out}_cfg4.5_steps900"
    with open(os.path.join(out_dir, "logs", "metrics.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    assert rows and all(abs(r["loss_student"]) < 1e6 for r in rows)
    assert os.path.exists(os.path.join(out_dir, "student.safetensors"))


def test_pp_tp_fsdp_shardings_rule(setup):
    """The combined rule: layer axis → 'pp', column/row kernels tp-sharded
    on the per-layer tail (megatron names), ZeRO-3 on a remaining dim."""
    _, params, _, _ = setup
    devs = jax.devices()
    mesh = Mesh(np.array(devs).reshape(2, 2, 2), ("data", "pp", "tp"))
    sh = pp_lib.pp_tp_fsdp_shardings(params, mesh, min_size=2**4)
    # column-parallel q: out dim over tp; row-parallel out-proj: in dim
    assert sh["blocks"]["attn1"]["to_q"]["kernel"].spec == P("pp", None, "tp")
    assert sh["blocks"]["attn1"]["to_out"]["kernel"].spec == P(
        "pp", "tp", None
    )
    # non-block leaves follow the plain rule (no pp)
    assert "pp" not in jax.tree_util.tree_flatten(
        tuple(sh["proj_out"]["kernel"].spec)
    )[0]


def test_pp_composes_with_tp(setup):
    """PP × TP on a ('data','pp','tp') mesh: layer axis GPipe-manual over
    'pp', the per-layer megatron kernels on an AUTOMATIC 'tp' axis —
    GSPMD inserts the per-layer psums inside each stage. Forward AND
    grads must match the plain unsharded forward."""
    model, params, inputs, ref = setup
    devs = jax.devices()
    mesh = Mesh(np.array(devs).reshape(2, 2, 2), ("data", "pp", "tp"))
    placed = jax.device_put(
        params, pp_lib.pp_tp_fsdp_shardings(params, mesh, min_size=2**4)
    )
    fwd = pixart.make_pp_forward(
        model, mesh, num_microbatches=2, data_axis="data"
    )
    out = jax.jit(fwd)(placed, *inputs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )

    def loss_pp(p):
        return jnp.mean(fwd(p, *inputs) ** 2)

    def loss_ref(p):
        return jnp.mean(model.apply({"params": p}, *inputs) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(placed)
    g_ref = jax.jit(jax.grad(loss_ref))(params)
    flat_ref = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(g_ref)
    )
    gmax = max(float(jnp.max(jnp.abs(v))) for v in flat_ref.values())
    for path, a in jax.tree_util.tree_leaves_with_path(g_pp):
        b = flat_ref[jax.tree_util.keystr(path)]
        scale = float(jnp.max(jnp.abs(b))) + 1e-3 * gmax
        err = float(jnp.max(jnp.abs(np.asarray(a) - np.asarray(b)))) / scale
        assert err < 2e-4, f"{jax.tree_util.keystr(path)}: rel err {err}"


def test_train_cli_pp_flag_validation():
    from tdm_tpu.cli import train_tdm

    base = [
        "--output_dir", "/tmp/unused-pp",
        "--train_data_dir", "",
        "--dataset_name", "unused",
        "--max_train_steps", "1",
    ]
    with pytest.raises(ValueError, match="model_family pixart"):
        train_tdm.main(base + ["--pp", "2", "--model_family", "sd15"])
    with pytest.raises(ValueError, match="quant_forwards"):
        train_tdm.main(base + ["--pp", "2", "--quant_forwards"])


def test_pp_validation_errors(setup):
    model, params, inputs, _ = setup
    mesh = _pp_mesh(4)
    # microbatches must divide the per-device batch (8 rows, M=3)
    with pytest.raises(ValueError, match="not divisible"):
        jax.jit(
            pixart.make_pp_forward(model, mesh, num_microbatches=3)
        )(params, *inputs)
    # layer count must divide the pp axis (4 layers, pp=3 is not a mesh we
    # can build from 8 devices evenly — use 4 layers on... use a 3-layer
    # model on pp=4 instead)
    cfg3 = dataclasses.replace(pixart.PixArtConfig.tiny(), num_layers=3)
    m3 = pixart.PixArtTransformer2D(cfg=cfg3)
    p3 = m3.init(jax.random.PRNGKey(0), *inputs)["params"]
    with pytest.raises(ValueError, match="layers"):
        jax.jit(pixart.make_pp_forward(m3, mesh, num_microbatches=2))(
            p3, *inputs
        )
    # missing pp axis
    with pytest.raises(ValueError, match="no 'pp' axis"):
        pixart.make_pp_forward(
            model, Mesh(np.array(jax.devices()[:4]).reshape(4), ("data",))
        )
    # scan_layers=False has no stacked axis to shard
    cfg_u = dataclasses.replace(
        pixart.PixArtConfig.tiny(), scan_layers=False
    )
    with pytest.raises(ValueError, match="scan_layers"):
        pixart.make_pp_forward(
            pixart.PixArtTransformer2D(cfg=cfg_u), mesh
        )
