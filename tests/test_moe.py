"""Mixture-of-Experts feed-forward + expert parallelism (models/moe.py).

The reference has no MoE anywhere (SURVEY.md §2 — dense denoisers only);
this is the 'ep' mesh-axis extension. Tests pin: dense equivalence in the
degenerate config, capacity-drop semantics, the Switch aux loss, gradient
flow through routing, expert-parallel parity on the 8-device CPU mesh, and
the MoE-PixArt config knob end-to-end (forward + one TDM-style grad step).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tdm_tpu.models import moe as moe_lib
from tdm_tpu.models import pixart
from tdm_tpu.models.layers import FeedForward
from tdm_tpu.models.moe import MoEFeedForward, ep_shardings, moe_aux_loss


def _init(mod, x, key=0):
    return mod.init(jax.random.PRNGKey(key), x)["params"]


def test_single_expert_equals_dense_mlp():
    """E=1, k=1, capacity ≥ T routes every token to the one expert with
    gate 1.0 — numerically the dense FeedForward with the same weights."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 16))
    m = MoEFeedForward(num_experts=1, top_k=1, mult=2, capacity_factor=1.0)
    p = _init(m, x)
    dense = FeedForward(mult=2, activation="gelu-approximate")
    dp = {
        "proj_in": {
            "kernel": p["experts_in"][0],
            "bias": p["experts_in_bias"][0],
        },
        "proj_out": {
            "kernel": p["experts_out"][0],
            "bias": p["experts_out_bias"][0],
        },
    }
    out_moe = m.apply({"params": p}, x)
    out_dense = dense.apply({"params": dp}, x)
    np.testing.assert_allclose(
        np.asarray(out_moe), np.asarray(out_dense), atol=1e-5
    )


def test_output_shape_dtype_and_finiteness():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 16), jnp.bfloat16)
    m = MoEFeedForward(num_experts=4, top_k=2, mult=2)
    p = _init(m, x.astype(jnp.float32))
    out = jax.jit(lambda p, x: m.apply({"params": p}, x))(p, x)
    assert out.shape == x.shape and out.dtype == x.dtype
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_capacity_drops_tokens_to_zero():
    """capacity_factor small enough that most tokens overflow: dropped
    tokens must contribute EXACTLY zero (residual carries them), kept
    tokens must be nonzero."""
    t = 16
    x = jax.random.normal(jax.random.PRNGKey(2), (1, t, 8))
    # one expert, cap = ceil(1*16/1 * 1/8) -> force cap=2 via factor
    m = MoEFeedForward(
        num_experts=1, top_k=1, mult=2, capacity_factor=2.0 / t
    )
    p = _init(m, x)
    out = m.apply({"params": p}, x)[0]  # [T, D]
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    assert (norms[:2] > 0).all()  # first 2 tokens claim the capacity
    np.testing.assert_allclose(norms[2:], 0.0, atol=1e-7)


def test_aux_loss_sowed_and_balanced_router_lowers_it():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 8))
    m = MoEFeedForward(num_experts=4, top_k=2, mult=1)
    p = _init(m, x)
    _, vs = m.apply({"params": p}, x, mutable=["losses"])
    aux = moe_aux_loss(vs)
    assert np.isfinite(float(aux))
    # perfectly uniform router ⇒ aux = E · Σ_e (1/E)(1/E) · ... = 1 exactly
    p_uniform = jax.tree.map(lambda a: a, p)
    p_uniform["router"]["kernel"] = jnp.zeros_like(p["router"]["kernel"])
    _, vs_u = m.apply({"params": p_uniform}, x, mutable=["losses"])
    np.testing.assert_allclose(float(moe_aux_loss(vs_u)), 1.0, atol=1e-5)
    # a maximally-collapsed router (all mass on expert 0) is strictly worse
    k = jnp.zeros_like(p["router"]["kernel"]).at[:, 0].set(50.0)
    p_bad = dict(p, router={"kernel": k})
    _, vs_b = m.apply({"params": p_bad}, x, mutable=["losses"])
    assert float(moe_aux_loss(vs_b)) > float(moe_aux_loss(vs_u))


def test_gradients_flow_through_experts_and_router():
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8))
    m = MoEFeedForward(num_experts=4, top_k=2, mult=1)
    p = _init(m, x)

    def loss(p):
        return jnp.sum(m.apply({"params": p}, x) ** 2)

    g = jax.grad(loss)(p)
    for name in ("experts_in", "experts_out", "router"):
        leaf = g[name]["kernel"] if name == "router" else g[name]
        assert float(jnp.max(jnp.abs(jax.tree.leaves(leaf)[0]))) > 0, name


def test_invalid_top_k_raises():
    x = jnp.zeros((1, 4, 8))
    with pytest.raises(ValueError):
        MoEFeedForward(num_experts=2, top_k=3).init(
            jax.random.PRNGKey(0), x
        )


def test_expert_parallel_matches_single_device():
    """ep_shardings over a ('data','ep') mesh: GSPMD-sharded forward must
    equal the unsharded one (annotation only, no model changes)."""
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "ep"))
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 8, 16))
    m = MoEFeedForward(num_experts=8, top_k=2, mult=2)
    p = _init(m, x)
    ref = m.apply({"params": p}, x)

    shardings = ep_shardings(p, mesh)
    # every expert leaf sharded on 'ep' (axis 0), router replicated
    assert shardings["experts_in"].spec[0] == "ep"
    assert shardings["experts_out"].spec[0] == "ep"
    assert "ep" not in str(shardings["router"]["kernel"].spec)
    p_sh = jax.device_put(p, shardings)
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data")))
    with mesh:
        out = jax.jit(lambda p, x: m.apply({"params": p}, x))(p_sh, x_sh)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5
    )


def test_moe_pixart_forward_and_grad_step():
    """The PixArtConfig knob: a tiny MoE DiT runs the scan-over-layers
    forward (losses collection stacks to [L]) and takes a grad step."""
    import dataclasses

    cfg = dataclasses.replace(
        pixart.PixArtConfig.tiny(), moe_experts=4, moe_top_k=2
    )
    model = pixart.PixArtTransformer2D(cfg=cfg)
    lat = jnp.zeros((2, 4, 16, 16))
    t = jnp.zeros((2,))
    text = jnp.zeros((2, 6, cfg.caption_dim))
    mask = jnp.ones((2, 6), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), lat, t, text, mask)["params"]
    # expert leaves live under blocks with a leading layer axis
    assert params["blocks"]["ff"]["experts_in"].shape[:2] == (
        cfg.num_layers, 4,
    )
    out, vs = model.apply(
        {"params": params}, lat, t, text, mask, mutable=["losses"]
    )
    assert out.shape == (2, 8, 16, 16)
    aux = moe_aux_loss(vs)
    assert np.isfinite(float(aux)) and float(aux) > 0

    def loss(p):
        o = model.apply({"params": p}, lat + 0.1, t + 500.0, text, mask)
        return jnp.mean(o[:, :4] ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.max(jnp.abs(g["blocks"]["ff"]["experts_in"]))) > 0

    # ep sharding on the stacked layout places axis 1
    devs = np.array(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devs, ("data", "ep"))
    sh = ep_shardings(params, mesh)
    spec = sh["blocks"]["ff"]["experts_in"].spec
    assert len(spec) >= 2 and spec[0] is None and spec[1] == "ep"
    ref = model.apply({"params": params}, lat, t, text, mask)
    p_sh = jax.device_put(params, sh)
    with mesh:
        out_sh = jax.jit(
            lambda p: model.apply({"params": p}, lat, t, text, mask)
        )(p_sh)
    np.testing.assert_allclose(
        np.asarray(out_sh, np.float32), np.asarray(ref, np.float32), atol=3e-5
    )


def test_train_cli_expert_parallel(tmp_path, monkeypatch):
    """`--moe_experts 4 --ep 2` distills a tiny MoE PixArt end to end
    through the CLI: ('data','fsdp','ep') mesh, expert stacks of the full
    TrainState (student/critic/EMA/optimizer + teacher) sharded over 'ep'
    via moe.ep_shardings, the jitted TDM step, and final artifacts."""
    import json
    import os

    monkeypatch.setenv("TDM_TINY_MODEL", "1")
    monkeypatch.delenv("TDM_EMBEDDING_CACHE", raising=False)
    monkeypatch.delenv("TDM_TAESD_DIR", raising=False)

    from tdm_tpu.cli import train_tdm

    out = str(tmp_path / "run_moe")
    train_tdm.main([
        "--output_dir", out,
        "--train_data_dir", "",
        "--dataset_name", "unused",
        "--train_batch_size", "2",
        "--max_train_steps", "2",
        "--checkpointing_steps", "5",
        "--learning_rate", "1e-4",
        "--cfg", "4.5",
        "--total_steps", "900",
        "--seed", "0",
        "--moe_experts", "4",
        "--ep", "2",
        "--max_devices", "4",
    ])
    out_dir = f"{out}_cfg4.5_steps900"
    with open(os.path.join(out_dir, "logs", "metrics.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    assert rows and all(abs(r["loss_student"]) < 1e6 for r in rows)
    assert os.path.exists(os.path.join(out_dir, "student.safetensors"))


def test_train_cli_moe_flag_validation():
    from tdm_tpu.cli import train_tdm

    base = [
        "--output_dir", "/tmp/unused_moe_validation",
        "--train_data_dir", "",
        "--dataset_name", "unused",
        "--max_train_steps", "1",
    ]
    with pytest.raises(ValueError, match="--ep requires"):
        train_tdm.main(base + ["--ep", "2"])
    with pytest.raises(ValueError, match="fsdp only"):
        train_tdm.main(
            base + ["--moe_experts", "4", "--ep", "2", "--tp", "2"]
        )
    with pytest.raises(ValueError, match="not divisible"):
        train_tdm.main(base + ["--moe_experts", "3", "--ep", "2"])
    with pytest.raises(ValueError, match="pixart-family"):
        train_tdm.main(
            base + ["--moe_experts", "4", "--model_family", "sd15"]
        )


def test_routing_matches_bruteforce_reference():
    """The einsum dispatch/combine must match an independent per-token
    python reference implementing the same GShard rules (top-k by prob,
    slot-major capacity priority, gate renormalization, drops) — at a
    capacity factor low enough that a third of the slots drop."""
    import math

    rng = np.random.default_rng(0)
    b, s, d, e, k = 2, 12, 8, 4, 2
    x = jnp.asarray(rng.normal(size=(b, s, d)), jnp.float32)
    m = MoEFeedForward(num_experts=e, top_k=k, mult=2, capacity_factor=0.6)
    p = _init(m, x, key=1)
    out = np.asarray(m.apply({"params": p}, x))

    xt = np.asarray(x).reshape(-1, d)
    t_total = xt.shape[0]
    logits = xt @ np.asarray(p["router"]["kernel"])
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    topk_idx = np.argsort(-probs, axis=-1)[:, :k]
    topk_val = np.take_along_axis(probs, topk_idx, axis=-1)
    topk_val /= np.maximum(topk_val.sum(-1, keepdims=True), 1e-9)
    cap = max(1, min(math.ceil(0.6 * k * t_total / e), t_total))
    counts = np.zeros(e, int)
    assign = []
    for slot in range(k):  # slot-major priority
        for tok in range(t_total):
            ex = int(topk_idx[tok, slot])
            if counts[ex] < cap:
                assign.append((tok, ex, topk_val[tok, slot]))
                counts[ex] += 1
    assert 0 < len(assign) < k * t_total  # some kept, some dropped

    w_in = np.asarray(p["experts_in"])
    b_in = np.asarray(p["experts_in_bias"])
    w_out = np.asarray(p["experts_out"])
    b_out = np.asarray(p["experts_out_bias"])

    def gelu(v):
        return 0.5 * v * (
            1 + np.tanh(np.sqrt(2 / np.pi) * (v + 0.044715 * v**3))
        )

    ref = np.zeros_like(xt)
    for tok, ex, gate in assign:
        h = gelu(xt[tok] @ w_in[ex] + b_in[ex])
        ref[tok] += gate * (h @ w_out[ex] + b_out[ex])
    np.testing.assert_allclose(
        out, ref.reshape(b, s, d), atol=2e-5
    )


def test_ep_shardings_rejects_indivisible_expert_count():
    """Silently replicating the expert stacks would be a run with NO expert
    parallelism — ep_shardings must raise instead (quantized 1-D optimizer
    mirrors still fall through to the base rule)."""
    devs = np.array(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devs, ("data", "ep"))
    bad = {"experts_in": jnp.zeros((6, 8, 16))}  # 6 experts, ep=4
    with pytest.raises(ValueError, match="not divisible"):
        ep_shardings(bad, mesh)
    # 1-D mirrors (blockwise-int8 values/scales) don't expose the expert
    # axis -> base rule, no raise
    flat = {"blocks": {"ff": {"experts_in": jnp.zeros((1536,), jnp.int8)}}}
    sh = ep_shardings(flat, mesh)
    assert "ep" not in str(sh["blocks"]["ff"]["experts_in"].spec)


def test_moe_aux_loss_ignores_foreign_losses_entries():
    vs = {
        "losses": {
            "blocks": {"ff": {"moe_aux": (jnp.asarray([1.0, 2.0]),)}},
            "other": {"z_loss": (jnp.asarray(100.0),)},
        }
    }
    np.testing.assert_allclose(float(moe_aux_loss(vs)), 3.0)
