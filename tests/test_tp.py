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
