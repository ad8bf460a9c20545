"""Blockwise-int8 AdamW (the bitsandbytes AdamW8bit equivalent): state is
genuinely int8, quantization round-trips tightly, and optimization
trajectories track fp32 AdamW closely on a convex problem."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tdm_tpu.train import optim as topt
from tdm_tpu.train.optim import _q8_dequantize, _q8_quantize


def test_q8_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (1000,)) * jnp.logspace(
        -3, 1, 1000
    )
    q = _q8_quantize(x)
    assert q.values.dtype == jnp.int8
    back = _q8_dequantize(q, x.shape)
    # sqrt-companded code: RELATIVE error shrinks for small magnitudes
    # (error of u² with |Δu| ≤ 1/254 → |Δx| ≤ (2√(|x|/s)+1/254)·s/254)
    blocks = jnp.pad(x, (0, (-x.size) % 256)).reshape(-1, 256)
    s_blk = jnp.max(jnp.abs(blocks), axis=1, keepdims=True)
    bound = (2 * jnp.sqrt(jnp.abs(blocks) / s_blk) + 1 / 254) * s_blk / 254
    err = jnp.abs(back - x)
    err_blocks = jnp.pad(err, (0, (-err.size) % 256)).reshape(-1, 256)
    assert float(jnp.max(err_blocks - bound)) <= 1e-6
    # and small entries keep good relative accuracy
    small = jnp.abs(x) < 0.01 * float(jnp.abs(x).max())
    rel = jnp.abs(back - x) / jnp.maximum(jnp.abs(x), 1e-8)
    assert float(jnp.median(rel[small])) < 0.2


def test_adam8bit_state_is_int8():
    params = {"w": jnp.zeros((128, 64)), "tiny": jnp.zeros((4,))}
    tx = topt.adam8bit(1e-3)
    state = tx.init(params)
    assert state.mu["w"].values.dtype == jnp.int8
    assert state.mu["tiny"].dtype == jnp.float32  # below min size: excluded
    # ~8.25 bits/param: int8 values + fp32 scale per 256 elements
    n = 128 * 64
    bytes_used = state.mu["w"].values.size + state.mu["w"].scales.size * 4
    assert bytes_used < n * 1.1


def test_adam8bit_tracks_fp32_adamw():
    """Minimize ||Wx - y||² with both optimizers; the int8 variant must
    reach a comparable loss (quantization noise ≪ optimization signal)."""
    rng = np.random.default_rng(0)
    x_data = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    w_true = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    y = x_data @ w_true

    def loss_fn(w):
        return jnp.mean((x_data @ w - y) ** 2)

    def run(tx, steps=300):
        w = {"w": jnp.zeros((32, 16))}
        opt = tx.init(w)

        @jax.jit
        def step(w, opt):
            loss, g = jax.value_and_grad(lambda p: loss_fn(p["w"]))(w)
            upd, opt = tx.update(g, opt, w)
            return optax.apply_updates(w, upd), opt, loss

        for _ in range(steps):
            w, opt, loss = step(w, opt)
        return float(loss)

    loss8 = run(topt.adam8bit(3e-2, weight_decay=0.0, min_quantize_size=1))
    loss32 = run(optax.adamw(3e-2, weight_decay=0.0))
    assert loss8 < max(2.5 * loss32, 1e-2), (loss8, loss32)


def test_adam8bit_in_make_optimizer_and_tdm_state():
    """eight_bit plugs into the standard chain and the TrainState pytree
    (checkpointable, donate-able)."""
    tx = topt.make_optimizer(1e-4, eight_bit=True)
    params = {"k": jnp.ones((512, 8))}
    opt = tx.init(params)
    g = {"k": jnp.full((512, 8), 0.1)}
    upd, opt2 = tx.update(g, opt, params)
    p2 = optax.apply_updates(params, upd)
    assert np.isfinite(np.asarray(p2["k"])).all()
    assert not np.allclose(np.asarray(p2["k"]), np.asarray(params["k"]))
    # jit + donate works on the quantized state
    @jax.jit
    def step(params, opt):
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt

    p3, opt3 = step(p2, opt2)
    assert np.isfinite(np.asarray(p3["k"])).all()
