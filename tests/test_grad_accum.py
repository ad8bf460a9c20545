"""Gradient accumulation inside the jitted TDM step.

The reference accumulates via `accelerator.accumulate(unet, unet_fake)`
(`/root/reference/src/main.py:94,441`): grads average over N micro-batches
and both optimizers fire once per window. Here that is `optax.MultiSteps`
wrapping both txs (train/optim.py make_optimizer(accumulation_steps=N)) so
the whole mechanism stays inside the one compiled step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tdm_tpu.core import schedules as sched
from tdm_tpu.models import pixart
from tdm_tpu.train import optim as topt
from tdm_tpu.train import tdm


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = pixart.PixArtConfig.tiny()
    model = pixart.PixArtTransformer2D(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    latent = jnp.zeros((2, 4, 16, 16))
    t = jnp.array([500.0, 100.0])
    text = jnp.zeros((2, 8, cfg.caption_dim))
    mask = jnp.ones((2, 8), jnp.int32)
    teacher = model.init(rng, latent, t, text, mask)["params"]

    def denoise_fn(params, x, t, cond):
        te, m = cond
        return pixart.epsilon(model.apply({"params": params}, x, t, te, m))

    return cfg, teacher, denoise_fn


def _batch(cfg, key, b=2, seq=8):
    text = jax.random.normal(key, (b, seq, cfg.caption_dim))
    mask = jnp.ones((b, seq), jnp.int32)
    return (text, mask), (jnp.zeros_like(text), mask)


def _max_abs_delta(a, b):
    return max(
        float(jnp.abs(x - y).max())
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def test_accumulation_defers_both_optimizers(tiny_setup):
    """With accumulation_steps=3, micro-steps 1-2 leave student AND critic
    params bit-identical; the 3rd applies exactly one update."""
    cfg, teacher, denoise_fn = tiny_setup
    config = tdm.TDMConfig(total_steps=900, num_steps=4, cfg=2.0)
    tx = lambda: topt.make_optimizer(1e-3, accumulation_steps=3)
    step = jax.jit(
        tdm.build_train_step(
            denoise_fn, teacher, sched.ddpm_linear(), config, tx(), tx(),
            sample_shape=(4, cfg.sample_size, cfg.sample_size),
        )
    )
    state = tdm.init_state(teacher, teacher, tx(), tx())
    cond, uncond = _batch(cfg, jax.random.PRNGKey(1))
    s = state
    for i in range(2):
        s, m = step(s, jax.random.PRNGKey(10 + i), cond, uncond, teacher)
        assert np.isfinite(float(m.loss_student))
        assert _max_abs_delta(s.student, state.student) == 0.0
        assert _max_abs_delta(s.critic, state.critic) == 0.0
    s, _ = step(s, jax.random.PRNGKey(12), cond, uncond, teacher)
    assert _max_abs_delta(s.student, state.student) > 0.0
    assert _max_abs_delta(s.critic, state.critic) > 0.0


def test_accumulated_update_matches_single_step(tiny_setup):
    """Exactness: 2 micro-steps on the SAME (rng, batch) with
    MultiSteps(sgd) must produce the identical parameter update as ONE
    plain-sgd step (mean of two equal grads == the grad). The critic uses
    lr=0 in both runs so the student's critic-probe sees identical values
    on every path."""
    cfg, teacher, denoise_fn = tiny_setup
    config = tdm.TDMConfig(total_steps=900, num_steps=4, cfg=2.0)
    cond, uncond = _batch(cfg, jax.random.PRNGKey(2))
    rng = jax.random.PRNGKey(3)
    lr = 1e-3

    def run(accum):
        tx_s = optax.sgd(lr)
        tx_c = optax.sgd(0.0)
        if accum > 1:
            tx_s = optax.MultiSteps(tx_s, every_k_schedule=accum)
            tx_c = optax.MultiSteps(tx_c, every_k_schedule=accum)
        step = jax.jit(
            tdm.build_train_step(
                denoise_fn, teacher, sched.ddpm_linear(), config, tx_s, tx_c,
                sample_shape=(4, cfg.sample_size, cfg.sample_size),
            )
        )
        s = tdm.init_state(teacher, teacher, tx_s, tx_c)
        for _ in range(accum):
            s, _ = step(s, rng, cond, uncond, teacher)
        return s.student

    single = run(1)
    accumulated = run(2)
    assert _max_abs_delta(single, accumulated) < 1e-6
    # and the update is real (params moved from init)
    assert _max_abs_delta(single, teacher) > 0.0


def test_accumulation_order_invariance(tiny_setup):
    """The applied student update is the MEAN over the window: swapping the
    order of two different micro-batches yields the same parameters. The
    critic is frozen (lr=0) because its boundary-step update genuinely
    changes the student's critic-probe — with a live critic, only the pair
    (critic grads, per-micro student grads) is order-invariant, not the
    boundary micro-batch's probe."""
    cfg, teacher, denoise_fn = tiny_setup
    config = tdm.TDMConfig(total_steps=900, num_steps=4, cfg=2.0)
    b1 = (_batch(cfg, jax.random.PRNGKey(4)), jax.random.PRNGKey(6))
    b2 = (_batch(cfg, jax.random.PRNGKey(5)), jax.random.PRNGKey(7))

    def run(order):
        tx_s = optax.MultiSteps(optax.sgd(1e-3), every_k_schedule=2)
        tx_c = optax.MultiSteps(optax.sgd(0.0), every_k_schedule=2)
        step = jax.jit(
            tdm.build_train_step(
                denoise_fn, teacher, sched.ddpm_linear(), config, tx_s, tx_c,
                sample_shape=(4, cfg.sample_size, cfg.sample_size),
            )
        )
        s = tdm.init_state(teacher, teacher, tx_s, tx_c)
        for (cond, uncond), r in order:
            s, _ = step(s, r, cond, uncond, teacher)
        return s

    sa = run([b1, b2])
    sb = run([b2, b1])
    # optax's running mean is incremental (acc + (g-acc)/n), so order
    # invariance holds to float rounding, not bitwise
    for x, y in zip(jax.tree.leaves(sa.student), jax.tree.leaves(sb.student)):
        np.testing.assert_allclose(x, y, rtol=2e-4, atol=1e-6)
    assert _max_abs_delta(sa.student, teacher) > 0.0


def test_cli_flags_wire_accumulation_and_remat():
    """--gradient_accumulation_steps reaches the optimizer (MultiSteps
    state present) and --gradient_checkpointing flips the model config's
    remat — the two dead flags of round 1 (reference src/main.py:94,441
    and 191-193)."""
    import dataclasses

    from tdm_tpu.utils import config as cfg_lib

    cfg = cfg_lib.parse_args(
        [
            "--train_data_dir", "unused",
            "--gradient_accumulation_steps", "4",
            "--gradient_checkpointing",
        ]
    )
    assert cfg.gradient_accumulation_steps == 4
    assert cfg.gradient_checkpointing

    # optimizer wiring: MultiSteps exposes a mini_step counter in its state
    tx = topt.make_optimizer(1e-3, accumulation_steps=4)
    state = tx.init({"w": jnp.ones((4,))})
    assert hasattr(state, "mini_step")

    # model-config wiring (the CLI maps the flag via dataclasses.replace)
    mcfg = pixart.PixArtConfig.tiny()
    assert not mcfg.remat
    mcfg2 = dataclasses.replace(mcfg, remat=cfg.gradient_checkpointing)
    assert mcfg2.remat
