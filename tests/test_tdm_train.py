"""TDM train step: semantics of the fixed algorithm + mesh-sharded execution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tdm_tpu.core import schedules as sched
from tdm_tpu.models import pixart
from tdm_tpu.train import optim as topt
from tdm_tpu.train import tdm


def test_segment_interval_coupling():
    """t_fake must always sit in the segment's own interval (defect-6 fix):
    transport variance stays non-negative by construction."""
    config = tdm.TDMConfig(total_steps=900, num_steps=4, use_separate=True)
    levels = tdm.segment_levels(config)
    np.testing.assert_array_equal(levels, [899, 674, 449, 224, 0])
    seg, lo, t_fake = tdm.sample_segment_and_t(
        jax.random.PRNGKey(0), config, 512
    )
    assert int(seg.min()) >= 1 and int(seg.max()) <= 4
    lo_np, t_np, seg_np = map(np.asarray, (lo, t_fake, seg))
    hi_np = np.asarray(levels)[seg_np - 1]
    assert np.all(t_np >= lo_np), "t_fake below its source level"
    assert np.all(t_np <= hi_np), "t_fake escaped its segment interval"
    # all four segments get sampled
    assert set(np.unique(seg_np)) == {1, 2, 3, 4}


def test_segment_interval_joint_mode():
    config = tdm.TDMConfig(total_steps=900, num_steps=4, use_separate=False)
    seg, lo, t_fake = tdm.sample_segment_and_t(
        jax.random.PRNGKey(1), config, 512
    )
    t_np, lo_np = np.asarray(t_fake), np.asarray(lo)
    assert np.all(t_np >= lo_np)
    assert np.all(t_np <= 899)
    # joint mode: low segments may sample far above their own interval
    assert np.any(t_np[np.asarray(seg) == 4] > 225)


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

    return cfg, model, teacher, denoise_fn


def _build(teacher, denoise_fn, **overrides):
    config = tdm.TDMConfig(
        total_steps=900, num_steps=4, cfg=4.5, **overrides
    )
    schedule = sched.ddpm_linear()
    tx_s = topt.make_optimizer(1e-4)
    tx_c = topt.make_optimizer(1e-4)
    step = tdm.build_train_step(
        denoise_fn,
        teacher,
        schedule,
        config,
        tx_s,
        tx_c,
        sample_shape=(4, 16, 16),
    )
    state = tdm.init_state(teacher, teacher, tx_s, tx_c, use_ema=True)
    return step, state


def test_train_step_runs_and_updates(tiny_setup):
    cfg, model, teacher, denoise_fn = tiny_setup
    step, state = _build(teacher, denoise_fn)
    b = 2
    text = jax.random.normal(jax.random.PRNGKey(2), (b, 8, cfg.caption_dim))
    mask = jnp.ones((b, 8), jnp.int32)
    un_text = jnp.zeros((b, 8, cfg.caption_dim))
    cond, uncond = (text, mask), (un_text, mask)

    jstep = jax.jit(step)
    s1, m1 = jstep(state, jax.random.PRNGKey(10), cond, uncond)
    s2, m2 = jstep(s1, jax.random.PRNGKey(11), cond, uncond)

    for m in (m1, m2):
        for v in m:
            assert bool(jnp.isfinite(v)), m
    assert int(s2.step) == 2
    # student and critic both moved
    d_student = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.student, s2.student
    )
    assert max(jax.tree.leaves(d_student)) > 0
    d_critic = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.critic, s2.critic
    )
    assert max(jax.tree.leaves(d_critic)) > 0
    # EMA trails the student but moved too
    d_ema = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.ema, s2.ema
    )
    assert max(jax.tree.leaves(d_ema)) > 0
    assert max(jax.tree.leaves(d_ema)) < max(jax.tree.leaves(d_student)) * 1.01


def test_train_step_mse_and_no_student_cfg(tiny_setup):
    cfg, model, teacher, denoise_fn = tiny_setup
    step, state = _build(
        teacher, denoise_fn, use_huber=False, student_cfg_in_loss=False
    )
    text = jax.random.normal(jax.random.PRNGKey(3), (2, 8, cfg.caption_dim))
    mask = jnp.ones((2, 8), jnp.int32)
    cond, uncond = (text, mask), (jnp.zeros_like(text), mask)
    _, metrics = jax.jit(step)(state, jax.random.PRNGKey(12), cond, uncond)
    assert bool(jnp.isfinite(metrics.loss_student))


def test_train_step_sharded_over_mesh(tiny_setup):
    """The whole TDM step compiles once over a data mesh — the in-graph-psum
    equivalent of DDP allreduce (`src/main.py:535`)."""
    cfg, model, teacher, denoise_fn = tiny_setup
    step, state = _build(teacher, denoise_fn)
    n = len(jax.devices())
    mesh = Mesh(np.asarray(jax.devices()).reshape(n), ("data",))
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))

    b = 2 * n
    text = jax.random.normal(jax.random.PRNGKey(4), (b, 8, cfg.caption_dim))
    mask = jnp.ones((b, 8), jnp.int32)
    cond = (
        jax.device_put(text, batch_sh),
        jax.device_put(mask, batch_sh),
    )
    uncond = (
        jax.device_put(jnp.zeros_like(text), batch_sh),
        jax.device_put(mask, batch_sh),
    )
    state = jax.device_put(state, repl)

    jstep = jax.jit(step)
    new_state, metrics = jstep(state, jax.random.PRNGKey(13), cond, uncond)
    assert bool(jnp.isfinite(metrics.loss_student))
    assert bool(jnp.isfinite(metrics.loss_critic))
    # params remain replicated after the update
    leaf = jax.tree.leaves(new_state.student)[0]
    assert leaf.sharding.is_fully_replicated


def test_lora_mode_training(tiny_setup):
    """LoRA-mode TDM: student state holds only adapter factors (merged into
    the frozen base inside the jitted step); base weights never change."""
    import numpy as np

    from tdm_tpu.core import schedules as sched
    from tdm_tpu.lora import init_lora, wrap_denoise_fn
    from tdm_tpu.train import optim as topt

    cfg, model, teacher, denoise_fn = tiny_setup
    lora = init_lora(teacher, jax.random.PRNGKey(5), rank=2)
    student_fn = wrap_denoise_fn(denoise_fn, lora)

    config = tdm.TDMConfig(total_steps=900, num_steps=4, cfg=2.0)
    tx = topt.make_optimizer(1e-3)
    step = tdm.build_train_step(
        denoise_fn, teacher, sched.ddpm_linear(), config, tx, tx,
        sample_shape=(4, cfg.sample_size, cfg.sample_size),
        student_denoise_fn=student_fn,
    )
    state = tdm.init_state(lora.params, teacher, tx, tx)

    b, seq = 2, 8
    text = jax.random.normal(jax.random.PRNGKey(6), (b, seq, cfg.caption_dim))
    mask = jnp.ones((b, seq), jnp.int32)
    cond, uncond = (text, mask), (jnp.zeros_like(text), mask)
    s1, m1 = jax.jit(step)(state, jax.random.PRNGKey(7), cond, uncond, teacher)
    assert np.isfinite(float(m1.loss_student))
    assert np.isfinite(float(m1.loss_critic))
    # adapter factors moved; only factors live in the student state
    moved = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(jax.tree.leaves(state.student), jax.tree.leaves(s1.student))
    )
    assert moved
    n_student = sum(x.size for x in jax.tree.leaves(s1.student))
    n_teacher = sum(x.size for x in jax.tree.leaves(teacher))
    assert n_student < n_teacher * 0.5  # genuinely low-rank state


def test_critic_update_ratio(tiny_setup):
    """critic_updates=3 runs extra fake-score updates per step (DMD2-style);
    the critic must move MORE than with a single update."""
    import numpy as np

    from tdm_tpu.core import schedules as sched
    from tdm_tpu.train import optim as topt

    cfg, model, teacher, denoise_fn = tiny_setup

    def run(n_updates):
        config = tdm.TDMConfig(
            total_steps=900, num_steps=4, cfg=2.0, critic_updates=n_updates
        )
        tx = topt.make_optimizer(1e-3)
        step = tdm.build_train_step(
            denoise_fn, teacher, sched.ddpm_linear(), config, tx, tx,
            sample_shape=(4, cfg.sample_size, cfg.sample_size),
        )
        state = tdm.init_state(teacher, teacher, tx, tx)
        b, seq = 2, 8
        text = jax.random.normal(jax.random.PRNGKey(0), (b, seq, cfg.caption_dim))
        mask = jnp.ones((b, seq), jnp.int32)
        s1, m = jax.jit(step)(
            state, jax.random.PRNGKey(1), (text, mask),
            (jnp.zeros_like(text), mask), teacher,
        )
        assert np.isfinite(float(m.loss_critic))
        return sum(
            float(jnp.abs(a - b).sum())
            for a, b in zip(jax.tree.leaves(state.critic), jax.tree.leaves(s1.critic))
        )

    assert run(3) > run(1) * 1.5
