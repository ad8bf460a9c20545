"""TDM distillation on the VIDEO family: tiny CogVideoX (v-prediction,
ZERO-terminal-SNR schedule, 5-D latents) through the same jitted train
step — proving the step is model-agnostic via the native-output contract
(all conversions branch on schedule.prediction_type inside the step)."""

import jax
import jax.numpy as jnp
import numpy as np

from tdm_tpu.core import schedules as sched
from tdm_tpu.models import cogvideox as cog
from tdm_tpu.train import optim as topt, tdm


def test_video_tdm_step_runs_and_updates():
    cfg = cog.CogVideoXConfig.tiny()
    model = cog.CogVideoXTransformer3D(cfg=cfg)
    schedule = sched.cogvideox()  # v-prediction, SNR-shifted, zero-terminal
    b = 2
    sample_shape = (16, cfg.sample_frames, cfg.sample_h, cfg.sample_w)
    lat = jnp.zeros((b, *sample_shape))
    text = jax.random.normal(
        jax.random.PRNGKey(0), (b, cfg.max_text_len, cfg.text_dim)
    )
    teacher = model.init(jax.random.PRNGKey(1), lat, jnp.zeros((b,)), text)[
        "params"
    ]

    def denoise_fn(params, x, t, cond):
        # raw v output — the step branches on schedule.prediction_type for
        # every conversion (ε-space would be singular at zero terminal SNR)
        return model.apply({"params": params}, x, t, cond)

    config = tdm.TDMConfig(
        total_steps=1000, num_steps=4, cfg=3.0, use_separate=True
    )
    tx = topt.make_optimizer(1e-3)
    step = tdm.build_train_step(
        denoise_fn, teacher, schedule, config, tx, tx,
        sample_shape=sample_shape,
    )
    state = tdm.init_state(teacher, teacher, tx, tx)
    jit_step = jax.jit(step)

    uncond = jnp.zeros_like(text)
    s1, m1 = jit_step(state, jax.random.PRNGKey(2), text, uncond, teacher)
    s2, m2 = jit_step(s1, jax.random.PRNGKey(3), text, uncond, teacher)
    for m in (m1, m2):
        for name, v in m._asdict().items():
            assert np.isfinite(float(v)), f"{name} not finite"
    assert int(s2.step) == 2
    # both nets actually moved
    d_student = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree.leaves(state.student), jax.tree.leaves(s2.student))
    )
    d_critic = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree.leaves(state.critic), jax.tree.leaves(s2.critic))
    )
    assert d_student > 0 and d_critic > 0


def test_video_tdm_step_sequence_parallel():
    """The SAME train step with a sequence-parallel denoiser: frames shard
    over 'sp', batch over 'data' — distributed VIDEO distillation beyond a
    single chip's HBM (rollout, critic DSM, teacher probe, and the student
    backward all run through ring attention). Matches the monolithic step's
    metrics on identical inputs."""
    import dataclasses

    from jax.sharding import Mesh

    base = dataclasses.replace(cog.CogVideoXConfig.tiny(), sample_frames=4)
    sp_cfg = dataclasses.replace(base, sequence_parallel_axis="sp")
    mono = cog.CogVideoXTransformer3D(cfg=base)
    spm = cog.CogVideoXTransformer3D(cfg=sp_cfg)
    schedule = sched.cogvideox()
    b = 2
    sample_shape = (16, base.sample_frames, base.sample_h, base.sample_w)
    lat = jnp.zeros((b, *sample_shape))
    text = jax.random.normal(
        jax.random.PRNGKey(0), (b, base.max_text_len, base.text_dim)
    )
    teacher = mono.init(jax.random.PRNGKey(1), lat, jnp.zeros((b,)), text)[
        "params"
    ]
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "sp"))
    sp_apply = cog.sequence_parallel_apply(spm, mesh, data_axis="data")

    def run(denoise_raw):
        def denoise_fn(params, x, t, cond):
            return denoise_raw(params, x, t, cond)

        config = tdm.TDMConfig(
            total_steps=1000, num_steps=4, cfg=3.0, use_separate=True
        )
        tx = topt.make_optimizer(1e-3)
        step = tdm.build_train_step(
            denoise_fn, teacher, schedule, config, tx, tx,
            sample_shape=sample_shape,
        )
        state = tdm.init_state(teacher, teacher, tx, tx)
        s, m = jax.jit(step)(
            state, jax.random.PRNGKey(2), text, jnp.zeros_like(text), teacher
        )
        return s, m

    s_sp, m_sp = run(sp_apply)
    s_mono, m_mono = run(
        lambda p, x, t, c: mono.apply({"params": p}, x, t, c)
    )
    for name in ("loss_student", "loss_critic"):
        a = float(getattr(m_sp, name))
        bb = float(getattr(m_mono, name))
        assert np.isfinite(a)
        np.testing.assert_allclose(a, bb, rtol=1e-3, err_msg=name)
    # updated params agree across the two execution layouts. Bounds: one
    # Adam step moves each weight by at most ~lr (1e-3); where the true
    # grad is near zero, the ring layout's ~1e-6 forward noise can flip
    # the normalized update's sign, so ISOLATED weights may differ by up
    # to ~2·lr. Such flips must stay rare: the MEAN |Δ| over each leaf is
    # also bounded well below one step, catching any systematic layout
    # divergence the per-element bound would let through.
    for x, y in zip(jax.tree.leaves(s_sp.student), jax.tree.leaves(s_mono.student)):
        d = np.abs(np.asarray(x, np.float64) - np.asarray(y, np.float64))
        assert d.max() <= 2.5e-3, f"max |Δ| {d.max():.2e} > 2 Adam steps"
        assert d.mean() <= 2e-4, f"mean |Δ| {d.mean():.2e} — systematic"


def test_video_tdm_step_sequence_parallel_with_fsdp():
    """sp COMPOSED with ZeRO weight sharding: the same train step on a
    ('data','fsdp','sp') = {2,2,2} mesh with params/optimizer fsdp-sharded
    as an AUTOMATIC axis inside the sp shard_map (GSPMD gathers per layer).
    Exact losses vs the monolithic step, and the updated state must come
    back genuinely fsdp-sharded — the tdm-train --sp --fsdp path."""
    import dataclasses

    from jax.sharding import Mesh

    from tdm_tpu.parallel import mesh as pmesh

    base = dataclasses.replace(cog.CogVideoXConfig.tiny(), sample_frames=4)
    sp_cfg = dataclasses.replace(base, sequence_parallel_axis="sp")
    mono = cog.CogVideoXTransformer3D(cfg=base)
    spm = cog.CogVideoXTransformer3D(cfg=sp_cfg)
    schedule = sched.cogvideox()
    b = 2
    shape = (16, base.sample_frames, base.sample_h, base.sample_w)
    text = jax.random.normal(
        jax.random.PRNGKey(0), (b, base.max_text_len, base.text_dim)
    )
    teacher = mono.init(
        jax.random.PRNGKey(1), jnp.zeros((b, *shape)), jnp.zeros((b,)), text
    )["params"]
    mesh = Mesh(
        np.asarray(jax.devices()[:8]).reshape(2, 2, 2),
        ("data", "fsdp", "sp"),
    )
    sp_apply = cog.sequence_parallel_apply(spm, mesh, data_axis="data")

    def run(denoise_raw, place):
        config = tdm.TDMConfig(
            total_steps=1000, num_steps=4, cfg=3.0, use_separate=True
        )
        tx = topt.make_optimizer(1e-3)
        step = tdm.build_train_step(
            denoise_raw, teacher, schedule, config, tx, tx,
            sample_shape=shape,
        )
        state = tdm.init_state(teacher, teacher, tx, tx)
        t_pl = teacher
        if place:
            state = jax.device_put(
                state, pmesh.fsdp_shardings(state, mesh, min_size=2**10)
            )
            t_pl = jax.device_put(
                teacher, pmesh.fsdp_shardings(teacher, mesh, min_size=2**10)
            )
        return jax.jit(step)(
            state, jax.random.PRNGKey(2), text, jnp.zeros_like(text), t_pl
        )

    s_sp, m_sp = run(lambda p, x, t, c: sp_apply(p, x, t, c), place=True)
    _, m_mono = run(
        lambda p, x, t, c: mono.apply({"params": p}, x, t, c), place=False
    )
    d = abs(float(m_sp.loss_student) - float(m_mono.loss_student))
    assert np.isfinite(float(m_sp.loss_student)) and d < 1e-4, d
    q = s_sp.student["blocks"]["to_q"]["kernel"]
    assert "fsdp" in tuple(q.sharding.spec), q.sharding
