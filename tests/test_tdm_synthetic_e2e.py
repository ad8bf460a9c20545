"""End-to-end TDM efficacy on a synthetic task — the algorithmic claim of
the reference (4-NFE student ≈ many-NFE teacher, trained image-free) proven
in miniature.

Task: x₀ lives on a RING of radius 1 (a curved data manifold — the classic
failure case for few-step DDIM: the x₀-projection at high noise is the ring
CENTER, so a 4-step trajectory undershoots the radius, while 50 steps track
the manifold). We pretrain a toy denoiser by DSM, measure the 4-NFE radius
error, distill with the full TDM step (student rollout → transport → live
critic → teacher target), and require the distilled 4-NFE student to cut
the radius error toward the 50-NFE teacher's.

This is the SURVEY.md §7 'minimum end-to-end slice' quality check made
deterministic and CPU-sized.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import linen as nn

from tdm_tpu.core import sampling, schedules as sched
from tdm_tpu.train import optim as topt, tdm

SHAPE = (1, 2, 2)  # 4 dims; the ring lives in dims 0-1, dims 2-3 ≈ 0


class ToyDenoiser(nn.Module):
    width: int = 128

    @nn.compact
    def __call__(self, x, t, cond):
        b = x.shape[0]
        flat = x.reshape(b, -1).astype(jnp.float32)
        tt = t.astype(jnp.float32) / 1000.0
        temb = jnp.stack(
            [jnp.cos(np.pi * tt), jnp.sin(np.pi * tt), tt,
             jnp.cos(4 * np.pi * tt), jnp.sin(4 * np.pi * tt)], axis=-1
        )
        h = jnp.concatenate([flat, temb, cond.astype(jnp.float32)], axis=-1)
        for i in range(4):
            h = nn.gelu(nn.Dense(self.width, name=f"d{i}")(h))
        out = nn.Dense(int(np.prod(SHAPE)), name="out")(h)
        return out.reshape(x.shape)


def _data(rng, batch):
    theta = jax.random.uniform(rng, (batch,), maxval=2 * np.pi)
    x0 = jnp.zeros((batch, *SHAPE))
    x0 = x0.at[:, 0, 0, 0].set(jnp.cos(theta))
    x0 = x0.at[:, 0, 0, 1].set(jnp.sin(theta))
    x0 = x0 + 0.02 * jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
    return x0


def _radius_error(samples) -> float:
    r = jnp.sqrt(samples[:, 0, 0, 0] ** 2 + samples[:, 0, 0, 1] ** 2)
    return float(jnp.mean(jnp.abs(r - 1.0)))


@pytest.fixture(scope="module")
def trained_teacher():
    schedule = sched.ddpm_linear()
    model = ToyDenoiser()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *SHAPE)), jnp.zeros((1,)),
        jnp.zeros((1, 1)),
    )["params"]
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def denoise_fn(p, x, t, cond):
        return model.apply({"params": p}, x, t, cond)

    @jax.jit
    def dsm_step(params, opt, key):
        kd, kt, ke = jax.random.split(key, 3)
        x0 = _data(kd, 1024)
        t = jax.random.randint(kt, (1024,), 0, 1000)
        eps = jax.random.normal(ke, x0.shape)
        x_t = sched.add_noise(schedule, x0, eps, t)
        cond = jnp.ones((1024, 1))

        def loss_fn(p):
            return jnp.mean((denoise_fn(p, x_t, t, cond) - eps) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, loss

    key = jax.random.PRNGKey(1)
    for _ in range(3000):
        key, sub = jax.random.split(key)
        params, opt, loss = dsm_step(params, opt, sub)
    assert float(loss) < 0.5, f"teacher DSM did not converge: {float(loss)}"
    return model, params, schedule, denoise_fn


def _sample(denoise_fn, params, schedule, key, n, steps):
    grid = sched.fewstep_grid(900, steps)
    noise = jax.random.normal(key, (n, *SHAPE))
    cond = jnp.ones((n, 1))
    return sampling.sample_fewstep(
        lambda x, t, c: denoise_fn(params, x, t, c),
        schedule, noise, cond, timestep_grid=grid,
    )


def test_tdm_distillation_improves_4nfe(trained_teacher):
    model, teacher, schedule, denoise_fn = trained_teacher
    n = 512
    key = jax.random.PRNGKey(42)

    err_teacher_50 = _radius_error(
        _sample(denoise_fn, teacher, schedule, key, n, 50)
    )
    err_before_4 = _radius_error(
        _sample(denoise_fn, teacher, schedule, key, n, 4)
    )
    # the premise: few-step sampling is distinctly worse than many-step
    assert err_before_4 > err_teacher_50 + 0.02, (
        f"task too easy: 4-NFE {err_before_4:.3f} vs 50-NFE {err_teacher_50:.3f}"
    )

    # ---- distill with the full TDM step (cfg 1 = pure target matching) ----
    config = tdm.TDMConfig(
        total_steps=900, num_steps=4, cfg=1.0, use_huber=True,
        use_separate=True, student_cfg_in_loss=False,
    )
    tx_s = topt.make_optimizer(3e-4, weight_decay=0.0)
    tx_c = topt.make_optimizer(3e-4, weight_decay=0.0)
    step = tdm.build_train_step(
        denoise_fn, teacher, schedule, config, tx_s, tx_c,
        sample_shape=SHAPE,
    )
    state = tdm.init_state(teacher, teacher, tx_s, tx_c)
    jit_step = jax.jit(step)

    key_t = jax.random.PRNGKey(7)
    cond = jnp.ones((128, 1))
    uncond = jnp.zeros((128, 1))
    for i in range(500):
        key_t, ks = jax.random.split(key_t)
        state, metrics = jit_step(state, ks, cond, uncond, teacher)
    assert np.isfinite(float(metrics.loss_student))

    err_after_4 = _radius_error(
        _sample(denoise_fn, state.student, schedule, key, n, 4)
    )
    # distillation must close a meaningful part of the 4-vs-50 NFE gap
    gap_before = err_before_4 - err_teacher_50
    gap_after = err_after_4 - err_teacher_50
    assert err_after_4 < err_before_4 - 0.02, (
        f"no improvement: 4-NFE before {err_before_4:.3f} → after "
        f"{err_after_4:.3f} (50-NFE teacher {err_teacher_50:.3f})"
    )
    assert gap_after < 0.6 * gap_before, (
        f"gap closed too little: {gap_before:.3f} → {gap_after:.3f}"
    )


def test_lora_mode_distillation_also_improves(trained_teacher):
    """The released-artifact pathway: LoRA-mode TDM (adapter factors only,
    frozen base) must also cut the 4-NFE error on the ring task."""
    from tdm_tpu.lora import LoRA, init_lora, merge, wrap_denoise_fn

    model, teacher, schedule, denoise_fn = trained_teacher
    n = 512
    key = jax.random.PRNGKey(43)
    err_before = _radius_error(
        _sample(denoise_fn, teacher, schedule, key, n, 4)
    )

    # adapt every Dense kernel (the toy MLP has no attention-named modules)
    lora = init_lora(
        teacher, jax.random.PRNGKey(5), rank=8,
        target=lambda path, kernel: kernel.ndim == 2,
    )
    assert lora.alpha, "no adapted modules"
    student_fn = wrap_denoise_fn(denoise_fn, lora)

    config = tdm.TDMConfig(
        total_steps=900, num_steps=4, cfg=1.0, use_huber=True,
        use_separate=True, student_cfg_in_loss=False,
    )
    tx = topt.make_optimizer(1e-3, weight_decay=0.0)
    step = tdm.build_train_step(
        denoise_fn, teacher, schedule, config, tx, tx,
        sample_shape=SHAPE, student_denoise_fn=student_fn,
    )
    state = tdm.init_state(lora.params, teacher, tx, tx)
    jit_step = jax.jit(step)
    key_t = jax.random.PRNGKey(9)
    cond = jnp.ones((128, 1))
    for _ in range(400):
        key_t, ks = jax.random.split(key_t)
        state, metrics = jit_step(state, ks, cond, jnp.zeros_like(cond), teacher)
    assert np.isfinite(float(metrics.loss_student))

    merged = merge(teacher, LoRA(params=state.student, alpha=lora.alpha))
    err_after = _radius_error(
        _sample(denoise_fn, merged, schedule, key, n, 4)
    )
    assert err_after < err_before - 0.02, (
        f"LoRA-mode no improvement: {err_before:.3f} -> {err_after:.3f}"
    )


def test_quant_forwards_distillation_also_improves(trained_teacher, monkeypatch):
    """TDMConfig(quant_forwards=True): the no-grad forwards (rollout,
    teacher probe, frozen-critic probe) run int8-quantized (ops/quant.py),
    and the distillation STILL closes the few-step gap — validating the
    quantized-training-forwards pathway end-to-end. Gates are lowered so
    the toy denoiser's width-128 Dense layers actually quantize."""
    from tdm_tpu.ops import quant

    monkeypatch.setattr(quant, "MIN_TOKENS", 1)
    monkeypatch.setattr(quant, "MIN_DIM", 1)
    monkeypatch.setattr(quant, "WIDE_DIM", 1)

    model, teacher, schedule, denoise_fn = trained_teacher
    n = 512
    key = jax.random.PRNGKey(42)
    err_teacher_50 = _radius_error(
        _sample(denoise_fn, teacher, schedule, key, n, 50)
    )
    err_before_4 = _radius_error(
        _sample(denoise_fn, teacher, schedule, key, n, 4)
    )

    config = tdm.TDMConfig(
        total_steps=900, num_steps=4, cfg=1.0, use_huber=True,
        use_separate=True, student_cfg_in_loss=False, quant_forwards=True,
    )
    tx_s = topt.make_optimizer(3e-4, weight_decay=0.0)
    tx_c = topt.make_optimizer(3e-4, weight_decay=0.0)
    step = tdm.build_train_step(
        denoise_fn, teacher, schedule, config, tx_s, tx_c,
        sample_shape=SHAPE,
    )
    state = tdm.init_state(teacher, teacher, tx_s, tx_c)
    jit_step = jax.jit(step)

    key_t = jax.random.PRNGKey(7)
    cond = jnp.ones((128, 1))
    uncond = jnp.zeros((128, 1))
    for i in range(500):
        key_t, ks = jax.random.split(key_t)
        state, metrics = jit_step(state, ks, cond, uncond, teacher)
    assert np.isfinite(float(metrics.loss_student))

    err_after_4 = _radius_error(
        _sample(denoise_fn, state.student, schedule, key, n, 4)
    )
    gap_before = err_before_4 - err_teacher_50
    gap_after = err_after_4 - err_teacher_50
    assert err_after_4 < err_before_4 - 0.02, (
        f"quant_forwards broke distillation: {err_before_4:.3f} → "
        f"{err_after_4:.3f}"
    )
    assert gap_after < 0.6 * gap_before, (
        f"gap closed too little under quant_forwards: "
        f"{gap_before:.3f} → {gap_after:.3f}"
    )
