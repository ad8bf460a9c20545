"""Synthetic decoded-pixel distillation-quality probe.

A CPU/TPU-sized end-to-end TDM efficacy measurement with a VAE decode in
the quality loop — the closest tractable analog of the reference's visual
verification (`/root/reference/src/training.py:107-121`: few-step rollout →
TAESD decode → inspect grids) and its user-study quality bar
(`README.md:17-27`: the 4-NFE student must match the many-NFE teacher).

Pipeline (every stage a real framework component):
  1. image-shaped latents [4,4,4] on a curved 1-D manifold — a ring
     x₀(θ) = cosθ·A + sinθ·B in fixed orthonormal spatial patterns (the
     classic few-step DDIM failure case: the x₀-projection at high noise
     is the ring CENTER, so a 4-step trajectory undershoots the manifold);
  2. a tiny TAESD decoder (models/vae.py) trained to render each manifold
     latent as a Gaussian blob whose position tracks θ — off-manifold
     latents decode to visibly wrong images;
  3. a toy ε-denoiser DSM-pretrained on the latents — the teacher;
  4. full TDM distillation (train/tdm.py) of a 4-NFE student;
  5. the metric lives in DECODED PIXEL space: mean distance of each decoded
     sample to its nearest point on the DECODED manifold (dense θ grid
     through the same decoder, so decoder approximation error cancels).

Consumers: tests/test_tdm_image_e2e.py (pass/fail gate) and
`python bench.py distill` (tracked quality number across rounds —
gap_closure = the fraction of the 4-vs-50-NFE decoded error gap the
distilled student closes; 1.0 = student reaches 50-NFE teacher quality,
the reference's user-study claim).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from tdm_tpu.core import sampling, schedules as sched
from tdm_tpu.models import vae
from tdm_tpu.train import optim as topt, tdm

IMG = 16  # canvas (pixels); 2 TAESD stages => 4x upsample from 4x4 latents
DEC_CFG = vae.TAESDConfig(
    latent_channels=4, width=16, num_stages=2, blocks_per_stage=1
)
LAT_SHAPE = (4, 4, 4)  # (C, H/4, W/4)
_DIM = int(np.prod(LAT_SHAPE))


def _basis():
    """Two fixed orthonormal (in RMS sense) latent patterns A, B."""
    g = jax.random.normal(jax.random.PRNGKey(99), (2, _DIM))
    a = g[0] / jnp.linalg.norm(g[0])
    b = g[1] - jnp.dot(g[1], a) * a
    b = b / jnp.linalg.norm(b)
    scale = np.sqrt(_DIM)  # unit-RMS latents, the scale DSM expects
    return (a * scale).reshape(LAT_SHAPE), (b * scale).reshape(LAT_SHAPE)


_A, _B = _basis()


def manifold_latents(theta: jnp.ndarray) -> jnp.ndarray:
    return (
        jnp.cos(theta)[:, None, None, None] * _A[None]
        + jnp.sin(theta)[:, None, None, None] * _B[None]
    )


def manifold_images(theta: jnp.ndarray) -> jnp.ndarray:
    """Render [N, 3, IMG, IMG] blobs centered on a circle of radius 4.5 —
    the decoder's supervised rendering target."""
    cx = IMG / 2 + 4.5 * jnp.cos(theta)
    cy = IMG / 2 + 4.5 * jnp.sin(theta)
    yy, xx = jnp.mgrid[0:IMG, 0:IMG]
    d2 = (xx[None] - cx[:, None, None]) ** 2 + (yy[None] - cy[:, None, None]) ** 2
    bump = jnp.exp(-d2 / (2 * 1.5**2))
    gains = jnp.asarray([1.0, 0.6, 0.3])
    return gains[None, :, None, None] * bump[:, None]


class ToyLatentDenoiser(nn.Module):
    width: int = 256

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
        out = nn.Dense(_DIM, name="out")(h)
        return out.reshape(x.shape)


def train_decoder(steps: int = 700):
    """TAESDDecoder trained to render manifold latents as their blobs.
    Returns (jitted decode fn, final loss)."""
    dec = vae.TAESDDecoder(DEC_CFG)
    params = dec.init(jax.random.PRNGKey(1), jnp.zeros((1, *LAT_SHAPE)))["params"]
    tx = optax.adam(2e-3)
    opt = tx.init(params)

    @jax.jit
    def dec_step(params, opt, key):
        theta = jax.random.uniform(key, (128,), maxval=2 * np.pi)
        z = manifold_latents(theta)
        target = manifold_images(theta)

        def loss_fn(p):
            return jnp.mean((dec.apply({"params": p}, z) - target) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, loss

    key = jax.random.PRNGKey(2)
    for _ in range(steps):
        key, sub = jax.random.split(key)
        params, opt, loss = dec_step(params, opt, sub)

    def decode(z):
        return dec.apply({"params": params}, z)

    return jax.jit(decode), float(loss)


def train_teacher(steps: int = 3000):
    """DSM-pretrained toy ε-teacher on the manifold. Returns
    (model, params, schedule, denoise_fn, final loss)."""
    schedule = sched.ddpm_linear()
    model = ToyLatentDenoiser()
    params = model.init(
        jax.random.PRNGKey(3), jnp.zeros((1, *LAT_SHAPE)), jnp.zeros((1,)),
        jnp.zeros((1, 1)),
    )["params"]
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def denoise_fn(p, x, t, cond):
        return model.apply({"params": p}, x, t, cond)

    @jax.jit
    def dsm_step(params, opt, key):
        kd, kt, ke, kj = jax.random.split(key, 4)
        theta = jax.random.uniform(kd, (512,), maxval=2 * np.pi)
        x0 = manifold_latents(theta)
        x0 = x0 + 0.02 * jax.random.normal(kj, x0.shape)
        t = jax.random.randint(kt, (512,), 0, 1000)
        eps = jax.random.normal(ke, x0.shape)
        x_t = sched.add_noise(schedule, x0, eps, t)
        cond = jnp.ones((512, 1))

        def loss_fn(p):
            return jnp.mean((denoise_fn(p, x_t, t, cond) - eps) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, loss

    key = jax.random.PRNGKey(4)
    for _ in range(steps):
        key, sub = jax.random.split(key)
        params, opt, loss = dsm_step(params, opt, sub)
    return model, params, schedule, denoise_fn, float(loss)


def decoded_manifold_error(decode, z: jnp.ndarray) -> float:
    """Mean pixel-space distance from each decoded sample to its nearest
    DECODED manifold point (dense 128-point θ grid through the same
    decoder — decoder approximation error cancels), normalized by the
    decoded references' RMS norm so the number is scale-free."""
    theta = jnp.linspace(0.0, 2 * np.pi, 128, endpoint=False)
    ref = decode(manifold_latents(theta)).reshape(128, -1)
    imgs = decode(z).reshape(z.shape[0], -1)
    d2 = (
        jnp.sum(imgs**2, -1)[:, None]
        - 2 * imgs @ ref.T
        + jnp.sum(ref**2, -1)[None]
    )
    dist = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=-1), 0.0))
    return float(jnp.mean(dist) / jnp.sqrt(jnp.mean(jnp.sum(ref**2, -1))))


def sample_grid(denoise_fn, params, schedule, key, n, steps):
    grid = sched.fewstep_grid(900, steps)
    noise = jax.random.normal(key, (n, *LAT_SHAPE))
    cond = jnp.ones((n, 1))
    return sampling.sample_fewstep(
        lambda x, t, c: denoise_fn(params, x, t, c),
        schedule, noise, cond, timestep_grid=grid,
    )


def distill(denoise_fn, teacher, schedule, steps: int = 500):
    """Full TDM distillation of a 4-NFE student (reference demo semantics:
    Huber, separate intervals; critic_updates=5 — the DMD2-style ratio the
    64-dim latent space needs, see tests/test_tdm_image_e2e.py history).
    Returns the final train state."""
    config = tdm.TDMConfig(
        total_steps=900, num_steps=4, cfg=1.0, use_huber=True,
        use_separate=True, student_cfg_in_loss=False, critic_updates=5,
    )
    tx_s = topt.make_optimizer(3e-4, weight_decay=0.0)
    tx_c = topt.make_optimizer(3e-4, weight_decay=0.0)
    step = tdm.build_train_step(
        denoise_fn, teacher, schedule, config, tx_s, tx_c,
        sample_shape=LAT_SHAPE,
    )
    state = tdm.init_state(teacher, teacher, tx_s, tx_c)
    jit_step = jax.jit(step)

    key = jax.random.PRNGKey(7)
    cond = jnp.ones((128, 1))
    uncond = jnp.zeros((128, 1))
    for _ in range(steps):
        key, ks = jax.random.split(key)
        state, metrics = jit_step(state, ks, cond, uncond, teacher)
    return state, metrics


def run_probe(distill_steps: int = 500, n_eval: int = 256) -> dict:
    """Train decoder + teacher, distill, and measure. Returns a dict with
    the decoded manifold errors (teacher@50NFE, student before/after @4NFE)
    and gap_closure = 1 - gap_after/gap_before ∈ (-inf, 1], where 1.0 means
    the 4-NFE student fully reaches 50-NFE teacher quality."""
    decode, dec_loss = train_decoder()
    model, teacher, schedule, denoise_fn, dsm_loss = train_teacher()
    key = jax.random.PRNGKey(42)

    err_teacher_50 = decoded_manifold_error(
        decode, sample_grid(denoise_fn, teacher, schedule, key, n_eval, 50)
    )
    err_before_4 = decoded_manifold_error(
        decode, sample_grid(denoise_fn, teacher, schedule, key, n_eval, 4)
    )
    state, metrics = distill(denoise_fn, teacher, schedule, distill_steps)
    err_after_4 = decoded_manifold_error(
        decode,
        sample_grid(denoise_fn, state.student, schedule, key, n_eval, 4),
    )
    gap_before = err_before_4 - err_teacher_50
    gap_after = err_after_4 - err_teacher_50
    return dict(
        err_teacher_50nfe=err_teacher_50,
        err_student_4nfe_before=err_before_4,
        err_student_4nfe_after=err_after_4,
        gap_closure=1.0 - gap_after / gap_before,
        decoder_loss=dec_loss,
        teacher_dsm_loss=dsm_loss,
        loss_student_final=float(metrics.loss_student),
        distill_steps=distill_steps,
    )
