"""Pure-jnp diffusion math: schedules (tables), sampling (few-step rollout),
solvers (DPM-Solver++ 2M, LCM)."""

from tdm_tpu.core import sampling, schedules, solvers  # noqa: F401
