"""Config (reference argparse parity), orbax checkpointing, metrics/logging
and jax.profiler hooks."""

from tdm_tpu.utils import checkpoint, config, logging  # noqa: F401
