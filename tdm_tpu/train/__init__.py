"""Training: the jitted TDM step (tdm), optax stack (optim), validation
grid imaging (validation)."""

from tdm_tpu.train import optim, tdm, validation  # noqa: F401
