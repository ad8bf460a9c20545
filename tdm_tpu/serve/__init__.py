"""Production serving: micro-batching scheduler + HTTP daemon over the
jitted few-step samplers (serve/batcher.py, serve/server.py)."""

from tdm_tpu.serve.batcher import (
    MicroBatcher,
    Overloaded,
    ServeStats,
    latent_shape,
    make_cond_fn,
)
from tdm_tpu.serve.server import TDMServer

__all__ = [
    "MicroBatcher",
    "Overloaded",
    "ServeStats",
    "TDMServer",
    "latent_shape",
    "make_cond_fn",
]
