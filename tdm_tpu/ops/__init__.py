"""Pallas TPU kernels + XLA fallbacks (flash attention)."""

from tdm_tpu.ops import attention, ring_attention  # noqa: F401
