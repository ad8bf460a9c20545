"""Pallas TPU kernels + XLA fallbacks (flash attention) + int8 inference."""

from tdm_tpu.ops import attention, quant, ring_attention  # noqa: F401
