"""Checkpoint IO: HF-layout converters (convert), param-tree safetensors
(params), orbax train state lives in utils/checkpoint."""

from tdm_tpu.io import convert, params  # noqa: F401
