"""Prompt data pipeline (training is image-free): loaders, batchers,
tokenizer adapters, T5 embedding cache, native C++ prefetch loader."""

from tdm_tpu.data import prompts, tokenizer  # noqa: F401
