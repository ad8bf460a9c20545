"""Tokenizer adapters — one call convention for every text backbone.

The framework-wide tokenizer contract is
    tokenizer(texts: list[str], max_length: int) -> (ids [B,L] int32,
                                                     mask [B,L] int32)
matching how the reference drives `T5Tokenizer(..., padding='max_length',
truncation=True, return_tensors=...)` (`src/main.py:417-421,263-291`).

`HFTokenizer` wraps any local `transformers` tokenizer directory (T5
sentencepiece, CLIP BPE); network fetches are never attempted — point it at
a downloaded tokenizer folder. `HashTokenizer` is a dependency-free
deterministic fallback for tests and smoke runs.
"""

from __future__ import annotations

import numpy as np


class HFTokenizer:
    def __init__(self, path: str, **kwargs):
        from transformers import AutoTokenizer

        self.path = path  # kept so pipe.save_pretrained can re-bundle it
        self._tok = AutoTokenizer.from_pretrained(
            path, local_files_only=True, **kwargs
        )

    def __call__(self, texts, max_length: int):
        out = self._tok(
            list(texts),
            max_length=max_length,
            padding="max_length",
            truncation=True,
            return_tensors="np",
        )
        return (
            out["input_ids"].astype(np.int32),
            out["attention_mask"].astype(np.int32),
        )


class HashTokenizer:
    """Deterministic word-hash tokenizer (tests/smoke only): stable across
    processes (uses a real hash, not PYTHONHASHSEED-dependent `hash`)."""

    def __init__(self, vocab_size: int = 30000, eos_id: int | None = None):
        self.vocab_size = vocab_size
        self.eos_id = vocab_size - 1 if eos_id is None else eos_id

    def _word_id(self, w: str) -> int:
        import zlib

        return zlib.crc32(w.encode()) % (self.vocab_size - 2) + 1

    def __call__(self, texts, max_length: int):
        ids = np.zeros((len(texts), max_length), np.int32)
        mask = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            toks = [self._word_id(w) for w in t.split()][: max_length - 1]
            ids[i, : len(toks)] = toks
            ids[i, len(toks)] = self.eos_id
            mask[i, : len(toks) + 1] = 1
        return ids, mask
