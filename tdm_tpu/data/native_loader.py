"""ctypes bindings for the native C++ prompt loader (`src/dataloader.cc`).

The native loader replaces the torch DataLoader worker pool
(`--dataloader_num_workers`, reference `src/main.py:298-304`): one mmap of
the prompt shard, a background C++ thread keeping a ring of shuffled batches
full, zero Python work on the hot path. `NativePromptLoader` matches the
`PromptBatcher` iterator contract, so the train CLI can use either; it falls
back automatically when no compiler is available (the .so is built once per
machine into ~/.cache/tdm_tpu).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "src", "dataloader.cc")


def _build_so(cache_dir: Optional[str] = None) -> str:
    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "tdm_tpu"
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "tdm_dataloader.so")
    src = os.path.abspath(_SRC)
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(src):
        return so_path
    tmp = so_path + f".tmp{os.getpid()}"
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
         src, "-o", tmp],
        check=True, capture_output=True,
    )
    os.replace(tmp, so_path)
    return so_path


_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build_so())
        lib.ldr_create.restype = ctypes.c_void_p
        lib.ldr_create.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_uint64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.ldr_next.restype = ctypes.c_int
        lib.ldr_next.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ]
        lib.ldr_num_prompts.restype = ctypes.c_int64
        lib.ldr_num_prompts.argtypes = [ctypes.c_void_p]
        lib.ldr_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def available() -> bool:
    try:
        _get_lib()
        return True
    except Exception:
        return False


class NativePromptLoader:
    """Iterator of dict(prompts=[...], input_ids?, attention_mask?) batches
    from a .txt / .jsonl prompt shard — drop-in for PromptBatcher."""

    def __init__(
        self,
        path: str,
        batch_size: int,
        *,
        caption_column: str = "prompt",
        tokenizer=None,
        max_length: int = 120,
        seed: int = 0,
        host_index: int = 0,
        host_count: int = 1,
        queue_depth: int = 4,
        buf_bytes: int = 1 << 20,
    ):
        lib = _get_lib()
        self._lib = lib
        self._h = lib.ldr_create(
            path.encode(), caption_column.encode(), batch_size,
            seed, host_index, host_count, queue_depth,
        )
        if not self._h:
            raise ValueError(
                f"native loader failed on {path!r} (missing file, empty "
                f"shard, or shard smaller than batch_size={batch_size})"
            )
        self.batch_size = batch_size
        self.tokenizer = tokenizer
        self.max_length = max_length
        self._buf = ctypes.create_string_buffer(buf_bytes)
        self._offsets = (ctypes.c_int64 * (batch_size + 1))()

    @property
    def num_prompts(self) -> int:
        return int(self._lib.ldr_num_prompts(self._h))

    def __iter__(self) -> Iterator[dict]:
        return self

    def __next__(self) -> dict:
        n = self._lib.ldr_next(
            self._h, self._buf, len(self._buf), self._offsets, self.batch_size
        )
        if n == -2:
            raise RuntimeError("native loader: batch larger than buffer")
        if n < 0:
            raise StopIteration
        raw = self._buf.raw
        offs = list(self._offsets[: n + 1])
        prompts = [
            raw[offs[i] : offs[i + 1]].decode("utf-8", "replace")
            for i in range(n)
        ]
        out = {"prompts": prompts}
        if self.tokenizer is not None:
            ids, mask = self.tokenizer(prompts, max_length=self.max_length)
            out["input_ids"] = np.asarray(ids)
            out["attention_mask"] = np.asarray(mask)
        return out

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.ldr_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
