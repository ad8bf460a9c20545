"""Prompt data pipeline — TDM training is image-free (prompts only).

Rebuilds the reference's data path (`src/main.py:231-304`): HF
`datasets.load_dataset` (hub name or local folder) → caption-column pick →
tokenize map → shuffling DataLoader emitting (input_ids, attention_mask).
On TPU the same pipeline is a host-side numpy batcher: prompts are tiny
(bytes/sample), so the only real work — T5 encoding — happens on device, and
the best layout is to PRE-ENCODE prompts once and stream cached embeddings
(`EmbeddingCache`), which removes the frozen 4.7B-param T5 from training HBM
entirely (SURVEY.md §2 table B "text encoders": precomputed-embedding path).

Sources supported: .txt (one prompt/line), .jsonl (caption column), .parquet
(via datasets if available), an HF datasets name, or an in-memory list.
Per-host sharding: host h of H takes prompts[h::H] (the jax.process_index
split replacing the DataLoader's DistributedSampler).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator, Optional, Sequence

import numpy as np


def load_prompts(
    source,
    *,
    caption_column: str = "prompt",
    max_samples: Optional[int] = None,
    dataset_config_name: Optional[str] = None,
) -> list[str]:
    """→ list of prompt strings from any supported source (reference
    caption-column logic `src/main.py:253-261`). `dataset_config_name`
    selects the HF dataset config (reference passes it to load_dataset,
    `src/main.py:231-238`); ignored for file/list sources."""
    if isinstance(source, (list, tuple)):
        prompts = [str(p) for p in source]
    elif os.path.isfile(source) and source.endswith(".txt"):
        with open(source) as f:
            prompts = [line.strip() for line in f if line.strip()]
    elif os.path.isfile(source) and source.endswith(".jsonl"):
        prompts = []
        with open(source) as f:
            for line in f:
                if line.strip():
                    row = json.loads(line)
                    prompts.append(str(row[caption_column]))
    else:
        # HF datasets path (hub name or local dir) — the reference default
        # (JourneyDB, src/args.py:42-47)
        import datasets  # lazy: heavy import

        ds = datasets.load_dataset(source, dataset_config_name, split="train")
        if caption_column not in ds.column_names:
            raise ValueError(
                f"caption column {caption_column!r} not in {ds.column_names}"
            )
        prompts = [str(p) for p in ds[caption_column]]
    if max_samples is not None:
        prompts = prompts[:max_samples]
    if not prompts:
        raise ValueError(f"no prompts loaded from {source!r}")
    return prompts


@dataclass
class PromptBatcher:
    """Infinite shuffling batcher over a (host-sharded) prompt list.

    Emits dict(prompts=list[str], input_ids, attention_mask) when a
    tokenizer is attached, else just the raw prompts. Deterministic under
    `seed` (reshuffles each epoch like the reference's shuffling DataLoader,
    `src/main.py:298-304`)."""

    prompts: Sequence[str]
    batch_size: int
    tokenizer: Optional[object] = None
    max_length: int = 120  # T5 max_length for PixArt (src/main.py:417-421)
    seed: int = 0
    host_index: int = 0
    host_count: int = 1

    def __post_init__(self):
        shard = list(self.prompts)[self.host_index :: self.host_count]
        if not shard:
            raise ValueError(
                f"host {self.host_index}/{self.host_count} got an empty shard"
            )
        self._shard = shard

    def __iter__(self) -> Iterator[dict]:
        rng = np.random.default_rng(self.seed + self.host_index)
        n = len(self._shard)
        while True:
            order = rng.permutation(n)
            for start in range(0, n - self.batch_size + 1, self.batch_size):
                idx = order[start : start + self.batch_size]
                batch_prompts = [self._shard[i] for i in idx]
                out = {"prompts": batch_prompts}
                if self.tokenizer is not None:
                    ids, mask = self.tokenizer(
                        batch_prompts, max_length=self.max_length
                    )
                    out["input_ids"] = np.asarray(ids)
                    out["attention_mask"] = np.asarray(mask)
                yield out
            if n < self.batch_size:
                raise ValueError(
                    f"batch_size {self.batch_size} > shard size {n}"
                )


def pack_family_cond(
    family: str,
    embeds,
    masks,
    pooled,
    *,
    error: type = ValueError,
):
    """Cache/encoder rows → the family's conditioning pytree — THE single
    definition of each family's cond format (shared by cli/generate,
    cli/train via families, and serve/batcher). CogVideoX conditions on the
    embedding sequence alone (no key-padding mask — models/cogvideox.py);
    SD3 takes (context, pooled) and needs a pooled-carrying cache; default
    is (embeds, mask)."""
    if family == "cogvideox":
        return embeds
    if family == "sd3":
        if pooled is None:
            raise error(
                "SD3 conditioning needs the pooled CLIP vector — this "
                "cache has none; rebuild it with "
                "`build_cache --pipeline <sd3 checkpoint>`"
            )
        return (embeds, pooled)
    return (embeds, masks)


def chunked_encode(plist: Sequence[str], enc, batch_size: int):
    """Encode prompts through `enc(padded_chunk) → (embeds, masks,
    pooled-or-None)` in fixed-size empty-string-padded chunks (ONE compiled
    encoder shape — docs/ENVIRONMENT_NOTES.md #3), trimming the padding and
    concatenating. The shared core of EmbeddingCache.build and
    cli/build_cache's pipeline path."""
    es, ms, ps = [], [], []
    for i in range(0, len(plist), batch_size):
        chunk = list(plist[i : i + batch_size])
        pad = batch_size - len(chunk)
        e, m, p = enc(chunk + [""] * pad)
        es.append(e[: len(chunk)])
        ms.append(m[: len(chunk)])
        if p is not None:
            ps.append(p[: len(chunk)])
    return (
        np.concatenate(es),
        np.concatenate(ms),
        np.concatenate(ps) if ps else None,
    )


class EmbeddingCache:
    """Offline text-embedding cache: encode every prompt once, stream
    (embeds, mask[, pooled]) batches at train time — the TPU-preferred path
    (the frozen encoder never occupies training HBM; reference equivalent is
    the per-step no-grad T5 forward, `src/main.py:458-461`). SD3-style
    caches additionally carry the pooled CLIP-L/G vector per prompt
    (`pooled` [N, P]) for the MMDiT's second conditioning input."""

    def __init__(
        self,
        embeds: np.ndarray,
        masks: np.ndarray,
        prompts: list[str],
        uncond_embed: Optional[np.ndarray] = None,
        uncond_mask: Optional[np.ndarray] = None,
        pooled: Optional[np.ndarray] = None,
        uncond_pooled: Optional[np.ndarray] = None,
        val_prompts: Optional[list[str]] = None,
        val_embeds: Optional[np.ndarray] = None,
        val_masks: Optional[np.ndarray] = None,
        val_pooled: Optional[np.ndarray] = None,
    ):
        self.embeds = embeds  # [N, L, D] (fp16/bf16-as-fp32 on disk)
        self.masks = masks  # [N, L]
        self.prompts = prompts
        # empty-prompt embedding for the CFG unconditional branch (the
        # reference precomputes this once, src/main.py:416-431)
        self.uncond_embed = uncond_embed  # [L, D] or None
        self.uncond_mask = uncond_mask  # [L] or None
        self.pooled = pooled  # [N, P] or None (SD3 pooled CLIP)
        self.uncond_pooled = uncond_pooled  # [P] or None
        # dedicated validation-prompt rows (the reference renders the SAME
        # fixed prompts every cadence, src/main.py:416-431 — these keys let
        # the train CLI look them up instead of borrowing dataset rows)
        self.val_prompts = list(val_prompts) if val_prompts else []
        self.val_embeds = val_embeds  # [V, L, D] or None
        self.val_masks = val_masks  # [V, L] or None
        self.val_pooled = val_pooled  # [V, P] or None

    @staticmethod
    def build(
        prompts: Sequence[str], tokenizer, encode_fn, *, max_length: int = 120,
        batch_size: int = 32, val_prompts: Optional[Sequence[str]] = None,
    ) -> "EmbeddingCache":
        """encode_fn(ids [B,L], mask [B,L]) → embeds [B,L,D] (jit-wrapped
        T5 forward). `val_prompts` are additionally embedded under dedicated
        validation keys (see validation_rows)."""

        def enc(chunk):
            ids, mask = tokenizer(chunk, max_length=max_length)
            e = np.asarray(encode_fn(np.asarray(ids), np.asarray(mask)))
            return e.astype(np.float16), np.asarray(mask), None

        prompts = list(prompts)
        embeds, masks, _ = chunked_encode(prompts, enc, batch_size)
        u_ids, u_mask = tokenizer([""] * batch_size, max_length=max_length)
        u = np.asarray(encode_fn(np.asarray(u_ids), np.asarray(u_mask)))
        val_prompts = list(val_prompts or [])
        v_e = v_m = None
        if val_prompts:
            v_e, v_m, _ = chunked_encode(val_prompts, enc, batch_size)
        return EmbeddingCache(
            embeds, masks, prompts,
            uncond_embed=u[0].astype(np.float16),
            uncond_mask=np.asarray(u_mask)[0],
            val_prompts=val_prompts, val_embeds=v_e, val_masks=v_m,
        )

    def save(self, path: str) -> None:
        extra = {}
        if self.uncond_embed is not None:
            extra = {
                "uncond_embed": self.uncond_embed,
                "uncond_mask": self.uncond_mask,
            }
        if self.pooled is not None:
            extra["pooled"] = self.pooled
            if self.uncond_pooled is not None:
                extra["uncond_pooled"] = self.uncond_pooled
        if self.val_prompts:
            extra["val_prompts"] = np.asarray(self.val_prompts, dtype=object)
            extra["val_embeds"] = self.val_embeds
            extra["val_masks"] = self.val_masks
            if self.val_pooled is not None:
                extra["val_pooled"] = self.val_pooled
        np.savez_compressed(
            path, embeds=self.embeds, masks=self.masks,
            prompts=np.asarray(self.prompts, dtype=object), **extra,
        )

    @staticmethod
    def load(path: str) -> "EmbeddingCache":
        z = np.load(path, allow_pickle=True)
        return EmbeddingCache(
            z["embeds"], z["masks"], list(z["prompts"]),
            uncond_embed=z["uncond_embed"] if "uncond_embed" in z else None,
            uncond_mask=z["uncond_mask"] if "uncond_mask" in z else None,
            pooled=z["pooled"] if "pooled" in z else None,
            uncond_pooled=(
                z["uncond_pooled"] if "uncond_pooled" in z else None
            ),
            val_prompts=(
                list(z["val_prompts"]) if "val_prompts" in z else None
            ),
            val_embeds=z["val_embeds"] if "val_embeds" in z else None,
            val_masks=z["val_masks"] if "val_masks" in z else None,
            val_pooled=z["val_pooled"] if "val_pooled" in z else None,
        )

    def validation_rows(
        self, prompts: Sequence[str]
    ) -> tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
        """Look up `prompts` (the --validation_prompts) → (embeds [V,L,D]
        f32, masks [V,L], pooled [V,P] or None). Dedicated validation rows
        are consulted first, then the main prompt rows; missing prompts
        raise with a rebuild hint — validation grids must render the SAME
        fixed prompts every cadence (reference src/main.py:416-431), never
        arbitrary dataset rows."""
        e_rows, m_rows, p_rows = [], [], []
        has_pooled = self.pooled is not None or self.val_pooled is not None
        missing = []
        for p in prompts:
            if p in self.val_prompts:
                i = self.val_prompts.index(p)
                e_rows.append(self.val_embeds[i])
                m_rows.append(self.val_masks[i])
                if has_pooled:
                    p_rows.append(
                        self.val_pooled[i] if self.val_pooled is not None
                        else None
                    )
            elif p in self.prompts:
                i = self.prompts.index(p)
                e_rows.append(self.embeds[i])
                m_rows.append(self.masks[i])
                if has_pooled:
                    p_rows.append(
                        self.pooled[i] if self.pooled is not None else None
                    )
            else:
                missing.append(p)
        if missing:
            raise KeyError(
                f"validation prompts {missing!r} not in the embedding cache "
                "— rebuild it with cli/build_cache (it embeds "
                "--validation_prompts under dedicated keys)"
            )
        if has_pooled and any(r is None for r in p_rows):
            has_pooled = False  # mixed provenance without pooled rows
        return (
            np.stack(e_rows).astype(np.float32),
            np.stack(m_rows).astype(np.int32),
            np.stack(p_rows).astype(np.float32) if has_pooled else None,
        )

    def batches(
        self, batch_size: int, *, seed: int = 0,
        host_index: int = 0, host_count: int = 1,
    ) -> Iterator[tuple]:
        """Yields (embeds, masks) — or (embeds, masks, pooled) when the
        cache carries pooled vectors (SD3)."""
        idx_all = np.arange(len(self.prompts))[host_index::host_count]
        rng = np.random.default_rng(seed + host_index)
        while True:
            order = rng.permutation(len(idx_all))
            for s in range(0, len(idx_all) - batch_size + 1, batch_size):
                sel = idx_all[order[s : s + batch_size]]
                out = (
                    self.embeds[sel].astype(np.float32),
                    self.masks[sel],
                )
                if self.pooled is not None:
                    out = out + (self.pooled[sel].astype(np.float32),)
                yield out
