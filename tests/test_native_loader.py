"""Native C++ loader tests: build, txt + jsonl parsing, host-shard
disjointness, epoch coverage, determinism, and throughput sanity vs the
Python batcher."""

import json

import numpy as np
import pytest

from tdm_tpu.data import native_loader

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="no g++ toolchain"
)


@pytest.fixture(scope="module")
def txt_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("d") / "prompts.txt"
    p.write_text("".join(f"prompt number {i}\n" for i in range(64)))
    return str(p)


def test_txt_batches_cover_epoch(txt_file):
    ldr = native_loader.NativePromptLoader(txt_file, 8, seed=3)
    assert ldr.num_prompts == 64
    seen = []
    for _ in range(8):  # one epoch
        b = next(ldr)
        assert len(b["prompts"]) == 8
        seen.extend(b["prompts"])
    assert sorted(seen) == sorted(f"prompt number {i}" for i in range(64))
    ldr.close()


def test_determinism_and_shuffling(txt_file):
    def first_two(seed):
        ldr = native_loader.NativePromptLoader(txt_file, 8, seed=seed)
        out = [tuple(next(ldr)["prompts"]) for _ in range(2)]
        ldr.close()
        return out

    assert first_two(7) == first_two(7)
    assert first_two(7) != first_two(8)
    # actually shuffled (not identity order)
    ldr = native_loader.NativePromptLoader(txt_file, 64, seed=1)
    batch = next(ldr)["prompts"]
    ldr.close()
    assert batch != [f"prompt number {i}" for i in range(64)]


def test_host_sharding_disjoint(txt_file):
    def epoch(host):
        ldr = native_loader.NativePromptLoader(
            txt_file, 8, seed=0, host_index=host, host_count=2
        )
        out = set()
        for _ in range(4):
            out.update(next(ldr)["prompts"])
        ldr.close()
        return out

    a, b = epoch(0), epoch(1)
    assert a.isdisjoint(b)
    assert len(a) == len(b) == 32


def test_jsonl_caption_extraction(tmp_path):
    p = tmp_path / "data.jsonl"
    rows = [
        {"prompt": f"caption {i}", "meta": i} for i in range(16)
    ]
    rows[3]["prompt"] = 'escaped "quote" \n newline'
    p.write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n"
    )
    ldr = native_loader.NativePromptLoader(str(p), 4, caption_column="prompt")
    assert ldr.num_prompts == 16
    seen = set()
    for _ in range(4):
        seen.update(next(ldr)["prompts"])
    assert 'escaped "quote" \n newline' in seen
    assert "caption 0" in seen
    ldr.close()


def test_tokenizer_attachment(txt_file):
    from tdm_tpu.data.tokenizer import HashTokenizer

    ldr = native_loader.NativePromptLoader(
        txt_file, 4, tokenizer=HashTokenizer(100), max_length=8
    )
    b = next(ldr)
    assert b["input_ids"].shape == (4, 8)
    assert b["attention_mask"].dtype == np.int32
    ldr.close()
