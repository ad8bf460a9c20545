"""io/hub: repo-id → local-snapshot resolution against the standard
huggingface_hub cache layout (the offline half of the reference's
`from_pretrained("org/name")` calls, /root/reference/src/main.py:160-176)."""

import os

import pytest

from tdm_tpu.io import hub


def _make_snapshot(cache, repo_id, commit, *, ref=None, files=("x.txt",)):
    repo = os.path.join(cache, f"models--{repo_id.replace('/', '--')}")
    snap = os.path.join(repo, "snapshots", commit)
    os.makedirs(snap, exist_ok=True)
    for f in files:
        with open(os.path.join(snap, f), "w") as fh:
            fh.write("data")
    if ref:
        os.makedirs(os.path.join(repo, "refs"), exist_ok=True)
        with open(os.path.join(repo, "refs", ref), "w") as fh:
            fh.write(commit + "\n")
    return snap


COMMIT_A = "a" * 40
COMMIT_B = "b" * 40


def test_cache_dir_env_precedence(monkeypatch, tmp_path):
    monkeypatch.setenv("HF_HOME", str(tmp_path / "home"))
    assert hub.hub_cache_dir() == str(tmp_path / "home" / "hub")
    monkeypatch.setenv("HF_HUB_CACHE", str(tmp_path / "cache"))
    assert hub.hub_cache_dir() == str(tmp_path / "cache")


def test_resolve_via_refs_main(tmp_path):
    cache = str(tmp_path)
    snap = _make_snapshot(cache, "org/model", COMMIT_A, ref="main")
    assert hub.resolve_pretrained("org/model", cache_dir=cache) == snap


def test_resolve_named_revision_and_commit(tmp_path):
    cache = str(tmp_path)
    snap_a = _make_snapshot(cache, "org/model", COMMIT_A, ref="main")
    snap_b = _make_snapshot(cache, "org/model", COMMIT_B, ref="v2")
    assert (
        hub.resolve_pretrained("org/model", revision="v2", cache_dir=cache)
        == snap_b
    )
    # a full commit hash bypasses refs entirely
    assert (
        hub.resolve_pretrained(
            "org/model", revision=COMMIT_A, cache_dir=cache
        )
        == snap_a
    )


def test_refless_cache_falls_back_to_newest_snapshot(tmp_path):
    cache = str(tmp_path)
    _make_snapshot(cache, "org/model", COMMIT_A)
    snap_b = _make_snapshot(cache, "org/model", COMMIT_B)
    os.utime(snap_b, None)  # newest
    assert hub.resolve_pretrained("org/model", cache_dir=cache) == snap_b
    # ...but a pinned revision must NOT silently take a random snapshot
    with pytest.raises(FileNotFoundError):
        hub.resolve_pretrained(
            "org/model", revision="v9", cache_dir=cache, allow_download=False
        )


def test_local_path_passthrough(tmp_path):
    d = str(tmp_path / "ckpt")
    os.makedirs(d)
    assert hub.resolve_pretrained(d) == d


def test_missing_repo_offline_error_names_the_cache_path(tmp_path):
    with pytest.raises(FileNotFoundError, match="models--org--nope"):
        hub.resolve_pretrained(
            "org/nope", cache_dir=str(tmp_path), allow_download=False
        )


def test_hf_hub_offline_env_blocks_download(monkeypatch, tmp_path):
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    with pytest.raises(FileNotFoundError, match="offline|disabled"):
        hub.resolve_pretrained("org/nope", cache_dir=str(tmp_path))


def test_not_a_repo_id_errors(tmp_path):
    with pytest.raises(FileNotFoundError, match="neither"):
        hub.resolve_pretrained(str(tmp_path / "does-not-exist"))
    with pytest.raises(FileNotFoundError, match="neither"):
        hub.resolve_pretrained("a/b/c")


def test_push_to_hub_requires_token(monkeypatch):
    monkeypatch.delenv("HF_TOKEN", raising=False)
    with pytest.raises(RuntimeError, match="token"):
        hub.push_to_hub("some/folder", "org/repo")


def test_push_to_hub_calls_api(monkeypatch, tmp_path):
    """create_repo(exist_ok) + upload_folder with the given folder —
    the reference's create_repo/upload_folder pair (src/main.py:125-128),
    exercised against a stub HfApi (zero-egress environment)."""
    import sys
    import types

    calls = {}

    class FakeApi:
        def __init__(self, token=None):
            calls["token"] = token

        def create_repo(self, repo_id, exist_ok=False, private=True):
            calls["create"] = (repo_id, exist_ok, private)
            return types.SimpleNamespace(repo_id=repo_id)

        def upload_folder(self, repo_id, folder_path, commit_message):
            calls["upload"] = (repo_id, folder_path, commit_message)

    fake_mod = types.ModuleType("huggingface_hub")
    fake_mod.HfApi = FakeApi
    monkeypatch.setitem(sys.modules, "huggingface_hub", fake_mod)
    url = hub.push_to_hub(
        str(tmp_path), "org/repo", token="tok", commit_message="msg"
    )
    assert url == "org/repo"
    assert calls["token"] == "tok"
    assert calls["create"] == ("org/repo", True, True)
    assert calls["upload"] == ("org/repo", str(tmp_path), "msg")
