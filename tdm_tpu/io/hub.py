"""HF Hub I/O: repo-id resolution against the local hub cache, plus push.

The reference resolves every model by repo id — `from_pretrained("org/name")`
(`/root/reference/src/main.py:160-176`), `hf_hub_download` for LoRA files
(`README.md:45,96`) — and publishes with `create_repo` + `upload_folder`
(`/root/reference/src/main.py:36,125-128`). On a zero-egress TPU host the
download half becomes a *resolution* problem: map a repo id to the standard
huggingface_hub on-disk cache layout

    <cache>/models--{org}--{name}/
        refs/<revision>            -> file containing a commit hash
        snapshots/<commit>/...     -> the actual checkout

and only reach for the network when the environment allows it. Everything in
this module is plain filesystem logic, testable offline.
"""

from __future__ import annotations

import os
import re
from typing import Optional

_REPO_ID_RE = re.compile(r"^[\w.\-]+/[\w.\-]+$")
_COMMIT_RE = re.compile(r"^[0-9a-f]{40}$")


def hub_cache_dir() -> str:
    """The huggingface_hub cache root, honoring the standard env overrides
    (HF_HUB_CACHE > HF_HOME/hub > ~/.cache/huggingface/hub)."""
    if os.environ.get("HF_HUB_CACHE"):
        return os.environ["HF_HUB_CACHE"]
    if os.environ.get("HF_HOME"):
        return os.path.join(os.environ["HF_HOME"], "hub")
    return os.path.join(
        os.path.expanduser("~"), ".cache", "huggingface", "hub"
    )


def _offline() -> bool:
    return os.environ.get("HF_HUB_OFFLINE", "").lower() in (
        "1", "on", "yes", "true",
    )


def repo_cache_dir(
    repo_id: str, *, cache_dir: Optional[str] = None, repo_type: str = "model"
) -> str:
    """`org/name` -> `<cache>/models--org--name` (no existence check)."""
    prefix = {"model": "models", "dataset": "datasets", "space": "spaces"}[
        repo_type
    ]
    return os.path.join(
        cache_dir or hub_cache_dir(),
        f"{prefix}--{repo_id.replace('/', '--')}",
    )


def cached_snapshot(
    repo_id: str,
    *,
    revision: Optional[str] = None,
    cache_dir: Optional[str] = None,
    repo_type: str = "model",
) -> Optional[str]:
    """Resolve `repo_id`@`revision` to a local snapshot directory, or None.

    Resolution order (the huggingface_hub layout):
      1. `revision` is a full 40-hex commit -> snapshots/<revision> directly;
      2. refs/<revision or 'main'> names a commit -> snapshots/<commit>;
      3. no refs but exactly the snapshots dir exists and `revision` was not
         pinned -> the most recently modified snapshot (a cache populated by
         hand or rsync, common on air-gapped hosts).
    """
    repo_dir = repo_cache_dir(repo_id, cache_dir=cache_dir, repo_type=repo_type)
    snap_root = os.path.join(repo_dir, "snapshots")
    if revision and _COMMIT_RE.match(revision):
        path = os.path.join(snap_root, revision)
        return path if os.path.isdir(path) else None
    ref = os.path.join(repo_dir, "refs", revision or "main")
    if os.path.isfile(ref):
        with open(ref) as f:
            commit = f.read().strip()
        path = os.path.join(snap_root, commit)
        if os.path.isdir(path):
            return path
    if revision is None and os.path.isdir(snap_root):
        snaps = [
            os.path.join(snap_root, d)
            for d in os.listdir(snap_root)
            if os.path.isdir(os.path.join(snap_root, d))
        ]
        if snaps:
            return max(snaps, key=os.path.getmtime)
    return None


def resolve_pretrained(
    name_or_path: str,
    *,
    revision: Optional[str] = None,
    cache_dir: Optional[str] = None,
    allow_download: Optional[bool] = None,
) -> str:
    """Local path or repo id -> local directory (the reference's implicit
    `from_pretrained` download step, made explicit and offline-first).

    - an existing path is returned unchanged;
    - a repo id resolves against the hub cache (`cached_snapshot`);
    - otherwise `snapshot_download` runs, unless the environment is offline
      (HF_HUB_OFFLINE=1, `allow_download=False`, or huggingface_hub missing),
      in which case the error says exactly where a checkout was expected.
    """
    if os.path.exists(name_or_path):
        return name_or_path
    if not _REPO_ID_RE.match(name_or_path):
        raise FileNotFoundError(
            f"{name_or_path!r} is neither an existing path nor an "
            "'org/name' hub repo id"
        )
    snap = cached_snapshot(
        name_or_path, revision=revision, cache_dir=cache_dir
    )
    if snap is not None:
        return snap
    if allow_download is False or _offline():
        raise FileNotFoundError(
            f"{name_or_path!r} is not in the hub cache "
            f"({repo_cache_dir(name_or_path, cache_dir=cache_dir)}) and "
            "downloads are disabled (HF_HUB_OFFLINE / allow_download=False). "
            "Populate the cache on a connected host (huggingface-cli "
            "download) or pass a local directory."
        )
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:  # pragma: no cover - env without the package
        raise FileNotFoundError(
            f"{name_or_path!r} not cached and huggingface_hub is not "
            "installed to download it — pass a local directory"
        ) from e
    return snapshot_download(
        name_or_path, revision=revision, cache_dir=cache_dir
    )


def push_to_hub(
    folder: str,
    repo_id: str,
    *,
    token: Optional[str] = None,
    private: bool = True,
    commit_message: str = "tdm_tpu checkpoint",
) -> str:
    """Create (if needed) and upload `folder` to `repo_id`; returns the repo
    URL. Requires `huggingface_hub` and a token (arg or HF_TOKEN env)."""
    token = token or os.environ.get("HF_TOKEN")
    if not token:
        raise RuntimeError(
            "push_to_hub needs a token: pass token= or set HF_TOKEN "
            "(reference flag --hub_token, src/args.py)"
        )
    try:
        from huggingface_hub import HfApi
    except ImportError as e:  # pragma: no cover - env without the package
        raise RuntimeError("huggingface_hub is not installed") from e
    api = HfApi(token=token)
    url = api.create_repo(repo_id, exist_ok=True, private=private).repo_id
    api.upload_folder(
        repo_id=repo_id, folder_path=folder, commit_message=commit_message
    )
    return url
